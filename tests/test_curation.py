"""Operator-level gates for the corpus-curation family
(destor_spark/operators/curation.py): hand-built frames with known
answers, independent of the DuckDB parity harness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from destor_spark.operators.curation import (
    SEGMENT_W,
    canonical_url,
    curation_decisions,
    remove_duplicate_segments,
    repetition_features,
    segment_dedup_stats,
    semantic_dup_flags,
    url_dup_groups,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------


def test_repetition_scores(spark):
    clean = " ".join(f"t{i}" for i in range(20))  # 20 distinct tokens
    rows = [
        (0, clean),                    # all distinct, every bigram unique
        (1, "x y x y x y x y"),        # maximally repetitive
        (2, "one"),                    # single token -> no bigrams
        (3, ""),                       # empty doc survives with zeros
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_features(_docs(spark, rows)).collect()
    }
    assert out[0]["dup_token_ppm"] == 0
    # no bigram REPEATS, so the Gopher score must be exactly 0 — a
    # unique-bigram doc scoring its longest bigram was a real bug
    assert out[0]["top_bigram_ppm"] == 0
    assert not out[0]["repetitive"]
    # 8 tokens, 2 distinct -> 750000 ppm duplicates
    assert out[1]["dup_token_ppm"] == 750_000
    # "x y" occurs 4x (len 3) in 15 chars -> 800000 ppm
    assert out[1]["top_bigram_ppm"] == 800_000
    assert out[1]["repetitive"]
    assert out[2]["dup_token_ppm"] == 0
    assert out[2]["top_bigram_ppm"] == 0
    assert out[3]["n_tokens"] == 0 and not out[3]["repetitive"]


# ---------------------------------------------------------------------------
# segment dedup
# ---------------------------------------------------------------------------


def test_segment_keep_first(spark):
    w = " ".join(str(i) for i in range(SEGMENT_W))  # one full window
    rows = [
        (0, w),                      # first occurrence -> kept
        (1, w),                      # exact segment dup of doc 0
        (2, w + " tail"),            # same first window, partial tail ignored
        (3, "short doc"),            # < W tokens -> zero segments
    ]
    out = {
        r["doc_id"]: r
        for r in segment_dedup_stats(_docs(spark, rows)).collect()
    }
    assert out[0]["n_segments"] == 1 and out[0]["n_dup_segments"] == 0
    assert out[1]["n_dup_segments"] == 1 and out[1]["dup_seg_ppm"] == 1_000_000
    assert out[2]["n_segments"] == 1 and out[2]["n_dup_segments"] == 1
    assert out[3]["n_segments"] == 0 and out[3]["dup_seg_ppm"] == 0


def test_remove_duplicate_segments_reconstruction(spark):
    w1 = " ".join(f"a{i}" for i in range(SEGMENT_W))
    w2 = " ".join(f"b{i}" for i in range(SEGMENT_W))
    rows = [
        (0, w1 + " " + w2 + " tail words"),  # all first occurrences
        (1, w2 + " " + w1),                  # both windows already seen
        (2, w1 + " only tail"),              # window seen, tail survives
        (3, "short doc"),                    # < W tokens: unchanged
        (4, w1 + " " + w1),                  # within-doc dup
    ]
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_segments(_docs(spark, rows)).collect()
    }
    # doc 0 keeps everything: byte-identical reconstruction
    assert out[0]["clean_text"] == rows[0][1]
    assert out[0]["n_kept_segments"] == 2
    # doc 1: both windows duplicated -> empty text
    assert out[1]["clean_text"] == "" and out[1]["n_kept_segments"] == 0
    # doc 2: window removed, tail kept
    assert out[2]["clean_text"] == "only tail"
    # doc 3: too short to segment, unchanged
    assert out[3]["clean_text"] == "short doc"
    # doc 4: second within-doc instance removed... but w1 was already
    # claimed by doc 0 (keep-first is corpus-wide), so both go
    assert out[4]["clean_text"] == "" and out[4]["n_kept_segments"] == 0


def test_clean_corpus_oracle_empty_doc_edge(spark):
    """DuckDB-oracle parity on the edge the sf0.001 sweep can't reach:
    a fully-deduplicated doc with NO tail (word count a multiple of
    SEGMENT_W) must hash as the EMPTY STRING on both engines.  DuckDB's
    array_to_string([]) is NULL where Spark's array_join([]) is '' —
    the oracle COALESCEs, and this gate keeps it that way (first seen
    as a driver-scale mismatch at sf0.01, doc 420)."""
    import duckdb
    import pandas as pd

    import destor_spark.queries as Q

    w1 = " ".join(f"e{i}" for i in range(SEGMENT_W))
    rows = [
        (0, w1),                    # first occurrence, no tail
        (1, w1),                    # fully duplicated, no tail -> ''
        (2, w1 + " tail bit"),      # duplicated window, tail kept
    ]
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    du = {
        int(r[0]): (r[2], int(r[3]))
        for r in con.sql(Q.SQL_SEGMENT_CLEAN_CORPUS).fetchall()
    }
    sp = {
        r["doc_id"]: (r["clean_md5"], r["n_clean_chars"])
        for r in remove_duplicate_segments(_docs(spark, rows))
        .select(
            "doc_id",
            F.md5("clean_text").alias("clean_md5"),
            F.length("clean_text").alias("n_clean_chars"),
        )
        .collect()
    }
    assert sp == du
    # the empty reconstruction is md5(''), not NULL, on BOTH engines
    assert du[1] == ("d41d8cd98f00b204e9800998ecf8427e", 0)


def test_remove_duplicate_segments_idempotent_on_unique_corpus(spark):
    rows = [
        (0, " ".join(f"u{i}" for i in range(3 * SEGMENT_W + 3))),
        (1, " ".join(f"v{i}" for i in range(SEGMENT_W))),
    ]
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_segments(_docs(spark, rows)).collect()
    }
    assert out[0] == rows[0][1] and out[1] == rows[1][1]


def test_segment_position_order_within_doc(spark):
    # duplicate window WITHIN one doc: second instance is the dup
    w1 = " ".join(f"a{i}" for i in range(SEGMENT_W))
    rows = [(0, w1 + " " + w1)]
    out = segment_dedup_stats(_docs(spark, rows)).collect()[0]
    assert out["n_segments"] == 2 and out["n_dup_segments"] == 1


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("https://www.Ex.COM:443/a/b/?utm_source=x&q=1#frag",
         "https://ex.com/a/b?q=1"),
        ("HTTP://EX.com:80/a/b", "https://ex.com/a/b"),
        ("https://ex.com/a/b?b=2&a=1", "https://ex.com/a/b?a=1&b=2"),
        ("https://ex.com/?ref=rss&fbclid=z&gclid=y", "https://ex.com"),
        ("https://ex.com:8080/x", "https://ex.com:8080/x"),  # non-default port kept
        ("https://wwwx.com/p", "https://wwwx.com/p"),  # only 'www.' stripped
        ("https://www.WWW.ex.com/p", "https://ex.com/p"),  # www run stripped
    ],
)
def test_canonical_url_cases(spark, raw, canon):
    got = (
        spark.range(1)
        .select(canonical_url(F.lit(raw)).alias("c"))
        .collect()[0]["c"]
    )
    assert got == canon, raw


def test_canonical_url_idempotent(spark):
    """canonical(canonical(x)) == canonical(x) over a generated grammar:
    every combination of scheme/www/port/path-slash/params/fragment.
    One Spark job applies the function once and twice in the same plan."""
    urls = []
    for scheme in ("http://", "https://", "HTTPS://"):
        for www in ("", "www.", "WWW.", "www.www."):
            for port in ("", ":80", ":443", ":8080"):
                for path in ("", "/", "/a/b", "/a/b/"):
                    for q in ("", "?utm_source=x", "?b=2&a=1&utm_b=z"):
                        for frag in ("", "#sec"):
                            urls.append(
                                f"{scheme}{www}Ex.COM{port}{path}{q}{frag}"
                            )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonical_url(F.col("url"))
    bad = (
        df.select(
            "url",
            once.alias("c1"),
            canonical_url(once).alias("c2"),
        )
        .filter(F.col("c1") != F.col("c2"))
        .collect()
    )
    assert bad == [], bad[:5]


def test_url_dup_groups(spark):
    rows = [
        (1, "https://www.ex.com/p?utm_source=a"),
        (2, "HTTPS://EX.COM:443/p/"),
        (3, "https://ex.com/p#s"),
        (4, "https://ex.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = url_dup_groups(df).collect()
    assert len(got) == 1
    g = got[0]
    assert g["url_canon"] == "https://ex.com/p"
    assert g["n_docs"] == 3 and g["rep_doc_id"] == 1


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def test_scrub_pii_cases(spark):
    from destor_spark.operators.curation import pii_counts, scrub_pii

    rows = [
        (0, "mail a.b+c@ex-ample.co.uk and x@y.io here"),
        (1, "call +555 123-4567 or 555 123 4567 now"),
        (2, "hosts 192.168.0.1 and 10.0.0.255 up"),
        (3, "no pii at all in this document"),
        (4, "mixed bob@ex.com then 1.2.3.4 then 123-456-7890"),
    ]
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *pii_counts(F.col("text")),
            scrub_pii(F.col("text")).alias("s"),
        ).collect()
    }
    assert out[0]["n_emails"] == 2
    assert out[0]["s"] == "mail <EMAIL> and <EMAIL> here"
    assert out[1]["n_phones"] == 2
    assert out[1]["s"] == "call <PHONE> or <PHONE> now"
    assert out[2]["n_ips"] == 2
    assert out[2]["s"] == "hosts <IP> and <IP> up"
    assert out[3]["s"] == rows[3][1]
    assert (out[4]["n_emails"], out[4]["n_phones"], out[4]["n_ips"]) == (1, 1, 1)
    assert out[4]["s"] == "mixed <EMAIL> then <IP> then <PHONE>"


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontamination_flags(spark):
    from destor_spark.operators.curation import decontamination_flags

    span = " ".join(f"b{i}" for i in range(13))       # the benchmark 13-gram
    bench = spark.createDataFrame([(span,)], "text string")
    rows = [
        (0, "lead in " + span + " trailing stuff"),   # contains the span
        (1, span.replace("b6", "X")),                 # 1 token differs -> clean
        (2, " ".join(f"c{i}" for i in range(30))),    # unrelated -> clean
        (3, "too short"),                             # < 13 tokens -> clean
        (4, span),                                    # exact benchmark text
    ]
    out = {
        r["doc_id"]: r
        for r in decontamination_flags(_docs(spark, rows), bench).collect()
    }
    assert out[0]["contaminated"] == 1 and out[0]["n_hits"] == 1
    assert out[1]["contaminated"] == 0
    assert out[2]["contaminated"] == 0
    assert out[3]["contaminated"] == 0 and out[3]["n_hits"] == 0
    assert out[4]["contaminated"] == 1


def test_decontamination_counts_distinct_grams(spark):
    from destor_spark.operators.curation import decontamination_flags

    toks = [f"b{i}" for i in range(14)]               # two distinct 13-grams
    bench = spark.createDataFrame([(" ".join(toks),)], "text string")
    # doc contains both grams, one of them twice
    text = " ".join(toks + ["sep"] + toks[:13])
    out = decontamination_flags(
        _docs(spark, [(0, text)]), bench
    ).collect()[0]
    assert out["contaminated"] == 1 and out["n_hits"] == 2


# ---------------------------------------------------------------------------
# curation decision composition
# ---------------------------------------------------------------------------


def test_curation_decision_precedence(spark):
    rep = "x y " * 40                                # trips the bigram rule
    clean_a = " ".join(f"t{i}" for i in range(20))   # below every threshold
    clean_b = " ".join(f"s{i}" for i in range(20))
    rows = [
        (0, clean_a, "https://a.com/0"),
        (1, clean_a, "https://a.com/1"),       # exact dup of 0
        (2, rep, "https://a.com/0"),           # url dup of 0 (first of rep text)
        (3, rep, "https://a.com/3"),           # exact dup of 2 AND repetitive
        (5, rep + "z", "https://A.COM:443/5"), # repetitive, url canonical-first
        (6, rep + "q", "https://a.com/5"),     # url dup + near dup + repetitive
        (7, rep + "w", "https://a.com/7"),     # near dup + repetitive
        (8, clean_b, "https://a.com/8"),       # nothing -> kept
        (9, rep + "v", "https://a.com/9"),     # repetitive only
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, url string")
    pairs = spark.createDataFrame([(5, 6), (5, 7)], "doc_a bigint, doc_b bigint")
    got = curation_decisions(docs, F.col("url"), pairs).collect()
    out = {r["doc_id"]: r["decision"] for r in got}
    kept = {r["doc_id"]: r["kept"] for r in got}
    assert out[0] == "kept"
    assert out[1] == "removed_exact"           # exact keep-first
    assert out[2] == "removed_url_dup"         # url beats repetitive
    assert out[3] == "removed_exact"           # exact beats repetitive
    assert out[5] == "removed_repetitive"      # url canonical-first, so rep fires
    assert out[6] == "removed_url_dup"         # url beats near + repetitive
    assert out[7] == "removed_near_dup"        # near beats repetitive
    assert out[8] == "kept"
    assert out[9] == "removed_repetitive"
    assert kept[8] == 1 and kept[9] == 0 and sum(kept.values()) == 2


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dup_keep_first(spark):
    # two tight planted directions + one orthogonal singleton; any cell
    # assignment groups identical directions together, so keep-first
    # must flag exactly the later ids of each direction.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),   # ~ duplicate of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.001, 0.0]),   # ~ duplicate of 2
        (4, [0.0, 0.0, 0.0, 1.0]),     # singleton
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {
        r["vid"]: r
        for r in semantic_dup_flags(df, n_cells=5, tau_micro=990_000).collect()
    }
    assert not out[0]["is_dup"] and out[0]["dup_of"] == -1
    assert out[1]["is_dup"] and out[1]["dup_of"] == 0
    assert not out[2]["is_dup"]
    assert out[3]["is_dup"] and out[3]["dup_of"] == 2
    assert not out[4]["is_dup"] and out[4]["dup_of"] == -1


def test_degenerate_urls_never_merge(spark):
    """Unparseable / empty / protocol-relative urls must not collapse
    into one dup group (pre-r5 they all canonicalized to the literal
    'https://' and were removed as duplicates of each other)."""
    rows = [
        (1, "//cdn.example.com/a.js"),
        (2, ""),
        (3, "//other.org/x"),
        (4, "/relative/path"),
        (5, None),
        (6, "//cdn.example.com/a.js"),  # true dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = url_dup_groups(df).collect()
    assert len(got) == 1
    assert got[0]["url_canon"] == "https://cdn.example.com/a.js"
    assert got[0]["n_docs"] == 2 and got[0]["rep_doc_id"] == 1


def test_canonical_url_degenerate_cases(spark):
    from destor_spark.operators.curation import canonical_url

    rows = [
        ("//host.com/p", "https://host.com/p"),  # protocol-relative parses
        ("/only/path", "/only/path"),            # host-less -> raw
        ("?q=1", "?q=1"),
        ("", None),                              # empty -> NULL
    ]
    for raw, want in rows:
        got = (
            spark.range(1)
            .select(canonical_url(F.lit(raw)).alias("c"))
            .collect()[0]["c"]
        )
        assert got == want, (raw, got)
