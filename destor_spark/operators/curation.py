"""Corpus-curation operators for web-scale training-data pipelines.

The filters a Common-Crawl-style pipeline runs BETWEEN extraction and
near-dup clustering: within-document repetition scoring (the Gopher
rules), corpus-wide duplicated-segment detection (the CCNet
paragraph-hash pass, re-expressed over fixed word windows because the
synthetic corpus is single-paragraph), URL canonicalization for
crawl-level dedup, and SemDeDup-style semantic dedup over an embedding
column.

Every operator is built from JVM whole-stage-codegen expressions
(split / transform / explode / window) so each has an exactly
equivalent DuckDB SQL twin in destor_spark/queries.py — the same
portability rules as the rest of the query surface (md5 hashing,
integer ppm units, identical tie-breaks).

destor analogues: within-doc repetition ~ in-container duplicate check
(/root/reference/src/backup/filter_phase.c index-buffer hit path);
segment dedup ~ the whole chunk-fingerprint dedup loop restated at
segment granularity; URL canonicalization ~ the path normalization the
trace readers apply to file ids before hashing
(/root/reference/src/fsl/ reader key handling); semantic dedup ~
similarity-index lookup with a cosine predicate instead of feature
equality (/root/reference/src/index/similarity index lookups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from destor_spark.operators.textstats import tokens

# Gopher-style repetition thresholds (Rae et al. 2021, table A1 uses
# 0.18 for the top-2-gram character fraction; the duplicate-token cap
# is our whitespace-token restatement of the duplicate-line rule —
# calibrated to the synthetic corpus's small vocabulary, where the
# natural-text 0.30 would flag 85% of documents; 0.70 sits at its p99).
# Embedded verbatim in the oracle SQL — do not edit one side only.
TOP_BIGRAM_PPM_MAX = 180_000
DUP_TOKEN_PPM_MAX = 700_000

# Non-overlapping word-window width for the segment-dedup pass (the
# "paragraph" unit: the synthetic corpus has no newlines, so the
# segmenting is fixed-width — destor's fixed segmenting, G1).
SEGMENT_W = 8

# Tracking params stripped by URL canonicalization (lowercase match).
_TRACKING_RE = "^(utm_[a-z]+|ref|fbclid|gclid)="


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition scores + keep/flag decision (Gopher).

    dup_token_ppm   = 1e6 * (n_tokens - n_distinct_tokens) / n_tokens
    top_bigram_ppm  = 1e6 * max_bg(count(bg) * length(bg)) / n_chars
                      (characters covered by all occurrences of the
                      most character-heavy repeated word 2-gram)
    repetitive      = either score above its threshold

    Plan shape: one scan; bigrams explode into (doc_id, bg) and combine
    map-side before the single shuffle on doc_id; docs shorter than two
    tokens survive via the left join with both scores 0.  No Python, no
    window over the corpus — scales as a pair of hash aggregations.
    """
    w = tokens(F.col(text_col))
    base = df.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.length(text_col).alias("n_chars"),
        w.alias("_w"),
    )
    # size guard BEFORE sequence(): Spark's sequence(1, 0) descends to
    # [1, 0] rather than returning empty, so a 1-token doc must never
    # reach the transform (the left join below restores filtered docs).
    bigrams = (
        base.filter(F.size("_w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_w") - 1),
                    lambda i: F.array_join(F.slice(F.col("_w"), i, 2), " "),
                )
            ).alias("bg"),
        )
    )
    top_bg = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max(F.col("cnt") * F.length("bg")).alias("top_bg_chars"))
    )
    one_tok = F.greatest(F.col("n_tokens"), F.lit(1))
    one_chr = F.greatest(F.col("n_chars"), F.lit(1))
    dup_ppm = (
        F.round(F.lit(1_000_000) * (F.col("n_tokens") - F.col("n_distinct")) / one_tok)
        .cast("bigint")
    )
    bg_ppm = (
        F.round(
            F.lit(1_000_000)
            * F.coalesce(F.col("top_bg_chars"), F.lit(0))
            / one_chr
        ).cast("bigint")
    )
    return (
        base.drop("_w")
        .join(top_bg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            dup_ppm.alias("dup_token_ppm"),
            bg_ppm.alias("top_bigram_ppm"),
            (
                (dup_ppm > F.lit(DUP_TOKEN_PPM_MAX))
                | (bg_ppm > F.lit(TOP_BIGRAM_PPM_MAX))
            ).alias("repetitive"),
        )
    )


def doc_segments(df: DataFrame, text_col: str = "text", w: int = SEGMENT_W) -> DataFrame:
    """Explode each document into (doc_id, pos, seg_hash): md5 of each
    non-overlapping w-word window.  Docs shorter than w words yield no
    segments (the caller's left join restores them)."""
    base = df.select("doc_id", tokens(F.col(text_col)).alias("_w")).filter(
        F.size("_w") >= w  # sequence(1, 0) descends in Spark — guard first
    )
    segs = F.transform(
        F.sequence(F.lit(1), F.floor(F.size("_w") / w).cast("int")),
        lambda i: F.md5(F.array_join(F.slice(F.col("_w"), (i - 1) * w + 1, w), " ")),
    )
    return base.select(
        "doc_id", F.posexplode(segs).alias("pos", "seg_hash")
    ).select("doc_id", (F.col("pos") + 1).alias("pos"), "seg_hash")


def segment_dedup_stats(
    df: DataFrame, text_col: str = "text", w: int = SEGMENT_W
) -> DataFrame:
    """Corpus-wide duplicated-segment accounting, keep-first semantics
    (CCNet's paragraph-hash dedup over fixed word windows).

    A segment INSTANCE is a duplicate iff the same md5 occurs earlier
    in corpus order (doc_id, pos) — exactly destor's first-occurrence
    write decision restated per segment.  One shuffle on seg_hash for
    the keep-first window, one on doc_id for the rollup; the hash keys
    are uniform so neither skews at scale.
    """
    segs = doc_segments(df, text_col, w)
    rn = F.row_number().over(
        Window.partitionBy("seg_hash").orderBy("doc_id", "pos")
    )
    per_doc = (
        segs.withColumn("_rn", rn)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("_rn") > 1).cast("bigint")).alias("n_dup_segments"),
        )
    )
    out = df.select("doc_id").join(per_doc, "doc_id", "left")
    n_seg = F.coalesce(F.col("n_segments"), F.lit(0))
    n_dup = F.coalesce(F.col("n_dup_segments"), F.lit(0))
    return out.select(
        "doc_id",
        n_seg.alias("n_segments"),
        n_dup.alias("n_dup_segments"),
        F.round(F.lit(1_000_000) * n_dup / F.greatest(n_seg, F.lit(1)))
        .cast("bigint")
        .alias("dup_seg_ppm"),
    )


def _doc_segments_with_text(
    df: DataFrame, text_col: str, w: int
) -> DataFrame:
    """(doc_id, pos, seg, seg_hash) — like doc_segments but carrying the
    segment's text so a cleaned corpus can be reconstructed."""
    base = df.select("doc_id", tokens(F.col(text_col)).alias("_w")).filter(
        F.size("_w") >= w
    )
    segs = F.transform(
        F.sequence(F.lit(1), F.floor(F.size("_w") / w).cast("int")),
        lambda i: F.array_join(F.slice(F.col("_w"), (i - 1) * w + 1, w), " "),
    )
    return base.select(
        "doc_id", F.posexplode(segs).alias("pos", "seg")
    ).select(
        "doc_id", (F.col("pos") + 1).alias("pos"), "seg",
        F.md5("seg").alias("seg_hash"),
    )


def remove_duplicate_segments(
    df: DataFrame, text_col: str = "text", w: int = SEGMENT_W
) -> DataFrame:
    """CCNet's actual dedup step: REBUILD each document with its
    corpus-duplicated segments removed (keep-first by (doc_id, pos),
    same rule as segment_dedup_stats), the trailing <w-word remainder
    always kept.  Returns (doc_id, n_kept_segments, clean_text).

    For a single-space-tokenized document with no duplicated segments
    the reconstruction is byte-identical to the input (test-pinned) —
    the destor restore-path guarantee (byte-equal reconstruction from
    kept chunks) restated at segment granularity.

    Plan: one keep-first window on the uniform seg_hash key, one
    doc_id aggregation whose per-doc state is the kept-segment list
    (bounded by the document's own length), one left join back onto
    the token spine.  No corpus-wide sort, no Python.
    """
    base = df.select(
        "doc_id",
        F.col(text_col).alias("_t"),
        tokens(F.col(text_col)).alias("_w"),
    ).withColumn("_nseg", F.floor(F.size("_w") / w).cast("int"))
    segs = _doc_segments_with_text(df, text_col, w)
    rn = F.row_number().over(
        Window.partitionBy("seg_hash").orderBy("doc_id", "pos")
    )
    kept = (
        segs.withColumn("_r", rn)
        .filter(F.col("_r") == 1)
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "seg"))).alias("_ks")
        )
    )
    kept_str = F.when(
        F.col("_ks").isNotNull(),
        F.array_join(F.transform(F.col("_ks"), lambda x: x["seg"]), " "),
    ).otherwise(F.lit(""))
    tail_str = F.array_join(
        F.slice(
            F.col("_w"),
            F.col("_nseg") * w + 1,
            F.greatest(F.size("_w") - F.col("_nseg") * w, F.lit(0)),
        ),
        " ",
    )
    clean = F.array_join(
        F.filter(F.array(kept_str, tail_str), lambda x: x != F.lit("")), " "
    )
    return (
        base.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_ks").isNotNull(), F.size("_ks"))
            .otherwise(F.lit(0))
            .alias("n_kept_segments"),
            clean.alias("clean_text"),
        )
    )


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL for crawl-level dedup, as a pure Column
    expression (regexp/split/sort builtins shared verbatim with the
    DuckDB oracle; no lookahead so Java regex and RE2 agree):

      1. drop the fragment
      2. scheme normalized to https (crawl dedup treats the schemes as
         one resource)
      3. host lowercased, default :80/:443 ports and a leading www.
         stripped
      4. path: trailing slash stripped
      5. query: tracking params (utm_*, ref, fbclid, gclid) dropped,
         the rest sorted bytewise and re-joined
    """
    no_frag = F.regexp_replace(url, "#.*", "")
    after = F.regexp_replace(no_frag, "^[A-Za-z]+://", "")
    hostport = F.lower(F.regexp_extract(after, "^([^/?]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":(80|443)$", ""), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.regexp_extract(after, r"^[^/?]+([^?]*)", 1), "/+$", ""
    )
    query = F.regexp_extract(after, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit(""))
            & ~p.rlike(_TRACKING_RE),
        )
    )
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )


def url_dup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Group documents by canonical URL; emit groups with >1 member
    (url_canon, n_docs, rep_doc_id = smallest doc_id).  One hash
    aggregation on the canonical string — uniform keys, scale-safe."""
    return (
        df.select("doc_id", canonical_url(F.col(url_col)).alias("url_canon"))
        .groupBy("url_canon")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# Decontamination gram width: 13 tokens is the published convention
# (GPT-3 appendix C / PaLM / Llama use 8-13-token collision windows).
DECON_N = 13


def decontamination_flags(
    docs: DataFrame, benchmark: DataFrame, n: int = DECON_N
) -> DataFrame:
    """Train/test decontamination: flag every training document that
    shares ANY n-token gram with the benchmark relation.

    benchmark: DataFrame with a `text` column (the held-out eval set).
    Returns (doc_id, n_hits, contaminated) where n_hits counts the
    DISTINCT benchmark grams the doc collides with.

    Scale shape: the benchmark side is small by construction (eval sets
    are millions of grams, not trillions), so its distinct gram-hash
    set BROADCASTS and the probe is a map-side hash join on the
    exploded corpus grams — one corpus scan, no corpus shuffle except
    the per-doc count agg.  destor analogue: the in-memory fingerprint
    index probed per chunk (/root/reference/src/index/index.c lookup
    path) with the index roles reversed (small reference set, huge
    probe stream).
    """

    def _grams(df: DataFrame, id_cols: list[str]) -> DataFrame:
        toks = tokens(F.col("text"))
        base = df.select(*id_cols, toks.alias("_w")).filter(
            F.size("_w") >= n  # sequence(1, 0) descends in Spark
        )
        g = F.transform(
            F.sequence(F.lit(1), F.size("_w") - F.lit(n - 1)),
            lambda i: F.md5(F.array_join(F.slice(F.col("_w"), i, n), " ")),
        )
        return base.select(
            *id_cols, F.explode(F.array_distinct(g)).alias("g")
        )

    bench_grams = _grams(benchmark, []).distinct()
    hits = (
        _grams(docs, ["doc_id"])
        .join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def curation_decisions(
    docs: DataFrame, url: Column, near_pairs: DataFrame
) -> DataFrame:
    """Single-pass curation verdict per document with fixed precedence:

        removed_exact      md5(text) seen at a smaller doc_id
        removed_url_dup    canonical URL seen at a smaller doc_id
        removed_near_dup   appears as doc_b in near_pairs (doc_a < doc_b
                           by the pair generator's convention)
        removed_repetitive Gopher repetition flag
        kept               none of the above

    Cascades are deliberately not re-resolved (a URL-dup's keeper may
    itself be an exact dup): production curation stages run
    independently and union their removal sets.  Plan: two keep-first
    windows on uniform keys (md5, canonical url), the pair relation's
    own shuffle, then broadcast-sized left joins onto the doc spine.
    destor analogue: the filter-phase decision enum
    (/root/reference/src/backup/filter_phase.c) — one labeled verdict
    per chunk, here per document.
    """

    def _keep_first_removals(keyed: DataFrame, flag: str) -> DataFrame:
        rn = F.row_number().over(Window.partitionBy("k").orderBy("doc_id"))
        return (
            keyed.withColumn("_r", rn)
            .filter(F.col("_r") > 1)
            .select("doc_id", F.lit(1).alias(flag))
        )

    exact_rm = _keep_first_removals(
        docs.select("doc_id", F.md5("text").alias("k")), "f_exact"
    )
    url_rm = _keep_first_removals(
        docs.select("doc_id", canonical_url(url).alias("k")), "f_url"
    )
    near_rm = (
        near_pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("f_near", F.lit(1))
    )
    rep = repetition_features(docs).select(
        "doc_id", F.col("repetitive").cast("int").alias("f_rep")
    )
    decision = (
        F.when(F.col("f_exact") == 1, F.lit("removed_exact"))
        .when(F.col("f_url") == 1, F.lit("removed_url_dup"))
        .when(F.col("f_near") == 1, F.lit("removed_near_dup"))
        .when(F.col("f_rep") == 1, F.lit("removed_repetitive"))
        .otherwise(F.lit("kept"))
    )
    return (
        docs.select("doc_id")
        .join(exact_rm, "doc_id", "left")
        .join(url_rm, "doc_id", "left")
        .join(near_rm, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .select(
            "doc_id",
            decision.alias("decision"),
            (decision == "kept").cast("int").alias("kept"),
        )
    )


def semantic_dup_flags(
    emb: DataFrame,
    n_cells: int = 16,
    tau_micro: int = 850_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup: IVF-cell-partitioned keep-first.

    Vectors are assigned to their nearest md5-sampled IVF centroid
    (operators/ann.ivf_centroids / ivf_assign — the same quantizer the
    ANN query uses, so the cell restriction is already oracle-proven);
    within a cell, a vector is a semantic duplicate iff an EARLIER
    (smaller id) cell-mate has integer micro-cosine >= tau_micro, and
    dup_of is the smallest such id (-1 when none — no NULLs so the
    driver value-hash can't drift on NaN/None formatting).

    Scale shape: candidate pairs exist only inside a cell, so the
    quadratic verify is bounded per cell exactly like an LSH bucket —
    at 10^12 docs, n_cells grows ~sqrt(N) and the hot-cell guard is the
    same cap/star rule the LSH pass uses; this fixture-sized variant
    keeps the plain within-cell self-join the oracle mirrors.
    """
    from destor_spark.operators.ann import cosine_sim, ivf_assign, ivf_centroids

    cents = ivf_centroids(emb, n_cells, id_col, vec_col)
    cells = ivf_assign(emb, cents, nprobe=1, id_alias="vid", id_col=id_col, vec_col=vec_col)
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    m = cells.join(v, "vid")
    a = m.select(
        F.col("vid").alias("a_id"), F.col("cell"), F.col("_v").alias("_va")
    )
    b = m.select(
        F.col("vid").alias("b_id"), F.col("cell"), F.col("_v").alias("_vb")
    )
    msim = (
        F.round(cosine_sim(F.col("_va"), F.col("_vb")) * 1_000_000)
        .cast("bigint")
    )
    dups = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(msim >= F.lit(tau_micro))
        .groupBy(F.col("b_id").alias("vid"))
        .agg(F.min("a_id").alias("dup_of"))
    )
    return (
        cells.join(dups, "vid", "left")
        .select(
            "vid",
            "cell",
            F.coalesce(F.col("dup_of"), F.lit(-1)).alias("dup_of"),
            (F.col("dup_of").isNotNull()).alias("is_dup"),
        )
    )
