"""Multimodal plumbing: binary payload columns through mapInPandas
feature extraction + exact media dedup (decode itself is stubbed —
the libs aren't in this container — but schema/batching/dedup are real)."""

from __future__ import annotations

import numpy as np

from destor_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    exact_media_dedup,
    extract_features,
)


def _media_df(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        payload = bytes(rng.integers(0, 256, size=512, dtype=np.uint8))
        rows.append((i, "image", payload, "image/fake", 64, 64, None))
    # two exact duplicate payloads of row 0
    rows.append((100, "image", rows[0][2], "image/fake", 64, 64, None))
    rows.append((101, "image", rows[0][2], "image/fake", 64, 64, None))
    # an audio row with empty payload
    rows.append((102, "audio", b"", "audio/fake", None, None, 1000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_shape(spark):
    media = _media_df(spark)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 43
    for r in rows:
        assert len(r["feature"]) == 8
        assert len(r["payload_sha"]) == 64
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[0]["feature"] == by_id[100]["feature"]
    assert by_id[0]["payload_sha"] == by_id[101]["payload_sha"]


def test_exact_media_dedup(spark):
    feats = extract_features(_media_df(spark))
    dups = exact_media_dedup(feats).collect()
    assert len(dups) == 1
    assert dups[0]["copies"] == 3
    assert dups[0]["canonical_media_id"] == 0


# --- golden tests over REAL media payloads (committed fixtures) ------

import hashlib
import pathlib

import pytest

from destor_spark.operators.multimodal import sniff_media, with_media_metadata

MEDIA_FIX = pathlib.Path(__file__).parent / "fixtures" / "media"

# (file, sha256, mime, width, height, duration_ms) — hand-audited:
# tiny.png is a decodable 2x3 RGB PNG built chunk-by-chunk, dot.gif a
# valid 1x1 GIF89a, tone.wav 50 ms of 8 kHz mono 16-bit audio written
# by the stdlib wave module, header_only.jpg a JFIF+SOF0 marker stream
GOLDEN = [
    ("tiny.png", "448fe5451f1b457d", "image/png", 2, 3, None),
    ("dot.gif", "6c63cc5063ac82d8", "image/gif", 1, 1, None),
    ("header_only.jpg", "8b98ed10df55a2d9", "image/jpeg", 10, 7, None),
    ("tone.wav", "5d6c198ef4804bcd", "audio/wav", None, None, 50),
]


@pytest.mark.parametrize("name,sha16,mime,w,h,dur", GOLDEN)
def test_sniff_real_payload_golden(name, sha16, mime, w, h, dur):
    b = (MEDIA_FIX / name).read_bytes()
    assert hashlib.sha256(b).hexdigest()[:16] == sha16  # fixture pinned
    assert sniff_media(b) == (mime, w, h, dur)


def test_media_metadata_through_spark(spark):
    """The real header sniffing runs through the Arrow mapInPandas
    plumbing: typed metadata columns filled from real payload bytes."""
    rows = [
        (i, "image" if n.endswith((".png", ".gif", ".jpg")) else "audio",
         (MEDIA_FIX / n).read_bytes(), None, None, None, None)
        for i, (n, *_rest) in enumerate(GOLDEN)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in with_media_metadata(df).collect()}
    for i, (_n, _s, mime, w, h, dur) in enumerate(GOLDEN):
        r = got[i]
        assert (r["mime"], r["width"], r["height"], r["duration_ms"]) == (
            mime, w, h, dur,
        )


def test_real_payload_feature_contract(spark):
    """extract_features over a REAL image payload: sha256 of the actual
    bytes, stable feature dim — the contract a codec-backed decode must
    preserve (the real-decode hook is decode_media, never auto-wired)."""
    b = (MEDIA_FIX / "tiny.png").read_bytes()
    df = spark.createDataFrame(
        [(1, "image", b, "image/png", 2, 3, None)], MEDIA_SCHEMA
    )
    r = extract_features(df).collect()[0]
    assert r["payload_sha"] == hashlib.sha256(b).hexdigest()
    assert r["n_bytes"] == len(b)
    assert len(r["feature"]) == 8


def test_sniff_adversarial_headers_clamp_to_none():
    """Raw uint32 header fields outside Int32 must sniff as unknown, not
    poison the Arrow batch (pd.array Int32 'cannot safely cast')."""
    import struct

    # PNG claiming width 3,000,000,000
    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(
        ">II", 3_000_000_000, 7
    ) + b"\x08\x02\x00\x00\x00"
    assert sniff_media(png) == ("image/png", None, 7, None)

    # WAV with byte_rate=1 and data_size=0xFFFFFFF0 -> ~4e12 ms duration
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 1, 1, 8
    )
    data = b"data" + struct.pack("<I", 0xFFFFFFF0)
    wav = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + fmt + data
    assert sniff_media(wav) == ("audio/wav", None, None, None)


def test_sniff_jpeg_fill_bytes_and_standalone_markers():
    """0xFF padding and length-less RST/SOI markers must not desync the
    marker walk; seglen < 2 must bail instead of mis-advancing."""
    import struct

    def seg(marker, body=b""):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof0 = seg(0xC0, b"\x08" + struct.pack(">HH", 7, 10) + b"\x03")
    # fill bytes before APP0, a standalone RST marker, then SOF0
    jpg = (
        b"\xff\xd8" + b"\xff\xff\xff" + seg(0xE0, b"JFIF\x00")
        + b"\xff\xd0" + sof0 + b"\xff\xd9"
    )
    assert sniff_media(jpg) == ("image/jpeg", 10, 7, None)

    # malformed seglen=0 would loop/mis-advance: must bail to unknown
    bad = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 0) + b"junk"
    assert sniff_media(bad) == ("image/jpeg", None, None, None)


def test_metadata_stage_survives_adversarial_batch(spark):
    """One corrupt payload downgrades its row, not the whole stage."""
    import struct

    bad_png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(
        ">II", 3_000_000_000, 3_000_000_000
    ) + b"\x08"
    good = (MEDIA_FIX / "dot.gif").read_bytes()
    df = spark.createDataFrame(
        [
            (1, "image", bad_png, None, None, None, None),
            (2, "image", good, None, None, None, None),
        ],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in with_media_metadata(df).collect()}
    assert got[1]["mime"] == "image/png"
    assert got[1]["width"] is None and got[1]["height"] is None
    assert (got[2]["mime"], got[2]["width"], got[2]["height"]) == (
        "image/gif", 1, 1,
    )


def test_media_fixture_regenerates_deterministically():
    """The committed media_fixture.parquet must equal a fresh
    make_media_table() — the driver oracle depends on this file."""
    import pandas as pd

    from destor_spark.queries import _MEDIA_FIXTURE
    from destor_spark.synth import make_media_table

    committed = pd.read_parquet(_MEDIA_FIXTURE)
    fresh = make_media_table()
    committed["payload"] = committed["payload"].map(bytes)
    fresh["payload"] = fresh["payload"].map(bytes)
    pd.testing.assert_frame_equal(committed, fresh)


def test_exact_media_dedup_matches_duckdb(spark):
    """Driver-gate twin: the sha256 group-by equals BLOB-equality
    group-by in DuckDB over the committed fixture."""
    import duckdb
    import pandas as pd

    from destor_spark.queries import SQL_EXACT_MEDIA_DEDUP, q_exact_media_dedup

    sp = (
        q_exact_media_dedup(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("canonical_media_id")
        .reset_index(drop=True)
    )
    du = (
        duckdb.sql(SQL_EXACT_MEDIA_DEDUP)
        .df()
        .sort_values("canonical_media_id")
        .reset_index(drop=True)
    )
    assert len(sp) == 12
    pd.testing.assert_frame_equal(sp[du.columns.tolist()], du, check_dtype=False)


def test_jpeg_trailing_fill_run():
    """A JPEG payload ending inside a 0xFF fill run must sniff as
    image/jpeg (valid SOI prefix), not raise IndexError."""
    from destor_spark.operators.multimodal import sniff_media

    assert sniff_media(b"\xff\xd8\xff\xff") == ("image/jpeg", None, None, None)
    assert sniff_media(b"\xff\xd8\xff") == ("image/jpeg", None, None, None)
