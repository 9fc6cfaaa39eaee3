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
