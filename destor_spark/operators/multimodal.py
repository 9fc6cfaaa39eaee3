"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque `binary` columns with typed metadata, processed
by Arrow-batched `mapInPandas` stages.  The actual codecs (PIL/ffmpeg
etc.) are NOT in this container, so the decode step is a deterministic
stub (gated behind an import-try); everything Spark-side — schema,
partitioning, UDF signature, batch shape — is real and tested
(tests/test_multimodal.py).

destor analogue: chunks carry opaque `data` byte payloads through every
phase while the pipeline operates on metadata + fingerprints
(/root/reference/src/destor.h:287-293); simulation levels run the whole
metadata path without touching payload bytes
(/root/reference/src/destor.h:55-59) — exactly what the stub decode
reproduces.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, payload_sha string, "
    "feature array<float>"
)

try:  # real decoders unavailable in this container — stub path below
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake 'decode': derives a pseudo-feature from bytes.

    Real deployments replace this with PIL/torchaudio/ffmpeg decode +
    model features; the Spark plumbing (Arrow batches, schema,
    partition-level iteration) is identical either way.
    """
    if HAVE_PIL and kind == "image":
        raise NotImplementedError(
            "real image decode not wired in this sandbox"
        )
    arr = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    return (arr.reshape(8, 32).mean(axis=1) / 255.0).astype(np.float32)


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """binary payload -> fixed-dim feature vector via mapInPandas.

    One Arrow batch per iteration keeps executor memory bounded
    regardless of payload size (contrast per-row Python UDFs, which
    would pickle every blob separately).
    """
    import hashlib

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                p = bytes(payload) if payload is not None else b""
                feats.append(_decode_stub(p, kind))
                shas.append(hashlib.sha256(p).hexdigest())
                sizes.append(len(p))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "payload_sha": shas,
                    "feature": feats,
                }
            )

    return media.mapInPandas(_run, schema=FEATURE_SCHEMA)


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Identical payloads collapse on sha256 — destor's whole-file dedup
    (/root/reference/src/chunk_phase.c:160-170) applied to media blobs."""
    from pyspark.sql import functions as F

    return (
        features.groupBy("payload_sha")
        .agg(
            F.count("*").alias("copies"),
            F.min("media_id").alias("canonical_media_id"),
        )
        .filter(F.col("copies") >= 2)
    )
