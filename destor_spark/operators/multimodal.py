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

def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """REAL decode hook — intentionally unimplemented in this container
    (no PIL/torchaudio/ffmpeg here).  Production wires the codec stack
    in HERE (decode + model features, returning a float32 vector);
    nothing on the stub pipeline calls it, so merely having a codec
    library importable can never flip the default path into a crash.
    """
    raise NotImplementedError(
        "real media decode not wired in this sandbox; see _decode_stub"
    )


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake 'decode': derives a pseudo-feature from bytes.

    Real deployments replace this with decode_media; the Spark
    plumbing (Arrow batches, schema, partition-level iteration) is
    identical either way.
    """
    arr = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    return (arr.reshape(8, 32).mean(axis=1) / 255.0).astype(np.float32)


def sniff_media(payload: bytes | None) -> tuple[str, int | None, int | None, int | None]:
    """REAL media metadata from container headers — no codec needed.
    Returns (mime, width, height, duration_ms); unknowns are None.

    PNG (IHDR), GIF (logical screen descriptor), JPEG (SOF0/1/2 marker
    scan), and WAV (RIFF fmt/data chunks) are parsed from the actual
    byte layout, so the "typed metadata" columns of MEDIA_SCHEMA are
    populated from real payloads (golden-tested against committed real
    files in tests/test_multimodal.py) even though pixel/sample DECODE
    stays stubbed in this container.
    """
    import struct

    def _i32(v: int | None) -> int | None:
        # adversarial headers carry raw uint32 values (PNG width
        # 3e9, WAV duration ~4e12 ms with byte_rate=1); out-of-range
        # values would make pd.array(dtype='Int32') raise and fail the
        # whole mapInPandas batch — clamp to "unknown" instead.
        return v if v is not None and 0 <= v <= 0x7FFFFFFF else None

    if not payload:
        return ("application/octet-stream", None, None, None)
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return ("image/png", _i32(w), _i32(h), None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("image/gif", _i32(w), _i32(h), None)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < len(b):
            if b[i] != 0xFF:
                break  # desynced from the marker stream
            # consume 0xFF fill/padding bytes before the marker id
            while i + 1 < len(b) and b[i + 1] == 0xFF:
                i += 1
            if i + 1 >= len(b):
                break  # payload ends inside a 0xFF fill run
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone marker: no length field
                continue
            if i + 4 > len(b):
                break
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if seglen < 2:
                break  # malformed length would mis-advance the walk
            if marker in (0xC0, 0xC1, 0xC2) and i + 9 <= len(b):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("image/jpeg", _i32(w), _i32(h), None)
            i += 2 + seglen
        return ("image/jpeg", None, None, None)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        byte_rate = data_size = None
        i = 12
        while i + 8 <= len(b):
            cid, clen = b[i : i + 4], struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 16 + 8 <= len(b):
                byte_rate = struct.unpack("<I", b[i + 16 : i + 20])[0]
            elif cid == b"data":
                data_size = clen
            i += 8 + clen + (clen & 1)
        dur = (
            _i32(int(round(1000 * data_size / byte_rate)))
            if byte_rate and data_size is not None
            else None
        )
        return ("audio/wav", None, None, dur)
    return ("application/octet-stream", None, None, None)


def with_media_metadata(media: DataFrame) -> DataFrame:
    """Fill mime/width/height/duration_ms from the payload headers via
    one Arrow-batched mapInPandas pass (schema = MEDIA_SCHEMA)."""

    def _sniff_safe(p):
        # one adversarial payload must downgrade one ROW, not fail the
        # whole Arrow batch (same belt-and-braces as the HTML extractor)
        try:
            return sniff_media(p)
        except Exception:
            return ("application/octet-stream", None, None, None)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _sniff_safe(p) for p in pdf["payload"]
            ]
            out = pdf.copy()
            out["mime"] = [m[0] for m in metas]
            out["width"] = pd.array(
                [m[1] for m in metas], dtype="Int32"
            )
            out["height"] = pd.array(
                [m[2] for m in metas], dtype="Int32"
            )
            out["duration_ms"] = pd.array(
                [m[3] for m in metas], dtype="Int32"
            )
            yield out

    return media.mapInPandas(_run, schema=MEDIA_SCHEMA)


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
            zero = np.zeros(8, dtype=np.float32)
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                p = bytes(payload) if payload is not None else b""
                try:
                    feats.append(_decode_stub(p, kind))
                except Exception:
                    # one undecodable payload degrades one ROW to the
                    # zero feature (cosine_sim defines its sim as 0,
                    # so it never near-dups) instead of failing the
                    # whole Arrow batch
                    feats.append(zero)
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
            F.min("n_bytes").alias("n_bytes"),
        )
        .filter(F.col("copies") >= 2)
    )
