"""Tokenize + token hashing, fully JVM-side (whole-stage codegen).

destor analogue: the chunking + SHA-1 fingerprinting phases
(/root/reference/src/chunk_phase.c, /root/reference/src/hash_phase.c:25-28).
Documents replace the byte stream; word tokens replace chunks; the
shingle mix happens downstream in numpy (hashing.shingle_hashes) so the
pandas oracle shares the exact code path.

Everything here is built-in pyspark.sql.functions — no Python in the
hot path; ``.explain`` shows one WholeStageCodegen span over
split/filter/transform/xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java \s is ASCII-only — oracle.tokenize mirrors this with
# re.compile(r"\s+", re.ASCII); a Python Unicode \s would also split
# on \xa0/U+2000-range spaces, which the extractor deliberately
# preserves as rendered characters
TOKEN_SPLIT_RE = r"\s+"


def tokens_col(text: Column) -> Column:
    """text -> array<string> of non-empty whitespace-separated tokens."""
    return F.filter(F.split(text, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def token_hashes_col(tokens: Column) -> Column:
    """array<string> -> array<long> via xxhash64 (seed 42, JVM codegen)."""
    return F.transform(tokens, lambda t: F.xxhash64(t))


def with_token_hashes(
    df: DataFrame, text_col: str = "text", out_col: str = "token_hashes"
) -> DataFrame:
    return df.withColumn(out_col, token_hashes_col(tokens_col(F.col(text_col))))
