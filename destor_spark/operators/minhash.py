"""MinHash signatures + LSH band keys as one Arrow-vectorized UDF.

destor analogue: min-fingerprint feature sampling per segment
(index_sampling_min, /root/reference/src/index/sampling_method.c:12-76)
— each of num_hashes permutations keeps its minimum shingle hash; a
band of r rows folds into one bucket key (the "feature" that the kv
index would store, /root/reference/src/index/kvstore_htable.c:156-168).

One pandas UDF per document batch: shingle-mix (rolling polynomial over
token hashes), MinHash permutations, band-key folding — all numpy
uint64 from destor_spark.hashing, shared verbatim with the pandas
oracle, so Spark-vs-oracle signature equality is by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from destor_spark import hashing as H
from destor_spark.config import DedupConfig

SIG_SCHEMA = (
    "sig array<bigint>, band_keys array<bigint>, n_shingles int, "
    "simhash bigint"
)


def doc_signature(
    token_hashes: np.ndarray, cfg: DedupConfig, a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(sig int64[num_hashes], band_keys int64[bands], n_shingles, simhash).

    SimHash is computed over the SHINGLE-hash set, not raw tokens:
    with a Zipf vocabulary unrelated documents share the top-frequency
    tokens, so token-level frequency-weighted SimHash collapses
    unrelated pages into one Hamming ball; shingles are near-unique
    across unrelated docs and still robust to sub-shingle noise.
    """
    sh = H.shingle_hashes(H.to_unsigned(token_hashes), cfg.shingle_size)
    sig = H.minhash_signature(sh, a, b)
    bk = H.band_keys(sig, cfg.bands, cfg.rows)
    return H.to_signed(sig), H.to_signed(bk), int(sh.shape[0]), H.simhash64(sh)


def make_signature_udf(cfg: DedupConfig):
    a, b = H.minhash_params(cfg.num_hashes, cfg.seed)

    @pandas_udf(SIG_SCHEMA)
    def signature_udf(token_hashes: pd.Series) -> pd.DataFrame:
        sigs, bands, counts, simhashes = [], [], [], []
        for th in token_hashes:
            th = np.asarray(th, dtype=np.int64) if th is not None else np.empty(0, np.int64)
            s, bk, n, sh = doc_signature(th, cfg, a, b)
            sigs.append(s)
            bands.append(bk)
            counts.append(n)
            simhashes.append(sh)
        return pd.DataFrame(
            {
                "sig": sigs,
                "band_keys": bands,
                "n_shingles": counts,
                "simhash": simhashes,
            }
        )

    return signature_udf


def with_signatures(df: DataFrame, cfg: DedupConfig,
                    token_col: str = "token_hashes") -> DataFrame:
    """Adds sig/band_keys/n_shingles/simhash columns; drops the token array."""
    udf = make_signature_udf(cfg)
    out = df.withColumn("_s", udf(F.col(token_col)))
    return (
        out.withColumn("sig", F.col("_s.sig"))
        .withColumn("band_keys", F.col("_s.band_keys"))
        .withColumn("n_shingles", F.col("_s.n_shingles"))
        .withColumn("simhash", F.col("_s.simhash"))
        .drop("_s", token_col)
    )
