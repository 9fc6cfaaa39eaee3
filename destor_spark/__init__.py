"""destor_spark — a from-scratch PySpark-native near-duplicate detection
and clustering engine for web text.

Reimagines the capabilities of destor (FAST'15 chunk-level backup
deduplication, reference at /root/reference) as document-scale dedup
over tables of Common-Crawl-style web pages:

  chunk + SHA-1 fingerprint   -> word shingles + 64-bit hashes
  segment min-fp features      -> MinHash signatures (sampling_method.c:12-76)
  fingerprint kv index         -> LSH band/bucket DataFrame + joins
  similarity top-k selection   -> candidate pairs + verification + top-k window
  recipe / restore             -> cluster-assignment table + byte-identity oracle
  container packing / rewrite  -> partitioning, salting, skew caps

Everything is DataFrame-first: JVM built-ins for tokenize/hash/join,
Arrow-vectorized pandas UDFs only for the numpy MinHash/SimHash kernels.
"""

__version__ = "0.1.0"

from destor_spark.config import DedupConfig  # noqa: F401
