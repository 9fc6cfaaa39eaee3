"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship dedup pipeline over sf0.001 documents.
queries()     -> operator surface from SURVEY.md section 2 (+ the
                 training-pipeline operators: dedup family, similarity
                 search, text analysis).
oracle_sql()  -> DuckDB-equivalent ANSI SQL per query (column names and
                 integer-unit rounding match exactly; see
                 destor_spark/queries.py portability rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from destor_spark.queries import ORACLE_SQL, QUERIES, q_dedup_pipeline_assignments


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full MinHash/LSH/SimHash/union-find dedup pipeline over
    the sf0.001 documents table; returns the cluster-assignment table."""
    return q_dedup_pipeline_assignments(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
