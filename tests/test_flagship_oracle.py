"""Flagship driver-query parity: the portable-hash dedup pipeline
(real exact/LSH/verify/CC/assign operators, md5 permutation family)
must match its DuckDB oracle value-for-value at both driver SFs, and
the oracle's unrolled CC must converge with margin (6 rounds == 8) —
mirroring the driver's CORRECTNESS gate locally."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from destor_spark.queries import (
    SQL_DEDUP_PIPELINE_ASSIGNMENTS,
    _sql_dedup_pipeline,
    q_dedup_pipeline_assignments,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _oracle(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    return con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("sf", SFS)
def test_flagship_matches_duckdb_oracle(spark, sf):
    sp = (
        q_dedup_pipeline_assignments(spark, sf)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    du = _oracle(sf, SQL_DEDUP_PIPELINE_ASSIGNMENTS)
    assert (sp["cluster_size"] > 1).sum() > 0, "vacuous corpus: no dups"
    pd.testing.assert_frame_equal(sp[du.columns.tolist()], du, check_dtype=False)


@pytest.mark.parametrize("sf", SFS)
def test_oracle_cc_rounds_have_convergence_margin(sf):
    """8 unrolled min-label rounds must equal 6 — two spare rounds of
    headroom over the driver corpus's component diameters."""
    du8 = _oracle(sf, _sql_dedup_pipeline(8))
    du6 = _oracle(sf, _sql_dedup_pipeline(6))
    pd.testing.assert_frame_equal(du8, du6, check_dtype=False)
