from __future__ import annotations

import pandas as pd
import pytest

from destor_spark.config import DedupConfig
from destor_spark.session import build_session
from destor_spark.synth import make_corpus


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app="destor-spark-tests", master="local[4]", shuffle_partitions=4
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg() -> DedupConfig:
    return DedupConfig()


@pytest.fixture(scope="session")
def smoke_corpus() -> tuple[pd.DataFrame, pd.DataFrame]:
    return make_corpus(seed=42, n_docs=300)


@pytest.fixture(scope="session")
def correct_corpus() -> tuple[pd.DataFrame, pd.DataFrame]:
    return make_corpus(seed=7, n_docs=2000)


def to_spark(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf)
