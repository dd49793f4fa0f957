from __future__ import annotations

import pandas as pd
import pytest

from kgforge import synth
from kgforge.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("kgforge-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_files_pdf() -> pd.DataFrame:
    return synth.synth_files_pdf(24)


@pytest.fixture(scope="session")
def small_files_pdf() -> pd.DataFrame:
    return synth.synth_files_pdf(300)


@pytest.fixture(scope="session")
def tiny_files(spark, tiny_files_pdf):
    return spark.createDataFrame(tiny_files_pdf)


@pytest.fixture(scope="session")
def small_files(spark, small_files_pdf):
    return spark.createDataFrame(small_files_pdf)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    import os

    return os.environ.get("KGFORGE_TEST_SF_DIR", "/root/testdata/sf0.001")
