from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from trialstreamer_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("trialstreamer-spark-tests")
    yield spark


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
