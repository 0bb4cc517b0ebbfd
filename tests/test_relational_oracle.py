"""Every registered (query, oracle) pair must match the DuckDB oracle —
this mirrors the driver's t2 correctness gate (exact values, zero float
tolerance, since plans round their float outputs)."""

from __future__ import annotations

import pytest

import trialstreamer_spark.plans.all_queries  # noqa: F401  (full registry fill)
from trialstreamer_spark.plans.registry import ORACLES, QUERIES

from tests.oracle_util import assert_matches


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches(df, ORACLES[name], sf_dir)


def test_every_query_has_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
