"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered
(DataFrame plan, DuckDB oracle) pair from
``trialstreamer_spark.plans`` for the driver's sf0.01 hash comparison.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

# ONE import registers every (query, oracle) pair — bench.py and the
# test suite use the same module, so the three surfaces cannot drift.
from trialstreamer_spark.plans.all_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (core search join + score top-k) on sf0.001."""
    return QUERIES["core_join_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (same aliases)."""
    return dict(ORACLES)
