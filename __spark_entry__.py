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

# Importing the plan modules populates the registry.
import trialstreamer_spark.plans.relational  # noqa: F401,E402
from trialstreamer_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

try:  # optional modules register more queries as they land
    import trialstreamer_spark.operators.clustering  # noqa: F401,E402
    import trialstreamer_spark.operators.dedup  # noqa: F401,E402
    import trialstreamer_spark.operators.multimodal  # noqa: F401,E402
    import trialstreamer_spark.operators.quality  # noqa: F401,E402
    import trialstreamer_spark.operators.retrieval  # noqa: F401,E402
    import trialstreamer_spark.operators.similarity  # noqa: F401,E402
    import trialstreamer_spark.operators.temporal  # noqa: F401,E402
    import trialstreamer_spark.operators.textstats  # noqa: F401,E402
    import trialstreamer_spark.streaming.parity  # noqa: F401,E402
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (core search join + score top-k) on sf0.001."""
    return QUERIES["core_join_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (same aliases)."""
    return dict(ORACLES)
