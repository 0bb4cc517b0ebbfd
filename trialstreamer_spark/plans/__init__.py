"""Declarative query plans. ``registry`` collects every (query, oracle)
pair that the driver's correctness harness runs."""

from trialstreamer_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401
