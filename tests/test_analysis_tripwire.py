"""Environment-drift tripwire: every registered query must ANALYZE.

The round-2/3 regression (Spark reading naive parquet timestamp[us] as
TIMESTAMP_NTZ, which ``unix_micros()`` rejects at plan time) shipped
broken for two rounds because nothing asserted that analysis succeeds
for all registered queries — execution tests covered each operator but
aborted at the first error, and the plan-hygiene iteration failed
without naming the query. This file:

- names the failing query in its assertion message (parametrized — one
  test id per query, so one broken plan never hides another);
- runs the same check under DRIVER-LIKE confs (``inferTimestampNTZ``
  forced on, the new-Spark default our session factory overrides) so a
  harness that owns its SparkSession is simulated, not assumed;
- asserts every temporal engine function applies to every timestamp
  column in the corpus — the exact class of drift that broke round 2.

File name starts with ``test_analysis`` so it sorts (and runs) before
the rest of the suite.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trialstreamer_spark.io import TABLES, load

# The central import point — the same module bench.py and
# __spark_entry__.py load, so this suite tripwires exactly the set of
# queries the driver and bench will see (an operator module missing
# from all_queries is missing EVERYWHERE and fails the count below).
from trialstreamer_spark.plans.all_queries import QUERIES


@pytest.fixture(scope="module")
def driver_like_confs(spark):
    """Flip runtime confs to what a driver-owned session would have
    (new-Spark defaults our factory overrides), restore afterwards."""
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    yield spark
    spark.conf.set(key, prev)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_analyzes(driver_like_confs, sf_dir, name):
    """Schema access forces full analysis (resolution + type checks)
    without executing — cheap enough to run for all queries first."""
    spark = driver_like_confs
    try:
        schema = QUERIES[name](spark, sf_dir).schema
    except Exception as exc:  # noqa: BLE001 — name the query, fail loud
        pytest.fail(f"query {name!r} failed analysis: {exc}")
    assert len(schema.fields) > 0, name


def test_registry_queries_and_oracles_consistent():
    """Every registered query must carry a DuckDB oracle (the driver
    downgrades oracle-less queries to a weaker rows-only check) and
    every oracle must point at a registered query."""
    from trialstreamer_spark.plans.registry import ORACLES

    missing_oracle = sorted(set(QUERIES) - set(ORACLES))
    dangling_oracle = sorted(set(ORACLES) - set(QUERIES))
    assert not missing_oracle, f"queries without oracle SQL: {missing_oracle}"
    assert not dangling_oracle, f"oracles without a query: {dangling_oracle}"


def test_every_operator_module_is_in_all_queries():
    """Any operators/ or streaming/ module that registers queries must be
    imported by plans.all_queries — otherwise bench and the driver would
    silently skip its queries (this happened to packing.py once)."""
    import pathlib

    import trialstreamer_spark
    import trialstreamer_spark.plans.all_queries as aq

    src = pathlib.Path(aq.__file__).read_text()
    pkg_root = pathlib.Path(trialstreamer_spark.__file__).parent
    for sub in ("operators", "streaming", "plans"):
        for py in sorted((pkg_root / sub).glob("*.py")):
            mod = f"trialstreamer_spark.{sub}.{py.stem}"
            if "@query(" in py.read_text() and mod not in src:
                raise AssertionError(
                    f"{mod} registers queries but is not imported by "
                    "plans.all_queries"
                )


def test_temporal_functions_apply_to_all_timestamp_columns(spark, sf_dir):
    """unix_micros / date_trunc / window / year must accept every
    temporal column the loader produces, in every table."""
    for table in TABLES:
        df = load(spark, sf_dir, table)
        ts_cols = [c for c, t in df.dtypes if t.startswith("timestamp")]
        for c in ts_cols:
            assert dict(df.dtypes)[c] == "timestamp", (
                f"{table}.{c} loads as {dict(df.dtypes)[c]}, expected "
                "LTZ timestamp (io._ltz normalization)"
            )
            probe = df.select(
                F.unix_micros(F.col(c)).alias("us"),
                F.date_trunc("week", F.col(c)).alias("wk"),
                F.year(F.col(c)).alias("yr"),
                F.window(F.col(c), "1 hour").alias("w"),
            )
            assert len(probe.schema.fields) == 4, f"{table}.{c}"
