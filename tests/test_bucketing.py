"""Bucketed-table co-located join (the SCALE.md claim that pubmed ⋈
annotations on pmid is shuffle-free when both tables are bucketed by
pmid): write both sides with bucketBy(pmid), join through the catalog,
and assert the plan has NO shuffle exchange on either join input."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    a = spark.range(0, 1000).select(
        F.concat(F.lit("p"), F.col("id")).alias("pmid"),
        (F.col("id") % 7).alias("x"),
    )
    b = spark.range(0, 1000, 2).select(
        F.concat(F.lit("p"), F.col("id")).alias("pmid"),
        (F.col("id") % 5).alias("y"),
    )
    names = []
    for name, df in (("bt_articles", a), ("bt_annotations", b)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "pmid")
            .sortBy("pmid")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
        names.append(name)
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    art, ann = bucketed_tables
    # hint("merge") pins SMJ (the fixture is small enough to
    # auto-broadcast, which would trivially avoid exchanges without
    # proving co-location)
    joined = spark.table(art).join(spark.table(ann).hint("merge"), "pmid")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: a sort-merge join whose inputs read bucketed files
    # directly — no Exchange (shuffle) below the join
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    # correctness unchanged
    assert joined.count() == 500


def test_unbucketed_join_shuffles(spark, bucketed_tables):
    """Control: the same join on plain (non-bucketed) data DOES need an
    exchange, proving the bucketed plan's absence of one is the bucket
    layout's doing."""
    art, _ = bucketed_tables
    plain = spark.range(0, 1000, 2).select(
        F.concat(F.lit("p"), F.col("id")).alias("pmid"),
        (F.col("id") % 5).alias("y"),
    )
    joined = spark.table(art).join(plain.hint("merge"), "pmid")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan


def test_merge_upsert_bucketed_target_never_shuffles(spark, bucketed_tables):
    """The MERGE scale contract (operators/upsert.py docstring): with
    the target bucketed on the key and a daily-batch-sized update, both
    anti-joins run as broadcast joins — the corpus-sized target is never
    exchanged. A SortMergeJoin here would mean the ingest re-shuffles
    the whole table every batch."""
    from trialstreamer_spark.operators.upsert import merge_upsert

    target = spark.table("bt_articles")
    batch = spark.range(0, 20).select(
        F.concat(F.lit("p"), F.col("id")).alias("pmid"),
        (F.col("id") % 7).alias("x"),
    )
    deletes = spark.range(990, 995).select(
        F.concat(F.lit("p"), F.col("id")).alias("pmid")
    )
    out = merge_upsert(target, batch, "pmid", deletes=deletes)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p, p
    assert p.count("BroadcastHashJoin") >= 2
    # and the semantics: deletes applied, batch upserted
    got = {r.pmid for r in out.select("pmid").collect()}
    assert "p990" not in got and "p0" in got and "p19" in got
