"""Cache lifecycle + version-machinery invariants for ParquetTable.

A long-lived engine crosses corpus versions: every per-corpus sidecar
(cached plans, shingle postings, IVF centroids, table cache) must be
invalidated — and its storage memory RELEASED — when the table it was
derived from is overwritten. These tests pin that contract, plus the
round-5 version-id hardening (monotonic ids, committed-only time travel,
boundary-safe diff fingerprints).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trialstreamer_spark import util
from trialstreamer_spark.operators.upsert import ParquetTable


@pytest.fixture()
def table(spark, tmp_path):
    t = ParquetTable(
        spark, os.path.join(str(tmp_path), "corpus", "tbl"), gc_min_age_s=0.0
    )
    t.overwrite(spark.range(3).select(F.col("id"), F.lit("a").alias("val")))
    return t


def test_version_bump_evicts_cached_plan_and_releases_storage(spark, table):
    corpus_dir = os.path.dirname(table.path)  # caches key by corpus dir
    df = util.cached_plan(
        spark, ("lifecycle_probe", corpus_dir), lambda: spark.range(10)
    )
    df.count()  # materialize the persisted sidecar
    assert df.storageLevel.useMemory
    key = util._plan_key(spark, ("lifecycle_probe", corpus_dir))
    assert key in util._PLAN_CACHE

    table.overwrite(spark.range(5).select(F.col("id"), F.lit("b").alias("val")))

    assert key not in util._PLAN_CACHE, "stale plan survived version bump"
    assert not df.storageLevel.useMemory, "storage memory not released"


def test_version_bump_evicts_module_caches(spark, table):
    from trialstreamer_spark.operators import dedup, similarity

    corpus_dir = os.path.dirname(table.path)
    jvm = id(spark._jsparkSession)
    docs = spark.range(4).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta gamma delta").alias("text")
    )
    from trialstreamer_spark.sidecars import catalog_base

    post = dedup.shingle_postings(docs, cache_key=corpus_dir)
    assert (jvm, ("catalog", catalog_base()), corpus_dir) in dedup._POSTINGS_CACHE
    similarity._IVF_CENTROIDS[corpus_dir] = []
    similarity._IVF_CENTROIDS["/unrelated/dir"] = []

    table.overwrite(docs)

    assert (
        jvm,
        ("catalog", catalog_base()),
        corpus_dir,
    ) not in dedup._POSTINGS_CACHE
    assert not post.storageLevel.useMemory
    assert corpus_dir not in similarity._IVF_CENTROIDS
    # unrelated corpus versions are untouched
    assert "/unrelated/dir" in similarity._IVF_CENTROIDS
    del similarity._IVF_CENTROIDS["/unrelated/dir"]


def test_version_ids_are_monotonic_and_unique(spark, table):
    # Many overwrites in well under a millisecond apiece: ids must never
    # collide (wall-clock ids would) and must strictly increase.
    for i in range(4):
        table.overwrite(spark.range(i + 1).select(F.col("id"), F.lit("x").alias("val")))
    vs = table.versions()
    nums = [int(v[1:]) for v in vs]
    assert nums == sorted(set(nums)), f"non-monotonic or duplicate ids: {vs}"
    assert len(vs) == len(set(vs)) == 3  # keep=3 horizon


def test_uncommitted_residue_dir_is_not_a_version(spark, table):
    # Simulate a crashed overwrite: data dir written, pointer flip never
    # happened. It must be invisible to versions()/read_version.
    cur = table.current_version()
    residue = f"v{int(cur[1:]) + 7}"
    spark.range(1).write.parquet(os.path.join(table.path, residue))
    assert residue not in table.versions()
    with pytest.raises(ValueError):
        table.read_version(residue)
    assert table.current_version() == cur
    # read() still serves the committed snapshot
    assert table.read().count() == 3
    # and the next overwrite claims a fresh id beyond the residue (no clobber)
    table.overwrite(spark.range(2).select(F.col("id"), F.lit("y").alias("val")))
    assert int(table.current_version()[1:]) > int(residue[1:])


def test_diff_distinguishes_null_from_sentinel_strings(spark, tmp_path):
    t = ParquetTable(spark, os.path.join(str(tmp_path), "difftbl"), gc_min_age_s=0.0)
    t.overwrite(
        spark.createDataFrame([(1, None), (2, "a\x1fb")], "k int, v string")
    )
    v1 = t.current_version()
    # NULL -> "\x00" is a REAL update; separator-adjacent strings must
    # not collide across the fingerprint boundary either.
    t.overwrite(
        spark.createDataFrame([(1, "\x00"), (2, "a\x1fb")], "k int, v string")
    )
    v2 = t.current_version()
    changes = {r["k"]: r["change"] for r in t.diff(v1, v2, "k").collect()}
    assert changes == {1: "update"}


def test_diff_rejects_schema_mismatch(spark, tmp_path):
    t = ParquetTable(spark, os.path.join(str(tmp_path), "difftbl2"), gc_min_age_s=0.0)
    t.overwrite(spark.createDataFrame([(1, "a")], "k int, v string"))
    v1 = t.current_version()
    t.overwrite(spark.createDataFrame([(1, "a", 2)], "k int, v string, extra int"))
    v2 = t.current_version()
    with pytest.raises(ValueError, match="column set"):
        t.diff(v1, v2, "k")


def test_warm_cache_respreads_unsplittable_row_groups(spark, monkeypatch):
    """The corpus parquet ships ~1M-row row groups, which Spark cannot
    split — without the warm-time repartition every cached table scans
    as ONE partition (measured at sf0.1: all 10 tables; at sf1 lineitem
    landed 6M rows in 6 of 28 splits). Pin the re-spread policy: tables
    above the row threshold fan out (bounded by defaultParallelism) and
    land BALANCED, dimension-sized tables stay single-partition (no
    per-stage empty-task tax)."""
    from trialstreamer_spark import io

    monkeypatch.setattr(io, "_WARM_ROWS_PER_PARTITION", 100)
    monkeypatch.setattr(io, "_WARM_ROWS_OVERRIDE", {})
    sf_dir = "/root/testdata/sf0.001"
    # warm_cache silently skips tables already cached for this
    # (session, sf_dir) — evict any entry an EARLIER test warmed, or
    # the patched threshold never applies (order-dependent failure).
    jvm = id(spark._jsparkSession)
    for name in ("orders", "region"):
        stale = io._TABLE_CACHE.pop((jvm, sf_dir, name), None)
        if stale is not None:
            stale.unpersist()
    try:
        io.warm_cache(spark, sf_dir, ("orders", "region"))
        orders = io.load(spark, sf_dir, "orders")
        n = orders.count()
        parts = orders.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
        expect = min(spark.sparkContext.defaultParallelism, n // 100)
        assert len(parts) == expect, f"expected {expect} partitions, got {len(parts)}"
        # round-robin: no partition more than ~2x the mean (vs the raw
        # layout, where ONE partition holds everything)
        assert max(parts) <= 2 * (n // expect + 1)
        region = io.load(spark, sf_dir, "region")
        assert region.rdd.getNumPartitions() == 1, "tiny dim must not fan out"
    finally:
        jvm = id(spark._jsparkSession)
        for name in ("orders", "region"):
            df = io._TABLE_CACHE.pop((jvm, sf_dir, name), None)
            if df is not None:
                df.unpersist()
