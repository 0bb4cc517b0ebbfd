"""Physical data-layout evidence: partition pruning on partitioned
writes and exchange-free joins on bucketed tables — the two write-time
layouts a 100 TB deployment of this engine relies on (SCALE.md ground
rules)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trialstreamer_spark.io import load, write_bucketed, write_partitioned


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(
        load(spark, sf_dir, "documents"), out, partition_cols=["lang"]
    )
    # hive-style directory layout on disk
    part_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    )
    assert len(part_dirs) > 1 and "lang=en" in part_dirs
    en = spark.read.parquet(out).where(F.col("lang") == "en")
    # the partition filter lands in PartitionFilters (directory-level
    # pruning, before any file is opened) — NOT in PushedFilters
    plan = en._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :]
    pf = scan[scan.index("PartitionFilters") : scan.index("PushedFilters")]
    assert "lang" in pf and "en" in pf
    # and the data round-trips
    n_en = (
        load(spark, sf_dir, "documents").where(F.col("lang") == "en").count()
    )
    assert en.count() == n_en


def test_bucketed_join_runs_without_shuffle_or_broadcast(spark, sf_dir):
    """Two tables bucketed on the same key join with NO exchange of any
    kind on either side — the prepaid-shuffle contract of bucketing.
    Broadcast is disabled so the test proves bucketing (not small-table
    broadcast) removed the shuffle."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "b_orders",
        bucket_col="o_orderkey",
        n_buckets=4,
        sort_col="o_orderkey",
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem",
        bucket_col="l_orderkey",
        n_buckets=4,
        sort_col="l_orderkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        joined = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        # correctness against the plain (shuffling) join
        plain = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        got = {r.o_orderkey: r.qty for r in joined.collect()}
        want = {r.o_orderkey: r.qty for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zorder_clustered_write_tightens_file_stats(spark, sf_dir, tmp_path):
    """Z-order clustering produces files whose parquet min/max footer
    ranges are tight on BOTH cluster columns at once — the file-skipping
    property — vs. the same data written unclustered."""
    import pyarrow.parquet as pq

    from trialstreamer_spark.io import write_clustered

    e = load(spark, sf_dir, "events").select(
        (F.col("event_id") % 256).alias("a"),
        ((F.col("event_id") * 7919) % 256).alias("b"),
        "value",
    )
    flat, zed = str(tmp_path / "flat"), str(tmp_path / "zed")
    e.repartition(8).write.parquet(flat)
    write_clustered(e, zed, "a", "b", n_files=8)

    def avg_span(path, col):
        spans, idx = [], None
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            if idx is None:
                idx = [md.schema.column(i).name for i in
                       range(md.num_columns)].index(col)
            lo = min(md.row_group(r).column(idx).statistics.min
                     for r in range(md.num_row_groups))
            hi = max(md.row_group(r).column(idx).statistics.max
                     for r in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    # rows survive the rewrite
    assert spark.read.parquet(zed).count() == e.count()
    # each clustered file covers a small rectangle of (a, b) space:
    # BOTH columns' average per-file range shrink well below the
    # unclustered layout's (which spans ~the full domain in every file)
    # (the parquet reader skips row groups from exactly these footer
    # statistics at scan time — tight ranges ARE the skipping evidence)
    for col in ("a", "b"):
        assert avg_span(zed, col) < 0.6 * avg_span(flat, col), col
