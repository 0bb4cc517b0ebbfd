"""Structured-Streaming ingestion pipeline: the daily PubMed update run
(reference update.py → pubmed.py upload_to_postgres) as a file-source
stream with foreachBatch MERGE.

Reference behavior carried over (SURVEY §2.9):
- file-arrival micro-batching with exactly-once bookkeeping
  (update_log + skip sets, pubmed.py:88-117,461-468) → Structured
  Streaming file source + checkpointing; Trigger.AvailableNow = cron run.
- update files applied in filename order (pubmed.py:64) → batch sorts by
  source_filename before keep-last dedupe, so the LAST file wins a pmid.
- in-batch dedupe keep-last (pubmed.py:492-504) → row_number window.
- DeleteCitation CDC removes from all targets, deletes before upserts
  (pubmed.py:534-543).
- audit log row per processed batch (dbutil.py:245-247) — kept as a
  queryable table even though the checkpoint already guarantees progress,
  because /meta reads it (cnxapp.py:117-118).

At 100 TB: one .gz update file = one task (gz is unsplittable); the
MERGE shuffles on pmid which is the target's bucket key; derived count
tables are recomputed per batch (they are group-bys over flag columns —
cheap relative to the ingest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from trialstreamer_spark.operators.upsert import ParquetTable
from trialstreamer_spark.sources import pubmed_xml


class PubmedPipeline:
    """Landing-dir → typed tables with CDC. Batch and streaming entry
    points share one _apply_batch, so replay semantics are identical."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.last_batch_stats: dict = {}
        self.articles = ParquetTable(spark, os.path.join(warehouse, "pubmed_raw"))
        self.audit = ParquetTable(spark, os.path.join(warehouse, "update_log"))
        self.year_counts = ParquetTable(
            spark, os.path.join(warehouse, "pubmed_year_counts")
        )

    # -- core batch application (used by both batch & foreachBatch) -------

    def _apply_batch(
        self, articles: DataFrame, deletes: DataFrame, streaming: bool = False
    ) -> None:
        # deterministic file order then keep-last per pmid
        # (pubmed.py:64 sort + 492-504 last-wins); record_idx breaks
        # in-file duplicate ties toward the file's LAST occurrence (the
        # reference's reversed-batch first-hit). Batches from sources
        # without a record index (tests, ad-hoc frames) tie-break on a
        # constant, preserving the old file-order-only behavior.
        idx = (
            F.col("record_idx")
            if "record_idx" in articles.columns
            else F.lit(0)
        )
        w = W.partitionBy("pmid").orderBy(
            F.col("source_filename").desc(), idx.desc()
        )
        deduped = (
            articles.filter(F.col("pmid").isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # The reference applies files sequentially (per file: deletes then
        # upserts, pubmed.py:534-543). Replaying that inside one batch:
        # an upsert survives unless a STRICTLY LATER file deletes the pmid
        # (same-file delete+reinsert survives because deletes run first).
        last_del = deletes.groupBy("pmid").agg(
            F.max("source_filename").alias("__del_file")
        )
        deduped = (
            deduped.join(F.broadcast(last_del), "pmid", "left")
            .filter(
                F.col("__del_file").isNull()
                | (F.col("__del_file") <= F.col("source_filename"))
            )
            .drop("__del_file")
        )
        # run statistics (SURVEY A8 — the reference's Counter telemetry at
        # pubmed.py:458,480,550): an Observation rides the merge action,
        # so counting costs no extra job. Observation.get blocks on a
        # QueryExecutionListener that never fires for actions inside
        # foreachBatch, so streaming mode observes on the stream instead
        # (run_stream) and this stays batch-only.
        obs = None
        if not streaming:
            from pyspark.sql import Observation

            obs = Observation()
            deduped = deduped.observe(obs, F.count(F.lit(1)).alias("n_upserts"))
        del_keys = deletes.select("pmid").distinct()
        self.articles.merge(deduped, "pmid", deletes=del_keys)
        if obs is not None:
            self.last_batch_stats = obs.get
        self._refresh_counts()
        self._log_update(articles, deletes)

    def _refresh_counts(self) -> None:
        """Matview refresh analog (ref pubmed.py:163-167 + dbutil.py:179-186)."""
        df = self.articles.read()
        self.year_counts.overwrite(
            df.filter(F.col("year").isNotNull())
            .groupBy("year")
            .agg(F.count("*").alias("n_articles"))
        )

    def _log_update(self, articles: DataFrame, deletes: DataFrame) -> None:
        """Per-file audit rows in the full update_log schema (ref
        dbutil.py:156-163,240-247: update_type, source_filename,
        source_date, download_date, update_date)."""
        files = (
            articles.select("source_filename")
            .union(deletes.select("source_filename"))
            .distinct()
            .select(
                F.lit("pubmed_update").alias("update_type"),
                "source_filename",
                F.lit(None).cast("timestamp").alias("source_date"),
                F.current_timestamp().alias("download_date"),
                F.current_timestamp().alias("update_date"),
            )
        )
        self._append_audit(files)

    def log_run(self, update_type: str) -> None:
        """End-of-run audit row (ref update.py:34
        ``log_update(update_type='fullcheck', ...)``) — the row /meta's
        watermark read keys on (cnxapp.py:117)."""
        row = self.spark.range(1).select(
            F.lit(update_type).alias("update_type"),
            F.lit(None).cast("string").alias("source_filename"),
            F.lit(None).cast("timestamp").alias("source_date"),
            F.current_timestamp().alias("download_date"),
            F.current_timestamp().alias("update_date"),
        )
        self._append_audit(row)

    def _append_audit(self, rows: DataFrame) -> None:
        prev = None
        if self.audit.current_version() is not None:
            prev = self.audit.read()
        new = rows if prev is None else prev.unionByName(rows)
        self.audit.overwrite(new)

    # -- batch mode --------------------------------------------------------

    def run_batch(self, glob_path: str) -> None:
        self._apply_batch(
            pubmed_xml.read_articles(self.spark, glob_path),
            pubmed_xml.read_deletes(self.spark, glob_path),
        )

    # -- streaming mode ----------------------------------------------------

    def run_stream(self, landing_dir: str, checkpoint_dir: str) -> None:
        """File-source stream over the landing dir; every micro-batch of
        newly-arrived files goes through the same parse→dedupe→MERGE.
        availableNow processes the backlog then stops (the cron run)."""
        files = (
            self.spark.readStream.format("binaryFile")
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("pathGlobFilter", "*.xml*")
            .load(landing_dir)
        )

        def process(batch_df: DataFrame, batch_id: int) -> None:
            import pandas as pd  # noqa: F401

            arts = batch_df.select("path", "content").mapInPandas(
                pubmed_xml._reader("articles"), schema=pubmed_xml.ARTICLE_SCHEMA
            )
            dels = batch_df.select("path", "content").mapInPandas(
                pubmed_xml._reader("deletes"), schema=pubmed_xml.DELETE_SCHEMA
            )
            self._apply_batch(arts, dels, streaming=True)

        # A8 streaming leg: per-micro-batch file counts surface in
        # StreamingQueryProgress.observedMetrics
        observed = files.observe(
            "batch_stats", F.count(F.lit(1)).alias("n_files")
        )
        q = (
            observed.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        prog = q.lastProgress
        if prog and prog.get("observedMetrics", {}).get("batch_stats"):
            self.last_batch_stats = prog["observedMetrics"]["batch_stats"]


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """Streaming windowed aggregate with watermark (SURVEY §2.9 north
    star; batch analog = plans.relational.event_window_agg). Works on a
    streaming or batch events DataFrame."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def hopping_event_rollup(events: DataFrame) -> DataFrame:
    """Streaming HOPPING-window aggregate (1-hour windows sliding every
    30 minutes — each event lands in exactly 2 overlapping windows).
    The overlap is what tumbling windows can't express: rolling-rate
    dashboards and smoothed anomaly baselines read the 30-minute-offset
    series. State per (window, type) key; the watermark closes a window
    30 minutes after its end like any windowed agg."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
        )
    )
