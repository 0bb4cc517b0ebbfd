"""Parquet table loaders for the test corpus (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under a scale-factor
directory. At cluster scale these would be partitioned/bucketed Delta or
Iceberg tables; the loader keeps the name→path mapping in one place so the
storage layer can be swapped without touching query plans.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trialstreamer_spark import util

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (session JVM id, sf_dir, table) → persisted DataFrame. Populated only by
# warm_cache(); plain load() stays uncached so unit tests see real parquet
# scans (PushedFilters / ReadSchema assertions in test_plan_hygiene.py).
# On a long-lived cluster this is the table-catalog / buffer-pool analog:
# re-reading footers + rebuilding scan plans per query is pure fixed cost.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}

util.register_cache_evictor(lambda token: util.evict_dict_cache(_TABLE_CACHE, token))


# Minimum rows per cached partition. The corpus parquet is written with
# ~1M-row row groups, which Spark cannot split: at sf0.1 EVERY table scans
# as ONE partition and at sf1 lineitem lands 6M rows in 6 of 28 splits
# (measured — the other 22 are empty). One round-robin shuffle at warm
# time turns every subsequent scan of the cached relation from a
# straggler into parallel work. The threshold is a measured trade: each
# extra partition costs ~5-10 ms of local task dispatch per downstream
# stage (a 600k-row agg: 0.13 s at 1 part, 0.36 s at 32), while an
# unsplit 1M-row partition serializes ~1 s of scan work — so narrow fact
# rows fan out at 64k rows/partition (≈9 parts at sf0.1, the full core
# count at sf1), keeping sub-second sf0.1 rollups off the task-dispatch
# tax while sf1 gets full width. On a real cluster this knob is the
# table layout's file/row-group sizing; the cache shuffle is the
# local-mode stand-in.
_WARM_ROWS_PER_PARTITION = 65536

# documents rows are ~KB of text each and the tokenize/regex family is
# CPU-bound per row (measured: sf1 fan-out cuts the text stragglers
# 2-6x), so they fan out at a much lower row count than the narrow
# numeric fact rows.
_WARM_ROWS_OVERRIDE = {"documents": 1024}

# Metadata projections cached SEPARATELY at the default (row-scaled)
# fan-out: the text-CPU override above is right for tokenize/regex
# consumers but taxes every metadata-only query with ~50 task
# dispatches per stage for kilobytes of columns (measured round 9:
# label_source_affinity's one-join-one-rollup plan dropped 0.46→0.19 s
# at sf1 on this alone). On a real cluster this is simply columnar
# projection — fewer bytes, fewer splits; the second cached relation is
# the local-mode stand-in. Keyed as "<table>__meta" in _TABLE_CACHE.
_META_COLS: dict[str, tuple[str, ...]] = {
    "documents": ("doc_id", "lang", "source", "n_chars"),
}


def warm_cache(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register every corpus table once for this session: persist in
    memory (deserialized columnar) and materialize. Subsequent load()
    calls reuse the cached plan — cutting the per-query footer-read +
    scan-build fixed cost that dominates a multi-query bench run — and
    re-spread giant unsplittable row groups across the cores (see
    _WARM_ROWS_PER_PARTITION)."""
    key_session = id(spark._jsparkSession)
    par = spark.sparkContext.defaultParallelism
    skipped = []
    for name in tables:
        # partial corpora (e.g. the documents-only heaps decade dirs
        # from tools/gen_scale.py only=...) warm what exists — but
        # loudly, so a typo'd sf_dir doesn't warm nothing in silence
        # (r10 ADVICE)
        if not os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            skipped.append(name)
            continue
        key = (key_session, sf_dir, name)
        if key not in _TABLE_CACHE:
            raw = load(spark, sf_dir, name)
            n = raw.count()
            rpp = _WARM_ROWS_OVERRIDE.get(name, _WARM_ROWS_PER_PARTITION)
            target = max(1, min(par, n // rpp))
            if target > 1:
                raw = raw.repartition(target)
            df = raw.persist()
            df.count()
            _TABLE_CACHE[key] = df
        if name in _META_COLS:
            mkey = (key_session, sf_dir, f"{name}__meta")
            if mkey not in _TABLE_CACHE:
                narrow = load(spark, sf_dir, name).select(*_META_COLS[name])
                n = narrow.count()
                target = max(1, min(par, n // _WARM_ROWS_PER_PARTITION))
                # Repartition even when target == 1: load() above serves
                # the just-cached FULL table, so without this the narrow
                # frame inherits its text-CPU fan-out (e.g. documents'
                # 1024-rows/partition override) — exactly the per-task
                # dispatch tax load_meta exists to avoid at small-corpus
                # sizes (r9 ADVICE).
                narrow = narrow.repartition(target)
                mdf = narrow.persist()
                mdf.count()
                _TABLE_CACHE[mkey] = mdf
    if skipped:
        if len(skipped) == len(tables):
            raise FileNotFoundError(
                f"warm_cache: none of {tables} found under {sf_dir!r} — "
                "wrong sf_dir or unbuilt corpus"
            )
        warnings.warn(
            f"warm_cache: skipped missing tables {skipped} in {sf_dir!r} "
            "(partial corpus)",
            stacklevel=2,
        )


def load_meta(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The narrow metadata projection of ``name`` (columns in
    _META_COLS), served from its own cached relation with the DEFAULT
    row-scaled partitioning — for consumers that never touch the
    text/payload column and must not inherit the text-CPU fan-out.
    Falls back to the projected full table when nothing is warmed (cold
    path: the projection still prunes at the parquet scan)."""
    cols = _META_COLS[name]
    cached = _TABLE_CACHE.get(
        (id(spark._jsparkSession), sf_dir, f"{name}__meta")
    )
    if cached is not None:
        return cached
    return load(spark, sf_dir, name).select(*cols)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Column pruning + predicate pushdown reach the
    parquet scan because callers compose filters/projections lazily on the
    returned DataFrame (check with .explain: PushedFilters / ReadSchema).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects. We read it as a long (nanosAsLong) and
    truncate to microseconds with integer division — the same truncation
    DuckDB applies when it coerces TIMESTAMP_NS → TIMESTAMP, so oracle
    comparisons stay exact. (A float division here would silently lose
    precision: 1.7e18 ns exceeds double's 53-bit mantissa.)
    """
    cached = _TABLE_CACHE.get((id(spark._jsparkSession), sf_dir, name))
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Pin the session to UTC on every load: parquet timestamps here are
    # naive instants, and year()/date_trunc()/date_format() interpret
    # timestamps in the session zone. A driver-owned session in another
    # zone would silently shift years/windows (caught by oracle diff).
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ltz(df)
    return _ltz(spark.read.parquet(path))


def _ltz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (LTZ). The testdata
    parquet stores naive timestamp[us] (isAdjustedToUTC=false), which a
    session with inferTimestampNTZ reads as TIMESTAMP_NTZ — a type
    unix_micros()/window() reject at analysis time. The session zone is
    pinned UTC just above, so the cast reinterprets the same wall-clock
    value as the same UTC instant: epoch micros and oracle hashes are
    unchanged. Applied here (not per-query) so a driver-owned session
    without our session.py configs still gets uniform LTZ columns."""
    from pyspark.sql import functions as F

    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# ---------------------------------------------------------------------------
# Bucketed fact-table layouts (co-located joins for the TPC-H-shaped plans)
# ---------------------------------------------------------------------------

#: variant → (source table, bucket key, projected columns). Narrow
#: projections bucketed on the join key — the lakehouse "materialized
#: clustering projection" (Iceberg sort-order / Delta liquid-clustering
#: analog): the exchange a fact-fact join would pay per query is prepaid
#: once at layout time. Projections carry only the columns their plans
#: read so the prepaid write (and every later scan) stays narrow.
BUCKET_SPECS: dict[str, tuple[str, str, tuple[str, ...]]] = {
    "lineitem_by_orderkey": (
        "lineitem",
        "l_orderkey",
        (
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
            "l_shipdate",
        ),
    ),
    "orders_by_orderkey": (
        "orders",
        "o_orderkey",
        ("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"),
    ),
    "lineitem_by_partkey": (
        "lineitem",
        "l_partkey",
        ("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"),
    ),
    # customer-keyed order analytics (per-account aggregates + join-backs:
    # orders_above_customer_avg and the account-rollup family) — the
    # groupBy(o_custkey) and the self-join both ride this layout's
    # HashPartitioning with no Exchange
    # per-bucket sort carries o_orderdate BEHIND the key: merge
    # joins/groupBys on custkey read the same prefix ordering they
    # always did, and customer-cadence windows (partitionBy custkey,
    # orderBy orderdate) become sort-free on the scan (r11:
    # reorder_interval_percentiles' dominant cost was re-sorting every
    # bucket by date).
    "orders_by_custkey": (
        "orders",
        "o_custkey",
        ("o_custkey", "o_orderdate", "o_totalprice"),
        ("o_custkey", "o_orderdate"),
    ),
    # the matching customer side: at 100 TB customer is NOT broadcastable
    # (SF-scaled), so account-level joins ride this co-located layout —
    # and even at bench scale it saves the per-query broadcast build of
    # the full customer dim
    "customer_by_custkey": (
        "customer",
        "c_custkey",
        ("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"),
    ),
}

#: Bucket count for the prepared layouts. Both sides of a co-located
#: join must match (or divide); at 100 TB this is sized so one bucket is
#: a few GB per executor core, here so local[32] still parallelizes.
# One bucket per core: bucketed scans cannot split a bucket, so a
# bucket count below the executor-thread count leaves cores idle for
# the whole fact-fact stage (sf10 measured: the TPC-H trio's fused
# SMJ+probe+agg stage ran 16 tasks on 32 cores; 32 buckets cut
# sole_late_supplier 6.5→4.3 s and product_profit 1.5→1.2 s). At
# cluster scale the same rule holds: buckets ≈ target parallelism
# (or an integer multiple — equal-width bucket joins need no exchange
# either way).
N_FACT_BUCKETS = 32


def _bucket_table_name(sf_dir: str, variant: str) -> str:
    import hashlib

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"ts_bkt_{h}_{variant}"


# (session JVM id, sf_dir, variant) → persisted bucket projection. The
# in-memory layer of the bucket layout (same buffer-pool analog as
# _TABLE_CACHE): InMemoryRelation preserves the scan's
# HashPartitioning(key, N_FACT_BUCKETS), so cached reads keep their
# co-located (exchange-free) joins while skipping the per-query
# footer-read + disk scan. Evicted on corpus version bumps.
_BUCKET_CACHE: dict[tuple[int, str, str], DataFrame] = {}

util.register_cache_evictor(lambda token: util.evict_dict_cache(_BUCKET_CACHE, token))


def prepare_buckets(
    spark: SparkSession, sf_dir: str, variants: tuple[str, ...] | None = None
) -> None:
    """Offline layout hook (bench/deploy): write the fact-table bucket
    projections for a corpus version. Each is repartitioned INTO its
    buckets before the write so every bucket is exactly one file —
    Spark's reader then exposes both the hash partitioning AND the
    per-bucket sort, letting later joins/groupBys on the key skip their
    Exchange (and their Sort). Idempotent per (session, corpus): the
    catalog registration is checked first.

    Each projection is also persisted in memory (deserialized columnar,
    spill-to-disk) and materialized — the narrow projections are a small
    fraction of the corpus, and the cached relation keeps the bucket
    HashPartitioning, so every fact-fact plan still joins without an
    exchange but stops paying a cold parquet scan per query."""
    base = os.environ.get(
        "SPARK_GRAFT_BUCKET_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "spark-warehouse", "buckets"),
    )
    key_session = id(spark._jsparkSession)
    for variant in variants or tuple(BUCKET_SPECS):
        spec = BUCKET_SPECS[variant]
        src, key, cols = spec[0], spec[1], spec[2]
        sort_cols = spec[3] if len(spec) > 3 else (key,)
        name = _bucket_table_name(sf_dir, variant)
        if not spark.catalog.tableExists(name):
            df = load(spark, sf_dir, src).select(*cols)
            (
                df.repartition(N_FACT_BUCKETS, F.col(key))
                .write.mode("overwrite")
                .bucketBy(N_FACT_BUCKETS, key)
                .sortBy(*sort_cols)
                .option("path", os.path.join(base, name))
                .saveAsTable(name)
            )
        # base rides the key so a layout rebuilt under a different
        # warehouse dir (tests) is re-registered, not served stale.
        # NOT persisted (round-10 change, measured): InMemoryRelation
        # preserves the bucket HashPartitioning but DROPS the per-bucket
        # sort order, so every merge join over the cached copy re-sorted
        # both facts — strictly worse than the parquet bucket scan,
        # whose FileScan reports the sort (one file per bucket +
        # session's legacy.bucketedTableScan.outputOrdering). sf10:
        # nation_market_share 4.2→2.7 s from un-persisting alone; even
        # at sf0.1 the no-persist set measured faster (4.93→4.44 s over
        # the 12 TPC-H analogs) — the OS page cache covers the re-read.
        ck = (key_session, sf_dir, os.path.abspath(base), variant)
        if ck not in _BUCKET_CACHE:
            _BUCKET_CACHE[ck] = spark.table(name)


def bucketed_table(
    spark: SparkSession, sf_dir: str, variant: str
) -> DataFrame | None:
    """The prepared bucket projection for this corpus, or None when the
    layout hasn't been built in this session's catalog — callers fall
    back to the plain parquet scan (identical rows either way; the same
    catalog-driven path choice as api.engine.choose_search_path)."""
    name = _bucket_table_name(sf_dir, variant)
    if not spark.catalog.tableExists(name):
        return None
    return spark.table(name)


def export_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export sink (SURVEY S19 — the reference's ``COPY (...) TO
    STDOUT csv header``). Each partition writes its own file; coalesce
    upstream if a single file is required."""
    df.write.mode(mode).option("header", True).csv(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet write — the physical layout that
    makes partition PRUNING (not just row-group predicate pushdown) work
    at 100 TB: a filter on a partition column eliminates whole
    directories before any file is opened. Pair with
    ``spark.read.parquet(path)`` and assert pruning via ``inputFiles()``
    (tests/test_layout.py does)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table write (Spark's hash-bucketing): rows are
    hash-distributed into ``n_buckets`` files per partition ON the join/
    aggregation key at WRITE time, so every later equi-join or groupBy on
    that key between same-bucketed tables runs WITHOUT a shuffle — the
    exchange is prepaid once at ingest. This is the co-located-join
    strategy for fact tables repeatedly joined on the same key at 100 TB
    (bucket counts should match or divide each other)."""
    # one file per bucket (repartition INTO the buckets) so the scan can
    # report the per-bucket sort order — see prepare_buckets
    w = (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def zvalue_col(a, b, bits: int = 16):
    """Morton (Z-order) interleaving of the low ``bits`` bits of two
    non-negative integer columns — the multi-dimensional clustering key.
    Pure bitwise/shift column arithmetic (JVM codegen, no UDF)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        # disjoint bit positions, so integer + IS bitwise-or here
        z = (
            z
            + F.shiftleft(F.shiftright(a.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(b.cast("long"), i) % 2, 2 * i + 1)
        )
    return z


def write_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write (Delta `OPTIMIZE ZORDER BY` /
    Iceberg sort-order analog): range-partition and sort rows by the
    Morton interleaving of two filter columns, so each output file holds
    a compact rectangle of (a, b) space and its parquet min/max
    statistics are TIGHT on BOTH columns simultaneously. A later filter
    on either column (or both) then skips most files/row-groups at the
    footer — single-column sorting buys that for one column only; at
    100 TB this is the difference between scanning a full fact table and
    touching a few percent of it. tests/test_layout.py measures the
    per-file range shrinkage against an unclustered write."""
    z = zvalue_col(F.col(col_a), F.col(col_b)).alias("__z")
    (
        df.select("*", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
