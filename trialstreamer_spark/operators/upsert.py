"""Keyed upsert/delete (MERGE) semantics on immutable columnar storage.

The reference's sinks are PostgreSQL row upserts and deletes
(`INSERT … ON CONFLICT (pmid) DO UPDATE` at reference pubmed.py:540-543,
`DELETE … WHERE pmid=…` at pubmed.py:534-538). On a lakehouse the same
contract is Delta/Iceberg `MERGE INTO`; this container has no Delta jars,
so ``merge_upsert`` implements the identical row-level semantics as a
pure DataFrame transform, and ``ParquetTable`` gives it transactional-ish
table storage (write-new-then-swap, last-committed pointer).

Semantics preserved (SURVEY §7 hard part 1):
- batch-internal dedupe is keep-LAST (reference reverses the batch and
  keeps first occurrence, pubmed.py:492-504) — expressed as a
  row_number window over an explicit ordering column;
- deletes apply FIRST, then upserts (pubmed.py:534-543 ordering), so a
  pmid that is both deleted and re-inserted in one batch survives.

Scale: MERGE here is one left_anti (old rows whose key is replaced) +
union. Both shuffle on the key — at 100 TB target tables are bucketed by
the key so the anti-join co-locates; with Delta the same plan runs as a
file-pruned MERGE. The swap keeps history dirs for time-travel-ish
debugging and idempotent replay."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def dedupe_keep_last(batch: DataFrame, key: str, order_col: str) -> DataFrame:
    """Last-writer-wins within a batch (ref pubmed.py:492-504)."""
    w = W.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    batch: DataFrame,
    key: str,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """MERGE: delete keys removed, matched keys updated, new keys
    inserted. ``deletes`` is a one-column (key) DataFrame. Returns the
    new table contents; caller persists (ParquetTable.overwrite or a
    real MERGE INTO on Delta)."""
    if deletes is not None:
        # deletes hit the target only; a key deleted AND re-upserted in the
        # same batch survives (deletes-first ordering, pubmed.py:534-543)
        target = target.join(F.broadcast(deletes), key, "left_anti")
    kept = target.join(batch.select(key).distinct(), key, "left_anti")
    return kept.unionByName(batch)


class ParquetTable:
    """Minimal transactional keyed table: versioned parquet dirs + a
    `_current` pointer file. Readers always see a fully-written version;
    writers write a new dir then flip the pointer (atomic rename of a
    tmp pointer). Stands in for Delta in this environment.

    ``gc_min_age_s`` is the concurrent-reader grace period: a version
    directory is only eligible for GC once it is BOTH beyond the keep
    horizon and older than the grace period, so a long-running reader
    that resolved the pointer just before a burst of writes doesn't have
    its files deleted mid-scan (Delta's deletedFileRetentionDuration
    plays the same role)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema=None,
        gc_min_age_s: float = 600.0,
    ):
        self.spark = spark
        self.path = path
        self.schema = schema
        self.gc_min_age_s = gc_min_age_s
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current")

    def current_version(self) -> str | None:
        try:
            with open(self._pointer) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def read(self) -> DataFrame:
        v = self.current_version()
        if v is None:
            if self.schema is None:
                raise ValueError(f"empty table {self.path} and no schema")
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.parquet(os.path.join(self.path, v))

    @staticmethod
    def _vnum(d: str) -> int | None:
        """Numeric id of a version dir name, or None for non-version dirs."""
        if not d.startswith("v"):
            return None
        try:
            return int(d[1:])
        except ValueError:
            return None

    def _all_version_dirs(self) -> list[tuple[int, str]]:
        out = []
        for d in os.listdir(self.path):
            n = self._vnum(d)
            if n is not None and os.path.isdir(os.path.join(self.path, d)):
                out.append((n, d))
        return sorted(out)

    def overwrite(self, df: DataFrame) -> None:
        # Version ids are a monotonic counter seeded from the existing
        # dirs (never wall-clock: two overwrites in the same millisecond
        # must not reuse an id and silently clobber a committed
        # snapshot). max()+1 also sorts after any legacy ms-style id.
        # The id is CLAIMED by mkdir(exist_ok=False) — atomic at the
        # filesystem — so two concurrent writer processes that list the
        # same dirs cannot both write into the same version and silently
        # lose one update; the loser advances to the next id.
        dirs = self._all_version_dirs()
        n = (dirs[-1][0] + 1) if dirs else 1
        while True:
            v = f"v{n}"
            out = os.path.join(self.path, v)
            try:
                os.mkdir(out)
                break
            except FileExistsError:
                n += 1
        df.write.mode("overwrite").parquet(out)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(v)
        os.replace(tmp, self._pointer)
        self._gc(keep=3)
        # Version bump = cache lifecycle boundary: unpersist/evict every
        # per-corpus sidecar (shingle postings, IVF centroids, cached
        # plans, table cache) keyed by this table's path or its corpus
        # dir, so a long-lived engine doesn't serve stale pinned plans.
        from trialstreamer_spark.util import evict_caches

        evict_caches(self.path)

    def merge(
        self, batch: DataFrame, key: str, deletes: DataFrame | None = None
    ) -> None:
        if self.current_version() is None:
            base = (
                self.spark.createDataFrame([], batch.schema)
                if self.schema is None
                else self.spark.createDataFrame([], self.schema)
            )
        else:
            base = self.read()
        self.overwrite(merge_upsert(base, batch, key, deletes))

    def versions(self) -> list[str]:
        """All retained COMMITTED version ids, oldest first — the
        time-travel surface. Retention = the `_gc(keep=3)` horizon plus
        the concurrent-reader grace period.

        Committed means id <= the current pointer: the pointer only ever
        moves forward (monotonic ids), so a dir numerically beyond it is
        residue from a crashed overwrite whose pointer flip never
        happened — a partial, uncommitted snapshot that must not be
        readable via time travel nor consume a retention slot."""
        cur = self.current_version()
        if cur is None:
            return []
        cur_n = self._vnum(cur)
        if cur_n is None:
            # a pointer naming something that isn't a version dir means
            # external corruption — fail loudly, not with a TypeError
            # three frames deeper
            raise ValueError(
                f"corrupt _current pointer {cur!r} in {self.path}: "
                "not a version dir name"
            )
        # id <= pointer is necessary but not sufficient: a CONCURRENT
        # writer's claimed-but-uncommitted dir (mkdir done, parquet write
        # not) can sit below the pointer. Committed additionally means
        # the write finished — the committer's _SUCCESS marker exists.
        return [
            d
            for n, d in self._all_version_dirs()
            if n <= cur_n
            and os.path.exists(os.path.join(self.path, d, "_SUCCESS"))
        ]

    def read_version(self, version: str) -> DataFrame:
        """Time travel: read a specific retained version (Delta's
        `versionAsOf`). The training-data use case: a model card pins the
        corpus version it trained on; as long as the version is within
        the retention horizon the exact snapshot is reproducible —
        version dirs are immutable once the pointer moves past them."""
        if version not in self.versions():
            raise ValueError(
                f"version {version!r} not retained (have {self.versions()})"
            )
        return self.spark.read.parquet(os.path.join(self.path, version))

    def diff(self, from_version: str, to_version: str, key: str) -> DataFrame:
        """Snapshot diff between two retained versions (Delta CDF /
        `table_changes` analog): one row per key that was added, removed,
        or changed, with a `change` column in {'insert','delete','update'}.
        The audit surface for incremental corpus builds — "what did
        yesterday's merge actually do" — and the input to downstream
        incremental re-processing (re-embed only changed docs).

        Plan shape: a single full-outer join on the key plus one
        hash-compare of the non-key columns; both sides shuffle on the
        key (co-located for free when the table is bucketed by it). The
        change predicate uses md5 over all non-key columns so the diff
        needs no per-column schema knowledge."""
        old, new = self.read_version(from_version), self.read_version(to_version)
        if set(old.columns) != set(new.columns):
            raise ValueError(
                "diff requires both versions to share a column set; "
                f"old-only={sorted(set(old.columns) - set(new.columns))}, "
                f"new-only={sorted(set(new.columns) - set(old.columns))}"
            )
        cols = sorted(c for c in new.columns if c != key)

        def fp(df: DataFrame) -> Column:
            # to_json over a struct is boundary- and NULL-safe: fields are
            # delimited/quoted by the JSON encoding (no separator-shift
            # collisions) and a NULL field is omitted entirely, which no
            # in-band sentinel value can collide with.
            return F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))

        o = old.select(key, fp(old).alias("__old_fp"))
        n = new.select(key, fp(new).alias("__new_fp"))
        joined = o.join(n, key, "full_outer")
        return joined.select(
            key,
            F.when(F.col("__old_fp").isNull(), F.lit("insert"))
            .when(F.col("__new_fp").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change"),
        ).where(
            F.col("__old_fp").isNull()
            | F.col("__new_fp").isNull()
            | (F.col("__old_fp") != F.col("__new_fp"))
        )

    def compact(self, target_files: int = 1) -> None:
        """Small-file compaction (the Delta OPTIMIZE analog): rewrite the
        current version into ``target_files`` files and flip the pointer.
        Every MERGE writes one file per shuffle partition, so daily
        incremental merges accumulate small files that erode scan
        throughput at 100 TB (footer reads + task-launch overhead
        dominate); periodic compaction bounds the file count. coalesce,
        not repartition — a narrow rewrite with no shuffle. No-op on an
        empty table."""
        if self.current_version() is None:
            return
        self.overwrite(self.read().coalesce(target_files))

    def _gc(self, keep: int) -> None:
        # Eligible for removal: committed versions beyond the keep
        # horizon, plus uncommitted residue dirs beyond the pointer
        # (crashed overwrites) — residue must not consume a keep slot.
        committed = self.versions()
        doomed = [d for d in committed[:-keep]] + [
            d for _, d in self._all_version_dirs() if d not in committed
        ]
        now = time.time()
        for d in doomed:
            full = os.path.join(self.path, d)
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue
            if age < self.gc_min_age_s:
                continue  # concurrent-reader grace: too young to delete
            shutil.rmtree(full, ignore_errors=True)
