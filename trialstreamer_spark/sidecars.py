"""Disk-backed sidecar catalog: per-corpus featurizations that survive a
session restart.

The in-memory ``util.cached_plan`` sidecars (shingle postings, minhash
signatures, cc_labels, phash bands, …) are session-lifetime: a deployed
engine restart recomputed every featurization (round-5 gap #1). This
module promotes a sidecar to a VERSIONED PARQUET table
(operators/upsert.ParquetTable — write-new-then-swap, committed-pointer
reads) stamped with a fingerprint of the corpus tables it was built
from:

- build path: compute once, write, stamp — the Delta/Iceberg "derived
  table" a real cluster would maintain;
- restart path: a fresh SparkSession whose stamp matches reads the
  parquet directly — NO re-featurization job touches the corpus;
- staleness: any corpus rewrite (ParquetTable version bump, file
  replacement) changes the fingerprint, so the stale sidecar is
  rebuilt on next access instead of silently served (the same
  stamp-check contract as api.engine.choose_search_path's postings
  stamp).

Layout: $SPARK_GRAFT_SIDECAR_DIR (default <repo>/spark-warehouse/
sidecars)/<md5(corpus dir)[:8]>_<name>/ as a ParquetTable, with a
``_corpus_fp`` stamp file beside the version dirs.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def corpus_fingerprint(
    sf_dir: str, tables: tuple[str, ...] = ("documents",)
) -> str:
    """Catalog-level identity of the source tables' current contents:
    (name, size, mtime_ns) per data file, hashed. No data is scanned —
    the same statistics a lakehouse catalog exposes as snapshot ids."""
    parts: list[str] = []
    for t in tables:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isfile(path):
            try:
                st = os.stat(path)
                parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
            except OSError:
                pass
            continue
        for dirpath, _dirs, files in os.walk(path):
            for f in sorted(files):
                try:
                    st = os.stat(os.path.join(dirpath, f))
                except OSError:
                    continue
                parts.append(f"{t}/{f}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def catalog_base() -> str:
    """Resolved sidecar catalog root. In-memory caches that front a
    disk sidecar must key on this too: pointing
    ``SPARK_GRAFT_SIDECAR_DIR`` elsewhere changes which committed
    artifact a read should serve, so a memory hit built for a
    different catalog would skip the new catalog's build entirely."""
    return os.environ.get(
        "SPARK_GRAFT_SIDECAR_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "spark-warehouse",
            "sidecars",
        ),
    )


def sidecar_path(sf_dir: str, name: str) -> str:
    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return os.path.join(catalog_base(), f"{h}_{name}")


def disk_cached_plan(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder,
    source_tables: tuple[str, ...] = ("documents",),
    post=None,
    key_extra: tuple = (),
):
    """Session-persisted view of a disk-backed sidecar: the committed
    parquet is the artifact of record (a restarted session reads it; a
    corpus version bump rebuilds it via the fingerprint stamp), while
    util.cached_plan pins the hot copy in memory for this session.

    This is the promotion path for every FINAL per-corpus featurization
    (quality signals, tf stats, kNN edges, assignment tables, …):
    intermediates stay memory-cached — once the finals are committed, a
    restart rebuilds nothing on the query path, and intermediates only
    re-run when a final is stale. ``post`` re-applies plan properties a
    parquet roundtrip cannot carry (e.g. a doc_id hash partitioning
    consumers rely on); ``key_extra`` distinguishes parameterized
    artifacts (df caps, panel sizes) in both the memory key and the
    table name."""
    from trialstreamer_spark.util import cached_plan

    disk_name = name + "".join(f"_{e}" for e in key_extra)

    def build():
        df = disk_sidecar(spark, sf_dir, disk_name, builder, source_tables)
        return post(df) if post is not None else df

    return cached_plan(spark, (name, sf_dir, *key_extra), build)


def disk_sidecar(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder,
    source_tables: tuple[str, ...] = ("documents",),
) -> DataFrame:
    """Return the committed on-disk copy of sidecar ``name`` for this
    corpus when its stamp is current; otherwise run ``builder()``, write
    it as the next ParquetTable version, stamp, and return the read.
    The returned DataFrame always scans parquet (callers persist it
    in-memory per session for hot paths)."""
    from trialstreamer_spark.operators.upsert import ParquetTable

    d = sidecar_path(sf_dir, name)
    table = ParquetTable(spark, d, gc_min_age_s=0.0)
    fp = corpus_fingerprint(sf_dir, source_tables)
    stamp = os.path.join(d, "_corpus_fp")
    if table.current_version() is not None:
        try:
            with open(stamp) as f:
                if f.read().strip() == fp:
                    return table.read()
        except OSError:
            pass
    table.overwrite(builder())
    tmp = stamp + ".tmp"
    with open(tmp, "w") as f:
        f.write(fp)
    os.replace(tmp, stamp)
    return table.read()
