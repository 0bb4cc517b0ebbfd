"""Integration: engine queries over warehouses PRODUCED BY THE UPDATE
PATHS — the round-1 regressions where update-built tables couldn't serve
the query surface (medrxiv_covid19 schema divergence; update_log written
in a layout/column meta() couldn't read)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from trialstreamer_spark.api import engine

from tests.test_engine import FIXTURE_DIR

FEED = {
    "rels": [
        {
            "rel_title": "Trial of drug A for COVID-19",
            "rel_abs": "A randomized controlled trial of drug A.",
            "rel_date": "2020-05-04",
            "rel_doi": "10.1101/2020.01.001",
            "rel_link": "https://medrxiv.org/1",
            "rel_authors": [
                {"author_name": "Ada Lovelace", "author_inst": "X"},
                {"author_name": "Grace Hopper", "author_inst": "Y"},
            ],
            "rel_site": "medrxiv",
        },
        {
            "rel_title": "Trial of drug B",
            "rel_abs": "Another randomized trial.",
            "rel_date": "2021-01-15",
            "rel_doi": "10.1101/2021.02.002",
            "rel_link": "https://medrxiv.org/2",
            "rel_authors": [{"author_name": "Alan Turing", "author_inst": "Z"}],
            "rel_site": "biorxiv",
        },
    ]
}


@pytest.fixture()
def hybrid_warehouse(spark, tmp_path):
    """Fixture tables (symlinked) + room for update-produced tables, so
    engine queries that span both can run against one root."""
    from fixtures.generate import generate

    if not os.path.exists(os.path.join(FIXTURE_DIR, "pubmed.parquet")):
        generate(FIXTURE_DIR)
    wh = tmp_path / "wh"
    wh.mkdir()
    for fn in os.listdir(FIXTURE_DIR):
        if fn.endswith(".parquet") and not fn.startswith("medrxiv"):
            os.symlink(os.path.join(FIXTURE_DIR, fn), str(wh / fn))
    return str(wh)


def test_medrxiv_update_warehouse_serves_engine(spark, tmp_path, hybrid_warehouse):
    """A warehouse built via update --source=medrxiv must serve covid19
    and the picosearch preprint leg (full MEDRXIV_COVID19 schema:
    is_human, *_mesh, prob_low_bias, struct authors)."""
    from trialstreamer_spark.update import update_medrxiv

    feed_path = tmp_path / "collection.json"
    feed_path.write_text(json.dumps(FEED))
    update_medrxiv(spark, str(feed_path), None, hybrid_warehouse)

    tables = engine.Tables(spark, hybrid_warehouse)
    med = tables.t("medrxiv_covid19")
    # the engine-facing columns all exist with the stored shapes
    assert {"is_human", "prob_low_bias", "population_mesh", "authors"} <= set(
        med.columns
    )
    first_author = med.select(
        F.element_at("authors", 1)["author_name"].alias("a")
    ).collect()
    assert all(r.a for r in first_author)

    cov = engine.covid19(tables).collect()
    preprint_rows = [r for r in cov if r.result_set == "trialstreamer_preprint"]
    balanced = {
        r.doi for r in med.filter(F.col("is_rct_balanced")).collect()
    }
    assert {r.id for r in preprint_rows} == balanced

    pico = engine.picosearch(
        tables, [{"field": "population", "cui": engine.COVID_CUI}]
    ).collect()
    got_preprints = {
        r.pmid for r in pico if r.article_type == "preprint"
    }
    want = {
        r.doi
        for r in med.filter(
            F.col("is_rct_balanced") & F.col("is_human")
        ).collect()
    }
    assert got_preprints == want


def test_meta_reads_pipeline_warehouse(spark, tmp_path, hybrid_warehouse):
    """meta() must read the watermark from a PIPELINE-produced audit log
    (ParquetTable versioned dir, download_date column, fullcheck row)."""
    from fixtures.pubmed_xml import generate_xml_fixtures
    from trialstreamer_spark.streaming.pipeline import PubmedPipeline

    xml_dir = tmp_path / "xml"
    generate_xml_fixtures(str(xml_dir))
    pipe = PubmedPipeline(spark, hybrid_warehouse)
    pipe.run_batch(os.path.join(str(xml_dir), "*.xml.gz"))
    pipe.log_run("fullcheck")

    tables = engine.Tables(spark, hybrid_warehouse)
    log = tables.t("update_log")
    assert {"update_type", "source_filename", "source_date", "download_date",
            "update_date"} <= set(log.columns)
    row = engine.meta(tables).collect()[0]
    assert row.last_updated is not None  # the fullcheck watermark
    assert row.num_rcts is not None


def test_parquet_table_gc_respects_reader_grace(spark, tmp_path):
    """Versions younger than the grace period survive GC even beyond the
    keep horizon (a concurrent reader may still hold them open); with no
    grace they are pruned to the keep count."""
    import os as _os

    from trialstreamer_spark.operators.upsert import ParquetTable

    def versions(path):
        return sorted(
            d for d in _os.listdir(path)
            if d.startswith("v") and _os.path.isdir(_os.path.join(path, d))
        )

    graced = ParquetTable(spark, str(tmp_path / "graced"))  # default grace
    for i in range(5):
        graced.overwrite(spark.range(i + 1))
    assert len(versions(graced.path)) == 5  # all too young to delete

    eager = ParquetTable(spark, str(tmp_path / "eager"), gc_min_age_s=0.0)
    for i in range(5):
        eager.overwrite(spark.range(i + 1))
    assert len(versions(eager.path)) == 3  # keep=3, no grace
    # the current pointer always resolves to a surviving version
    assert eager.current_version() in versions(eager.path)
    assert eager.read().count() == 5


def test_parquet_table_compact_bounds_files_and_preserves_rows(spark, tmp_path):
    """compact() must rewrite the current version into the target file
    count without changing the table's contents."""
    import glob

    from trialstreamer_spark.operators.upsert import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "ct"), gc_min_age_s=0.0)
    df1 = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t.merge(df1.repartition(8), key="k")
    df2 = spark.range(50, 150).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    t.merge(df2.repartition(8), key="k")
    before = sorted(r.k for r in t.read().collect())

    def n_files() -> int:
        v = t.current_version()
        return len(glob.glob(os.path.join(str(tmp_path / "ct"), v, "*.parquet")))

    assert n_files() > 1
    t.compact(target_files=1)
    assert n_files() == 1
    after_rows = {r.k: r.v for r in t.read().collect()}
    assert sorted(after_rows) == before
    # last-writer-wins survived the rewrite
    assert after_rows[60] == 180 and after_rows[10] == 20
    # compacting an empty table is a no-op, not an error
    empty = ParquetTable(spark, str(tmp_path / "empty"))
    empty.compact()


def test_parquet_table_time_travel_reads_immutable_snapshots(spark, tmp_path):
    from trialstreamer_spark.operators.upsert import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "tt"))
    t.merge(
        spark.range(0, 10).select(F.col("id").alias("k"), F.lit("a").alias("v")),
        key="k",
    )
    v1 = t.current_version()
    t.merge(
        spark.range(5, 15).select(F.col("id").alias("k"), F.lit("b").alias("v")),
        key="k",
    )
    v2 = t.current_version()
    assert v1 != v2 and t.versions() == [v1, v2]
    # the old snapshot is intact: 10 rows, all 'a'
    old = t.read_version(v1)
    assert old.count() == 10
    assert {r.v for r in old.collect()} == {"a"}
    # current merged view: 15 rows, keys 5..9 overwritten to 'b'
    cur = {r.k: r.v for r in t.read().collect()}
    assert len(cur) == 15 and cur[7] == "b" and cur[2] == "a"
    # unknown version -> clear error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.read_version("v0")


def test_parquet_table_diff_classifies_changes(spark, tmp_path):
    from trialstreamer_spark.operators.upsert import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "diff"))
    t.merge(
        spark.range(0, 10).select(F.col("id").alias("k"), F.lit("a").alias("v")),
        key="k",
    )
    v1 = t.current_version()
    # keys 0-4 unchanged, 5-9 updated, 10-12 inserted, then delete 0-1
    t.merge(
        spark.range(5, 13).select(F.col("id").alias("k"), F.lit("b").alias("v")),
        key="k",
        deletes=spark.range(0, 2).select(F.col("id").alias("k")),
    )
    v2 = t.current_version()
    changes = {r.k: r.change for r in t.diff(v1, v2, key="k").collect()}
    assert changes == {
        **{k: "delete" for k in (0, 1)},
        **{k: "update" for k in range(5, 10)},
        **{k: "insert" for k in range(10, 13)},
    }
    # unchanged keys 2-4 are absent from the diff
    assert not any(k in changes for k in (2, 3, 4))
    # diff is symmetric-ish: reversing swaps insert/delete
    rev = {r.k: r.change for r in t.diff(v2, v1, key="k").collect()}
    assert rev[0] == "insert" and rev[10] == "delete" and rev[7] == "update"


def test_parquet_table_survives_stale_tmp_pointer(spark, tmp_path):
    """A crash between writing _current.tmp and the atomic rename leaves
    a stray tmp file; readers and the next writer must be unaffected."""
    from trialstreamer_spark.operators.upsert import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "crashy"))
    t.merge(
        spark.range(0, 5).select(F.col("id").alias("k"), F.lit("a").alias("v")),
        key="k",
    )
    # simulate the crash residue
    with open(t._pointer + ".tmp", "w") as f:
        f.write("vGARBAGE_NEVER_COMMITTED")
    assert t.read().count() == 5  # readers resolve the COMMITTED pointer
    t.merge(
        spark.range(5, 8).select(F.col("id").alias("k"), F.lit("b").alias("v")),
        key="k",
    )
    assert t.read().count() == 8  # next writer replaces the residue
    assert t.current_version() in t.versions()


def test_overwrite_version_claim_skips_concurrent_dir(spark, tmp_path):
    """The atomic version-id claim (ADVICE r5 #3): if another writer has
    already created the next version dir, overwrite() must advance past
    it instead of writing into it — no silent lost update — and the
    committed pointer must name the dir this writer actually wrote."""
    from trialstreamer_spark.operators.upsert import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "tbl"))
    t.overwrite(spark.range(3).selectExpr("id", "id * 2 AS x"))
    assert t.current_version() == "v1"

    # simulate a concurrent writer that claimed v2 but has not committed
    os.makedirs(str(tmp_path / "tbl" / "v2"))
    t.overwrite(spark.range(5).selectExpr("id", "id * 3 AS x"))
    assert t.current_version() == "v3"
    assert t.read().count() == 5
    # the foreign claim is not readable as a committed version
    assert "v2" not in t.versions()
