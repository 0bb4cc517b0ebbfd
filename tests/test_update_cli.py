"""End-to-end daily-update orchestration (reference update.py): stream
ingest → incremental annotate → counts, and the medrxiv rebuild."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from fixtures.pubmed_xml import generate_xml_fixtures
from trialstreamer_spark import update
from trialstreamer_spark.operators.upsert import ParquetTable

XML_DIR = "/tmp/ts_xml_fixtures"


@pytest.fixture(scope="module")
def xml_dir():
    if not os.path.exists(XML_DIR):
        generate_xml_fixtures(XML_DIR)
    return XML_DIR


def test_update_pubmed_end_to_end(spark, xml_dir, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for f in os.listdir(xml_dir):
        shutil.copy(os.path.join(xml_dir, f), landing)
    wh = str(tmp_path / "wh")

    update.update_pubmed(spark, landing, wh)

    articles = ParquetTable(spark, os.path.join(wh, "pubmed_raw")).read()
    ann = ParquetTable(spark, os.path.join(wh, "pubmed_annotations")).read()
    pmids = {r.pmid for r in articles.select("pmid").collect()}
    ann_pmids = {r.pmid for r in ann.select("pmid").collect()}
    assert pmids == ann_pmids and len(pmids) > 0

    # rerun: no new files, no new annotations, state unchanged
    v_art = ParquetTable(spark, os.path.join(wh, "pubmed_raw")).current_version()
    v_ann = ParquetTable(
        spark, os.path.join(wh, "pubmed_annotations")
    ).current_version()
    update.update_pubmed(spark, landing, wh)
    assert (
        ParquetTable(spark, os.path.join(wh, "pubmed_raw")).current_version()
        == v_art
    )
    assert (
        ParquetTable(
            spark, os.path.join(wh, "pubmed_annotations")
        ).current_version()
        == v_ann
    )


def test_update_medrxiv(spark, tmp_path):
    feed = tmp_path / "collection.json"
    feed.write_text(
        json.dumps(
            {
                "rels": [
                    {
                        "rel_title": f"Preprint {i}",
                        "rel_abs": f"Abstract of trial {i}.",
                        "rel_date": "2020-05-04",
                        "rel_doi": f"10.1101/2020.{i}",
                        "rel_link": f"https://medrxiv.org/{i}",
                        "rel_authors": [],
                        "rel_site": "medrxiv",
                    }
                    for i in range(12)
                ]
            }
        )
    )
    wh = str(tmp_path / "wh")
    update.update_medrxiv(spark, str(feed), None, wh)
    out = ParquetTable(spark, os.path.join(wh, "medrxiv_covid19")).read()
    rows = out.collect()
    assert all(r.is_rct_sensitive for r in rows)
    assert 0 < len(rows) <= 12


def test_cli_arg_validation():
    with pytest.raises(SystemExit):
        update.main(["--source", "pubmed", "--warehouse", "/tmp/x"])
    with pytest.raises(SystemExit):
        update.main(["--source", "bogus", "--warehouse", "/tmp/x"])
