"""Postings-table search path ≡ exists()-scan search path, plus the
retmode additions (abbrev enrichment, RIS export, dataset export)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from trialstreamer_spark.api import engine
from trialstreamer_spark.plans import postings as P

FIXTURE_DIR = "/tmp/ts_fixtures"


@pytest.fixture(scope="module")
def tables(spark):
    from fixtures.generate import generate

    if not os.path.exists(os.path.join(FIXTURE_DIR, "pubmed.parquet")):
        generate(FIXTURE_DIR)
    return engine.Tables(spark, FIXTURE_DIR)


def _expanded(tables, terms):
    return [
        {"field": t["field"], "cuis": engine.subtree_cuis(tables, t["cui"])}
        for t in terms
    ]


def _cooccurring_terms(ann):
    """A (population, interventions) CUI pair from one annotation row,
    so the conjunctive query is guaranteed non-empty."""
    row = (
        ann.filter(
            (F.size("population_mesh") > 0) & (F.size("interventions_mesh") > 0)
        )
        .select(
            F.col("population_mesh")[0]["cui"].alias("p"),
            F.col("interventions_mesh")[0]["cui"].alias("i"),
        )
        .first()
    )
    return [
        {"field": "population", "cui": row.p},
        {"field": "interventions", "cui": row.i},
    ]


@pytest.mark.parametrize("n_terms", [1, 2])
def test_postings_path_equals_exists_path(spark, tables, n_terms):
    ann = tables.t("pubmed_annotations")
    terms = _cooccurring_terms(ann)[:n_terms]
    post = P.build_postings(ann)
    via_postings = {
        r.pmid
        for r in P.matching_pmids(post, _expanded(tables, terms)).collect()
    }
    via_exists = {
        r.pmid
        for r in ann.filter(engine.terms_predicate(tables, terms))
        .select("pmid")
        .collect()
    }
    assert via_postings == via_exists
    assert len(via_postings) > 0


def test_search_articles_semijoin(spark, tables):
    terms = [{"field": "population", "cui": "C0000001"}]
    out = P.search_articles(
        tables.t("pubmed"),
        P.build_postings(tables.t("pubmed_annotations")),
        _expanded(tables, terms),
    )
    assert "ti" in out.columns  # full article rows
    assert out.count() > 0
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p


def test_with_abbreviations(spark, tables):
    df = spark.createDataFrame(
        [("p1", "We ran a randomized controlled trial (RCT) in Boston.")],
        ["pmid", "ab"],
    )
    out = engine.with_abbreviations(df).collect()[0]
    assert dict(out.abbrev_dict) == {"RCT": "randomized controlled trial"}


def test_picosearch_ris(spark, tables):
    text = engine.picosearch_ris(
        tables, [{"field": "population", "cui": "C0000001"}]
    )
    assert "TY  - JOUR" in text
    assert "DB  - Trialstreamer" in text
    assert "ER  - " in text
    # one TY per record, records non-empty
    assert text.count("TY  - JOUR") == text.count("ER  - ") > 0


def test_export_articles(spark, tables):
    out = engine.export_articles(tables, "balanced")
    assert out.count() > 0
    assert set(out.columns) == {"pmid", "ti", "ab", "year", "pm_data"}
    with pytest.raises(ValueError):
        engine.export_articles(tables, "bogus")
