"""ICTRP JSONL source (S7 / parse_ictrp normalization parity)."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from trialstreamer_spark.sources import ictrp_json

RECORDS = [
    {
        "study_id": "NCT00000001",
        "scientific_title": "  A randomised controlled trial of X  ",
        "health_conditions": [{"description": " Migraine "}],
        "interventions": [{"description": "Drug X"}, {"description": " Placebo"}],
        "outcomes": [{"description": "Headache days"}],
        "study_design": "Randomized controlled trial",
        "recruitment_status": "Recruiting",
        "target_size": "250",
        "date_registered": "2021-03-04",
        "countries": ["Denmark", "Sweden"],
    },
    {
        # degenerate record: missing nearly everything
        "study_id": "EUCTR-002",
        "scientific_title": "",
        "study_design": "single arm open label",
        "target_size": "not a number",
        "date_registered": "04/03/2021",  # wrong format -> null
    },
]


@pytest.fixture(scope="module")
def jsonl(tmp_path_factory):
    p = tmp_path_factory.mktemp("ictrp") / "trials.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in RECORDS))
    return str(p)


def test_normalization(spark, jsonl):
    rows = {r.regid: r for r in ictrp_json.read_ictrp_json(spark, jsonl).collect()}
    a = rows["NCT00000001"]
    assert a.ti == "A randomised controlled trial of X"
    assert a.population == ["Migraine"]
    assert a.interventions == ["Drug X", "Placebo"]
    assert a.is_rct == "RCT"
    assert a.is_recruiting == "recruiting"
    assert a.target_size == "250"
    assert a.date_registered == dt.date(2021, 3, 4)
    assert a.year == 2021
    assert a.countries == ["Denmark", "Sweden"]

    b = rows["EUCTR-002"]
    assert b.ti == "unknown"  # empty title fallback
    assert b.population == [] and b.outcomes == []
    assert b.is_rct == "non-RCT"  # 'single arm' phrase list
    assert b.is_recruiting == "unknown"
    assert b.target_size == "unknown"
    assert b.date_registered is None and b.year is None
    assert b.countries == []


def test_concept_annotation_hook(spark, jsonl):
    trials = ictrp_json.read_ictrp_json(spark, jsonl)
    captured = {}

    def fake_matcher(df):
        captured["cols"] = df.columns
        return df

    out = ictrp_json.with_concept_annotations(trials, fake_matcher)
    row = out.filter(out.regid == "NCT00000001").collect()[0]
    assert "population_clean" in captured["cols"]
    # cleanup (ictrp.py:156-159) strips punctuation but does NOT
    # lowercase — minimap's own normalization lowercases downstream
    assert row.population_clean == ["Migraine"]
    assert row.interventions_clean == ["Drug X", "Placebo"]
