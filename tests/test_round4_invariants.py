"""Semantic invariants of the round-4 operators, checked on sf0.001 —
properties that must hold for ANY corpus, complementing the exact
oracle comparisons (which pin one corpus) with structural guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

import trialstreamer_spark.operators.dedup  # noqa: F401
import trialstreamer_spark.operators.similarity  # noqa: F401
import trialstreamer_spark.operators.textstats  # noqa: F401
import trialstreamer_spark.plans.relational  # noqa: F401
from trialstreamer_spark.io import load
from trialstreamer_spark.plans.registry import QUERIES


def test_cms_estimate_is_one_sided(spark, sf_dir):
    """Count-min error is strictly one-sided: estimate >= exact always."""
    df = QUERIES["cms_heavy_hitter_estimate"](spark, sf_dir)
    bad = df.filter(F.col("cms_n") < F.col("exact_n")).count()
    assert bad == 0


def test_funnel_stages_monotonically_shrink(spark, sf_dir):
    rows = {r["stage_idx"]: r["n_users"] for r in QUERIES[
        "funnel_conversion"](spark, sf_dir).collect()}
    assert rows[1] >= rows[2] >= rows[3]


def test_retention_week0_equals_cohort_size(spark, sf_dir):
    """Every user is active in their own first week, so the offset-0 cell
    of each cohort equals the cohort's size, and the matrix sums (over
    offset 0) to the distinct-user count."""
    e = load(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    m = QUERIES["retention_cohorts"](spark, sf_dir)
    week0 = (
        m.filter(F.col("week_offset") == 0)
        .agg(F.sum("n_active").alias("s"))
        .collect()[0]["s"]
    )
    assert week0 == n_users
    assert m.filter(F.col("week_offset") < 0).count() == 0


def test_histogram_quantiles_ordered_and_bounded(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    lo, hi = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    rows = {r["p"]: r["quantile_lower_bound"] for r in QUERIES[
        "histogram_quantiles"](spark, sf_dir).collect()}
    assert rows[50] <= rows[90] <= rows[99]
    assert rows[50] >= (lo // 1000) * 1000
    assert rows[99] <= hi


def test_minhash_estimate_within_unit_interval_and_candidates_only(spark, sf_dir):
    est = QUERIES["minhash_jaccard_estimate"](spark, sf_dir)
    assert est.filter(
        (F.col("est_jaccard") < 0) | (F.col("est_jaccard") > 1)
    ).count() == 0
    # every estimated pair is an LSH candidate pair (same band bucket →
    # at least 2/8 components agree → estimate >= 0.25)
    assert est.filter(F.col("est_jaccard") < 0.25).count() == 0


def test_incremental_dedup_covers_every_new_doc(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    n_new = d.filter(F.col("doc_id") % 10 == 0).count()
    out = QUERIES["dedup_incremental"](spark, sf_dir)
    assert out.count() == n_new
    assert out.select("doc_id").distinct().count() == n_new


def test_band_tuning_counts_consistent(spark, sf_dir):
    r = QUERIES["minhash_band_tuning"](spark, sf_dir).collect()[0]
    assert 0 <= r["n_hit"] <= min(r["n_candidates"], r["n_true"])
    if r["n_candidates"]:
        assert abs(r["precision"] - r["n_hit"] / r["n_candidates"]) < 1e-12
    if r["n_true"]:
        assert abs(r["recall"] - r["n_hit"] / r["n_true"]) < 1e-12


def test_band_tuning_is_lazy_and_plans_full_pipeline(spark, sf_dir):
    """The tuning query must stay LAZY: constructing it must not execute
    the dedup pipelines (the eager .head()+inline_rows regression), so
    its plan must contain the real full-outer join of the candidate and
    truth arms rather than a literal row."""
    df = QUERIES["minhash_band_tuning"](spark, sf_dir)
    p = df._jdf.queryExecution().optimizedPlan().toString()
    assert "FullOuter" in p or "full_outer" in p.lower()


def test_funnel_always_emits_three_stages(spark, sf_dir):
    """Even an empty stage emits its row (n_users=0) — the oracle's
    scalar subqueries always produce 3 rows."""
    df = QUERIES["funnel_conversion"](spark, sf_dir)
    assert df.count() == 3
    assert [r["stage_idx"] for r in df.collect()] == [1, 2, 3]
