"""Round-12 optimization shape tests: pin the plan properties the r12
rewrites bought, so a regression fails CI instead of surfacing as a
cluster bill. Values are covered by the oracle suites
(test_relational_oracle sf0.001, test_sf01_sweep sf0.01); these assert
the SHAPE."""

from __future__ import annotations

from trialstreamer_spark.plans.registry import QUERIES

import trialstreamer_spark.plans.all_queries  # noqa: F401  (registry fill)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_jaccard_calibration_intersects_arrays_not_postings(spark, sf_dir):
    """r12: exact |A∩B| comes from array_intersect over doc-keyed
    shingle arrays riding the signature joins — no exploded
    (doc, shingle) pair join and no tagged-union fold-back exchange."""
    p = optimized_of(QUERIES["dup_pair_jaccard_calibration"](spark, sf_dir))
    assert "array_intersect" in p
    assert "Union" not in p  # the est/exact tagged union is gone


def test_ann_recall_windows_carry_only_row_number(spark, sf_dir):
    """r12: the fused recall rank pass computes ONLY row_number (the
    in-cell running sums are implied for global top-k rows), and the
    rank filter group-limits per task before the exchange."""
    for q in ("ann_recall_at_k", "ann_nprobe_recall_curve"):
        p = plan_of(QUERIES[q](spark, sf_dir))
        assert "WindowGroupLimit" in p, q
        # exactly one window expression: the row_number rank — no
        # sum(...) windowspecdefinition remains
        window_args = [
            ln for ln in p.splitlines() if "windowspecdefinition" in ln
        ]
        assert window_args, q
        assert all("sum(" not in ln for ln in window_args), q


def test_weekly_drift_global_leg_reuses_week_rollup(spark, sf_dir):
    """r12: the global CDF consumes the (week, v_c) rollup directly
    under a tie-inclusive RANGE frame — no pre-merge aggregate keyed on
    v_c alone remains in the optimized plan."""
    import re

    p = optimized_of(QUERIES["weekly_value_quantile_drift"](spark, sf_dir))
    assert not re.search(r"Aggregate \[v_c#\d+L?\], \[v_c", p)
