"""Independent boundary-semantics tests for the shared-spec queries
(r10 VERDICT #5 / r11): whale_revenue_share survived nine rounds of
green oracle hashes because BOTH engines carried the same spec error —
the hash-match gate is structurally blind to that class. These tests
construct each query's edge case from first principles (tiny
hand-written corpora, expected values computed by hand in the comments)
and never reuse the registered oracle SQL.

Covered boundaries:
- quality_budget_selection: the minimal-prefix budget line — a doc whose
  cumulative-before EXACTLY equals the budget is excluded (strict <);
  the doc that STARTS inside and overshoots is included whole.
- stratified_eval_split: the md5 hex-range boundaries eb|ec (train/val)
  and f5|f6 (val/test), plus disjoint-exhaustive assignment.
- dedup_keep_best_quality: argmax-by-quality THEN min-doc_id — a longer
  near-dup with a HIGHER doc_id must win its cluster; an exact-tie
  cluster falls back to min doc_id.
- high_value_parts: a part sitting EXACTLY at 1.5x the mean part value
  is excluded (strict >).
- orders_above_customer_avg: an order EXACTLY at 1.5x its customer's
  average is excluded (strict >).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from trialstreamer_spark.plans.all_queries import QUERIES


def _write(tmp_path, name: str, df: pd.DataFrame) -> None:
    df.to_parquet(str(tmp_path / f"{name}.parquet"), index=False)


def _docs(rows: list[tuple[int, str, str]]) -> pd.DataFrame:
    """(doc_id, text, source) rows → full documents schema."""
    return pd.DataFrame(
        {
            "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": pd.Series([len(r[1]) for r in rows], dtype="int64"),
        }
    )


# ---------------------------------------------------------------------------
# quality_budget_selection — budget line is strict on cum-BEFORE
# ---------------------------------------------------------------------------


def test_budget_boundary_doc_exactly_at_line_excluded(spark, tmp_path):
    # source s1, BUDGET = 1/4: total tokens 8 -> budget line at 2.
    # rank 1 (q=2): "x y"   n=2, cum_before=0  -> kept (0*4 < 8)
    # rank 2 (q=1): "z z z" n=3, cum_before=2  -> 2*4 < 8 is FALSE:
    #               the doc STARTING exactly at the line is excluded
    # rank 3 (q=1, higher id): "w w w" -> excluded
    # source s2: rank-1 doc overshoots the whole budget but STARTS at 0,
    # so it is kept IN FULL (7 of 8 tokens) and the source keeps >= 1.
    _write(
        tmp_path,
        "documents",
        _docs(
            [
                (10, "x y", "s1"),
                (11, "z z z", "s1"),
                (12, "w w w", "s1"),
                (20, "p q r s t u v", "s2"),
                (21, "k", "s2"),
            ]
        ),
    )
    rows = {
        r["source"]: r
        for r in QUERIES["quality_budget_selection"](
            spark, str(tmp_path)
        ).collect()
    }
    s1 = rows["s1"]
    assert (s1["n_docs"], s1["tokens_total"]) == (3, 8)
    assert s1["n_kept"] == 1, "doc with cum_before == budget must be excluded"
    assert s1["tokens_kept"] == 2
    s2 = rows["s2"]
    assert (s2["n_kept"], s2["tokens_kept"]) == (1, 7), (
        "the doc that STARTS inside the budget is kept whole"
    )


# ---------------------------------------------------------------------------
# stratified_eval_split — hex-range boundaries and disjoint-exhaustive
# ---------------------------------------------------------------------------


def _id_with_md5_prefix(prefix: str, taken: set[int]) -> int:
    i = 0
    while True:
        if i not in taken and hashlib.md5(str(i).encode()).hexdigest().startswith(
            prefix
        ):
            return i
        i += 1


def test_split_hex_boundaries(spark, tmp_path):
    # One doc pinned at each side of both split boundaries:
    # md5 prefix eb -> train (last train bucket), ec -> val (first val),
    # f5 -> val (last val), f6 -> test (first test).
    taken: set[int] = set()
    ids = {}
    for p in ("eb", "ec", "f5", "f6"):
        ids[p] = _id_with_md5_prefix(p, taken)
        taken.add(ids[p])
    _write(
        tmp_path,
        "documents",
        _docs([(ids[p], "one two three", "s") for p in ("eb", "ec", "f5", "f6")]),
    )
    out = {
        (r["source"], r["split"]): r
        for r in QUERIES["stratified_eval_split"](spark, str(tmp_path)).collect()
    }
    assert out[("s", "train")]["n_docs"] == 1  # eb
    assert out[("s", "val")]["n_docs"] == 2  # ec, f5
    assert out[("s", "test")]["n_docs"] == 1  # f6
    # disjoint + exhaustive: every doc lands in exactly one split
    assert sum(r["n_docs"] for r in out.values()) == 4
    # token counts ride the same rows (3 whitespace tokens per doc)
    assert out[("s", "val")]["n_tokens"] == 6


# ---------------------------------------------------------------------------
# dedup_keep_best_quality — argmax by n_words, THEN min doc_id
# ---------------------------------------------------------------------------


def test_keep_best_quality_argmax_and_tie_policy(spark, tmp_path):
    # Cluster A: docs 1,2 EXACT duplicates (5 words each) -> quality tie,
    #   policy keeps min doc_id = 1.
    # Cluster B: docs 3 (6 words) and 4 (9 words) share an IDENTICAL
    #   3-gram shingle SET ("one two three" cycled 2x vs 3x yields the
    #   same distinct trigrams), so they band-collide by construction —
    #   the LONGER, HIGHER-ID doc 4 must win (a min-id-first bug would
    #   keep doc 3).
    # Doc 5: singleton cluster, kept trivially.
    _write(
        tmp_path,
        "documents",
        _docs(
            [
                (1, "alpha beta gamma delta epsilon", "s"),
                (2, "alpha beta gamma delta epsilon", "s"),
                (3, "one two three one two three", "s"),
                (4, "one two three one two three one two three", "s"),
                (5, "solo unique words here now", "s"),
            ]
        ),
    )
    rows = {
        r["doc_id"]: r
        for r in QUERIES["dedup_keep_best_quality"](spark, str(tmp_path)).collect()
    }
    assert set(rows) == {1, 4, 5}
    assert (rows[1]["n_words"], rows[1]["cluster_size"]) == (5, 2)
    assert (rows[4]["n_words"], rows[4]["cluster_size"]) == (9, 2), (
        "higher-quality copy must win even with the higher doc_id"
    )
    assert (rows[5]["n_words"], rows[5]["cluster_size"]) == (5, 1)


# ---------------------------------------------------------------------------
# high_value_parts — strict > at exactly 1.5x the mean part value
# ---------------------------------------------------------------------------


def _lineitem(vals: list[tuple[int, float]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "l_partkey": pd.Series([v[0] for v in vals], dtype="int64"),
            "l_extendedprice": [v[1] for v in vals],
        }
    )


def test_high_value_parts_exact_boundary_excluded(spark, tmp_path):
    # values (cents): 300, 100, 200 -> total 600 over 3 parts, mean 200,
    # 1.5x mean = 300. Part 1 sits EXACTLY at the line: 300*3*2 = 1800 is
    # NOT > 3*600 = 1800 -> nothing qualifies.
    _write(tmp_path, "lineitem", _lineitem([(1, 3.00), (2, 1.00), (3, 2.00)]))
    assert QUERIES["high_value_parts"](spark, str(tmp_path)).count() == 0


def test_high_value_parts_just_above_boundary_kept(spark, tmp_path):
    # values (cents): 301, 100, 199 -> total 600; 301*6 = 1806 > 1800.
    _write(tmp_path, "lineitem", _lineitem([(1, 3.01), (2, 1.00), (3, 1.99)]))
    rows = QUERIES["high_value_parts"](spark, str(tmp_path)).collect()
    assert [(r["partkey"], r["value_cents"]) for r in rows] == [(1, 301)]
    # share_fp = 1000000 * 301 // 600
    assert rows[0]["share_fp"] == 501666


# ---------------------------------------------------------------------------
# orders_above_customer_avg — strict > at exactly 1.5x the customer mean
# ---------------------------------------------------------------------------


def test_orders_above_customer_avg_exact_boundary(spark, tmp_path):
    # cust 1: orders 3.00/1.00/2.00 -> sum 600c over 3, mean 200c;
    #   the 300c order sits EXACTLY at 1.5x mean: 2*300*3 = 1800 is NOT
    #   > 3*600 = 1800 -> no row from cust 1.
    # cust 2: orders 3.01/1.00/1.99 -> 2*301*3 = 1806 > 1800 -> exactly
    #   the 301c order qualifies.
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_custkey": pd.Series([1, 1, 1, 2, 2, 2], dtype="int64"),
                "o_totalprice": [3.00, 1.00, 2.00, 3.01, 1.00, 1.99],
            }
        ),
    )
    _write(
        tmp_path,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": pd.Series([1, 2], dtype="int64"),
                "c_nationkey": pd.Series([0, 0], dtype="int64"),
            }
        ),
    )
    _write(
        tmp_path,
        "nation",
        pd.DataFrame(
            {
                "n_nationkey": pd.Series([0], dtype="int64"),
                "n_name": ["ALPHA"],
            }
        ),
    )
    rows = QUERIES["orders_above_customer_avg"](spark, str(tmp_path)).collect()
    assert [(r["nation"], r["n_orders"], r["revenue_cents"]) for r in rows] == [
        ("ALPHA", 1, 301)
    ]
