"""Dedup / similarity / textstats operators vs DuckDB oracle (sf0.001),
plus semantic sanity checks that don't depend on the oracle."""

from __future__ import annotations

import pytest

import trialstreamer_spark.operators.dedup as dedup
import trialstreamer_spark.operators.similarity  # noqa: F401
import trialstreamer_spark.operators.textstats  # noqa: F401
from trialstreamer_spark.io import load
from trialstreamer_spark.plans.registry import ORACLES, QUERIES

from tests.oracle_util import assert_matches

OPERATOR_QUERIES = [
    "text_quality_stats",
    "lang_id",
    "doc_fingerprint",
    "token_count_by_lang",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_cosine_topk",
    "lsh_bucket_stats",
    "vector_centroids",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "topk_per_group",
    "match_rate_pivot",
    "dedup_apply_canonical",
    "price_quantiles",
    "langs_per_source",
    "heavy_hitter_tokens",
]


@pytest.mark.parametrize("name", OPERATOR_QUERIES)
def test_operator_matches_oracle(spark, sf_dir, name):
    assert name in ORACLES, f"{name} not registered with an oracle"
    assert_matches(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_minhash_candidates_superset_of_high_jaccard(spark, sf_dir):
    """LSH with 4 bands x 2 rows catches near-identical docs: any pair
    with jaccard >= 0.9 must appear in the candidate set (probabilistic
    bound ~1-(1-.9^2)^4 = 99.97%; deterministic here since the corpus is
    fixed)."""
    d = load(spark, sf_dir, "documents")
    high = {
        (r.doc_a, r.doc_b)
        for r in dedup.jaccard_pairs(d, threshold=0.9).collect()
    }
    cands = {
        (r.doc_a, r.doc_b) for r in dedup.minhash_candidates(d).collect()
    }
    assert high <= cands


def test_simhash_range(spark, sf_dir):
    rows = QUERIES["dedup_simhash"](spark, sf_dir).collect()
    assert all(0 <= r.simhash < 2**16 for r in rows)
    assert len(rows) == load(spark, sf_dir, "documents").count()
