"""Inverted postings physical design for concept search at 100 TB
(SURVEY §4: the replacement for Postgres's GIN ``@>`` indexes).

The parity path (`api/engine.terms_predicate`) evaluates
``exists(field_mesh, …)`` per row — a full scan of the flag-filtered
annotations. That is correct at any scale but reads every concept array.
The scale path materializes the explode ONCE:

    postings(cui, field, pmid)   — bucketed/partitioned by cui

and answers a conjunctive expanded-term query with:

1. per term: partition-pruned lookup of the expanded CUI list in its
   field — touches only the queried CUIs' buckets;
2. AND across terms as ONE aggregation: tag each term's hits with the
   term index, ``groupBy(pmid)`` counting distinct satisfied terms,
   keep rows satisfying all — one shuffle regardless of term count
   (chained semi-joins would be n shuffles);
3. semi-join the surviving pmids back to the (pmid-bucketed) article
   table.

Both paths return identical row sets (asserted in
tests/test_postings.py); the engine picks by table-size hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PICO_FIELDS = ("population", "interventions", "outcomes")


def build_postings(annotations: DataFrame) -> DataFrame:
    """annotations → (cui, field, pmid) postings. One explode per PICO
    field, unioned; writers should ``.repartition("cui")`` +
    ``bucketBy/partitionBy`` on cui so term lookups prune files."""
    legs = [
        annotations.select(
            F.explode(F.col(f"{field}_mesh")).alias("m"),
            F.lit(field).alias("field"),
            "pmid",
        ).select(F.col("m.cui").alias("cui"), "field", "pmid")
        for field in PICO_FIELDS
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.distinct()


def matching_pmids(postings: DataFrame, expanded_terms: list[dict]) -> DataFrame:
    """Conjunctive match over the postings table.

    expanded_terms: [{"field": ..., "cuis": [...]}] — the ontology
    expansion already applied at query-build time (G1/G2), exactly as
    the exists() path bakes literals into the predicate.
    """
    if not expanded_terms:
        raise ValueError("No terms in the search")
    legs = []
    for idx, term in enumerate(expanded_terms):
        legs.append(
            postings.filter(
                (F.col("field") == term["field"])
                & F.col("cui").isin(list(term["cuis"]))
            ).select("pmid", F.lit(idx).alias("term_idx"))
        )
    tagged = legs[0]
    for leg in legs[1:]:
        tagged = tagged.unionByName(leg)
    n = len(expanded_terms)
    return (
        tagged.groupBy("pmid")
        .agg(F.countDistinct("term_idx").alias("n_terms"))
        .filter(F.col("n_terms") == n)
        .select("pmid")
    )


def search_articles(
    articles: DataFrame, postings: DataFrame, expanded_terms: list[dict]
) -> DataFrame:
    """pmid semi-join back to the article table (both bucketed by pmid
    at scale → shuffle-free)."""
    return articles.join(
        matching_pmids(postings, expanded_terms), "pmid", "left_semi"
    )
