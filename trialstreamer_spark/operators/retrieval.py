"""Ranked retrieval over the corpus: BM25-style scoring in exact
fixed-point arithmetic.

The reference ranks search results by a precomputed relevance score
(cnxapp.py ORDER BY score DESC LIMIT k over the annotations join); this
operator adds the corpus-side ranking function itself — the BM25 family
every retrieval pipeline (and every RAG data build) needs.

**Cross-engine determinism.** Classic BM25's idf is log((N-df+0.5)/
(df+0.5)); transcendental functions are NOT bit-identical across engines
(DuckDB's libm vs the JVM's intrinsics), so the hash-compared variant here
uses the *rational* idf (N-df+0.5)/(df+0.5) — the same monotone ranking
signal without the log. Every remaining operation is IEEE-754 +,*,/ on
identical operand orders (correctly rounded, so bit-identical), and the
per-term score is floored to a 1e-6 fixed-point int64 BEFORE the per-doc
sum — integer addition commutes, so partial aggregation order cannot flip
the hash. This is the same exact-arithmetic discipline as
operators/similarity (fixed-point cosine) and plans/relational
(integer-cent money).

Scale design: one explode of the corpus into (doc, term) postings filtered
to the query's terms (the filter is BEFORE the shuffle — only matching
postings move); df/N/avgdl are tiny aggregates broadcast back; final
ranking is TakeOrderedAndProject. At 100 TB the heavy stage is the
postings scan, which is embarrassingly parallel; nothing else grows with
corpus size except the (few-row) per-term df table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trialstreamer_spark.io import load
from trialstreamer_spark.operators.textstats import tokens_col
from trialstreamer_spark.plans.registry import query

K1 = 1.2
B = 0.75
SCORE_SCALE = 1_000_000
QUERY_TERMS: tuple[str, ...] = ("table", "merge", "spark")


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document fixed-point BM25(rational-idf) scores for ``terms``.

    Returns (doc_id, score_fp, n_terms_hit) for documents matching at
    least one term. score_fp = Σ_t floor(idf_r(t) · tf_norm(t,d) · 1e6).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens_col(F.col(text_col))).alias("tok"),
    )
    # dl: document length in tokens (all docs, null token counts as 0).
    dl = toks.groupBy("doc_id").agg(
        F.sum(F.when(F.col("tok").isNotNull(), 1).otherwise(0)).alias("dl")
    )
    # Globals: N and avgdl — a 1-row aggregate joined back by broadcast
    # (no driver-side collect; the plan stays pure).
    globals_df = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    # tf for query terms only — the filter precedes the shuffle.
    tf = (
        toks.where(F.col("tok").isin(*terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(globals_df))
    )
    # Operand order below is mirrored EXACTLY in the SQL oracle.
    idf_r = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tf_norm = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf")
        + K1 * ((1.0 - B) + B * (F.col("dl") / F.col("avgdl")))
    )
    term_fp = F.floor(idf_r * tf_norm * float(SCORE_SCALE)).cast("long")
    return scored.groupBy("doc_id").agg(
        F.sum(term_fp).alias("score_fp"),
        F.count("*").alias("n_terms_hit"),
    )


@query(
    "bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
      FROM documents
    ),
    dl AS (SELECT doc_id, len(t) AS dl FROM toks),
    g AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
          FROM dl),
    posting AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM posting WHERE tok IN ('table', 'merge', 'spark')
      GROUP BY 1, 2
    ),
    df_t AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             CAST(FLOOR(((g.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
                        * ((tf.tf * {K1 + 1.0}) /
                           (tf.tf + {K1} * (({1.0 - B}) + {B} * (dl.dl / g.avgdl))))
                        * {float(SCORE_SCALE)}) AS BIGINT) AS term_fp
      FROM tf
      JOIN dl ON dl.doc_id = tf.doc_id
      JOIN df_t ON df_t.tok = tf.tok
      CROSS JOIN g
    )
    SELECT doc_id, CAST(SUM(term_fp) AS BIGINT) AS score_fp,
           COUNT(*) AS n_terms_hit
    FROM scored
    GROUP BY doc_id
    ORDER BY score_fp DESC, doc_id
    LIMIT 20
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed query ('table','merge','spark') by
    fixed-point rational-idf BM25, deterministic tiebreak on doc_id. The
    final ranking compiles to TakeOrderedAndProject — only 20 rows per
    partition survive to the driver-side merge."""
    d = load(spark, sf_dir, "documents")
    return (
        bm25_scores(d, QUERY_TERMS)
        .orderBy(F.col("score_fp").desc(), "doc_id")
        .limit(20)
    )
