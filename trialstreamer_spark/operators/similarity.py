"""Similarity search over embedding columns (array<float>).

The reference serves ANN via per-field Annoy indexes over 768-d BERT
vectors (trialstreamer/PICO_search.py:16-85, nb/annoy.ipynb). Here:

- **brute-force cosine top-k** — the exact baseline: broadcast the query
  vector, one narrow pass computing cosine per row, TakeOrderedAndProject
  for the top-k. At 100 TB this is a full scan but embarrassingly
  parallel; it is the rerank stage of the ANN path below.
- **sign-LSH bucketing** — the scale path: bucket vectors by the sign
  pattern of a fixed set of dimensions (a degenerate random-hyperplane
  LSH with axis-aligned planes — deterministic, so oracle-checkable).
  Candidates come from equi-joining buckets; exact cosine reranks.
  Swap the axis planes for seeded random hyperplanes in production; the
  plan shape (bucket → equi-join → rerank) is identical.

Float determinism: dot products and norms are computed in fixed-point —
each elementwise product is floored to 1e-7 resolution and summed as
int64 (exact, order-independent), then one final double division+sqrt.
This makes cosine bit-identical across engines (see
plans/relational.py docstring for why naive double sums are not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from trialstreamer_spark.io import load
from trialstreamer_spark.plans.registry import query

SCALE = 10_000_000  # 1e-7 fixed-point resolution


def dot_fp(a: Column, b: Column) -> Column:
    """Fixed-point dot product: floor(x*y*SCALE) summed as int64.
    Exact given identical inputs; order-independent."""
    # cast each element to double BEFORE multiplying: float*float in Spark
    # stays float32 (precision loss), while the oracle multiplies doubles.
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(float(SCALE))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm_sq_fp(a: Column) -> Column:
    return dot_fp(a, a)


def cosine_fp(a: Column, b: Column) -> Column:
    """Cosine from fixed-point components — one double division and sqrt
    on identical int64 inputs → bit-identical across engines."""
    return dot_fp(a, b) / F.sqrt(
        norm_sq_fp(a).cast("double") * norm_sq_fp(b).cast("double")
    )


def brute_force_topk(
    vectors: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query row against the vector table.
    query_df is broadcast (queries ≪ corpus); the join is a Cartesian of
    (corpus × #queries) evaluated scan-side — no shuffle of the corpus;
    the top-k is TakeOrderedAndProject per query via window row_number."""
    from pyspark.sql import Window as W

    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        vectors.alias("v")
        .join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_fp(F.col(vec_col), F.col("qvec")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def sign_lsh_bucket(vec: Column, n_planes: int = 12) -> Column:
    """Axis-aligned sign-LSH bucket key: '+'/'-' per leading dimension.
    Deterministic; replace with seeded random hyperplanes at deploy time
    (same plan shape, one broadcast matrix more)."""
    return F.concat(
        *[
            F.when(F.element_at(vec, i + 1) > 0, F.lit("+")).otherwise(F.lit("-"))
            for i in range(n_planes)
        ]
    )


def lsh_candidate_pairs(
    vectors: DataFrame,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed candidate pairs + exact cosine rerank. The equi-join on
    the bucket key shuffles only (bucket, id, vec); md5-uniform buckets
    at scale; AQE splits residual skew."""
    b = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        sign_lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.col("l.bucket").alias("bucket"),
            cosine_fp(F.col("l.vec"), F.col("r.vec")).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# queries()/oracle_sql() registrations
# ---------------------------------------------------------------------------

_DD_DOT_FP = (
    "list_aggregate(list_transform(list_zip({a}, {b}), "
    "p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000000) AS BIGINT)), 'sum')"
)


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id AS neighbor_id, e.label,
             CAST({_DD_DOT_FP.format(a="e.embedding", b="q.qvec")} AS BIGINT)
               / SQRT(CAST(CAST({_DD_DOT_FP.format(a="e.embedding", b="e.embedding")} AS BIGINT) AS DOUBLE)
                      * CAST(CAST({_DD_DOT_FP.format(a="q.qvec", b="q.qvec")} AS BIGINT) AS DOUBLE))
               AS cosine
      FROM embeddings e, q
      WHERE e.vec_id <> 0
    )
    SELECT neighbor_id, label, cosine
    FROM scored
    ORDER BY cosine DESC, neighbor_id
    LIMIT 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0 (ref
    PICO_search.py:70-81 get_nns_by_vector, exact baseline). Query vector
    broadcast; corpus scanned once; TakeOrderedAndProject top-k."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "label",
            cosine_fp(F.col("embedding"), F.col("qvec")).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        .limit(10)
    )


@query(
    "lsh_bucket_stats",
    oracle="""
    SELECT bucket, COUNT(*) AS n_vectors, COUNT(DISTINCT label) AS n_labels
    FROM (
      SELECT vec_id, label,
             array_to_string(list_transform(embedding[1:12],
                             x -> CASE WHEN x > 0 THEN '+' ELSE '-' END), '') AS bucket
      FROM embeddings
    )
    GROUP BY bucket
    HAVING COUNT(*) > 1
    ORDER BY bucket
    """,
)
def lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket occupancy (the candidate-generation stage of the
    ANN scale path). Bucket key computed scan-side; one shuffle on the
    12-char key."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id", "label", sign_lsh_bucket(F.col("embedding"), 12).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.countDistinct("label").alias("n_labels"))
        .filter(F.col("n_vectors") > 1)
        .orderBy("bucket")
    )


@query(
    "vector_centroids",
    oracle="""
    SELECT label, CAST(idx AS INTEGER) AS idx,
           CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
             / 1000000.0 / COUNT(*) AS centroid
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) AS idx,
             unnest(embedding) AS val
      FROM embeddings
    )
    GROUP BY label, idx
    ORDER BY label, idx
    """,
)
def vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (the cluster-summary / IVF coarse
    quantizer build step). posexplode → fixed-point sum per (label, dim).
    At 100 TB the shuffle carries (label, dim, int64 partial sums) thanks
    to map-side partial aggregation — independent of row count."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("idx0", "val"))
        .select(
            "label",
            (F.col("idx0") + 1).cast("int").alias("idx"),
            F.floor(F.col("val").cast("double") * 1_000_000).cast("long").alias("v_fp"),
        )
        .groupBy("label", "idx")
        .agg((F.sum("v_fp") / 1_000_000.0 / F.count("*")).alias("centroid"))
        .orderBy("label", "idx")
    )


_DD_BUCKET = (
    "array_to_string(list_transform(embedding[1:12], "
    "x -> CASE WHEN x > 0 THEN '+' ELSE '-' END), '')"
)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH b AS (SELECT vec_id, embedding, {_DD_BUCKET} AS bucket FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
             CAST({_DD_DOT_FP.format(a="a.embedding", b="c.embedding")} AS BIGINT)
               / SQRT(CAST(CAST({_DD_DOT_FP.format(a="a.embedding", b="a.embedding")} AS BIGINT) AS DOUBLE)
                      * CAST(CAST({_DD_DOT_FP.format(a="c.embedding", b="c.embedding")} AS BIGINT) AS DOUBLE))
               AS cosine
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM pairs
    WHERE cosine >= 0.2
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection: sign-LSH buckets generate
    candidates, exact fixed-point cosine verifies — the embedding-space
    member of the dedup family (exact/minhash/simhash/jaccard in
    operators/dedup.py). Only (bucket, id, vec) shuffles; the verify is
    an in-bucket equi-join, never corpus × corpus. Threshold is the
    dedup aggressiveness knob (0.2 here so the synthetic fixture, which
    has no true near-dups, still exercises the verify stage)."""
    e = load(spark, sf_dir, "embeddings")
    return (
        lsh_candidate_pairs(e)
        .filter(F.col("cosine") >= 0.2)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH cc AS (
      SELECT label, CAST(idx AS INTEGER) AS idx,
             CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
               / 1000000.0 / COUNT(*) AS c
      FROM (SELECT label, generate_subscripts(embedding, 1) AS idx,
                   unnest(embedding) AS val
            FROM embeddings)
      GROUP BY label, idx
    ),
    cent AS (SELECT label, list(c ORDER BY idx) AS cvec FROM cc GROUP BY label),
    q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    cells AS (
      SELECT cent.label FROM cent, q
      ORDER BY CAST({_DD_DOT_FP.format(a="cent.cvec", b="q.qvec")} AS BIGINT)
                 / SQRT(CAST(CAST({_DD_DOT_FP.format(a="cent.cvec", b="cent.cvec")} AS BIGINT) AS DOUBLE)
                        * CAST(CAST({_DD_DOT_FP.format(a="q.qvec", b="q.qvec")} AS BIGINT) AS DOUBLE)) DESC,
               cent.label
      LIMIT 2
    )
    SELECT e.vec_id AS neighbor_id, e.label,
           CAST({_DD_DOT_FP.format(a="e.embedding", b="q.qvec")} AS BIGINT)
             / SQRT(CAST(CAST({_DD_DOT_FP.format(a="e.embedding", b="e.embedding")} AS BIGINT) AS DOUBLE)
                    * CAST(CAST({_DD_DOT_FP.format(a="q.qvec", b="q.qvec")} AS BIGINT) AS DOUBLE))
             AS cosine
    FROM embeddings e, q
    WHERE e.label IN (SELECT label FROM cells) AND e.vec_id <> 0
    ORDER BY cosine DESC, neighbor_id
    LIMIT 10
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (the scale path beyond brute force): coarse
    quantizer = per-cell centroids (fixed-point means, deterministic);
    probe the query's nprobe=2 nearest cells; exact-rerank only their
    members. At 100 TB: centroids are a broadcast-sized sidecar, cell
    membership prunes the scan (partition the vector table by cell id so
    pruning happens at the file level), and the rerank is the brute-force
    kernel over ~nprobe/K of the corpus."""
    e = load(spark, sf_dir, "embeddings")
    cent = (
        e.select("label", F.posexplode("embedding").alias("idx0", "val"))
        .select(
            "label",
            (F.col("idx0") + 1).alias("idx"),
            F.floor(F.col("val").cast("double") * 1_000_000)
            .cast("long")
            .alias("v_fp"),
        )
        .groupBy("label", "idx")
        .agg((F.sum("v_fp") / 1_000_000.0 / F.count("*")).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "c"))),
                lambda s: s.c,
            ).alias("cvec")
        )
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    cells = (
        cent.join(F.broadcast(q))
        .select("label", cosine_fp(F.col("cvec"), F.col("qvec")).alias("ccos"))
        .orderBy(F.col("ccos").desc(), "label")
        .limit(2)
        .select("label")
    )
    return (
        e.join(F.broadcast(cells), "label")
        .filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "label",
            cosine_fp(F.col("embedding"), F.col("qvec")).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "neighbor_id")
        .limit(10)
    )
