"""Embedding-space clustering: k-means assignment in exact fixed-point
arithmetic.

Corpus clustering (topic balancing, dedup-aware sampling, domain mixing)
is a standard stage in training-data pipelines; the reference's embedding
surface stops at ANN search (PICO_search.py:18-85), so this extends it
with the assignment step of Lloyd's algorithm. The centroid-update step
is the same mechanics as similarity.vector_centroids (grouped per-label
mean with map-side partial aggregation), so one Lloyd iteration =
kmeans_assign ∘ vector_centroids.

Exactness: distances use the same 1e-7 fixed-point kernel as
operators/similarity — dist_fp(a,c) = fp(a,a) − 2·fp_dot(a,c) + fp(c,c),
all int64, so argmin (tiebreak: lowest centroid id) is bit-identical
across engines and partitionings.

Scale design: the k centroids ride in the Arrow UDF's closure (broadcast
by serialization); each corpus vector is scored against all k in one
vectorized batch matmul — a single narrow Python stage, no join, no
shuffle until the (tiny) per-cluster rollup a caller may add. At 100 TB
the stage is embarrassingly parallel and the only state per task is the
k×dim centroid matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (worker-side)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from trialstreamer_spark.io import load
from trialstreamer_spark.operators.similarity import SCALE
from trialstreamer_spark.plans.registry import query

K_CLUSTERS = 8

_ASSIGN_TYPE = StructType(
    [StructField("cluster", IntegerType()), StructField("dist_fp", LongType())]
)

_centroid_cache: dict[str, np.ndarray] = {}


def seed_centroids(
    e: DataFrame, k: int = K_CLUSTERS, cache_key: str | None = None
) -> np.ndarray:
    """Deterministic init: the k vectors with the smallest vec_id (the
    k-means++ of a reproducible pipeline is any pure function of the
    corpus version; lowest-id is the simplest). Tiny driver-side read of
    k rows (same precedent as similarity._query_vector), memoized per
    corpus dir."""
    if cache_key is not None and cache_key in _centroid_cache:
        return _centroid_cache[cache_key]
    rows = (
        e.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    c = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    if cache_key is not None:
        _centroid_cache[cache_key] = c
    return c


def assign_udf(centroids: np.ndarray):
    """pandas UDF: nearest centroid per vector, one vectorized pass.
    Self-contained closure (by-value pickling — see
    similarity._build_kernel_udfs)."""
    c = np.asarray(centroids, dtype=np.float64)
    scale = float(SCALE)

    def assign(v: pd.Series) -> pd.DataFrame:
        import numpy as np
        import pandas as pd

        if len(v) == 0:
            return pd.DataFrame(
                {
                    "cluster": pd.Series(dtype="int32"),
                    "dist_fp": pd.Series(dtype="int64"),
                }
            )
        m = np.stack(v.to_numpy()).astype(np.float64)
        # fp(a,a), fp(c,c): elementwise floor-sum per vector
        nsq_a = np.floor(m * m * scale).astype(np.int64).sum(axis=1)
        nsq_c = np.floor(c * c * scale).astype(np.int64).sum(axis=1)
        # fp_dot(a,c) for all pairs: floor per (row, centroid, dim)
        cross = (
            np.floor(m[:, None, :] * c[None, :, :] * scale)
            .astype(np.int64)
            .sum(axis=2)
        )
        d = nsq_a[:, None] - 2 * cross + nsq_c[None, :]
        best = d.argmin(axis=1)  # ties -> lowest centroid index
        return pd.DataFrame(
            {
                "cluster": best.astype("int32"),
                "dist_fp": d[np.arange(len(best)), best],
            }
        )

    return F.pandas_udf(assign, _ASSIGN_TYPE)


_DOT = (
    "list_aggregate(list_transform(list_zip({a}, {b}), "
    "p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 10000000) AS BIGINT)), 'sum')"
)


@query(
    "kmeans_assign",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < {K_CLUSTERS}
    ),
    d AS (
      SELECT e.vec_id, c.cid,
             CAST({_DOT.format(a="e.embedding", b="e.embedding")} AS BIGINT)
             - 2 * CAST({_DOT.format(a="e.embedding", b="c.cemb")} AS BIGINT)
             + CAST({_DOT.format(a="c.cemb", b="c.cemb")} AS BIGINT) AS dist_fp
      FROM embeddings e CROSS JOIN c
    ),
    best AS (
      SELECT vec_id, cid, dist_fp,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist_fp, cid) AS rn
      FROM d
    )
    SELECT vec_id, CAST(cid AS INTEGER) AS cluster, dist_fp
    FROM best WHERE rn = 1
    ORDER BY vec_id
    """,
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means assignment step (k=8, lowest-id seeds): every embedding →
    (cluster, fixed-point squared distance). The oracle replays the same
    fixed-point argmin as a cross join + window; the Spark path is one
    Arrow stage with the centroid matrix in the closure."""
    e = load(spark, sf_dir, "embeddings")
    c = seed_centroids(e, cache_key=sf_dir)
    a = assign_udf(c)
    return (
        e.select("vec_id", a(F.col("embedding")).alias("a"))
        .select(
            "vec_id",
            F.col("a.cluster").alias("cluster"),
            F.col("a.dist_fp").alias("dist_fp"),
        )
        .orderBy("vec_id")
    )
