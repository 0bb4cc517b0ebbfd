"""Training-mix assembly operators: sequence packing and source mixture
weights.

These cover the last pre-training step after curation (quality.py) and
dedup (dedup.py): deciding HOW the surviving documents are laid out into
fixed-length training sequences and in WHAT proportion each source is
sampled. The reference has no analogue (its corpus feeds per-article
model inference, pico_search annotation at PICO_search.py); these are
the corpus-side extensions a 100 TB LLM pipeline needs.

- ``sequence_packing``: GPT-style concat-and-chunk packing (concatenate
  documents in a deterministic order, cut every CTX tokens; documents
  may span chunk boundaries — Brown et al. 2020, §2.2 describe exactly
  this layout). The statistic of interest before launching a packing
  job: chunks produced, boundary-crossing documents, tail waste.
- ``mixture_weights``: temperature-scaled source sampling weights
  (w_s ∝ share_s^alpha with alpha=0.5, the sqrt dampening used for
  multilingual/source rebalancing since GPT-3/XLM-R). Weights are exact
  rationals of integer sqrt values so the oracle hash is bit-stable.

Scale design:

- packing is per-SHARD: documents are hash-bucketed into independent
  shards and the running token offset is a window inside one shard —
  1000 executors pack 1000 shards with no cross-shard coordination, and
  the only wide exchange is the shard-keyed window shuffle. A global
  (single-sequence) concat order would serialize the whole corpus
  through one partition; sharded packing is what distributed loaders
  (e.g. Megatron-style data builders) actually do.
- mixture weights aggregate to one row per source (map-side partial
  aggs), then a scalar window over the tiny per-source frame.

Float determinism: every emitted ratio is a single division of exact
integers (registry conventions; see plans/relational.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trialstreamer_spark.io import load
from trialstreamer_spark.operators.textstats import tokens_col
from trialstreamer_spark.plans.registry import query

#: Tokens per packed training sequence (context length of the toy run).
CTX = 256
#: Independent packing shards; production sizes this to executor count.
N_SHARDS = 8

# Shared DuckDB fragment: per-document token counts with the same
# whitespace tokenizer as textstats.tokens_col.
_DD_DOC_TOKENS = """
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(text, '\\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE text IS NOT NULL
"""


@query(
    "sequence_packing",
    oracle=f"""
    WITH dt AS ({_DD_DOC_TOKENS}),
    nonempty AS (SELECT * FROM dt WHERE n_tokens >= 1),
    placed AS (
      SELECT doc_id % {N_SHARDS} AS shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY doc_id % {N_SHARDS} ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tok_offset
      FROM nonempty
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) + {CTX} - 1) // {CTX} AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN tok_offset // {CTX}
                          <> (tok_offset + n_tokens - 1) // {CTX}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_span_docs,
           CASE WHEN SUM(n_tokens) % {CTX} = 0 THEN 1.0
                ELSE CAST(SUM(n_tokens) % {CTX} AS BIGINT) * 1.0 / {CTX}
           END AS tail_fill
    FROM placed
    GROUP BY shard
    ORDER BY shard
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing statistics per shard: documents are
    hash-bucketed into N_SHARDS independent streams, concatenated in
    doc_id order, and cut every CTX tokens. Emits per shard: documents
    and tokens packed, chunks produced, documents that straddle a chunk
    boundary (whose loss is split across sequences), and the fill ratio
    of the final partial chunk (the per-shard tail waste).

    Plan: token counts are a map stage (one JVM regex split, no
    explode); the running offset is ONE window shuffle keyed by shard;
    the rollup reuses the same shard partitioning (no second
    exchange)."""
    d = load(spark, sf_dir, "documents")
    dt = (
        d.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .where(F.col("n_tokens") >= 1)
        .select((F.col("doc_id") % N_SHARDS).alias("shard"), "doc_id", "n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = dt.select(
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("offset"),
    )
    spans = (
        F.floor(F.col("offset") / CTX)
        != F.floor((F.col("offset") + F.col("n_tokens") - 1) / CTX)
    ).cast("int")
    tail = F.col("total_tokens") % CTX
    return (
        placed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(spans).cast("long").alias("n_span_docs"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            (F.floor((F.col("total_tokens") + CTX - 1) / CTX))
            .cast("long")
            .alias("n_chunks"),
            "n_span_docs",
            F.when(tail == 0, F.lit(1.0))
            .otherwise(tail * F.lit(1.0) / F.lit(CTX))
            .alias("tail_fill"),
        )
        .orderBy("shard")
    )


#: Mixture temperature: weight ∝ token_share^0.5 (sqrt dampening).
#: Realized as integer sqrt so both engines emit identical rationals.


@query(
    "mixture_weights",
    oracle=f"""
    WITH dt AS ({_DD_DOC_TOKENS}),
    per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(FLOOR(SQRT(CAST(SUM(n_tokens) AS DOUBLE))) AS BIGINT) AS w_raw
      FROM dt GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           n_tokens * 1.0 / SUM(n_tokens) OVER () AS token_share,
           w_raw * 1.0 / SUM(w_raw) OVER () AS samp_weight
    FROM per_source
    ORDER BY source
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights for the training mix:
    per source, its raw token share and the alpha=0.5 dampened sampling
    weight w_s = sqrt(tokens_s) / sum_t sqrt(tokens_t) — small sources
    are up-sampled relative to their share, the standard rebalancing for
    multilingual/multi-source corpora.

    Exactness: the dampened weight uses floor(sqrt(n)) — an integer in
    both engines (IEEE sqrt is exactly rounded, so floor agrees
    bit-for-bit) — making every output column an exact integer ratio.

    Plan: one map-side-partial aggregation to ~|sources| rows, then
    scalar window sums over that tiny frame. Nothing wide scales with
    corpus size except the first agg's |sources|-key shuffle."""
    d = load(spark, sf_dir, "documents")
    per_source = (
        d.where(F.col("text").isNotNull())
        .select(
            "source",
            F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.floor(F.sqrt(F.col("n_tokens").cast("double")))
            .cast("long")
            .alias("w_raw"),
        )
    )
    w_all = Window.partitionBy()
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") * F.lit(1.0) / F.sum("n_tokens").over(w_all)).alias(
            "token_share"
        ),
        (F.col("w_raw") * F.lit(1.0) / F.sum("w_raw").over(w_all)).alias(
            "samp_weight"
        ),
    ).orderBy("source")


#: Writer fan-out for the shard-balance audit: the number of output
#: shards a training-data export writes (hash-partitioned on doc_id).
N_OUT_SHARDS = 32


@query(
    "shard_balance_audit",
    oracle=f"""
    WITH s AS (
      SELECT doc_id % {N_OUT_SHARDS} AS shard,
             CAST(length(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x <> '')) AS BIGINT) AS n_toks
      FROM documents
    ),
    per AS (
      SELECT shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      FROM s GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_shards
      FROM per
    )
    SELECT CAST(per.shard AS BIGINT) AS shard,
           per.n_docs,
           per.n_tokens,
           CAST((1000000 * per.n_tokens * tot.n_shards) // tot.total_tokens
                AS BIGINT) AS balance_fp
    FROM per, tot
    ORDER BY shard
    """,
)
def shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard skew audit: token load per writer shard under the
    export's hash partitioning (doc_id mod N), with a fixed-point
    balance factor (10⁶ = perfectly even; a hot shard ≫10⁶ becomes the
    straggler that gates the whole export — and, downstream, the
    training job reading it). The write-side twin of
    kmeans_cluster_balance's read-side probe audit.

    Scale shape: the token count folds into a |shards|-key rollup
    (map-side partials — the shuffle carries N_OUT_SHARDS rows per
    partition, not documents); the balance factor multiplies against a
    1-row broadcast total with exact integer cross-arithmetic. At
    100 TB this audit is one narrow pass over the corpus — the same
    cost as counting tokens at all."""
    d = load(spark, sf_dir, "documents")
    per = (
        d.select(
            F.pmod(F.col("doc_id"), F.lit(N_OUT_SHARDS)).alias("shard"),
            F.size(tokens_col(F.lower(F.col("text")))).cast("long").alias(
                "n_toks"
            ),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    # corpus totals ride a single-partition window over the
    # N_OUT_SHARDS-row rollup instead of a separate agg leg + broadcast
    # build (r11, guide §2.4 — same treatment as shingle_df_histogram)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per.coalesce(1)
        .withColumn("total_tokens", F.sum("n_tokens").over(w_all))
        .withColumn("n_shards", F.count("*").over(w_all))
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            F.expr(
                "(1000000 * n_tokens * n_shards) DIV total_tokens"
            ).alias("balance_fp"),
        )
        # dimension/calendar-bounded tail: single-partition sort,
        # no range exchange / sampling job (r10 registry-wide sweep)
        .coalesce(1)
        .sortWithinPartitions("shard")
    )


#: Candidate context lengths for the padding-waste sweep.
CTX_SWEEP = [128, 256, 512, 1024]


@query(
    "context_length_waste",
    oracle=f"""
    WITH dt AS ({_DD_DOC_TOKENS}),
    l AS (SELECT unnest({CTX_SWEEP}) AS ctx_len),
    per AS (
      SELECT l.ctx_len, dt.n_tokens,
             ((dt.n_tokens + l.ctx_len - 1) // l.ctx_len) * l.ctx_len
               AS padded
      FROM dt, l
    )
    SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(padded) AS BIGINT) AS padded_tokens,
           CAST((1000000 * (SUM(padded) - SUM(n_tokens))) // SUM(padded)
                AS BIGINT) AS waste_fp
    FROM per GROUP BY 1 ORDER BY 1
    """,
)
def context_length_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste sweep over candidate context lengths: under the
    document-preserving layout (each doc padded up to a multiple of the
    context length, never split — the alternative to sequence_packing's
    concat-and-chunk), how many pad tokens does each candidate length
    burn? The pre-launch audit that decides CTX for a packing job: waste
    rises with context length, boundary-crossing loss falls, and this
    query prices one side of that trade exactly.

    Plan: per-doc token counts are one JVM regex-split map stage (no
    explode); the sweep is a 4-way in-row fanout (explode of a literal
    array — narrow, no join); the rollup shuffles only (ctx_len,
    partials), 4 groups total. Padded size is exact integer ceil
    division on both engines — no float rounding anywhere."""
    d = load(spark, sf_dir, "documents")
    per = (
        d.where(F.col("text").isNotNull())
        .select(
            F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
            F.explode(
                F.array(*[F.lit(c).cast("long") for c in CTX_SWEEP])
            ).alias("ctx_len"),
        )
        .select(
            "ctx_len",
            "n_tokens",
            F.expr(
                "((n_tokens + ctx_len - 1) DIV ctx_len) * ctx_len"
            ).alias("padded"),
        )
    )
    return (
        per.groupBy("ctx_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("padded").alias("padded_tokens"),
        )
        .select(
            "ctx_len",
            "n_docs",
            "total_tokens",
            "padded_tokens",
            F.expr(
                "(1000000 * (padded_tokens - total_tokens))"
                " DIV padded_tokens"
            ).alias("waste_fp"),
        )
        # dimension/calendar-bounded tail: single-partition sort,
        # no range exchange / sampling job (r10 registry-wide sweep)
        .coalesce(1)
        .sortWithinPartitions("ctx_len")
    )


@query(
    "token_lorenz_curve",
    oracle=f"""
    WITH dt AS ({_DD_DOC_TOKENS}),
    vc AS (SELECT n_tokens, COUNT(*) AS cnt FROM dt GROUP BY 1),
    off AS (
      SELECT n_tokens,
             COALESCE(SUM(cnt) OVER (ORDER BY n_tokens
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
      FROM vc
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_total,
                   CAST(SUM(n_tokens) AS BIGINT) AS tok_total
            FROM dt),
    rk AS (
      SELECT dt.n_tokens,
             o.below + row_number() OVER (PARTITION BY dt.n_tokens
                                          ORDER BY dt.doc_id) AS rnk
      FROM dt JOIN off o ON dt.n_tokens = o.n_tokens
    ),
    dec AS (
      SELECT CAST(((rk.rnk - 1) * 10) // t.n_docs_total AS INTEGER)
               AS decile,
             rk.n_tokens
      FROM rk, tot t
    ),
    per AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS decile_tokens
      FROM dec GROUP BY 1
    )
    SELECT per.decile, per.n_docs, per.decile_tokens,
           CAST((1000000 * SUM(per.decile_tokens) OVER (ORDER BY per.decile))
                // t.tok_total AS BIGINT) AS cum_share_fp
    FROM per, tot t
    ORDER BY per.decile
    """,
)
def token_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of token mass: documents ranked by token count,
    cut into deciles, cumulative share of all tokens per decile — the
    concentration audit ("the longest 10% of documents carry X% of the
    training tokens") read before choosing length caps or sampling
    temperature for a mix.

    The global rank is never materialized per document (the r11
    optimization): docs in the tie group (n_tokens, cnt) occupy the
    contiguous global ranks below+1 .. below+cnt (ties broken by
    doc_id, but every tie carries the SAME n_tokens, so which doc gets
    which rank cannot change any aggregate), and the per-decile overlap
    of that rank interval has a closed form — so the whole decile split
    runs on the (n_tokens, count) rollup, whose size is |distinct token
    counts| — bounded by the length cap, not the corpus. The old shape
    joined the rollup back to the corpus and ranked every doc through a
    per-n_tokens window (one corpus-wide exchange + sort); the interval
    arithmetic removes that exchange outright (guide §2.4). Decile
    boundaries and the cumulative share are exact integer divisions, so
    both engines cut every boundary identically (NTILE is avoided on
    purpose: its tie placement is engine-defined)."""
    d = load(spark, sf_dir, "documents")
    dt = d.where(F.col("text").isNotNull()).select(
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    vc = dt.groupBy("n_tokens").agg(F.count("*").alias("cnt"))
    w_off = (
        Window.orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Corpus totals ride the SAME single-partition rollup window as the
    # cumulative offset (unbounded frame) — no separate corpus agg, no
    # broadcast-crossJoin attach (each was its own scheduler job).
    w_all = (
        Window.orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    off = vc.select(
        "n_tokens",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("below"),
        F.sum("cnt").over(w_all).alias("n_docs_total"),
        F.sum(F.col("cnt") * F.col("n_tokens")).over(w_all).alias("tok_total"),
    )
    # Group docs hold 0-indexed ranks x in [below, below+cnt-1]; doc at
    # rank x lands in decile (x*10) DIV N. Decile dd covers x in
    # [ceil(dd*N/10), ceil((dd+1)*N/10)-1]; the group's doc count in dd
    # is the interval overlap — exact int64 throughout.
    per = (
        off
        .select(
            "n_tokens",
            "cnt",
            "below",
            "n_docs_total",
            "tok_total",
            F.explode(
                F.sequence(
                    F.expr("(below * 10) DIV n_docs_total"),
                    F.expr("((below + cnt - 1) * 10) DIV n_docs_total"),
                )
            ).alias("decile_l"),
        )
        .select(
            F.col("decile_l").cast("int").alias("decile"),
            F.expr(
                "least(below + cnt - 1,"
                "      ((decile_l + 1) * n_docs_total + 9) DIV 10 - 1)"
                " - greatest(below, (decile_l * n_docs_total + 9) DIV 10)"
                " + 1"
            ).alias("k"),
            "n_tokens",
            "tok_total",
        )
        .groupBy("decile")
        .agg(
            F.sum("k").alias("n_docs"),
            F.sum(F.col("k") * F.col("n_tokens")).alias("decile_tokens"),
            F.max("tok_total").alias("tok_total"),
        )
    )
    return (
        per
        .select(
            "decile",
            "n_docs",
            "decile_tokens",
            F.expr(
                "(1000000 * SUM(decile_tokens) OVER (ORDER BY decile"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
                " DIV tok_total"
            ).alias("cum_share_fp"),
        )
        # dimension-bounded (≤10-row) tail: single-partition sort, no
        # range exchange / sampling job
        .coalesce(1)
        .sortWithinPartitions("decile")
    )


#: training_shard_manifest — deterministic shard fan-out for the final
#: training-data write (tfrecord/webdataset-style shard files).
MANIFEST_SHARDS = 16
SHARD_CHECKSUM_MOD = 9007199254740993  # 2^53 + 1, exact in every engine


@query(
    "training_shard_manifest",
    oracle=f"""
    WITH rows_ AS (
      SELECT doc_id,
             CAST(CAST(from_hex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIT) AS BIGINT) % {MANIFEST_SHARDS} AS shard,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens,
             CAST(CAST(from_hex(substr(md5(concat_ws(chr(31), doc_id, lang,
                                                     text)), 1, 12))
                       AS BIT) AS BIGINT) AS v
      FROM documents
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
           CAST(SUM(v) % {SHARD_CHECKSUM_MOD} AS BIGINT) AS checksum
    FROM rows_
    GROUP BY shard
    ORDER BY shard
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard manifest for the training-data write: every
    document is assigned to one of MANIFEST_SHARDS shard files by a pure
    function of md5(doc_id) — the same coordination-free mechanism as
    stratified_eval_split's hash-range splits, so assignment is stable
    under re-runs, re-partitions and incremental appends, and 1000
    executors can each write their shard subset with no shuffle of
    ownership. Per shard: doc count, token mass (the balance check a
    loader's round-robin assumes), doc_id key range, and the same
    48-bit-prefix content checksum discipline as
    corpus_checksum_by_source — the manifest a training launch records
    to pin EXACTLY which bytes went into which shard file.

    Scale shape: shard id and row hash are scan-side expressions; the
    single exchange is a map-side-combinable aggregate on a key space
    of exactly MANIFEST_SHARDS. The checksum accumulates in DECIMAL(38)
    (an int64 SUM of 48-bit chunks overflows at ~32k rows) and reduces
    mod 2^53+1. The tail is shard-count-bounded → single-partition
    sort, no range exchange."""
    d = load(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % MANIFEST_SHARDS
    )
    rowhash = F.md5(
        F.concat_ws("\x1f", F.col("doc_id"), F.col("lang"), F.col("text"))
    )
    return (
        d.select(
            shard.alias("shard"),
            F.col("doc_id"),
            F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
            F.conv(F.substring(rowhash, 1, 12), 16, 10)
            .cast("decimal(38,0)")
            .alias("v"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.expr(f"CAST(SUM(v) % {SHARD_CHECKSUM_MOD} AS BIGINT)").alias(
                "checksum"
            ),
        )
        # dimension/calendar-bounded tail: single-partition sort,
        # no range exchange / sampling job (r10 registry-wide sweep)
        .coalesce(1)
        .sortWithinPartitions("shard")
    )
