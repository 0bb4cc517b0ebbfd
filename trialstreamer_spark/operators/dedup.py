"""Deduplication operators for large-scale training-data pipelines:
exact (hash groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard.

Scale design (the point of each algorithm at 100 TB):

- **exact**: one shuffle on the content fingerprint. The fingerprint is
  md5 of normalized text, computed scan-side, so the shuffle carries
  (16-byte key, doc_id) — not document bytes.
- **MinHash+LSH**: shingling and signatures are narrow array expressions
  (no explode until the signature is reduced to k integers); only the
  (band_id, band_key) pairs shuffle — k·|docs| tiny rows. Candidate pairs
  come from equi-joining band buckets, never from a crossJoin; the
  verify step re-joins only candidates. This is the standard
  shingle→minhash→band→bucket-join pipeline.
- **SimHash**: one 16-bit signature per doc from token-hash sign sums —
  again array expressions, one narrow pass, then near-dup candidates via
  exact-bucket or bit_count(xor) ≤ r within buckets.
- **n-gram Jaccard**: exact verification used on LSH candidates (or
  standalone at small scale): distinct-shingle postings self-join.

All hashing is md5-hex (identical across engines) so every operator here
is oracle-checkable in DuckDB. Lexicographic MIN over hex strings is the
minhash order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from trialstreamer_spark import util
from trialstreamer_spark.io import load
from trialstreamer_spark.sidecars import catalog_base as _catalog_base
from trialstreamer_spark.operators.textstats import tokens_col
from trialstreamer_spark.plans.registry import query

N_HASHES = 8  # minhash signature length
N_BANDS = 4  # bands of 2 rows each
SHINGLE = 3  # word-shingle width

# (session JVM id, cache_key) → persisted postings DataFrame. The shingle
# featurization is stage 1 of the dedup pipeline and is shared verbatim by
# MinHash signatures, both Jaccard variants, and connected components — a
# production dedup run materializes it ONCE per corpus version and fans
# the candidate/verify stages out from it. prepare_dedup() is that offline
# stage; per-call use without a cache_key recomputes (unit tests assert on
# the raw scan plan).
_POSTINGS_CACHE: dict[tuple[int, str], DataFrame] = {}

# (session JVM id, cache_key, id_col, text_col) → persisted minhash
# signature table (one 8-column row per document). Stage 2 of the dedup
# pipeline: like the postings, a production run computes signatures ONCE
# per corpus version; the per-query LSH path is then band-explode +
# equi-join over k·|docs| tiny rows, with no md5 recompute over the
# (much larger) postings. Built by prepare_dedup().
_SIG_CACHE: dict[tuple[int, str, str, str], DataFrame] = {}

# (session JVM id, catalog, cache_key, id_col, text_col) → persisted
# candidate-pair table (doc_a < doc_b). Stage 2.5 of the dedup
# pipeline: the band self-join + distinct behind EVERY pair consumer
# (LSH dedup, CC labeling, the degree histogram, the source matrix) is
# itself a per-corpus-version artifact — recomputing the join per query
# multiplied its cost by the consumer fan-out. Built by prepare_dedup(),
# disk-backed like the signatures.
_PAIR_CACHE: dict[tuple, DataFrame] = {}

# (session JVM id, catalog, cache_key, id_col, text_col, bits) →
# persisted SimHash signature table (one (doc_id, simhash) row per
# document). Same once-per-corpus-version contract as the minhash
# signatures: both simhash consumers (the signature query itself and
# the hamming cross-validation histogram) re-tokenized the corpus per
# run before r11. Built by prepare_dedup().
_SIMHASH_CACHE: dict[tuple, DataFrame] = {}

util.register_cache_evictor(
    lambda token: [
        util.evict_dict_cache(c, token)
        for c in (
            _POSTINGS_CACHE,
            _SIG_CACHE,
            _BLOOM_CACHE,
            _PAIR_CACHE,
            _SIMHASH_CACHE,
        )
    ]
)


def normalized_fp(text: Column) -> Column:
    """Content fingerprint: lowercase → strip non-alnum → collapse
    whitespace → md5 (same normalization as textstats.doc_fingerprint)."""
    return F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " "), " +", " "
            )
        )
    )


_SHINGLE_RE = {
    3: r"(?:^| )(?=(\S+ \S+ \S+))",
}


def shingles_col(text: Column, k: int = SHINGLE) -> Column:
    """Distinct k-word shingles as one regex pass.

    Overlapping k-grams via a zero-width lookahead capture anchored at
    token starts (the consumed ``^|space`` keeps the scan on token
    boundaries) over whitespace-normalized text. Chosen over the
    equivalent ``transform(sequence(...), i -> concat_ws(slice(...)))``
    formulation: nested higher-order functions evaluate on Spark's
    interpreted expression path (no whole-stage codegen), which measured
    ~1 ms/doc — ~9x slower than this single JVM-regex scan. Fewer-than-k
    tokens fall back to the whole normalized string, matching
    ``concat_ws(' ', tokens)``.
    """
    if k not in _SHINGLE_RE:
        raise ValueError(f"unsupported shingle width {k}")
    norm = F.trim(F.regexp_replace(text, r"\s+", " "))
    grams = F.regexp_extract_all(norm, F.lit(_SHINGLE_RE[k]), 1)
    return F.array_distinct(
        F.when(F.size(grams) > 0, grams).otherwise(F.array(norm))
    )


def shingle_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_key: str | None = None,
) -> DataFrame:
    """Exploded (doc_id, n_sh, shingle) postings, hash-partitioned by
    doc_id BEFORE the shingle computation.

    Two scale properties hang on the repartition placement:

    - **Parallelism guard**: a small/compacted parquet input can scan as
      very few splits; shingling (regex tokenize + slide + concat) is the
      CPU-heavy step, so it must run after the exchange, on the narrow
      (id, text) projection — never single-threaded on the scan side.
    - **Partitioning reuse**: explode is narrow, so the postings inherit
      hashpartitioning(doc_id) and every downstream per-document groupBy
      (signatures, sizes) needs NO further shuffle.

    n_sh rides along from the pre-explode array, so Jaccard needs no
    separate sizes branch (and no re-join with them).

    The partition count is pinned explicitly: with a bare
    ``repartition(col)``, AQE sizes the exchange by BYTES and coalesces a
    small text column back to one partition — serializing the CPU-heavy
    shingling. Pinning to the session's parallelism keeps every core busy
    regardless of input byte size.

    Uses explode_outer, not explode: inner explode implies a
    ``size(shingles) > 0`` predicate that Catalyst pushes below the
    exchange INTO the file scan as a DataFilter — re-evaluating the whole
    shingle expression single-threaded on the scan side, defeating the
    repartition. shingles_col is never empty for non-null text, so outer
    + a cheap pushable text-not-null guard is equivalent.
    """
    key = (
        (
            id(docs.sparkSession._jsparkSession),
            ("catalog", _catalog_base()),
            cache_key,
        )
        if cache_key is not None
        else None
    )
    if key is not None:
        hit = _POSTINGS_CACHE.get(key)
        if hit is not None:
            return hit
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    out = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .where(F.col("text").isNotNull())
        .repartition(n_parts, F.col("doc_id"))
        .select("doc_id", shingles_col(F.col("text")).alias("shingles"))
        .select(
            "doc_id",
            F.size("shingles").alias("n_sh"),
            F.explode_outer("shingles").alias("shingle"),
        )
    )
    if key is not None:
        # The materialized postings carry the shingle's document
        # frequency, like any real postings/feature table: df is a
        # build-time statistic (one extra exchange here, where skew is a
        # batch concern), so the capped-Jaccard hot-shingle prune becomes
        # a NARROW filter at query time instead of a per-query
        # aggregation. The table is DISK-BACKED (sidecars.disk_sidecar):
        # built+written once per corpus version, read straight from
        # parquet by any later session — a restart re-featurizes nothing
        # (round-5 gap #1). The repartition restores doc_id partitioning
        # so downstream per-document windows/groupBys stay exchange-free.
        from trialstreamer_spark.sidecars import disk_sidecar

        def build() -> DataFrame:
            from pyspark.sql import Window as W

            sh_w = W.partitionBy("shingle")
            # df AND the first-occurrence doc ride the same shingle
            # window (one exchange computes both): df powers the
            # hot-shingle prune, first_doc the novelty census — both
            # index-build statistics, free to carry once materialized.
            return out.withColumn("df", F.count("*").over(sh_w)).withColumn(
                "first_doc", F.min("doc_id").over(sh_w)
            )

        out = (
            disk_sidecar(
                docs.sparkSession, cache_key, "shingle_postings", build
            )
            .repartition(n_parts, F.col("doc_id"))
            .persist()
        )
        out.count()
        _POSTINGS_CACHE[key] = out
    return out


def prepare_dedup(spark: SparkSession, sf_dir: str) -> None:
    """Offline stage 1 of the dedup pipeline: materialize the shared
    shingle-postings featurization for a corpus version. MinHash, both
    Jaccard variants, and connected components all consume it; a 100 TB
    run shingles the corpus exactly once (persisted here; a parquet/
    bucketed table on a real cluster) and never re-tokenizes per stage."""
    from trialstreamer_spark.io import load

    shingle_postings(load(spark, sf_dir, "documents"), cache_key=sf_dir)
    minhash_signatures(load(spark, sf_dir, "documents"), cache_key=sf_dir)
    simhash_table(load(spark, sf_dir, "documents"), cache_key=sf_dir)
    # stage 3: the cluster-label mapping (iterative union-find) — the
    # most expensive dedup artifact, shared by the CC view, the size
    # histogram, and canonical application
    cc_labels(spark, sf_dir).count()
    # stage 4: the exact-fingerprint census (dedup_exact + cross-signal
    # joins) and the capped-Jaccard shared-shingle lists (the registered
    # df_cap=5 configuration)
    from trialstreamer_spark.util import materialize_plan

    exact_fp_census(spark, sf_dir)
    materialize_plan(spark, ("exact_fp_census", sf_dir))
    jaccard_pairs(
        load(spark, sf_dir, "documents"),
        threshold=0.2,
        df_cap=5,
        cache_key=sf_dir,
    )
    materialize_plan(spark, ("jaccard_doc_lists", sf_dir, 5))
    # stage 5: the media perceptual-hash band index (multimodal dedup)
    from trialstreamer_spark.operators.multimodal import multimodal_phash_dedup

    multimodal_phash_dedup(spark, sf_dir)
    materialize_plan(spark, ("media_phash_bands", sf_dir))


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_key: str | None = None,
) -> DataFrame:
    """MinHash signatures as one codegen-friendly pass.

    Shape chosen for scale: explode (doc, shingle) ONCE, compute exactly
    two md5s per shingle, and slice each 128-bit digest into four 8-hex
    (32-bit) chunks → 8 independent hash functions. The signature is then
    8 MIN aggregates — partial-aggregated map-side, so the shuffle carries
    one 8-column row per document regardless of document length. This
    replaces a nested-lambda formulation (8 × array_min(transform(...)))
    that re-built the shingle array per hash and fell off whole-stage
    codegen (~100× slower at sf0.1).
    """
    key = (
        (
            id(docs.sparkSession._jsparkSession),
            ("catalog", _catalog_base()),
            cache_key,
            id_col,
            text_col,
        )
        if cache_key is not None
        else None
    )
    if key is not None:
        hit = _SIG_CACHE.get(key)
        if hit is not None:
            return hit
    def build() -> DataFrame:
        sh = shingle_postings(
            docs, id_col, text_col, cache_key=cache_key
        ).select(
            "doc_id",
            F.md5(F.col("shingle")).alias("m1"),
            F.md5(F.concat(F.lit("x"), F.col("shingle"))).alias("m2"),
        )
        mins = [
            F.min(F.substring(F.col(m), 8 * r + 1, 8)).alias(f"h{4 * mi + r}")
            for mi, m in enumerate(("m1", "m2"))
            for r in range(4)
        ]
        return sh.groupBy("doc_id").agg(*mins)

    if key is None:
        return build()
    # disk-backed (one row per doc): a restarted session reads the
    # committed signatures without touching the shingle postings at all
    from trialstreamer_spark.sidecars import disk_sidecar

    out = disk_sidecar(
        docs.sparkSession,
        cache_key,
        f"minhash_sigs_{id_col}_{text_col}",
        build,
    ).persist()
    out.count()
    _SIG_CACHE[key] = out
    return out


def banded_keys(sig: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band_id, band_key) rows: md5 over each band's signature
    chunks (bands of N_HASHES/n_bands rows)."""
    rows_per_band = N_HASHES // n_bands
    keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(
        "doc_id", F.posexplode(keys).alias("band_id", "band_key")
    )


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_key: str | None = None,
) -> DataFrame:
    """shingle → minhash → band → bucket-join candidate pairs.

    Returns distinct (doc_a, doc_b) with doc_a < doc_b. The join is an
    equi-join on (band_id, band_key): Catalyst shuffles both sides on the
    key, skew from degenerate buckets (e.g. empty docs) is handled by AQE
    skew-join; at 100 TB, band keys are near-uniform md5s so buckets are
    balanced by construction.

    With ``cache_key``, the pair set is itself a per-corpus-version
    artifact: every consumer (LSH dedup, CC labeling, the degree
    histogram, the near-dup source matrix) reads ONE disk-backed,
    session-persisted table instead of re-running the self-join —
    the same once-per-version discipline as the signatures above."""

    def build() -> DataFrame:
        banded = banded_keys(
            minhash_signatures(docs, id_col, text_col, cache_key=cache_key)
        )
        a = banded.alias("a")
        b = banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )

    if cache_key is None:
        return build()
    key = (
        id(docs.sparkSession._jsparkSession),
        ("catalog", _catalog_base()),
        cache_key,
        id_col,
        text_col,
    )
    hit = _PAIR_CACHE.get(key)
    if hit is not None:
        return hit
    from trialstreamer_spark.sidecars import disk_sidecar

    out = disk_sidecar(
        docs.sparkSession,
        cache_key,
        f"minhash_pairs_{id_col}_{text_col}",
        build,
    ).persist()
    out.count()
    _PAIR_CACHE[key] = out
    return out


def _pairs_from_lists(lists: DataFrame) -> DataFrame:
    """Double-explode a (shingle, ds:[(doc_id, n_sh)]) lists table into
    per-shared-shingle doc pairs (a < b) — the capped pair generator
    shared by the Jaccard and containment variants. Safe because df_cap
    bounds every list, so the Generate fan-out is ≤ C(df_cap, 2)."""
    return (
        lists.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
    df_cap: int | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over a shingle-postings self-join.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) — a single division of exact
    integers, so the value is bit-identical across engines. The postings
    join only pairs documents that share ≥1 shingle.

    ``df_cap`` is the 100 TB safety valve: a shingle occurring in d
    documents emits C(d,2) join rows, so one boilerplate phrase shared
    by 10⁶ documents would alone produce ~5·10¹¹ pairs. With a cap,
    shingles with document frequency > df_cap are dropped BEFORE the
    self-join (standard postings pruning), bounding per-shingle fan-out
    at C(df_cap,2); Jaccard is then computed over the PRUNED shingle
    sets (sizes recomputed after the filter), i.e. it remains a true
    Jaccard of the surviving feature space. df_cap=None keeps the exact
    semantics (used by the uncapped oracle query).

    Each posting carries its document's shingle count (n_sh), so set
    sizes ride through the join as grouping keys — no separate sizes
    aggregation, no re-join.

    Physical strategy differs by variant, deliberately:

    - **uncapped (exact baseline)**: postings SELF-JOIN on shingle. The
      join shuffles the postings twice, but a skewed (hot) shingle is
      split across reducers by AQE skew-join — the only formulation
      that stays memory-safe without a frequency bound.
    - **capped**: per-shingle PAIR GENERATION — group the pruned
      postings by shingle (ONE postings shuffle, not two), collect the
      ≤ df_cap postings per shingle, and emit pairs with a double
      explode (codegen Generate, no Python). collect_list is safe here
      precisely because the cap bounds every list; this halves the
      dominant shuffle in the configuration a 100 TB dedup run uses."""
    from pyspark.sql import Window as W

    sh = shingle_postings(docs, id_col, text_col, cache_key=cache_key)
    if df_cap is not None:
        lists = capped_doc_lists(docs, id_col, text_col, df_cap, cache_key)
        paired = _pairs_from_lists(lists)
    else:
        a, b = sh.alias("a"), sh.alias("b")
        paired = a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
    out = (
        paired.groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_common"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def capped_doc_lists(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int = 5,
    cache_key: str | None = None,
) -> DataFrame:
    """The df-capped shared-shingle lists sidecar: (shingle,
    ds:[(doc_id, post-prune n_sh)]) for shingles with 2..df_cap
    postings — the bounded feature space every capped similarity
    variant (Jaccard, containment) pairs over. Disk-backed per
    (corpus, df_cap)."""
    from pyspark.sql import Window as W

    sh = shingle_postings(docs, id_col, text_col, cache_key=cache_key)
    if "df" in sh.columns:
        # Materialized postings carry df (index-build statistic):
        # the hot-shingle prune is a narrow filter — no per-query
        # aggregation at all. This is the 100 TB configuration.
        kept = sh.filter(F.col("df") <= df_cap)
    else:
        # Ad-hoc path (no materialized postings): prune WITHOUT
        # shuffling the postings by shingle — the set of shingles
        # with df > cap is small by construction (≤ |postings| /
        # cap), so aggregate just that set (map-side partial agg;
        # only (shingle, count) partials shuffle) and
        # broadcast-anti-join it away. An ultra-hot shingle never
        # routes every posting to one reducer, which is exactly the
        # skew the cap exists to prevent.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
            .select("shingle")
        )
        kept = sh.join(F.broadcast(hot), "shingle", "left_anti")
    # Post-prune set sizes via a window over doc_id, which reuses
    # the partitioning shingle_postings established (sort within
    # partitions, no new exchange).
    sh = kept.withColumn(
        "n_sh", F.count("*").over(W.partitionBy("doc_id"))
    ).select("doc_id", "n_sh", "shingle")

    def build_lists() -> DataFrame:
        # SHARED shingles only (singletons generate no pairs), with
        # the post-prune set size stamped in the structs — the same
        # lists-sidecar shape as winnow_fp_lists
        return (
            sh.groupBy("shingle")
            .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("ds"))
            .where(F.size("ds") > 1)
        )

    if cache_key is not None:
        from trialstreamer_spark.sidecars import disk_cached_plan

        return disk_cached_plan(
            docs.sparkSession,
            cache_key,
            "jaccard_doc_lists",
            build_lists,
            key_extra=(df_cap,),
        )
    return build_lists()


def simhash_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    cache_key: str | None = None,
) -> DataFrame:
    """Per-document SimHash via explode + ONE grouped aggregation.

    Each token contributes ±1 to every bit depending on the matching hex
    digit of its md5; the per-bit sums are `bits` conditional SUM
    aggregates over the exploded (doc_id, md5(token)) postings — all
    whole-stage-codegen, with map-side partial aggregation so the shuffle
    carries one `bits`-column row per document regardless of length.
    Replaces the per-row array-fold formulation (simhash_col): 16 nested
    aggregate() lambdas evaluate on the interpreted expression path and
    measured ~2.5× slower at sf0.1.

    explode_outer keeps zero-token documents (null token → contribution
    0 → all bit-sums 0 → simhash 0, matching aggregate-over-empty-list
    semantics in the SQL oracle).

    With ``cache_key``, the table is a per-corpus-version sidecar like
    the minhash signatures (disk-backed, session-persisted, built by
    prepare_dedup — r11): before that, both simhash consumers paid the
    corpus tokenize + 16-sum aggregate on every run."""
    key = (
        (
            id(docs.sparkSession._jsparkSession),
            ("catalog", _catalog_base()),
            cache_key,
            id_col,
            text_col,
            bits,
        )
        if cache_key is not None
        else None
    )
    if key is not None:
        hit = _SIMHASH_CACHE.get(key)
        if hit is not None:
            return hit

    def build() -> DataFrame:
        from trialstreamer_spark.operators.textstats import (
            tokens_col as _tokens,
        )

        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(_tokens(F.col(text_col))).alias("tok"),
        ).select("doc_id", F.md5("tok").alias("m"))
        aggs = [
            F.sum(
                F.when(F.col("m").isNull(), 0)
                .when(F.substring(F.col("m"), i + 1, 1).isin(*"89abcdef"), 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
        g = toks.groupBy("doc_id").agg(*aggs)
        sim = None
        for i in range(bits):
            term = F.when(F.col(f"b{i}") > 0, F.lit(2**i)).otherwise(
                F.lit(0)
            )
            sim = term if sim is None else sim + term
        return g.select("doc_id", sim.cast("long").alias("simhash"))

    if key is None:
        return build()
    from trialstreamer_spark.sidecars import disk_sidecar

    out = disk_sidecar(
        docs.sparkSession,
        cache_key,
        f"simhash_{id_col}_{text_col}_{bits}",
        build,
    ).persist()
    out.count()
    _SIMHASH_CACHE[key] = out
    return out


def simhash_col(text: Column, bits: int = 16) -> Column:
    """SimHash signature: for bit i, sum over tokens of ±1 by the i-th hex
    digit of md5(token); bit set iff the sum is positive. Array fold —
    narrow, scan-side, but INTERPRETED (nested higher-order functions):
    use simhash_table for bulk signatures; this column form remains for
    single-row probes."""
    toks = tokens_col(text)

    def bit_contrib(i: int):
        # single-arg lambda (see minhash_signature note on index shadowing)
        return F.transform(
            toks,
            lambda t: F.when(
                F.substring(F.md5(t), i + 1, 1).isin(*"89abcdef"), 1
            ).otherwise(-1),
        )

    bit_cols = []
    for i in range(bits):
        total = F.aggregate(bit_contrib(i), F.lit(0), lambda a, x: a + x)
        bit_cols.append(F.when(total > 0, F.lit(2**i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for c in bit_cols:
        out = out + c
    return out.cast("long")


# ---------------------------------------------------------------------------
# queries()/oracle_sql() registrations
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                     ' +', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    SELECT doc_id, fingerprint,
           COUNT(*) OVER (PARTITION BY fingerprint)   AS n_copies,
           MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id
    FROM fp
    ORDER BY doc_id
    """,
)
def exact_fp_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fingerprint, n_copies, canonical_id) — the exact-dup
    census, one row per document. A per-corpus statistic (one window
    over the fingerprint; the shuffle carries (16B, id) pairs only), so
    a sidecar: the exact-dup view, the canonical apply, and every
    cross-signal join (dup_rate_by_quality) read it instead of
    re-hashing the corpus."""
    from pyspark.sql import Window as W

    from trialstreamer_spark.util import cached_plan

    def build() -> DataFrame:
        d = load(spark, sf_dir, "documents")
        w = W.partitionBy("fingerprint")
        return (
            d.select(
                "doc_id", normalized_fp(F.col("text")).alias("fingerprint")
            )
            .withColumn("n_copies", F.count("*").over(w))
            .withColumn("canonical_id", F.min("doc_id").over(w))
        )

    from trialstreamer_spark.sidecars import disk_cached_plan

    return disk_cached_plan(spark, sf_dir, "exact_fp_census", build)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-of-normalized-text fingerprint, duplicate count
    and canonical (min doc_id) per group, read from the exact_fp_census
    sidecar."""
    return exact_fp_census(spark, sf_dir).orderBy("doc_id")


_DD_SHINGLES = """
    SELECT doc_id,
           list_distinct(
             CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                  ELSE [array_to_string(toks, ' ')] END) AS shingles
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
          FROM documents)
"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (k=8 hashes, 4 bands × 2 rows).
    See minhash_candidates for the scale argument."""
    d = load(spark, sf_dir, "documents")
    return minhash_candidates(d, cache_key=sf_dir).orderBy("doc_a", "doc_b")


@query(
    "minhash_band_tuning",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM posting GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM posting a JOIN posting b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.2
    ),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    hit AS (SELECT c.doc_a, c.doc_b FROM cand c JOIN truth t
              ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
    SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT)  AS n_candidates,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT COUNT(*) FROM hit) AS BIGINT)   AS n_hit,
           CASE WHEN (SELECT COUNT(*) FROM cand) > 0
                THEN CAST((SELECT COUNT(*) FROM hit) AS BIGINT) * 1.0
                     / (SELECT COUNT(*) FROM cand)
                ELSE 0.0 END AS precision,
           CASE WHEN (SELECT COUNT(*) FROM truth) > 0
                THEN CAST((SELECT COUNT(*) FROM hit) AS BIGINT) * 1.0
                     / (SELECT COUNT(*) FROM truth)
                ELSE 0.0 END AS recall
    """,
)
def minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation for the MinHash LSH configuration: the
    candidate set's precision/recall against exact Jaccard >= 0.2 ground
    truth — the measurement that tunes (n_hashes, bands, rows) before a
    corpus-wide dedup run, the dedup-side twin of ann_recall_at_k. On a
    100 TB corpus this runs on a sample partition; the counts are exact
    integer aggregates of the two (already scale-safe) pair pipelines,
    and the final row is three counts + two divisions."""
    d = load(spark, sf_dir, "documents")
    cand = minhash_candidates(d, cache_key=sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_cand"), F.lit(0).alias("in_true")
    )
    truth = jaccard_pairs(d, threshold=0.2, cache_key=sf_dir).select(
        "doc_a", "doc_b", F.lit(0).alias("in_cand"), F.lit(1).alias("in_true")
    )
    # ONE aggregation computes all three counts: a tagged UNION of the
    # two pair sets rolled up per pair (r11, guide §2.4 — the old
    # full-outer join paid one exchange + sort per side; both sets are
    # distinct-by-construction, so max() per pair is exact membership),
    # then a single-row total. The (expensive) exact-Jaccard arm still
    # appears exactly once in the plan, and the whole query stays LAZY
    # (plan-hygiene sweeps and analysis tripwires see the real
    # pipeline, and nothing executes at construction time). Zero-count
    # divisions are guarded (empty corpus → 0.0, not a divide-by-zero
    # error under ANSI mode).
    counts = (
        cand.unionByName(truth)
        .groupBy("doc_a", "doc_b")
        .agg(F.max("in_cand").alias("c"), F.max("in_true").alias("t"))
        .agg(
            # coalesce: SUM over zero rows is NULL where the old
            # COUNT(in_cand) was 0 — keep the empty-corpus value
            F.coalesce(F.sum("c"), F.lit(0).cast("long")).alias(
                "n_candidates"
            ),
            F.coalesce(F.sum("t"), F.lit(0).cast("long")).alias("n_true"),
            F.count(
                F.when((F.col("c") == 1) & (F.col("t") == 1), 1)
            ).alias("n_hit"),
        )
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.col(num) * F.lit(1.0) / F.col(den)
    ).otherwise(F.lit(0.0))
    return counts.select(
        "n_candidates",
        "n_true",
        "n_hit",
        ratio("n_hit", "n_candidates").alias("precision"),
        ratio("n_hit", "n_true").alias("recall"),
    )


@query(
    "decontaminate_overlap",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh),
    evalp AS (SELECT doc_id AS eval_id, shingle FROM posting WHERE doc_id < 5),
    trainp AS (SELECT doc_id AS train_id, shingle FROM posting WHERE doc_id >= 5)
    SELECT t.train_id, e.eval_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM trainp t JOIN evalp e ON t.shingle = e.shingle
    GROUP BY t.train_id, e.eval_id
    HAVING COUNT(*) >= 2
    ORDER BY train_id, eval_id
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: find training documents sharing ≥ 2
    distinct word-shingles with any document of a held-out eval set
    (doc_id < 5 stands in for the benchmark) — the n-gram overlap check
    run before every training job so eval material is excluded from the
    corpus (the GPT-3/PaLM appendix procedure, at this fixture's 3-gram
    width).

    100 TB shape: the eval set is tiny by construction, so its postings
    BROADCAST and the corpus postings stream map-side — same
    corpus-never-shuffles discipline as dedup_incremental; the rollup
    then counts (train_doc, eval_doc) pairs bounded by |eval shingles| x
    fan-out, not corpus size. Postings come from the shared
    prepare_dedup featurization (shingled once per corpus version)."""
    d = load(spark, sf_dir, "documents")
    # postings are already distinct per doc (shingles_col array_distincts
    # before the explode) — no dedup shuffle needed here
    p = shingle_postings(d, cache_key=sf_dir).select("doc_id", "shingle")
    evalp = p.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    trainp = p.where(F.col("doc_id") >= 5).select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    return (
        trainp.join(F.broadcast(evalp), "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .orderBy("train_id", "eval_id")
    )


@query(
    "dedup_incremental",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                     ' +', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    newb AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id % 10 = 0),
    corp AS (
      SELECT fingerprint, MIN(doc_id) AS dup_of
      FROM fp WHERE doc_id % 10 <> 0 GROUP BY fingerprint
    ),
    sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    near AS (
      SELECT a.doc_id, CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_near_dups
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
      WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
      GROUP BY a.doc_id
    )
    SELECT n.doc_id,
           COALESCE(c.dup_of, -1) AS exact_dup_of,
           COALESCE(near.n_near_dups, 0) AS n_near_dups
    FROM newb n
    LEFT JOIN corp c ON c.fingerprint = n.fingerprint
    LEFT JOIN near ON near.doc_id = n.doc_id
    ORDER BY n.doc_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (daily-batch) dedup: check a small NEW batch against
    the standing corpus for exact and near duplicates — the production
    shape of the reference's CDC update cycle (SURVEY §2.9: new files
    arrive daily and must not re-insert what the warehouse already has),
    applied to content instead of keys.

    The deterministic split (doc_id % 10 == 0 → "today's batch") stands
    in for the streaming source; semantics are what matter: per new doc,
    the canonical corpus doc with an identical fingerprint (or -1) and
    how many corpus docs share an LSH band (near-dup candidates).

    100 TB shape — the corpus is NEVER shuffled: both probes broadcast
    the (tiny) new batch against map-side streams of the corpus
    fingerprint/signature sidecars, then the per-new-doc rollups operate
    on at most |new| x small-fanout rows. A daily batch against a
    petabyte corpus costs one corpus scan, no corpus-wide exchange."""
    d = load(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 0
    fp = d.select("doc_id", normalized_fp(F.col("text")).alias("fingerprint"))
    new_fp = fp.where(is_new)
    corp_fp = fp.where(~is_new)
    # corpus streams map-side against the broadcast batch; the aggregate
    # then runs on |matches| ≤ |new batch| x copies rows
    exact = (
        corp_fp.join(
            F.broadcast(new_fp.select(F.col("doc_id").alias("new_id"), "fingerprint")),
            "fingerprint",
        )
        .groupBy("new_id")
        .agg(F.min("doc_id").alias("exact_dup_of"))
    )
    banded = banded_keys(minhash_signatures(d, cache_key=sf_dir))
    near = (
        banded.where(~is_new)
        .join(
            F.broadcast(
                banded.where(is_new).select(
                    F.col("doc_id").alias("new_id"), "band_id", "band_key"
                )
            ),
            ["band_id", "band_key"],
        )
        .groupBy("new_id")
        .agg(F.count_distinct("doc_id").alias("n_near_dups"))
    )
    return (
        new_fp.select(F.col("doc_id"))
        .join(F.broadcast(exact), new_fp.doc_id == exact.new_id, "left")
        .drop("new_id")
        .join(F.broadcast(near), new_fp.doc_id == near.new_id, "left")
        .drop("new_id")
        .select(
            "doc_id",
            F.coalesce(F.col("exact_dup_of"), F.lit(-1)).alias("exact_dup_of"),
            F.coalesce(F.col("n_near_dups"), F.lit(0)).alias("n_near_dups"),
        )
        .orderBy("doc_id")
    )


@query(
    "minhash_jaccard_estimate",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           (CAST(sa.h0 = sb.h0 AS INT) + CAST(sa.h1 = sb.h1 AS INT) +
            CAST(sa.h2 = sb.h2 AS INT) + CAST(sa.h3 = sb.h3 AS INT) +
            CAST(sa.h4 = sb.h4 AS INT) + CAST(sa.h5 = sb.h5 AS INT) +
            CAST(sa.h6 = sb.h6 AS INT) + CAST(sa.h7 = sb.h7 AS INT)) / 8.0
             AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    ORDER BY doc_a, doc_b
    """,
)
def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based similarity ESTIMATION: for each LSH candidate pair,
    estimate Jaccard as the fraction of agreeing minhash components —
    the classic unbiased estimator. No postings self-join: the whole
    query reads the precomputed signature sidecar (one 8-column row per
    doc) three ways, so at 100 TB the cost is |candidates| tiny join
    rows, independent of document length. (1/8-granular doubles are
    exact binary fractions, so no rounding is needed for oracle parity.)
    """
    d = load(spark, sf_dir, "documents")
    sig = minhash_signatures(d, cache_key=sf_dir)
    cand = minhash_candidates(d, cache_key=sf_dir)
    sa, sb = sig.alias("sa"), sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    return (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (matches / F.lit(float(N_HASHES))).alias("est_jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM posting GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM posting a JOIN posting b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.2
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs at threshold 0.2 via shingle-postings
    self-join (the verify stage of the MinHash pipeline)."""
    d = load(spark, sf_dir, "documents")
    return jaccard_pairs(d, threshold=0.2, cache_key=sf_dir).orderBy(
        "doc_a", "doc_b"
    )


@query(
    "dedup_jaccard_capped",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    kept AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM posting)
      WHERE df <= 5
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM kept a JOIN kept b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.2
    ORDER BY doc_a, doc_b
    """,
)
def dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency-capped Jaccard (df_cap=5): the scale-safe
    variant — hot shingles are pruned before the self-join, bounding
    per-shingle pair fan-out at C(5,2) no matter how common a
    boilerplate phrase is. This is the configuration a 100 TB dedup run
    uses; the uncapped dedup_ngram_jaccard is the exact baseline."""
    d = load(spark, sf_dir, "documents")
    return jaccard_pairs(d, threshold=0.2, df_cap=5, cache_key=sf_dir).orderBy(
        "doc_a", "doc_b"
    )


@query(
    "dedup_simhash",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST((
    """
    + "\n+".join(
        f"""CASE WHEN list_aggregate(list_transform(toks,
                   x -> CASE WHEN substr(md5(x), {i + 1}, 1) IN
                        ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END),
                 'sum') > 0 THEN {2**i} ELSE 0 END"""
        for i in range(16)
    )
    + """
           ) AS BIGINT) AS simhash
    FROM t
    ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 16-bit SimHash signatures (near-dup = small hamming
    distance between signatures; the signature pass is the linear-cost
    piece that must scale). One explode + one grouped aggregation, fully
    codegen (see simhash_table); served from the per-corpus-version
    signature sidecar like the minhash twin (r11 — prepare_dedup builds
    it once, both simhash consumers read it)."""
    d = load(spark, sf_dir, "documents")
    return simhash_table(d, cache_key=sf_dir).orderBy("doc_id")


def _local_union_find_labels(edges: DataFrame) -> DataFrame:
    """Partition-local contraction pass: run union-find over each
    partition's edges and emit (doc_id, root) with root = min node id of
    the PARTITION-LOCAL component.

    Edges are repartitioned by src with AQE left free to size the
    exchange by bytes: a small edge set collapses to one partition (the
    whole graph solved in one union-find), a 100 TB edge set spreads at
    ~64 MB per task — each task's memory is bounded by its partition, and
    whatever union-find cannot see locally is merged by the (cheap)
    propagation rounds that follow. This is the standard contraction
    prelude to distributed CC: it removes the graph's diameter from the
    round count for everything that co-locates.

    The UDF is self-contained (by-value pickling — see
    operators/similarity._build_kernel_udfs for why)."""
    import pandas as pd  # noqa: F401  (worker-side import)

    def uf_partition(batches):
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        def union(a, b):
            for v in (a, b):
                if v not in parent:
                    parent[v] = v
            ra, rb = find(a), find(b)
            if ra != rb:
                # min-root union keeps the smallest id as representative
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

        import pandas as pd

        for pdf in batches:
            for a, b in zip(pdf["src"], pdf["dst"]):
                union(int(a), int(b))
        if parent:
            nodes = list(parent)
            yield pd.DataFrame(
                {"doc_id": nodes, "root": [find(n) for n in nodes]}
            )

    return edges.repartition(F.col("src")).mapInPandas(
        uf_partition, "doc_id long, root long"
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Connected components — the step that turns near-dup candidate
    PAIRS into dedup CLUSTERS (pairs only say "a~b"; the cluster is the
    transitive closure, and its min doc_id is the canonical document).

    ``nodes`` has column doc_id; ``edges`` has (doc_a, doc_b). Returns
    (doc_id, component) where component = min doc_id reachable.

    Two phases (the contraction + propagation hybrid GraphFrames/GraphX
    converge on for big graphs):

    1. **Local contraction** (_local_union_find_labels): one distributed
       pass of per-partition union-find seeds every node with the min id
       of its partition-local component. Everything that co-locates is
       merged in a single job — for most real near-dup graphs this IS the
       answer and the loop below only confirms it.
    2. **Min-label propagation** to the fixpoint: each round joins labels
       onto the symmetrized edge list, takes the min incoming label per
       node, keeps the smaller of (own, incoming). Rounds needed = the
       diameter of the CONTRACTED graph (cross-partition chains only).
       Every labelling in play consists of real node ids of the same
       component, so the fixpoint is exactly min-reachable-id — the
       result is deterministic on any cluster layout.

    Each round ends in ``localCheckpoint(eager)`` + count: the action is
    the convergence test, the checkpoint truncates the logical plan so
    per-round planning cost stays flat (plain persist leaves the plan
    growing linearly, which measured ~+0.5 s/round of pure driver-side
    analysis). On a multi-node cluster you would use reliable
    ``checkpoint()`` instead to keep fault tolerance.

    ``max_iter`` turns a pathological chain into an error, not an
    infinite loop.
    """
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    sym = sym.localCheckpoint(eager=True)
    seed = _local_union_find_labels(sym).groupBy("doc_id").agg(
        F.min("root").alias("root")
    )
    labels = (
        nodes.select("doc_id")
        .join(seed, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("root"), F.col("doc_id")).alias("component")
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        incoming = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(incoming, labels.doc_id == incoming.dst, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.select("doc_id", "component")
        if n_changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


_MINHASH_PAIRS_SQL = """
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
"""


def cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component) near-dup cluster labels — the canonical
    mapping of the whole dedup pipeline, and therefore a per-corpus
    sidecar (prepare_dedup materializes it): the iterative union-find
    runs ONCE per corpus version; every consumer (per-doc view, size
    histogram, canonical apply) reads the labels. Disk-backed
    (sidecars.disk_sidecar): the most expensive dedup artifact survives
    a session restart as committed parquet. (r11 measured-and-rejected:
    pinning HashPartitioning(doc_id) on the session copy — the
    chunk_hashes treatment — buys nothing here, because every bench-
    scale consumer join broadcasts the labels and the window exchanges
    key on component, not doc_id; the post-repartition only added a
    prep-time exchange.)"""
    from trialstreamer_spark.sidecars import disk_sidecar
    from trialstreamer_spark.util import cached_plan

    def build() -> DataFrame:
        d = load(spark, sf_dir, "documents")
        return connected_components(
            d.select("doc_id"), minhash_candidates(d, cache_key=sf_dir)
        )

    return cached_plan(
        spark,
        ("cc_labels", sf_dir),
        lambda: disk_sidecar(spark, sf_dir, "cc_labels", build),
    )


@query(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    pairs AS ({_MINHASH_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, MIN(label) AS component,
           COUNT(*) OVER (PARTITION BY MIN(label)) AS cluster_size
    FROM reach
    GROUP BY node
    ORDER BY doc_id
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering: MinHash+LSH candidate pairs →
    connected components → (doc_id, component, cluster_size). The oracle
    states the same fixpoint via a recursive CTE (min reachable label).
    """
    from pyspark.sql import Window as W

    return (
        cc_labels(spark, sf_dir)
        .withColumn(
            "cluster_size", F.count("*").over(W.partitionBy("component"))
        )
        .orderBy("doc_id")
    )


_PR_SIG_CTES = f"""
    sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    pairs AS ({_MINHASH_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src)
"""

_PR_STEP = """
    {nxt} AS (
      SELECT d.doc_id,
             CAST(150000 + (850000 * COALESCE(i.s, 0)) // 1000000 AS BIGINT) AS r
      FROM {prev} d LEFT JOIN (
        SELECT e.dst AS doc_id, CAST(SUM({prev}.r // deg.deg) AS BIGINT) AS s
        FROM edges e
        JOIN {prev} ON {prev}.doc_id = e.src
        JOIN deg ON deg.src = e.src
        GROUP BY e.dst
      ) i ON i.doc_id = d.doc_id
    )
"""


@query(
    "pagerank_dup_graph",
    oracle=f"""
    WITH {_PR_SIG_CTES},
    r0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS r FROM documents),
    {_PR_STEP.format(nxt="r1", prev="r0")},
    {_PR_STEP.format(nxt="r2", prev="r1")},
    {_PR_STEP.format(nxt="r3", prev="r2")}
    SELECT doc_id, r AS rank_fp FROM r3 ORDER BY doc_id
    """,
)
def pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 iterations, damping 0.85) over the
    near-dup candidate graph — ranks documents by duplication
    centrality, the signal a curation pipeline uses to pick which
    boilerplate hubs to inspect first. All arithmetic is int64
    fixed-point (rank x 1e6; contributions via integer division), so
    the iteration is bit-identical across engines and partition orders
    — float PageRank sums would drift. The oracle unrolls the same
    three steps as chained CTEs.

    Scale shape per iteration: one join of the edge list with the rank
    and degree tables (all keyed on the src doc — Catalyst reuses the
    hashpartitioning across iterations), one aggregation to the
    incoming-sum, one left join back to the node set. State between
    iterations is one (doc_id, int64) row per node. Bounded iteration
    count (the CC operator handles full closure; PageRank here is a
    fixed-sweep scoring pass)."""
    d = load(spark, sf_dir, "documents")
    pairs = minhash_candidates(d, cache_key=sf_dir)
    sym = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = d.select("doc_id")
    r = nodes.select("doc_id", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(3):
        inc = (
            sym.join(deg, "src")
            .join(r.select(F.col("doc_id").alias("src"), "r"), "src")
            .select("dst", F.expr("r div deg").alias("push"))
            .groupBy("dst")
            .agg(F.sum("push").alias("s"))
        )
        r = (
            nodes.join(inc, nodes.doc_id == inc.dst, "left")
            .select(
                "doc_id",
                (
                    F.lit(150_000).cast("long")
                    + F.expr("(850000 * coalesce(s, 0)) div 1000000")
                ).alias("r"),
            )
        )
    return r.select("doc_id", F.col("r").alias("rank_fp")).orderBy("doc_id")


@query(
    "dedup_apply_canonical",
    oracle="""
    WITH fp AS (
      SELECT doc_id, lang, source,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                     ' +', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    SELECT doc_id, lang, source FROM fp
    WHERE doc_id = (SELECT MIN(f2.doc_id) FROM fp f2
                    WHERE f2.fingerprint = fp.fingerprint)
    ORDER BY doc_id
    """,
)
def dedup_apply_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of exact dedup: keep only each fingerprint group's
    canonical (min doc_id) row — the corpus after deduplication. One
    window over the fingerprint; at scale this replaces the correlated
    subquery the SQL oracle spells, with identical semantics."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("fingerprint")
    return (
        d.select(
            "doc_id", "lang", "source",
            normalized_fp(F.col("text")).alias("fingerprint"),
        )
        .withColumn("canonical", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("canonical"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------

#: Bloom geometry: BLOOM_M bits, BLOOM_K md5-derived hash positions per
#: item. Sized SMALL against the fixture's ~50-doc eval set so the
#: false-positive path is actually exercised (load ≈ 0.44 ⇒ fp ≈ 8%);
#: production sizes m for the target fp rate (~10 bits/item for 1%).
BLOOM_M = 256
BLOOM_K = 3
#: Eval-set cut for the decontamination fixtures (doc_id < BLOOM_EVAL_CUT
#: stands in for the held-out benchmark, as in decontaminate_overlap).
BLOOM_EVAL_CUT = 50

# sf_dir → sorted list of set bit positions (the serialized filter).
_BLOOM_CACHE: dict[str, list[int]] = {}


def _bloom_pos_col(fp: Column, i: int) -> Column:
    """Hash position i of a fingerprint: first 8 md5 hex chars of the
    salted fingerprint, mod BLOOM_M — the engine-portable hash family
    used across the repo (sample_stratified, winnowing, DSIR)."""
    return (
        F.conv(F.substring(F.md5(F.concat(fp, F.lit(f":{i}"))), 1, 8), 16, 10)
        .cast("long")
        % BLOOM_M
    )


def bloom_build(spark: SparkSession, sf_dir: str) -> list[int]:
    """Build (once per corpus version) the eval-set Bloom filter: the
    sorted set of bit positions lit by the eval fingerprints. BLOOM_M
    bits regardless of eval size — the artifact a 100 TB run ships to
    every executor instead of joining against the eval set."""
    cached = _BLOOM_CACHE.get(sf_dir)
    if cached is None:
        d = load(spark, sf_dir, "documents")
        evalfp = (
            d.where(F.col("doc_id") < BLOOM_EVAL_CUT)
            .select(normalized_fp(F.col("text")).alias("fp"))
            .distinct()
        )
        pos = evalfp.select(
            F.explode(
                F.array(
                    *[_bloom_pos_col(F.col("fp"), i) for i in range(1, BLOOM_K + 1)]
                )
            ).alias("p")
        ).distinct()
        cached = sorted(r.p for r in pos.collect())
        _BLOOM_CACHE[sf_dir] = cached
    return cached


def _bloom_oracle() -> str:
    def pos_sql(fp_expr: str, i: int) -> str:
        return (
            f"('0x' || substr(md5({fp_expr} || ':{i}'), 1, 8))::BIGINT % {BLOOM_M}"
        )

    hit = " AND ".join(
        f"{pos_sql('t.fingerprint', i)} IN (SELECT p FROM pos)"
        for i in range(1, BLOOM_K + 1)
    )
    pos_legs = ", ".join(str(i) for i in range(1, BLOOM_K + 1))
    return f"""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                     ' +', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    evalfp AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id < {BLOOM_EVAL_CUT}
    ),
    pos AS (
      SELECT DISTINCT
             ('0x' || substr(md5(fingerprint || ':' || i), 1, 8))::BIGINT % {BLOOM_M} AS p
      FROM evalfp, UNNEST([{pos_legs}]) AS u(i)
    ),
    train AS (
      SELECT f.doc_id, d.source, f.fingerprint
      FROM fp f JOIN documents d USING (doc_id)
      WHERE f.doc_id >= {BLOOM_EVAL_CUT}
    ),
    probe AS (
      SELECT t.source,
             CASE WHEN {hit} THEN 1 ELSE 0 END AS bloom_hit,
             CASE WHEN t.fingerprint IN (SELECT fingerprint FROM evalfp)
                  THEN 1 ELSE 0 END AS true_member
      FROM train t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(SUM(bloom_hit) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(true_member) AS BIGINT) AS n_true_members,
           CAST(SUM(CASE WHEN bloom_hit = 1 AND true_member = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           SUM(CASE WHEN bloom_hit = 1 AND true_member = 0 THEN 1 ELSE 0 END)
             * 1.0 / (COUNT(*) - SUM(true_member)) AS fp_rate
    FROM probe
    GROUP BY source
    ORDER BY source
    """


@query("bloom_decontaminate_stats", oracle=_bloom_oracle())
def bloom_decontaminate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (the Bloom 1970 bitset, as deployed
    by large corpus pipelines): the held-out eval set is serialized into
    a BLOOM_M-bit filter ONCE (bloom_build sidecar), and the corpus
    probe is pure JVM column arithmetic — BLOOM_K md5 positions per doc
    checked against a literal position array. The exact membership join
    (broadcast — the eval set is tiny by construction) runs alongside
    ONLY to measure the filter's false-positive rate per source; a
    production run ships just the bitset, never the eval set.

    100 TB shape: the probe stage is embarrassingly parallel with a
    constant-size closure (the filter), no shuffle until the per-source
    rollup (bounded by source cardinality); this is the decontamination
    pattern when even the eval-set broadcast of decontaminate_overlap
    is unwanted on the hot path."""
    bits = bloom_build(spark, sf_dir)
    bitset = F.array(*[F.lit(int(p)) for p in bits])
    d = load(spark, sf_dir, "documents")
    fps = d.select(
        "doc_id", "source", normalized_fp(F.col("text")).alias("fingerprint")
    )
    evalfp = (
        fps.where(F.col("doc_id") < BLOOM_EVAL_CUT)
        .select("fingerprint")
        .distinct()
        .withColumn("is_member", F.lit(1))
    )
    hit = None
    for i in range(1, BLOOM_K + 1):
        term = F.array_contains(bitset, _bloom_pos_col(F.col("fingerprint"), i))
        hit = term if hit is None else hit & term
    probe = (
        fps.where(F.col("doc_id") >= BLOOM_EVAL_CUT)
        .join(F.broadcast(evalfp), "fingerprint", "left")
        .select(
            "source",
            F.when(hit, 1).otherwise(0).alias("bloom_hit"),
            F.coalesce(F.col("is_member"), F.lit(0)).alias("true_member"),
        )
    )
    fpos = F.when(
        (F.col("bloom_hit") == 1) & (F.col("true_member") == 0), 1
    ).otherwise(0)
    return (
        probe.groupBy("source")
        .agg(
            F.count("*").alias("n_train"),
            F.sum("bloom_hit").alias("n_bloom_hits"),
            F.sum("true_member").alias("n_true_members"),
            F.sum(fpos).alias("n_false_positives"),
            (
                F.sum(fpos)
                * F.lit(1.0)
                / (F.count("*") - F.sum("true_member"))
            ).alias("fp_rate"),
        )
        # dimension/calendar-bounded tail: single-partition sort,
        # no range exchange / sampling job (r10 registry-wide sweep)
        .coalesce(1)
        .sortWithinPartitions("source")
    )


@query(
    "ngram_novelty_score",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    g AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    first AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM g GROUP BY shingle
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) * 1.0
             / COUNT(*) AS novelty_frac
    FROM g JOIN first f USING (shingle)
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content-novelty: the fraction of a document's
    distinct shingles whose FIRST corpus occurrence (min doc_id — the
    ingest-order proxy) is this document. Low-novelty docs restate
    content the corpus already has even when no single near-dup pair
    crosses a dedup threshold (diffuse duplication) — the marginal-
    contribution signal data-pruning work cuts on, and the corpus-level
    complement of the pairwise dedup family.

    Scale shape: rides the SAME shingle-postings sidecar as minhash /
    jaccard / CC (`prepare_dedup` builds it once per corpus version);
    the first-occurrence doc is a column OF that sidecar (it rides the
    same shingle-keyed window that computes df, so the build pays no
    extra exchange), and the per-doc rollup reuses the postings' doc_id
    partitioning — the query path is a single exchange-free aggregation
    over the materialized index. The ad-hoc fallback (postings built
    without first_doc) computes it via the identical window inline."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    sh = shingle_postings(d, cache_key=sf_dir)
    if "first_doc" not in sh.columns:
        sh = sh.withColumn(
            "first_doc", F.min("doc_id").over(W.partitionBy("shingle"))
        )
    return (
        sh.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (F.col("n_novel") * F.lit(1.0) / F.col("n_shingles")).alias(
                "novelty_frac"
            ),
        )
        .orderBy("doc_id")
    )


#: Incremental-dedup batch selector (stands in for "today's crawl"):
#: same convention as dedup_incremental's eval split.
INCR_BATCH_MOD = 13


@query(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH sh AS ({{_DD_SHINGLES}}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS corpus_doc
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
      WHERE a.doc_id % {INCR_BATCH_MOD} = 0 AND b.doc_id % {INCR_BATCH_MOD} <> 0
    )
    SELECT batch_doc AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(MIN(corpus_doc) AS BIGINT) AS first_match
    FROM cand GROUP BY batch_doc ORDER BY doc_id
    """.format(_DD_SHINGLES=_DD_SHINGLES),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup check: for each document of today's batch
    (doc_id % INCR_BATCH_MOD == 0 stands in for the daily crawl), how
    many existing corpus documents share at least one LSH band with it,
    and the smallest such corpus doc (the canonical it would attach to).
    The near-dup complement of dedup_incremental's exact-hash probe —
    the daily admission gate of a continuously-growing training corpus.

    Scale shape: corpus signatures come from the prepare_dedup sidecar
    (signed once per corpus version); the daily batch's banded keys are
    BROADCAST into the corpus side, so the corpus-sized band table never
    shuffles (same discipline as dedup_incremental, asserted for that
    operator in test_plan_hygiene). The rollup then shuffles only
    candidate pairs — bounded by batch size × band fan-out, not corpus
    size. r11 (guide §2.4): ONE batch_doc-keyed exchange serves both
    the pair dedupe and the per-doc rollup — HashPartitioning(batch_doc)
    satisfies the (batch_doc, corpus_doc) clustering the distinct
    needs, so the old shape's second exchange (distinct on the pair
    key, then regroup on batch_doc) never enters the plan."""
    d = load(spark, sf_dir, "documents")
    banded = banded_keys(minhash_signatures(d, cache_key=sf_dir))
    is_batch = F.col("doc_id") % INCR_BATCH_MOD == 0
    batch_b = banded.where(is_batch).select(
        F.col("doc_id").alias("batch_doc"), "band_id", "band_key"
    )
    corpus_b = banded.where(~is_batch).select(
        F.col("doc_id").alias("corpus_doc"), "band_id", "band_key"
    )
    return (
        corpus_b.join(F.broadcast(batch_b), ["band_id", "band_key"])
        .select("batch_doc", "corpus_doc")
        .repartition(F.col("batch_doc"))
        .distinct()
        .groupBy(F.col("batch_doc").alias("doc_id"))
        .agg(
            F.count("*").alias("n_candidates"),
            F.min("corpus_doc").alias("first_match"),
        )
        .orderBy("doc_id")
    )


@query(
    "dup_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE sh AS ({{SH}}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    pairs AS ({{PAIRS}}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    sized AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY component
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs
    FROM sized GROUP BY cluster_size ORDER BY cluster_size
    """.format(SH=_DD_SHINGLES, PAIRS=_MINHASH_PAIRS_SQL),
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution: for each cluster size, how
    many clusters and how many documents live at that size — the
    dedup-yield report (singletons = unique content; the tail's mass =
    how many docs deduplication would remove; a giant component = a
    boilerplate explosion or a band-tuning bug). Read together with
    minhash_band_tuning it closes the dedup feedback loop: tune bands →
    inspect the size distribution → apply canonical.

    Scale shape: rides the cc_labels sidecar (the union-find runs once
    per corpus version in prepare_dedup); the histogram itself is two
    cascaded aggregations whose key spaces are |clusters| then
    |distinct sizes| — both collapse map-side. Nothing here touches
    text or signatures."""
    return (
        cc_labels(spark, sf_dir)
        .groupBy("component")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
        )
        # dimension/calendar-bounded tail: single-partition sort,
        # no range exchange / sampling job (r10 registry-wide sweep)
        .coalesce(1)
        .sortWithinPartitions("cluster_size")
    )


@query(
    "near_dup_source_matrix",
    oracle=f"""
    WITH sh AS ({{SH}}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    pairs AS ({{PAIRS}})
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    GROUP BY 1, 2
    ORDER BY source_a, source_b
    """.format(SH=_DD_SHINGLES, PAIRS=_MINHASH_PAIRS_SQL),
)
def near_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source NEAR-dup contamination matrix: for every (unordered)
    source pair, how many minhash candidate pairs cross it. The
    candidate-level complement of source_overlap_matrix's span census —
    spans find verbatim reuse, candidate pairs find whole-document
    near-dups (mirror sites, syndication, re-crawls), and the diagonal
    measures within-source redundancy.

    Scale shape: the candidate pair list (already df-capped and
    band-bounded, from the prepare_dedup signature sidecar) is the
    small side — it BROADCASTS into both source lookups, so the
    corpus-sized documents relation never shuffles; the rollup's key
    space is ≤ n_sources². The doc→source projection prunes to two
    columns at the scan."""
    d = load(spark, sf_dir, "documents")
    pairs = minhash_candidates(d, cache_key=sf_dir)
    src = d.select("doc_id", "source")
    sa, sb = src.alias("sa"), src.alias("sb")
    return (
        pairs.hint("broadcast")
        .join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .hint("broadcast")
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            F.least(F.col("sa.source"), F.col("sb.source")).alias("source_a"),
            F.greatest(F.col("sa.source"), F.col("sb.source")).alias(
                "source_b"
            ),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
        # ≤ n_sources² tail: single-partition sort, no range exchange /
        # sampling job (r10 registry-wide sweep; util.ordered_small)
        .coalesce(1)
        .sortWithinPartitions("source_a", "source_b")
    )


@query(
    "dedup_token_savings",
    oracle=f"""
    WITH RECURSIVE sh AS ({{SH}}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    pairs AS ({{PAIRS}}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node),
    tok AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.doc_id = c.component THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(SUM(t.n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN c.doc_id = c.component THEN t.n_tokens
                         ELSE 0 END) AS BIGINT) AS tokens_kept,
           CAST(SUM(CASE WHEN c.doc_id = c.component THEN 0
                         ELSE t.n_tokens END) AS BIGINT) * 1.0
             / CAST(SUM(t.n_tokens) AS BIGINT) AS removed_frac
    FROM tok t JOIN comp c ON c.doc_id = t.doc_id
    GROUP BY t.source
    ORDER BY source
    """.format(SH=_DD_SHINGLES, PAIRS=_MINHASH_PAIRS_SQL),
)
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup yield in the unit that matters for training cost:
    TOKENS removed per source when each near-dup cluster keeps only its
    canonical document (component = min reachable doc_id, so kept ⟺
    doc_id == component). The number a data-mixture budget actually
    consumes — cluster counts say how many dups exist, this says how
    much compute they were worth.

    Scale shape: the cc_labels sidecar joins the per-doc token counts
    on doc_id (both one row per doc; co-partitioned on a bucketed
    warehouse), then one rollup keyed by source. removed_frac is a
    single division of exact longs."""
    from trialstreamer_spark.operators.textstats import tokens_col

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    kept = F.when(F.col("doc_id") == F.col("component"), 1).otherwise(0)
    kept_tokens = F.when(
        F.col("doc_id") == F.col("component"), F.col("n_tokens")
    ).otherwise(0)
    removed_tokens = F.when(
        F.col("doc_id") == F.col("component"), 0
    ).otherwise(F.col("n_tokens"))
    return (
        tok.join(cc_labels(spark, sf_dir), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept).alias("n_docs_kept"),
            F.sum("n_tokens").alias("tokens_total"),
            F.sum(kept_tokens).alias("tokens_kept"),
            (
                F.sum(removed_tokens) * F.lit(1.0) / F.sum("n_tokens")
            ).alias("removed_frac"),
        )
        # dimension/calendar-bounded tail: single-partition sort,
        # no range exchange / sampling job (r10 registry-wide sweep)
        .coalesce(1)
        .sortWithinPartitions("source")
    )


@query(
    "shingle_df_histogram",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    df AS (SELECT shingle, COUNT(*) AS df FROM posting GROUP BY 1),
    b AS (SELECT CAST(length(bin(df)) AS INTEGER) AS df_bucket, df FROM df),
    per AS (
      SELECT df_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(df) AS BIGINT) AS n_postings
      FROM b GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_postings) AS BIGINT) AS total_postings FROM per)
    SELECT per.df_bucket, per.n_shingles, per.n_postings,
           CAST((1000000 * per.n_postings) // tot.total_postings AS BIGINT)
               AS postings_share_fp
    FROM per, tot
    ORDER BY df_bucket
    """,
)
def shingle_df_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency histogram of the shingle postings in power-of-
    two buckets (bucket = bit-length of df): the measurement behind every
    df-cap decision in this module — it shows how much of the postings
    mass sits on promiscuous shingles that candidate generation must
    prune (dedup_jaccard_capped's DF_CAP, the winnowing fp caps). The
    100 TB tuning loop reads this instead of guessing.

    Scale shape: rides the SAME persisted shingle-postings sidecar the
    dedup family shares (no re-shingling); the df rollup groups on the
    shingle (the postings' one unavoidable shuffle — identical to what
    signature building already pays), then collapses to ≤64 bucket rows
    map-side; the share multiplies against a 1-row broadcast total.
    Bucketing by bit-length is integer-exact on both engines (bin() /
    length), no float log2."""
    d = load(spark, sf_dir, "documents")
    posting = shingle_postings(d, cache_key=sf_dir)
    df = posting.groupBy("shingle").agg(F.count("*").alias("df"))
    per = (
        df.select(
            F.length(F.bin(F.col("df"))).cast("int").alias("df_bucket"),
            "df",
        )
        .groupBy("df_bucket")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("df").alias("n_postings"),
        )
    )
    # total rides a single-partition window over the ≤64-bucket rollup
    # instead of a separate agg leg + broadcast (r11, guide §2.4: the
    # old shape re-derived `per` for the total and paid a broadcast
    # build job; the frame is ≤64 rows, so one partition is free and
    # the final sort is in-partition too).
    return (
        per.coalesce(1)
        .select(
            "df_bucket",
            "n_shingles",
            "n_postings",
            F.expr(
                "(1000000 * n_postings) DIV "
                "SUM(n_postings) OVER ()"
            ).alias("postings_share_fp"),
        )
        .sortWithinPartitions("df_bucket")
    )


@query(
    "dup_graph_degree_histogram",
    oracle=f"""
    WITH sh AS ({{_DD_SHINGLES}}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    pairs AS ({{_MINHASH_PAIRS_SQL}}),
    ends AS (
      SELECT doc_a AS doc_id FROM pairs
      UNION ALL SELECT doc_b FROM pairs
    ),
    deg AS (
      SELECT d.doc_id, COUNT(e.doc_id) AS degree
      FROM documents d LEFT JOIN ends e ON d.doc_id = e.doc_id
      GROUP BY d.doc_id
    ),
    b AS (
      SELECT CASE WHEN degree = 0 THEN 0
                  ELSE CAST(length(bin(degree)) AS INTEGER) END
               AS degree_bucket,
             degree
      FROM deg
    )
    SELECT degree_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(degree) AS BIGINT) AS n_endpoints
    FROM b GROUP BY 1 ORDER BY degree_bucket
    """.format(_DD_SHINGLES=_DD_SHINGLES, _MINHASH_PAIRS_SQL=_MINHASH_PAIRS_SQL),
)
def dup_graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup candidate graph in
    power-of-two buckets (bucket 0 = isolated documents): the health
    check run BEFORE connected components at scale — a heavy high-degree
    tail means a band key has gone promiscuous and the transitive
    closure will glue unrelated documents into mega-clusters (the
    classic MinHash-LSH failure mode); a mostly-isolated corpus means
    dedup will be cheap. Complements dup_cluster_size_histogram, which
    audits AFTER clustering.

    Plan: rides the SAME cached candidate-pair set the whole dedup
    family shares (no re-banding); degrees are one rollup over the
    symmetrized endpoint list keyed on doc_id, collapsed to a ≤64-row
    histogram map-side. Isolated documents never enter a join: every
    doc absent from the pair list has degree 0, so bucket 0 is
    n_docs_total − Σ nonzero-bucket docs — the corpus contributes ONE
    count(*) instead of a corpus-sized LEFT JOIN against the degree
    table (r11, guide §2.4/§3; emitted only when positive, matching
    the oracle's GROUP BY which has no bucket-0 row in a fully
    connected corpus). Bit-length bucketing is integer-exact on both
    engines."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    pairs = minhash_candidates(d, cache_key=sf_dir)
    ends = pairs.select(F.col("doc_a").alias("doc_id")).union(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    hist = (
        ends.groupBy("doc_id")
        .agg(F.count("*").alias("degree"))
        .groupBy(
            F.length(F.bin(F.col("degree"))).cast("int").alias("degree_bucket")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("degree").alias("n_endpoints"),
        )
    )
    tot = d.agg(F.count("*").alias("n_docs")).select(
        F.lit(None).cast("int").alias("degree_bucket"),
        "n_docs",
        F.lit(0).cast("long").alias("n_endpoints"),
    )
    # Tagged union on the ≤65-row tail: the NULL-bucket row carries the
    # corpus total; one whole-partition window (sanctioned post-
    # coalesce(1) bounded-frame pattern) turns it into the bucket-0 row.
    whole = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    n_iso = F.max(
        F.when(F.col("degree_bucket").isNull(), F.col("n_docs"))
    ).over(whole) - F.coalesce(
        F.sum(
            F.when(F.col("degree_bucket").isNotNull(), F.col("n_docs"))
        ).over(whole),
        F.lit(0),
    )
    return (
        hist.unionByName(tot)
        .coalesce(1)
        .withColumn("n_iso", n_iso)
        .where(F.col("degree_bucket").isNotNull() | (F.col("n_iso") > 0))
        .select(
            F.coalesce(F.col("degree_bucket"), F.lit(0)).alias("degree_bucket"),
            F.when(F.col("degree_bucket").isNull(), F.col("n_iso"))
            .otherwise(F.col("n_docs"))
            .alias("n_docs"),
            "n_endpoints",
        )
        # dimension/calendar-bounded tail: single-partition sort,
        # no range exchange / sampling job (r10 registry-wide sweep)
        .sortWithinPartitions("degree_bucket")
    )


_MINHASH_BANDED_PRELUDE = f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hashes AS (SELECT doc_id, md5(shingle) AS m1, md5('x' || shingle) AS m2 FROM posting),
    sig AS (
      SELECT doc_id,
             MIN(substr(m1, 1, 8))  AS h0, MIN(substr(m1, 9, 8))  AS h1,
             MIN(substr(m1, 17, 8)) AS h2, MIN(substr(m1, 25, 8)) AS h3,
             MIN(substr(m2, 1, 8))  AS h4, MIN(substr(m2, 9, 8))  AS h5,
             MIN(substr(m2, 17, 8)) AS h6, MIN(substr(m2, 25, 8)) AS h7
      FROM hashes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1) AS band_key FROM sig
      UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    pairs AS ({_MINHASH_PAIRS_SQL})
"""


@query(
    "triangle_count_dup_graph",
    oracle=_MINHASH_BANDED_PRELUDE
    + """,
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM pairs p1
      JOIN pairs p2 ON p2.doc_a = p1.doc_b
      JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
    ),
    ends AS (
      SELECT doc_a AS doc_id FROM pairs
      UNION ALL SELECT doc_b FROM pairs
    ),
    deg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
            FROM ends GROUP BY doc_id),
    wed AS (
      SELECT CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges,
           tri.n_triangles,
           wed.n_wedges,
           CAST(CASE WHEN wed.n_wedges > 0
                     THEN (3000000 * tri.n_triangles) // wed.n_wedges
                     ELSE -1 END AS BIGINT) AS transitivity_fp
    FROM tri, wed
    """,
)
def triangle_count_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global transitivity (clustering coefficient) of
    the near-dup candidate graph — the structural complement to the
    degree histogram: high transitivity means LSH candidates agree with
    each other (tight duplicate cliques → safe transitive closure); low
    transitivity with high degree means promiscuous band keys chaining
    UNRELATED docs (the mega-cluster failure mode the reference's
    boilerplate corpora hit). Reported at 1e-6 fixed point (-1 sentinel
    for the no-wedge graph) — exact integers on both engines.

    Scale shape: rides the SAME persisted candidate-pair sidecar as the
    whole dedup family (no re-banding); edges are oriented doc_a <
    doc_b, so each triangle is counted exactly once by the standard
    two-hop join (p1 a<b, p2 b<c, closing edge a<c). The pair table is
    candidate edges — orders of magnitude smaller than the corpus and
    df-cap-bounded per band key — so the self-joins shuffle the edge
    list, never documents; wedges are one rollup over symmetrized
    endpoints. At 100 TB this is the standard distributed triangle
    count (edge orientation kills the high-degree hub blowup)."""
    d = load(spark, sf_dir, "documents")
    pairs = minhash_candidates(d, cache_key=sf_dir)
    p1 = pairs.alias("p1")
    p2 = pairs.alias("p2")
    p3 = pairs.alias("p3")
    tri = (
        p1.join(p2, F.col("p2.doc_a") == F.col("p1.doc_b"))
        .join(
            p3,
            (F.col("p3.doc_a") == F.col("p1.doc_a"))
            & (F.col("p3.doc_b") == F.col("p2.doc_b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    ends = pairs.select(F.col("doc_a").alias("doc_id")).union(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    # n_edges rides the degree rollup (Σdegree = 2·|edges| exactly) —
    # r11: the separate COUNT(*) leg over the pair table and its
    # broadcast were two more scheduler jobs for a value the wedge
    # aggregate already holds.
    wed = (
        ends.groupBy("doc_id")
        .agg(F.count("*").alias("degree"))
        .agg(
            F.sum(
                F.expr("degree * (degree - 1) DIV 2")
            ).alias("n_wedges"),
            F.expr("sum(degree) DIV 2").alias("n_edges"),
        )
    )
    # r11 (guide §2.4): the two 1-row legs merge through a tagged UNION
    # + max() aggregate instead of a crossJoin — the broadcast build of
    # the tri row was its own scheduler job. max() over one non-null
    # value per column reproduces the crossJoin row exactly (including
    # the NULL n_wedges/n_edges of an empty graph).
    null_l = F.lit(None).cast("long")
    merged = (
        wed.select("n_wedges", "n_edges", null_l.alias("n_triangles"))
        .unionByName(
            tri.select(
                null_l.alias("n_wedges"),
                null_l.alias("n_edges"),
                "n_triangles",
            )
        )
        .agg(
            F.max("n_wedges").alias("n_wedges"),
            F.max("n_edges").alias("n_edges"),
            F.max("n_triangles").alias("n_triangles"),
        )
    )
    return (
        merged
        .select(
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(
                F.col("n_wedges") > 0,
                F.expr("(3000000 * n_triangles) DIV n_wedges"),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("transitivity_fp"),
        )
    )


_SIMHASH16_SQL = (
    """
    SELECT doc_id,
           CAST(("""
    + "\n+".join(
        f"""CASE WHEN list_aggregate(list_transform(toks,
                   x -> CASE WHEN substr(md5(x), {i + 1}, 1) IN
                        ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END),
                 'sum') > 0 THEN {2**i} ELSE 0 END"""
        for i in range(16)
    )
    + """
           ) AS BIGINT) AS simhash
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
          FROM documents)
"""
)


@query(
    "simhash_hamming_histogram",
    oracle=_MINHASH_BANDED_PRELUDE
    + f""",
    sim AS ({_SIMHASH16_SQL})
    SELECT CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN sim sa ON sa.doc_id = p.doc_a
    JOIN sim sb ON sb.doc_id = p.doc_b
    GROUP BY 1 ORDER BY hamming
    """,
)
def simhash_hamming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validation of the two near-dup detectors: the SimHash
    hamming-distance distribution OVER the MinHash-LSH candidate pairs.
    A candidate set dominated by small hamming distances means both
    signature families agree the pairs are near-dups (threshold the
    apply step can trust); a heavy far-hamming tail means LSH banding
    is surfacing pairs SimHash disputes — tune bands or df-caps before
    an expensive exact-verify pass. This is the tuning evidence a
    100 TB dedup run collects BEFORE committing to a canonical apply.

    Scale shape: both inputs are per-corpus sidecar-shaped — the
    candidate-pair table (shared, persisted) and the 16-bit signature
    table (one grouped bit-agg pass, simhash_table) — and the pair
    table drives: two doc-keyed joins pull signatures onto ≤|pairs|
    rows, the XOR + popcount is JVM codegen, and the histogram
    collapses to ≤17 rows map-side. (r11: an explode-to-endpoints +
    single-join + BIT_XOR-agg variant was tried and measured SLOWER —
    the two signature references already collapse to one physical
    build via exchange/broadcast reuse, so the variant only added a
    pair-keyed exchange.)"""
    d = load(spark, sf_dir, "documents")
    pairs = minhash_candidates(d, cache_key=sf_dir)
    sim = simhash_table(d, cache_key=sf_dir)
    sa = sim.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a")
    )
    sb = sim.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.bit_count(F.expr("sim_a ^ sim_b")).cast("int").alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count("*").alias("n_pairs"))
        # dimension/calendar-bounded tail: single-partition sort,
        # no range exchange / sampling job (r10 registry-wide sweep)
        .coalesce(1)
        .sortWithinPartitions("hamming")
    )


_SPLIT_CASE_SQL = """
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd')
         THEN 'val'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f')
         THEN 'test'
         ELSE 'train' END
"""


@query(
    "split_leakage_audit",
    oracle=_MINHASH_BANDED_PRELUDE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + f""",
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    lbl AS (SELECT node AS doc_id, MIN(label) AS component
            FROM reach GROUP BY node),
    sp AS (
      SELECT component,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT {_SPLIT_CASE_SQL}) AS BIGINT) AS n_splits
      FROM lbl GROUP BY component
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_clusters,
           CAST(SUM(CASE WHEN n_docs > 1 AND n_splits > 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_clusters,
           CAST(SUM(CASE WHEN n_docs > 1 AND n_splits > 1
                         THEN n_docs ELSE 0 END) AS BIGINT)
             AS n_docs_in_leaky,
           CAST(CASE WHEN SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) > 0
                     THEN (1000000 * SUM(CASE WHEN n_docs > 1
                                              AND n_splits > 1
                                              THEN 1 ELSE 0 END))
                          // SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)
                     ELSE -1 END AS BIGINT) AS leak_rate_fp
    FROM sp
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test leakage through near-duplicate clusters: assign
    every document its deterministic hash split (md5 of doc_id: 12/16
    of the space → train, 2/16 → val, 2/16 → test — the standard
    restart-stable split), then count dup clusters whose members
    STRADDLE splits. A leaked cluster puts a near-copy of a training
    document into eval — the contamination mode that inflates benchmark
    scores — and the correct fix (split by CLUSTER, not by doc) is
    exactly what this audit gates. Reported as a one-row summary with a
    1e-6 fixed-point leak rate over multi-doc clusters (-1 when there
    are none).

    Scale shape: rides the disk-backed cc_labels sidecar (the
    union-find ran once per corpus version); the split is a scan-side
    md5 expression on the label table (never touches text), and both
    rollups collapse map-side — per-cluster to |clusters| rows, then to
    one. The oracle restates the closure as the recursive min-label
    fixpoint over the same banded pairs."""
    lbl = cc_labels(spark, sf_dir)
    first = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(first.isin("c", "d"), F.lit("val"))
        .when(first.isin("e", "f"), F.lit("test"))
        .otherwise(F.lit("train"))
    )
    sp = lbl.groupBy("component").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(split).alias("n_splits"),
    )
    multi = F.col("n_docs") > 1
    leaky = multi & (F.col("n_splits") > 1)
    return sp.agg(
        F.count("*").alias("n_clusters"),
        F.sum(F.when(multi, 1).otherwise(0)).alias("n_multi_clusters"),
        F.sum(F.when(leaky, 1).otherwise(0)).alias("n_leaky_clusters"),
        F.sum(F.when(leaky, F.col("n_docs")).otherwise(0)).alias(
            "n_docs_in_leaky"
        ),
    ).select(
        "n_clusters",
        "n_multi_clusters",
        "n_leaky_clusters",
        "n_docs_in_leaky",
        F.when(
            F.col("n_multi_clusters") > 0,
            F.expr("(1000000 * n_leaky_clusters) DIV n_multi_clusters"),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("leak_rate_fp"),
    )


@query(
    "normalized_dup_census",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(text) AS raw_fp,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_fp
      FROM documents
    ),
    grp AS (
      SELECT norm_fp,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT raw_fp) AS BIGINT) AS n_raw
      FROM fp GROUP BY norm_fp
    )
    SELECT CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(SUM(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           CAST(SUM(CASE WHEN n_docs > 1 AND n_raw > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_groups_norm_only,
           CAST(SUM(n_raw - 1) AS BIGINT) AS extra_docs_removed
    FROM grp
    """,
)
def normalized_dup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup census: fingerprint every
    document twice — raw md5 and md5 of the casefolded,
    punctuation-stripped, whitespace-collapsed text — and measure what
    the normalized pass catches that byte-exact dedup misses
    (``n_groups_norm_only`` = collision groups invisible to the raw
    hash; ``extra_docs_removed`` = sum over groups of distinct raw
    variants minus the one survivor). This is the cheap first rung of
    the dedup ladder (above it: MinHash, SimHash), and the statistic
    that decides whether a corpus even NEEDS the expensive fuzzy pass.

    Scale shape: both fingerprints are scan-side md5 expressions — the
    shuffle carries (16-byte norm key, 16-byte raw key), never document
    bytes (the dedup_exact discipline, dedup.py module docstring); one
    groupBy on the norm key with a distinct-raw agg, then a one-row
    map-side rollup. DuckDB's regexp_replace needs the 'g' flag for
    the global substitutions Spark applies by default."""
    d = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    fp = d.select(
        F.md5(F.col("text")).alias("raw_fp"), F.md5(norm).alias("norm_fp")
    )
    grp = fp.groupBy("norm_fp").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("raw_fp").alias("n_raw"),
    )
    multi = F.col("n_docs") > 1
    return grp.agg(
        F.sum(F.when(multi, 1).otherwise(0)).alias("n_dup_groups"),
        F.sum(F.when(multi, F.col("n_docs")).otherwise(0)).alias(
            "n_dup_docs"
        ),
        F.sum(
            F.when(multi & (F.col("n_raw") > 1), 1).otherwise(0)
        ).alias("n_groups_norm_only"),
        F.sum(F.col("n_raw") - 1).alias("extra_docs_removed"),
    )


@query(
    "dup_pair_jaccard_calibration",
    oracle=_MINHASH_BANDED_PRELUDE
    + """,
    eq AS (
      SELECT p.doc_a, p.doc_b,
             CAST((CASE WHEN sa.h0 = sb.h0 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.h1 = sb.h1 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.h2 = sb.h2 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.h3 = sb.h3 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.h4 = sb.h4 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.h5 = sb.h5 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.h6 = sb.h6 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.h7 = sb.h7 THEN 1 ELSE 0 END) AS BIGINT)
               AS est_slots
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.doc_a
      JOIN sig sb ON sb.doc_id = p.doc_b
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
              FROM posting GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM pairs p
      JOIN posting a ON a.doc_id = p.doc_a
      JOIN posting b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
      GROUP BY p.doc_a, p.doc_b
    ),
    scored AS (
      SELECT e.est_slots,
             CAST((10 * COALESCE(c.n_common, 0))
                  // (za.n_sh + zb.n_sh - COALESCE(c.n_common, 0))
                  AS BIGINT) AS exact_decile
      FROM eq e
      LEFT JOIN common c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
      JOIN sizes za ON za.doc_id = e.doc_a
      JOIN sizes zb ON zb.doc_id = e.doc_b
    )
    SELECT est_slots, exact_decile, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM scored
    GROUP BY 1, 2
    ORDER BY est_slots, exact_decile
    """,
)
def dup_pair_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration matrix of the MinHash estimator ON the candidate
    pairs the pipeline actually acts on: matching-signature-slot count
    (0–8, the estimator) × exact shingle-Jaccard decile (0–10, ground
    truth), with pair counts. A diagonal-heavy matrix means the
    8-hash estimate is trustworthy enough to threshold WITHOUT the
    exact-verify join; mass in the (high est, low exact) corner is the
    false-positive rate banding passes to downstream apply steps — the
    evidence that tunes minhash_band_tuning's parameter choice.

    Scale shape: all three inputs are prepare-time sidecars (pair
    table, signature table, shingle postings); pairs DRIVE every join —
    the per-doc shingle SET (a distinct array by construction,
    shingles_col) and its size attach to the signature table ONCE
    doc-keyed, so exactly TWO doc-keyed lookups serve slots, sizes, AND
    the exact intersection: |A∩B| = size(array_intersect(sh_a, sh_b))
    per pair in whole-stage codegen (r12, guide §2.4/§2.3 — the old
    shape re-joined exploded postings on (doc_b, shingle) and folded a
    tagged union through one more pair-keyed exchange; 8→6 scheduler
    jobs, plan Exchange 24→16 / scans 15→10, and the only rows that
    ever shuffle are candidate pairs and the doc-keyed set frame, never
    exploded pair×shingle rows). The
    result collapses to a ≤9×11 matrix map-side; the bounded tail sorts
    in one partition (util.ordered_small)."""
    d = load(spark, sf_dir, "documents")
    pairs = minhash_candidates(d, cache_key=sf_dir)
    sig = minhash_signatures(d, cache_key=sf_dir)
    posting = shingle_postings(d, cache_key=sf_dir)
    # postings ride hashpartitioning(doc_id) (shingle_postings contract),
    # so this groupBy re-assembles the per-doc set with NO exchange;
    # n_sh is constant per doc (pre-explode array size) — max() = the set
    # size.
    docsets = posting.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("sh"),
        F.max("n_sh").alias("n_sh"),
    )
    sigz = sig.join(docsets, "doc_id")
    eq_col = sum(
        F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    ).cast("long")
    scored = (
        pairs.join(sigz.alias("sa"), pairs.doc_a == F.col("sa.doc_id"))
        .join(sigz.alias("sb"), pairs.doc_b == F.col("sb.doc_id"))
        .select(
            eq_col.alias("est_slots"),
            F.col("sa.n_sh").alias("sa_n"),
            F.col("sb.n_sh").alias("sb_n"),
            F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
            .cast("long")
            .alias("n_common"),
        )
        .select(
            "est_slots",
            F.expr(
                "(10 * n_common) DIV (sa_n + sb_n - n_common)"
            ).alias("exact_decile"),
        )
    )
    return util.ordered_small(
        scored.groupBy("est_slots", "exact_decile").agg(
            F.count("*").alias("n_pairs")
        ),
        "est_slots",
        "exact_decile",
    )


@query(
    "doc_prefix_dup_rate",
    oracle="""
    WITH fp AS (
      SELECT source,
             md5(substr(text, 1, 64)) AS prefix_fp,
             md5(text) AS full_fp
      FROM documents
    ),
    grp AS (
      SELECT prefix_fp,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT full_fp) AS BIGINT) AS n_full
      FROM fp GROUP BY prefix_fp
    ),
    marked AS (
      SELECT f.source,
             CASE WHEN g.n_docs > 1 AND g.n_full > 1 THEN 1 ELSE 0 END
               AS is_head_dup
      FROM fp f JOIN grp g ON f.prefix_fp = g.prefix_fp
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_head_dup) AS BIGINT) AS n_head_dup_docs,
           CAST((1000000 * SUM(is_head_dup)) // COUNT(*) AS BIGINT)
             AS head_dup_fp
    FROM marked GROUP BY source ORDER BY source
    """,
)
def doc_prefix_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-head detector: per source, the share of documents
    whose first 64 characters collide with ANOTHER distinct document
    (same head, different body — shared headers, templated intros,
    truncation stubs). Full-text exact dups are excluded (n_full > 1),
    so this isolates the boilerplate-prefix pathology that line-level
    dedup misses and MinHash under-weights when bodies diverge.

    Scale shape: both fingerprints are scan-side md5 of a bounded
    substr — the shuffle carries 16-byte keys (the dedup_exact
    discipline). ONE prefix-keyed exchange serves everything (r11,
    guide §2.2/§2.4): per-prefix windows compute the group census
    in-place — n_docs is a plain partition count, n_full is
    max(dense_rank ordered by full_fp), the standard window spelling of
    COUNT(DISTINCT) — so the old plan's second corpus pass and its
    census join-back (a prefix-census-sized build side that is
    corpus-derived, NOT dimension-bounded, at 100 TB) are gone. The
    isNotNull guard reproduces the old inner join exactly: a NULL text
    yields a NULL prefix_fp, which the join dropped."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "source",
        F.md5(F.substring(F.col("text"), 1, 64)).alias("prefix_fp"),
        F.md5(F.col("text")).alias("full_fp"),
    ).where(F.col("prefix_fp").isNotNull())
    w = W.partitionBy("prefix_fp")
    marked = (
        fp.repartition("prefix_fp")
        .select(
            "source",
            "prefix_fp",
            F.count("*").over(w).alias("n_docs"),
            F.dense_rank().over(w.orderBy("full_fp")).alias("full_rank"),
        )
        .select(
            "source",
            "n_docs",
            F.max("full_rank").over(w).alias("n_full"),
        )
        .select(
            "source",
            F.when((F.col("n_docs") > 1) & (F.col("n_full") > 1), 1)
            .otherwise(0)
            .alias("is_head_dup"),
        )
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("is_head_dup").alias("n_head_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_head_dup_docs",
            F.expr("(1000000 * n_head_dup_docs) DIV n_docs").alias(
                "head_dup_fp"
            ),
        )
        # dimension-sized tail: single-partition sort, no range
        # exchange / sampling job (r9 VERDICT #5a; util.ordered_small)
        .coalesce(1)
        .sortWithinPartitions("source")
    )


#: Jaccard threshold for the prefix-filtered similarity self-join.
PREFIX_JACCARD_T_NUM, PREFIX_JACCARD_T_DEN = 1, 2  # t = 0.5


@query(
    "jaccard_prefix_filter_pairs",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM posting GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM posting a JOIN posting b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST((1000000 * n_common) // (sa.n_sh + sb.n_sh - n_common)
                AS BIGINT) AS jaccard_fp
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE 3 * n_common >= sa.n_sh + sb.n_sh
    ORDER BY doc_a, doc_b
    """,
)
def jaccard_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 similarity SELF-JOIN via COUNT-FILTERED
    prefix filtering (Bayardo et al. WWW'07; Xiao et al. PPJoin's
    prefix+length filters, with the positional filter strengthened into
    a per-pair shared-prefix-count bound) — the third candidate
    strategy in the dedup family, alongside LSH banding (probabilistic)
    and the df-cap postings join (frequency-bounded). Every document's
    shingles are ordered by global rarity (df asc, shingle asc) and
    only the PREFIX of length p(n) = n - ceil(n/3) + 2 joins.

    The filter chain is exact, not probabilistic (t = 1/2 throughout):

    - J(A,B) >= t  =>  c = |A∩B| >= ceil((a+b)/3)  (and c <= min(a,b),
      giving the length filter 3·min(a,b) >= a+b);
    - common shingles missing from prefix_A number at most a - p(a), so
      the pair's SHARED-PREFIX COUNT k satisfies
      k >= ceil((a+b)/3) - (a - p(a)) - (b - p(b)) >= 2 — a per-pair
      integer requirement computed from the sizes alone. One groupBy
      over the prefix join applies it BEFORE any verification.

    Why the count bound matters at scale: the classic share-ONE-prefix-
    token candidate rule collapses on template corpora, where even each
    document's rarest shingles have df in the hundreds — measured here:
    61.7M one-token candidates for 2,738 true pairs at sf1, with a mean
    of 1.05 shared prefix tokens per random candidate. The count bound
    drops that to 137k survivors in one aggregation (450x), and only
    survivors touch the per-doc shingle arrays for exact verification
    (array_intersect on arrays bounded by document length, never corpus
    size). The oracle states the declarative truth — full postings
    self-join + threshold — and this plan must reproduce it exactly.

    Plan: postings ⋈ df (one shingle-keyed exchange; df is the same
    statistic the capped variant aggregates) → per-doc rarity rank
    (window reuses the postings' doc_id partitioning) → prefix filter →
    prefix self-join (equi-join, AQE-skew-safe) → pair-count aggregate
    + count/length bounds → exact verify of survivors. Integer
    predicate 3c >= a+b and 1e-6 fixed-point Jaccard keep both engines
    bit-identical."""
    from pyspark.sql import Window as W

    sh_full = shingle_postings(
        load(spark, sf_dir, "documents"), cache_key=sf_dir
    )
    sh = sh_full.select("doc_id", "n_sh", "shingle")
    if "df" in sh_full.columns:
        # Materialized postings carry df (the same index-build statistic
        # capped_doc_lists reuses): the rarity rank needs NO per-query
        # re-aggregation — just the doc_id window over columns at hand.
        with_df = sh_full.select("doc_id", "n_sh", "shingle", "df")
    else:
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        with_df = sh.join(dfreq, "shingle")
    ranked = with_df.withColumn(
        "pos",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy("df", "shingle")
        ),
    )
    prefix = ranked.where(
        F.col("pos") <= F.expr("least(n_sh, n_sh - (n_sh + 2) DIV 3 + 2)")
    ).select("doc_id", "n_sh", "shingle")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J >= 1/2 forces 3*min(a,b) >= a+b
            & (
                F.lit(3) * F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                >= F.col("a.n_sh") + F.col("b.n_sh")
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("k"))
        # count bound: k >= ceil((a+b)/3) - (a - p(a)) - (b - p(b)), >= 1
        .where(
            F.col("k")
            >= F.greatest(
                F.lit(1),
                F.expr(
                    "(n_a + n_b + 2) DIV 3"
                    " - (n_a - least(n_a, n_a - (n_a + 2) DIV 3 + 2))"
                    " - (n_b - least(n_b, n_b - (n_b + 2) DIV 3 + 2))"
                ),
            )
        )
        .select("doc_a", "doc_b")
    )
    sets = sh.groupBy("doc_id").agg(
        F.first("n_sh").alias("n_sh"),
        F.collect_list("shingle").alias("shingles"),
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_sh").alias("n_a"),
        F.col("shingles").alias("sh_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_sh").alias("n_b"),
        F.col("shingles").alias("sh_b"),
    )
    c = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            c.cast("long").alias("n_common"),
            F.col("n_a"),
            F.col("n_b"),
        )
        .where(F.lit(3) * F.col("n_common") >= F.col("n_a") + F.col("n_b"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.expr(
                "(1000000 * n_common) DIV (n_a + n_b - n_common)"
            ).alias("jaccard_fp"),
        )
        .orderBy("doc_a", "doc_b")
    )


#: Containment threshold t = 4/5: inner doc counts as contained when
#: |A∩B| / |A| >= 0.8 over the capped feature space.
CONTAINMENT_T_NUM, CONTAINMENT_T_DEN = 4, 5


@query(
    "containment_pairs_capped",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    kept AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM posting)
      WHERE df <= 5
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM kept a JOIN kept b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pb AS (
      SELECT c.doc_a, c.doc_b, c.n_common,
             sa.n_sh AS n_a, sb.n_sh AS n_b
      FROM common c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a AS inner_doc, doc_b AS outer_doc,
           CAST(n_a AS BIGINT) AS n_inner,
           CAST(n_b AS BIGINT) AS n_outer,
           CAST(n_common AS BIGINT) AS n_common,
           CAST((1000000 * n_common) // n_a AS BIGINT) AS containment_fp
    FROM pb WHERE 5 * n_common >= 4 * n_a
    UNION ALL
    SELECT doc_b, doc_a,
           CAST(n_b AS BIGINT), CAST(n_a AS BIGINT),
           CAST(n_common AS BIGINT),
           CAST((1000000 * n_common) // n_b AS BIGINT)
    FROM pb WHERE 5 * n_common >= 4 * n_b
    ORDER BY inner_doc, outer_doc
    """,
)
def containment_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT join over the df-capped feature space:
    directed (inner, outer) pairs where |inner ∩ outer| / |inner| >=
    0.8 — the excerpt/quote detector Jaccard structurally misses (a
    paragraph quoted inside a 100x longer page has J ≈ 0.01 but
    containment = 1.0; the same asymmetry flags template-wrapped
    re-posts and subset-crawls). Both directions are tested
    independently, so mutual near-dups emit both rows. Integer
    predicate 5·c >= 4·|inner| and 1e-6 fixed-point score keep both
    engines bit-identical.

    Scale shape: identical machinery to dedup_jaccard_capped — the
    SAME disk-backed capped lists sidecar (built once per (corpus,
    df_cap)), the same bounded double-explode pair generation (fan-out
    ≤ C(df_cap, 2) per shingle however hot the boilerplate), one
    grouped count, and a two-direction projection of the one pair
    frame (no second pass). Containment over the PRUNED feature space
    is deliberate: at 100 TB the ubiquitous shingles carry no
    containment signal and would alone quadratically dominate the
    join, exactly as for capped Jaccard.

    The two directions emit from ONE consumption of the pair frame
    (r11, guide §2.4): each pair row explodes into the 0-2 direction
    rows whose threshold it clears, via a null-filtered literal array —
    the old fwd/rev UNION consumed `pairs` twice, and since exchange
    reuse does not span differing parent projections, the ENTIRE
    explode + grouped-count subtree (the expensive part) planned and
    ran twice."""
    lists = capped_doc_lists(
        load(spark, sf_dir, "documents"), df_cap=5, cache_key=sf_dir
    )
    pairs = (
        _pairs_from_lists(lists)
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    thr = F.lit(CONTAINMENT_T_DEN) * F.col("n_common")
    fwd_row = F.when(
        thr >= F.lit(CONTAINMENT_T_NUM) * F.col("n_a"),
        F.struct(
            F.col("doc_a").alias("inner_doc"),
            F.col("doc_b").alias("outer_doc"),
            F.col("n_a").alias("n_inner"),
            F.col("n_b").alias("n_outer"),
            F.col("n_common"),
        ),
    )
    rev_row = F.when(
        thr >= F.lit(CONTAINMENT_T_NUM) * F.col("n_b"),
        F.struct(
            F.col("doc_b").alias("inner_doc"),
            F.col("doc_a").alias("outer_doc"),
            F.col("n_b").alias("n_inner"),
            F.col("n_a").alias("n_outer"),
            F.col("n_common"),
        ),
    )
    return (
        pairs.select(
            F.explode(
                F.filter(
                    F.array(fwd_row, rev_row), lambda x: x.isNotNull()
                )
            ).alias("r")
        )
        .select("r.*")
        .select(
            "inner_doc",
            "outer_doc",
            "n_inner",
            "n_outer",
            "n_common",
            F.expr("(1000000 * n_common) DIV n_inner").alias(
                "containment_fp"
            ),
        )
        .orderBy("inner_doc", "outer_doc")
    )


#: dedup_novelty_by_arrival — novelty decay across ingestion order.
ARRIVAL_DECILES = 10


@query(
    "dedup_novelty_by_arrival",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                     ' +', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    mx AS (SELECT MAX(doc_id) AS mxid FROM documents),
    firsts AS (
      SELECT MIN(doc_id) AS first_id FROM fp GROUP BY fingerprint
    ),
    per_decile AS (
      SELECT LEAST({ARRIVAL_DECILES - 1},
                   ({ARRIVAL_DECILES} * doc_id) // (mxid + 1)) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM fp, mx GROUP BY 1
    ),
    novel_decile AS (
      SELECT LEAST({ARRIVAL_DECILES - 1},
                   ({ARRIVAL_DECILES} * first_id) // (mxid + 1)) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_novel
      FROM firsts, mx GROUP BY 1
    )
    SELECT CAST(p.decile AS BIGINT) AS decile,
           p.n_docs,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
           CAST((1000000 * (p.n_docs - COALESCE(n.n_novel, 0))) // p.n_docs
                AS BIGINT) AS dup_rate_fp
    FROM per_decile p LEFT JOIN novel_decile n ON n.decile = p.decile
    ORDER BY decile
    """,
)
def dedup_novelty_by_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty decay across ingestion order: split the corpus into ten
    arrival deciles (doc_id is the ingest sequence — the corpus carries
    no timestamp, so arrival order IS the id order) and report how the
    exact-duplicate rate climbs as the crawl progresses — early deciles
    are nearly all novel, late deciles increasingly re-fetch what's
    already stored. This is the curve that forecasts marginal dedup
    savings of continuing a crawl (the decision input behind "is the
    next 10 TB worth fetching"), and the arrival-ordered view of the
    census dedup_exact reports corpus-wide.

    A document is novel iff it is its fingerprint's canonical
    (minimum-doc_id) member, so per-decile novel counts are just the
    canonical ids bucketed by decile — no join back to the corpus.

    Scale shape: rides the exact_fp_census sidecar (the corpus is
    hashed once per corpus version, shared with the whole exact-dup
    family); a doc is novel iff doc_id == canonical_id, and the
    novel-leg decile is the decile of that SAME doc_id, so both legs
    collapse into ONE ARRIVAL_DECILES-key map-combinable aggregate
    (count + conditional count — r11: the oracle's per_decile/
    novel_decile LEFT JOIN was two separate corpus passes over the
    census for two counts the same groupBy produces; guide §2.4).
    max(doc_id) is a 1-row broadcast. The tail is decile-bounded →
    single-partition sort, no range exchange."""
    census = exact_fp_census(spark, sf_dir)
    mx = census.agg(F.max("doc_id").alias("mxid"))
    dec = F.least(
        F.lit(ARRIVAL_DECILES - 1),
        F.expr(f"({ARRIVAL_DECILES} * doc_id) DIV (mxid + 1)"),
    )
    # A decile with zero novel docs keeps n_novel = 0 (the sum of an
    # empty when() set), exactly the old LEFT JOIN + COALESCE(0).
    return (
        census.select("doc_id", "canonical_id")
        .crossJoin(F.broadcast(mx))
        .groupBy(dec.alias("decile"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") == F.col("canonical_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "decile",
            "n_docs",
            "n_novel",
            F.expr("(1000000 * (n_docs - n_novel)) DIV n_docs").alias(
                "dup_rate_fp"
            ),
        )
        # decile-bounded tail: single-partition sort, no range exchange
        .coalesce(1)
        .sortWithinPartitions("decile")
    )


@query(
    "dedup_cross_shard_pairs",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                     ' +', ' ', 'g'))) AS fingerprint,
             CAST(CAST(from_hex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIT) AS BIGINT) % 16 AS shard
      FROM documents
    ),
    per_fp AS (
      SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n FROM fp GROUP BY 1
    ),
    per_fp_shard AS (
      SELECT fingerprint, shard, CAST(COUNT(*) AS BIGINT) AS c
      FROM fp GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS total_pairs,
             CAST(COUNT(*) FILTER (WHERE n > 1) AS BIGINT) AS n_dup_groups
      FROM per_fp
    ),
    within AS (
      SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS within_pairs
      FROM per_fp_shard
    )
    SELECT t.n_dup_groups,
           t.total_pairs,
           w.within_pairs,
           CAST(t.total_pairs - w.within_pairs AS BIGINT) AS cross_pairs,
           CAST(CASE WHEN t.total_pairs = 0 THEN 0
                ELSE (1000000 * (t.total_pairs - w.within_pairs))
                     // t.total_pairs END AS BIGINT) AS cross_share_fp
    FROM tot t, within w
    """,
)
def dedup_cross_shard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much exact duplication CROSSES training-shard boundaries:
    total dup pairs vs pairs whose two members land in the same
    md5(doc_id) shard (training_shard_manifest's assignment). A
    shard-local dedup pass — the cheap strategy where each of N workers
    dedups only its own shard file — removes exactly the within-shard
    pairs; cross_share_fp is the fraction it would MISS and therefore
    the measured argument for global (fingerprint-keyed) dedup. Under a
    content-independent hash assignment this share concentrates near
    1 - 1/N_shards; a content-CORRELATED sharding (by source, by crawl
    seed) would drive it down — the query is the audit that tells you
    which regime your layout is in.

    Pair counting never enumerates pairs: per-fingerprint sizes n give
    Σ n·(n-1)/2 total and per-(fingerprint, shard) sizes give the
    within-shard term — both integer aggregates over census-bounded
    frames (the shard id is a scan-side md5 expression riding the same
    pass that fingerprints the text; the corpus is scanned once).

    Scale shape: two map-side-combinable aggregates keyed by
    fingerprint (16 B) and (fingerprint, shard); their 1-row totals
    cross-join. No join back to the corpus, no pair explosion — the
    dup-group census IS the answer."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        normalized_fp(F.col("text")).alias("fingerprint"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 16
        ).alias("shard"),
    )
    per_fp_shard = base.groupBy("fingerprint", "shard").agg(
        F.count("*").alias("c")
    )
    # r11 (guide §2.4): BOTH granularities come off the one
    # (fingerprint, shard) rollup in a single downstream pass — a
    # fingerprint-keyed window attaches the group size n and marks one
    # row per fingerprint, so ONE global aggregate yields the total,
    # the dup-group census and the within-shard term together. The old
    # shape ran the fingerprint re-rollup and the within leg as
    # separate 1-row aggregates and paid a broadcast-build job to
    # cross-join them.
    from pyspark.sql import Window as W

    wf = W.partitionBy("fingerprint").orderBy("shard")
    marked = per_fp_shard.select(
        "c",
        F.sum("c").over(
            W.partitionBy("fingerprint").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
        (F.row_number().over(wf) == 1).alias("is_first"),
    )
    tot = marked.agg(
        F.sum(F.when(F.col("is_first"), F.expr("n * (n - 1) DIV 2"))).alias(
            "total_pairs"
        ),
        F.count(
            F.when(F.col("is_first") & (F.col("n") > 1), 1)
        ).alias("n_dup_groups"),
        F.sum(F.expr("c * (c - 1) DIV 2")).alias("within_pairs"),
    )
    return tot.select(
        "n_dup_groups",
        "total_pairs",
        "within_pairs",
        (F.col("total_pairs") - F.col("within_pairs")).alias("cross_pairs"),
        F.expr(
            "CASE WHEN total_pairs = 0 THEN 0L"
            " ELSE (1000000 * (total_pairs - within_pairs)) DIV total_pairs"
            " END"
        ).alias("cross_share_fp"),
    )
