"""ICTRP JSON-lines ingestion (reference trialstreamer/ictrp.py:190-301).

The reference pipes a registry export through an external parser that
emits one JSON trial per line (ictrp.py:295-301), then normalizes each
record driver-side in ``parse_ictrp`` (190-254). Spark-first shape: the
JSONL is a plain ``spark.read.json`` source with an explicit schema, and
the per-record normalization compiles to column expressions —
try/except-to-default becomes coalesce/try_cast/when, and the rule-based
classifiers are the shared column builders from sources/ictrp_csv.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trialstreamer_spark.sources.ictrp_csv import (
    cleanup_col,
    is_rct_col,
    is_recruiting_col,
    target_size_col,
)

_DESC = T.ArrayType(
    T.StructType([T.StructField("description", T.StringType())])
)

ICTRP_JSON_SCHEMA = T.StructType(
    [
        T.StructField("study_id", T.StringType()),
        T.StructField("scientific_title", T.StringType()),
        T.StructField("health_conditions", _DESC),
        T.StructField("interventions", _DESC),
        T.StructField("outcomes", _DESC),
        T.StructField("study_design", T.StringType()),
        T.StructField("recruitment_status", T.StringType()),
        T.StructField("target_size", T.StringType()),
        T.StructField("date_registered", T.StringType()),
        T.StructField("countries", T.ArrayType(T.StringType())),
    ]
)


def _descriptions(col: Column) -> Column:
    """[{description}] → trimmed strings ([] when absent,
    ictrp.py:202-214)."""
    return F.coalesce(
        F.transform(col, lambda r: F.trim(F.coalesce(r["description"], F.lit("")))),
        F.array().cast("array<string>"),
    )


def read_ictrp_json(spark: SparkSession, path: str) -> DataFrame:
    """JSONL export → normalized ictrp rows (parse_ictrp column-for-
    column: regid/ti with 'unknown' fallback, PICO description arrays,
    rule classifiers, 10-char target-size guard, strict %Y-%m-%d date
    with year derived, countries)."""
    raw = spark.read.json(path, schema=ICTRP_JSON_SCHEMA)
    # try_to_date: malformed dates → NULL (the reference's except branch
    # at ictrp.py:236-238), instead of ANSI-mode parse errors
    date_reg = F.try_to_date(F.col("date_registered"), "yyyy-MM-dd")
    return raw.filter(F.col("study_id").isNotNull()).select(
        F.col("study_id").alias("regid"),
        F.coalesce(
            F.nullif(F.trim(F.col("scientific_title")), F.lit("")),
            F.lit("unknown"),
        ).alias("ti"),
        _descriptions(F.col("health_conditions")).alias("population"),
        _descriptions(F.col("interventions")).alias("interventions"),
        _descriptions(F.col("outcomes")).alias("outcomes"),
        is_rct_col(F.col("study_design")).alias("is_rct"),
        is_recruiting_col(F.col("recruitment_status")).alias("is_recruiting"),
        target_size_col(F.col("target_size")).alias("target_size"),
        date_reg.alias("date_registered"),
        F.year(date_reg).alias("year"),
        F.coalesce(F.col("countries"), F.array().cast("array<string>")).alias(
            "countries"
        ),
    )


def with_concept_annotations(trials: DataFrame, match_fn) -> DataFrame:
    """The *_mesh enrichment hook (ictrp.py:248-252: minimap over each
    cleaned span). match_fn is the matcher boundary
    (functions.text.match_concepts at corpus scale); spans are cleaned
    with the shared cleanup normalization before matching."""
    cleaned = trials
    for f in ("population", "interventions", "outcomes"):
        cleaned = cleaned.withColumn(
            f"{f}_clean",
            F.filter(
                F.transform(F.col(f), lambda s: cleanup_col(s)),
                lambda s: s != "",
            ),
        )
    return match_fn(cleaned)
