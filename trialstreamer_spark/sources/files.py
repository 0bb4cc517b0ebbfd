"""Source-file hygiene operators (SURVEY S3, S6, A5, X7, X12): md5
sidecar validation, filename-encoded dates, newest-file selection.

The reference runs these driver-side per file (pubmed.py:209-299 md5,
399-404 baseline vintage; ictrp.py:55-62 ISO-week filenames, 270-286
newest pick). Here they are DataFrame jobs: validation is a binaryFile
scan + md5 builtin + sidecar join — embarrassingly parallel, one task
per file, so a 100 TB landing dir validates at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class Md5Mismatch(Exception):
    pass


def read_md5_sidecars(spark: SparkSession, glob: str) -> DataFrame:
    """``<file>.md5`` sidecars → (path, expected_md5). NCBI sidecar body
    is ``MD5(<name>)= <hex>`` (pubmed.py:289-294) — the trailing hex
    token is the digest."""
    raw = spark.read.text(glob, wholetext=True).withColumn(
        "md5_path", F.input_file_name()
    )
    return raw.select(
        _norm_path(F.regexp_replace("md5_path", r"\.md5$", "")).alias("path"),
        F.regexp_extract("value", r"([0-9a-f]{32})\s*$", 1).alias("expected_md5"),
    )


def _norm_path(p: Column) -> Column:
    """binaryFile renders local paths as ``file:/x`` while
    input_file_name gives ``file:///x`` — normalize the scheme so the
    sidecar join keys agree."""
    return F.regexp_replace(p, r"^file:/+", "/")


def validate_md5(
    spark: SparkSession, data_glob: str, md5_glob: str, raise_on_mismatch: bool = True
) -> DataFrame:
    """Pre-flight integrity check (S3/X12): hash every landed file with
    the md5 builtin, join its sidecar, flag mismatches (missing sidecar
    counts as a mismatch, matching the reference's raise at
    pubmed.py:296-299)."""
    files = (
        spark.read.format("binaryFile")
        .load(data_glob)
        .select(
            _norm_path(F.col("path")).alias("path"),
            F.md5(F.col("content")).alias("actual_md5"),
        )
    )
    checked = files.join(
        F.broadcast(read_md5_sidecars(spark, md5_glob)), "path", "left"
    ).withColumn(
        "ok",
        F.col("expected_md5").isNotNull()
        & (F.col("expected_md5") == F.col("actual_md5")),
    )
    if raise_on_mismatch:
        bad = checked.filter(~F.col("ok")).select("path").limit(5).collect()
        if bad:
            raise Md5Mismatch(f"md5 mismatch: {[r.path for r in bad]}")
    return checked


def baseline_vintage_date(filename: Column) -> Column:
    """PubMed baseline filename → vintage date (X7, pubmed.py:399-404):
    ``pubmed26n....`` → year 2026 → Dec 31 of the PRIOR year."""
    yy = F.regexp_extract(filename, r"pubmed(\d{2})n", 1)
    return F.make_date(
        (F.concat(F.lit("20"), yy)).cast("int") - 1, F.lit(12), F.lit(31)
    )


def ictrp_week_date(filename: Column) -> Column:
    """ICTRP export filename → date of its ISO week's Monday (S6,
    ictrp.py:55-62: ``ICTRPWeek<DD><Month><YYYY>``-style names carry a
    week; the reference parses the embedded date). Files here carry
    ``YYYY-Www`` or ``<year>W<week>``; compute Monday of ISO week w:
    Jan 4 is always in week 1, so Monday(w) = Jan4 − isodow(Jan4) + 1
    + 7·(w−1). Week-based to_date patterns were removed in Spark 3, so
    this stays arithmetic."""
    year = F.regexp_extract(filename, r"(\d{4})", 1).cast("int")
    week = F.regexp_extract(filename, r"[Ww](\d{1,2})", 1).cast("int")
    jan4 = F.make_date(year, F.lit(1), F.lit(4))
    # ISO dow: Monday=1..Sunday=7; Spark dayofweek: Sunday=1..Saturday=7
    isodow = ((F.dayofweek(jan4) + 5) % 7) + 1
    return F.date_add(jan4, (-(isodow - 1) + (week - 1) * 7).cast("int"))


def newest_file(listing: DataFrame, date_col: str = "source_date") -> DataFrame:
    """Newest-candidate pick (A5, ictrp.py:270-286 / ictrp_csv.py:294-310):
    sort by parsed date desc, keep one row."""
    return listing.orderBy(F.col(date_col).desc()).limit(1)
