"""Mendeley DOI-lookup support (reference trialstreamer/mendeley.py).

The network call (Mendeley catalog REST, mendeley.py:42-45) stays an
external fetcher behind the Annotator-style boundary; what the engine
owns is:

- the DOI cleaner (X8, mendeley.py:21-39) as pure column expressions —
  no BeautifulSoup, no per-row Python;
- the incremental to-do selection (U2/F15, mendeley.py:70-87):
  flagged articles without DOIs minus already-looked-up pmids, as a
  left-anti join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DOI_RE = r"(10\.\d{4,9}/[-._;()/:A-Za-z0-9]+)"


def doi_clean_col(raw: Column) -> Column:
    """DOI normalization (mendeley.py:21-39) as a when-chain:

    1. ``<a href=...>`` markup → the href value (the reference uses
       BeautifulSoup; an anchored regexp is equivalent for this shape);
    2. http(s) URL → its path without the leading slash;
    3. anything not starting with ``10.`` → first embedded DOI-shaped
       substring, else NULL.
    """
    href = F.regexp_extract(raw, r'href="([^"]*)"', 1)
    unwrapped = F.when(raw.startswith("<a "), href).otherwise(raw)
    path = F.regexp_extract(unwrapped, r"^https?://[^/]*/(.*)$", 1)
    unurled = F.when(unwrapped.startswith("http"), path).otherwise(unwrapped)
    extracted = F.regexp_extract(unurled, _DOI_RE, 1)
    return F.when(unurled.startswith("10."), unurled).otherwise(
        F.when(extracted != "", extracted).otherwise(F.lit(None))
    )


def todo_pmids(
    pubmed: DataFrame,
    pmid_dois: DataFrame,
    limit_to: str = "is_rct_balanced",
) -> DataFrame:
    """Articles needing a Mendeley lookup (mendeley.py:70-87): flagged
    RCTs whose pm_data.dois is empty, minus pmids already in pmid_dois
    (set difference U2 as a left-anti join — the done side is the small
    one and broadcasts)."""
    todo = pubmed.filter(
        F.col(limit_to) & (F.size(F.col("pm_data.dois")) == 0)
    ).select("pmid")
    return todo.join(
        F.broadcast(pmid_dois.select("pmid").distinct()), "pmid", "left_anti"
    )


def clean_lookup_results(results: DataFrame) -> DataFrame:
    """(pmid, raw_doi) fetcher output → (pmid, doi) append rows for
    pmid_dois (S18); nulls kept, mirroring the reference's insert of
    failed lookups so they are not retried (mendeley.py:95-102)."""
    return results.select(
        "pmid", doi_clean_col(F.col("raw_doi")).alias("doi")
    )
