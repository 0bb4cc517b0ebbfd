"""Text operators: Schwartz-Hearst abbreviation extraction, minimap-style
concept-string normalization, and dictionary NER (concept matching).

References into /root/reference/ for behavior parity:
- Schwartz-Hearst: trialstreamer/schwartz_hearst.py:49-297 (the
  published Schwartz & Hearst 2003 algorithm; reimplemented here from
  the paper's rules — candidate window, char back-matching, the
  min(|A|+5, |A|*2) definition-length constraint).
- Normalization: trialstreamer/minimap.py:59-145 (parenthetical removal,
  hyphen→space, possessive/NOS strip, syntactic uninversion guarded by a
  preposition list, whitespace collapse).
- Concept matcher: trialstreamer/minimap.py:152-201 (sliding windows
  longest-first over lemmas against a string→CUI dict, then greedy
  left-to-right non-overlap).

Spark shapes:
- normalization is pure column expressions (codegen, no Python);
- Schwartz-Hearst is inherently sequential per document → Arrow-batched
  pandas UDF returning map<string,string>; at query time the reference
  runs it per result row (≤250), here it precomputes into the
  annotations table (SURVEY §3.1 note);
- the concept matcher is explode n-grams → broadcast join lexicon →
  window-based greedy non-overlap — all JVM-side; the lexicon rides a
  broadcast join like the reference's in-memory dict.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Schwartz-Hearst
# ---------------------------------------------------------------------------


def _valid_short_form(cand: str) -> bool:
    # 2..10 chars, ≤2 tokens, starts alnum, contains a letter
    return (
        2 <= len(cand) <= 10
        and len(cand.split()) <= 2
        and cand[0].isalnum()
        and any(c.isalpha() for c in cand)
    )


def _best_long_form(short: str, candidate: str) -> str | None:
    """Back-match: every char of the short form (case-insensitive) must
    appear in order in the long form; the char matching the short form's
    first char must start a word."""
    s_idx = len(short) - 1
    l_idx = len(candidate) - 1
    while s_idx >= 0:
        c = short[s_idx].lower()
        if not c.isalnum():
            s_idx -= 1
            continue
        while l_idx >= 0 and (
            candidate[l_idx].lower() != c
            or (s_idx == 0 and l_idx > 0 and candidate[l_idx - 1].isalnum())
        ):
            l_idx -= 1
        if l_idx < 0:
            return None
        s_idx -= 1
        l_idx -= 1
    long_form = candidate[l_idx + 1 :].strip()
    # length constraint from the paper: |definition| ≤ min(|A|+5, |A|*2) words
    n_words = len(long_form.split())
    if n_words > min(len(short) + 5, len(short) * 2):
        return None
    if not long_form or long_form.lower() == short.lower():
        return None
    return long_form


_PAREN_RE = re.compile(r"\(([^()]{1,60})\)")


def extract_abbreviation_pairs(text: str | None) -> dict[str, str]:
    """{short_form: long_form} pairs from one document."""
    if not text:
        return {}
    out: dict[str, str] = {}
    for m in _PAREN_RE.finditer(text):
        short = m.group(1).strip()
        if not _valid_short_form(short):
            continue
        # definition window: up to min(|A|+5, |A|*2) words left of '('
        prefix = text[: m.start()].rstrip()
        words = prefix.split()
        window = words[-min(len(short) + 5, len(short) * 2) :]
        if not window:
            continue
        long_form = _best_long_form(short, " ".join(window))
        if long_form:
            out[short] = long_form
    return out


@F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
def abbreviations_udf(texts: pd.Series) -> pd.Series:
    return texts.map(extract_abbreviation_pairs)


# ---------------------------------------------------------------------------
# minimap-style normalization (column expressions)
# ---------------------------------------------------------------------------

_PREPOSITIONS = (
    "about against and as at by for from in of on or to with without".split()
)


def normalize_concept_string(c: Column) -> Column:
    """minimap.py:59-145 normalization chain as column expressions:
    lowercase → parentheticals removed → hyphen→space → possessive strip
    → ', NOS'/' NOS' strip → syntactic uninversion ('aneurysm, ruptured'
    → 'ruptured aneurysm', skipped when either side contains a
    preposition/conjunction) → whitespace collapse."""
    s = F.lower(c)
    s = F.regexp_replace(s, r"^\([^)]*\)\s*", "")  # leading parenthetical
    s = F.regexp_replace(s, r"\s*\([^)]*\)\s*$", "")  # trailing parenthetical
    s = F.regexp_replace(s, "-", " ")
    s = F.regexp_replace(s, r"'s\b", "")
    s = F.regexp_replace(s, r",? nos$", "")
    # uninversion: "<head>, <mod>" with no prepositions on either side
    head = F.regexp_extract(s, r"^([^,]+), ([^,]+)$", 1)
    mod = F.regexp_extract(s, r"^([^,]+), ([^,]+)$", 2)
    prep_arr = F.array(*[F.lit(p) for p in _PREPOSITIONS])
    has_prep = (
        F.arrays_overlap(F.split(head, " "), prep_arr)
        | F.arrays_overlap(F.split(mod, " "), prep_arr)
    )
    s = F.when(
        (head != "") & (mod != "") & ~has_prep, F.concat(mod, F.lit(" "), head)
    ).otherwise(s)
    return F.trim(F.regexp_replace(s, r"\s+", " "))


# ---------------------------------------------------------------------------
# dictionary NER (concept matcher)
# ---------------------------------------------------------------------------


def match_concepts(
    docs: DataFrame,
    lexicon: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ngram: int = 4,
) -> DataFrame:
    """Dictionary NER with greedy non-overlap (minimap.py:152-201).

    1. explode token n-grams (longest window first is encoded in the
       greedy sort, so generation order doesn't matter) with start/end
       token offsets — narrow;
    2. broadcast-join against the lexicon (term → cui), term pre-
       normalized on both sides;
    3. greedy left-to-right non-overlap: sort candidates by
       (start, -end) per document (minimap.py:189's sort) and keep a
       match iff no kept match overlaps it — expressed as a running
       max-end window: a candidate survives if every earlier candidate
       (in sort order) ends before it starts.

    Returns (id, cui, term, start, end). The window shuffles on the doc
    id — the natural partition key; the lexicon is broadcast like the
    reference's in-memory dict.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    grams = F.flatten(
        F.array(
            *[
                F.when(
                    n >= k,
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
                        lambda i: F.struct(
                            F.concat_ws(" ", F.slice(toks, i, k)).alias("term"),
                            i.alias("start"),
                            (i + (k - 1)).alias("end"),
                        ),
                    ),
                ).otherwise(F.array())
                for k in range(1, max_ngram + 1)
            ]
        )
    )
    cands = (
        docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .select("id", "g.term", "g.start", "g.end")
        .join(
            F.broadcast(
                lexicon.select(
                    normalize_concept_string(F.col("term")).alias("term"), "cui"
                )
            ),
            "term",
        )
    )
    # Greedy left-to-right non-overlap is a sequential scan over the
    # per-document candidate list (a running max over *kept* rows — not
    # expressible as a window over all earlier rows, since a dropped long
    # candidate must not mask later ones). Candidates per document are
    # few (only lexicon hits), so applyInPandas per doc id is cheap; the
    # shuffle key is the doc id either way.
    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["start", "end", "cui"], ascending=[True, False, True]
        )
        kept, max_end = [], 0
        for row in pdf.itertuples(index=False):
            if row.start > max_end:
                kept.append(row)
                max_end = row.end
        return pd.DataFrame(kept, columns=pdf.columns) if kept else pdf.iloc[0:0]

    return cands.groupBy("id").applyInPandas(
        greedy, schema="term string, id long, start int, end int, cui string"
    )
