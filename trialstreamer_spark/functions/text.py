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

# Frozen English stopword snapshot (the reference consults spaCy's
# nlp.Defaults.stop_words at match time, minimap.py:166-167; freezing the
# list makes matching reproducible across library versions — SURVEY §7
# hard-part 2 prescribes freezing exactly this kind of drift).
DEFAULT_STOPWORDS = frozenset(
    """a about above across after again against all almost alone along already
    also although always am among an and another any anyone anything anywhere
    are around as at back be became because become becomes been before behind
    being below between both but by can cannot could did do does doing done
    down during each either enough even ever every everyone everything
    everywhere few first for former from further had has have having he hence
    her here hers herself him himself his how however i if in into is it its
    itself just last latter least less many may me meanwhile might mine more
    moreover most mostly much must my myself namely neither never nevertheless
    next no nobody none nor not nothing now nowhere of off often on once one
    only onto or other others otherwise our ours ourselves out over own per
    perhaps please rather re same seem seemed seeming seems several she should
    since so some somehow someone something sometime sometimes somewhere still
    such than that the their them themselves then thence there thereafter
    thereby therefore therein these they this those though through throughout
    thus to together too toward towards under until up upon us used using
    various very via was we well were what whatever when whence whenever where
    whereafter whereas whereby wherein wherever whether which while whither
    who whoever whole whom whose why will with within without would yet you
    your yours yourself yourselves""".split()
)


def prepare_lexicon(
    lexicon: DataFrame, max_cuis: int = 15, min_term_chars: int = 3
) -> DataFrame:
    """minimap's lexicon-hygiene filters (minimap.py:42-56) as prep:
    drop strings mapping to more than ``max_cuis`` distinct CUIs ("too
    ambiguous... 15 from experimentation") and strings of 2 chars or
    fewer ("tends to generate nonsense CUIs"). Terms are normalized with
    the same chain applied to concept strings."""
    lex = lexicon.select(
        normalize_concept_string(F.col("term")).alias("term"), "cui"
    )
    counts = lex.groupBy("term").agg(F.countDistinct("cui").alias("n_cui"))
    return (
        lex.join(counts, "term")
        .filter(
            (F.col("n_cui") <= max_cuis) & (F.length("term") >= min_term_chars)
        )
        .drop("n_cui")
    )


def match_concepts(
    docs: DataFrame,
    lexicon: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ngram: int = 4,
    lemma_table: DataFrame | None = None,
    ignore_terms: DataFrame | None = None,
    stopwords: frozenset[str] = DEFAULT_STOPWORDS,
    max_cuis: int = 15,
    min_term_chars: int = 3,
) -> DataFrame:
    """Dictionary NER with lemma lookup, candidate filters, and greedy
    non-overlap (minimap.py:42-56, 152-201).

    1. tokenize (lowercased whitespace split — a frozen stand-in for the
       reference's spaCy tokenizer) and LEMMATIZE each token through a
       broadcast ``lemma_table`` (token → lemma, unmatched tokens pass
       through) — the frozen-lookup-table replacement for spaCy's
       lemmatizer that SURVEY §7 hard-part 2 requires, so "aneurysms"
       hits a lexicon entry "aneurysm";
    2. build n-gram windows carrying BOTH the lemma term (the join key,
       mirroring ``window_lemma in str_to_cui``) and the surface text
       (``window_text``, kept for output and the stopword check);
    3. candidate filters, per minimap: surface windows in the stopword
       set are dropped (minimap.py:166-167), windows matching the
       ``ignore_terms`` list are dropped (the ignorelist.txt anti-join),
       and the lexicon itself is pre-filtered by prepare_lexicon
       (ambiguous >``max_cuis``-CUI strings, ≤2-char strings);
    4. broadcast-join against the prepared lexicon (term → cui);
    5. greedy left-to-right non-overlap: sort candidates by
       (start, -end) per document (minimap.py:189's sort) and keep a
       match iff it starts after every kept match ends. Same-span ties
       break by cui (the reference keeps dict insertion order —
       declared deterministic divergence).

    Returns (id, term, surface, start, end, cui). Token positions are
    assembled once per document via a groupBy on the doc id; the greedy
    stage reuses that partitioning (no extra shuffle); the lexicon,
    lemma table, and ignore list are broadcast like the reference's
    in-memory dicts.
    """
    toks_arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    tok_rows = docs.select(
        F.col(id_col).alias("id"), F.posexplode_outer(toks_arr).alias("pos", "tok")
    ).where(F.col("tok").isNotNull())
    if lemma_table is not None:
        lt = F.broadcast(
            lemma_table.select(
                F.lower(F.col("token")).alias("tok"),
                F.lower(F.col("lemma")).alias("lem0"),
            )
        )
        tok_rows = tok_rows.join(lt, "tok", "left").withColumn(
            "lem", F.coalesce("lem0", "tok")
        )
    else:
        tok_rows = tok_rows.withColumn("lem", F.col("tok"))

    # n-gram windows via lead() over token order — whole-stage codegen,
    # one shuffle on the doc id (whose hash partitioning then carries
    # through the broadcast joins to the greedy stage below). A k-gram
    # starting at pos exists iff lead(·, k-1) is non-null.
    w = W.partitionBy("id").orderBy("pos")
    lead_cols = [F.col("tok").alias("tok0"), F.col("lem").alias("lem0")]
    for j in range(1, max_ngram):
        lead_cols.append(F.lead("tok", j).over(w).alias(f"tok{j}"))
        lead_cols.append(F.lead("lem", j).over(w).alias(f"lem{j}"))
    leads = tok_rows.select("id", "pos", *lead_cols)
    gram_structs = []
    for k in range(1, max_ngram + 1):
        term_k = F.concat_ws(" ", *[F.col(f"lem{j}") for j in range(k)])
        surface_k = F.concat_ws(" ", *[F.col(f"tok{j}") for j in range(k)])
        valid = F.col(f"tok{k - 1}").isNotNull() if k > 1 else F.lit(True)
        gram_structs.append(
            F.when(
                valid,
                F.struct(
                    term_k.alias("term"),
                    surface_k.alias("surface"),
                    (F.col("pos") + 1).cast("int").alias("start"),
                    (F.col("pos") + k).cast("int").alias("end"),
                ),
            )
        )
    cands = (
        leads.select("id", F.explode(F.array(*gram_structs)).alias("g"))
        .where(F.col("g").isNotNull())
        .select("id", "g.term", "g.surface", "g.start", "g.end")
    )
    if stopwords:
        cands = cands.filter(~F.col("surface").isin(*sorted(stopwords)))
    if ignore_terms is not None:
        cands = cands.join(
            F.broadcast(
                ignore_terms.select(F.lower(F.col("term")).alias("term"))
            ),
            "term",
            "left_anti",
        )
    cands = cands.join(
        F.broadcast(prepare_lexicon(lexicon, max_cuis, min_term_chars)), "term"
    ).select("id", "term", "surface", "start", "end", "cui")

    # Greedy left-to-right non-overlap is a sequential scan over the
    # per-document candidate list (a running max over *kept* rows — not
    # expressible as a window over all earlier rows, since a dropped long
    # candidate must not mask later ones). One mapInPandas pass over
    # id-partitioned, (start, -end, cui)-sorted candidates — per-partition
    # Python, NOT per-group (5000 tiny FlatMapGroups calls measured ~20×
    # slower); the repartition reuses the window's id partitioning.
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    sorted_cands = cands.repartition(n_parts, "id").sortWithinPartitions(
        "id", F.col("start"), F.col("end").desc(), "cui"
    )

    def greedy_scan(batches):
        import pandas as pd

        state = {"id": None, "border": 0}
        for pdf in batches:
            keep = []
            ids = pdf["id"].to_numpy()
            starts = pdf["start"].to_numpy()
            ends = pdf["end"].to_numpy()
            for i in range(len(pdf)):
                if ids[i] != state["id"]:
                    state["id"] = ids[i]
                    state["border"] = 0
                if starts[i] > state["border"]:
                    keep.append(i)
                    state["border"] = int(ends[i])
            yield pdf.iloc[keep] if keep else pdf.iloc[0:0]

    return sorted_cands.mapInPandas(
        greedy_scan,
        schema="id long, term string, surface string, start int, end int, cui string",
    )


def unique_concepts(matches: DataFrame) -> DataFrame:
    """get_unique_terms (minimap.py:204-217): one row per (id, cui),
    keeping the first match in reading order (start asc, end desc) and
    dropping the span columns, as the reference does before storing."""
    w = W.partitionBy("id", "cui").orderBy(F.col("start"), F.col("end").desc())
    return (
        matches.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "cui", "term")
    )
