"""Pluggable ML annotation: the external-model boundary (RobotReviewer
REST at reference pubmed.py:320-345; SciBERT embeddings at
PICO_BERT.py:32-152) as an ``Annotator`` interface over Arrow-batched
``mapInPandas``.

The reference POSTs batches of 5000 articles to a GPU service and polls;
the Spark shape is: each partition's Arrow batch is one model request, so
batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
and parallelism by partition count — the cluster amortizes the model the
same way the reference's batching did, but with as many concurrent
streams as there are executors.

Tests and this container (no model, no network) use
``DeterministicStubAnnotator`` — md5-seeded scores/spans/embeddings with
the exact production schema, so the pipeline around the model boundary
is fully exercised (the same trick as the reference's
safety_test_parse dry-run mode).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANNOTATION_SCHEMA = (
    "pmid string, clf_type string, clf_score float, rct_probability float, "
    "num_randomized int, prob_low_rob float, punchline_text string, "
    "effect string"
)

EMBEDDING_DIM = 64


def _unit_hash(key: str, salt: str) -> float:
    """Deterministic [0,1) float from md5 — the stub's 'model'."""
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    return int(h[:12], 16) / float(16**12)


class DeterministicStubAnnotator:
    """Stands in for the RobotReviewer service (pubmed.py:320-345).

    Emits what the real service returns — a model type (``clf_type``,
    hash-picked between the ptyp-aware and plain ensembles, mirroring
    the reference's ``pred["rct_bot"]["model"]``) and a calibrated-scale
    score spanning the real threshold range. The is_rct_* flags are NOT
    the stub's job: they are applied downstream from the calibration
    config (functions/calibration.py), exactly like reference
    pubmed.py:348-389 applies rct_model_calibration.json."""

    def annotate(self, pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in pdf.itertuples(index=False):
            key = str(r.pmid)
            unit = _unit_hash(key, "clf")
            # calibrated-scale score: [-1, 5) spans every published cutoff
            score = unit * 6.0 - 1.0
            n_rand = int(_unit_hash(key, "n") * 5000) + 10
            # sample-size guard (pubmed.py:611-613): >1e6 or 'not found' → null
            out.append(
                {
                    "pmid": key,
                    "clf_type": (
                        "svm_cnn_ptyp" if _unit_hash(key, "mdl") < 0.5 else "svm_cnn"
                    ),
                    "clf_score": score,
                    "rct_probability": unit,
                    "num_randomized": None if n_rand > 1_000_000 else n_rand,
                    "prob_low_rob": _unit_hash(key, "rob"),
                    "punchline_text": f"punchline for {key}",
                    "effect": ["significant-benefit", "no-diff", "significant-harm"][
                        int(_unit_hash(key, "eff") * 3)
                    ],
                }
            )
        return pd.DataFrame(out)

    def embed(self, texts: pd.Series, keys: pd.Series) -> pd.Series:
        return keys.map(
            lambda k: [
                _unit_hash(str(k), f"dim{d}") * 2 - 1 for d in range(EMBEDDING_DIM)
            ]
        )


def annotate_articles(articles: DataFrame, annotator=None, calibration=None) -> DataFrame:
    """Model boundary: one Arrow batch per request. Keys ride through the
    annotator (never positional zip — SURVEY J5): the output carries pmid
    so downstream joins are key-based. The is_rct_* flags come from the
    calibration config (F19: per-model precise/balanced/sensitive cutoffs
    over the calibrated score — reference pubmed.py:382-387), applied as
    constant-folded column expressions after the model call."""
    from trialstreamer_spark.functions.calibration import apply_thresholds

    annotator = annotator or DeterministicStubAnnotator()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield annotator.annotate(pdf)

    raw = articles.select("pmid", "title", "abstract_plaintext").mapInPandas(
        run, schema=ANNOTATION_SCHEMA
    )
    return apply_thresholds(raw, calibration)


def embed_articles(articles: DataFrame, annotator=None) -> DataFrame:
    """SciBERT-embedding analog (G7): pandas-UDF batch inference with a
    deterministic stub encoder; real deployments swap the annotator."""
    annotator = annotator or DeterministicStubAnnotator()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    {
                        "pmid": pdf["pmid"],
                        "embedding": annotator.embed(
                            pdf["abstract_plaintext"], pdf["pmid"]
                        ),
                    }
                )

    return articles.select("pmid", "abstract_plaintext").mapInPandas(
        run, schema="pmid string, embedding array<float>"
    )


def incremental_annotate(
    articles: DataFrame, done: DataFrame, annotator=None
) -> DataFrame:
    """Anti-join the already-annotated set, then annotate only the rest
    (ref pubmed.py:586-602 annotate_rcts to-do selection, F15)."""
    todo = articles.join(
        F.broadcast(done.select("pmid").distinct()), "pmid", "left_anti"
    )
    return annotate_articles(todo, annotator)
