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
safety_test_parse dry-run mode). Deployments inject
``functions.rest_annotator.RESTAnnotator`` — the real queue/poll/report
client — through the same ``annotator=`` parameter.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# classify() boundary (reference pubmed.py:348-389): rct_bot + human_bot
ANNOTATION_SCHEMA = (
    "pmid string, clf_type string, clf_score float, rct_probability float, "
    "is_human boolean"
)

# annotate_rcts boundary (reference pubmed.py:561-635: pico_span_bot,
# sample_size_bot, bias_ab_bot, punchline_bot) — exactly the
# pubmed_annotations table shape (schemas.PUBMED_ANNOTATIONS,
# ref dbutil.py:74-90)
_MESH_DDL = (
    "array<struct<cui:string,mesh_ui:string,mesh_term:string,cui_str:string>>"
)
PICO_ANNOTATION_SCHEMA = (
    "pmid string, population array<string>, interventions array<string>, "
    "outcomes array<string>, "
    f"population_mesh {_MESH_DDL}, interventions_mesh {_MESH_DDL}, "
    f"outcomes_mesh {_MESH_DDL}, "
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
        """classify() analog — rct_bot score/model + human_bot flag."""
        out = []
        for r in pdf.itertuples(index=False):
            key = str(r.pmid)
            unit = _unit_hash(key, "clf")
            # calibrated-scale score: [-1, 5) spans every published cutoff
            score = unit * 6.0 - 1.0
            out.append(
                {
                    "pmid": key,
                    "clf_type": (
                        "svm_cnn_ptyp" if _unit_hash(key, "mdl") < 0.5 else "svm_cnn"
                    ),
                    "clf_score": score,
                    "rct_probability": unit,
                    "is_human": _unit_hash(key, "hum") < 0.9,
                }
            )
        return pd.DataFrame(out)

    def annotate_pico(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """annotate_rcts analog (pico/sample-size/bias/punchline bots) —
        one pubmed_annotations-shaped row per article. The population
        concept list always carries the COVID concept the covid19 query
        filters on (mesh_ui C000657245) so fixture warehouses exercise
        that leg end to end."""

        def mesh_entry(key: str, field: str) -> dict:
            tag = _unit_hash(key, f"mesh-{field}")
            return {
                "cui": f"C{int(tag * 1e6):06d}",
                "mesh_ui": f"D{int(tag * 1e6):06d}",
                "mesh_term": f"{field} concept {int(tag * 10)}",
                "cui_str": f"{field} concept {int(tag * 10)}",
            }

        covid = {
            "cui": "TS-COV19",
            "mesh_ui": "C000657245",
            "mesh_term": "COVID-19",
            "cui_str": "covid 19",
        }
        out = []
        for r in pdf.itertuples(index=False):
            key = str(r.pmid)
            n_rand = int(_unit_hash(key, "n") * 5000) + 10
            # sample-size guard (pubmed.py:611-613): >1e6 or 'not found' → null
            out.append(
                {
                    "pmid": key,
                    "population": [f"population span for {key}"],
                    "interventions": [f"intervention span for {key}"],
                    "outcomes": [f"outcome span for {key}"],
                    "population_mesh": [mesh_entry(key, "population"), covid],
                    "interventions_mesh": [mesh_entry(key, "interventions")],
                    "outcomes_mesh": [mesh_entry(key, "outcomes")],
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


def annotate_pico_articles(articles: DataFrame, annotator=None) -> DataFrame:
    """PICO annotation boundary (ref pubmed.py:561-635): Arrow batches
    through the pico/sample-size/bias/punchline bots, emitting rows in
    the pubmed_annotations schema."""
    annotator = annotator or DeterministicStubAnnotator()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield annotator.annotate_pico(pdf)

    return articles.select("pmid", "title", "abstract_plaintext").mapInPandas(
        run, schema=PICO_ANNOTATION_SCHEMA
    )


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
    articles: DataFrame, done: DataFrame, annotator=None, pico: bool = False
) -> DataFrame:
    """Anti-join the already-annotated set, then annotate only the rest
    (ref pubmed.py:586-602 annotate_rcts to-do selection, F15). With
    ``pico=True`` the rest flows through the PICO boundary (the
    annotate_rcts case); otherwise the classifier boundary."""
    todo = articles.join(
        F.broadcast(done.select("pmid").distinct()), "pmid", "left_anti"
    )
    if pico:
        return annotate_pico_articles(todo, annotator)
    return annotate_articles(todo, annotator)
