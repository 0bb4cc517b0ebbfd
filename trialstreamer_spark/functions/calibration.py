"""RCT classifier calibration config (SURVEY F19/X14).

The reference ships ``trialstreamer/data/rct_model_calibration.json`` —
per-model decision thresholds (precise / balanced / sensitive), z-scale
parameters + ensemble weights for the base models, and a model-choice
table — and consumes it in ``classify()`` (reference pubmed.py:348-389):
the ``svm_cnn_ptyp`` thresholds apply when the prediction came from the
ptyp-aware ensemble, the ``svm_cnn`` thresholds otherwise, and each
``is_rct_{precise,balanced,sensitive}`` flag is
``clf_score >= threshold``.

Here the config is a broadcast-friendly plain dict: ``load_calibration``
accepts a JSON file path or an already-parsed mapping and validates the
shape; ``apply_thresholds`` builds the three boolean flag columns as
pure column expressions (a CASE over the model type — no UDF, constant-
folded by Catalyst since thresholds are literals). ``DEFAULT_CALIBRATION``
carries the reference's published calibration values so the engine
reproduces its cutoffs out of the box.

The scales section (z-scale + weighted ensemble) is applied inside the
external model service in the reference (X14); ``zscale_col`` /
``ensemble_score_col`` expose the same transform for pipelines that
ingest raw base-model scores.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

THRESHOLD_TYPES = ("precise", "balanced", "sensitive")

# Published calibration values (RobotReviewer RCT model calibration
# 2019-01-25), the same numbers the reference's JSON ships.
DEFAULT_CALIBRATION: dict = {
    "thresholds": {
        "svm": {
            "precise": 1.9237300404146498,
            "sensitive": 0.0691768267655864,
            "balanced": 1.1214599554550992,
        },
        "cnn": {
            "precise": 2.3723952770233154,
            "sensitive": -0.00806331296917051,
            "balanced": 1.8000659942626953,
        },
        "svm_cnn": {
            "precise": 2.1089724394656733,
            "sensitive": 0.059092738155457056,
            "balanced": 1.6498606653424648,
        },
        "svm_ptyp": {
            "precise": 3.788363871603371,
            "sensitive": 0.42413795826103085,
            "balanced": 1.8950514131415008,
        },
        "cnn_ptyp": {
            "precise": 3.5229593361830256,
            "sensitive": 0.22784171952958307,
            "balanced": 2.2217181767439387,
        },
        "svm_cnn_ptyp": {
            "precise": 3.7070634945154053,
            "sensitive": 0.11009816065822994,
            "balanced": 2.1057231048584675,
        },
    },
    "scales": {
        "cnn": {"mean": 0.1559281161105426, "std": 0.22405916984696986, "weight": 0.25},
        "ptyp": {"mean": 0.05515553289138195, "std": 0.22828359573751594, "weight": 1.0},
        "svm": {"mean": -0.7548140352548589, "std": 0.7812955939364481, "weight": 1.0},
    },
    "model_choice": {
        "non_ptyp": {"precise": "svm_cnn", "sensitive": "svm_cnn", "balanced": "svm_cnn"},
        "ptyp": {"precise": "svm_cnn", "sensitive": "svm", "balanced": "svm_cnn"},
    },
}


@dataclass(frozen=True)
class Calibration:
    """Validated calibration config (thresholds keyed model → type)."""

    thresholds: Mapping[str, Mapping[str, float]]
    scales: Mapping[str, Mapping[str, float]]
    model_choice: Mapping[str, Mapping[str, str]]

    def threshold(self, model: str, threshold_type: str) -> float:
        return float(self.thresholds[model][threshold_type])


def load_calibration(source: str | Mapping | None = None) -> Calibration:
    """Load + validate calibration config from a JSON file path, an
    already-parsed mapping, or (None) the shipped defaults — the loader
    counterpart of the reference's module-level
    ``json.load(open(...rct_model_calibration.json))``."""
    if source is None:
        raw: Mapping = DEFAULT_CALIBRATION
    elif isinstance(source, (str, bytes)):
        with open(source) as fh:
            raw = json.load(fh)
    else:
        raw = source
    thresholds = raw.get("thresholds")
    if not thresholds:
        raise ValueError("calibration config missing 'thresholds'")
    for model, cuts in thresholds.items():
        missing = [t for t in THRESHOLD_TYPES if t not in cuts]
        if missing:
            raise ValueError(f"thresholds[{model!r}] missing {missing}")
    return Calibration(
        thresholds={m: dict(c) for m, c in thresholds.items()},
        scales={k: dict(v) for k, v in raw.get("scales", {}).items()},
        model_choice={k: dict(v) for k, v in raw.get("model_choice", {}).items()},
    )


def threshold_flag_col(
    clf_type: Column, clf_score: Column, threshold_type: str, calib: Calibration
) -> Column:
    """``is_rct_<type>`` as a CASE over the model type (reference
    pubmed.py:382-387): svm_cnn_ptyp rows use the ptyp thresholds,
    svm_cnn rows the non-ptyp ones; any other model yields NULL — the
    reference emits no flag at all for those rows."""
    return (
        F.when(
            clf_type == "svm_cnn_ptyp",
            clf_score >= F.lit(calib.threshold("svm_cnn_ptyp", threshold_type)),
        )
        .when(
            clf_type == "svm_cnn",
            clf_score >= F.lit(calib.threshold("svm_cnn", threshold_type)),
        )
        .otherwise(F.lit(None).cast("boolean"))
    )


def apply_thresholds(
    df: DataFrame,
    calib: Calibration | None = None,
    type_col: str = "clf_type",
    score_col: str = "clf_score",
) -> DataFrame:
    """Add the three is_rct_* flag columns from broadcast config."""
    calib = calib or load_calibration()
    out = df
    for tt in THRESHOLD_TYPES:
        out = out.withColumn(
            f"is_rct_{tt}",
            threshold_flag_col(F.col(type_col), F.col(score_col), tt, calib),
        )
    return out


def zscale_col(raw_score: Column, base_model: str, calib: Calibration) -> Column:
    """z-scale one base model's raw score: (s - mean) / std (X14)."""
    s = calib.scales[base_model]
    return (raw_score - F.lit(float(s["mean"]))) / F.lit(float(s["std"]))


def ensemble_score_col(
    raw_scores: Mapping[str, Column], calib: Calibration
) -> Column:
    """Weight-averaged ensemble of z-scaled base scores over the listed
    bases: Σ wᵢ·zᵢ / Σ wᵢ (X14 — the scales/weights half of the config,
    applied service-side in the reference)."""
    total_w = sum(float(calib.scales[b]["weight"]) for b in raw_scores)
    acc: Column | None = None
    for base, col in raw_scores.items():
        term = zscale_col(col, base, calib) * F.lit(
            float(calib.scales[base]["weight"])
        )
        acc = term if acc is None else acc + term
    assert acc is not None, "ensemble over zero bases"
    return acc / F.lit(total_w)
