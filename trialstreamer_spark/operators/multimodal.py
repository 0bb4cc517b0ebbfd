"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched mapInPandas stages.

North-star extension (not in the reference, which is text-only): a
100 TB training-data pipeline carries media columns through the same
tables. Design:

- media rows are ``(id, modality, content binary, meta struct)`` —
  binary stays opaque to Catalyst (no codec in the JVM path), metadata
  is typed so filters on (modality, width, sample_rate, duration) prune
  BEFORE any decode;
- decode / feature-extract / resize / frame-sample run as mapInPandas
  over Arrow batches — one decoder init per batch, zero-copy binary
  transfer;
- the actual codecs (PIL/libav) are NOT in this container, so the
  decode step is pluggable: production injects a real decoder, tests a
  deterministic fake. The Spark plumbing — schema, batch shape,
  partitioning, pushdown-friendly metadata — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = "media_id long, modality string, n_bytes int, feature array<float>"


def real_decoder(content: bytes, modality: str) -> list[float]:  # pragma: no cover
    """Production decode+featurize. Requires PIL/torchaudio/av — not in
    this container by design."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; inject a decoder"
    )


def fake_decoder(content: bytes, modality: str) -> list[float]:
    """Deterministic stand-in: 8 md5-derived floats. Same signature and
    output shape as real_decoder, so the pipeline is swap-tested."""
    h = hashlib.md5(content).hexdigest()
    return [int(h[i * 4 : i * 4 + 4], 16) / 65535.0 for i in range(8)]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = fake_decoder,
    modality: str | None = None,
) -> DataFrame:
    """Decode+featurize as a mapInPandas stage. The modality filter and
    any metadata predicates apply BEFORE this stage so only matching
    rows' binary ever crosses the Arrow boundary."""
    df = media if modality is None else media.filter(F.col("modality") == modality)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(len),
                    "feature": [
                        decoder(bytes(c), m)
                        for c, m in zip(pdf["content"], pdf["modality"])
                    ],
                }
            )

    return df.select("media_id", "modality", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp,
    computed from metadata only (duration_ms) — the expensive decode is
    deferred to extract_features on the exploded rows. Explode is narrow;
    no shuffle until a downstream aggregate."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
        "content",
    )
