"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode kernels are
STUBS behind ``decoder=`` injection: the default raises
NotImplementedError; ``fake_image_decoder`` is a deterministic stand-in
used by tests to validate the real Spark-side plumbing — schemas,
batch shapes, partition behavior — which is what this module owns.

At 100 TB: binary payloads ride in their own column so column pruning
keeps metadata-only queries payload-free; decode fans out per
partition with Arrow batching (no per-row Python), and
``repartition(n)`` before decode controls task granularity.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = (
    # feat is double: decoders hand back python floats, and float32
    # truncation would diverge from any engine-independent oracle of
    # the same arithmetic.
    "media_id long, mime string, n_bytes int, feat array<double>, decode_ok boolean"
)


def not_implemented_decoder(payload: bytes, mime: str) -> list[float]:
    raise NotImplementedError(
        "media codecs are not available in this environment; inject a decoder"
    )


def fake_image_decoder(payload: bytes, mime: str) -> list[float]:
    """Deterministic stand-in 'feature extractor': 8 moments of the
    byte histogram. Keeps tests real without codecs."""
    if not payload:
        return [0.0] * 8
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    n = float(len(payload))
    return [c / n for c in buckets]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = not_implemented_decoder,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """payload -> feature vector via mapInPandas (Arrow batches; the
    decoder sees raw bytes, never Spark rows)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                try:
                    feats.append(decoder(bytes(payload or b""), mime))
                    oks.append(True)
                except NotImplementedError:
                    raise
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feat": feats,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode per-media frame timestamps
    (metadata-only — native, no decode). The decode of each frame is a
    downstream extract_features over (media_id, frame_ts)."""
    return media.select(
        "media_id",
        "mime",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
