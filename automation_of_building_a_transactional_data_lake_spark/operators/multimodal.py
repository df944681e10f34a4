"""Multimodal (image/audio/video) column plumbing.

Not in the reference's surface — added for large-scale training-data
pipelines. Media travel as opaque ``binary`` columns beside typed
metadata; per-item work (decode, resize, frame-sample, feature
extraction) runs in Arrow-batched ``mapInPandas`` so Python touches
data once per batch, never per row.

The decode step itself is STUBBED in this environment (no image/audio
codecs are installed): ``decoder="fake"`` produces deterministic
pseudo-decodes (byte-level stats standing in for pixel stats) so the
Spark-side contract — schemas, batch iteration, partitioning, column
pruning — is real and testable; ``decoder="pil"``-style real backends
raise ``NotImplementedError`` with a clear message until their
libraries exist on the executors.

Scale notes:
- ``mapInPandas`` with ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds executor memory per batch — binary payloads never accumulate.
- The media schema keeps metadata columns OUTSIDE the binary blob so
  filters/projections prune at the parquet scan without touching bytes.
- Feature extraction emits fixed-width columns (schema declared up
  front) — downstream joins/aggregations stay fully columnar.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical media-item schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_mean", DoubleType(), True),
        StructField("byte_std", DoubleType(), True),
        StructField("payload_hash", LongType(), True),
    ]
)

Decoder = Literal["fake", "pil", "ffmpeg"]


def media_frame(spark, rows) -> DataFrame:
    """Build a media DataFrame with the canonical schema."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame,
    decoder: Decoder = "fake",
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-item feature extraction over the binary payload via
    Arrow-batched ``mapInPandas``. With ``decoder='fake'`` the
    "decode" is a deterministic byte-level summary (length, mean, std,
    xxhash-style rolling hash) — the stand-in keeps the whole dataflow
    executable; real decoders plug in behind the same signature."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r} requires media codec libraries not present "
            "in this environment; use decoder='fake' for the deterministic stub"
        )

    pruned = media.select(id_col, payload_col)

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "n_bytes": [], "byte_mean": [], "byte_std": [],
                   "payload_hash": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                out["media_id"].append(mid)
                if payload is None:
                    out["n_bytes"].append(0)
                    out["byte_mean"].append(0.0)
                    out["byte_std"].append(0.0)
                    out["payload_hash"].append(0)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                out["n_bytes"].append(int(arr.size))
                out["byte_mean"].append(float(arr.mean()) if arr.size else 0.0)
                out["byte_std"].append(float(arr.std()) if arr.size else 0.0)
                # Deterministic rolling hash (polynomial, mod 2^61-1).
                h = 0
                for b in arr[:4096].tolist():  # cap: hash the head
                    h = (h * 131 + b) % 2305843009213693951
                out["payload_hash"].append(h)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (0, every_ms, 2*every_ms, ... < duration_ms).
    The timestamps come from a JVM-side ``sequence``/``explode`` — only
    the (stubbed) frame decode would need Python."""
    vids = media.filter(F.col("kind") == "video").filter(F.col("duration_ms").isNotNull())
    ts = F.sequence(F.lit(0).cast("long"), F.col("duration_ms") - 1, F.lit(every_ms).cast("long"))
    return vids.select(id_col, F.explode(ts).alias("frame_ts_ms"))
