"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (this container has no image/audio libs):
``decode_image`` raises NotImplementedError unless ``fake=True``, in
which case a deterministic fake decoder (md5-seeded) produces stable
pseudo-features so the Spark-side plumbing — schema, partitioning,
mapInPandas batch shape, UDF signatures — is real and testable.

Design for scale: media bytes travel as ``binary`` columns in Arrow
batches through ``mapInPandas``; feature extraction emits fixed-width
float arrays; metadata (width/height/duration/codec) is a struct column
populated at ingest so downstream filters prune without touching bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = _FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-decoder: md5(payload) seeds a feature vector.
    Stands in for a real decode+embed until real codecs exist."""
    h = hashlib.md5(payload or b"").digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real image decoding requires PIL/opencv, absent here."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    return _fake_features(payload)


def extract_features(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
    with_checksum: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction: binary payload -> float array.

    Batch shape: input Arrow batches of (id, payload); output
    (id, feature:array<float>[, payload_md5]). Partitioning is preserved
    — no shuffle; at scale this is a map-only pass with bytes never
    leaving executors.

    ``with_checksum`` adds md5(payload) computed INSIDE the UDF — an
    oracle-recomputable witness that the Arrow plumbing delivered the
    exact bytes to Python (the driver checks it against DuckDB's md5).
    """
    fields = [
        T.StructField(id_col, T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
    if with_checksum:
        fields.append(T.StructField("payload_md5", T.StringType(), False))
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(p, fake=fake).tolist()
                for p in pdf[payload_col]
            ]
            out = {id_col: pdf[id_col], "feature": feats}
            if with_checksum:
                out["payload_md5"] = [
                    hashlib.md5(p or b"").hexdigest()
                    for p in pdf[payload_col]
                ]
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(run, out_schema)


def frame_sample_plan(
    media: DataFrame,
    every_s: float = 1.0,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (explode over a native sequence; the actual frame decode
    is the stubbed step). Demonstrates the fan-out schema."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts",
            F.explode(
                F.sequence(
                    F.lit(0.0),
                    F.coalesce(F.col("meta.duration_s"), F.lit(0.0)),
                    F.lit(every_s),
                )
            ),
        )
        .select(id_col, "frame_ts")
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation: proves filters/aggs run without
    touching payload bytes (column pruning keeps the scan narrow)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.duration_s").alias("avg_duration_s"),
        F.avg(F.octet_length("payload")).alias("avg_payload_bytes"),
    )
