"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition behavior,
Arrow batch shapes, UDF signatures; only the codec call is stubbed (the
container ships no image/audio libraries):

  * `MEDIA_SCHEMA` — binary payload + typed metadata struct, the shape a
    100 TB multimodal corpus table would have alongside `documents`;
  * `extract_features` — mapInPandas over Arrow batches: metadata passes
    through, features come from the pluggable codec;
  * `StubCodec` — deterministic fake: numeric features derived from the
    payload bytes (length, md5-derived pseudo-embedding), so pipelines and
    tests exercise the full path;
  * `RealCodec.decode` — raises NotImplementedError with the dependency
    story; swap in PIL/librosa per modality on a real cluster.

Batch sizing note: binary payloads dominate Arrow batch memory; cap
`spark.sql.execution.arrow.maxRecordsPerBatch` (e.g. 64) when payloads are
MB-scale so executor memory stays bounded.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("doc_id", StringType(), True),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


class RealCodec:
    """Placeholder for actual decoders; not available in this container."""

    @staticmethod
    def decode(payload: bytes, modality: str):
        raise NotImplementedError(
            "media decoding requires PIL (image) / librosa (audio) / "
            "pyav (video); install on the cluster and implement decode()"
        )


@dataclass(frozen=True)
class StubCodec:
    """Deterministic fake decoder: an 8-dim pseudo-embedding from the md5
    of the payload — stable across engines/parallelism, good enough to
    exercise schemas, joins and ANN downstream."""

    dim: int = 8

    def features(self, payload: bytes) -> List[float]:
        if payload is None:
            payload = b""
        digest = hashlib.md5(payload).digest()
        raw = np.frombuffer((digest * ((self.dim * 4) // 16 + 1))[: self.dim * 4], dtype=np.uint32)
        return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32).tolist()


def extract_features(media: DataFrame, codec: StubCodec | None = None) -> DataFrame:
    """media(MEDIA_SCHEMA) -> features(FEATURE_SCHEMA) via Arrow batches.

    The UDF signature, batch iteration and output schema are exactly what a
    real decoder needs; only `codec.features` changes.
    """
    codec = codec or StubCodec()
    spark = media.sparkSession
    bc = spark.sparkContext.broadcast(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "modality": batch["modality"],
                    "n_bytes": batch["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                    "feature": batch["payload"].map(c.features),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def _stub_bytes(seed: bytes, n: int) -> bytes:
    """Deterministic pseudo-payload of length n from an md5 stream."""
    out = bytearray()
    counter = 0
    while len(out) < n:
        out.extend(hashlib.md5(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return bytes(out[:n])


def resize_images(
    media: DataFrame, width: int, height: int, codec: StubCodec | None = None
) -> DataFrame:
    """Image resize over Arrow batches — the training-pipeline thumbnail
    stage. Plumbing (payload transform per row, metadata rewrite, batch
    memory shape) is real; the pixel work is the stubbed codec step (a
    deterministic pseudo-payload sized ~ width*height/64 stands in for
    the re-encoded image; swap in PIL on a real cluster). Only image
    rows are transformed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = max(width * height // 64, 16)
        for batch in batches:
            imgs = batch[batch["modality"] == "image"]
            yield pd.DataFrame(
                {
                    "media_id": imgs["media_id"],
                    "modality": imgs["modality"],
                    "payload": imgs["payload"].map(
                        lambda p: _stub_bytes(b"" if p is None else p, n_out)
                    ),
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — ONE input row explodes to one row per
    sampled timestamp (0, every_ms, 2*every_ms, ... < duration_ms). The
    fan-out plumbing is the real content: a video row's Arrow batch grows
    by its frame count, so callers must bound
    arrow.maxRecordsPerBatch for MB-scale payloads (module docstring).
    Frame payloads are deterministic stubs keyed by (payload, ts) — a
    real decoder (pyav) drops into the same loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            vids = batch[batch["modality"] == "video"]
            # vectorized timestamp-grid explode: one np.repeat over the
            # whole batch builds the row index, then the per-frame
            # timestamp is a cumulative offset within each video — no
            # per-row Python except the payload stub itself (which is
            # the codec seam a real decoder replaces).
            durations = vids["duration_ms"].fillna(0).astype(np.int64).to_numpy()
            n_frames = np.maximum((durations + every_ms - 1) // every_ms, 0)
            row_idx = np.repeat(np.arange(len(vids)), n_frames)
            frame_idx = np.concatenate(
                [np.arange(n) for n in n_frames]
            ) if len(n_frames) else np.array([], dtype=np.int64)
            ts_ms = frame_idx * every_ms
            payloads = vids["payload"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": vids["media_id"].to_numpy()[row_idx],
                    "frame_idx": frame_idx.astype(np.int32),
                    "ts_ms": ts_ms.astype(np.int32),
                    "frame_payload": [
                        _stub_bytes(
                            bytes(payloads[ri] or b"") + int(ts).to_bytes(4, "big"),
                            32,
                        )
                        for ri, ts in zip(row_idx, ts_ms)
                    ],
                    "width": vids["width"].to_numpy()[row_idx],
                    "height": vids["height"].to_numpy()[row_idx],
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
