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
