"""Multimodal column support (SURVEY.md section 2.11).

Images/audio/video ride the lake as opaque ``binary`` payload columns
with typed metadata (schemas.MULTIMODAL_ASSET). The Spark-side plumbing
— schema, Arrow batch shape, partitioning — is real; the actual media
decode is stubbed behind ``DECODERS`` because no image/audio libraries
exist in this container (clearly marked below). Swapping in a real
decoder changes one function, not the plan.

Pattern: ``mapInPandas`` so each Arrow batch of payloads is decoded
vectorized in one Python call, with column pruning still available to
Catalyst for metadata-only queries (payload column untouched unless
referenced).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata columns derivable without decoding: byte length and a
    content digest — pure JVM expressions, no UDF."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "content_md5", F.md5(F.col(payload_col))
    )


# --- decode stubs -----------------------------------------------------------
# STUB: real decoders (PIL / torchaudio / pyav) are not installed in this
# container. The deterministic fakes below keep the pipeline testable;
# production swaps the callable, the Spark plan is unchanged.


def _fake_image_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake: (width, height, n_channels) derived from the
    payload digest. Replace with PIL.Image.open at deploy time."""
    import hashlib

    h = hashlib.md5(payload).digest()
    return (64 + h[0] % 64, 64 + h[1] % 64, 3)


def _fake_audio_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake: (sample_rate, n_samples)."""
    import hashlib

    h = hashlib.md5(payload).digest()
    return (16000, 1000 + int.from_bytes(h[2:4], "big"))


DECODERS: dict[str, Callable] = {
    "image": _fake_image_decode,
    "audio": _fake_audio_decode,
}

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def decode_image_features(df: DataFrame, id_col: str = "asset_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode: payload -> (width, height, channels, bytes).

    mapInPandas keeps the transfer columnar; only the two referenced
    columns cross the JVM/Python boundary (project before mapping).
    """
    pruned = df.select(F.col(id_col).alias("asset_id"), F.col(payload_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = DECODERS["image"]
        for pdf in batches:
            dims = pdf["payload"].map(lambda p: decoder(bytes(p)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_channels": dims.map(lambda d: d[2]).astype("int32"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return pruned.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("out_bytes", LongType()),
        StructField("resized_md5", StringType()),
    ]
)


def resize_images(
    df: DataFrame, target: int = 224, id_col: str = "asset_id", payload_col: str = "payload"
) -> DataFrame:
    """Aspect-preserving resize to fit a ``target`` x ``target`` box,
    as Arrow-batched mapInPandas (the prompt's decode/resize path).

    Integer math only (out = dim * target // longer_side), so the
    result is bit-reproducible cross-engine. The resized pixel buffer
    itself is stubbed — ``resized_md5`` is a deterministic content
    address md5(payload + "WxH") standing in for it — because no image
    library ships in this container; production swaps the inner loop
    for PIL/opencv and emits a binary column with the identical plan:
    project-prune -> columnar batch to Python -> typed batch out.
    """
    pruned = df.select(F.col(id_col).alias("asset_id"), F.col(payload_col).alias("payload"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        decoder = DECODERS["image"]
        for pdf in batches:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(p)
                w, h, _ = decoder(b)
                if w >= h:
                    ow, oh = target, h * target // w
                else:
                    ow, oh = w * target // h, target
                digest = hashlib.md5(b + f"{ow}x{oh}".encode()).hexdigest()
                rows.append((aid, w, h, ow, oh, ow * oh * 3, digest))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields]).astype(
                {"width": "int32", "height": "int32", "out_width": "int32",
                 "out_height": "int32", "out_bytes": "int64"}
            )

    return pruned.mapInPandas(resize, RESIZE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame offset.

    The decode itself is stubbed (no pyav here); the row explosion —
    which is the part that matters for partitioning/scale — is a real
    JVM-side sequence+explode on the duration metadata.
    """
    return df.withColumn(
        "frame_ms",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_n_ms))),
    ).select("asset_id", "frame_ms")


def decode_video_frame(payload: bytes, frame_ms: int):  # pragma: no cover - stub
    """STUB: video decoding requires pyav/ffmpeg, not present in this
    container. Raises so nobody mistakes the fake for a real decode."""
    raise NotImplementedError("video decode requires pyav/ffmpeg at deploy time")
