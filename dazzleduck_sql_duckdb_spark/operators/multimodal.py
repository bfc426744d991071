"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media travel as opaque ``binary`` columns with typed metadata structs;
all heavy per-item work (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` stages so executors
process media without ever materializing a partition as Python objects
row-by-row.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so the decode kernel is pluggable: ``decoder=`` takes any
``bytes -> np.ndarray`` callable. The default raises NotImplementedError
(clearly-marked stub); ``deterministic_fake_decoder`` produces a
seeded-by-content fake pixel array so the Spark-side plumbing — schema,
batch shapes, partitioning, metadata propagation — is fully real and
testable. Swapping in a real decoder changes no plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),     # image | audio | video
        T.StructField("format", T.StringType()),   # e.g. jpeg, wav, mp4
        T.StructField("width", T.IntegerType()),   # media-kind metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),  # opaque encoded bytes
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def stub_decoder(payload: bytes) -> np.ndarray:
    """The real-codec slot. Not implemented in this container."""
    raise NotImplementedError(
        "media decode requires a codec library (PIL/ffmpeg); plug a real "
        "`decoder=` into extract_features, or use deterministic_fake_decoder"
    )


def deterministic_fake_decoder(payload: bytes) -> np.ndarray:
    """Seeded-by-content fake decode: 8x8 'pixels' derived from the sha256
    of the payload — deterministic, so tests can assert exact outputs."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * 2)[:64], dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32)


def extract_features(
    media: DataFrame,
    *,
    decoder: Callable[[bytes], np.ndarray] = stub_decoder,
    feature_dim: int = 16,
) -> DataFrame:
    """payload -> fixed-dim feature vector, one Arrow batch at a time.

    Scale shape: narrow (no shuffle) mapInPandas over whatever
    partitioning the media table already has; output drops the payload
    column so downstream stages never reshuffle the heavy bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                sizes.append(len(b))
                hashes.append(hashlib.sha256(b).hexdigest())
                decoded = decoder(b)
                flat = decoded.astype(np.float64).ravel()
                # fixed-dim pooling: mean over equal chunks (pad w/ 0)
                pad = (-len(flat)) % feature_dim
                if pad:
                    flat = np.pad(flat, (0, pad))
                feats.append(
                    flat.reshape(feature_dim, -1).mean(axis=1).astype(np.float32)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "content_sha256": hashes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, *, every_ms: int = 1000
) -> DataFrame:
    """Video -> (media_id, frame_idx, frame_ts_ms) expansion — the
    *plan* of a frame sampler: pure Spark expressions (no decode), so the
    expensive decode stage downstream receives an exact work list."""
    n = F.greatest(
        (F.col("duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), n - 1)).alias(
                "frame_idx", "_i"
            ),
        )
        .select(
            "media_id", "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),  # uint8 row-major
    ]
)


def resize_images(
    media: DataFrame,
    *,
    out_hw: tuple[int, int] = (4, 4),
    decoder: Callable[[bytes], np.ndarray] = stub_decoder,
) -> DataFrame:
    """Decode -> block-mean downsample -> re-emit compact pixel bytes.

    The resample itself is pure numpy (no codec): the H x W plane is
    cut into an out_h x out_w grid and each cell averaged — real math,
    not a stub; only the decode slot is pluggable. Same narrow (no
    shuffle) mapInPandas shape as extract_features; the output carries
    out_h*out_w bytes per item instead of the original payload, so a
    100 TB corpus leaves this stage orders of magnitude smaller.
    """
    oh, ow = out_hw

    def _block_mean(img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        # cell boundaries via integer bucketing (handles non-divisible
        # shapes; every source pixel lands in exactly one cell)
        ri = (np.arange(h) * oh) // max(h, 1)
        ci = (np.arange(w) * ow) // max(w, 1)
        out = np.zeros((oh, ow), dtype=np.float64)
        cnt = np.zeros((oh, ow), dtype=np.int64)
        np.add.at(out, (ri[:, None], ci[None, :]), img.astype(np.float64))
        np.add.at(cnt, (ri[:, None], ci[None, :]), 1)
        return (out / np.maximum(cnt, 1)).round().astype(np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pix = [
                _block_mean(decoder(bytes(p))).tobytes()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_h": np.int32(oh),
                    "out_w": np.int32(ow),
                    "pixels": pix,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def media_dedup_keys(media: DataFrame) -> DataFrame:
    """Exact media dedup key: sha256 of payload bytes (JVM-side, no
    Python round-trip) + size. The canonical first pass before any
    perceptual/feature-space near-dup stage."""
    return media.select(
        "media_id",
        F.sha2(F.col("payload"), 256).alias("content_sha256"),
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
    )
