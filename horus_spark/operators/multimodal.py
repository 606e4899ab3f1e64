"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself is STUBBED (no imaging/audio libraries in this
environment): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (seeded from the
payload hash) produces stable features — the Spark-side plumbing (schemas,
mapInPandas batching, partition sizing) is real and tested.

Scale notes: binary payloads ride in the same row as metadata; operators
select ONLY the columns they need (nested-schema pruning keeps a
metadata-only query from reading payload bytes), and mapInPandas streams
Arrow batches so one oversized asset never materializes a whole partition.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "asset_id string, doc_id string, media_type string, payload binary, "
    "meta struct<width:int,height:int,duration_ms:int,codec:string>"
)

FEATURES_SCHEMA = (
    "asset_id string, doc_id string, media_type string, "
    "feature_version int, features array<float>"
)

THUMB_SCHEMA = "asset_id string, width int, height int, thumb binary"


def _fake_decode(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: payload hash -> unit floats."""
    h = hashlib.sha256(payload or b"").digest()
    return [
        struct.unpack(">I", h[i * 4 : i * 4 + 4])[0] / 2**32 for i in range(dims)
    ]


def decode_image(payload: bytes, fake: bool = False):
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; pass fake=True for the deterministic test decoder"
    )


def extract_features(media: DataFrame, dims: int = 8, fake: bool = True) -> DataFrame:
    """Binary payloads -> fixed-width feature vectors via mapInPandas
    (Arrow-batched; zero per-row Python outside the batch loop)."""

    def batches(it):
        for pdf in it:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature_version": 1,
                    "features": feats,
                }
            )

    cols = ["asset_id", "doc_id", "media_type", "payload"]
    return media.select(*cols).mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp (the decode
    of each frame is the stubbed step; the EXPLODED plan shape is real).
    Pure expressions — no Python."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.filter(F.col("media_type") == "video").select(
        "asset_id",
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: (i * every_ms).cast("int"),
            )
        ).alias("frame_ts_ms"),
    )


def media_stats(media: DataFrame, include_payload_bytes: bool = False) -> DataFrame:
    """Per-media-type asset stats.

    Default is METADATA-ONLY: the aggregate touches media_type and meta
    exclusively, so a parquet-backed frame's scan prunes the payload
    column entirely (ReadSchema excludes 'payload' — asserted by
    tests/test_multimodal_streaming.py). That is the shape a catalog
    query over 100 TB of binary assets must have: stats without I/O on
    the blobs.

    include_payload_bytes=True adds total_bytes = sum(length(payload)),
    which necessarily READS every payload byte — an explicit opt-in full
    scan, never the default. (Producers that need cheap size stats should
    persist a size field in `meta` at ingest.)"""
    aggs = [
        F.count("*").alias("n_assets"),
        F.avg("meta.width").alias("avg_width"),
    ]
    if include_payload_bytes:
        aggs.insert(1, F.sum(F.length("payload")).alias("total_bytes"))
    return media.groupBy("media_type").agg(*aggs)
