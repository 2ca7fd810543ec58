"""Multimodal columns: image/audio/video as opaque `binary` payloads
with typed metadata, processed by Arrow-batched pandas functions over
mapInPandas.

The decode step is STUBBED (no image/audio codecs in this container):
`decode_media(..., codec="real")` raises NotImplementedError at the
single clearly-marked point, while `codec="fake"` produces a
deterministic pseudo-decode so every piece of Spark-side plumbing —
schema, batch shape, partitioning, UDF signatures — is real and
tested. Swapping in PIL/ffmpeg later changes ONE function body.

Scale notes: payloads stay binary end-to-end (no base64 inflation);
metadata extraction is a narrow projection so Parquet scans can prune
the payload column when only metadata is needed; decode/feature
stages run mapInPandas with `maxRecordsPerBatch` bounding executor
memory against large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "source string"
)


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns computed JVM-side — no Python, so a
    metadata-only consumer never pays for decode."""
    b = F.col(payload_col)
    return df.withColumns(
        {
            "byte_len": F.length(b).cast("bigint"),
            "content_md5": F.md5(b),
        }
    )


DECODE_SCHEMA = (
    "media_id long, width int, height int, n_channels int, ok boolean"
)


def decode_media(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode stub. `codec='real'` is the single integration point for
    an actual codec library."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if codec == "real":
                # ---- STUB: no codecs in this environment ----
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not installed"
                )
            w, h, c, ok = [], [], [], []
            for payload in pdf["payload"]:
                digest = hashlib.md5(bytes(payload)).digest()
                # deterministic fake dimensions from the content hash
                w.append(64 + digest[0] % 192)
                h.append(64 + digest[1] % 192)
                c.append(3)
                ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w,
                    "height": h,
                    "n_channels": c,
                    "ok": ok,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=DECODE_SCHEMA
    )


def feature_schema(dim: int) -> str:
    return f"media_id long, features array<float>"


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature extractor: `dim` floats seeded from
    the content hash — the Arrow batch shape and array<float> output
    schema are exactly what a real embedding model would produce."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                seed = int.from_bytes(
                    hashlib.md5(bytes(payload)).digest()[:8], "big"
                )
                rng = np.random.default_rng(seed)
                feats.append(rng.standard_normal(dim).astype(np.float32))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=feature_schema(dim)
    )


RESIZE_SCHEMA = (
    "media_id long, payload binary, width int, height int"
)


def resize_media(
    df: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Resize stub: emits a transformed binary payload + target dims.
    `codec='real'` is the PIL/ffmpeg integration point; the fake path
    derives a deterministic payload of size ∝ width·height from the
    content hash, so downstream byte-length/metadata plumbing behaves
    like a real resize (output size independent of input size)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_len = max(width * height // 64, 16)
        for pdf in it:
            if codec == "real":
                # ---- STUB: no codecs in this environment ----
                raise NotImplementedError(
                    "real media resize requires PIL/ffmpeg; not installed"
                )
            payloads = []
            for payload in pdf["payload"]:
                digest = hashlib.md5(bytes(payload)).digest()
                reps = out_len // len(digest) + 1
                payloads.append((digest * reps)[:out_len])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZE_SCHEMA
    )


def sample_frames(df: DataFrame, every_n: int = 10, n_frames_col: str = "n_frames") -> DataFrame:
    """Frame sampling for video payloads: explode every n-th frame
    index from metadata — pure JVM (sequence + explode), the decode of
    sampled frames then goes through `decode_media`."""
    idx = F.sequence(
        F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n)
    )
    return df.withColumn("frame_idx", F.explode(idx))
