"""Parity query: the multimodal codec loop (SURVEY.md §2.8),
driver-verified.

q64 checks the opaque-binary metadata pattern; q94 closes the loop on
the REAL codecs — all four first-party families: deterministic
payloads are synthesized per document (dims/rates/frame counts are
modular functions of doc_id), encoded to actual PNG, JPEG, PCM-WAV, or
MJPEG-AVI bytes inside `mapInPandas`, then decoded back by the real
decoders (`decode_media`, `decode_audio`, `decode_video`). The DuckDB
oracle recomputes the expected shape facts straight from the doc_id
formulas — so a codec that mangles headers, dimensions, sample counts,
frame counts, or fails to roundtrip shows up as a CORRECTNESS
mismatch, not just a local pytest failure. Pixel/sample-level fidelity
stays pytest-side (tests/test_multimodal_streaming.py): JPEG is lossy
by design, so value equality is the wrong oracle there.

Output schema is (doc_id, codec, d1, d2, d3, ok) with per-codec
meaning: png/jpeg → (width, height, channels); wav → (n_samples,
sample_rate, channels); mjpeg → (width, height, n_frames).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..operators.multimodal import (
    MEDIA_SCHEMA,
    decode_audio,
    decode_media,
    decode_video,
)
from ..sources.io import load_table
from .registry import query

_N_DOCS = 64


@query(
    "q94_codec_roundtrip",
    oracle=f"""
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                           WHEN 2 THEN 'wav' ELSE 'mjpeg' END AS codec,
           CAST(CASE WHEN doc_id % 4 = 2 THEN 100 + (doc_id * 11) % 50
                ELSE 8 + (doc_id * 3) % 7 END AS BIGINT) AS d1,
           CAST(CASE WHEN doc_id % 4 = 2 THEN 8000 + (doc_id % 3) * 4000
                ELSE 8 + doc_id % 5 END AS BIGINT) AS d2,
           CAST(CASE doc_id % 4
                WHEN 2 THEN 1 + doc_id % 2
                WHEN 3 THEN 2 + doc_id % 4
                ELSE CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END
                END AS BIGINT) AS d3,
           TRUE AS ok
    FROM documents WHERE doc_id < {_N_DOCS}
    """,
)
def q94_codec_roundtrip(spark, sf_dir):
    from ..operators.jpeg import encode_jpeg
    from ..operators.media_av import encode_avi_mjpeg, encode_wav
    from ..operators.multimodal import encode_png

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _N_DOCS)
        .select("doc_id")
    )

    def _img(d, c):
        h, w = 8 + d % 5, 8 + (d * 3) % 7
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack(
            [(xx * 7 + yy * 11 + d * 13 + k * 29) % 256 for k in range(c)],
            axis=-1,
        ).astype(np.uint8)

    def make_payloads(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                kind = d % 4
                if kind in (0, 1):
                    img = _img(d, 1 if d % 3 == 0 else 3)
                    payloads.append(
                        encode_png(img) if kind == 0 else encode_jpeg(img, 85)
                    )
                elif kind == 2:
                    n = 100 + (d * 11) % 50
                    rate = 8000 + (d % 3) * 4000
                    ch = 1 + d % 2
                    t = np.arange(n * ch, dtype=np.int64)
                    sig = ((t * (d + 3) * 257) % 4001 - 2000).astype(
                        np.int16
                    ).reshape(n, ch)
                    payloads.append(encode_wav(sig, rate))
                else:
                    nf = 2 + d % 4
                    payloads.append(
                        encode_avi_mjpeg(
                            [_img(d, 3) + np.uint8(i) for i in range(nf)],
                            fps=5,
                        )
                    )
                ids.append(d)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "mixed",
                    "payload": payloads,
                    "source": "synthetic",
                }
            )

    media = docs.mapInPandas(make_payloads, schema=MEDIA_SCHEMA)
    png = decode_media(
        media.filter(F.col("media_id") % 4 == 0), codec="png"
    ).select(
        "media_id", F.lit("png").alias("codec"),
        F.col("width").cast("long").alias("d1"),
        F.col("height").cast("long").alias("d2"),
        F.col("n_channels").cast("long").alias("d3"), "ok",
    )
    jpg = decode_media(
        media.filter(F.col("media_id") % 4 == 1), codec="jpeg"
    ).select(
        "media_id", F.lit("jpeg").alias("codec"),
        F.col("width").cast("long").alias("d1"),
        F.col("height").cast("long").alias("d2"),
        F.col("n_channels").cast("long").alias("d3"), "ok",
    )
    wav = decode_audio(media.filter(F.col("media_id") % 4 == 2)).select(
        "media_id", F.lit("wav").alias("codec"),
        F.col("n_samples").cast("long").alias("d1"),
        F.col("sample_rate").cast("long").alias("d2"),
        F.col("n_channels").cast("long").alias("d3"), "ok",
    )
    vid = decode_video(media.filter(F.col("media_id") % 4 == 3)).select(
        "media_id", F.lit("mjpeg").alias("codec"),
        F.col("width").cast("long").alias("d1"),
        F.col("height").cast("long").alias("d2"),
        F.col("n_frames").cast("long").alias("d3"), "ok",
    )
    out = png.unionByName(jpg).unionByName(wav).unionByName(vid)
    return out.select(
        F.col("media_id").alias("doc_id"), "codec", "d1", "d2", "d3", "ok"
    )
