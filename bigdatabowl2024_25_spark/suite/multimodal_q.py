"""Parity query: the multimodal codec loop (SURVEY.md §2.8),
driver-verified.

q64 checks the opaque-binary metadata pattern; q94 closes the loop on
the REAL codecs: deterministic images are synthesized per document
(dims and channel count are modular functions of doc_id), encoded to
actual PNG or JPEG bytes inside `mapInPandas`, then decoded back by
`decode_media`'s real decoders. The DuckDB oracle recomputes the
expected dimensions/channels straight from the doc_id formulas — so a
codec that mangles headers, dimensions, channel counts, or fails to
roundtrip shows up as a CORRECTNESS mismatch, not just a local pytest
failure. Pixel-level fidelity stays pytest-side
(tests/test_multimodal_streaming.py): JPEG is lossy by design, so
value equality is the wrong oracle there.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..operators.multimodal import MEDIA_SCHEMA, decode_media
from ..sources.io import load_table
from .registry import query

_N_DOCS = 64


@query(
    "q94_codec_roundtrip",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS codec,
           8 + (doc_id * 3) % 7 AS width,
           8 + doc_id % 5 AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END AS BIGINT)
             AS n_channels,
           TRUE AS ok
    FROM documents WHERE doc_id < {_N_DOCS}
    """,
)
def q94_codec_roundtrip(spark, sf_dir):
    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import encode_png

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _N_DOCS)
        .select("doc_id")
    )

    def make_payloads(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = 8 + d % 5, 8 + (d * 3) % 7
                c = 1 if d % 3 == 0 else 3
                yy, xx = np.mgrid[0:h, 0:w]
                img = (
                    np.stack(
                        [(xx * 7 + yy * 11 + d * 13 + k * 29) % 256
                         for k in range(c)],
                        axis=-1,
                    )
                ).astype(np.uint8)
                payloads.append(
                    encode_png(img) if d % 2 == 0 else encode_jpeg(img, 85)
                )
                ids.append(d)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "image",
                    "payload": payloads,
                    "source": "synthetic",
                }
            )

    media = docs.mapInPandas(make_payloads, schema=MEDIA_SCHEMA)
    png = decode_media(media.filter(F.col("media_id") % 2 == 0), codec="png")
    jpg = decode_media(media.filter(F.col("media_id") % 2 == 1), codec="jpeg")
    out = png.withColumn("codec", F.lit("png")).unionByName(
        jpg.withColumn("codec", F.lit("jpeg"))
    )
    return out.select(
        F.col("media_id").alias("doc_id"),
        "codec",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_channels").cast("long").alias("n_channels"),
        "ok",
    )
