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


# ---- dhash branches: perceptual-hash near-dup over REAL PNG bytes ----
# 32 formula images at the hash grid's own 8×9 geometry (resize =
# identity, so the oracle can re-derive every pooled value exactly;
# the resize path is pytest-verified in tests/test_phash.py). Images
# depend on doc_id % 16 only, so each d and d+16 are exact twins —
# the planted Hamming-0 near-dup pairs — while cross-formula band
# collisions are deterministic and mirrored by the same SQL banding.
_DH_N, _DH_BANDS, _DH_MAXHAM = 32, 4, 6

_DH_CTES = f"""
    dh_px AS (
        SELECT d, y, x, ((x*5 + y*3 + (d%16)*7) % 32) * 8 AS v
        FROM range(0, {_DH_N}) t(d), range(0, 8) ty(y), range(0, 9) tx(x)
    ),
    dh_bits AS (
        -- dHash bit b = y*8+x set iff pixel(y,x+1) > pixel(y,x)
        SELECT a.d, a.y*8 + a.x AS b
        FROM dh_px a
        JOIN dh_px nx ON nx.d = a.d AND nx.y = a.y AND nx.x = a.x + 1
        WHERE a.x < 8 AND nx.v > a.v
    ),
    dh_hash AS (
        -- signed int64 packing: bits 0-62 sum directly, bit 63 is the
        -- two's-complement sign contribution. The outer CAST matters:
        -- DuckDB's SUM(BIGINT) returns HUGEINT, and 128-bit xor of a
        -- mixed-sign pair carries 64 set sign-extension bits into
        -- bit_count (observed: every mixed-sign near-dup pair
        -- silently failed the Hamming cut)
        SELECT t.d,
               CAST(
                   COALESCE(SUM(CASE WHEN b.b < 63
                                THEN (CAST(1 AS BIGINT) << b.b) END), 0)
                   + CASE WHEN MAX(b.b) = 63
                          THEN (-9223372036854775807 - 1) ELSE 0 END
               AS BIGINT) AS h
        FROM range(0, {_DH_N}) t(d) LEFT JOIN dh_bits b ON b.d = t.d
        GROUP BY t.d
    ),
    dh_band AS (
        -- arithmetic shift + mask == Spark's shiftright + bitwiseAND
        SELECT d, h, i, (h >> (i*16)) & 65535 AS bk
        FROM dh_hash, range(0, {_DH_BANDS}) ti(i)
    ),
    dh_cand AS (
        SELECT DISTINCT a.d AS id_a, b.d AS id_b, a.h AS ha, b.h AS hb
        FROM dh_band a JOIN dh_band b
          ON a.i = b.i AND a.bk = b.bk AND a.d < b.d
    )
"""


@query(
    "q94_codec_roundtrip",
    oracle=f"""
    WITH {_DH_CTES}
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
    UNION ALL
    SELECT d AS doc_id, 'dhash64' AS codec, h AS d1,
           CAST(0 AS BIGINT) AS d2, CAST(0 AS BIGINT) AS d3, TRUE AS ok
    FROM dh_hash
    UNION ALL
    SELECT id_a AS doc_id, 'dhash' AS codec, id_b AS d1,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS d2,
           CAST(0 AS BIGINT) AS d3, TRUE AS ok
    FROM dh_cand
    WHERE bit_count(xor(ha, hb)) <= {_DH_MAXHAM}
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
    # dhash branches (round 9): the perceptual-hash near-dup funnel
    # over real PNG bytes — formula images encoded, decoded by the
    # first-party codec, dHashed, LSH-banded, Hamming-verified
    # (operators/phash.py); the oracle re-derives hashes/bands/pairs
    # straight from the pixel formula (see _DH_CTES)
    from ..operators.phash import dhash_images, phash_near_dup

    def make_dhash_payloads(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                d = int(mid)
                yy, xx = np.mgrid[0:8, 0:9]
                img = (((xx * 5 + yy * 3 + (d % 16) * 7) % 32) * 8).astype(
                    np.uint8
                )[..., None]
                ids.append(d)
                payloads.append(encode_png(img))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "image",
                    "payload": payloads,
                    "source": "synthetic",
                }
            )

    dh_media = (
        spark.range(_DH_N)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(make_dhash_payloads, schema=MEDIA_SCHEMA)
    )
    hashes = dhash_images(dh_media, id_col="media_id", codec="png")
    dh64 = hashes.select(
        F.col("media_id").alias("doc_id"),
        F.lit("dhash64").alias("codec"),
        F.col("dhash").alias("d1"),
        F.lit(0).cast("long").alias("d2"),
        F.lit(0).cast("long").alias("d3"),
        F.lit(True).alias("ok"),
    )
    dh_pairs = phash_near_dup(
        hashes, id_col="media_id", bands=_DH_BANDS, max_hamming=_DH_MAXHAM
    ).select(
        F.col("id_a").alias("doc_id"),
        F.lit("dhash").alias("codec"),
        F.col("id_b").alias("d1"),
        F.col("hamming").cast("long").alias("d2"),
        F.lit(0).cast("long").alias("d3"),
        F.lit(True).alias("ok"),
    )

    out = png.unionByName(jpg).unionByName(wav).unionByName(vid)
    out = out.select(
        F.col("media_id").alias("doc_id"), "codec", "d1", "d2", "d3", "ok"
    )
    return out.unionByName(dh64).unionByName(dh_pairs)
