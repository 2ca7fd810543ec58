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

#: partition count for the 24-64-row payload-generator fixtures.
#: spark.range(N) defaults to the session parallelism (32 locally),
#: which turns every fixture into ~1-row Arrow batches — across the
#: 15-branch union that is 400+ near-empty python-worker tasks, and
#: it DOMINATED q94's fused wall (measured round 14: 12.0-12.7 s
#: warm at default partitioning vs 3.5-3.8 s at 4 partitions,
#: identical rows). This is fixture plumbing, not the scale path: a
#: real ingest replaces the generator with read_binary_files, whose
#: partitioning follows the files.
_FIXTURE_PARTS = 4


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
    ),
    di_band AS (SELECT d + 100 AS d, h, i, bk FROM dh_band),
    di_cand AS (
        SELECT DISTINCT least(n.d, o.d) AS id_a,
               greatest(n.d, o.d) AS id_b
        FROM di_band n
        JOIN (SELECT * FROM dh_band UNION ALL SELECT * FROM di_band) o
          ON o.i = n.i AND o.bk = n.bk AND o.d <> n.d
    ),
    di_pairs AS (
        SELECT c.id_a, c.id_b, bit_count(xor(a.h, b.h)) AS ham
        FROM di_cand c
        JOIN dh_hash a ON a.d = CASE WHEN c.id_a >= 100
                                THEN c.id_a - 100 ELSE c.id_a END
        JOIN dh_hash b ON b.d = CASE WHEN c.id_b >= 100
                                THEN c.id_b - 100 ELSE c.id_b END
    )
"""


# ---- afp branches: audio energy-delta fingerprints over REAL WAV ----
# 32 formula clips, mono, n = 90 + (d%16)*3 samples in [-20, 20];
# clip d depends on d % 16 only, so d and d+16 are exact twins — the
# planted Hamming-0 pairs. The oracle re-derives the two-band
# fingerprint (|x| and |Δx| block-energy deltas, block = i*33 div n)
# and the same 16-bit banding/Hamming funnel the image leg uses.
_AF_N, _AF_BANDS, _AF_MAXHAM = 32, 4, 6

_AF_CTES = f"""
    af_s AS (
        SELECT d, i, ((i*7 + (d%16)*13) % 41) - 20 AS v
        FROM range(0, {_AF_N}) t(d), range(0, 138) ti(i)
        WHERE i < 90 + (d%16)*3
    ),
    af_d AS (
        SELECT d, i, ABS(v) AS lo,
               CASE WHEN i = 0 THEN 0
                    ELSE ABS(v - LAG(v) OVER (PARTITION BY d ORDER BY i))
               END AS hi
        FROM af_s
    ),
    af_sum AS (
        SELECT d, (i * 33) // (90 + (d%16)*3) AS b,
               CAST(SUM(lo) AS BIGINT) AS lo,
               CAST(SUM(hi) AS BIGINT) AS hi
        FROM af_d GROUP BY d, (i * 33) // (90 + (d%16)*3)
    ),
    af_bits AS (
        SELECT a.d, a.b AS k FROM af_sum a
        JOIN af_sum n ON n.d = a.d AND n.b = a.b + 1
        WHERE a.b < 32 AND n.lo > a.lo
        UNION ALL
        SELECT a.d, a.b + 32 AS k FROM af_sum a
        JOIN af_sum n ON n.d = a.d AND n.b = a.b + 1
        WHERE a.b < 32 AND n.hi > a.hi
    ),
    af_hash AS (
        SELECT t.d,
               CAST(
                   COALESCE(SUM(CASE WHEN b.k < 63
                                THEN (CAST(1 AS BIGINT) << b.k) END), 0)
                   + CASE WHEN MAX(b.k) = 63
                          THEN (-9223372036854775807 - 1) ELSE 0 END
               AS BIGINT) AS h
        FROM range(0, {_AF_N}) t(d) LEFT JOIN af_bits b ON b.d = t.d
        GROUP BY t.d
    ),
    af_band AS (
        SELECT d, h, i, (h >> (i*16)) & 65535 AS bk
        FROM af_hash, range(0, {_AF_BANDS}) ti(i)
    ),
    af_cand AS (
        SELECT DISTINCT a.d AS id_a, b.d AS id_b, a.h AS ha, b.h AS hb
        FROM af_band a JOIN af_band b
          ON a.i = b.i AND a.bk = b.bk AND a.d < b.d
    )
"""



#: pinned expectations for the 'vfp64'/'vfp' branches (q90 pattern:
#: MJPEG decode is not SQL-expressible, so the oracle pins the
#: deterministic per-frame dhashes and verified pairs as literals —
#: regenerate with the script in the commit body if the formula,
#: codec, or funnel parameters change)
_VFP_HASHES = """VALUES
        (0, 0, -289365106781855809),
        (0, 1, -4630124837082499089),
        (1, 0, 9114720479506591727),
        (1, 1, -1161999353951421445),
        (1, 2, -290491041316880450),
        (2, 0, -2323929434358547465),
        (2, 1, -580982082096955779),
        (2, 2, 9078689466283978719),
        (2, 3, -2323929432211063817),
        (3, 0, -1157460564583219717),
        (3, 1, -289365106781855809),
        (4, 0, -290499837409902978),
        (4, 1, 9114720479506591727),
        (4, 2, -1161999353951421445),
        (5, 0, 9078126516330553311),
        (5, 1, -2323929434358547465),
        (5, 2, -580982082096955779),
        (5, 3, 9078689466283978719),
        (6, 0, -4720196829630171153),
        (6, 1, -1157460564583219717),
        (7, 0, -2314920858566657029),
        (7, 1, -290499837409902978),
        (7, 2, 9114720479506591727),
        (8, 0, -580982082633826691),
        (8, 1, 9078126516330553311),
        (8, 2, -2323929434358547465),
        (8, 3, -580982082096955779),
        (9, 0, -289365141141594178),
        (9, 1, -4720196829630171153),
        (10, 0, 9114718280483336159),
        (10, 1, -2314920858566657029),
        (10, 2, -290499837409902978),
        (11, 0, -2324281278079436809),
        (11, 1, -580982082633826691),
        (11, 2, 9078126516330553311),
        (11, 3, -2323929434358547465),
        (12, 0, -1161964164210622981),
        (12, 1, -289365141141594178),
        (13, 0, -578730213563711874),
        (13, 1, 9114718280483336159),
        (13, 2, -2314920858566657029),
        (14, 0, -145245520658440225),
        (14, 1, -2324281278079436809),
        (14, 2, -580982082633826691),
        (14, 3, 9078126516330553311),
        (15, 0, -4720196838220105745),
        (15, 1, -1161964164210622981),
        (16, 0, -289365106781855809),
        (16, 1, -4630124837082499089),
        (17, 0, 9114720479506591727),
        (17, 1, -1161999353951421445),
        (17, 2, -290491041316880450),
        (18, 0, -2323929434358547465),
        (18, 1, -580982082096955779),
        (18, 2, 9078689466283978719),
        (18, 3, -2323929432211063817),
        (19, 0, -1157460564583219717),
        (19, 1, -289365106781855809),
        (20, 0, -290499837409902978),
        (20, 1, 9114720479506591727),
        (20, 2, -1161999353951421445),
        (21, 0, 9078126516330553311),
        (21, 1, -2323929434358547465),
        (21, 2, -580982082096955779),
        (21, 3, 9078689466283978719),
        (22, 0, -4720196829630171153),
        (22, 1, -1157460564583219717),
        (23, 0, -2314920858566657029),
        (23, 1, -290499837409902978),
        (23, 2, 9114720479506591727),
        (24, 0, -580982082633826691),
        (24, 1, 9078126516330553311),
        (24, 2, -2323929434358547465),
        (24, 3, -580982082096955779),
        (25, 0, -289365141141594178),
        (25, 1, -4720196829630171153),
        (26, 0, 9114718280483336159),
        (26, 1, -2314920858566657029),
        (26, 2, -290499837409902978),
        (27, 0, -2324281278079436809),
        (27, 1, -580982082633826691),
        (27, 2, 9078126516330553311),
        (27, 3, -2323929434358547465),
        (28, 0, -1161964164210622981),
        (28, 1, -289365141141594178),
        (29, 0, -578730213563711874),
        (29, 1, 9114718280483336159),
        (29, 2, -2314920858566657029),
        (30, 0, -145245520658440225),
        (30, 1, -2324281278079436809),
        (30, 2, -580982082633826691),
        (30, 3, 9078126516330553311),
        (31, 0, -4720196838220105745),
        (31, 1, -1161964164210622981)"""

_VFP_PAIRS = """VALUES
        (0, 9, 2, 0),
        (0, 16, 2, 0),
        (0, 25, 2, 0),
        (1, 4, 2, -1),
        (1, 7, 2, 1),
        (1, 10, 3, 0),
        (1, 13, 2, -1),
        (1, 17, 3, 0),
        (1, 20, 2, -1),
        (1, 23, 2, 1),
        (1, 26, 3, 0),
        (1, 29, 2, -1),
        (2, 5, 3, -1),
        (2, 8, 3, 1),
        (2, 11, 4, 0),
        (2, 14, 3, -1),
        (2, 18, 4, 0),
        (2, 21, 3, -1),
        (2, 24, 3, 1),
        (2, 27, 4, 0),
        (2, 30, 3, -1),
        (3, 12, 2, 0),
        (3, 19, 2, 0),
        (3, 28, 2, 0),
        (4, 7, 2, -1),
        (4, 10, 2, 1),
        (4, 13, 3, 0),
        (4, 17, 2, 1),
        (4, 20, 3, 0),
        (4, 23, 2, -1),
        (4, 26, 2, 1),
        (4, 29, 3, 0),
        (5, 8, 3, -1),
        (5, 11, 3, 1),
        (5, 14, 4, 0),
        (5, 18, 3, 1),
        (5, 21, 4, 0),
        (5, 24, 3, -1),
        (5, 27, 3, 1),
        (5, 30, 4, 0),
        (6, 15, 2, 0),
        (6, 22, 2, 0),
        (6, 31, 2, 0),
        (7, 10, 2, -1),
        (7, 13, 2, 1),
        (7, 17, 2, -1),
        (7, 20, 2, 1),
        (7, 23, 3, 0),
        (7, 26, 2, -1),
        (7, 29, 2, 1),
        (8, 11, 3, -1),
        (8, 14, 3, 1),
        (8, 18, 3, -1),
        (8, 21, 3, 1),
        (8, 24, 4, 0),
        (8, 27, 3, -1),
        (8, 30, 3, 1),
        (9, 16, 2, 0),
        (9, 25, 2, 0),
        (10, 13, 2, -1),
        (10, 17, 3, 0),
        (10, 20, 2, -1),
        (10, 23, 2, 1),
        (10, 26, 3, 0),
        (10, 29, 2, -1),
        (11, 14, 3, -1),
        (11, 18, 4, 0),
        (11, 21, 3, -1),
        (11, 24, 3, 1),
        (11, 27, 4, 0),
        (11, 30, 3, -1),
        (12, 19, 2, 0),
        (12, 28, 2, 0),
        (13, 17, 2, 1),
        (13, 20, 3, 0),
        (13, 23, 2, -1),
        (13, 26, 2, 1),
        (13, 29, 3, 0),
        (14, 18, 3, 1),
        (14, 21, 4, 0),
        (14, 24, 3, -1),
        (14, 27, 3, 1),
        (14, 30, 4, 0),
        (15, 22, 2, 0),
        (15, 31, 2, 0),
        (16, 25, 2, 0),
        (17, 20, 2, -1),
        (17, 23, 2, 1),
        (17, 26, 3, 0),
        (17, 29, 2, -1),
        (18, 21, 3, -1),
        (18, 24, 3, 1),
        (18, 27, 4, 0),
        (18, 30, 3, -1),
        (19, 28, 2, 0),
        (20, 23, 2, -1),
        (20, 26, 2, 1),
        (20, 29, 3, 0),
        (21, 24, 3, -1),
        (21, 27, 3, 1),
        (21, 30, 4, 0),
        (22, 31, 2, 0),
        (23, 26, 2, -1),
        (23, 29, 2, 1),
        (24, 27, 3, -1),
        (24, 30, 3, 1),
        (26, 29, 2, -1),
        (27, 30, 3, -1)"""


@query(
    "q94_codec_roundtrip",
    oracle=f"""
    WITH {_DH_CTES},
    {_AF_CTES}
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
    UNION ALL
    SELECT id_a AS doc_id, 'dincr' AS codec, id_b AS d1,
           CAST(ham AS BIGINT) AS d2,
           CAST(0 AS BIGINT) AS d3, TRUE AS ok
    FROM di_pairs
    WHERE ham <= {_DH_MAXHAM}
    UNION ALL
    SELECT d AS doc_id, 'afp64' AS codec, h AS d1,
           CAST(0 AS BIGINT) AS d2, CAST(0 AS BIGINT) AS d3, TRUE AS ok
    FROM af_hash
    UNION ALL
    SELECT id_a AS doc_id, 'afp' AS codec, id_b AS d1,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS d2,
           CAST(0 AS BIGINT) AS d3, TRUE AS ok
    FROM af_cand
    WHERE bit_count(xor(ha, hb)) <= {_AF_MAXHAM}
    UNION ALL
    SELECT v.d AS doc_id, 'vfp64' AS codec, v.f AS d1, v.h AS d2,
           CAST(0 AS BIGINT) AS d3, TRUE AS ok
    FROM ({_VFP_HASHES}) v(d, f, h)
    UNION ALL
    SELECT v.a AS doc_id, 'vfp' AS codec, v.b AS d1, v.n AS d2,
           v.off AS d3, TRUE AS ok
    FROM ({_VFP_PAIRS}) v(a, b, n, off)
    UNION ALL
    SELECT d AS doc_id, 'adpcm' AS codec,
           CAST(64 + (d * 7) % 37 AS BIGINT) AS d1,
           CAST(8000 + (d % 4) * 2000 AS BIGINT) AS d2,
           CAST((d * (d + 5) * 131) % 3001 - 1500 AS BIGINT) AS d3,
           TRUE AS ok
    FROM range(0, 40) t(d)
    UNION ALL
    SELECT d AS doc_id, 'ifv' AS codec,
           CAST(3 + d % 4 AS BIGINT) AS d1,
           CAST(5000000 + (12 + (d * 5) % 9) * 1000 + (9 + d % 6)
                AS BIGINT) AS d2,
           CAST((d * 13) % 256 + 256 * ((d * 13 + 29) % 256)
                + 65536 * ((d * 13 + 58) % 256) AS BIGINT) AS d3,
           TRUE AS ok
    FROM range(0, 40) t2(d)
    UNION ALL
    SELECT d AS doc_id, 'mdct' AS codec,
           CAST(300 + (d * 29) % 200 AS BIGINT) AS d1,
           CAST(8000 + (d % 4) * 2000 AS BIGINT) AS d2,
           CAST((300 + (d * 29) % 200 + 255) // 256 + 1 AS BIGINT)
             AS d3,
           TRUE AS ok
    FROM range(0, 40) t3(d)
    UNION ALL
    SELECT d AS doc_id, 'xcode' AS codec,
           CAST(64 + (80 + (d * 13) % 60) // 2 AS BIGINT) AS d1,
           CAST(80 + (d * 13) % 60 AS BIGINT) AS d2,
           CAST(CASE WHEN d % 2 = 0 THEN -1500
                ELSE FLOOR((-3000 + ((d + 7) * 173) % 3001) / 2.0)
                END AS BIGINT) AS d3,
           TRUE AS ok
    FROM range(0, 24) t4(d)
    UNION ALL
    SELECT d AS doc_id, 'vxcode' AS codec,
           CAST(2 + (d % 16) % 3 AS BIGINT) AS d1,
           CAST(5000000 + 9 * 1000 + 8 AS BIGINT) AS d2,
           CAST(0 AS BIGINT) AS d3, TRUE AS ok
    FROM range(0, {_DH_N}) t5(d)
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
        spark.range(0, _DH_N, 1, _FIXTURE_PARTS)
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
    # 'dincr' (round 10): the image daily-crawl loop under the oracle
    # — the same 32 images re-crawled as a day-2 batch under ids +100
    # (exact twins of history), paired against the day-1 (doc, dhash)
    # state via `incremental_phash_candidates`: new x (history ∪ new)
    # band collisions, never history x history. The oracle re-derives
    # the shifted banding and the join in SQL on the pixel-formula
    # hashes; this flips the last incremental path from pytest-only to
    # driver-verified (q83 'incr' pattern at image granularity).
    from ..operators.phash import incremental_phash_candidates

    di_state = hashes.select(
        F.col("media_id").alias("doc"), "dhash"
    )
    di_batch = hashes.select(
        (F.col("media_id") + 100).alias("media_id"), "dhash"
    )
    di_cands, _di_rows = incremental_phash_candidates(
        di_batch,
        di_state,
        id_col="media_id",
        bands=_DH_BANDS,
        max_hamming=_DH_MAXHAM,
    )
    dincr = di_cands.select(
        F.col("id_a").alias("doc_id"),
        F.lit("dincr").alias("codec"),
        F.col("id_b").alias("d1"),
        F.col("hamming").cast("long").alias("d2"),
        F.lit(0).cast("long").alias("d3"),
        F.lit(True).alias("ok"),
    )

    # afp branches (round 9): the audio leg — formula PCM encoded to
    # real WAV, decoded + fingerprinted by `audio_fp`, then the SAME
    # generic banded-Hamming funnel as images (phash_near_dup over the
    # afp column); the oracle re-derives fingerprints/bands/pairs from
    # the sample formula (see _AF_CTES)
    from ..operators.audio_fp import fingerprint_audio

    def make_afp_payloads(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                d = int(mid)
                n = 90 + (d % 16) * 3
                i = np.arange(n, dtype=np.int64)
                sig = (((i * 7 + (d % 16) * 13) % 41) - 20).astype(
                    np.int16
                )
                ids.append(d)
                payloads.append(encode_wav(sig.reshape(-1, 1), 8000))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "audio",
                    "payload": payloads,
                    "source": "synthetic",
                }
            )

    af_media = (
        spark.range(0, _AF_N, 1, _FIXTURE_PARTS)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(make_afp_payloads, schema=MEDIA_SCHEMA)
    )
    afps = fingerprint_audio(af_media, id_col="media_id")
    af64 = afps.select(
        F.col("media_id").alias("doc_id"),
        F.lit("afp64").alias("codec"),
        F.col("afp").alias("d1"),
        F.lit(0).cast("long").alias("d2"),
        F.lit(0).cast("long").alias("d3"),
        F.lit(True).alias("ok"),
    )
    af_pairs = phash_near_dup(
        afps,
        id_col="media_id",
        hash_col="afp",
        bands=_AF_BANDS,
        max_hamming=_AF_MAXHAM,
    ).select(
        F.col("id_a").alias("doc_id"),
        F.lit("afp").alias("codec"),
        F.col("id_b").alias("d1"),
        F.col("hamming").cast("long").alias("d2"),
        F.lit(0).cast("long").alias("d3"),
        F.lit(True).alias("ok"),
    )

    # vfp branches (round 9, shift-tolerant since round 10): the video
    # leg — formula frame stacks encoded to real MJPEG-AVI, container-
    # side frame sampling + per-frame dHash
    # (`phash.dhash_video_frames`), then the MODAL-OFFSET banded
    # Hamming funnel (`phash.video_near_dup`): candidates band on
    # (band, key) alone, each verified collision votes its temporal
    # offset f_a−f_b, and the modal offset's count is the match. The
    # frame formula aliases (s·7+f·11 mod 32), so ±1-offset twins
    # occur by construction — 108 expected pairs, 60 of them at a
    # nonzero offset, exactly the trim class the round-9 aligned join
    # missed. JPEG decode is not SQL-expressible, so the oracle pins
    # the deterministic hashes and (pair, n, offset) literals,
    # regenerated by brute-forcing the funnel in pure python over the
    # same payloads (the q90 MC-kernel pattern).
    from ..operators.phash import dhash_video_frames, video_near_dup

    def make_vfp_payloads(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                d = int(mid)
                s = d % 16
                yy, xx = np.mgrid[0:8, 0:9]
                imgs = [
                    (((xx * 5 + yy * 3 + s * 7 + f * 11) % 32) * 8)
                    .astype(np.uint8)[..., None]
                    .repeat(3, axis=-1)
                    for f in range(2 + s % 3)
                ]
                ids.append(d)
                payloads.append(encode_avi_mjpeg(imgs, fps=5))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "video",
                    "payload": payloads,
                    "source": "synthetic",
                }
            )

    vf_media = (
        spark.range(0, _DH_N, 1, _FIXTURE_PARTS)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(make_vfp_payloads, schema=MEDIA_SCHEMA)
    )
    vf_hashes = dhash_video_frames(vf_media, id_col="media_id")
    vf64 = vf_hashes.select(
        F.col("media_id").alias("doc_id"),
        F.lit("vfp64").alias("codec"),
        F.col("frame").alias("d1"),
        F.col("dhash").alias("d2"),
        F.lit(0).cast("long").alias("d3"),
        F.lit(True).alias("ok"),
    )
    vf_pairs = video_near_dup(
        vf_hashes,
        id_col="media_id",
        bands=_DH_BANDS,
        max_hamming=_DH_MAXHAM,
        min_matching_frames=2,
    ).select(
        F.col("id_a").alias("doc_id"),
        F.lit("vfp").alias("codec"),
        F.col("id_b").alias("d1"),
        F.col("n_match").alias("d2"),
        F.col("offset").alias("d3"),
        F.lit(True).alias("ok"),
    )

    out = png.unionByName(jpg).unionByName(wav).unionByName(vid)
    out = out.select(
        F.col("media_id").alias("doc_id"), "codec", "d1", "d2", "d3", "ok"
    )
    # 'adpcm' (round 12): COMPRESSED audio through the first-party
    # IMA-ADPCM codec — formula-driven mono signals encoded at
    # block_align=32 (so every payload crosses a block seam), decoded
    # distributed (`decode_audio_adpcm`). d3 is the decoded FIRST
    # sample: the block header carries it verbatim through the lossy
    # path, so the oracle re-derives it exactly; the quantized tail
    # is pinned nibble-exact against CPython audioop in test_adpcm.
    from ..operators.media_av import encode_wav_ima_adpcm
    from ..operators.multimodal import decode_audio_adpcm

    def make_adpcm(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for raw in pdf["media_id"]:
                d = int(raw)
                n = 64 + (d * 7) % 37
                rate = 8000 + (d % 4) * 2000
                k = np.arange(n, dtype=np.int64)
                sig = (((k + d) * (d + 5) * 131) % 3001 - 1500).astype(
                    np.int16
                )
                payloads.append(
                    encode_wav_ima_adpcm(sig, rate, block_align=32)
                )
                ids.append(d)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "audio",
                    "payload": payloads,
                    "source": "synthetic",
                }
            )

    adpcm_media = (
        spark.range(0, 40, 1, _FIXTURE_PARTS)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(make_adpcm, schema=MEDIA_SCHEMA)
    )
    adpcm = decode_audio_adpcm(adpcm_media).select(
        F.col("media_id").alias("doc_id"),
        F.lit("adpcm").alias("codec"),
        F.col("n_samples").cast("long").alias("d1"),
        F.col("sample_rate").cast("long").alias("d2"),
        F.col("first_sample").cast("long").alias("d3"),
        "ok",
    )
    # 'ifv' (round 13): COMPRESSED video through the first-party
    # inter-frame codec — formula-driven frame stacks with dims off
    # the 8-px block grid (so every payload exercises pad+crop) and a
    # gop=3 GOP structure (every payload crosses an I/P seam), decoded
    # distributed (`decode_video_ifv`). d1/d2 re-derive the header
    # fields (frame count, fps/width/height packed); d3 is pixel
    # (0, 0) of the FIRST frame — an I-frame, lossless by
    # construction, so the oracle re-derives it from the generator
    # formula exactly; the quantized P-frame tail is pinned by the
    # error-bound/seam/translation tests in tests/test_ifv.py.
    from ..operators.media_av import encode_avi_ifv
    from ..operators.multimodal import decode_video_ifv

    def make_ifv(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for raw in pdf["media_id"]:
                d = int(raw)
                h, w, nf = 9 + d % 6, 12 + (d * 5) % 9, 3 + d % 4
                frames = [
                    (
                        (
                            np.add.outer(
                                np.arange(h) * 11, np.arange(w) * 7
                            )[..., None]
                            + np.arange(3) * 29
                            + d * 13
                            + i * 17
                        )
                        % 256
                    ).astype(np.uint8)
                    for i in range(nf)
                ]
                # odd docs ride the TRANSFORM mode ('T' frames, DCT
                # residual coding); docs cycle the THREE r14 entropy
                # stages (zlib / canonical huffman / context-adaptive
                # range coder), so I/P/T frames each decode under
                # every entropy mode here. All modes share the oracle
                # rows — header fields + the lossless first I-frame
                # pixel are mode-independent — so the driver gate
                # covers every decode path
                payloads.append(
                    encode_avi_ifv(
                        frames, fps=5, q=6, gop=3,
                        transform=bool(d % 2),
                        entropy=("huffman", "range", "zlib")[d % 3],
                    )
                )
                ids.append(d)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "video",
                    "payload": payloads,
                    "source": "synthetic",
                }
            )

    ifv_media = (
        spark.range(0, 40, 1, _FIXTURE_PARTS)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(make_ifv, schema=MEDIA_SCHEMA)
    )
    # 'mdct' (round 13): TRANSFORM-CODED audio through the first-party
    # MDCT codec — formula-driven signals at varied lengths/rates,
    # decoded distributed (`decode_audio_mdct`). The transform path is
    # float, so the oracle pins the header-exact fields only (fact
    # sample count, rate, the padding-rule frame count); ok=True still
    # requires a full decode (zlib + mantissa sizes + overlap-add),
    # and the content fidelity is pinned by tests/test_mdct.py's
    # SNR/TDAC/seam suite.
    from ..operators.media_av import encode_wav_mdct
    from ..operators.multimodal import decode_audio_mdct

    def make_mdct(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for raw in pdf["media_id"]:
                d = int(raw)
                n = 300 + (d * 29) % 200
                rate = 8000 + (d % 4) * 2000
                k = np.arange(n, dtype=np.float64)
                sig = (
                    9000.0 * np.sin(2 * np.pi * (100 + d * 7) * k / rate)
                    + 4000.0 * np.sin(2 * np.pi * (300 + d * 11) * k / rate)
                ).astype(np.int16)
                # r14: cycle the entropy (zlib/huffman/range) ×
                # allocation (uniform/psy) mode grid across docs —
                # the oracle fields (fact count, rate, padding-rule
                # frame count) are mode-independent, so the driver
                # gate drives every entropy and allocation decode
                # path
                payloads.append(
                    encode_wav_mdct(
                        sig, rate,
                        entropy=("zlib", "huffman", "range")[d % 3],
                        alloc="psy" if d % 4 >= 2 else "uniform",
                    )
                )
                ids.append(d)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "audio",
                    "payload": payloads,
                    "source": "synthetic",
                }
            )

    mdct_media = (
        spark.range(0, 40, 1, _FIXTURE_PARTS)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(make_mdct, schema=MEDIA_SCHEMA)
    )
    mdct = decode_audio_mdct(mdct_media).select(
        F.col("media_id").alias("doc_id"),
        F.lit("mdct").alias("codec"),
        F.col("n_samples").cast("long").alias("d1"),
        F.col("sample_rate").cast("long").alias("d2"),
        F.col("n_frames").cast("long").alias("d3"),
        "ok",
    )
    # 'xcode' (round 13): the ingest-time COMPRESS pass —
    # `transcode_audio` (PCM → ADPCM, stereo downmixed by integer
    # mean) chained into `decode_audio_adpcm` on the transcoded
    # payloads, so the branch drives transcode + decode end to end.
    # ADPCM's fixed-rate layout makes the compressed byte count an
    # exact function of n (64 + n//2 for sub-block signals), and the
    # block header carries the first DOWNMIXED sample verbatim — both
    # oracle-re-derived from the generator formula, stereo legs
    # included (floor-division downmix is engine-exact).
    from ..operators.media_av import encode_wav
    from ..operators.multimodal import transcode_audio

    def make_pcm(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for raw in pdf["media_id"]:
                d = int(raw)
                n = 80 + (d * 13) % 60
                rate = 8000 + (d % 3) * 4000
                ch = 1 + d % 2
                t = np.arange(n * ch, dtype=np.int64)
                sig = ((t * (d + 7) * 173) % 3001 - 1500).astype(
                    np.int16
                ).reshape(n, ch)
                payloads.append(encode_wav(sig, rate))
                ids.append(d)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "audio",
                    "payload": payloads,
                    "source": "synthetic",
                }
            )

    pcm_media = (
        spark.range(0, 24, 1, _FIXTURE_PARTS)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(make_pcm, schema=MEDIA_SCHEMA)
    )
    xcoded = transcode_audio(pcm_media, codec="adpcm")
    xdec = decode_audio_adpcm(
        xcoded.select("media_id", "payload")
    ).select(
        "media_id",
        F.col("n_samples").cast("long").alias("d2"),
        F.col("first_sample").cast("long").alias("d3"),
        "ok",
    )
    xcode = (
        xcoded.select(
            "media_id",
            F.col("n_bytes_out").alias("d1"),
        )
        .join(xdec, "media_id")
        .select(
            F.col("media_id").alias("doc_id"),
            F.lit("xcode").alias("codec"),
            "d1", "d2", "d3", "ok",
        )
    )
    # 'vxcode' (round 14): the VIDEO compress-at-ingest pass —
    # `transcode_video` (MJPEG → IFV inter-frame, range-coder
    # entropy) chained into `decode_video_ifv` on the transcoded
    # payloads, end to end under the oracle. Header fields carry over
    # from the MJPEG source (frame count, fps/width/height), so the
    # oracle re-derives them from the vfp fixture formula; pixel
    # content is NOT formula-derivable (JPEG quantized it before the
    # re-encode) and is pinned by the error-bound test in
    # tests/test_round14_edges.py instead. ok=True still requires the
    # full transcode + range-decode chain to succeed per payload.
    from ..operators.multimodal import transcode_video

    vxcode = decode_video_ifv(
        transcode_video(vf_media, q=6, gop=3, entropy="range")
        .select("media_id", "payload")
    ).select(
        F.col("media_id").alias("doc_id"),
        F.lit("vxcode").alias("codec"),
        F.col("n_frames").cast("long").alias("d1"),
        (
            F.col("fps").cast("long") * 1_000_000
            + F.col("width").cast("long") * 1_000
            + F.col("height").cast("long")
        ).alias("d2"),
        F.lit(0).cast("long").alias("d3"),
        "ok",
    )
    ifv = decode_video_ifv(ifv_media).select(
        F.col("media_id").alias("doc_id"),
        F.lit("ifv").alias("codec"),
        F.col("n_frames").cast("long").alias("d1"),
        (
            F.col("fps").cast("long") * 1_000_000
            + F.col("width").cast("long") * 1_000
            + F.col("height").cast("long")
        ).alias("d2"),
        F.col("first_pixel").alias("d3"),
        "ok",
    )
    return (
        out.unionByName(dh64)
        .unionByName(dh_pairs)
        .unionByName(dincr)
        .unionByName(af64)
        .unionByName(af_pairs)
        .unionByName(vf64)
        .unionByName(vf_pairs)
        .unionByName(adpcm)
        .unionByName(ifv)
        .unionByName(mdct)
        .unionByName(xcode)
        .unionByName(vxcode)
    )
