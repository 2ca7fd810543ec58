"""Multimodal columns: image/audio/video as opaque `binary` payloads
with typed metadata, processed by Arrow-batched pandas functions over
mapInPandas.

Codec support (all first-party — no PIL/ffmpeg in this container):
- `codec="png"` REAL: pure-stdlib (zlib/struct) PNG decoder+encoder —
  8-bit gray/gray+alpha/RGB/RGBA, all five scanline filters,
  CRC-checked chunks.
- `codec="jpeg"` REAL: from-scratch baseline JPEG (operators/jpeg.py).
- audio REAL for PCM WAV (`decode_audio`/`resample_audio`, backed by
  operators/media_av.py), video REAL for MJPEG-in-AVI
  (`decode_video` — RIFF container walk + own JPEG per frame, with
  container-level frame sampling that never decodes skipped frames).
- `codec="real"` remains the STUB for what genuinely needs
  ffmpeg-class codecs: compressed audio (MP3/AAC) and inter-frame
  video (H.264 …); it raises NotImplementedError at the single
  clearly-marked point.
- `codec="fake"` produces a deterministic pseudo-decode so plumbing
  tests run without constructing payloads.

Scale notes: payloads stay binary end-to-end (no base64 inflation);
metadata extraction is a narrow projection so Parquet scans can prune
the payload column when only metadata is needed; decode/feature
stages run mapInPandas with `maxRecordsPerBatch` bounding executor
memory against large blobs.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- pure-stdlib PNG codec -------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → sample channels (8-bit only; no palette)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _png_chunks(data: bytes):
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        yield ctype, chunk
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("truncated PNG")


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a (h, w, channels) uint8
    array: parse + CRC-check chunks, inflate IDAT, reverse the per-row
    filter (None/Sub/Up/Average/Paeth)."""
    w = h = channels = None
    idat = b""
    for ctype, chunk in _png_chunks(bytes(payload)):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise ValueError("unsupported PNG variant")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += chunk
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("bad pixel-stream length")
    # Filter reversal is per-row numpy where the recurrence allows it:
    # Up is a whole-row wrap-add against the prior reconstructed row,
    # Sub is a per-channel prefix sum mod 256. Average/Paeth recurse on
    # the already-reconstructed LEFT byte, so they stay scalar — real
    # encoders (including ours) rarely emit them, and per-byte Python
    # across every row was the hot cost for non-toy images.
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = int(rows[r, 0])
        line = rows[r, 1:]
        if ft == 0:
            rec = line.copy()
        elif ft == 1:  # Sub: recon[i] = Σ raw mod 256 within channel
            rec = (
                (line.reshape(-1, channels).astype(np.uint32).cumsum(axis=0) & 0xFF)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ft == 2:  # Up: uint8 addition wraps mod 256 by itself
            rec = line + prev
        elif ft in (3, 4):
            lb = bytearray(line.tobytes())
            pb = bytearray(prev.tobytes())
            if ft == 3:  # Average
                for i in range(stride):
                    a = lb[i - channels] if i >= channels else 0
                    lb[i] = (lb[i] + (a + pb[i]) // 2) & 0xFF
            else:  # Paeth
                for i in range(stride):
                    a = lb[i - channels] if i >= channels else 0
                    b = pb[i]
                    c = pb[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb_, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb_ and pa <= pc else (b if pb_ <= pc else c)
                    lb[i] = (lb[i] + pr) & 0xFF
            rec = np.frombuffer(bytes(lb), dtype=np.uint8)
        else:
            raise ValueError(f"bad filter type {ft}")
        out[r] = rec
        prev = rec
    return out.reshape(h, w, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (h, w, channels) uint8 array as a PNG (filter 0 rows,
    one zlib-compressed IDAT)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, channels = a.shape
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLOR[channels], 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )

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
    """Decode: `codec='png'` / `codec='jpeg'` run the real pure-
    stdlib+numpy decoders (unparseable payloads coerce to ok=False,
    the errors='coerce' pattern); `codec='real'` is the integration
    point for the audio/video formats this container lacks;
    `codec='fake'` is the plumbing pseudo-decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg

        decoders = {"png": decode_png, "jpeg": decode_jpeg}
        for pdf in it:
            if codec == "real":
                # ---- STUB: audio/video codecs not in this environment ----
                raise NotImplementedError(
                    "decoding EXTERNAL container formats (MP3/AAC/"
                    "H.264 files produced by other encoders) requires "
                    "ffmpeg; not installed. Every perceptual STAGE now "
                    "exists first-party: decode_audio_mdct (MDCT "
                    "transform audio with canonical-Huffman entropy "
                    "coding and psychoacoustic masking-driven bit "
                    "allocation — the MP3/AAC pipeline), "
                    "decode_video_ifv (motion-compensated inter-frame "
                    "video with DCT transform mode and Huffman or "
                    "context-adaptive binary range-coder entropy — "
                    "the full H.26x pipeline structure including the "
                    "CABAC-family stage), decode_audio_adpcm, "
                    "decode_audio (PCM "
                    "WAV), decode_video (MJPEG/AVI), "
                    "codec='png'/'jpeg', or 'fake'. The remaining gap "
                    "is bitstream-format compatibility with external "
                    "files, not codec capability"
                )
            w, h, c, ok = [], [], [], []
            for payload in pdf["payload"]:
                if codec in decoders:
                    try:
                        arr = decoders[codec](bytes(payload))
                        w.append(arr.shape[1])
                        h.append(arr.shape[0])
                        c.append(arr.shape[2])
                        ok.append(True)
                    except (TypeError, ValueError, zlib.error, struct.error,
                            IndexError, KeyError, OverflowError):
                        w.append(None)
                        h.append(None)
                        c.append(None)
                        ok.append(False)
                elif payload is None:
                    # an upstream coerce nulled this row: propagate
                    w.append(None)
                    h.append(None)
                    c.append(None)
                    ok.append(False)
                else:
                    digest = hashlib.md5(bytes(payload)).digest()
                    # deterministic fake dimensions from the content hash
                    w.append(64 + digest[0] % 192)
                    h.append(64 + digest[1] % 192)
                    c.append(3)
                    ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "n_channels": pd.array(c, dtype="Int32"),
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
                if payload is None:
                    feats.append(None)
                    continue
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
    """Resize: emits a transformed binary payload + target dims.
    `codec='png'` / `codec='jpeg'` do a real nearest-neighbor resample
    through the pure-stdlib codecs; `codec='real'` is the ffmpeg
    integration point for audio/video; the fake path derives a
    deterministic payload of size ∝ width·height from the content
    hash, so downstream byte-length/metadata plumbing behaves like a
    real resize (output size independent of input size)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg, encode_jpeg

        codecs = {
            "png": (decode_png, encode_png),
            "jpeg": (decode_jpeg, encode_jpeg),
        }
        out_len = max(width * height // 64, 16)
        for pdf in it:
            if codec == "real":
                # ---- STUB: audio/video codecs not in this environment ----
                raise NotImplementedError(
                    "compressed audio/video resize requires ffmpeg; "
                    "not installed — use codec='png'/'jpeg', "
                    "resample_audio (PCM WAV), or 'fake'"
                )
            payloads = []
            for payload in pdf["payload"]:
                if codec in codecs:
                    # real resample: decode → nearest-neighbor → encode;
                    # corrupt payloads coerce to a null row (same
                    # errors='coerce' contract as decode_media) instead
                    # of failing the whole Arrow batch/job
                    dec, enc = codecs[codec]
                    try:
                        arr = dec(bytes(payload))
                        ys = (np.arange(height) * arr.shape[0]) // height
                        xs = (np.arange(width) * arr.shape[1]) // width
                        payloads.append(enc(arr[ys][:, xs]))
                    except (TypeError, ValueError, zlib.error, struct.error,
                            IndexError, KeyError, OverflowError):
                        payloads.append(None)
                elif payload is None:
                    payloads.append(None)  # propagate upstream nulls
                else:
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


# --- real audio/video paths (operators/media_av.py codecs) -----------------

AUDIO_SCHEMA = (
    "media_id long, n_samples long, sample_rate int, n_channels int, "
    "ok boolean"
)


def decode_audio(df: DataFrame) -> DataFrame:
    """Audio metadata through the REAL first-party WAV codec
    (`media_av.decode_wav`): PCM 16-bit RIFF/WAVE parsed with the same
    errors='coerce' contract as the image paths. Compressed formats
    (MP3/AAC) stay behind `decode_media(codec='real')`'s stub — they
    need ffmpeg-class decoders this container lacks."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_av import decode_wav

        for pdf in it:
            ns, sr, ch, ok = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    arr, rate = decode_wav(bytes(payload))
                    ns.append(arr.shape[0])
                    sr.append(rate)
                    ch.append(arr.shape[1])
                    ok.append(True)
                except (TypeError, ValueError, struct.error, IndexError,
                        KeyError, OverflowError):
                    ns.append(None)
                    sr.append(None)
                    ch.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "sample_rate": pd.array(sr, dtype="Int32"),
                    "n_channels": pd.array(ch, dtype="Int32"),
                    "ok": ok,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_SCHEMA
    )


ADPCM_AUDIO_SCHEMA = (
    "media_id long, n_samples long, sample_rate int, "
    "first_sample int, ok boolean"
)

IFV_VIDEO_SCHEMA = (
    "media_id long, n_frames long, fps int, width int, height int, "
    "first_pixel long, ok boolean"
)

MDCT_AUDIO_SCHEMA = (
    "media_id long, n_samples long, sample_rate int, frame int, "
    "qbits int, n_frames long, ok boolean"
)


def decode_audio_mdct(df: DataFrame) -> DataFrame:
    """TRANSFORM-CODED audio metadata through the first-party MDCT
    codec (`media_av.decode_wav_mdct`, round 13): same errors='coerce'
    contract as the other decoders. Emits the header-exact fields
    (fact sample count, rate, frame size, qbits, the padding-rule
    frame count) — the transform path is float, so content fields are
    pinned by the SNR/seam tests in tests/test_mdct.py, not the
    oracle; ok=True still requires a FULL decode (zlib + mantissa
    block sizes + overlap-add), so a corrupted payload cannot pass."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib as _z

        from .media_av import decode_wav_mdct, mdct_info

        for pdf in it:
            ns, sr, fr, qb, nf, ok = [], [], [], [], [], []
            for payload in pdf["payload"]:
                try:
                    arr, rate = decode_wav_mdct(bytes(payload))
                    info = mdct_info(bytes(payload))
                    ns.append(len(arr))
                    sr.append(rate)
                    fr.append(info["frame"])
                    qb.append(info["qbits"])
                    nf.append(info["n_frames"])
                    ok.append(True)
                except (TypeError, ValueError, _z.error, struct.error,
                        IndexError, KeyError, OverflowError):
                    ns.append(None)
                    sr.append(None)
                    fr.append(None)
                    qb.append(None)
                    nf.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "sample_rate": pd.array(sr, dtype="Int32"),
                    "frame": pd.array(fr, dtype="Int32"),
                    "qbits": pd.array(qb, dtype="Int32"),
                    "n_frames": pd.array(nf, dtype="Int64"),
                    "ok": ok,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=MDCT_AUDIO_SCHEMA
    )


def decode_video_ifv(df: DataFrame, every_n: int = 1) -> DataFrame:
    """COMPRESSED (inter-frame) video metadata through the first-party
    IFV codec (`media_av.decode_avi_ifv`, round 13): same
    errors='coerce' contract as the other decoders. Emits
    `first_pixel` — R + 256·G + 65536·B of pixel (0, 0) of the FIRST
    frame, which is an I-frame and therefore LOSSLESS, so an oracle
    can re-derive it exactly while the quantized P-frame tail stays
    pinned by the error-bound/seam tests in tests/test_ifv.py.
    Payloads decode where they sit (mapInPandas, never shuffled).

    `every_n` > 1 routes through the GOP-PRUNED sampler
    (`media_av.sample_ifv_frames`): whole GOPs with no kept frame are
    skipped without inflating a byte, and a touched GOP decodes only
    up to its last kept index — THE property that makes the GOP the
    executor split unit at 100 TB (decode cost scales with GOPs
    touched, not stream length). `n_frames` then counts the SAMPLED
    frames; fps/width/height still report the container's native
    header values (a header-only probe, no extra inflate)."""
    if every_n < 1:
        raise ValueError("decode_video_ifv: every_n must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        from .media_av import decode_avi_ifv, ifv_info, sample_ifv_frames

        for pdf in it:
            nf, fps, w, h, px, ok = [], [], [], [], [], []
            for payload in pdf["payload"]:
                try:
                    if every_n == 1:
                        frames, rate = decode_avi_ifv(bytes(payload))
                    else:
                        frames = sample_ifv_frames(
                            bytes(payload), every_n
                        )
                        rate = ifv_info(bytes(payload))["fps"]
                    f0 = frames[0]
                    nf.append(len(frames))
                    fps.append(rate)
                    w.append(f0.shape[1])
                    h.append(f0.shape[0])
                    px.append(
                        int(f0[0, 0, 0])
                        + 256 * int(f0[0, 0, 1])
                        + 65536 * int(f0[0, 0, 2])
                    )
                    ok.append(True)
                except (TypeError, ValueError, zlib.error, struct.error,
                        IndexError, KeyError, OverflowError):
                    nf.append(None)
                    fps.append(None)
                    w.append(None)
                    h.append(None)
                    px.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": pd.array(nf, dtype="Int64"),
                    "fps": pd.array(fps, dtype="Int32"),
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "first_pixel": pd.array(px, dtype="Int64"),
                    "ok": ok,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=IFV_VIDEO_SCHEMA
    )


def decode_audio_adpcm(df: DataFrame) -> DataFrame:
    """COMPRESSED audio metadata through the first-party IMA-ADPCM
    codec (`media_av.decode_wav_ima_adpcm`, round 12): same
    errors='coerce' contract as `decode_audio`. Emits the decoded
    `first_sample` alongside the counts — the block header carries it
    verbatim through the lossy path, so an oracle can re-derive it
    exactly while the quantized tail stays pinned by the audioop
    cross-check in tests."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_av import decode_wav_ima_adpcm

        for pdf in it:
            ns, sr, fs, ok = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    arr, rate = decode_wav_ima_adpcm(bytes(payload))
                    ns.append(arr.shape[0])
                    sr.append(rate)
                    fs.append(int(arr[0]))
                    ok.append(True)
                except (TypeError, ValueError, struct.error, IndexError,
                        KeyError, OverflowError):
                    ns.append(None)
                    sr.append(None)
                    fs.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "sample_rate": pd.array(sr, dtype="Int32"),
                    "first_sample": pd.array(fs, dtype="Int32"),
                    "ok": ok,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=ADPCM_AUDIO_SCHEMA
    )


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """Real sample-rate conversion through the WAV codec (nearest-
    neighbor index map — the audio analogue of the image resize path).
    Output payloads are valid WAV bytes at `target_rate`; corrupt
    inputs coerce to null."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_av import resample_wav

        for pdf in it:
            payloads = []
            for payload in pdf["payload"]:
                try:
                    payloads.append(resample_wav(bytes(payload), target_rate))
                except (TypeError, ValueError, struct.error, IndexError,
                        KeyError, OverflowError):
                    payloads.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": target_rate,
                    "height": 0,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZE_SCHEMA
    )


TRANSCODE_SCHEMA = (
    "media_id long, payload binary, n_bytes_in long, n_bytes_out long"
)


def transcode_audio(
    df: DataFrame,
    codec: str = "adpcm",
    entropy: str = "zlib",
    alloc: str = "uniform",
) -> DataFrame:
    """PCM-WAV payloads → COMPRESSED payloads through a first-party
    codec ('adpcm' — 4:1 fixed-rate integer DSP, or 'mdct' —
    content-adaptive transform coding): the compress-before-storage
    pass a 100 TB media pipeline runs once at ingest. Distributed
    mapInPandas; payloads never shuffle; corrupt inputs coerce to a
    null row (the resize_audio contract). Multi-channel inputs
    downmix deterministically (integer mean across channels —
    floor division, bit-stable on any platform); both target codecs
    are mono by design. Emits before/after byte counts so the
    achieved ratio is a queryable column.

    `entropy`/`alloc` (round 14) forward to the MDCT encoder's
    entropy-stage and bit-allocation knobs; ADPCM has neither stage,
    so non-default values with codec='adpcm' raise on the driver
    rather than being silently ignored."""
    if codec not in ("adpcm", "mdct"):
        raise ValueError(
            f"transcode_audio: codec must be 'adpcm' or 'mdct' "
            f"(got {codec!r})"
        )
    if entropy not in ("zlib", "huffman", "range") or alloc not in (
        "uniform", "psy",
    ):
        raise ValueError(
            "transcode_audio: entropy must be zlib/huffman/range, "
            "alloc uniform/psy"
        )
    if codec == "adpcm" and (entropy != "zlib" or alloc != "uniform"):
        raise ValueError(
            "transcode_audio: entropy/alloc apply to the MDCT codec "
            "only — ADPCM has no entropy stage or band allocator"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib as _z

        from .media_av import (
            decode_wav,
            encode_wav_ima_adpcm,
            encode_wav_mdct,
        )

        for pdf in it:
            outs, nin, nout = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    # an upstream coerce already nulled this row
                    # (resample/transcode failure): propagate the
                    # null instead of dying on bytes(None)
                    outs.append(None)
                    nin.append(None)
                    nout.append(None)
                    continue
                raw = bytes(payload)
                try:
                    arr, rate = decode_wav(raw)
                    if arr.shape[1] > 1:
                        mono = (
                            arr.astype(np.int32).sum(axis=1)
                            // arr.shape[1]
                        ).astype(np.int16)
                    else:
                        mono = arr[:, 0]
                    enc = (
                        encode_wav_ima_adpcm(mono, rate)
                        if codec == "adpcm"
                        else encode_wav_mdct(
                            mono, rate, entropy=entropy, alloc=alloc
                        )
                    )
                    outs.append(enc)
                    nin.append(len(raw))
                    nout.append(len(enc))
                except (TypeError, ValueError, _z.error, struct.error,
                        IndexError, KeyError, OverflowError):
                    outs.append(None)
                    nin.append(len(raw))
                    nout.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": outs,
                    "n_bytes_in": pd.array(nin, dtype="Int64"),
                    "n_bytes_out": pd.array(nout, dtype="Int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=TRANSCODE_SCHEMA
    )


def transcode_video(
    df: DataFrame,
    q: int = 8,
    gop: int = 8,
    search: int = 4,
    transform: bool = False,
    entropy: str = "zlib",
) -> DataFrame:
    """MJPEG-AVI payloads → IFV inter-frame payloads: the VIDEO leg
    of the compress-before-storage ingest pass (`transcode_audio`'s
    sibling). Intra-only MJPEG is what crawls and capture rigs
    produce (every frame a keyframe — large); re-encoding through the
    motion-compensated codec buys the inter-frame redundancy back and
    chooses the entropy stage per the q/gop/transform/entropy knobs.

    Distributed mapInPandas; payloads never shuffle; corrupt or
    non-MJPEG inputs coerce to a null row with `n_bytes_in` kept for
    audit (the transcode_audio contract). fps carries over from the
    source container (a header-less source defaults to 10). The
    re-encode is lossy RELATIVE TO THE DECODED MJPEG FRAMES within
    the IFV error bound (q//2+1 spatial; JPEG already quantized the
    pixels before us), and I-frames preserve the decoded frames
    exactly."""
    # validate the knobs HERE, once on the driver — encode_avi_ifv
    # would raise identically, but inside the coerce loop that means
    # every row silently nulls instead of the caller learning the
    # configuration is wrong
    if entropy not in ("zlib", "huffman", "range"):
        raise ValueError(
            "transcode_video: entropy must be 'zlib', 'huffman', or "
            "'range'"
        )
    if not 2 <= q <= 255 or gop < 1 or not 0 <= search <= 120:
        raise ValueError(
            "transcode_video: q in [2, 255], gop >= 1, "
            "search in [0, 120] required"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_av import decode_avi_mjpeg, encode_avi_ifv

        for pdf in it:
            outs, nin, nout = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    outs.append(None)
                    nin.append(None)
                    nout.append(None)
                    continue
                raw = bytes(payload)
                try:
                    frames, fps = decode_avi_mjpeg(raw)
                    enc = encode_avi_ifv(
                        [
                            f if f.ndim == 3 and f.shape[2] == 3
                            else np.repeat(
                                f[..., :1] if f.ndim == 3 else f[..., None],
                                3, axis=-1,
                            )
                            for f in frames
                        ],
                        fps=fps if fps >= 1 else 10,
                        q=q, gop=gop, search=search,
                        transform=transform, entropy=entropy,
                    )
                    outs.append(enc)
                    nin.append(len(raw))
                    nout.append(len(enc))
                except (TypeError, ValueError, zlib.error, struct.error,
                        IndexError, KeyError, OverflowError):
                    outs.append(None)
                    nin.append(len(raw))
                    nout.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": outs,
                    "n_bytes_in": pd.array(nin, dtype="Int64"),
                    "n_bytes_out": pd.array(nout, dtype="Int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=TRANSCODE_SCHEMA
    )


VIDEO_SCHEMA = (
    "media_id long, n_frames long, width int, height int, fps int, "
    "ok boolean"
)


def decode_video(df: DataFrame, every_n: int = 1) -> DataFrame:
    """Video metadata through the REAL first-party MJPEG/AVI path
    (`media_av`): the RIFF container is chunk-walked and every kept
    frame decodes through our own baseline JPEG codec. `every_n`
    samples frames at the container level BEFORE any JPEG decode —
    skipped frames are never decompressed (MJPEG frames are
    independent), which is the row-group-pruning analogue for video
    and the reason MJPEG fan-out across executors needs no codec
    state. Inter-frame codecs (H.264 …) stay behind
    `decode_media(codec='real')`'s stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_av import decode_avi_mjpeg, sample_avi_frames

        for pdf in it:
            nf, w, h, fps_l, ok = [], [], [], [], []
            for payload in pdf["payload"]:
                try:
                    if every_n > 1:
                        frames = sample_avi_frames(bytes(payload), every_n)
                        fps = 0
                    else:
                        frames, fps = decode_avi_mjpeg(bytes(payload))
                    nf.append(len(frames))
                    h.append(frames[0].shape[0])
                    w.append(frames[0].shape[1])
                    fps_l.append(fps)
                    ok.append(True)
                except (TypeError, ValueError, struct.error, IndexError,
                        KeyError, OverflowError):
                    nf.append(None)
                    w.append(None)
                    h.append(None)
                    fps_l.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": pd.array(nf, dtype="Int64"),
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "fps": pd.array(fps_l, dtype="Int32"),
                    "ok": ok,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=VIDEO_SCHEMA
    )
