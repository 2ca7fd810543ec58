"""Audio/video codecs from scratch (stdlib struct + numpy), closing
the last two multimodal stubs the environment allows:

- **WAV (PCM 16-bit)**: RIFF/WAVE encoder+decoder — the uncompressed
  audio interchange format. Chunk-walked parsing (tolerates extra
  chunks like LIST/INFO), mono or multi-channel, ValueError on
  anything corrupt so the Spark `errors='coerce'` path can null rows.
- **MJPEG-in-AVI**: RIFF 'AVI ' container with one 'vids'/'MJPG'
  stream — each frame is a baseline JPEG from `operators/jpeg.py`'s
  own codec, so the whole video loop (container + per-frame image
  codec) is first-party. avih/strh/strf headers and the idx1 index
  are written spec-shaped; the decoder walks LIST/movi and decodes
  every '00dc'/'00db' chunk.

Compressed audio (MP3/AAC) and inter-frame video (H.264 …) remain
honestly stubbed: they need ffmpeg-class codecs this container lacks
(`multimodal.decode_media(codec='real')`).

Reference parity: the reference treats media as files on disk next to
tracking data (`Visualization.R` renders plots to PNG/GIF); this layer
is the 100 TB-pipeline generalization — payloads as binary columns,
codecs as Arrow-batched executor work (SURVEY.md §2.8).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

# ----------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) or (n, channels) int16 PCM → RIFF/WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    s16 = samples.astype("<i2")
    n, ch = s16.shape
    data = s16.tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → ((n, channels) int16 array, sample_rate).
    PCM 16-bit only; chunk-walks, so extra chunks (LIST/INFO/fact)
    are skipped. Raises ValueError on anything malformed."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    fmt = pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM supported")
    if ch < 1:
        raise ValueError("bad channel count")
    usable = len(pcm) - len(pcm) % (2 * ch)
    if usable == 0:
        raise ValueError("empty data chunk")
    arr = np.frombuffer(pcm[:usable], dtype="<i2").reshape(-1, ch)
    return arr, rate


def resample_wav(payload: bytes, target_rate: int) -> bytes:
    """Nearest-neighbor sample-rate conversion (the audio analogue of
    the image resize path): index-map resampling, exact and
    deterministic — a production pipeline would swap in a windowed-sinc
    kernel at this single choke point."""
    arr, rate = decode_wav(payload)
    n_out = max(1, int(len(arr)) * target_rate // rate)
    idx = (np.arange(n_out, dtype=np.int64) * rate) // target_rate
    return encode_wav(arr[np.minimum(idx, len(arr) - 1)], target_rate)


# ------------------------------------------------------------ MJPEG/AVI

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """List of (h, w[, c]) uint8 frames → RIFF 'AVI ' bytes with one
    MJPG video stream; every frame is a keyframe (that IS Motion-JPEG:
    no inter-frame state, which is why a from-scratch implementation
    is tractable and why MJPEG splits embarrassingly across executors
    at scale — any frame chunk can decode anywhere)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        j = encode_jpeg(f, quality)
        jpegs.append(j + (b"\x00" if len(j) & 1 else b""))

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body

    def lst(four_cc: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + four_cc + body

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, _AVIF_HASINDEX, len(jpegs),
        0, 1, max(map(len, jpegs)), w, h, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER: flags, priority, language, initialFrames,
    # scale, rate (fps = rate/scale), start, length, suggestedBuffer,
    # quality, sampleSize, rcFrame
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(jpegs), max(map(len, jpegs)), 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    idx, off = [], 4  # offsets are relative to the 'movi' fourcc
    for j in jpegs:
        idx.append(struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, off, len(j)))
        off += 8 + len(j)
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> tuple[list[np.ndarray], int]:
    """RIFF 'AVI ' bytes → (list of decoded frames, fps). Walks the
    chunk tree; every '00dc'/'00db' inside LIST/movi is decoded with
    the first-party JPEG decoder. ValueError on anything malformed."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    us_per_frame = None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if pos + 8 + ln > end:
                raise ValueError(f"truncated {cid!r} chunk")
            if cid == b"LIST":
                walk(pos + 12, pos + 8 + ln)
            elif cid == b"avih":
                if ln < 4:
                    raise ValueError("avih too short")
                (us_per_frame,) = struct.unpack(
                    "<I", data[pos + 8 : pos + 12]
                )
            elif cid in (b"00dc", b"00db"):
                body = data[pos + 8 : pos + 8 + ln].rstrip(b"\x00")
                frames.append(decode_jpeg(body))
            pos += 8 + ln + (ln & 1)

    walk(12, end)
    if not frames:
        raise ValueError("no video frames found")
    fps = 1_000_000 // us_per_frame if us_per_frame else 0
    return frames, fps


def sample_avi_frames(
    payload: bytes, every_n: int = 1
) -> list[np.ndarray]:
    """Frame sampling WITHOUT decoding skipped frames: because MJPEG
    frames are independent, the walker can slice the chunk list first
    and run the (expensive) JPEG decode only on kept frames — the
    container-level analogue of Parquet row-group pruning."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    raw: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if pos + 8 + ln > end:
                raise ValueError(f"truncated {cid!r} chunk")
            if cid == b"LIST":
                walk(pos + 12, pos + 8 + ln)
            elif cid in (b"00dc", b"00db"):
                raw.append(data[pos + 8 : pos + 8 + ln].rstrip(b"\x00"))
            pos += 8 + ln + (ln & 1)

    walk(12, end)
    return [decode_jpeg(b) for b in raw[::every_n]]
