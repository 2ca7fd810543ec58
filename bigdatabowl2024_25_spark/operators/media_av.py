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

- **IMA ADPCM (round 12)**: a real COMPRESSED audio codec — 4-bit
  DVI/IMA ADPCM in the standard WAV container (wFormatTag 0x0011),
  ~4:1 vs 16-bit PCM, pure integer DSP, nibble-stream-equal to
  CPython's audioop reference (test-pinned). Narrows the stub below
  to the perceptual-transform families.
- **IFV inter-frame video (round 13)**: a real MOTION-COMPENSATED
  video codec in the same AVI container — GOP structure (lossless
  zlib I-frames every `gop` frames), per-block full-search motion
  estimation against the previous RECONSTRUCTED frame (closed-loop
  DPCM, the structure every real inter codec shares), quantized
  residuals, deterministic end to end. Narrows the remaining video
  stub to the transform-coded families (H.264-class DCT/CABAC).
- **MDCT transform audio (round 13)**: a real TRANSFORM audio codec —
  50%-overlapped sine-windowed MDCT (the Princen-Bradley lapped
  transform every perceptual codec is built on), per-frame
  scalefactor + int8/int16 mantissa quantization, zlib entropy stage,
  in a WAV-shaped container under a private format tag. The MP3/AAC
  skeleton minus the psychoacoustic bit-allocation model.

What remains honestly stubbed
(`multimodal.decode_media(codec='real')`): STANDARDS-CONFORMANT
bitstreams only — MP3/AAC (psychoacoustic models + standard Huffman
tables) and H.26x (CABAC/CAVLC entropy conformance). Every
compression TECHNIQUE family now has a first-party member above:
predictive audio (ADPCM), transform audio (MDCT), inter-frame motion
compensation (IFV), and transform-coded video residuals (IFV 'T'
mode).

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


# --------------------------------------------------------- IMA ADPCM
#
# A REAL compressed-audio codec (round 12): IMA/DVI ADPCM inside the
# standard WAV container (wFormatTag 0x0011) — 4 bits per sample, so
# ~4:1 against 16-bit PCM, in pure integer DSP (spec: IMA Digital
# Audio Focus and Technical Working Groups, 1992; the format ffmpeg
# calls adpcm_ima_wav). This narrows the "compressed audio" stub in
# `multimodal.decode_media(codec='real')` to the perceptual-transform
# families (MP3/AAC) that genuinely need ffmpeg-class code: lossy
# COMPRESSION itself is now first-party, deterministic, and
# container-correct (a stock player can read these files). Mono only
# — multi-channel interleaves nibbles in 4-byte word groups, plumbing
# that adds no algorithmic coverage.

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One decoder state transition (shared by encode's feedback path
    — the encoder must track exactly what the decoder will
    reconstruct, or the error feeds forward)."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    if nibble & 8:
        predictor -= diff
    else:
        predictor += diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + int(_IMA_INDEX[nibble & 7])))
    return predictor, index


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int = 16_000, block_align: int = 1024
) -> bytes:
    """(n,) int16 mono PCM → RIFF/WAVE with IMA ADPCM data. Each
    block: 4-byte header (first sample verbatim as int16 LE + step
    index + reserved 0) then two 4-bit codes per byte, low nibble
    first; samples_per_block = (block_align − 4)·2 + 1. The step
    index carries ACROSS blocks (each block header snapshots it), so
    splitting the stream differently changes nothing. Deterministic:
    same samples → same bytes."""
    samples = np.asarray(samples)
    if samples.ndim != 1:
        raise ValueError("encode_wav_ima_adpcm: mono (1-D) input only")
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_ima_adpcm: int16 samples required")
    if len(samples) == 0:
        raise ValueError("encode_wav_ima_adpcm: empty input")
    if block_align < 5:
        # spb = (block_align-4)*2+1 ≤ 1: at 4 every block is a bare
        # header (legal but useless), below 4 the block loop would
        # silently emit an EMPTY data chunk
        raise ValueError(
            "encode_wav_ima_adpcm: block_align must be >= 5 "
            "(4 header bytes + at least one nibble byte)"
        )
    spb = (block_align - 4) * 2 + 1
    index = 0
    blocks = []
    for lo in range(0, len(samples), spb):
        chunk = samples[lo:lo + spb]
        predictor = int(chunk[0])
        blocks.append(struct.pack("<hBB", predictor, index, 0))
        nibbles = []
        for s in chunk[1:]:
            step = int(_IMA_STEPS[index])
            diff = int(s) - predictor
            nib = 8 if diff < 0 else 0
            mag = -diff if diff < 0 else diff
            if mag >= step:
                nib |= 4
                mag -= step
            if mag >= step >> 1:
                nib |= 2
                mag -= step >> 1
            if mag >= step >> 2:
                nib |= 1
            predictor, index = _ima_step(predictor, index, nib)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad nibble, decoder drops by count
        packed = bytes(
            nibbles[i] | (nibbles[i + 1] << 4)
            for i in range(0, len(nibbles), 2)
        )
        blocks.append(packed)
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, sample_rate,
        sample_rate * block_align // spb,  # nominal byte rate
        block_align, 4,  # bits per sample
        2, spb,          # cbSize + wSamplesPerBlock extension
    )
    fact = struct.pack("<I", len(samples))
    riff = b"".join([
        b"WAVEfmt ", struct.pack("<I", len(fmt)), fmt,
        b"fact", struct.pack("<I", len(fact)), fact,
        b"data", struct.pack("<I", len(data)), data,
    ])
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav_ima_adpcm(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE IMA-ADPCM (mono, format 0x0011) → ((n,) int16,
    sample_rate). Chunk-walked like `decode_wav`; ValueError on
    anything that is not a well-formed mono IMA file, so the Spark
    errors='coerce' path can null rows.

    Fact-less files (legal, if non-conforming — our encoder always
    writes 'fact'): the decode is still bounded by the data-chunk
    length and block structure (each block yields exactly
    1 + 2·(block bytes − 4) samples; the RIFF odd-size pad byte is
    excluded by the chunk walk), but the final block's pad nibble is
    not distinguishable from a real sample without the fact count, so
    such files may keep at most ONE spurious trailing sample. That
    ambiguity is inherent to the format, not recoverable."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_raw, data, n_samples = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_raw = body
        elif cid == b"fact" and len(body) >= 4:
            (n_samples,) = struct.unpack_from("<I", body)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt_raw is None or data is None or len(fmt_raw) < 2:
        raise ValueError("missing fmt/data chunk")
    # diagnose the format tag BEFORE requiring the IMA-sized fmt
    # extension — a plain PCM file (16-byte fmt) should say "not IMA",
    # not "truncated"
    (tag,) = struct.unpack_from("<H", fmt_raw)
    if tag != 0x0011:
        raise ValueError(f"not IMA ADPCM (wFormatTag={tag:#06x})")
    if len(fmt_raw) < 20:
        raise ValueError("truncated IMA fmt chunk")
    _tag, ch, rate, _br, block_align, bits, _cb, spb = struct.unpack_from(
        "<HHIIHHHH", fmt_raw
    )
    if ch != 1 or bits != 4:
        raise ValueError("mono 4-bit IMA ADPCM only")
    if spb != (block_align - 4) * 2 + 1:
        raise ValueError("inconsistent samples-per-block")
    out: list[int] = []
    for lo in range(0, len(data), block_align):
        block = data[lo:lo + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block header")
        predictor, index, _rsv = struct.unpack_from("<hBB", block)
        if index > 88:
            raise ValueError("step index out of range")
        out.append(predictor)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                predictor, index = _ima_step(predictor, index, nib)
                out.append(predictor)
    if n_samples is not None:
        if n_samples > len(out):
            raise ValueError("fact count exceeds decoded samples")
        out = out[:n_samples]  # drop block/byte padding
    return np.array(out, dtype=np.int16), rate


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
        jpegs.append(encode_jpeg(f, quality))

    def chunk(cid: bytes, body: bytes) -> bytes:
        # RIFF spec: the declared size EXCLUDES the word-alignment pad
        # byte; the pad is appended outside it (and counts toward the
        # enclosing LIST's size). Pre-r14 the pad was folded into the
        # size and decoders stripped trailing NULs to compensate — an
        # interop trap for conformant external files whose odd body
        # legitimately ends in 0x00.
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

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
        off += 8 + len(j) + (len(j) & 1)
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
                # ln excludes the RIFF pad byte (spec), so the slice
                # is exact — the pad is skipped by the ln&1 advance
                frames.append(decode_jpeg(data[pos + 8 : pos + 8 + ln]))
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
                raw.append(data[pos + 8 : pos + 8 + ln])
            pos += 8 + ln + (ln & 1)

    walk(12, end)
    return [decode_jpeg(b) for b in raw[::every_n]]


# ------------------------------------------------------ IFV (inter-frame)

#: padded-block edge for motion estimation / residual coding; every
#: frame is edge-replicated up to a multiple of this internally and
#:  cropped back on decode (true dims live in the AVI headers)
_IFV_BLOCK = 8


def _ifv_pad(frame: np.ndarray, B: int) -> np.ndarray:
    h, w = frame.shape[:2]
    ph, pw = (-h) % B, (-w) % B
    if ph or pw:
        frame = np.pad(frame, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return frame


_DCT8: np.ndarray | None = None


def _dct8() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix (C @ C.T == I), cached — the
    same transform class JPEG and H.26x residual coding use."""
    global _DCT8
    if _DCT8 is None:
        x = np.arange(8)
        C = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
        C *= np.sqrt(2.0 / 8.0)
        C[0] *= 1.0 / np.sqrt(2.0)
        _DCT8 = C
    return _DCT8


def _blocks_dct(resid: np.ndarray) -> np.ndarray:
    """Per-8×8-block, per-channel forward DCT of a (ph, pw, 3)
    residual plane (ph, pw multiples of 8)."""
    C = _dct8()
    ph, pw = resid.shape[:2]
    R = resid.reshape(ph // 8, 8, pw // 8, 8, 3).astype(np.float64)
    D = np.einsum("ub,ibjck,vc->iujvk", C, R, C, optimize=True)
    return D.reshape(ph, pw, 3)


def _blocks_idct(coef: np.ndarray) -> np.ndarray:
    """Inverse of `_blocks_dct` (orthonormal → transpose)."""
    C = _dct8()
    ph, pw = coef.shape[:2]
    D = coef.reshape(ph // 8, 8, pw // 8, 8, 3)
    R = np.einsum("ub,iujvk,vc->ibjck", C, D, C, optimize=True)
    return R.reshape(ph, pw, 3)


def _ifv_shift(frame: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Motion-compensated source block fetch with border clamp
    (unrestricted MVs: out-of-frame references clamp to the edge —
    the standard edge-extension rule)."""
    h, w = frame.shape[:2]
    ys = np.clip(np.arange(h) + dy, 0, h - 1)
    xs = np.clip(np.arange(w) + dx, 0, w - 1)
    return frame[ys][:, xs]


def _bounded_inflate(data: bytes, expected: int, what: str) -> bytes:
    """zlib inflate with the output size KNOWN from headers and
    enforced during decompression — an attacker-sized stream (a
    decompression bomb in a 100 KB payload) must raise the coerce
    path's ValueError after at most `expected`+1 bytes, never OOM an
    executor. Also rejects short streams and trailing garbage."""
    import zlib

    d = zlib.decompressobj()
    try:
        raw = d.decompress(data, expected + 1)
    except zlib.error as exc:
        # normalize to the family's ValueError contract (huffman and
        # range already raise it): a corrupt deflate stream must look
        # the same to callers as any other malformed payload — the
        # coerce wrappers catch zlib.error too, but standalone decoder
        # users should only ever need to handle ValueError (pinned by
        # the round-15 codec-matrix bit-flip fuzz)
        raise ValueError(f"{what}: corrupt deflate stream ({exc})")
    # no trailing bytes tolerated: since r14 the RIFF word-alignment
    # pad lives OUTSIDE the declared chunk size (spec rule), so the
    # body slice handed here is exactly the zlib stream
    if (
        len(raw) != expected
        or not d.eof
        or d.unused_data
        or d.unconsumed_tail
    ):
        raise ValueError(
            f"{what} size mismatch (expected {expected} bytes)"
        )
    return raw


#: entropy-stage registry shared by IFV and MDCT: mode byte → coder.
#: 0 = zlib (LZ77+static-huffman, the bootstrap stage), 1 =
#: first-party canonical Huffman (operators/huffman.py, static
#: codebooks), 2 = first-party context-adaptive binary range coder
#: (operators/range_coder.py — the CABAC/LZMA family, no codebook in
#: the stream)
_ENTROPY_MODES = {"zlib": 0, "huffman": 1, "range": 2}


def _entropy_pack(raw: bytes, emode: int) -> bytes:
    if emode == 0:
        import zlib

        return zlib.compress(raw, 6)
    if emode == 1:
        from .huffman import huff_encode_bytes

        return huff_encode_bytes(raw)
    from .range_coder import rc_encode_bytes

    return rc_encode_bytes(raw)


def _entropy_unpack(
    data: bytes, expected: int, what: str, emode: int
) -> bytes:
    """Mode-dispatched inverse of `_entropy_pack`, with the output
    size KNOWN and enforced every way (the decompression-bomb guard
    applies to all stages)."""
    if emode == 0:
        return _bounded_inflate(data, expected, what)
    if emode == 1:
        from .huffman import huff_decode_bytes

        return huff_decode_bytes(data, expected, what)
    if emode == 2:
        from .range_coder import rc_decode_bytes

        return rc_decode_bytes(data, expected, what)
    raise ValueError(f"{what}: unknown entropy mode {emode}")


def _is_legacy_zlib_byte(b: int) -> bool:
    """Pre-round-14 IFV frames carried NO emode byte — the entropy
    payload (always zlib) started where the emode byte now sits. The
    two layouts are unambiguous at that byte: an emode is 0-2, while
    a zlib CMF byte always has low nibble 8 (CM=8, deflate) and high
    nibble <= 7 (window size), i.e. one of 0x08..0x78 — disjoint
    sets. Lets decode_avi_ifv read archives written by earlier
    encoder versions instead of coercing them to nulls."""
    return (b & 0x0F) == 8 and (b >> 4) <= 7


def _decode_ifv_iframe(body: bytes, h: int, w: int) -> np.ndarray:
    if len(body) < 2:
        raise ValueError("truncated I-frame header")
    if _is_legacy_zlib_byte(body[1]):
        # pre-r14 layout: 'I' + zlib(raw), no emode byte
        raw = _bounded_inflate(body[1:], h * w * 3, "I-frame")
    else:
        raw = _entropy_unpack(body[2:], h * w * 3, "I-frame", body[1])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def _decode_ifv_pframe(prev: np.ndarray, body: bytes) -> np.ndarray:
    """Shared P/T-frame reconstruction (decode_avi_ifv AND
    sample_ifv_frames — ONE copy, so the two decoders cannot
    diverge): parse mv + residual/coefficients, rebuild the
    motion-compensated prediction from the previous RECONSTRUCTED
    frame, add the dequantized residual. Returns the PADDED
    reconstruction (callers crop)."""
    kind = body[0:1]
    if kind not in (b"P", b"T"):
        raise ValueError(f"unknown IFV frame type {kind!r}")
    if len(body) < 4:
        raise ValueError("truncated P-frame header")
    q, B = body[1], body[2]
    if _is_legacy_zlib_byte(body[3]):
        # pre-r14 layout: kind + q + B + zlib(payload), no emode byte
        emode, payload = 0, body[3:]
    else:
        emode, payload = body[3], body[4:]
    if q < 2 or B == 0:
        raise ValueError("corrupt P-frame quantizer/block size")
    if kind == b"T" and B != _IFV_BLOCK:
        raise ValueError("T-frame block size must be 8 (DCT grid)")
    ph, pw = prev.shape[:2]
    if ph % B or pw % B:
        raise ValueError("P-frame block size mismatch")
    nbh, nbw = ph // B, pw // B
    n_mv = nbh * nbw * 2
    unit = 2 if kind == b"T" else 1
    raw = _entropy_unpack(
        payload, n_mv + ph * pw * 3 * unit, "P-frame payload", emode
    )
    mv = np.frombuffer(raw[:n_mv], dtype=np.int8).reshape(nbh, nbw, 2)
    rq = np.frombuffer(
        raw[n_mv:], dtype="<i2" if kind == b"T" else np.int8
    ).reshape(ph, pw, 3)
    pred = np.empty((ph, pw, 3), dtype=np.int16)
    for dy, dx in np.unique(mv.reshape(-1, 2), axis=0):
        shifted = _ifv_shift(prev, int(dy), int(dx)).astype(np.int16)
        mask = np.repeat(
            np.repeat(
                (mv[:, :, 0] == dy) & (mv[:, :, 1] == dx), B, axis=0
            ),
            B, axis=1,
        )
        pred[mask] = shifted[mask]
    if kind == b"T":
        # legit coefficients are bounded: |DCT of a ±255 residual| ≤
        # 8·255 = 2040, so |mantissa| ≤ round(2040/q). A forged frame
        # above the bound would push the IDCT to ~1e8 where a bare
        # float64→int16 cast is C-cast UB (platform-dependent wrap,
        # silently wrong ok=True frames) — reject it loudly instead
        if rq.size and int(np.abs(rq).max()) * int(q) > 2040 + int(q):
            raise ValueError(
                "T-frame coefficient exceeds the residual bound"
            )
        resid_hat = np.round(
            _blocks_idct(rq.astype(np.float64) * int(q))
        )
        # float-domain add + clip BEFORE the cast: bit-identical to
        # the int16 path for in-range values, never overflows
        return np.clip(pred + resid_hat, 0, 255).astype(np.uint8)
    return np.clip(
        pred + rq.astype(np.int16) * int(q), 0, 255
    ).astype(np.uint8)


def encode_avi_ifv(
    frames: list[np.ndarray],
    fps: int = 10,
    q: int = 8,
    gop: int = 8,
    search: int = 4,
    transform: bool = False,
    entropy: str = "zlib",
) -> bytes:
    """List of (h, w, 3) uint8 RGB frames → RIFF 'AVI ' bytes with one
    'IFV1' video stream — a real INTER-FRAME codec with the structure
    every production codec (MPEG/H.26x) shares, minus the transform
    stage:

    - **GOP structure**: frame 0 and every `gop`-th frame is an
      I-frame — the full frame, zlib-compressed LOSSLESS. A GOP is
      the unit of independent decodability: at 100 TB, video chunks
      split across executors at GOP boundaries exactly as ADPCM
      splits at block boundaries (no cross-GOP state).
    - **Motion compensation**: every other frame is a P-frame — per
      8×8 block, full-search over (2·search+1)² integer offsets
      against the previous RECONSTRUCTED frame, minimizing RGB SAD
      (ties break lowest (dy, dx), so encoding is deterministic).
    - **Closed-loop (DPCM) reconstruction**: residuals are taken
      against the encoder's own decoded output, not the pristine
      input — so encoder and decoder state stay bit-identical and
      error cannot accumulate across a GOP (the property the seam
      tests pin, the same discipline as the ADPCM predictor).
    - **Residual quantization**: r → clip(round(r/q), −127, 127)·q,
      int8-packed, zlib-entropy-coded. Max per-pixel error ≤
      q//2 + 1 for q ≥ 2 (the +1 from the int8 clip at |r| = 255;
      rounding is IEEE round-half-even, identical on every platform).

    **Transform mode** (round 13, `transform=True`): residuals are
    DCT-quantized instead of spatially quantized — per 8×8 block per
    channel, an orthonormal DCT-II, uniform quantization by `q` in
    the COEFFICIENT domain (int16 mantissas), inverse transform in
    the closed loop. This is the transform-coded video family's
    structure (H.26x residual coding minus the standard entropy
    tables): smooth residual energy compacts into few coefficients,
    so typical error is ~q/√12 RMS rather than a hard per-pixel
    bound (orthonormality preserves L2), pinned by SNR tests. Frame
    type 'T'.

    **Entropy stage** (round 14, `entropy='huffman'`): frame payloads
    are coded with the first-party canonical-Huffman coder
    (operators/huffman.py) instead of zlib — the codebook-based stage
    H.26x builds on (theirs context-adaptive, ours static per frame).
    Quantization is UNCHANGED, so the error bounds and the decoded
    pixels are identical across entropy modes; only the byte stream
    differs.

    Frame chunks are self-describing ('I' + emode + coded(raw) /
    'P'|'T' + q + B + emode + coded(mv ‖ residual|coeffs), where
    emode byte 0 = zlib, 1 = huffman), so the decoder needs no
    side-band beyond the AVI headers. Deterministic: same frames →
    same bytes (fixed zlib level / canonical codebooks, no RNG; the
    transform mode is float and deterministic per BLAS build, the
    JPEG/MDCT policy)."""
    if entropy not in _ENTROPY_MODES:
        raise ValueError(
            "encode_avi_ifv: entropy must be 'zlib', 'huffman', or "
            "'range'"
        )
    emode = _ENTROPY_MODES[entropy]
    if not frames:
        raise ValueError("encode_avi_ifv: need at least one frame")
    if not 2 <= q <= 255:
        raise ValueError(
            "encode_avi_ifv: q must be in [2, 255] (q=1 cannot "
            "represent |residual|=255 in a clipped int8; q must fit "
            "the per-frame header byte)"
        )
    if gop < 1:
        raise ValueError("encode_avi_ifv: gop must be >= 1")
    if not 1 <= fps <= 1_000_000:
        # 0 divides; negative breaks the '<I' pack; >1e6 would write
        # us_per_frame=0 and decode as fps=0 — all silent wrongness
        raise ValueError("encode_avi_ifv: fps must be in [1, 1000000]")
    if not 0 <= search <= 120:
        raise ValueError("encode_avi_ifv: search must be in [0, 120]")
    h, w = frames[0].shape[:2]
    B = _IFV_BLOCK
    cands = [
        (dy, dx)
        for dy in range(-search, search + 1)
        for dx in range(-search, search + 1)
    ]
    chunks: list[bytes] = []
    keyflags: list[bool] = []
    prev: np.ndarray | None = None
    for i, f in enumerate(frames):
        if f.ndim != 3 or f.shape[2] != 3 or f.dtype != np.uint8:
            raise ValueError(
                "encode_avi_ifv: frames must be (h, w, 3) uint8 RGB"
            )
        if f.shape[0] == 0 or f.shape[1] == 0:
            raise ValueError(
                "encode_avi_ifv: zero-area frames are not encodable"
            )
        if f.shape[:2] != (h, w):
            raise ValueError(
                "encode_avi_ifv: all frames must share dimensions"
            )
        if i % gop == 0:
            chunks.append(
                b"I" + bytes([emode]) + _entropy_pack(f.tobytes(), emode)
            )
            keyflags.append(True)
            prev = _ifv_pad(f, B)
            continue
        cur = _ifv_pad(f, B).astype(np.int16)
        ph, pw = cur.shape[:2]
        nbh, nbw = ph // B, pw // B
        # SAD table: one (nbh, nbw) plane per candidate — memory is
        # candidates × blocks, never candidates × pixels
        sads = np.empty((len(cands), nbh, nbw), dtype=np.int64)
        for ci, (dy, dx) in enumerate(cands):
            diff = np.abs(
                cur - _ifv_shift(prev, dy, dx).astype(np.int16)
            ).sum(axis=2)
            sads[ci] = diff.reshape(nbh, B, nbw, B).sum(axis=(1, 3))
        best = sads.argmin(axis=0)  # first minimum → lowest (dy, dx)
        # assemble the prediction: one shift per DISTINCT chosen
        # candidate (bounded by (2·search+1)², usually far fewer)
        pred = np.empty_like(cur)
        for ci in np.unique(best):
            dy, dx = cands[ci]
            shifted = _ifv_shift(prev, dy, dx).astype(np.int16)
            mask = np.repeat(
                np.repeat(best == ci, B, axis=0), B, axis=1
            )
            pred[mask] = shifted[mask]
        resid = cur - pred
        mv = np.empty((nbh, nbw, 2), dtype=np.int8)
        for ci in np.unique(best):
            mv[best == ci] = cands[ci]
        if transform:
            # coefficient-domain quantization: |DCT| ≤ 8·255 = 2040
            # for ±255 residuals (orthonormal max gain √64), so /q≥2
            # always fits int16 — the clip is belt-and-braces
            cq = np.clip(
                np.round(_blocks_dct(resid) / q), -32767, 32767
            ).astype("<i2")
            # float-domain closed loop, mirroring _decode_ifv_pframe
            # exactly (same round→add→clip order, so encoder and
            # decoder reconstructions stay bit-identical)
            resid_hat = np.round(
                _blocks_idct(cq.astype(np.float64) * q)
            )
            recon = np.clip(pred + resid_hat, 0, 255).astype(np.uint8)
            chunks.append(
                b"T"
                + bytes([q, B, emode])
                + _entropy_pack(mv.tobytes() + cq.tobytes(), emode)
            )
        else:
            rq = np.clip(
                np.round(resid / q), -127, 127
            ).astype(np.int8)
            recon = np.clip(
                pred + rq.astype(np.int16) * q, 0, 255
            ).astype(np.uint8)
            chunks.append(
                b"P"
                + bytes([q, B, emode])
                + _entropy_pack(mv.tobytes() + rq.tobytes(), emode)
            )
        keyflags.append(False)
        prev = recon

    def chunk(cid: bytes, body: bytes) -> bytes:
        # RIFF spec: declared size excludes the word-alignment pad
        # byte (same rule as encode_avi_mjpeg) — decoders skip the pad
        # via the ln&1 advance, never by inspecting body bytes
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(four_cc: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + four_cc + body

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, _AVIF_HASINDEX, len(chunks),
        0, 1, max(map(len, chunks)), w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"IFV1"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(chunks), max(map(len, chunks)), 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"IFV1",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", c) for c in chunks))
    idx, off = [], 4
    for c, key in zip(chunks, keyflags):
        idx.append(
            struct.pack(
                "<4sIII", b"00dc",
                _AVIIF_KEYFRAME if key else 0, off, len(c),
            )
        )
        off += 8 + len(c) + (len(c) & 1)
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_ifv(payload: bytes) -> tuple[list[np.ndarray], int]:
    """RIFF 'AVI '/'IFV1' bytes → (list of (h, w, 3) uint8 frames,
    fps). Replays the closed decode loop: I-frames inflate lossless;
    P-frames rebuild the motion-compensated prediction from the
    PREVIOUS RECONSTRUCTED frame and add the dequantized residual —
    bit-identical to the encoder's own reconstruction by
    construction. ValueError on anything malformed (not AVI, P-frame
    before any I-frame, truncated/oversized frame bodies), so the
    Spark errors='coerce' path can null rows."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    us_per_frame = None
    dims: list[int] | None = None
    frames: list[np.ndarray] = []
    prev: np.ndarray | None = None

    def decode_frame(body: bytes) -> None:
        nonlocal prev
        if dims is None:
            raise ValueError("frame chunk before avih header")
        h, w = dims
        if not body:
            raise ValueError("empty IFV frame chunk")
        if body[0:1] == b"I":
            f = _decode_ifv_iframe(body, h, w)
            frames.append(f)
            prev = _ifv_pad(f, _IFV_BLOCK)
            return
        if body[0:1] not in (b"P", b"T"):
            raise ValueError(
                f"unknown IFV frame type {body[0:1]!r}"
            )
        if prev is None:
            raise ValueError("P-frame before any I-frame")
        recon = _decode_ifv_pframe(prev, body)
        frames.append(recon[:h, :w])
        prev = recon

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame, dims
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if pos + 8 + ln > end:
                raise ValueError(f"truncated {cid!r} chunk")
            if cid == b"LIST":
                walk(pos + 12, pos + 8 + ln)
            elif cid == b"avih":
                if ln < 40:
                    raise ValueError("avih too short")
                vals = struct.unpack("<10I", data[pos + 8 : pos + 48])
                us_per_frame = vals[0]
                dims = [vals[9], vals[8]]  # height, width
            elif cid in (b"00dc", b"00db"):
                # ln excludes the pad byte; exact slice (the ln&1
                # advance skips the pad — never strip body bytes)
                decode_frame(data[pos + 8 : pos + 8 + ln])
            pos += 8 + ln + (ln & 1)

    walk(12, end)
    if not frames:
        raise ValueError("no video frames found")
    fps = 1_000_000 // us_per_frame if us_per_frame else 0
    return frames, fps


# ------------------------------------------------- MDCT transform audio

#: private/experimental WAVE format tag for the first-party MDCT
#: codec — NOT an interchange format (unlike the ADPCM 0x0011 files,
#: which stock players read); the container is WAV-shaped so the same
#: chunk walker, fact-count and errors='coerce' machinery apply
_MDCT_TAG = 0xF0CC


def _mdct_basis(frame: int) -> tuple[np.ndarray, np.ndarray]:
    """(window, cos-basis) for an N-point MDCT: the sine window
    (satisfies Princen-Bradley w[n]² + w[n+N/2]² = 1, the TDAC
    perfect-reconstruction condition) and the (N, N/2) cosine matrix
    X_k = Σ_n x_n w_n cos(π/(N/2)·(n + ½ + N/4)(k + ½))."""
    half = frame // 2
    n = np.arange(frame)
    w = np.sin(np.pi / frame * (n + 0.5))
    basis = np.cos(
        np.pi / half * (n[:, None] + 0.5 + half / 2)
        * (np.arange(half)[None, :] + 0.5)
    )
    return w, basis


def _mdct_band_edges(half: int, n_bands: int) -> np.ndarray:
    """Deterministic geometric-ish band partition of the `half`
    MDCT coefficients into `n_bands` strictly nonempty bands —
    narrow at low frequencies, wide at high, the critical-band shape
    every perceptual codec uses. Pure function of (half, n_bands), so
    the decoder rebuilds it from the header alone (no edge table in
    the stream). Requires 1 <= n_bands <= half."""
    edges = [0]
    for k in range(1, n_bands + 1):
        nxt = max(edges[-1] + 1, int(round(half ** (k / n_bands))))
        edges.append(min(nxt, half - (n_bands - k)))
    edges[-1] = half
    return np.array(edges, dtype=np.int64)


def _psy_allocate(
    X: np.ndarray, qbits: int, edges: np.ndarray
) -> np.ndarray:
    """Per-frame, per-band mantissa bit allocation under a simple
    masking model — the psychoacoustic stage the uniform quantizer
    stubbed out. X is (nfr, half) MDCT coefficients; returns (nfr, B)
    integer bit counts r with sum_b width_b * r_b <= qbits * half
    per frame (the UNIFORM mode's budget — equal bitrate by
    construction).

    Model (classic simplified MPEG-1 psychoacoustic shape, public
    knowledge): band power E_b masks its neighbors through a
    triangular spreading function (10 dB self-offset, 8 dB per band
    of distance); bits follow the signal-to-mask ratio at half a bit
    per 3 dB (the quantizer-noise slope), centered on `qbits`, then a
    per-frame water level (vectorized bisection) fits the integer
    allocation to the budget. Bands holding tones keep fine
    mantissas; bands buried under a neighbor's masking skirt give
    their bits away."""
    nfr, half = X.shape
    B = len(edges) - 1
    widths = np.diff(edges).astype(np.float64)
    band_idx = np.repeat(np.arange(B), np.diff(edges))
    # band mean power (nfr, B)
    E = np.zeros((nfr, B))
    np.add.at(E, (slice(None), band_idx), X * X)
    E = E / widths + 1e-12
    d = np.abs(np.arange(B)[:, None] - np.arange(B)[None, :])
    spread = 10.0 ** (-(1.0 + 0.8 * d))
    T = E @ spread.T + 1e-300
    raw = qbits + 0.5 * np.log2(E / T)
    budget = float(qbits * half)
    # largest per-frame water level c with
    # sum_b w_b * clip(round(raw + c), 2, 15) <= budget
    lo = np.full(nfr, -40.0)
    hi = np.full(nfr, 40.0)
    for _ in range(50):
        mid = (lo + hi) / 2.0
        used = (
            np.clip(np.round(raw + mid[:, None]), 2, 15) * widths
        ).sum(axis=1)
        ok = used <= budget
        lo = np.where(ok, mid, lo)
        hi = np.where(ok, hi, mid)
    return np.clip(np.round(raw + lo[:, None]), 2, 15).astype(np.int64)


def encode_wav_mdct(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    frame: int = 512,
    qbits: int = 8,
    entropy: str = "zlib",
    alloc: str = "uniform",
) -> bytes:
    """(n,) int16 mono PCM → WAV-shaped RIFF bytes under the
    first-party MDCT TRANSFORM codec — the structural skeleton of the
    perceptual family (MP3/AAC/Vorbis/Opus all start here), minus the
    psychoacoustic bit-allocation model:

    - 50%-overlapped sine-windowed frames (hop = frame/2), MDCT to
      frame/2 coefficients per frame — the lapped transform whose
      time-domain alias cancellation (Princen-Bradley) makes
      overlap-add reconstruction exact before quantization;
    - per-frame scalar quantization: scale = max|X|/(2^(qbits−1)−1)
      as a float32 scale factor + int8/int16 mantissas (the
      scalefactor-band idea collapsed to one band — where a
      psychoacoustic model would shape the noise floor);
    - zlib entropy stage over scales ‖ mantissas (where Huffman
      codebooks would sit).

    Tonal/sparse spectra quantize to mostly-zero mantissas, so
    compression is content-adaptive (measured: ~4:1 on noisy mixes to
    ~58:1 on pure tones at qbits=8, 30-52 dB SNR). Frames after the
    first depend only on their own bytes — rows decode independently
    and in parallel; within a row the overlap-add is sequential, the
    ADPCM block-carry story. Deterministic for a fixed numpy/BLAS
    build (float transform; the q94 oracle pins only exactly-carried
    header fields, same policy as JPEG's float DCT).

    **Round 14 — the two formerly-stubbed perceptual stages, both
    opt-in (defaults keep the round-13 bytes identical):**

    - `entropy='huffman'`: the zlib stage is replaced by the
      first-party canonical-Huffman coder over mantissa SYMBOLS
      (operators/huffman.py) — the MP3/AAC codebook idea with one
      static codebook per payload. Scalefactors (float32, entropy-
      hostile) stay zlib-framed. Quantization unchanged, so decoded
      samples are bit-identical across entropy modes.
    - `alloc='psy'`: per-band scalefactors with masking-driven bit
      allocation (`_psy_allocate`) instead of one scale + uniform
      `qbits` for the whole frame — the psychoacoustic bit-allocation
      stage, under the SAME total bit budget (qbits·half per frame),
      so the SNR gain over uniform is pinned at equal bitrate.

    Wire format: defaults keep the legacy cbSize=4 fmt extension
    (frame, qbits); any non-default mode writes cbSize=8
    (frame, qbits, flags, n_bands) where flags bit0 = huffman and
    bit1 = per-band alloc. Data chunk: zlib mode packs
    zlib(scales ‖ mantissas); huffman mode packs
    u32 scale-block-len ‖ zlib(scales) ‖ huffman(mantissas+bias)."""
    import zlib

    if entropy not in _ENTROPY_MODES:
        raise ValueError(
            "encode_wav_mdct: entropy must be 'zlib', 'huffman', or "
            "'range'"
        )
    if alloc not in ("uniform", "psy"):
        raise ValueError(
            "encode_wav_mdct: alloc must be 'uniform' or 'psy'"
        )
    samples = np.asarray(samples)
    if samples.ndim != 1:
        raise ValueError("encode_wav_mdct: mono (1-D) input only")
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_mdct: int16 samples required")
    if len(samples) == 0:
        raise ValueError("encode_wav_mdct: empty input")
    if frame < 16 or frame > 32768 or frame & (frame - 1):
        # upper bound: the header stores frame in a 16-bit field; an
        # oversized value would die in struct.pack as struct.error —
        # which errors='coerce' wrappers CATCH, silently coercing a
        # caller configuration error into all-null rows
        raise ValueError(
            "encode_wav_mdct: frame must be a power of two in "
            "[16, 32768]"
        )
    if not 2 <= qbits <= 15:
        raise ValueError("encode_wav_mdct: qbits must be in [2, 15]")
    half = frame // 2
    lim = (1 << (qbits - 1)) - 1
    w, basis = _mdct_basis(frame)
    npad = (-len(samples)) % half
    xp = np.concatenate(
        [
            np.zeros(half),
            samples.astype(np.float64),
            np.zeros(npad + half),
        ]
    )
    frames = np.lib.stride_tricks.sliding_window_view(xp, frame)[::half]
    X = (frames * w) @ basis
    if alloc == "psy":
        n_bands = min(16, half)
        edges = _mdct_band_edges(half, n_bands)
        band_idx = np.repeat(np.arange(n_bands), np.diff(edges))
        r = _psy_allocate(X, qbits, edges)          # (nfr, B)
        lim_b = (1 << (r - 1)) - 1                  # (nfr, B)
        # per-band scalefactors off the band max (zero-band guard as
        # in the uniform path)
        nfr_ = X.shape[0]
        mxb = np.zeros((nfr_, n_bands))
        np.maximum.at(mxb, (slice(None), band_idx), np.abs(X))
        mxb[mxb == 0] = 1.0
        scale = (mxb / lim_b).astype("<f4")          # (nfr, B)
        sc_coef = scale.astype(np.float64)[:, band_idx]
        lim_coef = lim_b[:, band_idx]
        q = np.clip(
            np.round(X / sc_coef), -lim_coef, lim_coef
        ).astype("<i2")
    else:
        n_bands = 1
        mx = np.abs(X).max(axis=1)
        mx[mx == 0] = 1.0  # silent frame: any scale works, mantissas 0
        scale = (mx / lim).astype("<f4")
        q = np.clip(
            np.round(X / scale.astype(np.float64)[:, None]), -lim, lim
        ).astype(
            "<i1"
            if qbits <= 8 and entropy != "huffman"
            else "<i2"
        )
    if entropy == "huffman":
        from .huffman import huff_encode

        sc_blk = zlib.compress(scale.tobytes(), 6)
        # bias mantissas into u16 symbol space: |q| <= 2^14 - 1 for
        # qbits <= 15, so q + 2^14 is always in [1, 2^15 - 1]
        data = (
            struct.pack("<I", len(sc_blk))
            + sc_blk
            + huff_encode(q.astype(np.int64).ravel() + (1 << 14))
        )
    elif entropy == "range":
        # same blob layout as zlib, different byte codec: the
        # context-adaptive range coder needs no codebook at all
        from .range_coder import rc_encode_bytes

        data = rc_encode_bytes(scale.tobytes() + q.tobytes())
    else:
        data = zlib.compress(scale.tobytes() + q.tobytes(), 6)
    flags = (
        (1 if entropy == "huffman" else 4 if entropy == "range" else 0)
        | (2 if alloc == "psy" else 0)
    )
    if flags == 0:
        ext = struct.pack("<HHH", 4, frame, qbits)
    else:
        ext = struct.pack("<HHHHH", 8, frame, qbits, flags, n_bands)
    fmt = struct.pack(
        "<HHIIHH",
        _MDCT_TAG, 1, sample_rate,
        max(1, sample_rate * len(data) // max(1, len(samples))),
        0, 16,    # block_align n/a, "bits" nominal
    ) + ext
    fact = struct.pack("<I", len(samples))
    riff = b"".join([
        b"WAVEfmt ", struct.pack("<I", len(fmt)), fmt,
        b"fact", struct.pack("<I", len(fact)), fact,
        b"data", struct.pack("<I", len(data)), data,
    ])
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def mdct_info(payload: bytes) -> dict:
    """Header-only probe of an MDCT payload: (sample_rate, n_samples,
    frame, qbits, n_frames) without inflating the data chunk —
    n_frames follows from the fixed padding rule
    (ceil(n/(frame/2)) + 1). ValueError on non-MDCT input."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    # bound the walk at the RIFF-declared size (the decode_wav rule):
    # bytes appended past the envelope (concatenated streams, forged
    # trailing fact/data chunks) must be invisible, not last-wins
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    pos, fmt_raw, n_samples = 12, None, None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_raw = body
        elif cid == b"fact" and len(body) >= 4:
            (n_samples,) = struct.unpack_from("<I", body)
        pos += 8 + size + (size & 1)
    if fmt_raw is None or len(fmt_raw) < 2:
        raise ValueError("missing fmt chunk")
    (tag,) = struct.unpack_from("<H", fmt_raw)
    if tag != _MDCT_TAG:
        raise ValueError(f"not MDCT (wFormatTag={tag:#06x})")
    if len(fmt_raw) < 22 or n_samples is None:
        raise ValueError("truncated MDCT fmt / missing fact chunk")
    _t, ch, rate, _br, _ba, _bits, cb, frame, qbits = struct.unpack_from(
        "<HHIIHHHHH", fmt_raw
    )
    if ch != 1:
        raise ValueError("mono MDCT only")
    if frame < 16 or frame & (frame - 1) or not 2 <= qbits <= 15:
        # validate HERE: half=0 from a corrupt header would divide by
        # zero below, an unhandled ZeroDivisionError instead of the
        # ValueError the errors='coerce' path catches
        raise ValueError("corrupt MDCT frame/qbits header")
    half = frame // 2
    # round-14 extension: cbSize=8 appends (flags, n_bands); legacy
    # cbSize=4 payloads mean zlib + uniform (flags=0, one band)
    flags, n_bands = 0, 1
    if cb >= 8:
        if len(fmt_raw) < 26:
            raise ValueError("truncated MDCT extended fmt")
        flags, n_bands = struct.unpack_from("<HH", fmt_raw, 22)
        if flags & ~7 or (flags & 1 and flags & 4):
            raise ValueError("unknown MDCT flags")
        if not 1 <= n_bands <= half:
            raise ValueError("corrupt MDCT n_bands header")
        if not (flags & 2) and n_bands != 1:
            # uniform alloc with a multi-band count would misparse
            # the scale block — reject the forged combination
            raise ValueError("inconsistent MDCT alloc flags")
    n_frames = (n_samples + half - 1) // half + 1
    return {
        "sample_rate": rate,
        "n_samples": n_samples,
        "frame": frame,
        "qbits": qbits,
        "n_frames": n_frames,
        "entropy": (
            "huffman" if flags & 1 else "range" if flags & 4 else "zlib"
        ),
        "alloc": "psy" if flags & 2 else "uniform",
        "n_bands": n_bands,
    }


def decode_wav_mdct(payload: bytes) -> tuple[np.ndarray, int]:
    """Inverse of `encode_wav_mdct`: dequantize, IMDCT (synthesis
    scale 4/N), sine-window, overlap-add, trim to the fact count.
    ValueError on anything that is not a well-formed MDCT payload
    (wrong tag, truncated zlib, mantissa block size mismatch), so the
    Spark errors='coerce' path can null rows."""
    import zlib

    info = mdct_info(payload)
    frame, qbits = info["frame"], info["qbits"]
    n_samples, rate = info["n_samples"], info["sample_rate"]
    if frame < 16 or frame & (frame - 1) or not 2 <= qbits <= 15:
        raise ValueError("corrupt MDCT frame/qbits header")
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    pos, data = 12, None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("missing data chunk")
    half = frame // 2
    nfr = info["n_frames"]
    B = info["n_bands"]
    psy = info["alloc"] == "psy"
    n_scales = nfr * B
    if info["entropy"] == "huffman":
        from .huffman import huff_decode

        if len(data) < 4:
            raise ValueError("truncated MDCT huffman payload")
        (sc_len,) = struct.unpack_from("<I", data)
        if len(data) < 4 + sc_len:
            raise ValueError("truncated MDCT scale block")
        raw_sc = _bounded_inflate(
            data[4 : 4 + sc_len], n_scales * 4, "MDCT scales"
        )
        q = (
            huff_decode(data[4 + sc_len :], nfr * half, "MDCT mantissas")
            - (1 << 14)
        ).reshape(nfr, half).astype(np.float64)
    else:
        qdt = np.dtype(
            "<i1" if qbits <= 8 and not psy else "<i2"
        )
        want = n_scales * 4 + nfr * half * qdt.itemsize
        if info["entropy"] == "range":
            from .range_coder import rc_decode_bytes

            raw = rc_decode_bytes(data, want, "MDCT payload")
        else:
            raw = _bounded_inflate(data, want, "MDCT payload")
        raw_sc = raw[: n_scales * 4]
        q = np.frombuffer(raw[n_scales * 4 :], dtype=qdt).reshape(
            nfr, half
        ).astype(np.float64)
    scale = np.frombuffer(raw_sc, dtype="<f4").astype(np.float64)
    if psy:
        # rebuild the deterministic band map from the header alone
        # and broadcast each band's scalefactor across its bins
        band_idx = np.repeat(
            np.arange(B), np.diff(_mdct_band_edges(half, B))
        )
        sc_coef = scale.reshape(nfr, B)[:, band_idx]
    else:
        sc_coef = scale[:, None]
    w, basis = _mdct_basis(frame)
    yfr = (4.0 / frame) * (q * sc_coef) @ basis.T * w
    out = np.zeros(half * (nfr + 1))
    for i in range(nfr):
        out[i * half:i * half + frame] += yfr[i]
    y = out[half:half + n_samples]
    return (
        np.clip(np.round(y), -32768, 32767).astype(np.int16),
        rate,
    )


def ifv_info(payload: bytes) -> dict:
    """Header-only probe of an IFV payload — no frame inflates:
    (fps, width, height, n_frames, n_keyframes). The frame-type bytes
    sit in plaintext ahead of each chunk's zlib stream, so GOP
    geometry is readable at container speed (what a scheduler uses to
    plan GOP-aligned splits). ValueError on malformed containers."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    us_per_frame = None
    dims: list[int] | None = None
    n_frames = n_keyframes = 0

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame, dims, n_frames, n_keyframes
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if pos + 8 + ln > end:
                raise ValueError(f"truncated {cid!r} chunk")
            if cid == b"LIST":
                walk(pos + 12, pos + 8 + ln)
            elif cid == b"avih":
                if ln < 40:
                    raise ValueError("avih too short")
                vals = struct.unpack("<10I", data[pos + 8 : pos + 48])
                us_per_frame = vals[0]
                dims = [vals[9], vals[8]]
            elif cid in (b"00dc", b"00db"):
                n_frames += 1
                if data[pos + 8 : pos + 9] == b"I":
                    n_keyframes += 1
            pos += 8 + ln + (ln & 1)

    walk(12, end)
    if not n_frames or dims is None:
        raise ValueError("no video frames found")
    return {
        "fps": 1_000_000 // us_per_frame if us_per_frame else 0,
        "width": dims[1],
        "height": dims[0],
        "n_frames": n_frames,
        "n_keyframes": n_keyframes,
    }


def sample_ifv_frames(
    payload: bytes, every_n: int = 1
) -> list[np.ndarray]:
    """Frame sampling with GOP-level pruning — the inter-frame
    analogue of `sample_avi_frames`' chunk slicing: a P-frame needs
    its GOP's earlier frames, so per-frame pruning is impossible, but
    whole GOPs containing no kept frame are SKIPPED without inflating
    a single byte of them (the keyframe flags in the container mark
    the boundaries). This is exactly why the GOP is the executor
    split unit at 100 TB: decode cost scales with the GOPs you
    touch, not the stream length. Within a touched GOP, frames decode
    up to the last kept index only."""
    if every_n < 1:
        raise ValueError("sample_ifv_frames: every_n must be >= 1")
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    dims: list[int] | None = None
    bodies: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal dims
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if pos + 8 + ln > end:
                raise ValueError(f"truncated {cid!r} chunk")
            if cid == b"LIST":
                walk(pos + 12, pos + 8 + ln)
            elif cid == b"avih":
                if ln < 40:
                    raise ValueError("avih too short")
                vals = struct.unpack("<10I", data[pos + 8 : pos + 48])
                dims = [vals[9], vals[8]]
            elif cid in (b"00dc", b"00db"):
                bodies.append(data[pos + 8 : pos + 8 + ln])
            pos += 8 + ln + (ln & 1)

    walk(12, end)
    if not bodies or dims is None:
        raise ValueError("no video frames found")
    # GOP boundaries from the frame-type bytes (no inflate needed)
    gop_starts = [
        i for i, b in enumerate(bodies) if b[:1] == b"I"
    ]
    if not gop_starts or gop_starts[0] != 0:
        raise ValueError("stream does not start with an I-frame")
    keep = set(range(0, len(bodies), every_n))
    # decode only GOPs that contain a kept frame, and within each
    # only up to its last kept index — through the SAME
    # _decode_ifv_iframe/_decode_ifv_pframe helpers as decode_avi_ifv,
    # so the sampled and full views cannot diverge on any payload
    h, w = dims
    out: dict[int, np.ndarray] = {}
    bounds = gop_starts + [len(bodies)]
    for g0, g1 in zip(bounds, bounds[1:]):
        kept_here = [i for i in range(g0, g1) if i in keep]
        if not kept_here:
            continue  # whole GOP skipped — zero inflate cost
        prev: np.ndarray | None = None
        for i in range(g0, kept_here[-1] + 1):
            body = bodies[i]
            if body[:1] == b"I":
                f = _decode_ifv_iframe(body, h, w)
                prev = _ifv_pad(f, _IFV_BLOCK)
                if i in keep:
                    out[i] = f
                continue
            if prev is None:
                raise ValueError("malformed P-frame in GOP")
            prev = _decode_ifv_pframe(prev, body)
            if i in keep:
                out[i] = prev[:h, :w]
    return [out[i] for i in sorted(out)]
