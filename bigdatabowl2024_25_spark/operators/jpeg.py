"""Pure-stdlib+numpy baseline JPEG codec (the JPEG leg of SURVEY.md
§2.8's multimodal decode; companion to the PNG codec in
`multimodal.py`).

Scope — honest and tested, like the PNG codec:
- encoder: baseline sequential DCT (SOF0), 8-bit, 4:4:4 (no chroma
  subsampling), 1 (grayscale) or 3 (RGB→YCbCr) components, standard
  quantization tables scaled by a quality factor, canonical Huffman
  tables EMBEDDED in DHT segments;
- decoder: baseline SOF0 only, 8-bit, any component count 1/3 with
  1×1 sampling factors, restart intervals honored; progressive
  (SOF2), subsampled, arithmetic, or 12-bit streams raise ValueError
  (→ the errors='coerce' null path in decode_media).

Design notes:
- Huffman tables are CANONICAL FIXED-LENGTH (all 12 DC symbols at 4
  bits, all 162 AC symbols at 9 bits). JPEG carries its tables in the
  file, so any prefix-free assignment is valid, interoperable JPEG —
  this trades a few % compression for eliminating a 162-entry
  Annex-K transcription as a correctness risk. The DECODER reads
  whatever tables the file declares, so real-world baseline JPEGs
  (which use the Annex-K tables) decode fine.
- DCT/IDCT are exact matrix forms (M·B·Mᵀ) batched over all blocks
  with one numpy einsum — no per-pixel Python in the transform.
- Entropy coding is the only bit-serial part; it runs over numpy
  int arrays with Python loops per SYMBOL (not per pixel).

Reference parity: the reference treats images as opaque inputs to
keras preprocessing (`DefCoverage.ipynb` imports; no codec of its
own), so this slab is additive capability per the brief's multimodal
requirement, not a port.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: ISO/IEC 10918-1 Annex K.1 base quantization tables (these two ARE
#: short enough to transcribe safely, and using the standard ones
#: keeps quality semantics familiar)
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

#: zigzag scan order: _ZIGZAG[k] = (row, col) of the k-th coefficient
_ZIGZAG = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
)
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

#: exact 8×8 DCT-II matrix: M[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _cu = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_M[_u, _x] = _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

#: fixed-length canonical Huffman specs: (bits_per_length_1..16,
#: symbol list). DC: 12 symbols × 4 bits; AC: 162 symbols × 9 bits.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_BITS = [0] * 8 + [162] + [0] * 7


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical JPEG assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the base tables (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# ------------------------------------------------------------- color space


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


# ------------------------------------------------------------- bit plumbing


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                # restart marker: consumed by caller via sync()
                self.marker = nxt
                raise _Restart()
            else:
                # EOI or other marker: signal end by padding with 1s
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the pending RSTn marker, drop bit state."""
        self.acc = 0
        self.nbits = 0
        self.pos += 2
        self.marker = None

    def align_restart(self) -> None:
        """At an expected restart boundary: discard the ≤7 padding bits
        of the current byte and consume the RSTn marker.

        Explicit alignment (not waiting for `_fill` to trip over the
        marker mid-MCU) matters because JPEG padding bits are arbitrary:
        an external encoder padding with non-1 bits could otherwise
        decode as a phantom MCU (DC size-0 + EOB fits in 6 bits) and
        desync the rest of the image."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            if (
                self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.marker = self.data[self.pos + 1]
            else:
                raise ValueError("expected RSTn at restart interval")
        self.pos += 2
        self.marker = None


class _Restart(Exception):
    pass


class _HuffDecoder:
    """Canonical decode via per-length (mincode, maxcode, valptr)."""

    def __init__(self, bits: list[int], symbols: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.symbols[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("bad Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ----------------------------------------------------------------- encoder


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """Encode (h, w) or (h, w, 1|3) uint8 → baseline 4:4:4 JFIF.

    `restart_interval` > 0 emits a DRI segment and an RSTn marker
    (byte-aligned, 1-padded, DC predictors reset) after every that
    many MCUs — the error-resilience feature large-scale ingest
    pipelines rely on to localize corruption to one restart segment."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ncomp = arr.shape
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    ql, qc = _quant_tables(quality)
    planes = (
        _rgb_to_ycbcr(arr.astype(np.float64))
        if ncomp == 3
        else arr.astype(np.float64)
    )

    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(
        planes, ((0, bh * 8 - h), (0, bw * 8 - w), (0, 0)), mode="edge"
    )
    # (nblocks, 8, 8, ncomp) → DCT all blocks in one einsum per comp
    blocks = (
        padded.reshape(bh, 8, bw, 8, ncomp)
        .transpose(0, 2, 1, 3, 4)
        .reshape(bh * bw, 8, 8, ncomp)
        - 128.0
    )
    coef = np.einsum("ux,nxyc,vy->nuvc", _DCT_M, blocks, _DCT_M)
    qtab = np.stack([ql] + [qc] * (ncomp - 1), axis=-1)  # (8,8,ncomp)
    quant = np.round(coef / qtab[None]).astype(np.int32)
    zz = quant[:, _ZZ_ROWS, _ZZ_COLS, :]  # (nblocks, 64, ncomp)

    bwr = _BitWriter()
    entropy = bytearray()
    rst = 0
    pred = [0] * ncomp
    for n in range(bh * bw):
        for c in range(ncomp):
            block = zz[n, :, c]
            dc = int(block[0]) - pred[c]
            pred[c] = int(block[0])
            size, bits = _magnitude(dc)
            code, ln = _DC_ENC[size]
            bwr.write(code, ln)
            if size:
                bwr.write(bits, size)
            run = 0
            nz = np.nonzero(block[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(block[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL
                    bwr.write(code, ln)
                    run -= 16
                size, bits = _magnitude(v)
                code, ln = _AC_ENC[(run << 4) | size]
                bwr.write(code, ln)
                bwr.write(bits, size)
                run = 0
            if last < 63:
                code, ln = _AC_ENC[0x00]  # EOB
                bwr.write(code, ln)
        if (
            restart_interval
            and (n + 1) % restart_interval == 0
            and n + 1 < bh * bw
        ):
            # close the restart segment: byte-align (1-padding), emit
            # RST0..RST7 cyclically, reset DC prediction
            entropy += bwr.flush()
            entropy += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bwr = _BitWriter()
            pred = [0] * ncomp
    entropy += bwr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql[_ZZ_ROWS, _ZZ_COLS].tolist()))
    if ncomp == 3:
        out += seg(0xDB, bytes([1]) + bytes(qc[_ZZ_ROWS, _ZZ_COLS].tolist()))
    comp_spec = b"".join(
        struct.pack("BBB", i + 1, 0x11, 0 if i == 0 else 1)
        for i in range(ncomp)
    )
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + comp_spec)
    for cls, tid, bits, syms in (
        (0, 0, _DC_BITS, _DC_SYMBOLS),
        (1, 0, _AC_BITS, _AC_SYMBOLS),
    ):
        out += seg(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms)
        )
    if ncomp == 3:
        for cls, bits, syms in (
            (0, _DC_BITS, _DC_SYMBOLS),
            (1, _AC_BITS, _AC_SYMBOLS),
        ):
            out += seg(0xC4, bytes([(cls << 4) | 1]) + bytes(bits) + bytes(syms))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    scan_spec = b"".join(
        struct.pack("BB", i + 1, 0 if i == 0 else 0x11) for i in range(ncomp)
    )
    out += seg(0xDA, bytes([ncomp]) + scan_spec + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 (1×1-sampled) JPEG → (h, w, c) uint8.

    Error contract: ANY parse failure — including index/key/overflow
    errors raised deep in marker or entropy parsing on corrupt bytes —
    surfaces as ValueError, so the multimodal `errors='coerce'` path
    (`multimodal.py` decode_media/resize_media) can null the row
    instead of killing the whole Arrow batch (fuzz-pinned in
    tests/test_multimodal_streaming.py)."""
    try:
        return _decode_jpeg_impl(bytes(payload))
    except (IndexError, KeyError, OverflowError, struct.error) as exc:
        raise ValueError(
            f"corrupt JPEG: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[tuple[int, int, int]] = []  # (id, qtab, (dc,ac) set later)
    h = w = 0
    restart_interval = 0
    scan_comps: list[tuple[int, int, int]] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros((8, 8), dtype=np.int32)
                t[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int32)
                qtabs[tq] = t
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                syms = list(body[i + 17 : i + 17 + n])
                htabs[(cls, tid)] = _HuffDecoder(bits, syms)
                i += 17 + n
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq, 0))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            for c in range(ns):
                cid, tabs = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0xF))
            pos += 2 + ln
            break
        pos += 2 + ln
    if not comps or not scan_comps or h == 0:
        raise ValueError("missing SOF/SOS")

    ncomp = len(comps)
    if len(scan_comps) != ncomp:
        raise ValueError("SOS component count differs from SOF")
    bh, bw = (h + 7) // 8, (w + 7) // 8
    nblocks = bh * bw
    zz = np.zeros((nblocks, 64, ncomp), dtype=np.int32)
    br = _BitReader(data, pos)
    pred = [0] * ncomp
    decoders = []
    for cid, dc_t, ac_t in scan_comps:
        decoders.append((htabs[(0, dc_t)], htabs[(1, ac_t)]))
    n = 0
    while n < nblocks:
        try:
            for c in range(ncomp):
                dc_d, ac_d = decoders[c]
                size = dc_d.decode(br)
                diff = _extend(br.bits(size), size) if size else 0
                pred[c] += diff
                zz[n, 0, c] = pred[c]
                k = 1
                while k < 64:
                    rs = ac_d.decode(br)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    size = rs & 0xF
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[n, k, c] = _extend(br.bits(size), size)
                    k += 1
            n += 1
            if restart_interval and n % restart_interval == 0 and n < nblocks:
                # explicit byte-align + consume the expected RSTn;
                # never decode the next MCU out of padding bits
                pred = [0] * ncomp
                br.align_restart()
        except _Restart:
            # restart marker hit MID-MCU: corrupt segment; resync and
            # restart the interrupted MCU from scratch
            pred = [0] * ncomp
            br.sync_restart()
            zz[n, :, :] = 0

    # decoded coefficient channels follow SOS scan order; dequantize
    # each channel with ITS component's table (matched by component
    # id), not by SOF position — the two orders can legally differ
    cid_to_tq = {cid: tq for cid, tq, _ in comps}
    try:
        qtab = np.stack(
            [qtabs[cid_to_tq[cid]] for cid, _, _ in scan_comps], axis=-1
        )  # (8,8,ncomp) in scan order
    except KeyError as exc:
        raise ValueError(f"SOS references unknown component {exc}") from exc
    coef = np.zeros((nblocks, 8, 8, ncomp), dtype=np.float64)
    coef[:, _ZZ_ROWS, _ZZ_COLS, :] = zz
    coef *= qtab[None]
    pixels = np.einsum("xu,nuvc,yv->nxyc", _DCT_M.T, coef, _DCT_M.T) + 128.0
    img = (
        pixels.reshape(bh, bw, 8, 8, ncomp)
        .transpose(0, 2, 1, 3, 4)
        .reshape(bh * 8, bw * 8, ncomp)[:h, :w]
    )
    scan_ids = [cid for cid, _, _ in scan_comps]
    if scan_ids != [cid for cid, _, _ in comps]:
        # reorder channels back to SOF declaration order (JFIF: Y,Cb,Cr)
        img = img[:, :, [scan_ids.index(cid) for cid, _, _ in comps]]
    if ncomp == 3:
        img = _ycbcr_to_rgb(img)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)
