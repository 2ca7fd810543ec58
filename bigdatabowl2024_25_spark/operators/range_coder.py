"""First-party context-adaptive binary range coder (the CABAC/LZMA
family) — the entropy stage H.26x actually ships, completing the set:
zlib (LZ77+static-huffman bootstrap) → canonical Huffman
(operators/huffman.py, static codebooks) → THIS (adaptive binary
arithmetic with context modeling, no codebook in the stream at all).

Design (public-knowledge classics, the LZMA/CABAC shape):
- a binary RANGE coder: 32-bit `range`, 64-bit `low` with the
  carry-cache renormalization (emit top byte when range < 2^24);
  decode mirrors the arithmetic exactly, so the roundtrip is
  bit-exact by construction;
- 11-bit adaptive probabilities (start at 1024/2048), shift-5
  update toward the observed bit — the LZMA literal-coder rule;
- bytes code through a per-context BIT TREE (255 probabilities,
  MSB-first), with the context = the previous byte's top 3 bits:
  enough context to exploit residual/mantissa locality, few enough
  trees (8) that the models adapt within the KB-sized payloads the
  codecs produce.

The coder is inherently SEQUENTIAL (every probability depends on all
prior bits), so this is a per-payload Python loop — the parallelism
at 100 TB is across payloads inside mapInPandas, never within one
payload, exactly the ADPCM block-carry / MDCT overlap-add story.
Deterministic: pure integer arithmetic, no floats, no RNG.

Wire format: u32 n_payload_bytes | coded stream. Decode validates
the declared size against the caller's expectation and re-derives
the stream exactly; malformed input raises ValueError (the media
family's errors='coerce' contract).
"""

from __future__ import annotations

import struct

_TOP = 1 << 24
_PROB_BITS = 11
_PROB_INIT = 1 << (_PROB_BITS - 1)
_MOVE_BITS = 5
_N_CTX = 8  # previous byte's top 3 bits

#: Hard per-payload cap for the ENCODE side. Adaptive coding is
#: inherently sequential, so this stage is an interpreted per-byte
#: loop: measured ~300 KB/s encode / ~350 KB/s decode (see SCALE.md
#: "range coder" row). 1 MiB ≈ 3.5 s inside one task — the largest
#: payload that is a cost, not a stall. Above it, the caller gets a
#: loud redirect to entropy='huffman' (chunked-numpy, ~1000× faster)
#: instead of silently parking an executor for minutes. Decode stays
#: unguarded so pre-guard archives remain readable.
_RC_MAX_PAYLOAD = 1 << 20


def _new_probs() -> list[list[int]]:
    return [[_PROB_INIT] * 256 for _ in range(_N_CTX)]


class _Encoder:
    def __init__(self) -> None:
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self) -> None:
        if self.low < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            self.out.append((self.cache + carry) & 0xFF)
            for _ in range(self.cache_size - 1):
                self.out.append((0xFF + carry) & 0xFF)
            self.cache = (self.low >> 24) & 0xFF
            self.cache_size = 0
        self.cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode_bit(self, probs: list[int], idx: int, bit: int) -> None:
        p = probs[idx]
        bound = (self.range >> _PROB_BITS) * p
        if bit == 0:
            self.range = bound
            probs[idx] = p + (((1 << _PROB_BITS) - p) >> _MOVE_BITS)
        else:
            self.low += bound
            self.range -= bound
            probs[idx] = p - (p >> _MOVE_BITS)
        while self.range < _TOP:
            self.range = (self.range << 8) & 0xFFFFFFFF
            self._shift_low()

    def flush(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


class _Decoder:
    def __init__(self, data: bytes, what: str) -> None:
        if len(data) < 5:
            raise ValueError(f"{what}: truncated range-coded stream")
        self.data = data
        self.pos = 1  # first byte is the encoder's initial cache (0)
        if data[0] != 0:
            raise ValueError(f"{what}: bad range-coder preamble")
        self.code = 0
        self.range = 0xFFFFFFFF
        self.what = what
        for _ in range(4):
            self.code = (self.code << 8) | self._byte()

    def _byte(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError(
                f"{self.what}: range-coded stream exhausted"
            )
        b = self.data[self.pos]
        self.pos += 1
        return b

    def decode_bit(self, probs: list[int], idx: int) -> int:
        p = probs[idx]
        bound = (self.range >> _PROB_BITS) * p
        if self.code < bound:
            self.range = bound
            probs[idx] = p + (((1 << _PROB_BITS) - p) >> _MOVE_BITS)
            bit = 0
        else:
            self.code -= bound
            self.range -= bound
            probs[idx] = p - (p >> _MOVE_BITS)
            bit = 1
        while self.range < _TOP:
            self.range = (self.range << 8) & 0xFFFFFFFF
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFF
        return bit


def rc_encode_bytes(raw: bytes) -> bytes:
    """Bytes → u32 length header + context-adaptive range-coded
    stream. Deterministic; size-competitive with zlib on residual-
    like data without any codebook or dictionary in the stream."""
    if len(raw) > _RC_MAX_PAYLOAD:
        raise ValueError(
            f"rc_encode_bytes: payload of {len(raw)} bytes exceeds "
            f"the {_RC_MAX_PAYLOAD}-byte range-coder cap (adaptive "
            "coding runs ~300 KB/s in one task; use entropy="
            "'huffman' for payloads this large)"
        )
    enc = _Encoder()
    probs = _new_probs()
    ctx = 0
    for b in raw:
        tree = probs[ctx]
        node = 1
        for shift in range(7, -1, -1):
            bit = (b >> shift) & 1
            enc.encode_bit(tree, node - 1, bit)
            node = (node << 1) | bit
        ctx = b >> 5
    return struct.pack("<I", len(raw)) + enc.flush()


def rc_decode_bytes(
    data: bytes, expected: int, what: str = "range-coded block"
) -> bytes:
    """Inverse of `rc_encode_bytes`, with the output size KNOWN and
    enforced (the _bounded_inflate contract: a forged header or a
    stream for a different size raises, never over-allocates)."""
    if len(data) < 4:
        raise ValueError(f"{what}: truncated range-coder header")
    (n,) = struct.unpack_from("<I", data)
    if n != expected:
        raise ValueError(
            f"{what}: size mismatch (expected {expected} bytes, "
            f"header says {n})"
        )
    if expected == 0:
        # an empty payload codes to exactly the 5 flush bytes
        if len(data) - 4 > 5:
            raise ValueError(
                f"{what}: trailing garbage after an empty "
                "range-coded stream"
            )
        return b""
    dec = _Decoder(data[4:], what)
    probs = _new_probs()
    out = bytearray(expected)
    ctx = 0
    for i in range(expected):
        tree = probs[ctx]
        node = 1
        for _ in range(8):
            node = (node << 1) | dec.decode_bit(tree, node - 1)
        b = node & 0xFF
        out[i] = b
        ctx = b >> 5
    # strict framing, matching the family contract (zlib rejects any
    # unused_data; huffman checks the exact ceil(n_bits/8) length):
    # the decoder may legitimately leave up to the 5 flush-tail bytes
    # unread, but anything beyond that is trailing garbage appended
    # to a valid stream — reject it instead of decoding silently
    if len(dec.data) - dec.pos > 5:
        raise ValueError(
            f"{what}: {len(dec.data) - dec.pos} unconsumed bytes "
            "after a complete range-coded stream (trailing garbage)"
        )
    return bytes(out)
