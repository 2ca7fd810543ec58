"""Round-15 VERDICT item 7: interop conformance corpus for the RIFF
container formats.

The round-14 RIFF-pad defect was an interop bug the oracle could
never catch: first-party encode+decode AGREED on the shared mistake
(pad counted inside the declared size), so every roundtrip test was
green while spec-conformant external files misparsed. This suite
manufactures the container shapes REAL external encoders emit —
without changing the codec payloads — and pins that our decoders
read them:

- JUNK chunks (the classic CD-R/muxer 2048-byte alignment filler),
  including ODD-length ones whose pad byte sits OUTSIDE the declared
  size (the spec rule round 14 fixed);
- LIST INFO metadata chunks between fmt and data;
- an 18-byte PCM fmt chunk (cbSize=0 extension — what most encoders
  actually write, vs our minimal 16-byte one);
- a 'fact' chunk on plain PCM (spec-legal, common);
- fact-less IMA ADPCM (legal-but-nonconforming external files: the
  documented at-most-one-trailing-pad-sample ambiguity);
- trailing bytes AFTER the RIFF form's declared end (ID3-style
  taggers append; readers must stop at the form boundary);
- top-level JUNK between hdrl and movi in AVI, and stray chunks
  INSIDE movi between frame chunks (rec-list/padding muxer shapes).

All fixtures are built from our own canonical encodes by a
spec-faithful RIFF rewriter, so the PAYLOAD bytes are identical and
any decode difference is a container-walking bug by construction.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bigdatabowl2024_25_spark.operators.media_av import (
    decode_avi_ifv,
    decode_avi_mjpeg,
    decode_wav,
    decode_wav_ima_adpcm,
    encode_avi_ifv,
    encode_avi_mjpeg,
    encode_wav,
    encode_wav_ima_adpcm,
    sample_ifv_frames,
)

# ---------------------------------------------------- RIFF rewriter


def riff_parse(data: bytes) -> tuple[bytes, list[tuple[bytes, bytes]]]:
    """RIFF bytes → (form type, [(chunk id, body)]), spec rules: the
    declared size excludes the odd-length pad byte."""
    assert data[:4] == b"RIFF"
    (form_len,) = struct.unpack("<I", data[4:8])
    form = data[8:12]
    chunks = []
    pos, end = 12, 8 + form_len
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunks.append((cid, data[pos + 8 : pos + 8 + ln]))
        pos += 8 + ln + (ln & 1)
    return form, chunks


def riff_build(form: bytes, chunks: list[tuple[bytes, bytes]]) -> bytes:
    """Inverse of riff_parse: word-aligned pads OUTSIDE declared
    sizes, form size covering everything up to the final pad."""
    body = b"".join(
        cid + struct.pack("<I", len(c)) + c + (b"\x00" if len(c) & 1 else b"")
        for cid, c in chunks
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + form + body


def _insert(chunks, at, cid, body):
    out = list(chunks)
    out.insert(at, (cid, body))
    return out


#: odd-length filler — exercises the pad-outside-size rule every time
_JUNK_ODD = (b"JUNK", b"\x5a" * 37)
_JUNK_BIG = (b"JUNK", b"\x00" * 2048)
_LIST_INFO = (
    b"LIST",
    b"INFO" + b"ISFT" + struct.pack("<I", 11) + b"ext-encoder" + b"\x00",
)


def _pcm_fixture():
    rng = np.random.default_rng(5)
    samples = (rng.normal(0, 4000, 1001)).astype(np.int16)
    return samples, encode_wav(samples, 22050)


def test_wav_pcm_external_shapes():
    samples, canonical = _pcm_fixture()
    form, chunks = riff_parse(canonical)
    assert [c[0] for c in chunks] == [b"fmt ", b"data"]
    # 18-byte fmt (cbSize=0) + JUNK before fmt + INFO between
    fmt18 = chunks[0][1] + b"\x00\x00"
    ext = riff_build(form, [
        _JUNK_ODD, (b"fmt ", fmt18), _LIST_INFO, _JUNK_BIG, chunks[1],
    ])
    arr, rate = decode_wav(ext)
    assert rate == 22050 and (arr[:, 0] == samples).all()
    # spec-legal 'fact' on plain PCM
    fact = riff_build(form, [
        chunks[0], (b"fact", struct.pack("<I", len(samples))), chunks[1],
    ])
    arr2, _ = decode_wav(fact)
    assert (arr2[:, 0] == samples).all()


def test_wav_trailing_bytes_after_form_end():
    """ID3-style taggers append past the RIFF form; readers stop at
    the declared boundary instead of misparsing the tail."""
    samples, canonical = _pcm_fixture()
    tagged = canonical + b"TAG0" + b"\xff" * 129
    arr, rate = decode_wav(tagged)
    assert rate == 22050 and (arr[:, 0] == samples).all()


def test_adpcm_external_shapes():
    rng = np.random.default_rng(6)
    samples = (
        4000 * np.sin(np.arange(2000) / 9.0) + rng.normal(0, 150, 2000)
    ).astype(np.int16)
    canonical = encode_wav_ima_adpcm(samples, 16000, block_align=256)
    ref, rate = decode_wav_ima_adpcm(canonical)
    form, chunks = riff_parse(canonical)
    ids = [c[0] for c in chunks]
    assert ids == [b"fmt ", b"fact", b"data"]
    # JUNK + INFO interleaved everywhere an external muxer puts them
    ext = riff_build(form, [
        _JUNK_ODD, chunks[0], _LIST_INFO, chunks[1], _JUNK_ODD, chunks[2],
    ])
    arr, rate2 = decode_wav_ima_adpcm(ext)
    assert rate2 == rate and (arr == ref).all()
    # fact-less external file (legal, non-conforming): documented
    # at-most-ONE spurious trailing sample, prefix identical
    factless = riff_build(form, [chunks[0], chunks[2]])
    arr3, _ = decode_wav_ima_adpcm(factless)
    assert len(ref) <= len(arr3) <= len(ref) + 1
    assert (arr3[: len(ref)] == ref).all()


def _frames(n=4, h=16, w=16):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    return [np.roll(base, i, axis=0).copy() for i in range(n)]


def _rewrite_avi(canonical: bytes, stray_in_movi: bool) -> bytes:
    """Insert top-level JUNK between hdrl and movi (the 2048-align
    muxer shape) and optionally a stray chunk INSIDE movi between
    frame chunks."""
    form, chunks = riff_parse(canonical)
    assert form == b"AVI "
    out = []
    for cid, body in chunks:
        if cid == b"LIST" and body[:4] == b"movi":
            out.append(_JUNK_BIG)
            if stray_in_movi:
                # splice a JUNK after the first frame chunk
                pos = 4
                (ln,) = struct.unpack("<I", body[pos + 4 : pos + 8])
                cut = pos + 8 + ln + (ln & 1)
                body = (
                    body[:cut]
                    + b"JUNK" + struct.pack("<I", 37) + b"\x5a" * 37
                    + b"\x00"
                    + body[cut:]
                )
        out.append((cid, body))
    return riff_build(form, out)


def test_avi_mjpeg_external_shapes():
    frames = _frames()
    canonical = encode_avi_mjpeg(frames, fps=8, quality=80)
    ref, fps = decode_avi_mjpeg(canonical)
    for stray in (False, True):
        got, fps2 = decode_avi_mjpeg(_rewrite_avi(canonical, stray))
        assert fps2 == fps and len(got) == len(ref)
        assert all((a == b).all() for a, b in zip(got, ref))


@pytest.mark.parametrize("entropy", ["zlib", "huffman"])
def test_avi_ifv_external_shapes(entropy):
    frames = _frames()
    canonical = encode_avi_ifv(
        frames, fps=5, q=4, gop=2, search=2, entropy=entropy
    )
    ref, fps = decode_avi_ifv(canonical)
    for stray in (False, True):
        ext = _rewrite_avi(canonical, stray)
        got, fps2 = decode_avi_ifv(ext)
        assert fps2 == fps
        assert all((a == b).all() for a, b in zip(got, ref))
        # the GOP sampler walks the same container shapes
        sampled = sample_ifv_frames(ext, every_n=2)
        assert all(
            (s == ref[i]).all()
            for s, i in zip(sampled, range(0, len(ref), 2))
        )
    # trailing bytes after the AVI form end are ignored, not parsed
    got3, _ = decode_avi_ifv(canonical + b"\xde\xad\xbe\xef" * 8)
    assert all((a == b).all() for a, b in zip(got3, ref))


# ------------------------------------------- property-driven shapes

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

#: filler chunk ids external tools actually emit (JUNK = alignment
#: filler, PAD  = Sound Forge, FLLR = ProTools, bext = BWF metadata)
_FILLER_IDS = (b"JUNK", b"PAD ", b"FLLR", b"bext")


@settings(max_examples=40, deadline=None)
@given(
    inserts=st.lists(
        st.tuples(
            st.integers(0, 8),                # insertion slot
            st.sampled_from(_FILLER_IDS),
            st.integers(0, 64),               # body length (odd OR even)
        ),
        max_size=5,
    ),
    tail=st.integers(0, 64),
)
def test_wav_random_filler_property(inserts, tail):
    """ANY spec-conformant scatter of filler chunks between a WAV's
    real chunks — arbitrary ids, odd or even lengths, any top-level
    slots, plus post-form trailing bytes — decodes identically to the
    canonical file. Generalizes the hand-picked shapes above."""
    samples, canonical = _pcm_fixture()
    form, chunks = riff_parse(canonical)
    for slot, cid, ln in inserts:
        chunks = _insert(
            chunks, min(slot, len(chunks)), cid, b"\xa5" * ln
        )
    data = riff_build(form, chunks) + b"\xee" * tail
    arr, rate = decode_wav(data)
    assert rate == 22050 and (arr[:, 0] == samples).all()
