"""MDCT transform audio (round 13): the lapped-transform codec —
TDAC perfect-reconstruction property, quantized roundtrip SNR and
content-adaptive compression, frame-boundary seams, determinism, and
the corrupt-payload guard contract."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bigdatabowl2024_25_spark.operators.media_av import (
    decode_wav_mdct,
    encode_wav_mdct,
    mdct_info,
)


def _mix(n=16000, rate=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    s = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.25 * np.sin(2 * np.pi * 1330 * t + 0.3)
        + 0.05 * rng.standard_normal(n)
    )
    return (s * 20000).astype(np.int16)


def _snr(x, y):
    err = x.astype(float) - y.astype(float)
    return 10 * np.log10(
        (x.astype(float) ** 2).mean() / max((err ** 2).mean(), 1e-12)
    )


def test_roundtrip_snr_and_adaptive_ratio():
    x = _mix()
    p = encode_wav_mdct(x, 16000)
    y, rate = decode_wav_mdct(p)
    assert rate == 16000 and len(y) == len(x)
    assert _snr(x, y) > 25.0
    assert x.nbytes / len(p) > 3.0
    # pure tone: sparse spectrum → mostly-zero mantissas → far
    # smaller payload than the noisy mix (content-adaptive, the
    # transform-coding signature)
    t = np.arange(16000) / 16000
    tone = (0.6 * np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    pt = encode_wav_mdct(tone, 16000)
    assert _snr(tone, decode_wav_mdct(pt)[0]) > 35.0
    assert len(pt) < len(p) / 3
    # more mantissa bits → higher fidelity, bigger payload
    p10 = encode_wav_mdct(x, 16000, qbits=10)
    assert _snr(x, decode_wav_mdct(p10)[0]) > _snr(x, y) + 5
    assert len(p10) > len(p)


def test_tdac_near_perfect_reconstruction():
    """The Princen-Bradley TDAC property: with generous mantissas the
    only loss is quantization — at qbits=15 the roundtrip sits above
    60 dB, i.e. the windowing/overlap-add machinery itself is exact
    (the unquantized transform reconstructs to ~1e-13)."""
    x = _mix(n=8192)
    y, _ = decode_wav_mdct(encode_wav_mdct(x, 16000, qbits=15))
    assert _snr(x, y) > 60.0


def test_frame_boundary_counts_and_silence():
    for frame in (64, 512):
        half = frame // 2
        for n in (half - 1, half, half + 1, 4 * half, 4 * half + 3):
            x = _mix(n=n)
            p = encode_wav_mdct(x, 16000, frame=frame)
            info = mdct_info(p)
            assert info["n_samples"] == n
            assert info["n_frames"] == (n + half - 1) // half + 1
            y, _ = decode_wav_mdct(p)
            assert len(y) == n
    # silence: the zero-scale guard path — decodes to exact zeros
    z = np.zeros(1000, dtype=np.int16)
    y, _ = decode_wav_mdct(encode_wav_mdct(z, 16000))
    assert (y == 0).all()


def test_determinism():
    x = _mix(n=5000)
    assert encode_wav_mdct(x, 16000) == encode_wav_mdct(x, 16000)


def test_corrupt_payload_guards():
    x = _mix(n=1000)
    good = encode_wav_mdct(x, 16000)

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_mdct(b"junk")
    with pytest.raises(ValueError, match="int16"):
        encode_wav_mdct(x.astype(np.float32), 16000)
    with pytest.raises(ValueError, match="mono"):
        encode_wav_mdct(np.stack([x, x], axis=1), 16000)
    with pytest.raises(ValueError, match="empty"):
        encode_wav_mdct(np.array([], dtype=np.int16), 16000)
    with pytest.raises(ValueError, match="power of two"):
        encode_wav_mdct(x, 16000, frame=500)
    with pytest.raises(ValueError, match="qbits"):
        encode_wav_mdct(x, 16000, qbits=16)

    # cross-codec rejection: PCM and ADPCM files are "not MDCT"
    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_wav,
        encode_wav,
        encode_wav_ima_adpcm,
    )

    with pytest.raises(ValueError, match="not MDCT"):
        decode_wav_mdct(encode_wav(x, 16000))
    with pytest.raises(ValueError, match="not MDCT"):
        decode_wav_mdct(encode_wav_ima_adpcm(x, 16000))
    # and the PCM decoder rejects MDCT payloads
    with pytest.raises(ValueError):
        decode_wav(good)

    # fact-count tamper: mantissa block no longer matches the padding
    # rule → loud size error, never a silent wrong-length decode
    bad = bytearray(good)
    i = bad.index(b"fact")
    struct.pack_into("<I", bad, i + 8, 10 ** 6)
    with pytest.raises(ValueError, match="size|expected"):
        decode_wav_mdct(bytes(bad))

    # corrupt the zlib stream
    bad2 = bytearray(good)
    j = bad2.index(b"data") + 12
    bad2[j] ^= 0xFF
    with pytest.raises((ValueError, zlib.error)):
        decode_wav_mdct(bytes(bad2))


def test_distributed_decode(spark):
    from bigdatabowl2024_25_spark.operators.multimodal import (
        decode_audio_mdct,
    )

    rows = []
    for d in range(6):
        n = 900 + d * 137
        rate = 8000 + (d % 3) * 4000
        rows.append((d, encode_wav_mdct(_mix(n=n, seed=d), rate)))
    df = spark.createDataFrame(
        rows + [(99, b"junk")], "media_id long, payload binary"
    )
    got = {r.media_id: r for r in decode_audio_mdct(df).collect()}
    for d in range(6):
        r = got[d]
        assert r.ok and r.n_samples == 900 + d * 137
        assert r.sample_rate == 8000 + (d % 3) * 4000
        assert r.frame == 512 and r.qbits == 8
        assert r.n_frames == (r.n_samples + 255) // 256 + 1
    assert got[99].ok is False and got[99].n_samples is None


def test_mdct_fuzz_roundtrip():
    """Randomized fuzz: arbitrary lengths, frames, qbits — decode
    always returns exactly n samples at the encoded rate, and high
    qbits always beats low qbits on SNR for the same signal."""
    rng = np.random.default_rng(7)
    for _ in range(12):
        n = int(rng.integers(1, 3000))
        frame = int(rng.choice([16, 64, 256, 1024]))
        qbits = int(rng.choice([2, 6, 8, 12, 15]))
        x = (rng.standard_normal(n) * 8000).astype(np.int16)
        p = encode_wav_mdct(x, 12345, frame=frame, qbits=qbits)
        y, rate = decode_wav_mdct(p)
        assert rate == 12345 and len(y) == n and y.dtype == np.int16
        info = mdct_info(p)
        assert info["n_samples"] == n and info["qbits"] == qbits


def test_transcode_audio_both_codecs(spark):
    """The ingest-time compress pass: PCM payloads transcode to both
    compressed codecs distributed, decode back within each codec's
    fidelity class, stereo downmixes deterministically, and corrupt
    payloads coerce to null rows."""
    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_wav_ima_adpcm,
        encode_wav,
    )
    from bigdatabowl2024_25_spark.operators.multimodal import (
        transcode_audio,
    )

    mono = _mix(n=4000)
    stereo = np.stack([mono, (mono // 2).astype(np.int16)], axis=1)
    df = spark.createDataFrame(
        [
            (0, encode_wav(mono, 16000)),
            (1, encode_wav(stereo, 16000)),
            (2, b"garbage"),
        ],
        "media_id long, payload binary",
    )
    with pytest.raises(ValueError, match="codec must be"):
        transcode_audio(df, codec="flac")
    for codec, dec in (
        ("adpcm", decode_wav_ima_adpcm),
        ("mdct", decode_wav_mdct),
    ):
        got = {
            r.media_id: r for r in transcode_audio(df, codec).collect()
        }
        assert got[2].payload is None and got[2].n_bytes_out is None
        y0, rate0 = dec(bytes(got[0].payload))
        assert rate0 == 16000 and len(y0) == len(mono)
        assert _snr(mono, y0) > 15.0
        assert got[0].n_bytes_out < got[0].n_bytes_in / 2
        # stereo downmix: integer mean, floor division — re-derive
        want = (
            stereo.astype(np.int32).sum(axis=1) // 2
        ).astype(np.int16)
        y1, _ = dec(bytes(got[1].payload))
        assert _snr(want, y1) > 15.0


def test_corrupt_frame_header_is_valueerror_not_zerodivision():
    """A corrupt frame field (0) must surface as ValueError from
    mdct_info itself — half=0 would otherwise divide by zero before
    decode's guard, escaping the errors='coerce' exception set."""
    x = _mix(n=500)
    good = bytearray(encode_wav_mdct(x, 16000))
    i = good.index(b"fmt ")
    # frame lives at fmt-body offset 18 (tag2+ch2+rate4+br4+ba2+bits2+cb2)
    struct.pack_into("<H", good, i + 8 + 18, 0)
    with pytest.raises(ValueError, match="corrupt MDCT"):
        mdct_info(bytes(good))
    with pytest.raises(ValueError, match="corrupt MDCT"):
        decode_wav_mdct(bytes(good))


def test_review_fixes_mdct_bounds_and_envelope():
    """Round-13 review fixes: frame upper bound is a clean ValueError
    (not a struct.error the coerce wrappers would swallow as data
    corruption); bytes appended past the RIFF envelope — including a
    forged trailing 'fact' chunk — are invisible to both the info
    probe and the decoder; a mantissa-stream bomb raises bounded."""
    x = _mix(n=800)
    with pytest.raises(ValueError, match="power of two"):
        encode_wav_mdct(x, 16000, frame=65536)

    good = encode_wav_mdct(x, 16000)
    forged = good + b"fact" + struct.pack("<I", 4) + struct.pack(
        "<I", 7
    )
    assert mdct_info(forged)["n_samples"] == 800
    y0, _ = decode_wav_mdct(good)
    y1, _ = decode_wav_mdct(forged)
    assert (y0 == y1).all()

    # bomb in the data chunk, in place (same chunk length)
    i = good.index(b"data")
    (dlen,) = struct.unpack_from("<I", good, i + 4)
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)[:dlen]
    bad = bytearray(good)
    bad[i + 8:i + 8 + dlen] = bomb.ljust(dlen, b"\x00")
    with pytest.raises(ValueError, match="size mismatch|corrupt|error"):
        decode_wav_mdct(bytes(bad))


def test_review_fix_null_payload_coerces(spark):
    """A NULL payload (an upstream coerce already failed that row)
    must propagate as a null row through transcode_audio and the
    decode wrappers — never kill the task on bytes(None)."""
    from bigdatabowl2024_25_spark.operators.multimodal import (
        decode_audio_adpcm,
        decode_audio_mdct,
        decode_video_ifv,
        transcode_audio,
    )
    from bigdatabowl2024_25_spark.operators.media_av import encode_wav

    df = spark.createDataFrame(
        [(0, encode_wav(_mix(n=500), 16000)), (1, None)],
        "media_id long, payload binary",
    )
    tc = {r.media_id: r for r in transcode_audio(df, "adpcm").collect()}
    assert tc[0].payload is not None and tc[1].payload is None
    assert tc[1].n_bytes_in is None and tc[1].n_bytes_out is None
    # chain the transcoded frame (with its null row) into the decoder
    dec = {
        r.media_id: r
        for r in decode_audio_adpcm(
            transcode_audio(df, "adpcm").select("media_id", "payload")
        ).collect()
    }
    assert dec[0].ok and dec[1].ok is False
    for wrapper in (decode_audio_mdct, decode_video_ifv):
        got = {r.media_id: r for r in wrapper(df).collect()}
        assert got[1].ok is False  # null payload -> ok=False row
