"""Algorithmic property tests for the text/codec cores.

The q65 oracle proves Spark and DuckDB compute the SAME winnowing
formula — but an algorithmic error implemented identically on both
sides would pass that check. These tests close the loop with an
INDEPENDENT pure-Python reference implementation plus the published
MOSS guarantee (Schleimer/Wilkerson/Aiken, SIGMOD'03: any shared
substring of length ≥ w+k−1 shares a fingerprint), and
hypothesis-driven roundtrips for the from-scratch codecs on
adversarial shapes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.text import (
    WINNOW_B,
    WINNOW_M,
    winnow_fingerprints,
)


def ref_winnow(text: str, k: int = 8, w: int = 4) -> set[int]:
    """Direct-from-the-paper winnowing: polynomial-hash every char
    k-gram, slide a w-window, keep each window's min, dedupe."""
    codes = [ord(c) for c in text]
    grams = []
    for i in range(len(codes) - k + 1):
        h = 0
        for j in range(k):
            h = (h * WINNOW_B + codes[i + j]) % WINNOW_M
        grams.append(h)
    return {
        min(grams[i : i + w]) for i in range(len(grams) - w + 1)
    }


_ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=120,
)


@settings(max_examples=200, deadline=None)
@given(prefix=_ASCII_TEXT, shared=_ASCII_TEXT, suffix=_ASCII_TEXT)
def test_moss_guarantee_shared_substring_shares_fingerprint(
    prefix, shared, suffix
):
    """The winnowing contract on the reference implementation: two
    documents sharing a substring of length ≥ w+k−1 = 11 must share at
    least one fingerprint, and a doc shorter than k+w−1 has none."""
    k, w = 8, 4
    if len(shared) >= w + k - 1:
        a = prefix + shared
        b = shared + suffix
        assert ref_winnow(a, k, w) & ref_winnow(b, k, w), (a, b)
    tiny = (prefix + shared)[: k + w - 2]
    assert ref_winnow(tiny, k, w) == set()


def test_winnow_operator_matches_reference(spark):
    """The Spark window/lead formulation (round-6 rewrite of q65's
    hot path) must equal the pure-Python reference on edge-shaped
    docs: empty, shorter-than-k, exactly the k+w−1 threshold, all-same
    chars (every gram hash equal), periodic text, and realistic
    prose."""
    k, w = 8, 4
    docs = [
        (0, ""),
        (1, "short"),
        (2, "x" * (k + w - 2)),          # one below threshold → empty
        (3, "y" * (k + w - 1)),          # exactly threshold → 1 fp
        (4, "z" * 50),                   # degenerate: all grams equal
        (5, "abcd" * 12),                # periodic
        (6, "the quick brown fox jumps over the lazy dog " * 3),
        (7, "The Quick Brown Fox!  With   punctuation & CAPS."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, body string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, "body", "doc_id", k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for doc_id, body in docs:
        assert got.get(doc_id, set()) == ref_winnow(body, k, w), doc_id
    # and on real corpus text (ASCII docs so ord == ascii()):
    real = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("text").rlike(r"^[\x20-\x7e]*$"))
        .select("doc_id", "text")
        .limit(20)
    )
    rows = real.collect()
    rgot: dict[int, set[int]] = {}
    for r in winnow_fingerprints(real, "text", "doc_id", k=k, w=w).collect():
        rgot.setdefault(r.doc_id, set()).add(r.fp)
    assert rows, "ASCII corpus slice unexpectedly empty"
    for r in rows:
        assert rgot.get(r.doc_id, set()) == ref_winnow(r.text, k, w)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    channels=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_any_shape(h, w, channels, seed):
    """The from-scratch baseline JPEG codec must survive ANY image
    shape — including dims far from the 8/16 MCU grid (1×1, 33×1) —
    with the decoded image matching the source within quantization
    tolerance, and constant images almost exactly."""
    from bigdatabowl2024_25_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    # smooth it: JPEG tolerance on pure noise is meaningless; a blurred
    # field is the codec's design regime
    img = base.astype(np.float64)
    for _ in range(2):
        img = (
            img
            + np.roll(img, 1, 0)
            + np.roll(img, -1, 0)
            + np.roll(img, 1, 1)
            + np.roll(img, -1, 1)
        ) / 5.0
    img = img.astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape[:2] == (h, w)
    assert out.dtype == np.uint8
    got = out if out.ndim == 3 else out[:, :, None]
    want = img if channels == 3 else np.repeat(img, got.shape[2], axis=2)
    if want.shape[2] != got.shape[2]:  # gray in, gray out
        got = got[:, :, :1]
        want = want[:, :, :1]
    err = np.abs(got.astype(int) - want.astype(int))
    assert err.mean() < 12.0, (h, w, channels, err.mean())

    flat = np.full((h, w, channels), 137, dtype=np.uint8)
    fout = decode_jpeg(encode_jpeg(flat, quality=92))
    fgot = fout if fout.ndim == 3 else fout[:, :, None]
    assert np.abs(fgot.astype(int) - 137).max() <= 4


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(1, 2000),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100]),
    target=st.sampled_from([4000, 8000, 22050]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_resample_properties(n, ch, rate, target, seed):
    """WAV roundtrip is exact for int16 PCM, and nearest-neighbor
    resampling lands exactly floor(n·target/rate) samples (≥1) with
    every output sample drawn from the input."""
    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_wav,
        encode_wav,
        resample_wav,
    )

    rng = np.random.default_rng(seed)
    sig = rng.integers(-(2**15), 2**15, size=(n, ch), dtype=np.int64).astype(
        np.int16
    )
    enc = encode_wav(sig, rate)
    arr, got_rate = decode_wav(enc)
    assert got_rate == rate and np.array_equal(arr, sig)
    out, out_rate = decode_wav(resample_wav(enc, target))
    assert out_rate == target
    assert len(out) == max(1, n * target // rate)
    assert set(map(tuple, out.tolist())) <= set(map(tuple, sig.tolist()))


def test_redact_pii(spark):
    """Typed placeholders replace every PII span; surrounding prose
    survives; card digits are not half-eaten by the phone pattern."""
    from bigdatabowl2024_25_spark.operators.text import redact_pii

    rows = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@example.co.uk today"),
            (1, "call (555) 123-4567 or +1 555-123-4567"),
            (2, "server 192.168.0.12 answered"),
            (3, "card 4111 1111 1111 1111 on file"),
            (4, "no pii here, just words"),
        ],
        "i long, t string",
    ).select("i", redact_pii(F.col("t")).alias("t"))
    got = {r.i: r.t for r in rows.collect()}
    assert got[0] == "mail me at [EMAIL] today"
    assert got[1] == "call [PHONE] or [PHONE]"
    assert got[2] == "server [IP] answered"
    assert got[3] == "card [CARD] on file"
    assert got[4] == "no pii here, just words"
    for v in got.values():
        assert "@" not in v and "4111" not in v and "192.168" not in v
    # review-found leak cases: non-16-digit cards (Amex 15, Visa 13,
    # UnionPay 19), bare E.164, and a year that must NOT be eaten
    more = spark.createDataFrame(
        [
            (10, "amex 378282246310005 ok"),
            (11, "amex 3782 822463 10005 ok"),
            (12, "visa 4222222222222 ok"),
            (13, "union 6011111111111111117 ok"),
            (14, "call +15551234567 now"),
            (15, "in 1955 the phone 555-123-4567 rang"),
        ],
        "i long, t string",
    ).select("i", redact_pii(F.col("t")).alias("t"))
    got2 = {r.i: r.t for r in more.collect()}
    assert got2[10] == "amex [CARD] ok"
    assert got2[11] == "amex [CARD] ok"
    assert got2[12] == "visa [CARD] ok"
    assert got2[13] == "union [CARD] ok"
    assert got2[14] == "call [PHONE] now"
    assert got2[15] == "in 1955 the phone [PHONE] rang"


def test_pack_documents_next_fit(spark):
    """Next-fit invariants: every bin's token total ≤ capacity unless
    it holds a single oversized doc; bins are contiguous in id order
    per shard; the assignment equals a sequential reference walk; and
    the result is identical under repartitioning."""
    from bigdatabowl2024_25_spark.operators.text import pack_documents

    docs = [
        (i, "w " * n, f"s{i % 2}")
        for i, n in enumerate([5, 3, 4, 10, 2, 2, 2, 25, 1, 6])
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, src string")

    def ref(items, cap):
        out, b, filled = {}, 0, 0
        for i, n in items:
            if filled > 0 and filled + n > cap:
                b, filled = b + 1, 0
            out[i] = b
            filled += n
        return out

    for shard_col in (None, "src"):
        got = pack_documents(
            df, "text", "doc_id", 8, shard_col, allow_global=True
        ).collect()
        rows = sorted((r for r in got), key=lambda r: r.doc_id)
        # n_tokens = NON-EMPTY whitespace tokens ("w " * n → n tokens;
        # the trailing-space empty token is filtered by the operator)
        by_shard: dict = {}
        for r in rows:
            key = getattr(r, "src", None) if shard_col else 0
            by_shard.setdefault(key, []).append((r.doc_id, r.n_tokens))
        want = {}
        for items in by_shard.values():
            want.update(ref(items, 8))
        assert {r.doc_id: r.bin for r in rows} == want
        # capacity invariant
        totals: dict = {}
        for r in rows:
            key = (getattr(r, "src", None) if shard_col else 0, r.bin)
            totals.setdefault(key, []).append(r.n_tokens)
        for members in totals.values():
            assert sum(members) <= 8 or len(members) == 1
    a = sorted(
        map(
            tuple,
            pack_documents(
                df, "text", "doc_id", 8, allow_global=True
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pack_documents(
                df.repartition(5), "text", "doc_id", 8, allow_global=True
            ).collect(),
        )
    )
    assert a == b
    # the 100 TB scale trap must be loud: global packing (one task
    # holding the whole corpus) requires explicit opt-in
    with pytest.raises(ValueError, match="allow_global"):
        pack_documents(df, "text", "doc_id", 8)
    # non-bigint id columns must pass through with their own type
    sdf = df.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("uid"), "text"
    )
    srows = pack_documents(
        sdf, "text", "uid", 8, allow_global=True
    ).collect()
    assert {r.uid for r in srows} == {f"doc-{i}" for i in range(10)}
    # empty/whitespace-only docs cost 0 tokens, not 1
    edf = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "a b")], "doc_id long, text string"
    )
    en = {r.doc_id: r.n_tokens for r in
          pack_documents(
              edf, "text", "doc_id", 8, allow_global=True
          ).collect()}
    assert en == {0: 0, 1: 0, 2: 2}


def test_decontaminate_gram_boundary(spark):
    """decontaminate flags exactly the docs sharing a full n-word gram
    with the benchmark set: an exact copy (all grams), a doc embedding
    one benchmark 5-gram (one hit), a doc sharing only a 4-word run
    (below the boundary → clean), and a disjoint doc (clean)."""
    from bigdatabowl2024_25_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),       # exact copy: 4 distinct 5-grams
            (2, "x y a b c d e z w"),     # embeds gram "a b c d e"
            (3, "x b c d e y z w q"),     # only a 4-word run → clean
            (4, "p q r s t u v w x"),     # disjoint → clean
        ],
        "doc_id long, text string",
    )
    hits = {
        r.doc_id: r.n_hits
        for r in decontaminate(corpus, bench, "text", "doc_id", n=5).collect()
    }
    assert hits == {1: 4, 2: 1}


def test_bm25_matches_python_reference(spark):
    """bm25 must equal a direct-from-the-formula Python implementation
    (Lucene +1 IDF variant) on a corpus with repeated terms, varying
    lengths, and a term absent from some docs."""
    import math

    from bigdatabowl2024_25_spark.operators.text import bm25

    docs = [
        (0, "data spark data table"),
        (1, "window join group"),
        (2, "data data data data spark window"),
        (3, "a b c d e f g h i j k l"),
    ]
    terms, k1, b = ["data", "window"], 1.2, 0.75
    toks = [d.split(" ") for _, d in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in toks) / n

    def ref(i):
        s = 0.0
        for t in terms:
            df = sum(1 for tk in toks if t in tk)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tf = toks[i].count(t)
            s += idf * (
                tf * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * len(toks[i]) / avgdl))
            )
        return s

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.bm25
        for r in bm25(df, "text", terms, k1=k1, b=b).collect()
    }
    for i in range(n):
        assert abs(got[i] - ref(i)) < 1e-12, (i, got[i], ref(i))
    # absent-everywhere term scores 0 for every doc
    zero = bm25(df, "text", ["zzz"], k1=k1, b=b).collect()
    assert all(r.bm25 == 0.0 for r in zero)


def test_repetition_features_reference(spark):
    """Repetition signals against hand-computed values: a no-repeat
    doc scores 0, a fully-repeated doc approaches 1, and the bigram
    mode counts overlapping occurrences like the direct formula."""
    from bigdatabowl2024_25_spark.operators.text import repetition_features

    docs = [
        (0, "a b c d"),           # all distinct: dup 0, each bigram once
        (1, "x x x x"),           # dup 3/4; bigram "x x" 3/3
        (2, "a b a b a"),         # dup 3/5; "a b" 2 of 4 bigrams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rep = repetition_features(F.col("text"))
    rows = {
        r.doc_id: (r.d, r.t)
        for r in df.select(
            "doc_id", rep["dup_word_frac"].alias("d"),
            rep["top_bigram_frac"].alias("t"),
        ).collect()
    }
    assert rows[0] == (0.0, 1.0 / 3.0)
    assert rows[1] == (0.75, 1.0)
    assert rows[2] == (1.0 - 2.0 / 5.0, 0.5)  # 2 distinct of 5 tokens


def test_repetition_features_ignore_empty_tokens(spark):
    """Irregular whitespace must not register phantom repeats or
    space-polluted bigrams: 'a  b c' has no duplicate words."""
    from bigdatabowl2024_25_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [(0, "a  b c"), (1, "x  x  x")], "doc_id long, text string"
    )
    rep = repetition_features(F.col("text"))
    rows = {
        r.doc_id: (r.d, r.t)
        for r in df.select(
            "doc_id", rep["dup_word_frac"].alias("d"),
            rep["top_bigram_frac"].alias("t"),
        ).collect()
    }
    assert rows[0] == (0.0, 0.5)        # bigrams: 'a b', 'b c'
    assert rows[1] == (1.0 - 1.0 / 3.0, 1.0)  # all 'x x'


def test_repetition_features_empty_docs(spark):
    """Regression (ADVICE r7): empty/whitespace/NULL docs must score
    0.0 repetition, not NULL — a `dup_word_frac < x` cleanliness filter
    must keep empty docs rather than silently dropping them as
    NULL-unknown."""
    from bigdatabowl2024_25_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None)], "doc_id long, text string"
    )
    rep = repetition_features(F.col("text"))
    rows = {
        r.doc_id: (r.d, r.t)
        for r in df.select(
            "doc_id", rep["dup_word_frac"].alias("d"),
            rep["top_bigram_frac"].alias("t"),
        ).collect()
    }
    assert rows == {0: (0.0, 0.0), 1: (0.0, 0.0), 2: (0.0, 0.0)}


def test_chunk_documents_reference(spark):
    """Chunk windows against a direct Python reference: full coverage
    (every token in some chunk), overlap honored, trailing remainder
    kept, short docs yield exactly one chunk, invalid overlap raises."""
    import pytest

    from bigdatabowl2024_25_spark.operators.text import chunk_documents

    def ref(text, size, overlap):
        words = [w for w in text.split(" ") if w != ""]
        stride = size - overlap
        out, s = [], 0
        while True:
            out.append(words[s : s + size])
            if s + stride > max(len(words) - overlap - 1, 0):
                break
            s += stride
        return out

    docs = [
        (0, " ".join(f"w{i}" for i in range(13))),
        (1, "a b c"),                       # shorter than size
        (2, "x  y   z q r s t u v"),        # irregular whitespace
        (3, " ".join(f"t{i}" for i in range(12))),  # exact multiple
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for size, overlap in [(4, 0), (4, 1), (5, 2)]:
        got: dict[int, list[list[str]]] = {}
        rows = chunk_documents(df, "text", "doc_id", size, overlap).collect()
        for r in rows:
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.chunk_text.split(" "), r.n_tokens)
            )
        for doc_id, text in docs:
            want = ref(text, size, overlap)
            mine = [c for _, c, _ in sorted(got[doc_id])]
            assert mine == want, (doc_id, size, overlap, mine, want)
            for _, c, n in got[doc_id]:
                assert n == len(c)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", 4, 4)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_decontaminate_matches_python_reference(spark, seed):
    """Property: a corpus doc is flagged iff it shares at least one
    n-word run with some benchmark doc, with n_hits = the count of
    distinct shared grams — checked against a direct Python set
    implementation on random small-vocab corpora (small vocab forces
    plenty of chance collisions, the hard case)."""
    import random

    from bigdatabowl2024_25_spark.operators.dedup import decontaminate

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(6)]
    n = 3

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15)))

    bench = [(i, doc()) for i in range(3)]
    corpus = [(100 + i, doc()) for i in range(8)]

    def grams(t):
        ws = t.split(" ")
        return {
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        }

    bg = set().union(*(grams(t) for _, t in bench))
    want = {
        i: len(grams(t) & bg) for i, t in corpus if grams(t) & bg
    }
    got = {
        r.doc_id: r.n_hits
        for r in decontaminate(
            spark.createDataFrame(corpus, "doc_id long, text string"),
            spark.createDataFrame(bench, "doc_id long, text string"),
            "text",
            "doc_id",
            n=n,
        ).collect()
    }
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    size=st.integers(2, 12),
    overlap_frac=st.floats(0.0, 0.9),
    n_words=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_chunk_documents_reconstruction(
    spark, size, overlap_frac, n_words, seed
):
    """Property over random geometries: dropping each chunk's first
    `overlap` tokens (except the first chunk) and concatenating in
    chunk order reconstructs the exact token sequence — no token lost,
    duplicated, or reordered by the windowing."""
    import random

    from bigdatabowl2024_25_spark.operators.text import chunk_documents

    overlap = min(int(size * overlap_frac), size - 1)
    rng = random.Random(seed)
    words = [f"w{rng.randint(0, 9)}_{i}" for i in range(n_words)]
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_text.split(" "))
        for r in chunk_documents(df, "text", "doc_id", size, overlap).collect()
    )
    rebuilt = list(rows[0][1])
    for _, chunk in rows[1:]:
        rebuilt.extend(chunk[overlap:])
    assert rebuilt == words, (size, overlap, n_words)


def test_chunk_documents_empty_docs_yield_no_chunks(spark):
    """Empty, whitespace-only, and NULL texts produce ZERO chunks —
    not a phantom ('', 0) row from the always-nonempty starts."""
    from bigdatabowl2024_25_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "a b")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, "text", "doc_id", 4, 1).collect()
    assert {r.doc_id for r in rows} == {3}
    assert rows[0].chunk_text == "a b"


# ---- PII redaction fuzz: Spark (Java regex) vs Python `re` ------------

_pii_filler = st.lists(
    st.text(alphabet="abcdefgh xyz", min_size=1, max_size=8),
    min_size=0, max_size=3,
)
_pii_email = st.builds(
    lambda a, b: f"{a}@{b}.com",
    st.text(alphabet="abc0129._%+-", min_size=1, max_size=8).filter(
        lambda s: s.strip(".")  # local part must keep a word char
    ),
    st.text(alphabet="abcd01", min_size=1, max_size=6),
)
_pii_phone = st.sampled_from([
    "+1 (555) 123-4567", "(303) 555-0100", "555 123 4567",
    "+447911123456", "303-555-0100",
])
_pii_ip = st.builds(
    lambda a, b: f"{a}.{b}.0.1", st.integers(0, 255), st.integers(0, 255)
)
_pii_card = st.sampled_from([
    "4111 1111 1111 1111", "4111-1111-1111-1111", "4111111111111",
    "378282246310005", "6212345678901265007",
])
_pii_piece = st.one_of(
    st.text(alphabet="abcdefgh ", min_size=1, max_size=12),
    _pii_email, _pii_phone, _pii_ip, _pii_card,
)
_pii_doc = st.builds(
    lambda pieces: " ".join(pieces),
    st.lists(_pii_piece, min_size=0, max_size=6),
)


@given(st.lists(_pii_doc, min_size=1, max_size=12))
@settings(max_examples=20, deadline=None)
def test_redact_pii_matches_python_re(spark, docs):
    """The redaction chain must agree byte-for-byte with a Python `re`
    reference applying the same patterns in the same order — the
    cross-engine check that also guards the DuckDB-oracle mirror
    (three leftmost-first engines, one contract). ASCII-only inputs:
    Java's \\d is ASCII while Python's is unicode, which is a
    documented non-goal for this corpus scrubber."""
    import re as _re

    from bigdatabowl2024_25_spark.operators.text import (
        PII_PATTERNS,
        redact_pii,
    )

    def ref(t: str) -> str:
        for name in ("EMAIL", "CARD", "PHONE", "IP"):
            t = _re.sub(PII_PATTERNS[name], f"[{name}]", t)
        return t

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i long, text string"
    )
    got = {
        r.i: r.red
        for r in df.select(
            "i", redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    want = {i: ref(d) for i, d in enumerate(docs)}
    assert got == want


def test_c4_clean_lines_reference(spark):
    """C4 line rules against a from-the-definition Python walk: keep
    lines ending in terminal punctuation with >=5 words and no
    boilerplate phrase; kill pages with braces / lorem ipsum / too few
    surviving lines; rebuild preserves line order."""
    import re

    from bigdatabowl2024_25_spark.operators.text import (
        C4_DOC_PHRASES,
        C4_LINE_PHRASES,
        c4_clean_lines,
    )

    def ref(docs, min_words=5, min_lines=3):
        out = {}
        for i, text in docs:
            if "{" in text or any(p in text.lower() for p in C4_DOC_PHRASES):
                continue
            kept = [
                l
                for l in text.split("\n")
                if re.search(r'[.!?"]$', l)
                and len([w for w in l.split(" ") if w]) >= min_words
                and not any(p in l.lower() for p in C4_LINE_PHRASES)
            ]
            if len(kept) >= min_lines:
                out[i] = ("\n".join(kept), len(kept))
        return out

    GOOD = "this line has enough words to survive."
    docs = [
        (1, f"{GOOD}\nshort one.\n{GOOD}\nno terminal punctuation here\n{GOOD}"),
        (2, f"{GOOD}\nplease enable javascript for this.\n{GOOD}\n{GOOD}"),
        (3, f"{GOOD}\n{GOOD}\nsome code {{ inside }}"),      # brace kill
        (4, f"{GOOD}\nlorem ipsum dolor sit amet etc.\n{GOOD}"),  # filler kill
        (5, f"{GOOD}\n{GOOD}"),                               # < min_lines
        (6, f"{GOOD}\nthis one ends with a question mark ok?\n"
            f'he said "quoted line with five words."'),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_kept)
        for r in c4_clean_lines(df, "text", "doc_id").collect()
    }
    want = ref(docs)
    assert got == want
    assert set(got) == {1, 2, 6}
    assert got[1][1] == 3  # order-preserving, 3 survivors


def test_bm25_topk_reference_and_edges(spark):
    import math

    from bigdatabowl2024_25_spark.operators.text import bm25_topk

    corpus = [
        (0, "join hash join scan"),
        (1, "hash table small"),
        (2, "scan scan scan scan scan"),
        (3, "unrelated words only"),
    ]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    queries = {7: ["join", "scan"], 8: ["missingterm"]}
    out = bm25_topk(df, "text", "doc_id", queries, k=2)
    got = {
        (r.q_id, r.rank): (r.doc_id, r.score) for r in out.collect()
    }

    # pure-python reference (same formula, term-sorted fold, round 6)
    def tf(text, t):
        return sum(1 for w in text.split(" ") if w == t)

    n = len(corpus)
    sum_dl = sum(len(t.split(" ")) for _, t in corpus)
    avgdl = sum_dl / float(n)
    k1, b = 1.2, 0.75

    def score(text, terms):
        s = 0.0
        for t in sorted(terms):
            f = tf(text, t)
            if f == 0:
                continue
            dfq = sum(1 for _, x in corpus if tf(x, t) > 0)
            idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
            dl = len(text.split(" "))
            s += idf * (f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl / avgdl)))
        return round(s, 6)

    want = sorted(
        ((score(t, ["join", "scan"]), d) for d, t in corpus if score(t, ["join", "scan"]) > 0),
        key=lambda x: (-x[0], x[1]),
    )[:2]
    assert got[(7, 1)] == (want[0][1], want[0][0])
    assert got[(7, 2)] == (want[1][1], want[1][0])
    # query with no matching docs yields no rows at all
    assert not any(q == 8 for q, _ in got)
