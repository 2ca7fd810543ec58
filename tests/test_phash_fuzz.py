"""Hypothesis fuzz of the shift-tolerant video near-dup funnel against
a brute-force pure-Python reference: random per-frame hash tables
(small hash space forces band collisions, runs, and offset ties), both
collapse_runs modes. The q94 oracle pins one payload family; this
pins the candidate-generation + modal-offset rule itself on thousands
of adversarial layouts.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdatabowl2024_25_spark.operators.phash import video_near_dup

_BANDS, _MAXHAM, _MINF = 4, 6, 1
_WIDTH = 64 // _BANDS
_MASK = (1 << _WIDTH) - 1

#: tiny hash alphabet -> plenty of band collisions and exact ties
_HASHES = st.sampled_from(
    [0, 1, (1 << 16), (1 << 16) | 1, (7 << 32), (7 << 32) | (1 << 16), -1]
)


def _bands(h):
    u = h & ((1 << 64) - 1)
    return {(i, (u >> (i * _WIDTH)) & _MASK) for i in range(_BANDS)}


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _ref(videos, collapse):
    seqs = {}
    for doc, hs in enumerate(videos):
        if collapse:
            kept, prev = [], object()
            for f, h in enumerate(hs):
                if h != prev:
                    kept.append((f, h))
                prev = h
        else:
            kept = list(enumerate(hs))
        seqs[doc] = kept
    out = {}
    for a in seqs:
        for b in seqs:
            if a >= b:
                continue
            votes = {}
            for fa, ha in seqs[a]:
                for fb, hb in seqs[b]:
                    if _bands(ha) & _bands(hb) and _ham(ha, hb) <= _MAXHAM:
                        votes[fa - fb] = votes.get(fa - fb, 0) + 1
            if votes:
                off, n = max(
                    votes.items(),
                    key=lambda kv: (kv[1], -abs(kv[0]), -kv[0]),
                )
                if n >= _MINF:
                    out[(a, b)] = (off, n)
    return out


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(
    videos=st.lists(
        st.lists(_HASHES, min_size=1, max_size=5), min_size=2, max_size=4
    ),
    collapse=st.booleans(),
)
def test_video_near_dup_matches_bruteforce(spark, videos, collapse):
    rows = [
        (doc, f, h)
        for doc, hs in enumerate(videos)
        for f, h in enumerate(hs)
    ]
    fh = spark.createDataFrame(
        rows, "media_id bigint, frame long, dhash long"
    )
    got = {
        (r.id_a, r.id_b): (r.offset, r.n_match)
        for r in video_near_dup(
            fh,
            bands=_BANDS,
            max_hamming=_MAXHAM,
            min_matching_frames=_MINF,
            collapse_runs=collapse,
        ).collect()
    }
    assert got == _ref(videos, collapse)
