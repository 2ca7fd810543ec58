"""Hypothesis fuzz of merge_into's clause semantics against an
independent pure-Python ANSI-MERGE reference (the gopher_rules fuzz
pattern): random target/source tables with NULL keys, NULL condition
columns, and every clause armed — the q18 oracle proves the fates on
one manufactured layout; this proves them on thousands of adversarial
ones, including the round-10 NULL semantics (NULL keys never match by
default; NULL clause conditions never fire).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.merge import merge_into

# small domains force key collisions and every fate
_KEY = st.one_of(st.none(), st.integers(0, 5))
_VAL = st.integers(-3, 3)
_COND = st.one_of(st.none(), st.booleans())


def _ref_merge(target, source, null_safe):
    """Row-by-row ANSI MERGE: delete if matched & del_cond is True;
    update if matched & upd_cond is True; keep otherwise; insert
    source-only rows whose ins_cond is True (NULL = clause off)."""
    def match(tk, sk):
        if tk is None or sk is None:
            return null_safe and tk is None and sk is None
        return tk == sk

    out = []
    for tk, tv in target:
        srcs = [s for s in source if match(tk, s[0])]
        assert len(srcs) <= 1  # generator guarantees unique source keys
        if not srcs:
            out.append((tk, tv))
            continue
        _, delta, del_c, upd_c, _ = srcs[0]
        if del_c is True:
            continue
        out.append((tk, tv + delta if upd_c is True else tv))
    matched_keys = [
        s[0] for s in source
        if any(match(t[0], s[0]) for t in target)
    ]
    for sk, delta, del_c, upd_c, ins_c in source:
        if sk in matched_keys and (
            sk is not None or null_safe
        ) and any(match(t[0], sk) for t in target):
            continue
        if ins_c is True:
            out.append((sk, delta))
    return sorted(out, key=repr)


@pytest.mark.slow
@settings(max_examples=25, deadline=None)
@given(
    target=st.lists(st.tuples(_KEY, _VAL), max_size=6),
    source=st.lists(
        st.tuples(_KEY, _VAL, _COND, _COND, _COND), max_size=6
    ),
    null_safe=st.booleans(),
)
def test_merge_fates_match_python_reference(
    spark, target, source, null_safe
):
    # unique merge keys on both sides (the cardinality guard is
    # tested separately; here we fuzz clause fates) — NULL keys are
    # only "duplicates" under null_safe semantics
    seen = set()
    tgt = []
    for k, v in target:
        if k not in seen:
            seen.add(k)
            tgt.append((k, v))
    seen = set()
    src = []
    for row in source:
        if row[0] not in seen:
            seen.add(row[0])
            src.append(row)

    t = spark.createDataFrame(
        tgt or [(99, 0)], "k bigint, v bigint"
    )
    s = spark.createDataFrame(
        src or [(98, 0, True, True, True)],
        "k bigint, delta bigint, del_c boolean, upd_c boolean,"
        " ins_c boolean",
    )
    out = merge_into(
        t,
        s,
        ["k"],
        update_set={"v": F.col("t.v") + F.col("s.delta")},
        update_condition=F.col("s.upd_c"),
        delete_condition=F.col("s.del_c"),
        insert_values={"k": F.col("s.k"), "v": F.col("s.delta")},
        insert_condition=F.col("s.ins_c"),
        null_safe_keys=null_safe,
    )
    got = sorted(((r.k, r.v) for r in out.collect()), key=repr)
    want = _ref_merge(tgt or [(99, 0)], src or [(98, 0, True, True, True)], null_safe)
    assert got == want
