"""Tokenizer artifact persistence (round 12).

A production pipeline trains a tokenizer ONCE (hours of corpus work)
and reuses it across every downstream run, cluster, and team — so the
learned state needs a durable, engine-portable representation. The
reference never persists its models (each R/notebook session retrains
in place); this is part of the LLM-pipeline surface the repo adds.

Format: one parquet table (single partition — the payload is
vocab-sized, 10⁴-10⁵ rows even for GPT-class vocabularies) with the
superset schema

    family string, rank bigint, a string, b string, piece string,
    li bigint

where each family uses its own columns and leaves the rest NULL:

- 'bpe' / 'bbpe'  : rank-ordered merges in (a, b)   [train order!]
- 'wordpiece'     : rank-ordered vocab in piece      [greedy order]
- 'unigram'       : piece + li (exact int64 micro-log likelihood)

Why parquet-via-Spark instead of a driver-side JSON file: at cluster
scale the artifact must live on shared storage (HDFS/S3/ABFS…), and
`spark.write` speaks every Hadoop filesystem the session does; a
driver `open()` would pin the artifact to one machine's disk. The
write is a single tiny task; the read is a vocab-bounded collect
(the same class as the trainers' own merge-table collects).

Order is load-bearing: BPE merges replay IN TRAINING ORDER and
WordPiece encodes greedily against vocab order, so `rank` is an
explicit column and load sorts by it — never rely on file/row order,
which parquet does not guarantee across writers.
"""

from __future__ import annotations

import numbers

from pyspark.sql import SparkSession

#: families and the columns they populate
_FAMILIES = {
    "bpe": ("a", "b"),
    "bbpe": ("a", "b"),
    "wordpiece": ("piece",),
    "unigram": ("piece", "li"),
}

_SCHEMA = (
    "family string, rank bigint, a string, b string, "
    "piece string, li bigint"
)


def save_tokenizer(
    spark: SparkSession, path: str, family: str, model
) -> None:
    """Persist a trained tokenizer. `model` is exactly what the
    family's trainer returned: [(a, b)] merges for 'bpe'/'bbpe',
    [piece] for 'wordpiece', [(piece, li)] for 'unigram'. Raises on
    unknown family or empty/misshapen payloads — a silent empty
    artifact would make every later encode a no-op."""
    if family not in _FAMILIES:
        raise ValueError(
            f"save_tokenizer: unknown family {family!r} — one of "
            f"{sorted(_FAMILIES)}"
        )
    if not model:
        raise ValueError(
            f"save_tokenizer: empty {family} payload — refusing to "
            "write an artifact that would no-op every encode"
        )
    rows = []
    for rank, item in enumerate(model):
        # shape guards: a wrong-family payload (e.g. merge TUPLES
        # passed as a 'wordpiece' vocab) would otherwise stringify
        # silently — "('l', 'o')" becomes a vocab piece and every
        # later encode is quietly wrong
        if family in ("bpe", "bbpe"):
            if (
                not isinstance(item, (tuple, list))
                or len(item) != 2
                or not all(isinstance(x, str) for x in item)
            ):
                raise ValueError(
                    f"save_tokenizer: {family} expects (str, str) "
                    f"merge pairs; rank {rank} is {item!r}"
                )
            a, b = item
            rows.append((family, rank, a, b, None, None))
        elif family == "wordpiece":
            if not isinstance(item, str):
                raise ValueError(
                    "save_tokenizer: wordpiece expects a list of str "
                    f"pieces; rank {rank} is {item!r}"
                )
            rows.append((family, rank, None, None, item, None))
        else:  # unigram
            # numbers.Integral (minus bool) rather than int: a caller
            # handing back numpy scalars (np.int64 from a vectorized
            # trainer) has a valid payload and should not be rejected
            if (
                not isinstance(item, (tuple, list))
                or len(item) != 2
                or not isinstance(item[0], str)
                or isinstance(item[1], bool)
                or not isinstance(item[1], numbers.Integral)
            ):
                raise ValueError(
                    "save_tokenizer: unigram expects (str piece, int "
                    f"li) rows; rank {rank} is {item!r}"
                )
            piece, li = item
            rows.append((family, rank, None, None, piece, int(li)))
    # one partition: the artifact is vocab-sized by construction and
    # must read back as one coherent ordered list, not a shard set.
    # repartition(1), NOT coalesce(1): coalescing a parallelized
    # collection measured 4.1-4.3 s/write against repartition's
    # 0.4-0.7 s (the single coalesced task drags all 32 empty parent
    # slices through the local-collection scan; the 1-row-per-merge
    # shuffle is trivial)
    spark.createDataFrame(rows, _SCHEMA).repartition(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_tokenizer(spark: SparkSession, path: str):
    """Read an artifact back as (family, model) with `model`
    bit-identical to what the trainer returned (order restored from
    the explicit rank column). Raises on empty, mixed-family, or
    gap-ranked artifacts — each of those means a corrupted or
    hand-edited file, and encoding with it would be silently wrong."""
    rows = (
        spark.read.parquet(path)
        .select("family", "rank", "a", "b", "piece", "li")
        .collect()
    )
    if not rows:
        raise ValueError(f"load_tokenizer: {path} holds no rows")
    fams = {r.family for r in rows}
    if len(fams) != 1 or None in fams:
        raise ValueError(
            f"load_tokenizer: {path} mixes families {sorted(map(str, fams))}"
        )
    family = rows[0].family
    if family not in _FAMILIES:
        raise ValueError(
            f"load_tokenizer: {path} names unknown family {family!r}"
        )
    rows.sort(key=lambda r: r.rank)
    if [r.rank for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"load_tokenizer: {path} has duplicate or missing ranks — "
            "the artifact is corrupt (order is load-bearing for merge "
            "replay and greedy matching)"
        )
    if family in ("bpe", "bbpe"):
        bad = [r.rank for r in rows if r.a is None or r.b is None]
        if bad:
            raise ValueError(
                f"load_tokenizer: {family} artifact has NULL merge "
                f"halves at ranks {bad[:5]}"
            )
        return family, [(r.a, r.b) for r in rows]
    if family == "wordpiece":
        bad = [r.rank for r in rows if r.piece is None]
        if bad:
            raise ValueError(
                f"load_tokenizer: wordpiece artifact has NULL pieces "
                f"at ranks {bad[:5]}"
            )
        return family, [r.piece for r in rows]
    bad = [r.rank for r in rows if r.piece is None or r.li is None]
    if bad:
        raise ValueError(
            f"load_tokenizer: unigram artifact has NULL piece/li at "
            f"ranks {bad[:5]}"
        )
    return family, [(r.piece, r.li) for r in rows]
