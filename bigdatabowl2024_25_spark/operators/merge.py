"""MERGE / CDC / SCD2 — table-maintenance operators.

The reference maintains its derived tables by full rewrite (R scripts
re-run `dbWriteTable(..., overwrite=TRUE)`; e.g. the openness frame is
rebuilt from scratch in `Openness_Data_Frame_Prep.R`). At 100 TB a full
rewrite per update is untenable; the standard lakehouse answer is a
keyed MERGE (upsert/delete) applied to the current snapshot, with CDC
batches compacted to latest-per-key first. These operators provide that
layer Spark-first:

- ``merge_into``: ANSI/Delta-style MERGE semantics as one full-outer
  join + conditional projection — WHEN MATCHED [AND cond] THEN
  UPDATE/DELETE, WHEN NOT MATCHED [AND cond] THEN INSERT, else keep.
- ``latest_changes``: collapse a CDC batch to one latest row per key
  (skew-safe ``max_by``-style aggregate — no window, map-side combine
  absorbs hot keys, mirroring ``dedup.paragraph_dedup``'s winner
  pattern).
- ``scd2_build``: slowly-changing-dimension type-2 history from a
  change log (compress no-op changes, effective_from/effective_to via
  one window, is_current flag).

Scale: ``merge_into`` costs one shuffle per side on the merge key (or
zero for the target when the source broadcasts); updates/deletes/
inserts are all projections inside that join — no second pass, no
window over the target. The ANSI cardinality check (a source key
matching the same target row twice must error, not silently duplicate)
rides the source's own keyed exchange, so it adds no extra shuffle.
The output is the merged snapshot as a DataFrame; pair it with
``sources.io.write_table`` (partitioned/bucketed) for copy-on-write
persistence — at cluster scale you'd overwrite only the partitions the
join touched (dynamic partition overwrite), which this plan enables by
keeping the target's partition column in the output untouched.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_T_PRESENT = "__t_present"
_S_PRESENT = "__s_present"
_S_DUP = "__s_dup"


def _as_col(expr: Column | str) -> Column:
    return F.expr(expr) if isinstance(expr, str) else expr


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    update_set: dict[str, Column | str] | None = None,
    update_condition: Column | str | None = None,
    delete_condition: Column | str | None = None,
    insert_values: dict[str, Column | str] | None = None,
    insert_condition: Column | str | None = None,
    broadcast_source: bool = False,
    assert_unique_source: bool = True,
    null_safe_keys: bool = False,
) -> DataFrame:
    """MERGE INTO target USING source ON key — as a single join plan.

    Clause semantics follow ANSI/Delta MERGE:

    - matched and ``delete_condition`` → row removed;
    - matched and ``update_condition`` (default: always) →
      ``update_set`` columns replace the target's (refer to sides as
      ``t.col`` / ``s.col`` in string expressions);
    - matched otherwise → target row kept unchanged;
    - source-only and ``insert_condition`` (default: always) →
      ``insert_values`` row inserted (unlisted columns become NULL);
    - source-only without ``insert_values`` → dropped (update-only
      merge);
    - target-only → kept unchanged.

    ``delete_condition`` is evaluated before ``update_condition``,
    matching Delta's first-matching-clause rule for
    ``whenMatchedDelete().whenMatchedUpdate(...)``.

    NULL handling (ANSI/Delta, round 10):

    - **Keys** compare with plain equality by default — a NULL merge
      key never matches, so a NULL-keyed source row is NOT MATCHED
      (inserted if an insert clause applies) and a NULL-keyed target
      row is target-only (kept). ``null_safe_keys=True`` opts into
      ``<=>`` matching for pipelines that use NULL as a real key
      value; Delta users porting a MERGE should leave it off.
    - **Clause conditions** that evaluate to SQL NULL do not apply
      (same as ANSI WHEN ... AND cond): a NULL ``delete_condition``
      never deletes, a NULL ``update_condition`` leaves the row
      unchanged, a NULL ``insert_condition`` suppresses the insert.
      Internally every condition is coalesced to FALSE before use so
      NULL can't propagate through the keep-filter and silently drop
      rows.

    With ``assert_unique_source`` (default), a source key that matches
    the same target row more than once raises at execution time (the
    ANSI "cardinality violation" — silently picking one update would
    corrupt the table). The multiplicity count is a window over the
    source keyed exactly like the join, so Catalyst reuses the same
    exchange; it costs a sort within the already-shuffled source
    partitions, nothing more.

    Output schema is exactly ``target``'s columns, in order.
    """
    out_cols = list(target.columns)
    for k in on:
        if k not in out_cols:
            raise ValueError(f"merge key {k!r} not in target columns")
        if k not in source.columns:
            raise ValueError(f"merge key {k!r} not in source columns")

    t = target.withColumn(_T_PRESENT, F.lit(1)).alias("t")
    s = source.withColumn(_S_PRESENT, F.lit(1))
    if assert_unique_source:
        s = s.withColumn(
            _S_DUP, F.count("*").over(Window.partitionBy(*on))
        )
    else:
        s = s.withColumn(_S_DUP, F.lit(1))
    s = s.alias("s")
    if broadcast_source:
        s = F.broadcast(s)

    def _key_eq(k: str) -> Column:
        if null_safe_keys:
            return F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        return F.col(f"t.{k}") == F.col(f"s.{k}")

    cond = reduce(lambda a, b: a & b, [_key_eq(k) for k in on])
    j = t.join(s, cond, "full_outer")

    matched = F.col(f"t.{_T_PRESENT}").isNotNull() & F.col(
        f"s.{_S_PRESENT}"
    ).isNotNull()
    if assert_unique_source:
        # Cardinality guard: a duplicated source key either updates the
        # same target row twice (ANSI violation) or double-inserts a
        # new key — both corrupt the table, both error here. A plain
        # filter evaluates the when() on every row, so the raise is
        # not at the mercy of boolean short-circuit order.
        dup = F.col(f"s.{_S_PRESENT}").isNotNull() & (
            F.col(f"s.{_S_DUP}") > 1
        )
        if not null_safe_keys:
            # A NULL key can never match a target row under plain
            # equality, so duplicated NULL-key source rows are plain
            # multi-inserts (legal in ANSI MERGE), not a cardinality
            # violation.
            dup = dup & reduce(
                lambda a, b: a & b,
                [F.col(f"s.{k}").isNotNull() for k in on],
            )
        j = j.filter(
            F.when(
                dup,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "merge_into: source has multiple rows "
                            "for merge key "
                        ),
                        F.concat_ws(
                            ",",
                            *[F.col(f"s.{k}").cast("string") for k in on],
                        ),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )

    source_only = F.col(f"t.{_T_PRESENT}").isNull()
    # NULL clause conditions must mean "clause does not apply", never
    # "delete"/"drop" — coalesce to FALSE so NULL can't propagate
    # through `keep = ~(...)` below and silently remove rows.
    def _cond(expr: Column | str | None, default: bool) -> Column:
        if expr is None:
            return F.lit(default)
        return F.coalesce(_as_col(expr), F.lit(False))

    del_c = _cond(delete_condition, False)
    upd_c = _cond(update_condition, True)
    ins_c = _cond(insert_condition, True)

    keep = ~(matched & del_c) & ~(
        source_only & (
            F.lit(insert_values is None) | ~ins_c
        )
    )
    j = j.filter(keep)

    upd = {c: _as_col(e) for c, e in (update_set or {}).items()}
    ins = {c: _as_col(e) for c, e in (insert_values or {}).items()}
    for c in list(upd) + list(ins):
        if c not in out_cols:
            raise ValueError(f"merge assigns unknown column {c!r}")

    proj = []
    for c in out_cols:
        dtype = target.schema[c].dataType
        tcol = F.col(f"t.{c}")
        col = tcol
        if c in upd:
            col = F.when(matched & upd_c, upd[c].cast(dtype)).otherwise(tcol)
        icol = ins.get(c, F.lit(None))
        col = F.when(source_only, icol.cast(dtype)).otherwise(col)
        proj.append(col.alias(c))
    return j.select(*proj)


def latest_changes(
    changes: DataFrame, key: list[str], seq_col: str
) -> DataFrame:
    """Collapse a CDC batch to its latest row per key (highest
    ``seq_col``; ties broken by the full row struct for determinism).

    Skew-safe: winners come from ``groupBy(key).agg(max(struct(...)))``
    — partial aggregation combines map-side, so a hot key (one entity
    updated millions of times in a batch) never concentrates its rows
    in a single task the way a ``row_number`` window would. Same
    pattern as ``dedup.paragraph_dedup``'s winner selection.
    """
    rest = [c for c in changes.columns if c not in key]
    if seq_col not in rest:
        raise ValueError(f"seq_col {seq_col!r} must be a non-key column")
    # a CDC row with no sequence cannot be ordered against its peers —
    # under max(struct) it would silently always lose (NULL sorts
    # low), hiding a data defect; error per row instead (round 10)
    changes = changes.filter(
        F.when(
            F.col(seq_col).isNull(),
            F.raise_error(
                F.lit(
                    f"latest_changes: NULL {seq_col!r} — every CDC row "
                    "needs a sequence to order by"
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    ordered = [seq_col] + [c for c in rest if c != seq_col]
    win = (
        changes.groupBy(*key)
        .agg(F.max(F.struct(*ordered)).alias("__w"))
    )
    return win.select(
        *key, *[F.col(f"__w.{c}").alias(c) for c in rest]
    )


def scd2_build(
    changes: DataFrame,
    key: list[str],
    seq_col: str,
    attr_cols: list[str],
    *,
    compress: bool = True,
    from_col: str = "eff_from",
    to_col: str = "eff_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 slowly-changing dimension from a change log.

    Each input row is an observation ``(key, seq, attrs…)``. Output is
    one row per attribute *version*: ``eff_from`` = the seq where the
    version began, ``eff_to`` = the seq where the next version begins
    (NULL while current), ``is_current`` on the open row. With
    ``compress`` (default), consecutive observations with identical
    attrs collapse into one version — re-stating the same value does
    not close and reopen a row.

    Scale: one shuffle (window partitioned by key, ordered by seq);
    both the compress LAG and the close-out LEAD share that single
    sort. Per-key history is small by construction (versions, not
    events), so no skew concern; the heavy change log should be
    compacted with ``latest_changes`` per batch *before* appending to
    the log this reads.
    """
    w = Window.partitionBy(*key).orderBy(seq_col)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    df = changes.select(*key, seq_col, *attr_cols)
    # a NULL seq would sort FIRST under the version window and shift
    # every effective range after it — error per row (round 10, the
    # latest_changes rule)
    df = df.filter(
        F.when(
            F.col(seq_col).isNull(),
            F.raise_error(
                F.lit(
                    f"scd2_build: NULL {seq_col!r} — every observation "
                    "needs a sequence to order by"
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    if compress:
        df = (
            df.withColumn("__prev", F.lag(attrs).over(w))
            .filter(~attrs.eqNullSafe(F.col("__prev")))
            .drop("__prev")
        )
    # post-filter row_numbers change, so LEAD needs a fresh window pass
    # — same partitioning+ordering, so it reuses the same exchange+sort.
    return (
        df.withColumn(to_col, F.lead(seq_col).over(w))
        .withColumn(current_col, F.col(to_col).isNull())
        .withColumnRenamed(seq_col, from_col)
        .select(*key, *attr_cols, from_col, to_col, current_col)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC feed generation — the inverse of `merge_into`: diff two
    snapshots of the same keyed table into the change set that turns
    ``old`` into ``new``. Returns (op, keys, new-value columns), with
    op ∈ insert/update/delete (value columns NULL on delete);
    unchanged rows are dropped. ``compare_cols`` defaults to every
    non-key column shared by both snapshots; comparison is null-safe
    field-wise (a NULL→value flip IS an update).

    KEYS match null-safely here (a NULL-keyed row in both snapshots
    is the same row), unlike ``merge_into``'s ANSI default — so when
    a snapshot can carry NULL keys, apply the feed with
    ``merge_into(..., null_safe_keys=True)`` or the 'update' op for
    the NULL-key row turns into a duplicate insert and the roundtrip
    invariant ``merge(old, diff(old, new)) == new`` breaks
    (test-pinned both ways).

    Scale: one full-outer join on the key (the same bill as the MERGE
    that will consume the feed — bucket both snapshots by key and
    neither moves); change detection is a struct eqNullSafe
    projection. This is how a snapshot-only upstream becomes an
    incremental source: diff yesterday/today once, then drive
    `merge_into` (or a downstream stream) with the delta instead of
    reprocessing the full table.
    """
    shared = [c for c in new.columns if c in old.columns and c not in key]
    cols = compare_cols if compare_cols is not None else shared
    for c in cols:
        if c not in shared:
            raise ValueError(f"compare column {c!r} not in both snapshots")
    o = old.withColumn(_T_PRESENT, F.lit(1)).alias("o")
    n = new.withColumn(_S_PRESENT, F.lit(1)).alias("n")
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key],
    )
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"o.{_T_PRESENT}").isNotNull()
    in_new = F.col(f"n.{_S_PRESENT}").isNotNull()
    changed = ~F.struct(*[F.col(f"o.{c}") for c in cols]).eqNullSafe(
        F.struct(*[F.col(f"n.{c}") for c in cols])
    )
    op = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            *[
                F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
                for k in key
            ],
            *[F.col(f"n.{c}").alias(c) for c in cols],
        )
    )
