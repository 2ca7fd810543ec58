"""Structured Streaming slice (SURVEY.md §2.10).

The reference is pure batch; its closest streaming analogues are the
per-play event-time window filter (W12) and the 1-second `secondId`
bucketing (`BuildingReadOrder.R:32-36`) — a tumbling window. This
module replays the frame/event stream through readStream so those two
patterns run as real streaming queries with watermarked state.

Batch-first design pays off here: the same event-time column feeds
both paths, so streaming is additive, not a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_from_dir(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """File-replay source: one-file-per-trigger parquet stream — the
    standard backfill/replay pattern (at scale: a Kafka source with the
    same downstream query)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    width: str = "10 seconds",
    watermark: str | None = "30 seconds",
    sum_cast: str | None = None,
) -> DataFrame:
    """Tumbling event-time window counts — the secondId bucketing
    (1 s of frames) as a streaming aggregate.

    `watermark` bounds state for append-mode production runs (late
    rows beyond it are dropped — that IS the late-data policy); pass
    None for complete-mode replays where the full history must equal
    the batch aggregate exactly.

    `sum_cast` (e.g. ``"decimal(25,6)"``) makes the value sum
    order-independent — double sums depend on micro-batch arrival
    order, so hash-compared replays (q93) need the exact decimal
    reduction; throughput-only pipelines can leave it None."""
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    val = F.col("value")
    total = (
        F.sum(val.cast(sum_cast)).cast("double") if sum_cast else F.sum(val)
    )
    return stream.groupBy(F.window(F.col(ts_col), width), F.col(key)).agg(
        F.count("*").alias("n_events"),
        total.alias("sum_value"),
    )


def session_slices(
    stream: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 seconds",
    watermark: str | None = "1 minute",
    sum_cast: str | None = None,
) -> DataFrame:
    """Session windows — the line_set→ball_snap per-play slice (W12) as
    a gap-based session aggregate: events within `gap` of the session's
    end extend it; a quiet period longer than `gap` starts a new one.

    `watermark`/`sum_cast` follow `tumbling_counts`: watermark bounds
    state (and enables append mode) for production; None keeps every
    session in state for complete-mode replays that must equal the
    batch sessionization exactly (q93's 'session' branch). sum_cast
    makes the value sum independent of micro-batch arrival order."""
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    val = F.col("value")
    total = (
        F.sum(val.cast(sum_cast)).cast("double") if sum_cast else F.sum(val)
    )
    return stream.groupBy(
        F.session_window(F.col(ts_col), gap), F.col(key)
    ).agg(
        F.count("*").alias("n_events"),
        total.alias("sum_value"),
    )


def stateful_running_totals(
    stream: DataFrame,
    key: str = "user_id",
    val: str = "value",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key
    running (count, sum) maintained in explicit group state across
    micro-batches — the streaming analogue of the per-play cumulative
    tracking in `BuildingReadOrder.R:88-94` (W2), where the running
    total must survive across frame batches.

    Emits the updated running totals for every key touched by a batch
    (update semantics). The final emission per key equals the batch
    aggregate regardless of how rows were split into micro-batches —
    count and sum are order-free — which is what the pytest pins.

    Scale: state is per-key scalars (16 bytes), hash-partitioned by
    key in the state store; throughput is Arrow-batched pandas, and
    state never grows with event volume — only with key cardinality.
    """
    import pandas as pd  # local import: worker-side dependency
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key} long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key_tuple, pdfs, state):
        n, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            tot += float(pdf[val].sum())
        state.update((n, tot))
        yield pd.DataFrame(
            {key: [key_tuple[0]], "n_events": [n], "total_value": [tot]}
        )

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    lookback: str = "24 hours",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with an event-time range: each left row
    matches right rows of the same key whose timestamp falls in
    ``[left.ts − lookback, left.ts]`` — the classic streaming
    attribution join (click ⋈ preceding views), and the streaming
    analogue of the batch as-of/range joins (`operators/asof.py`,
    `operators/range_join.py`).

    `watermark` (applied to BOTH sides) plus the range condition is
    what lets Spark evict join state: a right row can be dropped once
    the left watermark passes `r_ts + lookback`. Pass None for
    full-history replays that must equal the batch join exactly (q93's
    'join' branch — inner joins without watermark are legal, state
    just never ages out). Inner-join emission is append-mode and
    match-driven, so after a full drain the result set equals the
    batch join REGARDLESS of micro-batch arrival order — matching is
    set-like, not order-dependent.

    Scale: state is hash-partitioned by the join key in the state
    store and bounded by `watermark + lookback` of per-key history;
    the output never buffers (append)."""
    def prefixed(df: DataFrame, p: str) -> DataFrame:
        rest = [c for c in df.columns if c not in (key, ts_col)]
        names = [f"{p}_key", f"{p}_ts"] + [f"{p}_{c}" for c in rest]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:  # e.g. a payload column literally named "key" or "ts"
            raise ValueError(
                f"stream_stream_join: prefixed output names collide "
                f"({sorted(dupes)}); rename the input columns"
            )
        return df.select(
            F.col(key).alias(f"{p}_key"),
            F.col(ts_col).alias(f"{p}_ts"),
            *[F.col(c).alias(f"{p}_{c}") for c in rest],
        )

    l = prefixed(left, "l")
    r = prefixed(right, "r")
    if watermark is not None:
        l = l.withWatermark("l_ts", watermark)
        r = r.withWatermark("r_ts", watermark)
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("r_ts") <= F.col("l_ts")),
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming deduplication: drop re-deliveries of the same logical
    event ACROSS micro-batches (at-least-once source → exactly-once
    downstream — the ingestion-side complement of the batch dedup
    family in `operators/dedup.py`). Emission is append-mode: the first
    arrival of a key passes through immediately; later arrivals —
    whichever batch they land in — are swallowed by the key's state
    entry.

    With `watermark` (requires `ts_col`), uses
    `dropDuplicatesWithinWatermark`: a key's state is evicted once the
    watermark passes its last-seen event time, so state is bounded by
    (watermark window × arrival rate) — the production configuration,
    where duplicates are assumed to arrive within the lateness bound
    (true for source retries/replays, the case this exists for).
    Without it, plain `dropDuplicates` state never ages out: correct
    for bounded replays and backfills that must equal batch DISTINCT
    exactly (q93's 'dedup' branch), unbounded for continuous streams.

    Caveat (pinned by test_dedup_stream_cross_batch): under a
    watermark, rows older than the advanced watermark are dropped as
    LATE — correct for live streams, lossy for historical replays
    whose micro-batches are not time-ordered. Replays/backfills should
    use the unwatermarked variant or a watermark wider than the
    replayed span.

    Scale: state is hash-partitioned by key in the state store; the
    dedup itself is one shuffle on the key columns."""
    if watermark is not None:
        if ts_col is None:
            raise ValueError("dedup_stream: watermark requires ts_col")
        return stream.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)


def incremental_to_parquet(
    stream: DataFrame, out_path: str, checkpoint: str
) -> None:
    """Checkpointed incremental ingest: drain whatever is NEW in the
    source since the last run into a parquet sink, exactly once.

    This is the streaming property a 100 TB training-data pipeline
    actually runs on: the file source is replayable, the checkpoint
    records which source files each micro-batch consumed (WAL), and
    the parquet sink commits per-batch via the metadata log — so a
    re-run after a crash (or a cron re-invocation) processes ONLY
    files that arrived since the last successful batch, and a batch
    that died mid-write is invisible to readers. Re-running with no
    new input is a no-op; appending a file and re-running appends
    exactly its rows (pinned in test_multimodal_streaming).

    The reference's closest analogue is re-running
    `DatabaseCreation.R`'s whole-directory append loop from scratch;
    here incrementality is free because source progress lives in the
    checkpoint, not in the data."""
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(
    query_df: DataFrame, name: str, mode: str = "append"
) -> None:
    """Execute a streaming query to completion over the replayed files
    (availableNow) into an in-memory sink for verification."""
    q = (
        query_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _require_event_times(ev, ts_col):
    """Loud NULL-event-time guard shared by the order-sensitive
    stateful ops: a NULL timestamp cannot be placed in per-key order,
    and letting it reach int() raises a cryptic mid-executor numpy
    error instead of an actionable one."""
    if ev[ts_col].isna().any():
        raise ValueError(
            f"streaming op: NULL event time in '{ts_col}' — "
            "order-sensitive state cannot place unordered rows; "
            "filter or repair timestamps upstream"
        )


def _reorder_step(buf, max_seen, incoming, delay_us):
    """Per-key watermark reorder buffer — the upstream stage the
    order-sensitive stateful ops (funnel / anomaly / CUSUM) document:
    hold rows until the key's watermark (max event time seen −
    `delay_us`) passes them, then release in EVENT-TIME order, so
    greedy per-row state sees the same order the batch operator's
    sort produces as long as disorder stays within the delay.

    `buf`: pending [(ts, payload)] from state; `incoming`: this
    batch's [(ts, payload)]; `max_seen`: largest event time ever seen
    for the key (−1 = none yet; event times must be nonnegative).
    Returns (released_sorted, new_buf, new_max_seen, n_late).

    Rows at or before the PREVIOUS watermark are late-beyond-delay
    and dropped (counted in n_late): processing already advanced past
    their slot, and un-taking greedy state is exactly what this stage
    exists to avoid — the same bargain Spark's own watermarked
    aggregations make. Ties on ts release in payload order (None
    first) so arrival order can never leak into results.

    The watermark is PER KEY because applyInPandasWithState sees one
    key's state at a time; a global watermark would need a
    cross-partition aggregate per batch. Per-key is the stricter,
    deterministic choice: a key's own events gate its releases, so a
    quiet key never has rows forced out by a chatty one.

    FLUSH REQUIREMENT (round-12 ADVICE — the per-key trade's other
    face): only a key's OWN later events advance its watermark, so
    when a key's stream goes quiet its final `delay_us` of rows sit
    in the buffer indefinitely — event time alone can never prove
    "nothing more is coming". To drain a key, send it one
    watermark-advancing event (ts ≥ last ts + delay_us; the suite's
    replay fixtures append exactly such a flush row per key, and any
    real pipeline's end-of-stream/heartbeat record does the same). A
    processing-time fallback (GroupStateTimeout releasing the tail
    after wall-clock silence) is deliberately NOT implemented: it
    would make results depend on arrival timing, forfeiting the
    bit-identical-to-batch guarantee these twins exist for."""
    import math

    wm_prev = max_seen - delay_us
    n_late = 0
    for ts, pl in incoming:
        # loud guards, not cryptic downstream failures: a NULL/NaN
        # event time cannot be ordered at all, and a NEGATIVE one
        # would sit below the max_seen = −1 "none yet" sentinel — the
        # watermark would never advance and the key's rows would
        # buffer forever without emitting (a silent blackhole)
        if ts is None or (isinstance(ts, float) and math.isnan(ts)):
            raise ValueError(
                "reorder buffer: NULL event time — an unordered row "
                "cannot be placed; filter or repair timestamps "
                "upstream"
            )
        ts = int(ts)
        if ts < 0:
            raise ValueError(
                f"reorder buffer: negative event time {ts} — event "
                "times must be nonnegative epoch micros (the per-key "
                "watermark sentinel reserves negatives)"
            )
        if max_seen >= 0 and ts <= wm_prev:
            n_late += 1
            continue
        buf.append((ts, pl))
        if ts > max_seen:
            max_seen = ts
    if max_seen < 0:
        return [], buf, max_seen, n_late
    wm = max_seen - delay_us

    def _key(r):
        import math

        pl = r[1]
        if pl is None or (isinstance(pl, float) and math.isnan(pl)):
            return (r[0], 0, 0)  # NULL/NaN payloads first on ts ties
        return (r[0], 1, pl)

    buf.sort(key=_key)
    cut = 0
    while cut < len(buf) and buf[cut][0] <= wm:
        cut += 1
    return buf[:cut], buf[cut:], max_seen, n_late


def streaming_funnel(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    reorder_delay_us: int | None = None,
) -> DataFrame:
    """Streaming ordered funnel — the stateful twin of
    `operators.funnel.funnel_steps`: per-user state is the timestamp
    of each completed step (−1 = not reached); each micro-batch's
    events advance the furthest step greedily in timestamp order.
    Under in-order ingest (event time monotone per user across
    batches — the replay source's file order, or a Kafka topic keyed
    by user) the final emission per user equals the batch operator
    exactly, which is what the pytest pins. Greedy state CANNOT
    un-take a step (same trade ClickHouse's windowFunnel makes), so
    for out-of-order delivery pass `reorder_delay_us`: a per-key
    watermark reorder buffer (`_reorder_step`) holds rows until the
    key's max event time is `reorder_delay_us` past them, then feeds
    them to the greedy state in event-time order — equal to the batch
    operator whenever disorder stays within the delay; rows later
    than that are dropped (the standard watermark bargain). Buffered
    state adds ≤ (delay × per-key rate) rows per key. NOTE the flush
    requirement that comes with the buffer (see `_reorder_step`): a
    key's final `reorder_delay_us` of rows are withheld until one of
    its OWN later events advances its watermark — a quiet key needs a
    watermark-advancing flush/heartbeat row to drain.

    State: len(steps) int64s per user — fixed-width, key-cardinality
    bound, hash-partitioned in the state store (+ the reorder buffer
    fields when enabled). Emission: one row per user per touching
    batch (update semantics) with t0..tN + reached.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    n = len(steps)
    out_schema = (
        f"{user_col} long, "
        + ", ".join(f"t{i} long" for i in range(n))
        + ", reached int"
    )
    state_schema = ", ".join(f"t{i} long" for i in range(n))
    if reorder_delay_us is not None:
        state_schema += (
            ", buf_ts array<bigint>, buf_ty array<string>, max_seen long"
        )

    def update(key_tuple, pdfs, state):
        if reorder_delay_us is None:
            ts = list(state.get) if state.exists else [-1] * n
            buf, max_seen = [], -1
        elif state.exists:
            *core, b_ts, b_ty, max_seen = state.get
            ts = list(core)
            buf = list(zip(b_ts, b_ty))
        else:
            ts, buf, max_seen = [-1] * n, [], -1
        rows = []
        for pdf in pdfs:
            rows.append(pdf[[ts_col, type_col]])
        ev = pd.concat(rows).sort_values(ts_col)
        _require_event_times(ev, ts_col)
        pairs = zip(ev[ts_col], ev[type_col])
        if reorder_delay_us is not None:
            released, buf, max_seen, _late = _reorder_step(
                buf, max_seen, pairs, reorder_delay_us
            )
            pairs = released
        for t, ty in pairs:
            t = int(t)
            if ty == steps[0] and ts[0] < 0:
                ts[0] = t
                continue
            for k in range(1, n):
                if (
                    ty == steps[k]
                    and ts[k] < 0
                    and ts[k - 1] >= 0
                    and t > ts[k - 1]
                ):
                    ts[k] = t
                    break
        if reorder_delay_us is None:
            state.update(tuple(ts))
        else:
            state.update(
                (
                    *ts,
                    [t for t, _ in buf],
                    [ty for _, ty in buf],
                    max_seen,
                )
            )
        # count the contiguous reached prefix (a step can't be taken
        # without its predecessor by construction, but be explicit)
        reached = 0
        for v in ts:
            if v < 0:
                break
            reached += 1
        out = {user_col: [key_tuple[0]]}
        for i in range(n):
            out[f"t{i}"] = [ts[i] if ts[i] >= 0 else None]
        out["reached"] = [reached]
        yield pd.DataFrame(out)

    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_anomaly(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_us",
    val: str = "value",
    n: int = 5,
    t_num: int = 2,
    t_den: int = 1,
    scale: int = 1_000_000,
    reorder_delay_us: int | None = None,
) -> DataFrame:
    """Streaming rolling-window anomaly detection — the stateful twin
    of `operators.windows.rolling_anomaly`, same integer-exact rule:
    a row is anomalous when c == n and
        (q·c − S)²·t_den² > t_num²·c·(c·SS − S²)
    over the trailing n rows' micro-units q = floor(value·scale)
    (Python ints are exact like the batch decimal(38,0) path, so under
    in-order ingest per key the flags equal the batch operator
    bit-for-bit — the streaming_funnel twin discipline; for
    out-of-order delivery pass `reorder_delay_us` to enable the
    per-key watermark reorder buffer (`_reorder_step`): rows are held
    until the watermark passes and processed in event-time order, so
    flags match the batch operator whenever disorder stays within the
    delay; later-than-delay rows are dropped, never mis-flagged. A
    buffered row's (key, ts, value, is_anomaly) row emits in the
    batch that RELEASES it, not the one that received it — and a
    quiet key's final `reorder_delay_us` of rows stay buffered until
    a watermark-advancing flush/heartbeat event for THAT key arrives;
    see `_reorder_step`'s flush-requirement note).

    State: the last n (q or NULL) per key — fixed width, key-bounded,
    encoded alongside a presence mask so a NULL value occupies its
    window POSITION without entering the stats (exactly the batch
    count(q) < n semantics). Emits one row per input row:
    (key, ts, value, is_anomaly). The batch overflow guard carries
    over: |q| beyond the decimal-safe bound raises rather than
    silently reporting 'not anomalous'."""
    import pandas as pd
    from math import isqrt

    from pyspark.sql.streaming.state import GroupStateTimeout

    worst = max(4 * n * n * t_den * t_den, t_num * t_num * n * n * n)
    q_bound = isqrt((10**38 - 1) // worst)

    out_schema = f"{key} long, {ts_col} long, {val} double, is_anomaly boolean"
    # q values of the trailing n rows; NULL-value rows hold slot
    # value 0 with mask 0 (absent-from-stats but present-in-window)
    state_schema = "qs array<bigint>, mask array<int>"
    if reorder_delay_us is not None:
        state_schema += (
            ", buf_ts array<bigint>, buf_v array<double>, max_seen long"
        )

    def update(key_tuple, pdfs, state):
        import math

        buf, max_seen = [], -1
        if state.exists:
            got = state.get
            qs, mask = list(got[0]), list(got[1])
            if reorder_delay_us is not None:
                buf = list(zip(got[2], got[3]))
                max_seen = got[4]
        else:
            qs, mask = [], []
        ev = pd.concat(list(pdfs)).sort_values(
            ts_col, kind="stable"
        )
        _require_event_times(ev, ts_col)
        pairs = zip(ev[ts_col], ev[val])
        if reorder_delay_us is not None:
            released, buf, max_seen, _late = _reorder_step(
                buf, max_seen, pairs, reorder_delay_us
            )
            pairs = released
        out_ts, out_v, out_flag = [], [], []
        for ts, v in pairs:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                q, present = None, 0
            else:
                q = math.floor(float(v) * float(scale))
                if abs(q) > q_bound:
                    raise ValueError(
                        f"streaming_anomaly: |value*scale| exceeds the "
                        f"overflow-safe bound {q_bound} (value {v}, "
                        f"scale {scale}); lower scale or pre-clip"
                    )
                present = 1
            live = [x for x, m in zip(qs, mask) if m]
            c = len(live)
            flag = False
            if q is not None and len(qs) >= n and c == n:
                s, ss = sum(live), sum(x * x for x in live)
                lhs = q * c - s
                flag = (
                    lhs * lhs * t_den * t_den
                    > t_num * t_num * c * (c * ss - s * s)
                )
            out_ts.append(int(ts))
            out_v.append(None if q is None else float(v))
            out_flag.append(bool(flag))
            qs.append(q if q is not None else 0)
            mask.append(present)
            if len(qs) > n:
                qs, mask = qs[-n:], mask[-n:]
        if reorder_delay_us is None:
            state.update((qs, mask))
        else:
            state.update(
                (
                    qs,
                    mask,
                    [t for t, _ in buf],
                    [x for _, x in buf],
                    max_seen,
                )
            )
        yield pd.DataFrame(
            {
                key: [key_tuple[0]] * len(out_ts),
                ts_col: out_ts,
                val: out_v,
                "is_anomaly": out_flag,
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cusum(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_us",
    val: str = "value",
    k_scaled: int = 0,
    h_scaled: int = 0,
    scale: int = 1_000_000,
    reorder_delay_us: int | None = None,
) -> DataFrame:
    """Streaming CUSUM drift detection — the stateful twin of
    `operators.windows.cusum_flags`. Where the batch operator uses the
    prefix-sum − running-extrema identity over a sorted window, the
    stream needs only THREE int64s of state per key: the running
    prefix sum P and its extrema folded with the empty prefix,
        minP = min(0, min_j P_j),   maxP = max(0, max_j P_j),
    giving flag 'up' when P − minP > h, 'down' when maxP − P > h —
    bit-identical to the batch flags under in-order ingest (python
    ints are exact like the batch decimal path). NULL values pause
    the series (zero deviation, NULL flag) exactly like the batch
    coalesce. State never grows with event volume; P would need
    ~10¹⁰ max-deviation rows to leave int64 — far past any key's
    plausible series. For out-of-order delivery pass
    `reorder_delay_us` (the per-key watermark reorder buffer,
    `_reorder_step`): CUSUM is ORDER-SENSITIVE (the running extrema
    un-reorderable), so rows are held until the watermark passes and
    fed to the recurrence in event-time order; later-than-delay rows
    drop rather than corrupt every subsequent flag. A quiet key's
    final `reorder_delay_us` of rows stay buffered until one of its
    OWN events advances the watermark — send a flush/heartbeat row to
    drain a finished key (see `_reorder_step`'s flush-requirement
    note).

    Emits one row per input row: (key, ts, value, cusum_flag)."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{key} long, {ts_col} long, {val} double, cusum_flag string"
    )
    state_schema = "p long, minp long, maxp long"
    if reorder_delay_us is not None:
        state_schema += (
            ", buf_ts array<bigint>, buf_v array<double>, max_seen long"
        )

    def update(key_tuple, pdfs, state):
        buf, max_seen = [], -1
        if state.exists:
            got = state.get
            p, minp, maxp = got[0], got[1], got[2]
            if reorder_delay_us is not None:
                buf = list(zip(got[3], got[4]))
                max_seen = got[5]
        else:
            p, minp, maxp = 0, 0, 0
        ev = pd.concat(list(pdfs)).sort_values(ts_col, kind="stable")
        _require_event_times(ev, ts_col)
        pairs = zip(ev[ts_col], ev[val])
        if reorder_delay_us is not None:
            released, buf, max_seen, _late = _reorder_step(
                buf, max_seen, pairs, reorder_delay_us
            )
            pairs = released
        out_ts, out_v, out_f = [], [], []
        for ts, v in pairs:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                flag, vv = None, None
            else:
                q = math.floor(float(v) * float(scale))
                p += q - k_scaled
                minp = min(minp, p)
                maxp = max(maxp, p)
                if p - minp > h_scaled:
                    flag = "up"
                elif maxp - p > h_scaled:
                    flag = "down"
                else:
                    flag = None
                vv = float(v)
            out_ts.append(int(ts))
            out_v.append(vv)
            out_f.append(flag)
        if reorder_delay_us is None:
            state.update((p, minp, maxp))
        else:
            state.update(
                (
                    p,
                    minp,
                    maxp,
                    [t for t, _ in buf],
                    [x for _, x in buf],
                    max_seen,
                )
            )
        yield pd.DataFrame(
            {
                key: [key_tuple[0]] * len(out_ts),
                ts_col: out_ts,
                val: out_v,
                "cusum_flag": out_f,
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
