"""Scalar function layer (SURVEY.md §2.8, F1-F15).

Everything stays JVM-side (built-in pyspark.sql.functions) — no Python
UDFs anywhere in this module, so all expressions participate in
whole-stage codegen and can be pushed/pruned by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def physics_step(speed: Column, accel: Column, dt: float = 0.1) -> Column:
    """F1: `distance_step = s*0.1 + 0.5*a*(0.1^2)`
    (`BuildingReadOrder.R:87`)."""
    return speed * dt + 0.5 * accel * (dt * dt)


def euclid(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """F2: euclidean distance `sqrt((x-off_x)²+(y-off_y)²)`
    (`DefPosModel.ipynb` cell 1; `radius_model.R:141`)."""
    return F.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))


def time_bucket(second_id: Column, cap: int = 6) -> Column:
    """F3: the 6-way `ifelse` time bucket (`BuildingReadOrder.R:32-36`)
    — equal to `least(floor(secondId/10)+1, cap)`."""
    return F.least(F.floor(second_id / 10) + 1, F.lit(cap))


def clean_label(col: Column) -> Column:
    """F4: `str_replace_all(actual_coverage, "[ -]", ".")`
    (`cover_threshold.R:18-20`)."""
    return F.regexp_replace(col, "[ -]", ".")


def join_label(sep: str, *cols: Column) -> Column:
    """F5: `str_c(routeRan, assignment, sep=" - ")`
    (`Matchup Information.R:102`)."""
    return F.concat_ws(sep, *cols)


def reverse_words(col: Column, sep: str = " ") -> Column:
    """F6: `reverse_route`: split, reverse, rejoin
    (`Matchup Information.R:75-77`)."""
    return F.array_join(F.reverse(F.split(col, sep)), sep)


def pad_time_fraction(col: Column) -> Column:
    """F7: `pad_time_fraction` + `to_datetime(errors='coerce')`
    (`DefPosModel.ipynb` cell 1): right-pad the fractional seconds to 6
    digits, parse as TIMESTAMP_NTZ; unparseable → null (try_)."""
    base = F.when(
        col.contains("."),
        F.concat(
            F.substring_index(col, ".", 1),
            F.lit("."),
            F.rpad(F.substring_index(col, ".", -1), 6, "0"),
        ),
    ).otherwise(F.concat(col, F.lit(".000000")))
    return F.try_to_timestamp(
        base, F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")
    ).cast("timestamp_ntz")


def clock_to_seconds(clock: Column) -> Column:
    """F9: `time_to_seconds("MM:SS")` (`Visualization.R:111-118`)."""
    parts = F.split(clock, ":")
    return parts.getItem(0).cast("int") * 60 + parts.getItem(1).cast("int")


def seconds_to_clock(total_seconds: Column) -> Column:
    """F9: `seconds_to_time` (`Visualization.R:120-125`)."""
    return F.format_string(
        "%d:%02d", (total_seconds / 60).cast("int"), (total_seconds % 60).cast("int")
    )


def coalesce_nearest(cols: list[Column | str], target_idx: int) -> Column:
    """F11: `fill_na_with_nearest(df, 72:76)` (`QBReadStats.R:70-93`) —
    fill a null read-frame column from the nearest sibling column,
    preferring the earlier one on distance ties (matching the
    reference's left-to-right scan). A pure coalesce cascade — no
    shuffle, no UDF."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    order = sorted(range(len(cs)), key=lambda j: (abs(j - target_idx), j))
    return F.coalesce(*[cs[j] for j in order])


def argmin_across(cols: list[Column], target: Column) -> Column:
    """F12: `max.col(-diffs)` over read-frame columns → 1-based index of
    the column nearest to `target` (`QBReadStats.R:102-114`). First
    occurrence wins ties, like max.col(ties.method="first")."""
    diffs = F.array(*[F.abs(c - target) for c in cols])
    return F.array_position(diffs, F.array_min(diffs))


def dynamic_lookup(mapping: dict[str, Column], key: Column) -> Column:
    """F13: dynamic column lookup by row value — `data[row,
    paste0("prob_", cov)]` (`cover_threshold.R:26-35`,
    `QBReadStats.R:118-121`): a literal-keyed map indexed per row, no
    per-row Python."""
    kv: list[Column] = []
    for k, v in mapping.items():
        kv.extend([F.lit(k), v])
    return F.create_map(*kv)[key]


def recode(col: Column, table: dict[str, str], default: Column | None = None) -> Column:
    """F15: dictionary recode — the 32-entry team-abbr map
    (`Visualization.R:93-105`). Literal map lookup; falls back to
    `default` (or null) for unmapped keys."""
    kv: list[Column] = []
    for k, v in table.items():
        kv.extend([F.lit(k), F.lit(v)])
    out = F.create_map(*kv)[col]
    return F.coalesce(out, default) if default is not None else out


def json_field(col: Column, schema: str, field: str) -> Column:
    """Typed JSON parse + field extract: `from_json` with an explicit
    schema (codegen Jackson parse, JVM-side — the engine's
    semi-structured column story; the reference has no JSON surface,
    its `props`-like payloads stay opaque strings). Malformed
    documents yield NULL, the PERMISSIVE contract `sources.io`'s JSONL
    reader shares."""
    return F.from_json(col, schema)[field]


def json_path(col: Column, path: str) -> Column:
    """Untyped JSONPath probe (`get_json_object`): ad-hoc extraction
    without declaring a schema — the exploratory sibling of
    `json_field`; returns a string (cast at the call site)."""
    return F.get_json_object(col, path)


def json_n_keys(col: Column) -> Column:
    """Top-level key count (schema drift detector for ingest
    monitoring: alert when a producer adds/drops fields)."""
    return F.size(F.json_object_keys(col))
