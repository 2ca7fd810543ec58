"""Declarative data-quality expectations — the dbt-test /
Great-Expectations layer, executed as ONE aggregate pass.

The reference's only data contract is SQLite DDL that SQLite never
enforces (`DatabaseCreation.R:60-73`; `sources.io.assert_unique_key`
made the PK executable in round 1). Real ingest needs the rest of the
standard expectation family, and it needs them CHEAP: every
row-level expectation here compiles to a conditional count inside a
single `agg()` — one scan, map-side partials, a one-row result —
however many expectations are attached. Only `unique` (a keyed
distinct) and `foreign_key` (an anti join against the referenced
dimension) cost their own bounded extra step.

API:
    report = expect(df,
        not_null=["id", "name"],
        accepted_values={"status": ["A", "B"]},
        in_range={"bal": (0, 1e6)},
        matches={"email": r"@"},
        unique=[["id"]],
        foreign_key={"nation_id": (dim_df, "n_id")},
    )
    # report: one row per expectation: (expectation, column,
    #   n_violations) — 0 rows violated == pass
    enforce(report)   # raises listing every failed expectation

Scale: violation COUNTS, not violating rows — the report is
expectation-cardinality-sized regardless of data volume. To fetch
offenders for debugging, re-filter with the same predicate (lazy, and
only for the expectation that failed). FK dims broadcast (left_anti);
`unique` reuses the skew-safe groupBy-count shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expect(
    df: DataFrame,
    *,
    not_null: list[str] | None = None,
    accepted_values: dict[str, list] | None = None,
    in_range: dict[str, tuple] | None = None,
    matches: dict[str, str] | None = None,
    unique: list[list[str]] | None = None,
    foreign_key: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate every expectation; returns (expectation, column,
    n_violations) with one row per attached expectation."""
    checks: list[tuple[str, str, object]] = []
    for c in not_null or []:
        checks.append(("not_null", c, F.col(c).isNull()))
    for c, vals in (accepted_values or {}).items():
        checks.append(
            ("accepted_values", c,
             F.col(c).isNotNull() & ~F.col(c).isin(*vals))
        )
    for c, (lo, hi) in (in_range or {}).items():
        checks.append(
            ("in_range", c,
             F.col(c).isNotNull()
             & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))))
        )
    for c, pat in (matches or {}).items():
        checks.append(
            ("matches", c, F.col(c).isNotNull() & ~F.col(c).rlike(pat))
        )

    spark = df.sparkSession
    parts: list[DataFrame] = []
    if checks:
        aggs = [
            F.sum(cond.cast("bigint")).alias(f"__c{i}")
            for i, (_, _, cond) in enumerate(checks)
        ]
        row = df.agg(*aggs)
        sel = F.explode(
            F.array(*[
                F.struct(
                    F.lit(kind).alias("expectation"),
                    F.lit(col).alias("column"),
                    F.coalesce(F.col(f"__c{i}"), F.lit(0)).alias(
                        "n_violations"
                    ),
                )
                for i, (kind, col, _) in enumerate(checks)
            ])
        ).alias("e")
        parts.append(row.select(sel).select("e.*"))

    for keys in unique or []:
        dup = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > 1)
            .agg(
                F.lit("unique").alias("expectation"),
                F.lit(",".join(keys)).alias("column"),
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias(
                    "n_violations"
                ),
            )
        )
        parts.append(dup)

    for c, (dim, dim_key) in (foreign_key or {}).items():
        orphans = (
            df.filter(F.col(c).isNotNull())
            .join(
                F.broadcast(
                    dim.select(F.col(dim_key).alias(c)).distinct()
                ),
                c,
                "left_anti",
            )
            .agg(
                F.lit("foreign_key").alias("expectation"),
                F.lit(c).alias("column"),
                F.count("*").alias("n_violations"),
            )
        )
        parts.append(orphans)

    if not parts:
        return spark.createDataFrame(
            [], "expectation string, column string, n_violations bigint"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def enforce(report: DataFrame) -> None:
    """Raise with EVERY failed expectation (not just the first), so
    one validation run reports the whole contract."""
    failed = report.filter(F.col("n_violations") > 0).collect()
    if failed:
        msg = "; ".join(
            f"{r.expectation}({r.column})={r.n_violations}" for r in failed
        )
        raise ValueError(f"data-quality expectations failed: {msg}")
