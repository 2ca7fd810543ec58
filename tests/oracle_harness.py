"""Driver-style DuckDB-oracle comparison used by the parity tests.

Mirrors the driver's check: run the Spark query and the oracle SQL on
the same parquet tables, sort columns by name, compare row count,
schema family, and values order-insensitively. Floats are compared
EXACTLY — the suite's determinism rules (decimal-stabilized sums,
epoch-micros timestamps, unique tie-breaks) are supposed to make exact
match attainable; any drift is a bug here, not a tolerance problem.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from bigdatabowl2024_25_spark.sources.io import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("int64")
        else:
            df[c] = s.astype("object").where(~s.isna(), None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> None:
    sp = _normalize(spark_df.toPandas())
    dk = _normalize(oracle_df)
    assert list(sp.columns) == list(dk.columns), (
        f"{name}: column mismatch {list(sp.columns)} vs {list(dk.columns)}"
    )
    assert len(sp) == len(dk), f"{name}: row count {len(sp)} vs {len(dk)}"
    for c in sp.columns:
        a, b = sp[c], dk[c]
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            ok = (a.isna() & b.isna()) | (a == b)
            if not ok.all():
                bad = (~ok).idxmax()
                diff = (a - b).abs().max()
                raise AssertionError(
                    f"{name}: float mismatch col={c} row={bad} "
                    f"spark={a[bad]!r} oracle={b[bad]!r} maxdiff={diff}"
                )
        else:
            same = a.reset_index(drop=True).equals(b.reset_index(drop=True))
            if not same:
                neq = [
                    i
                    for i in range(len(a))
                    if not (
                        (a[i] is None and b[i] is None)
                        or (
                            isinstance(a[i], float)
                            and isinstance(b[i], float)
                            and math.isnan(a[i])
                            and math.isnan(b[i])
                        )
                        or a[i] == b[i]
                    )
                ][:3]
                raise AssertionError(
                    f"{name}: value mismatch col={c} rows={neq} "
                    f"spark={[a[i] for i in neq]!r} oracle={[b[i] for i in neq]!r}"
                )


def check_query(spark, name: str, fn, sql: str | None, sf_dir: str) -> None:
    sdf = fn(spark, sf_dir)
    if sql is None:
        # rows-only check, as the driver does for non-SQL-expressible ops
        assert sdf.count() >= 0
        return
    compare(sdf, run_oracle(sql, sf_dir), name)
