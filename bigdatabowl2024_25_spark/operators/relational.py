"""Relational operators (SURVEY.md §2.2 projections/filters, §2.3 joins,
§2.6 sorts/limits, §2.7 set ops).

Each function is intentionally thin — the Spark primitive *is* the
implementation — but centralizes the scale-relevant decisions
(broadcast hints, deterministic ordering for order-sensitive semantics)
so every pipeline and parity query shares them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    how: str = "left",
    hint_broadcast: bool = True,
) -> DataFrame:
    """Fact⋈dim equi-join (J1/J2, e.g. tracking⋈plays at
    `Openness_Data_Frame_Prep.R:8-15`).

    Scale: the dim side (plays=16k, players=1.7k rows in the reference)
    is always broadcast so the 59M-row fact side never shuffles.
    """
    d = F.broadcast(dim) if hint_broadcast else dim
    return fact.join(d, on, how)


def asym_join(
    left: DataFrame,
    right: DataFrame,
    key_pairs: list[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """J3: equi-join with differently-named keys, e.g. route runner ⋈
    assigned defender via nflId = pff_primaryDefensiveCoverageMatchupNflId
    (`Openness_Data_Frame_Prep.R:63`). Right-side key columns are
    dropped after the join, mirroring `data[,-c(19,20)]` (P2)."""
    cond = None
    for lk, rk in key_pairs:
        c = left[lk] == right[rk]
        cond = c if cond is None else (cond & c)
    out = left.join(right, cond, how)
    for lk, rk in key_pairs:
        if rk not in left.columns or rk != lk:
            out = out.drop(right[rk])
    return out


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """J7: `semi_join(tracking, cleaned_player_data)` (`Visualization.R:22`)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """J11 made explicit: reference approximates anti semantics with a
    left join + `is.na` fill (`Matchup Information.R:86`)."""
    return left.join(right, on, "left_anti")


def keep_first(
    df: DataFrame, keys: list[str], order_by: list[Column | str]
) -> DataFrame:
    """P9: `distinct(gameId, playId, .keep_all=TRUE)` (`QBReadStats.R:139`)
    with the nondeterminism fixed — an explicit total order replaces
    physical row order. Implemented as row_number()==1 so it stays a
    single shuffle on `keys`."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """O2: `arrange(desc(qualified_press)) %>% slice(1:10)`
    (`QBReadStats.R:230-247`). Callers must include a unique tiebreaker
    in `order_by` for deterministic results. Spark turns this into a
    TakeOrderedAndProject — per-partition top-k then a k-row merge on
    the driver; no global sort even at 100 TB."""
    return df.orderBy(*order_by).limit(k)


def mirror_self_join(
    df: DataFrame,
    left_col: str,
    right_col: str,
    extra_keys: list[str],
    payload: list[str],
) -> DataFrame:
    """J8: matchup table joined to itself on route_tree ==
    reversed_route within the same coverage (`Matchup
    Information.R:79-84`). Returns left columns plus right payload
    suffixed `_m`."""
    a, b = df.alias("a"), df.alias("b")
    cond = F.col(f"a.{left_col}") == F.col(f"b.{right_col}")
    for k in extra_keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    sel = [F.col(f"a.{c}") for c in df.columns] + [
        F.col(f"b.{c}").alias(f"{c}_m") for c in payload
    ]
    return a.join(b, cond, "left").select(*sel)


def union_all(*dfs: DataFrame) -> DataFrame:
    """U1: `rbind(w1..w9)` (`DataCleaning.R:20`) /
    `pd.concat` (`DefCoverage.ipynb` cell 0). Prefer a globbed scan at
    the source (S2); this covers already-loaded frames."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _left_salt(columns: list[str], n_salts: int):
    """The big-side salt expression for `salted_join`, split out so the
    duplicate-row spreading property is directly testable: xxhash64
    over every column AND a per-row positional id, mod n_salts."""
    return F.pmod(
        F.xxhash64(
            *[F.col(c) for c in columns], F.monotonically_increasing_id()
        ),
        F.lit(n_salts),
    ).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with EXPLICIT key salting — the classic remedy
    when one join key is so hot that a single reducer drags the whole
    stage, and AQE's adaptive skew split cannot reach it (AQE
    disabled, a streaming micro-batch plan, or skew inside the BUILD
    side of a sort-merge join that the splitter won't touch).
    `spark.sql.adaptive.skewJoin` remains the first choice when it
    applies; this operator is for the plans it can't fix.

    The LEFT (large, skewed) side gets a deterministic salt in
    [0, n_salts) hashed from its full row; the RIGHT side replicates
    ×n_salts so every (key, salt) bucket still sees all its matches.
    The join key becomes (keys…, __salt), so a hot key's rows spread
    across n_salts reducers instead of one. Membership is EXACTLY the
    plain inner join — salting moves rows between tasks, never in or
    out of the result — which is what the q18 'salted' oracle branch
    value-hashes and the equality test pins.

    Cost model: pass the SMALLER side as `right` — it pays an
    ×n_salts replication through the shuffle. At genuine hot-key skew
    that trade is the point: n× a small table's traffic against one
    straggler owning the hot key's entire left volume. NULL keys drop
    on both paths (inner equi-join semantics), and the salt column
    never survives into the output.

    The salt hashes the full row PLUS a per-row positional id
    (monotonically_increasing_id, folded in as one more hashed input —
    never added arithmetically, which could overflow under ANSI mode).
    Row content alone is not enough: EXACT-DUPLICATE rows on the hot
    key — a common shape of the very skew this operator exists to fix —
    would all hash to one salt and the straggler would survive (round-12
    ADVICE). Membership is salt-independent (the right side replicates
    every salt), so the id's run-to-run instability cannot change
    results; a task retry that recomputes a different salt still joins
    identically."""
    if n_salts < 1:
        raise ValueError("salted_join: n_salts must be >= 1")
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"salted_join: non-key columns collide {sorted(overlap)}; "
            "alias them apart first (the plain-join contract)"
        )
    l = left.withColumn("__salt", _left_salt(left.columns, n_salts))
    r = right.withColumn(
        "__salt",
        # explode() is a generator — it cannot nest inside another
        # expression (e.g. a cast), so the sequence is int-typed at
        # the source to match the left side's cast salt
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(n_salts - 1).cast("int"))),
    )
    return l.join(r, list(keys) + ["__salt"]).drop("__salt")
