"""Coverage-disguise analysis — `cover_threshold.R` composed as one
call (round-12 VERDICT item 4: the last reference script without a
named pipeline twin; its operators all existed and passed
individually — F4 regex normalization, F13 dynamic column lookup, F3
nested conditionals, A10 row sums, A12 conditional count — this
module is their composition).

Reference walk (cover_threshold.R:8-37): read coverage predictions,
rowSums the per-class probability columns (:12), normalize the
coverage labels `[ -]` → `.` (:18-20, mirroring R's CSV column-name
mangling), look up each row's own-coverage probability through the
DYNAMIC `prob_<coverage>` column name (:24-28), flag the play
DISGUISED when the model was both unconfident in the actual coverage
(own prob ≤ threshold) and wrong (:29-33), and roll up `sum(dig)`
(:36).
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(c: Column) -> Column:
    """R's `str_replace_all(x, "[ -]", ".")` (cover_threshold.R:19-20)
    — spaces and hyphens to dots, so labels compare equal to the
    mangled `prob_*` column suffixes."""
    return F.regexp_replace(c, "[ -]", ".")


def disguise_data(
    preds: DataFrame,
    actual_col: str = "actual_coverage",
    predicted_col: str = "predicted_coverage",
    prob_prefix: str = "prob_",
    threshold: float = 0.8,
) -> DataFrame:
    """`cover_threshold.R:8-37` in one call over a predictions frame
    (one row per play: actual/predicted coverage labels + one
    `prob_<coverage>` column per class). Appends:

    - `prob_sum` — rowSums over every `prob_*` column (A10, :12),
      NULL-propagating like R's rowSums on NA;
    - `actual_norm` / `predicted_norm` — the `[ -]`→`.` normalized
      labels (F4, :18-20);
    - `disguised` — 1 when the model was unconfident in the ACTUAL
      coverage (its dynamically-looked-up `prob_<actual>` ≤
      `threshold`) AND predicted wrongly, else 0 (F13 + F3, :24-33);
      a row whose actual coverage has NO prob column gets NULL
      (typed, auditable) where the R loop would hard-error on the
      missing column — the one documented divergence;
    - `n_disguised` — `sum(dig)` (A12, :36) on every row, computed as
      a single-row aggregate broadcast back (the A9 global-agg
      pattern) rather than a window OVER () — an empty-frame window
      would force one partition at scale.

    The dynamic `prob_<coverage>` lookup is a plan MAP LITERAL keyed
    by normalized class name (class-count-bounded — the F13 shape),
    so the whole flag stays in codegen; no per-row Python."""
    prob_cols = [c for c in preds.columns if c.startswith(prob_prefix)]
    if not prob_cols:
        raise ValueError(
            f"disguise_data: no '{prob_prefix}*' probability columns "
            f"among {preds.columns}"
        )
    # A10 rowSums (:12) — left-to-right add, NULL-propagating
    prob_sum = reduce(
        lambda a, b: a + b, [F.col(c) for c in prob_cols]
    )
    # F13: normalized class suffix → its prob column, as a map literal
    lookup = F.create_map(
        *[
            x
            for c in prob_cols
            for x in (
                F.lit(re.sub(r"[ -]", ".", c[len(prob_prefix):])),
                F.col(c),
            )
        ]
    )
    a_norm = _norm(F.col(actual_col))
    p_norm = _norm(F.col(predicted_col))
    own = F.element_at(lookup, a_norm)
    dig = (
        F.when(a_norm == p_norm, F.lit(0))
        .when(own > F.lit(threshold), F.lit(0))
        .when(own <= F.lit(threshold), F.lit(1))
        .otherwise(F.lit(None).cast("int"))
    )
    flagged = preds.select(
        "*",
        prob_sum.alias("prob_sum"),
        a_norm.alias("actual_norm"),
        p_norm.alias("predicted_norm"),
        dig.alias("disguised"),
    )
    total = flagged.agg(
        F.sum("disguised").cast("bigint").alias("n_disguised")
    )
    return flagged.crossJoin(F.broadcast(total))
