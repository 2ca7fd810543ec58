"""The reference's five-stage DAG (SURVEY.md §3, entry point 1):

DatabaseCreation → Openness_Prep → radius_model → BuildingReadOrder →
QBReadStats (+ Matchup Information), stages linked by SQLite tables in
the reference and by DataFrames/parquet stage tables here.

Each stage is a pure function dict[str, DataFrame] → DataFrame(s), so
the DAG can run fully lazy in one session or persist stage tables via
sources.io.write_table — the reference is forced to materialize every
stage (`dbFetch(res,-1)` + `dbWriteTable`); we choose.
"""

from . import cleaning, matchup, openness_prep, qb_stats, radius_stage, read_order  # noqa: F401
