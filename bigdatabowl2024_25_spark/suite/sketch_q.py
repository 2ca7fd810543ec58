"""Parity query: Count-Min sketch build + point queries. The oracle
re-derives the depth×width counters and the min-over-rows estimate in
SQL — deterministic because bucketing uses the portable md5 hash.
Width is deliberately small (64 < 150 distinct users) so collisions
actually occur and the min-over-rows logic is exercised, not idle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sketch import cms_build, cms_query
from ..sources.io import load_table
from .registry import query

_W, _D = 64, 4


def _h(expr: str) -> str:
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


_BUCKET = _h("concat(CAST(r AS VARCHAR), ':', v)") + f" % {_W}"

_ORACLE = f"""
    WITH vals AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
    rows_ AS (SELECT unnest(range({_D})) AS r),
    counters AS (
        SELECT r, {_BUCKET} AS bucket, COUNT(*) AS cnt
        FROM vals CROSS JOIN rows_ GROUP BY 1, 2
    ),
    items AS (SELECT DISTINCT v FROM vals),
    probes AS (
        SELECT i.v, r.r AS r, {_h("concat(CAST(r.r AS VARCHAR), ':', i.v)")}
               % {_W} AS bucket
        FROM items i CROSS JOIN rows_ r
    )
    SELECT CAST(p.v AS BIGINT) AS user_id,
           MIN(COALESCE(c.cnt, 0)) AS est_count
    FROM probes p LEFT JOIN counters c
      ON c.r = p.r AND c.bucket = p.bucket
    GROUP BY 1
"""


@query("q38_cms_point_counts", oracle=_ORACLE)
def q38_cms_point_counts(spark, sf_dir):
    """Count-Min estimates for every distinct user: sketch counters
    shuffle (depth×width rows, fixed KBs at any input size), then the
    broadcast point-query. est ≥ true always; tightness is pinned in
    tests/test_sketch.py."""
    e = load_table(spark, sf_dir, "events")
    sketch = cms_build(e, "user_id", width=_W, depth=_D)
    items = e.select("user_id").distinct()
    return cms_query(sketch, items, "user_id", width=_W, depth=_D)
