"""Count-Min sketch properties: one-sided error (est ≥ true), bounded
overestimate, and mergeability (sketch of parts == sketch of whole)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.sketch import cms_build, cms_query
from bigdatabowl2024_25_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"
W, D = 64, 4


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").select("event_id", "user_id").cache()


def test_cms_one_sided_and_bounded(spark, events):
    sketch = cms_build(events, "user_id", width=W, depth=D)
    items = events.select("user_id").distinct()
    est = {
        r.user_id: r.est_count
        for r in cms_query(sketch, items, "user_id", width=W, depth=D).collect()
    }
    true = {
        r.user_id: r.c
        for r in events.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    n = sum(true.values())
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, f"CMS must never underestimate ({k})"
        # ε = e/width ⇒ overshoot ≤ ε·N with high probability; allow 2×
        assert est[k] - t <= 2 * 2.72 * n / W, f"overshoot too large ({k})"


def test_cms_merge_equals_whole(spark, events):
    """Sketches are mergeable by summing counters — partition the
    input, sketch each part, sum, and the counters must equal the
    whole-input sketch exactly."""
    whole = cms_build(events, "user_id", width=W, depth=D)
    p1 = cms_build(events.filter(F.col("event_id") % 2 == 0), "user_id", W, D)
    p2 = cms_build(events.filter(F.col("event_id") % 2 == 1), "user_id", W, D)
    merged = (
        p1.unionByName(p2)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b
