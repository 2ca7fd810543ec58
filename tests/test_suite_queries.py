

def test_scoped_shuffle_partitions_restores(spark):
    """q93's state-partition sizing must restore the session conf on
    both the clean and the exception path — a leaked override would
    silently re-plan every later query in the session."""
    import pytest

    from bigdatabowl2024_25_spark.suite.streaming_q import (
        _scoped_shuffle_partitions,
    )

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    with _scoped_shuffle_partitions(spark, 7):
        assert spark.conf.get(key) == "7"
    assert spark.conf.get(key) == prev
    with pytest.raises(RuntimeError, match="boom"):
        with _scoped_shuffle_partitions(spark, 9):
            assert spark.conf.get(key) == "9"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == prev
