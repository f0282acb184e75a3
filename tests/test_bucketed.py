"""Bucketed co-located joins: the one-time-shuffle layout must actually
remove the per-join Exchange from the physical plan."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from kawa_spark.sources.bucketed import read_bucketed, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    """Force a non-broadcast join so the exchange-elimination claim is
    actually exercised (a broadcast join has no shuffle to eliminate)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, no_broadcast):
        a = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        write_bucketed(a, "t_bucket_a", "k", buckets=8)
        write_bucketed(b, "t_bucket_b", "k", buckets=8)
        try:
            j = read_bucketed(spark, "t_bucket_a").join(
                read_bucketed(spark, "t_bucket_b"), "k"
            )
            plan = _plan(j)
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert "Exchange" not in plan, plan
            # and it still computes the right thing
            assert j.count() == 10_000
        finally:
            spark.sql("DROP TABLE IF EXISTS t_bucket_a")
            spark.sql("DROP TABLE IF EXISTS t_bucket_b")

    def test_unbucketed_join_does_shuffle(self, spark, no_broadcast):
        """Control: the same join without bucketing pays the Exchange —
        the bucketed assertion above is not vacuous."""
        a = spark.range(0, 10_000).select(F.col("id").alias("k"))
        b = spark.range(0, 10_000).select(F.col("id").alias("k"))
        plan = _plan(a.join(b, "k"))
        assert "Exchange" in plan
