"""Skew handling: triangle partitioning bounds the max task input
(SURVEY.md §5.5; BASELINE.json:14 explicit-salting mandate)."""

import pandas as pd
from pyspark.sql import functions as F

from kawa_spark.operators.blocking import _hot_replicas


def test_hot_key_max_subblock_bounded(spark):
    """A hot key with s mentions, split into g groups, must yield
    sub-blocks of at most ~2*ceil(s/g) replicas — i.e. the max task
    input drops from O(s) to O(s/g) while every pair still meets in
    exactly one sub-block."""
    s, g = 400, 8
    pdf = pd.DataFrame(
        {"mention_id": [f"m{i:04d}" for i in range(s)], "norm": ["hot"] * s}
    )
    hot = (
        spark.createDataFrame(pdf)
        .withColumn("block_key", F.lit("ex:hot"))
        .select("mention_id", "norm", "block_key")
    )
    sizes = (
        _hot_replicas(hot, g)
        .groupBy("sub_key")
        .count()
        .agg(F.max("count").alias("mx"), F.count("*").alias("n_blocks"))
        .first()
    )
    # diagonal sub-blocks hold ~s/g, off-diagonal ~2s/g; hashing jitter
    # stays well under 3s/g
    assert sizes["mx"] <= 3 * s // g, sizes
    # all g*(g+1)/2 sub-blocks exist (uniform-ish hash spread)
    assert sizes["n_blocks"] == g * (g + 1) // 2
