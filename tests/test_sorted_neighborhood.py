"""Sorted-neighborhood blocking: distributed global rank + windowed
pair generation must equal the naive single-window definition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kawa_spark.operators.blocking import (
    global_rank,
    sorted_neighborhood_pairs,
)


def _naive_pairs(rows: list[tuple], window: int) -> set[tuple]:
    """Reference: sort by (key, id), every pair within window-1 ranks."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (id_a, _) in enumerate(ordered):
        for j in range(i + 1, min(i + window, len(ordered))):
            out.add((id_a, ordered[j][0]))
    return out


@pytest.fixture()
def skewed_rows():
    # heavy tie block ('aaa' x 40) + singletons + boundary-adjacent keys:
    # ties and range-partition boundaries are exactly where a broken
    # rank implementation diverges
    rows = [(i, "aaa") for i in range(40)]
    rows += [(100 + i, f"k{i:03d}") for i in range(25)]
    rows += [(200 + i, "zzz") for i in range(7)]
    return rows


def test_global_rank_is_dense_and_order_correct(spark, skewed_rows):
    df = spark.createDataFrame(skewed_rows, ["rid", "skey"])
    ranked = global_rank(df, ["skey", "rid"], num_partitions=5)
    got = {r["rid"]: r["rank"] for r in ranked.collect()}
    expected_order = sorted(skewed_rows, key=lambda r: (r[1], r[0]))
    for pos, (rid, _) in enumerate(expected_order, start=1):
        assert got[rid] == pos
    assert sorted(got.values()) == list(range(1, len(skewed_rows) + 1))


@pytest.mark.parametrize("window", [2, 4, 7])
def test_snm_pairs_equal_naive(spark, skewed_rows, window):
    df = spark.createDataFrame(skewed_rows, ["rid", "skey"])
    pairs = sorted_neighborhood_pairs(
        df, ["skey"], "rid", window=window, num_partitions=4
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # the operator orders pairs by RANK, which follows (skey, rid); map
    # naive (sorted-order) pairs into the same id-pair space
    assert got == _naive_pairs(skewed_rows, window)
    # rank distance bound holds row-by-row
    bad = pairs.filter(
        (F.col("rank_b") - F.col("rank_a") > window - 1)
        | (F.col("rank_b") <= F.col("rank_a"))
    ).count()
    assert bad == 0


def test_snm_payload_columns_travel(spark):
    rows = [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")]
    df = spark.createDataFrame(rows, ["rid", "skey", "tag"])
    pairs = sorted_neighborhood_pairs(
        df, ["skey"], "rid", window=3, payload_cols=("tag",)
    )
    got = {
        (r["id_a"], r["id_b"], r["tag_a"], r["tag_b"])
        for r in pairs.collect()
    }
    assert got == {(1, 2, "x", "y"), (1, 3, "x", "z"), (2, 3, "y", "z")}


def test_snm_no_single_task_global_window(spark, skewed_rows):
    """The plan must not contain a partition-less row_number window —
    the global rank has to come from the range-partition + offset
    construction (every Window node keeps a partition spec)."""
    df = spark.createDataFrame(skewed_rows, ["rid", "skey"])
    pairs = sorted_neighborhood_pairs(df, ["skey"], "rid", window=4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_pid" in line, f"global window without partition: {line}"
