"""Monge-Elkan token-set similarity (monge_elkan query) hand pins."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def _run(spark, parts):
    spark.createDataFrame(
        parts, "p_partkey BIGINT, p_name STRING, p_brand STRING, p_size INT"
    ).createOrReplaceTempView("part")
    rows = spark.sql(entry._monge_elkan_sql("spark")).collect()
    return {(r["id_a"], r["id_b"]): r for r in rows}


def test_identical_names_score_one(spark):
    got = _run(
        spark,
        [(1, "alpha beta", "B1", 1), (2, "alpha beta", "B1", 1)],
    )
    r = got[(1, 2)]
    assert r["me_ab"] == r["me_ba"] == r["me_sym"] == pytest.approx(1.0)


def test_hand_example_asymmetric_directions(spark):
    # A = {ab, cd}, B = {ab}:  ME(A->B) = (1 + sim(cd,ab))/2 with
    # sim(cd,ab) = 1 - 2/2 = 0 -> 0.5;  ME(B->A) = max(1, 0) = 1.
    got = _run(spark, [(1, "ab cd", "B1", 1), (2, "ab", "B1", 1)])
    r = got[(1, 2)]
    assert r["me_ab"] == pytest.approx(0.5)
    assert r["me_ba"] == pytest.approx(1.0)
    assert r["me_sym"] == pytest.approx(0.75)


def test_duplicate_tokens_collapse(spark):
    # set semantics: "ab ab" behaves as {ab}
    got = _run(spark, [(1, "ab ab", "B1", 1), (2, "ab", "B1", 1)])
    r = got[(1, 2)]
    assert r["me_ab"] == pytest.approx(1.0)
    assert r["me_ba"] == pytest.approx(1.0)


def test_blocking_excludes_cross_block_pairs(spark):
    got = _run(
        spark,
        [(1, "ab", "B1", 1), (2, "ab", "B2", 1), (3, "ab", "B1", 2)],
    )
    assert got == {}
