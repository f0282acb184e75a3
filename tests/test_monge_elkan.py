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


class TestSoftTfidf:
    def _run(self, spark, parts):
        spark.createDataFrame(
            parts,
            "p_partkey BIGINT, p_name STRING, p_brand STRING, p_size INT",
        ).createOrReplaceTempView("part")
        rows = spark.sql(entry._soft_tfidf_sql("spark")).collect()
        return {(r["id_a"], r["id_b"]): r["soft_tfidf"] for r in rows}

    def test_hand_example(self, spark):
        import math

        # corpus: {x aa}, {x ab}, {y z}; block pair (1,2) shares only
        # the close token x (aa~ab sim 0.5 < 0.9 is excluded)
        got = self._run(
            spark,
            [
                (1, "x aa", "B1", 1),
                (2, "x ab", "B1", 1),
                (3, "y z", "B2", 1),
            ],
        )
        idf_x = math.log(4.0 / 3.0)
        idf_rare = math.log(4.0 / 2.0)
        v = idf_x / math.sqrt(idf_x**2 + idf_rare**2)  # same in both names
        assert got[(1, 2)] == pytest.approx(v * v * 1.0, abs=1e-6)

    def test_no_close_tokens_no_row(self, spark):
        got = self._run(
            spark, [(1, "aa bb", "B1", 1), (2, "cc dd", "B1", 1)]
        )
        assert got == {}

    def test_identical_names_score_one(self, spark):
        # identical tokens: soft-TFIDF degenerates to the cosine of the
        # L2-normalized weight vector with itself = 1 (a third distinct
        # name keeps the idfs non-zero)
        got = self._run(
            spark,
            [
                (1, "pq rs", "B1", 1),
                (2, "pq rs", "B1", 1),
                (3, "zz ww", "B2", 1),
            ],
        )
        assert got[(1, 2)] == pytest.approx(1.0, abs=1e-6)

    def test_all_zero_idf_corpus_scores_zero(self, spark):
        # every token in every name -> all idf 0 -> zero-signal names
        # score 0 instead of raising a divide-by-zero
        got = self._run(
            spark, [(1, "pq rs", "B1", 1), (2, "pq rs", "B1", 1)]
        )
        assert got[(1, 2)] == pytest.approx(0.0, abs=1e-12)
