"""Eval metrics: NER string-match F1 (single-job fold), pairwise F1
shapes, B-cubed (kawa_spark/eval.py; reference harness
/root/reference/eval.py:173-199), and the NMI entropy tail."""

import math

import pytest

from kawa_spark.eval import bcubed, ner_string_f1


def _nmi_tail(spark, cells):
    import __spark_entry__ as entry

    spark.createDataFrame(
        cells, "pkey BIGINT, tkey STRING, n_pt BIGINT"
    ).createOrReplaceTempView("pt_test")
    return spark.sql(
        "WITH pt AS (SELECT * FROM pt_test), " + entry._NMI_TAIL_SQL
    ).collect()[0]


def test_nmi_identical_clusterings_is_one(spark):
    r = _nmi_tail(spark, [(1, "a", 3), (2, "b", 2)])
    assert r["nmi"] == pytest.approx(1.0)
    assert r["mi"] == pytest.approx(r["h_pred"]) == pytest.approx(r["h_true"])


def test_nmi_independent_clusterings_is_zero(spark):
    r = _nmi_tail(
        spark, [(1, "a", 2), (1, "b", 2), (2, "a", 2), (2, "b", 2)]
    )
    assert r["mi"] == pytest.approx(0.0, abs=1e-9)
    assert r["nmi"] == pytest.approx(0.0, abs=1e-9)


def _purity_tail(spark, cells):
    import __spark_entry__ as entry

    spark.createDataFrame(
        cells, "pkey BIGINT, tkey STRING, n_pt BIGINT"
    ).createOrReplaceTempView("pt_test")
    return spark.sql(
        "WITH pt AS (SELECT * FROM pt_test), " + entry._PURITY_TAIL_SQL
    ).collect()[0]


def test_purity_identical_clusterings_is_one(spark):
    r = _purity_tail(spark, [(1, "a", 3), (2, "b", 2)])
    assert r["purity"] == r["inverse_purity"] == r["f_purity"] == 1.0


def test_purity_hand_example(spark):
    # pred {1: 3a+1b, 2: 2b}: purity = (3+2)/6; truth a: best 3,
    # b: best 2 -> inverse = (3+2)/6; F = harmonic(5/6, 5/6) = 5/6
    r = _purity_tail(spark, [(1, "a", 3), (1, "b", 1), (2, "b", 2)])
    assert r["n_docs"] == 6
    assert r["purity"] == pytest.approx(5 / 6, abs=1e-6)
    assert r["inverse_purity"] == pytest.approx(5 / 6, abs=1e-6)
    assert r["f_purity"] == pytest.approx(5 / 6, abs=1e-6)


def test_purity_single_cluster_detects_overmerge(spark):
    # everything merged into one cluster: purity drops to the majority
    # fraction, inverse purity is perfect — the direction is visible
    r = _purity_tail(spark, [(1, "a", 3), (1, "b", 1)])
    assert r["purity"] == pytest.approx(0.75, abs=1e-6)
    assert r["inverse_purity"] == 1.0


def test_nmi_hand_example(spark):
    # pred {1:{3 a}, 2:{1 a, 2 b}}; n=6; marginals: pkeys (3,3),
    # tkeys (a:4, b:2)
    cells = [(1, "a", 3), (2, "a", 1), (2, "b", 2)]
    n = 6.0
    mi = sum(
        (c / n) * math.log2(n * c / (np_ * nt))
        for c, np_, nt in [(3, 3, 4), (1, 3, 4), (2, 3, 2)]
    )
    hp = -sum((x / n) * math.log2(x / n) for x in (3.0, 3.0))
    ht = -sum((x / n) * math.log2(x / n) for x in (4.0, 2.0))
    r = _nmi_tail(spark, cells)
    assert r["n_docs"] == 6
    assert r["mi"] == pytest.approx(mi, abs=1e-6)
    assert r["h_pred"] == pytest.approx(hp, abs=1e-6)
    assert r["h_true"] == pytest.approx(ht, abs=1e-6)
    assert r["nmi"] == pytest.approx(2 * mi / (hp + ht), abs=1e-6)


def test_ner_string_f1_single_job_counts(spark):
    # pred surfaces (post-lower/underscore-fold): {alice anderson, bob, carol}
    pred = spark.createDataFrame(
        [("Alice_Anderson",), ("alice anderson",), ("BOB",), ("carol",)],
        ["mention"],
    )
    # gold: {alice anderson, bob, dave} -> tp=2 (alice, bob), fp=1 (carol),
    # fn=1 (dave)
    gold = spark.createDataFrame(
        [("Alice Anderson",), ("bob",), ("dave",)], ["surface"]
    )
    m = ner_string_f1(pred, gold)
    assert (m["tp"], m["fp"], m["fn"]) == (2, 1, 1)
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["recall"] == pytest.approx(2 / 3)
    assert m["f1"] == pytest.approx(2 / 3)


def test_bcubed_hand_example(spark):
    # entities: X = {1..5}, Y = {6,7}; clusters: A = {1,2,3,6},
    # B = {4,5}, C = {7}
    # per-mention precision: 1,2,3 -> 3/4; 6 -> 1/4; 4,5 -> 1; 7 -> 1
    #   => P = (3*(3/4) + 1/4 + 2 + 1) / 7 = 5.5/7
    # per-mention recall: 1,2,3 -> 3/5; 4,5 -> 2/5; 6 -> 1/2; 7 -> 1/2
    #   => R = (3*(3/5) + 2*(2/5) + 1/2 + 1/2) / 7 = 3.6/7
    rows = [
        (1, "A", "X"), (2, "A", "X"), (3, "A", "X"), (4, "B", "X"),
        (5, "B", "X"), (6, "A", "Y"), (7, "C", "Y"),
    ]
    df = spark.createDataFrame(rows, ["mention_id", "cluster_id", "entity_id"])
    m = bcubed(df)
    assert m["n"] == 7
    assert m["precision"] == pytest.approx(5.5 / 7)
    assert m["recall"] == pytest.approx(3.6 / 7)
    p, r = 5.5 / 7, 3.6 / 7
    assert m["f1"] == pytest.approx(2 * p * r / (p + r))


def test_bcubed_perfect_and_null_excluded(spark):
    rows = [
        (1, "A", "X"), (2, "A", "X"), (3, "B", "Y"),
        (4, "Z", None),  # unlabeled mention must not count
    ]
    df = spark.createDataFrame(rows, "mention_id int, cluster_id string, entity_id string")
    m = bcubed(df)
    assert m["n"] == 3
    assert m["precision"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(1.0)
    assert m["f1"] == pytest.approx(1.0)


def test_bcubed_empty(spark):
    df = spark.createDataFrame([], "mention_id int, cluster_id string, entity_id string")
    m = bcubed(df)
    assert m == {"n": 0, "precision": 1.0, "recall": 1.0, "f1": 1.0}


def test_ner_string_f1_empty_pred(spark):
    pred = spark.createDataFrame([], "mention string")
    gold = spark.createDataFrame([("x",)], ["surface"])
    m = ner_string_f1(pred, gold)
    assert (m["tp"], m["fp"], m["fn"]) == (0, 0, 1)
    assert m["precision"] == 1.0 and m["recall"] == 0.0
