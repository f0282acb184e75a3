"""Eval metrics: NER string-match F1 (single-job fold), pairwise F1
shapes, and B-cubed (kawa_spark/eval.py; reference harness
/root/reference/eval.py:173-199)."""

import pytest

from kawa_spark.eval import bcubed, ner_string_f1


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
