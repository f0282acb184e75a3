"""Eval metrics: NER string-match F1 (single-job fold) and pairwise F1
shapes (kawa_spark/eval.py; reference harness /root/reference/eval.py:173-199)."""

import pytest

from kawa_spark.eval import ner_string_f1


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


def test_ner_string_f1_empty_pred(spark):
    pred = spark.createDataFrame([], "mention string")
    gold = spark.createDataFrame([("x",)], ["surface"])
    m = ner_string_f1(pred, gold)
    assert (m["tp"], m["fp"], m["fn"]) == (0, 0, 1)
    assert m["precision"] == 1.0 and m["recall"] == 0.0
