"""S8: word-table CRUD as set operations (reference: sqlite row store,
ontology_kb.py:468,682,860,1027)."""

import pytest

from kawa_spark.operators.wordstore import delete_keys, lookup, upsert

SCHEMA = "word string, label string, cnt int"


@pytest.fixture()
def table(spark):
    return spark.createDataFrame(
        [("alpha", "ORG", 1), ("beta", "GPE", 2), ("gamma", None, 3)], SCHEMA
    )


class TestWordStore:
    def test_upsert_update_insert_keep(self, spark, table):
        updates = spark.createDataFrame(
            [("alpha", "PRODUCT", None), ("delta", "EVENT", 4)], SCHEMA
        )
        got = {r.word: (r.label, r.cnt) for r in upsert(table, updates).collect()}
        assert got["alpha"] == ("PRODUCT", 1)  # update wins; null keeps old
        assert got["delta"] == ("EVENT", 4)    # insert
        assert got["beta"] == ("GPE", 2)       # untouched row persists
        assert len(got) == 4

    def test_upsert_schema_mismatch_rejected(self, spark, table):
        bad = spark.createDataFrame([("x", "y")], "word string, label string")
        with pytest.raises(ValueError, match="schema"):
            upsert(table, bad)

    def test_delete_and_lookup(self, spark, table):
        keys = spark.createDataFrame([("alpha",), ("zzz",)], "word string")
        left = {r.word for r in delete_keys(table, keys).collect()}
        assert left == {"beta", "gamma"}
        found = {r.word for r in lookup(table, keys).collect()}
        assert found == {"alpha"}
