"""Word-table CRUD (S8) — the reference's sqlite row store as batch
table operations.

The reference keeps per-word records in sqlite with WAL and batched
``IN (...)`` lookups (get/set/del_word,
/root/reference/ontology/ontology_kb.py:468,682,860,1027). A
distributed engine replaces point CRUD with SET operations over a keyed
table — the idiomatic shape is ``MERGE INTO`` on Iceberg/Delta; this
sandbox ships neither, so ``upsert``/``delete_keys`` implement the
identical semantics with a full-outer join (and run unchanged on a real
lakehouse by swapping the save step for MERGE). All operations are
pure: they return the new table; durability is the caller's parquet/
Iceberg write (pipeline checkpoint pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(table: DataFrame, updates: DataFrame, key: str = "word") -> DataFrame:
    """MERGE semantics: matched rows take the update's non-null column
    values; unmatched update rows insert; unmatched table rows persist.
    Both sides must share a schema."""
    cols = [c for c in table.columns if c != key]
    if set(table.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: {sorted(table.columns)} vs {sorted(updates.columns)}"
        )
    t = table.alias("t")
    u = updates.alias("u")
    merged = t.join(u, key, "full_outer").select(
        F.col(key),
        *[
            F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
            for c in cols
        ],
    )
    return merged


def delete_keys(table: DataFrame, keys: DataFrame, key: str = "word") -> DataFrame:
    """del_word as an anti-join (the batched ``IN (...)`` delete)."""
    return table.join(keys.select(key), key, "left_anti")


def lookup(table: DataFrame, keys: DataFrame, key: str = "word") -> DataFrame:
    """Batched get_word: semi-filtered scan (the <=999-id IN batches
    become one broadcast-or-shuffle join, whichever Catalyst picks)."""
    return table.join(keys.select(key), key, "left_semi")
