"""Semantics pin for dup_span_coverage (exact-substring dedup coverage).

The DuckDB oracle proves Spark and DuckDB agree on the SQL; this test
proves the SQL itself means what the docstring claims, by recomputing
per-doc duplicated-token coverage with a brute-force pure-Python
reference over the same sf0.001 documents table: sliding 4-gram
windows, a window duplicated iff it occurs in >=2 distinct docs,
coverage = exact union of the duplicated [s, s+3] position intervals
(computed here position-by-position, no interval arithmetic to share a
bug with the query's running-max formulation).
"""

from __future__ import annotations

import sys
from collections import defaultdict

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
K = 4


def _brute_force(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int]]:
    toks = {d: t.lower().split(" ") for d, t in docs}
    toks = {d: t for d, t in toks.items() if len(t) >= K}
    owners: dict[tuple[str, ...], set[int]] = defaultdict(set)
    for d, t in toks.items():
        for i in range(len(t) - K + 1):
            owners[tuple(t[i : i + K])].add(d)
    out: dict[int, tuple[int, int]] = {}
    for d, t in toks.items():
        covered = [False] * len(t)
        for i in range(len(t) - K + 1):
            if len(owners[tuple(t[i : i + K])]) >= 2:
                for j in range(i, i + K):
                    covered[j] = True
        if any(covered):
            out[d] = (len(t), sum(covered))
    return out


def test_matches_brute_force_reference(spark):
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    expected = _brute_force(docs)
    assert expected, "fixture must contain cross-doc duplicated spans"
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in entry.queries()["dup_span_coverage"](spark, SF_DIR).collect()
    }
    assert got == expected
    # ratio column is derived, spot-check one row
    row = entry.queries()["dup_span_coverage"](spark, SF_DIR).first()
    n, dup = got[row["doc_id"]]
    assert abs(row["dup_ratio"] - dup / n) < 1e-6


def test_within_doc_repeats_do_not_count(spark):
    """A window repeated only inside ONE doc must not mark coverage —
    pins the MIN(doc_id) <> MAX(doc_id) distinct-docs test."""
    docs = [(1, "a b c d x a b c d"), (2, "q r s t u v w x")]
    assert _brute_force(docs) == {}
