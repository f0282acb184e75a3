"""fuse_clusters survivorship rules: determinism, NULL handling,
majority-only cluster universe."""

import datetime

import pytest

from kawa_spark.operators.fusion import fuse_clusters


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "cid long, name string, ts timestamp, score double"
    )


TS = datetime.datetime(2026, 1, 1)
TS2 = datetime.datetime(2026, 1, 2)


def test_rules_and_ties(spark):
    df = _rows(
        spark,
        [
            # cluster 1: 'b' modal (2 votes); 'a'/'b' tie at ts2 -> 'b'
            # wins latest bytewise; 'ccc' longest
            (1, "b", TS, 1.0),
            (1, "b", TS, 2.0),
            (1, "a", TS2, 3.0),
            (1, "ccc", TS2, 0.5),
            # cluster 2: modal tie a/b (1 each) -> bytewise-greatest 'b'
            (2, "a", TS, 1.0),
            (2, "b", TS, 1.0),
        ],
    )
    got = {
        r["cid"]: r.asDict()
        for r in fuse_clusters(
            df,
            "cid",
            {
                "modal": ("majority", "name"),
                "latest": ("latest", "name", "ts"),
                "longest": ("longest", "name"),
                "first_ts": ("min", "ts"),
                "best": ("max", "score"),
            },
        ).collect()
    }
    assert got[1]["modal"] == "b"
    assert got[1]["latest"] == "ccc"  # ts tie at TS2 -> bytewise max
    assert got[1]["longest"] == "ccc"
    assert got[1]["first_ts"] == TS
    assert got[1]["best"] == 3.0
    assert got[2]["modal"] == "b"


def test_nulls_never_win(spark):
    df = _rows(
        spark,
        [
            (1, None, TS2, 1.0),  # null name at the latest ts
            (1, "x", TS, 2.0),
            (1, None, TS, 3.0),
            (2, None, TS, 1.0),  # cluster with only null names
        ],
    )
    got = {
        r["cid"]: r.asDict()
        for r in fuse_clusters(
            df,
            "cid",
            {
                "modal": ("majority", "name"),
                "latest": ("latest", "name", "ts"),
                "longest": ("longest", "name"),
            },
        ).collect()
    }
    assert got[1] == {"cid": 1, "modal": "x", "latest": "x", "longest": "x"}
    assert got[2] == {"cid": 2, "modal": None, "latest": None, "longest": None}


def test_majority_only_keeps_all_clusters(spark):
    df = _rows(spark, [(1, "a", TS, 1.0), (2, None, TS, 1.0)])
    got = {
        r["cid"]: r["modal"]
        for r in fuse_clusters(df, "cid", {"modal": ("majority", "name")}).collect()
    }
    assert got == {1: "a", 2: None}


def test_no_rules_raises(spark):
    df = _rows(spark, [(1, "a", TS, 1.0)])
    with pytest.raises(ValueError):
        fuse_clusters(df, "cid", {})
    with pytest.raises(ValueError):
        fuse_clusters(df, "cid", {"x": ("mode", "name")})


def test_determinism_across_partitionings(spark):
    rows = [
        (i % 5, f"n{(i * 7) % 11}", TS, float(i % 13)) for i in range(200)
    ]
    rules = {
        "modal": ("majority", "name"),
        "longest": ("longest", "name"),
        "best": ("max", "score"),
    }
    a = {
        tuple(r) for r in fuse_clusters(_rows(spark, rows), "cid", rules).collect()
    }
    b = {
        tuple(r)
        for r in fuse_clusters(
            _rows(spark, rows).repartition(13, "name"), "cid", rules
        ).collect()
    }
    assert a == b


def test_er_fusion_invariants(spark):
    """Golden records over the real pipeline output: exactly one row
    per cluster, the canonical norm is a member norm, mention counts
    reconcile, and a second run is byte-identical (determinism)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    golden = e.queries()["er_fusion"](spark, sf).collect()
    clusters = e._er_clusters_df(spark, sf).collect()

    by_cluster: dict[str, list] = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert len(golden) == len(by_cluster)
    for g in golden:
        members = by_cluster[g["cluster_id"]]
        assert g["n_mentions"] == len(members)
        assert g["canonical_norm"] in {m["norm"] for m in members}
        assert g["first_url"] == min(m["url"] for m in members)

    again = e.queries()["er_fusion"](spark, sf).collect()
    assert [tuple(r) for r in golden] == [tuple(r) for r in again]
