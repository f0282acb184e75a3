"""Star clustering (star_clusters) structural invariants.

The DuckDB oracle pins exact output equality; these tests pin the
properties that make star clustering the anti-chain-merge repair
operator: diameter <= 2, centers are local degree maxima, singleton
fallback for orphans.
"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.001"


def _result(spark):
    rows = entry._q_star_clusters(spark, SF).collect()
    return {r["node"]: (r["star"], r["is_center"]) for r in rows}


def _graph(spark):
    entry._views(spark, SF)
    edges = spark.sql(entry._STAR_EDGES_SQL).collect()
    nbrs: dict[int, set[int]] = {}
    for r in edges:
        nbrs.setdefault(r["u"], set()).add(r["v"])
        nbrs.setdefault(r["v"], set()).add(r["u"])
    return nbrs


def test_partition_and_center_invariants(spark):
    got = _result(spark)
    nbrs = _graph(spark)
    # every graph node clustered exactly once (dict built from rows —
    # confirm no node was emitted twice by both paths)
    assert set(got) == set(nbrs)
    rows = entry._q_star_clusters(spark, SF).collect()
    assert len(rows) == len(got)

    centers = {n for n, (s, c) in got.items() if c == 1}
    for node, (star, is_center) in got.items():
        if is_center == 1:
            # centers label themselves and are local degree maxima
            # under the (degree, smaller-id) order
            assert star == node
            d = len(nbrs[node])
            for u in nbrs[node]:
                du = len(nbrs[u])
                assert (du, -u) < (d, -node) or (du < d)
        elif star != node:
            # attached satellite: star must be a neighboring center —
            # hence every cluster has diameter <= 2 via its center
            assert star in centers
            assert star in nbrs[node]
        else:
            # orphan singleton: no center anywhere in the neighborhood
            assert not (nbrs[node] & centers)


def test_no_center_adjacent_to_center(spark):
    got = _result(spark)
    nbrs = _graph(spark)
    centers = {n for n, (s, c) in got.items() if c == 1}
    for c in centers:
        # two adjacent local maxima cannot both be undominated
        assert not (nbrs[c] & centers)


def test_deterministic(spark):
    a = sorted(map(tuple, entry._q_star_clusters(spark, SF).collect()))
    b = sorted(map(tuple, entry._q_star_clusters(spark, SF).collect()))
    assert a == b
