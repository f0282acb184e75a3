"""Connected-components correctness on crafted graphs (SURVEY.md §5.1)."""

import pytest

from kawa_spark.operators.cc import connected_components


def run_cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def groups(assign: dict) -> set[frozenset]:
    inv = {}
    for n, c in assign.items():
        inv.setdefault(c, set()).add(n)
        inv[c].add(c)
    return {frozenset(v) for v in inv.values()}


def test_chain(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(9)]
    comp = run_cc(spark, edges)
    assert set(comp.values()) == {"n0"}
    assert len(comp) == 10


def test_star(spark):
    edges = [("hub", f"leaf{i}") for i in range(20)]
    comp = run_cc(spark, edges)
    assert len(set(comp.values())) == 1
    assert len(comp) == 21


def test_two_cliques_and_bridge(spark):
    a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    comp = run_cc(spark, a + b)
    assert groups(comp) == {
        frozenset({f"a{i}" for i in range(4)}),
        frozenset({f"b{i}" for i in range(4)}),
    }
    comp2 = run_cc(spark, a + b + [("a3", "b0")])
    assert len(groups(comp2)) == 1


def test_component_id_is_min(spark):
    comp = run_cc(spark, [("z", "m"), ("m", "c"), ("q", "c")])
    assert set(comp.values()) == {"c"}


def test_self_loops_and_dups_ignored(spark):
    comp = run_cc(spark, [("x", "x"), ("x", "y"), ("y", "x"), ("x", "y")])
    assert comp == {"y": "x"} or comp == {"x": "x", "y": "x"}
