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


def test_nested_projection_input_does_not_crash(spark):
    """Regression: Spark 4.1 snapshots plan constraints into checkpoint
    originConstraints; with a subquery-shaped edge input those can
    reference pruned attributes, and every later star-round union died
    in constraint rewriting (NoSuchElementException: key not found).
    _ckpt now creates checkpoints with constraint propagation off."""
    base = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["u", "v"]
    )
    base.createOrReplaceTempView("cc_nested_edges")
    # the crashing shape: outer projection wrapping a DISTINCT subquery
    nested = spark.sql("""
        SELECT u, v, length(u) + length(v) AS w FROM (
          SELECT DISTINCT u, v FROM cc_nested_edges)
    """)
    comp = {
        r["node"]: r["component"]
        for r in connected_components(nested, src="u", dst="v").collect()
    }
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # the session conf is restored after the loop
    assert (
        spark.conf.get("spark.sql.constraintPropagation.enabled") == "true"
    )


class TestComponentMetrics:
    def _metrics(self, spark, edges, comps=None, weight=None):
        from kawa_spark.operators.cc import component_metrics

        cols = ["u", "v"] + (["w"] if weight else [])
        df = spark.createDataFrame(edges, cols)
        if comps is None:
            comps = connected_components(df, src="u", dst="v")
        return {
            r["component"]: r
            for r in component_metrics(
                df, comps, src="u", dst="v", weight=weight
            ).collect()
        }

    def test_clique_density_is_one(self, spark):
        clique = [
            (f"a{i}", f"a{j}", 1) for i in range(4) for j in range(i + 1, 4)
        ]
        m = self._metrics(spark, clique, weight="w")
        row = m["a0"]
        assert row["n_nodes"] == 4 and row["n_edges"] == 6
        assert row["density"] == 1.0
        assert row["min_w"] == row["max_w"] == 1 and row["sum_w"] == 6

    def test_chain_density_and_weakest_edge(self, spark):
        chain = [(f"n{i}", f"n{i+1}", 10 - i) for i in range(4)]
        m = self._metrics(spark, chain, weight="w")
        row = m["n0"]
        assert row["n_nodes"] == 5 and row["n_edges"] == 4
        # chain density = 2(n-1)/(n(n-1)) = 2/n
        assert row["density"] == pytest.approx(2 / 5)
        assert row["min_w"] == 7 and row["max_w"] == 10
        assert row["sum_w"] == 34

    def test_singleton_component_null_density(self, spark):
        edges = spark.createDataFrame([("a", "b")], ["u", "v"])
        comps = spark.createDataFrame(
            [("a", "a"), ("b", "a"), ("lone", "lone")],
            ["node", "component"],
        )
        from kawa_spark.operators.cc import component_metrics

        m = {
            r["component"]: r
            for r in component_metrics(edges, comps).collect()
        }
        assert m["lone"]["n_edges"] == 0
        assert m["lone"]["density"] is None
        assert m["a"]["n_edges"] == 1 and m["a"]["density"] == 1.0

    def test_edge_totals_partition_invariant(self, spark):
        import random

        rng = random.Random(7)
        edges = [
            (f"n{rng.randrange(40)}", f"m{rng.randrange(40)}", rng.randrange(9))
            for _ in range(200)
        ]
        edges = list({(u, v): (u, v, w) for u, v, w in edges}.values())
        m1 = self._metrics(spark, edges, weight="w")
        df = spark.createDataFrame(edges, ["u", "v", "w"]).repartition(17)
        comps = connected_components(df, src="u", dst="v")
        from kawa_spark.operators.cc import component_metrics

        m2 = {
            r["component"]: r
            for r in component_metrics(
                df, comps, src="u", dst="v", weight="w"
            ).collect()
        }
        assert set(m1) == set(m2)
        for k in m1:
            for f in ("n_nodes", "n_edges", "density", "min_w", "max_w",
                      "sum_w"):
                assert m1[k][f] == m2[k][f], (k, f)
        assert sum(r["n_edges"] for r in m1.values()) == len(edges)
