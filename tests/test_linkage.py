"""Fellegi-Sunter linkage + cannot-link constrained clustering."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from kawa_spark.operators.linkage import (
    FSWeights,
    agreement_vectors,
    fellegi_sunter_em,
    fit_fs_weights,
    fs_pair_weights,
    fs_weight_expr,
    pattern_counts,
)
from kawa_spark.operators.cc import (
    connected_components,
    constrained_components,
    constraint_violations,
    repair_components,
)


def _expected_counts(m, u, p, total):
    """Exact expected pattern counts under the FS independence model."""
    K = len(m)
    out = []
    for gamma in itertools.product([0, 1], repeat=K):
        pm, pu = p, 1.0 - p
        for k in range(K):
            pm *= m[k] if gamma[k] else 1.0 - m[k]
            pu *= u[k] if gamma[k] else 1.0 - u[k]
        out.append(("".join(map(str, gamma)), round(total * (pm + pu))))
    return out


class TestEM:
    def test_recovers_true_parameters(self):
        m, u, p = [0.92, 0.85, 0.95], [0.08, 0.2, 0.02], 0.15
        counts = _expected_counts(m, u, p, 1_000_000)
        w = fellegi_sunter_em(counts, ["a", "b", "c"], n_iter=200)
        for k in range(3):
            assert abs(w.m[k] - m[k]) < 0.03, (k, w.m)
            assert abs(w.u[k] - u[k]) < 0.03, (k, w.u)
        assert abs(w.p_match - p) < 0.03

    def test_deterministic(self):
        counts = _expected_counts([0.9, 0.8], [0.1, 0.3], 0.2, 10_000)
        w1 = fellegi_sunter_em(counts, ["a", "b"])
        w2 = fellegi_sunter_em(counts, ["a", "b"])
        assert w1 == w2

    def test_rejects_bad_pattern_length(self):
        with pytest.raises(ValueError):
            fellegi_sunter_em([("01", 5)], ["a", "b", "c"])

    def test_rejects_empty(self):
        with pytest.raises(ValueError):
            fellegi_sunter_em([], ["a"])

    def test_agree_weight_positive_for_informative_field(self):
        counts = _expected_counts([0.95], [0.05], 0.1, 100_000)
        w = fellegi_sunter_em(counts, ["a"], n_iter=100)
        assert w.agree_weight(0) > 0 > w.disagree_weight(0)


class TestSparkSide:
    def _vectors(self, spark):
        rows = [
            ("x1", "y1", "Acme", "Acme", 10, 10),
            ("x2", "y2", "Acme", "Acme", 10, 12),
            ("x3", "y3", "Acme", "Bolt", 10, 10),
            ("x4", "y4", "Acme", "Bolt", 10, 12),
            ("x5", "y5", "Acme", "Acme", 10, 10),
        ]
        df = spark.createDataFrame(
            rows, "id_a string, id_b string, na string, nb string, sa int, sb int"
        )
        return agreement_vectors(
            df,
            {
                "name_eq": F.col("na") == F.col("nb"),
                "size_eq": F.col("sa") == F.col("sb"),
            },
        )

    def test_pattern_encoding_sorted_field_order(self, spark):
        vec = self._vectors(spark)
        got = {r["id_a"]: r["pattern"] for r in vec.collect()}
        # sorted field order: name_eq then size_eq
        assert got == {"x1": "11", "x2": "10", "x3": "01", "x4": "00", "x5": "11"}

    def test_pattern_counts_bounded(self, spark):
        pc = {r["pattern"]: r["n_pairs"] for r in pattern_counts(self._vectors(spark)).collect()}
        assert pc == {"11": 2, "10": 1, "01": 1, "00": 1}

    def test_weight_expr_matches_python(self, spark):
        vec = self._vectors(spark)
        w = FSWeights(("name_eq", "size_eq"), (0.9, 0.8), (0.1, 0.3), 0.2)
        got = {
            r["id_a"]: r["fs_weight"] for r in fs_pair_weights(vec, w).collect()
        }
        def pyw(bits):
            tot = 0.0
            for k, b in enumerate(bits):
                tot += (
                    math.log2(w.m[k] / w.u[k])
                    if b
                    else math.log2((1 - w.m[k]) / (1 - w.u[k]))
                )
            return tot
        assert got["x1"] == pytest.approx(pyw((1, 1)))
        assert got["x2"] == pytest.approx(pyw((1, 0)))
        assert got["x4"] == pytest.approx(pyw((0, 0)))

    def test_fit_on_spark_matches_driver_em(self, spark):
        vec = self._vectors(spark)
        fitted = fit_fs_weights(vec, ["name_eq", "size_eq"], n_iter=30)
        rows = [
            (r["pattern"], r["n_pairs"]) for r in pattern_counts(vec).collect()
        ]
        direct = fellegi_sunter_em(rows, ["name_eq", "size_eq"], n_iter=30)
        assert fitted == direct

    def test_weight_expr_validates_lengths(self):
        with pytest.raises(ValueError):
            fs_weight_expr(["a", "b"], [0.9], [0.1])

    def test_em_sql_matches_python_em_two_iters(self, spark):
        """The declarative fs_em_weights plan (2 unrolled EM iterations
        in SQL) must reproduce fellegi_sunter_em(n_iter=2) on the same
        pattern table — same init, same clamps, pure-plan vs driver
        loop."""
        import __spark_entry__ as entry

        sf_dir = "/root/testdata/sf0.001"
        entry._views(spark, sf_dir)
        vec = entry._fs_agreement_vec(spark)
        rows = [
            (r["pattern"], r["n_pairs"]) for r in pattern_counts(vec).collect()
        ]
        direct = fellegi_sunter_em(rows, list(entry._FS_FIELDS), n_iter=2)
        got = {
            r["field"]: r
            for r in entry._q_fs_em_weights(spark, sf_dir).collect()
        }
        assert set(got) == set(entry._FS_FIELDS)
        for k, f in enumerate(entry._FS_FIELDS):
            assert got[f]["m"] == pytest.approx(direct.m[k], abs=1e-6)
            assert got[f]["u"] == pytest.approx(direct.u[k], abs=1e-6)
            assert got[f]["p_match"] == pytest.approx(direct.p_match, abs=1e-6)
            assert got[f]["w_agree"] == pytest.approx(
                direct.agree_weight(k), abs=1e-5
            )
            assert got[f]["w_disagree"] == pytest.approx(
                direct.disagree_weight(k), abs=1e-5
            )


class TestFsMissing:
    def _run(self, spark, parts):
        import __spark_entry__ as entry

        spark.createDataFrame(
            parts,
            "p_partkey BIGINT, p_name STRING, p_brand STRING,"
            " p_size INT, p_type STRING",
        ).createOrReplaceTempView("part")
        rows = spark.sql(entry._fs_missing_sql()).collect()
        return {r["pattern"]: r for r in rows}

    def test_missing_level_contributes_zero(self, spark):
        import math

        import __spark_entry__ as entry

        # partkey 7 -> brand missing (injected); sizes 10=10 agree;
        # types differ -> pattern '120'
        got = self._run(
            spark,
            [
                (7, "a b", "B1", 10, "t1"),
                (8, "a b", "B1", 10, "t2"),
            ],
        )
        assert set(got) == {"120"}
        terms = entry._fs_weight_terms()
        expect = terms[2][0] + terms[3][1]  # size agree + type disagree
        assert got["120"]["fs_weight"] == pytest.approx(
            round(expect, 4), abs=1e-9
        )
        assert not math.isnan(got["120"]["fs_weight"])

    def test_full_agreement_pattern(self, spark):
        import __spark_entry__ as entry

        got = self._run(
            spark,
            [
                (1, "a b", "B1", 10, "t1"),
                (2, "a b", "B1", 10, "t1"),
            ],
        )
        assert set(got) == {"222"}
        terms = entry._fs_weight_terms()
        expect = terms[0][0] + terms[2][0] + terms[3][0]
        assert got["222"]["fs_weight"] == pytest.approx(
            round(expect, 4), abs=1e-9
        )


class TestConstrainedCC:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "u string, v string")

    def test_direct_edge_dropped_splits_component(self, spark):
        # chain a-b-c; cannot-link (b,c) removes the only bridge
        e = self._edges(spark, [("a", "b"), ("b", "c")])
        cl = self._edges(spark, [("c", "b")])  # reversed orientation on purpose
        comp = {r["node"]: r["component"] for r in
                constrained_components(e, cl).collect()}
        assert comp.get("a") == "a" and comp.get("b") == "a"
        assert "c" not in comp  # c became a singleton (non-singletons only)

    def test_indirect_path_survives_and_is_audited(self, spark):
        # triangle a-b, b-c, a-c with cannot-link (a,c): the direct edge
        # goes, but a-b-c still connects them -> violation audit fires
        e = self._edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        cl = self._edges(spark, [("a", "c")])
        comps = constrained_components(e, cl)
        viol = constraint_violations(comps, cl).collect()
        assert len(viol) == 1 and viol[0]["violated"] is True
        assert viol[0]["comp_u"] == viol[0]["comp_v"] == "a"

    def test_violations_singleton_fallback(self, spark):
        e = self._edges(spark, [("a", "b")])
        cl = self._edges(spark, [("x", "y")])  # neither node clustered
        comps = connected_components(e, src="u", dst="v")
        viol = constraint_violations(comps, cl).collect()
        assert viol[0]["violated"] is False
        assert viol[0]["comp_u"] == "x" and viol[0]["comp_v"] == "y"

    def test_repair_splits_violated_component(self, spark):
        # path a-b-c-d with cannot-link (a,d); scores favor keeping
        # (a,b) and (c,d): greedy drops the middle (b,c) merge
        e = spark.createDataFrame(
            [("a", "b", 0.9), ("b", "c", 0.5), ("c", "d", 0.8)],
            "u string, v string, s double",
        )
        cl = self._edges(spark, [("a", "d")])
        comps = connected_components(e, src="u", dst="v")
        rep = {r["node"]: r["component"] for r in
               repair_components(e, comps, cl, score="s").collect()}
        assert rep == {"a": "a", "b": "a", "c": "c", "d": "c"}

    def test_repair_passthrough_untouched_components(self, spark):
        e = self._edges(spark, [("a", "b"), ("x", "y")])
        cl = self._edges(spark, [("a", "b")])
        comps = connected_components(e, src="u", dst="v")
        rep = {r["node"]: r["component"] for r in
               repair_components(e, comps, cl).collect()}
        # (x, y) untouched; (a, b) split apart
        assert rep["x"] == "x" and rep["y"] == "x"
        assert rep["a"] != rep["b"]

    def test_repair_never_coclusters_cannot_link(self, spark):
        # dense K4 with two constraints; invariant holds whatever the split
        nodes = ["a", "b", "c", "d"]
        e = self._edges(
            spark, [(x, y) for x in nodes for y in nodes if x < y]
        )
        cl = self._edges(spark, [("a", "b"), ("c", "d")])
        comps = connected_components(e, src="u", dst="v")
        rep = {r["node"]: r["component"] for r in
               repair_components(e, comps, cl).collect()}
        assert rep["a"] != rep["b"] and rep["c"] != rep["d"]
        # deterministic across reruns
        rep2 = {r["node"]: r["component"] for r in
                repair_components(e, comps, cl).collect()}
        assert rep == rep2


class TestReviewRegressions:
    """Pins for the round-4 session-6 review findings."""

    def test_repair_ignores_cross_component_constraints(self, spark):
        # components X={a,b,c} (violated via the indirect a-b-c path
        # after the direct a-c edge is dropped) and Y={m,z}; the extra
        # constraint (a,z) straddles X and Y and must NOT inject z into
        # X's repair group (which would emit duplicate conflicting rows)
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("m", "z")],
            "u string, v string",
        )
        cl = spark.createDataFrame(
            [("a", "c"), ("a", "z")], "u string, v string"
        )
        comps = constrained_components(e, cl)
        rep = repair_components(e, comps, cl).collect()
        by_node: dict = {}
        for r in rep:
            by_node.setdefault(r["node"], set()).add(r["component"])
        # exactly one component per node — no duplicates, no conflicts
        assert all(len(v) == 1 for v in by_node.values()), by_node
        assert by_node["z"] == {"m"} and by_node["m"] == {"m"}
        # the real violation in X was repaired
        assert by_node["a"] != by_node["c"]

    def test_fs_match_edges_empty_stream(self, spark):
        from kawa_spark.operators.scoring import fs_match_edges

        empty = spark.createDataFrame(
            [],
            "id_a string, id_b string, block_key string,"
            " jw double, lev_sim double, cos double",
        )
        out = fs_match_edges(empty)
        assert out.columns == ["id_a", "id_b", "score", "block_key"]
        assert out.count() == 0

    def test_weight_expr_rejects_unsorted_fields(self):
        with pytest.raises(ValueError, match="sorted"):
            fs_weight_expr(["size_eq", "brand_eq"], [0.9, 0.8], [0.1, 0.2])

    def test_em_rejects_unsorted_fields(self):
        with pytest.raises(ValueError, match="sorted"):
            fellegi_sunter_em([("10", 5), ("01", 5)], ["b", "a"])
