"""Refined Fellegi-Sunter scoring: missing-aware three-level weights
and value-specific (frequency-based) agreement weights, wired into the
pipeline via cfg.fs_missing_aware / cfg.fs_value_specific (VERDICT r04
ask #4). The analytic-query counterparts are fs_missing_weights /
value_specific_weights in __spark_entry__; these tests pin that the
pipeline-side operators compute the same math, including a pipeline-
level independent recompute of every edge weight in pandas."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kawa_spark.config import PipelineConfig
from kawa_spark.operators.linkage import (
    _clamp,
    fellegi_sunter_em,
    fellegi_sunter_em_levels,
)
from kawa_spark.operators.scoring import fs_match_edges
from kawa_spark.pipeline import ERPipeline
from kawa_spark.testgen import corpus_to_pandas, generate


@pytest.fixture(scope="module")
def corpus():
    return generate(n_docs=80, n_entities=20, seed=7)


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    docs, _, _, _ = corpus_to_pandas(corpus)
    return spark.createDataFrame(docs[["url", "text", "lang"]])


# ---------------------------------------------------------------- EM ---


class TestLevelEM:
    def test_reduces_to_binary_on_complete_data(self):
        # same table expressed binary ("01") and as levels ("02"):
        # fitted parameters must be bit-identical
        binary = [("11", 40), ("10", 15), ("01", 25), ("00", 920)]
        # binary "1" -> level "2" (agree), binary "0" stays "0"
        lvls = [
            ("".join("2" if c == "1" else "0" for c in p), n)
            for p, n in binary
        ]
        a = fellegi_sunter_em(binary, ["f1", "f2"], n_iter=40)
        b = fellegi_sunter_em_levels(lvls, ["f1", "f2"], n_iter=40)
        assert a.m == b.m and a.u == b.u and a.p_match == b.p_match

    def test_missing_rows_leave_field_estimates_conditional(self):
        # adding pure-missing rows for f2 must not change f2's m/u
        # (they carry no information about f2) while still counting
        # toward prevalence
        base = [("22", 40), ("20", 15), ("02", 25), ("00", 920)]
        with_missing = base + [("21", 10), ("01", 30)]
        a = fellegi_sunter_em_levels(base, ["f1", "f2"], n_iter=1)
        b = fellegi_sunter_em_levels(with_missing, ["f1", "f2"], n_iter=1)
        # one iteration from identical init: the f2 M-step sums only
        # observed rows; the new rows shift f1/prevalence, not the
        # conditional direction of f2 — check f2 stays in (0, 1) and
        # the never-observed-field guard works
        assert 0 < b.m[1] < 1 and 0 < b.u[1] < 1
        assert a.fields == b.fields

    def test_never_observed_field_keeps_prior(self):
        w = fellegi_sunter_em_levels(
            [("21", 50), ("01", 50)], ["f1", "f2"], n_iter=20,
            m0=0.9, u0=0.1,
        )
        assert w.m[1] == pytest.approx(0.9)
        assert w.u[1] == pytest.approx(0.1)

    def test_rejects_bad_levels(self):
        with pytest.raises(ValueError):
            fellegi_sunter_em_levels([("3", 1)], ["f1"])


# ------------------------------------------------------- operator-level ---


def _mk_scored(spark, rows):
    return spark.createDataFrame(
        rows,
        "id_a string, id_b string, block_key string, norm_a string,"
        " norm_b string, jw double, lev_sim double, cos double",
    )


class TestMissingAware:
    def test_missing_cos_scores_between_agree_and_disagree(self, spark):
        cfg = PipelineConfig(
            fs_scoring=True, fs_missing_aware=True, fs_threshold=-1e9
        )
        rows = []
        # population: matches agree on everything, non-matches on
        # nothing; three probe pairs differ ONLY in the cos slot
        for i in range(30):
            rows.append((f"m{i}", f"m{i}x", "b", "aa_bb", "aa_bb",
                         0.95, 0.9, 0.95))
        for i in range(300):
            rows.append((f"n{i}", f"n{i}x", "b", "aa_bb", "cc_dd",
                         0.3, 0.2, 0.1))
        rows.append(("pA", "pAx", "b", "aa_bb", "aa_bb", 0.95, 0.9, 0.95))
        rows.append(("pM", "pMx", "b", "aa_bb", "aa_bb", 0.95, 0.9, None))
        rows.append(("pD", "pDx", "b", "aa_bb", "aa_bb", 0.95, 0.9, 0.1))
        out = {
            r["id_a"]: r["score"]
            for r in fs_match_edges(_mk_scored(spark, rows), cfg).collect()
        }
        assert out["pD"] < out["pM"] < out["pA"]

    def test_without_flag_missing_equals_disagree(self, spark):
        cfg = PipelineConfig(
            fs_scoring=True, fs_value_specific=True, fs_threshold=-1e9
        )
        surfaces = spark.createDataFrame(
            [("aa_bb",), ("cc_dd",), ("ee_ff",)], "norm string"
        )
        rows = [
            ("pM", "pMx", "b", "aa_bb", "aa_bb", 0.95, 0.9, None),
            ("pD", "pDx", "b", "aa_bb", "aa_bb", 0.95, 0.9, 0.1),
            ("n0", "n0x", "b", "aa_bb", "cc_dd", 0.3, 0.2, 0.9),
        ]
        out = {
            r["id_a"]: r["score"]
            for r in fs_match_edges(
                _mk_scored(spark, rows), cfg, surfaces=surfaces
            ).collect()
        }
        # refined path without fs_missing_aware: missing cos folds into
        # the disagree branch, exactly like the legacy binary encoding
        assert out["pM"] == pytest.approx(out["pD"])


class TestValueSpecific:
    def test_rare_token_agreement_outweighs_common(self, spark):
        cfg = PipelineConfig(
            fs_scoring=True, fs_value_specific=True, fs_threshold=-1e9
        )
        # surface vocabulary: 'zq' appears once, 'aa' five times
        surf_rows = [("zq_one",)] + [(f"aa_v{i}",) for i in range(5)] + [
            ("cc_dd",), ("ee_ff",)
        ]
        surfaces = spark.createDataFrame(surf_rows, "norm string")
        rows = [
            ("rare", "rx", "b", "zq_one", "zq_two", 0.9, 0.8, 0.9),
            ("common", "cx", "b", "aa_v1", "aa_v2", 0.9, 0.8, 0.9),
            ("n0", "n0x", "b", "aa_v1", "cc_dd", 0.3, 0.2, 0.1),
            ("n1", "n1x", "b", "ee_ff", "cc_dd", 0.3, 0.2, 0.1),
        ]
        out = {
            r["id_a"]: r["score"]
            for r in fs_match_edges(
                _mk_scored(spark, rows), cfg, surfaces=surfaces
            ).collect()
        }
        assert out["rare"] > out["common"]
        # closed form: the two probes share every non-token field, so
        # the gap is exactly w_rare - w_common
        # = log2(m(N-1)/0.5) - log2(m(N-1)/(5-1))  (singleton clamp)
        assert out["rare"] - out["common"] == pytest.approx(
            math.log2(4.0 / 0.5), abs=1e-9
        )

    def test_requires_surfaces(self, spark):
        cfg = PipelineConfig(fs_scoring=True, fs_value_specific=True)
        with pytest.raises(ValueError, match="surfaces"):
            fs_match_edges(_mk_scored(spark, []), cfg)


# ------------------------------------------------------- pipeline-level ---


class TestRefinedPipeline:
    def test_flags_require_fs_scoring(self, spark, corpus):
        with pytest.raises(ValueError, match="fs_scoring"):
            ERPipeline(
                spark,
                word2ner=[list(r) for r in corpus.word2ner],
                cfg=PipelineConfig(fs_missing_aware=True),
            )

    def test_edges_match_independent_pandas_recompute(
        self, spark, corpus, docs_df
    ):
        """The contract test (VERDICT ask #4): run the flagship pipeline
        with both refinements on, then recompute EVERY edge weight
        independently in pandas — pattern counts, three-level EM, the
        per-field weight arithmetic, and the value-specific override
        from token frequencies over the distinct surface forms — and
        compare to the Spark-side codegen scores pair by pair."""
        cfg = PipelineConfig(
            fs_scoring=True,
            fs_missing_aware=True,
            fs_value_specific=True,
            fs_threshold=-1e9,  # keep every pair so the sets must match
        )
        pipe = ERPipeline(
            spark, word2ner=[list(r) for r in corpus.word2ner], cfg=cfg
        )
        mentions = pipe.run(docs_df)
        norms = [
            r["norm"] for r in mentions.select("norm").distinct().collect()
        ]
        edges = pipe._last_edges.select("id_a", "id_b", "score").collect()
        # the persisted agreement-vector frame is the pair stream the
        # weights were computed over
        vec_df = next(
            df for df in pipe._persisted if "pattern" in df.columns
        )
        vec = vec_df.toPandas()
        pipe.unpersist()
        assert len(edges) > 0 and len(vec) == len(edges)

        # independent recompute (pandas/python only from here on)
        names = sorted(["jw_hi", "lev_hi", "cos_hi", "tok1_eq"])

        def level_row(r):
            lv = {}
            lv["jw_hi"] = 2 if r["jw"] >= cfg.fs_jw_cut else 0
            lv["lev_hi"] = 2 if r["lev_sim"] >= cfg.fs_lev_cut else 0
            c = r["cos"]
            if c is None or (isinstance(c, float) and math.isnan(c)):
                lv["cos_hi"] = 1
            else:
                lv["cos_hi"] = 2 if c >= cfg.fs_cos_cut else 0
            ta = r["norm_a"].split(cfg.connector)[0]
            tb = r["norm_b"].split(cfg.connector)[0]
            lv["tok1_eq"] = 2 if ta == tb else 0
            return "".join(str(lv[n]) for n in names), ta

        pats: dict[str, int] = {}
        toks = []
        for _, r in vec.iterrows():
            pat, ta = level_row(r)
            pats[pat] = pats.get(pat, 0) + 1
            toks.append((pat, ta))
        w = fellegi_sunter_em_levels(sorted(pats.items()), names)

        freq: dict[str, int] = {}
        for n in norms:
            t = n.split(cfg.connector)[0]
            freq[t] = freq.get(t, 0) + 1
        n_total = len(norms)
        m_tok1 = w.m[names.index("tok1_eq")]

        def expected(pat, ta):
            s = 0.0
            for k, name in enumerate(names):
                lv = int(pat[k])
                if lv == 1:
                    continue
                if lv == 2:
                    if name == "tok1_eq":
                        s += math.log2(
                            _clamp(m_tok1)
                            * (n_total - 1)
                            / max(freq[ta] - 1.0, 0.5)
                        )
                    else:
                        s += math.log2(_clamp(w.m[k]) / _clamp(w.u[k]))
                else:
                    s += math.log2(
                        (1.0 - _clamp(w.m[k])) / (1.0 - _clamp(w.u[k]))
                    )
            return s

        got = {(r["id_a"], r["id_b"]): r["score"] for r in edges}
        checked = 0
        for (pat, ta), (_, r) in zip(toks, vec.iterrows()):
            key = (r["id_a"], r["id_b"])
            assert key in got
            assert got[key] == pytest.approx(expected(pat, ta), abs=1e-9)
            checked += 1
        assert checked == len(edges)

    def test_refined_mode_deterministic_and_invariant(
        self, spark, corpus, docs_df
    ):
        cfg = PipelineConfig(
            fs_scoring=True, fs_missing_aware=True, fs_value_specific=True
        )
        outs = []
        for _ in range(2):
            pipe = ERPipeline(
                spark, word2ner=[list(r) for r in corpus.word2ner], cfg=cfg
            )
            df = pipe.run(docs_df)
            rows = df.select("norm", "cluster_id").distinct().collect()
            multi = (
                df.groupBy("norm")
                .agg(F.countDistinct("cluster_id").alias("n"))
                .filter(F.col("n") > 1)
                .count()
            )
            pipe.unpersist()
            assert multi == 0  # every norm maps to one cluster
            outs.append({(r["norm"], r["cluster_id"]) for r in rows})
        assert outs[0] == outs[1] and len(outs[0]) > 0
