"""ERPipeline wiring for cannot-link constraints and FS edge selection."""

import pytest
from pyspark.sql import functions as F

from kawa_spark.config import PipelineConfig
from kawa_spark.pipeline import ERPipeline
from kawa_spark.testgen import corpus_to_pandas, generate


@pytest.fixture(scope="module")
def corpus():
    return generate(n_docs=80, n_entities=20, seed=7)


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    docs, _, _, _ = corpus_to_pandas(corpus)
    return spark.createDataFrame(docs[["url", "text", "lang"]])


@pytest.fixture(scope="module")
def baseline(spark, corpus, docs_df):
    pipe = ERPipeline(spark, word2ner=[list(r) for r in corpus.word2ner])
    out = pipe.run(docs_df).select("norm", "cluster_id").distinct().collect()
    pipe.unpersist()
    return {r["norm"]: r["cluster_id"] for r in out}


def _coclustered_norm_pair(baseline):
    by_cluster: dict = {}
    for norm, cid in baseline.items():
        by_cluster.setdefault(cid, []).append(norm)
    for cid, norms in sorted(by_cluster.items()):
        if len(set(norms)) >= 2:
            a, b = sorted(set(norms))[:2]
            return a, b
    pytest.skip("corpus produced no multi-norm cluster")


class TestCannotLinkPipeline:
    def test_constraint_separates_pair(self, spark, corpus, docs_df, baseline):
        a, b = _coclustered_norm_pair(baseline)
        cl = spark.createDataFrame([(a, b)], "norm_a string, norm_b string")
        pipe = ERPipeline(
            spark, word2ner=[list(r) for r in corpus.word2ner], cannot_link=cl
        )
        got = {
            r["norm"]: r["cluster_id"]
            for r in pipe.run(docs_df)
            .select("norm", "cluster_id")
            .distinct()
            .collect()
        }
        pipe.unpersist()
        assert got[a] != got[b], "cannot-link pair still co-clustered"
        # norms outside the violated component keep their baseline cluster
        violated = {
            n for n, c in baseline.items() if c == baseline[a]
        }
        for norm, cid in baseline.items():
            if norm not in violated:
                assert got[norm] == cid, f"untouched norm {norm!r} moved"

    def test_absent_norms_are_ignored(self, spark, corpus, docs_df, baseline):
        cl = spark.createDataFrame(
            [("no_such_norm_x", "no_such_norm_y")],
            "norm_a string, norm_b string",
        )
        pipe = ERPipeline(
            spark, word2ner=[list(r) for r in corpus.word2ner], cannot_link=cl
        )
        got = {
            r["norm"]: r["cluster_id"]
            for r in pipe.run(docs_df)
            .select("norm", "cluster_id")
            .distinct()
            .collect()
        }
        pipe.unpersist()
        assert got == baseline


class TestFSScoringPipeline:
    def test_fs_mode_runs_and_is_deterministic(self, spark, corpus, docs_df):
        cfg = PipelineConfig(fs_scoring=True, fs_threshold=0.0)
        outs = []
        for _ in range(2):
            pipe = ERPipeline(
                spark, word2ner=[list(r) for r in corpus.word2ner], cfg=cfg
            )
            rows = (
                pipe.run(docs_df)
                .select("norm", "cluster_id")
                .distinct()
                .collect()
            )
            pipe.unpersist()
            outs.append({(r["norm"], r["cluster_id"]) for r in rows})
        assert outs[0] == outs[1]
        assert len(outs[0]) > 0

    def test_fs_exact_duplicates_still_cocluster(self, spark, corpus, docs_df):
        # identical norms never reach scoring (surface dedup) — FS mode
        # must preserve that invariant: every norm maps to ONE cluster
        cfg = PipelineConfig(fs_scoring=True)
        pipe = ERPipeline(
            spark, word2ner=[list(r) for r in corpus.word2ner], cfg=cfg
        )
        multi = (
            pipe.run(docs_df)
            .groupBy("norm")
            .agg(F.countDistinct("cluster_id").alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        pipe.unpersist()
        assert multi == 0


class TestMustLinkPipeline:
    def _two_cluster_norms(self, baseline):
        by_cluster: dict = {}
        for norm, cid in baseline.items():
            by_cluster.setdefault(cid, []).append(norm)
        cids = sorted(c for c, ns in by_cluster.items())
        if len(cids) < 2:
            pytest.skip("corpus produced fewer than 2 clusters")
        return sorted(by_cluster[cids[0]])[0], sorted(by_cluster[cids[1]])[0]

    def test_must_link_merges_clusters(self, spark, corpus, docs_df, baseline):
        a, b = self._two_cluster_norms(baseline)
        ml = spark.createDataFrame([(a, b)], "norm_a string, norm_b string")
        pipe = ERPipeline(
            spark, word2ner=[list(r) for r in corpus.word2ner], must_link=ml
        )
        got = {
            r["norm"]: r["cluster_id"]
            for r in pipe.run(docs_df)
            .select("norm", "cluster_id")
            .distinct()
            .collect()
        }
        pipe.unpersist()
        assert got[a] == got[b], "must-link pair not co-clustered"

    def test_cannot_link_outranks_must_link(
        self, spark, corpus, docs_df, baseline
    ):
        a, b = self._two_cluster_norms(baseline)
        pair = spark.createDataFrame(
            [(a, b)], "norm_a string, norm_b string"
        )
        pipe = ERPipeline(
            spark,
            word2ner=[list(r) for r in corpus.word2ner],
            must_link=pair,
            cannot_link=pair,
        )
        got = {
            r["norm"]: r["cluster_id"]
            for r in pipe.run(docs_df)
            .select("norm", "cluster_id")
            .distinct()
            .collect()
        }
        pipe.unpersist()
        assert got[a] != got[b], "cannot-link precedence broken"
