"""Retraction (the inverse of incremental linkage): removing documents
from standing state must equal a full batch run over the surviving
corpus — surfaces, surface-level cluster map, and downstream increments
— with recompute bounded to the touched clusters. Covers the two ways a
cluster changes: label-only (a norm's min mention id was retracted) and
topology (a bridge norm lost its last mention and the cluster splits)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kawa_spark.operators.incremental import (
    ERState,
    incremental_link,
    retract_docs,
)
from kawa_spark.pipeline import ERPipeline
from kawa_spark.testgen import corpus_to_pandas, generate


@pytest.fixture(scope="module")
def corpus():
    return generate(n_docs=160, n_entities=30, seed=11)


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    docs, _, _, _ = corpus_to_pandas(corpus)
    return spark.createDataFrame(docs)


def _split(docs_df, frac_mod=5):
    """Deterministic split: ~1/frac_mod of docs become the retraction."""
    h = F.pmod(F.xxhash64("url"), F.lit(frac_mod))
    return docs_df.filter(h != 0), docs_df.filter(h == 0)


def _surface_map(clusters_df):
    return {
        r["norm"]: r["cluster_id"]
        for r in clusters_df.groupBy("norm")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .collect()
    }


def _surfaces_table(df):
    return {
        r["norm"]: (r["surface_id"], r["n_mentions"]) for r in df.collect()
    }


class TestRetractEqualsFull:
    def test_retract_matches_full_run(self, spark, corpus, docs_df, tmp_path):
        keep, drop = _split(docs_df)
        assert keep.count() > 0 and drop.count() > 0

        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=str(tmp_path / "all"),
        )
        all_clusters = pipe.run(docs_df)
        state = ERState.from_out_dir(spark, str(tmp_path / "all"))

        res = retract_docs(pipe, state, drop.select("url"), all_clusters)

        full = ERPipeline(spark, corpus.word2ner, corpus.embeddings).run(keep)

        assert _surface_map(
            res.state.surface_clusters.select("norm", "cluster_id")
        ) == _surface_map(full)

        # surfaces carry exact recomputed min-ids and mention counts
        expect = _surfaces_table(
            full.groupBy("norm").agg(
                F.min("mention_id").alias("surface_id"),
                F.count("*").alias("n_mentions"),
            )
        )
        assert _surfaces_table(res.state.surfaces) == expect

        # block-key index drops exactly the dead norms
        dead = {r["norm"] for r in res.removed_norms.collect()}
        live_keys = {r["norm"] for r in res.state.block_keys.collect()}
        assert live_keys == set(expect) and not (dead & live_keys)

        # remap rows are consistent with the full run's labels
        for r in res.remap.collect():
            assert expect.get(r["norm"]) is not None
            assert _surface_map(full)[r["norm"]] == r["cluster_id"]

    def test_retract_then_increment_matches_full(
        self, spark, corpus, docs_df, tmp_path
    ):
        """retract(D) then link(B) == batch over (A \\ D) ∪ B — the state
        a retraction leaves behind upholds the increment contract."""
        keep, drop = _split(docs_df, frac_mod=6)
        base, delta = _split(keep, frac_mod=4)

        pipe2 = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=str(tmp_path / "base"),
        )
        base_clusters = pipe2.run(base.unionByName(drop))
        state = ERState.from_out_dir(spark, str(tmp_path / "base"))

        res = retract_docs(pipe2, state, drop.select("url"), base_clusters)
        inc = incremental_link(pipe2, res.state, delta)

        full = ERPipeline(spark, corpus.word2ner, corpus.embeddings).run(
            base.unionByName(delta)
        )
        assert _surface_map(
            inc.state.surface_clusters.select("norm", "cluster_id")
        ) == _surface_map(full)

    def test_retract_all_empties_state(self, spark, corpus, docs_df, tmp_path):
        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=str(tmp_path / "all3"),
        )
        clusters = pipe.run(docs_df)
        state = ERState.from_out_dir(spark, str(tmp_path / "all3"))
        res = retract_docs(pipe, state, docs_df.select("url"), clusters)
        assert res.state.surfaces.count() == 0
        assert res.state.surface_clusters.count() == 0
        assert res.state.block_keys.count() == 0


class TestRetractSplitsCluster:
    """A bridge norm b matches a and c while a–c scores below threshold
    (chain picked offline: jw/lev arithmetic, all three share the px:
    jon|smi block key). Retracting b's only document must split the
    cluster — and report it."""

    WORD2NER = [
        ["Jonatxan_Smith", "PERSON"],
        ["Jonatxan_Smitty", "PERSON"],
        ["Jonathes_Smitty", "PERSON"],
    ]
    DOCS = [
        ("doc://a", "I met Jonatxan Smith at the market today .", "en"),
        ("doc://b", "I met Jonatxan Smitty at the market today .", "en"),
        ("doc://c", "I met Jonathes Smitty at the market today .", "en"),
    ]

    def test_bridge_retraction_splits(self, spark, tmp_path):
        docs = spark.createDataFrame(
            pd.DataFrame(self.DOCS, columns=["url", "text", "lang"])
        )
        pipe = ERPipeline(
            spark, self.WORD2NER, out_dir=str(tmp_path / "bridge")
        )
        clusters = pipe.run(docs)
        cmap = _surface_map(clusters)
        assert len(set(cmap.values())) == 1, (
            f"precondition: one chained cluster, got {cmap}"
        )

        state = ERState.from_out_dir(spark, str(tmp_path / "bridge"))
        drop = spark.createDataFrame([("doc://b",)], ["url"])
        res = retract_docs(pipe, state, drop, clusters)

        after = _surface_map(
            res.state.surface_clusters.select("norm", "cluster_id")
        )
        full = _surface_map(
            ERPipeline(spark, self.WORD2NER).run(
                docs.filter(F.col("url") != "doc://b")
            )
        )
        assert after == full
        assert len(set(after.values())) == 2  # the split happened
        splits = res.splits.collect()
        assert len(splits) == 1 and len(splits[0]["new_labels"]) == 2
        assert {r["norm"] for r in res.removed_norms.collect()} == {
            "jonatxan_smitty"
        }
