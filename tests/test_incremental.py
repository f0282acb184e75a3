"""Incremental linkage: delta B folded into state(A) must equal a full
batch run over A ∪ B — same surface-level map, same mention-level
cluster ids — plus pair-set invariance for the skew-bounded cross join
and merge-event reporting."""

import random

import pytest
from pyspark.sql import functions as F

from kawa_spark.operators.blocking import add_block_keys, bounded_cross_pairs
from kawa_spark.operators.incremental import ERState, incremental_link
from kawa_spark.pipeline import ERPipeline
from kawa_spark.testgen import corpus_to_pandas, generate


@pytest.fixture(scope="module")
def corpus():
    return generate(n_docs=160, n_entities=30, seed=7)


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    docs, _, _, _ = corpus_to_pandas(corpus)
    return spark.createDataFrame(docs)


def _split(docs_df, frac_mod=5):
    """Deterministic split: ~1/frac_mod of docs become the delta."""
    h = F.pmod(F.xxhash64("url"), F.lit(frac_mod))
    return docs_df.filter(h != 0), docs_df.filter(h == 0)


def _surface_map(clusters_df):
    return {
        r["norm"]: r["cluster_id"]
        for r in clusters_df.groupBy("norm")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .collect()
    }


def _mention_map(clusters_df):
    return {
        r["mention_id"]: r["cluster_id"]
        for r in clusters_df.select("mention_id", "cluster_id").collect()
    }


class TestIncrementalEqualsFull:
    def test_increment_matches_full_run(self, spark, corpus, docs_df, tmp_path):
        base, delta = _split(docs_df)
        assert delta.count() > 0 and base.count() > 0

        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=str(tmp_path / "base"),
        )
        base_clusters = pipe.run(base)
        state = ERState.from_out_dir(spark, str(tmp_path / "base"))

        inc = incremental_link(pipe, state, delta)

        full = ERPipeline(spark, corpus.word2ner, corpus.embeddings).run(docs_df)

        # surface-level map: exact equality, cluster ids included
        assert _surface_map(inc.state.surface_clusters.select(
            "norm", "cluster_id")) == _surface_map(full)

        # delta mentions: exact cluster ids
        full_by_mention = _mention_map(full)
        for mid, cid in _mention_map(inc.new_clusters).items():
            assert full_by_mention[mid] == cid

        # old mentions reconcile through the (delta-bounded) remap
        remap = {r["cluster_id"]: r["final"] for r in inc.remap.collect()}
        for mid, cid in _mention_map(base_clusters).items():
            assert full_by_mention[mid] == remap.get(cid, cid)

        # updated surfaces carry exact min-ids and mention counts
        full_surf = {
            r["norm"]: (r["surface_id"], r["n_mentions"])
            for r in ERPipeline(spark, corpus.word2ner, corpus.embeddings)
            .run(docs_df)
            .groupBy("norm")
            .agg(
                F.min("mention_id").alias("surface_id"),
                F.count("*").alias("n_mentions"),
            )
            .collect()
        }
        got_surf = {
            r["norm"]: (r["surface_id"], r["n_mentions"])
            for r in inc.state.surfaces.collect()
        }
        assert got_surf == full_surf

    def test_chained_increments_match_full_run(self, spark, corpus, docs_df, tmp_path):
        h = F.pmod(F.xxhash64("url"), F.lit(3))
        parts = [docs_df.filter(h == i) for i in range(3)]

        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=str(tmp_path / "b0"),
        )
        pipe.run(parts[0])
        state = ERState.from_out_dir(spark, str(tmp_path / "b0"))
        for p in parts[1:]:
            state = incremental_link(pipe, state, p).state

        full = ERPipeline(spark, corpus.word2ner, corpus.embeddings).run(docs_df)
        assert _surface_map(state.surface_clusters.select(
            "norm", "cluster_id")) == _surface_map(full)

    def test_state_save_load_roundtrip(self, spark, corpus, docs_df, tmp_path):
        base, delta = _split(docs_df)
        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=str(tmp_path / "base"),
        )
        pipe.run(base)
        state = ERState.from_out_dir(spark, str(tmp_path / "base"))
        inc = incremental_link(pipe, state, delta)
        inc.state.save(str(tmp_path / "state1"), pipe.cfg)

        reloaded = ERState.load(spark, str(tmp_path / "state1"))
        assert _surface_map(
            reloaded.surface_clusters.select("norm", "cluster_id")
        ) == _surface_map(inc.state.surface_clusters.select("norm", "cluster_id"))
        assert reloaded.block_keys.count() == inc.state.block_keys.count()


class TestMergeEvents:
    def test_bridging_doc_merges_two_clusters(self, spark, corpus):
        """Two base docs mention two distinct variants of one entity that
        do NOT co-occur -> two clusters; a delta doc containing a variant
        close to both bridges them -> one merge event naming both old
        cluster ids."""
        ent = corpus.entities[1]
        if len(ent["variants"]) < 3:
            pytest.skip("need an entity with 3+ variants")
        v = ent["variants"]
        import datetime as dt
        import pandas as pd

        def doc(i, text):
            return {
                "url": f"https://m.example/{i}",
                "warc_ts": dt.datetime(2024, 1, 1, 0, 0, i),
                "html": f"<p>{text}</p>".encode(),
                "text": text,
                "lang": "en",
            }

        base = spark.createDataFrame(pd.DataFrame([
            doc(0, f"report about {v[0]} today x"),
            doc(1, f"report about {v[1]} today x"),
        ]))
        delta = spark.createDataFrame(pd.DataFrame([
            doc(2, f"update on {v[2]} tonight x"),
        ]))

        pipe = ERPipeline(spark, corpus.word2ner, corpus.embeddings)
        full = pipe.run(spark.createDataFrame(pd.DataFrame([
            doc(0, f"report about {v[0]} today x"),
            doc(1, f"report about {v[1]} today x"),
            doc(2, f"update on {v[2]} tonight x"),
        ])))
        n_full = full.select("cluster_id").distinct().count()

        base_run = ERPipeline(spark, corpus.word2ner, corpus.embeddings)
        base_clusters = base_run.run(base)
        n_base = base_clusters.select("cluster_id").distinct().count()

        state = ERState.from_batch_run(
            surfaces=base_clusters.groupBy("norm").agg(
                F.min("mention_id").alias("surface_id"),
                F.count("*").alias("n_mentions"),
            ),
            block_keys=add_block_keys(
                base_clusters.groupBy("norm")
                .agg(F.min("mention_id").alias("mention_id"))
                .select("mention_id", "norm"),
                base_run.cfg,
            ),
            clusters=base_clusters,
        )
        inc = incremental_link(base_run, state, delta)
        merges = inc.merges.collect()
        if n_base > n_full:
            # the delta variant really did bridge base clusters
            assert any(len(m["merged_clusters"]) >= 2 for m in merges)
        # regardless, incremental must equal the full run
        assert _surface_map(
            inc.state.surface_clusters.select("norm", "cluster_id")
        ) == _surface_map(full)


class TestBoundedCrossPairs:
    def test_equals_naive_join_with_hot_keys(self, spark):
        rng = random.Random(11)
        left = [(f"L{i:03d}", f"ln{i}", f"k{rng.randrange(6)}") for i in range(40)]
        # key k0 is hot on the right
        right = [(f"R{i:04d}", f"rn{i}", "k0") for i in range(300)] + [
            (f"S{i:03d}", f"sn{i}", f"k{rng.randrange(1, 6)}") for i in range(60)
        ]
        ldf = spark.createDataFrame(left, "mention_id string, norm string, block_key string")
        rdf = spark.createDataFrame(right, "mention_id string, norm string, block_key string")

        naive = {
            (r["block_key"], r["id_l"], r["id_r"])
            for r in ldf.alias("l")
            .join(rdf.alias("r"), F.col("l.block_key") == F.col("r.block_key"))
            .select(
                F.col("l.block_key").alias("block_key"),
                F.col("l.mention_id").alias("id_l"),
                F.col("r.mention_id").alias("id_r"),
            )
            .collect()
        }
        bounded = bounded_cross_pairs(ldf, rdf, threshold=50, groups=4)
        got = [
            (r["block_key"], r["id_l"], r["id_r"]) for r in bounded.collect()
        ]
        assert len(got) == len(set(got)), "duplicate pairs emitted"
        assert set(got) == naive

    def test_all_cold_and_all_hot_extremes(self, spark):
        rows = [(f"a{i}", f"n{i}", "k") for i in range(20)]
        ldf = spark.createDataFrame(rows[:5], "mention_id string, norm string, block_key string")
        rdf = spark.createDataFrame(rows[5:], "mention_id string, norm string, block_key string")
        naive = ldf.count() * rdf.count()
        for thr in (1, 1000):  # all-hot / all-cold
            assert bounded_cross_pairs(ldf, rdf, threshold=thr, groups=3).count() == naive
