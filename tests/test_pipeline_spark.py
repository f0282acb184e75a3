"""Spark pipeline tests: byte-identity vs oracle, blocking equivalence,
skew partitioning, end-to-end pairwise F1 (SURVEY.md §5.2-5.5)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kawa_spark.config import PipelineConfig
from kawa_spark.eval import bcubed, labeled_pairs_from_truth, pairwise_f1
from kawa_spark.lexicon.matcher import KawaMatcher
from kawa_spark.operators.blocking import add_block_keys, candidate_pairs
from kawa_spark.operators.extract import extract_mentions, split_outputs
from kawa_spark.operators.scoring import jaro_winkler, match_edges, score_pairs
from kawa_spark.pipeline import ERPipeline
from kawa_spark.testgen import corpus_to_pandas, generate


@pytest.fixture(scope="module")
def corpus():
    return generate(n_docs=120, n_entities=30, seed=42)


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    docs, _, _, _ = corpus_to_pandas(corpus)
    return spark.createDataFrame(docs[["url", "text", "lang"]])


class TestExtractionByteIdentity:
    def test_spark_equals_oracle_per_url(self, spark, corpus, docs_df):
        """The invariant (BASELINE.json:15): Spark extracted text ==
        oracle extracted text, byte-for-byte, per url, on
        whitespace-normalized text."""
        extracted, mentions = split_outputs(
            extract_mentions(docs_df, corpus.word2ner)
        )
        got = {r["url"]: r["text"] for r in extracted.collect()}

        matchers = {}
        mismatches = []
        for doc in corpus.documents:
            lang = doc["lang"]
            if lang not in matchers:
                matchers[lang] = KawaMatcher(
                    lang, word2ner=[list(r) for r in corpus.word2ner]
                )
            text = " ".join(doc["text"].split())
            want = matchers[lang].tokenize(text)["text"]
            if got.get(doc["url"]) != want:
                mismatches.append((doc["url"], want, got.get(doc["url"])))
        assert not mismatches, f"{len(mismatches)} urls diverge: {mismatches[:3]}"
        assert len(got) == len(corpus.documents)

    def test_mentions_have_ids_and_norms(self, spark, corpus, docs_df):
        _, mentions = split_outputs(extract_mentions(docs_df, corpus.word2ner))
        bad = mentions.filter(
            F.col("mention_id").isNull() | F.col("norm").isNull()
        ).count()
        assert bad == 0
        assert mentions.count() > 50


class TestBlocking:
    def test_same_entity_variants_share_a_key(self, spark):
        pdf = pd.DataFrame(
            {
                "mention_id": ["m1", "m2", "m3", "m4"],
                "norm": [
                    "alice_anderson",
                    "alise_anderson",  # typo
                    "alice_andersen",  # phonetic
                    "completely_different",
                ],
            }
        )
        keyed = add_block_keys(spark.createDataFrame(pdf))
        rows = keyed.collect()
        keys = {}
        for r in rows:
            keys.setdefault(r["mention_id"], set()).add(r["block_key"])
        assert keys["m1"] & keys["m2"], "typo variant must share a block key"
        assert keys["m1"] & keys["m3"], "phonetic variant must share a block key"

    def test_triangle_partitioning_equals_naive(self, spark):
        """Hot-key pair generation must produce exactly the naive pair
        set, each pair once (the scale/skew test, SURVEY.md §5.5)."""
        n = 60
        pdf = pd.DataFrame(
            {"mention_id": [f"m{i:03d}" for i in range(n)], "norm": ["x"] * n}
        )
        df = spark.createDataFrame(pdf).withColumn("block_key", F.lit("hot"))
        keyed = df.select("mention_id", "norm", "block_key")
        cfg_hot = PipelineConfig(hot_key_threshold=10, hot_key_groups=4)
        cfg_cold = PipelineConfig(hot_key_threshold=10**9)
        hot_pairs = {
            (r["id_a"], r["id_b"])
            for r in candidate_pairs(keyed, cfg_hot).collect()
        }
        cold_pairs = {
            (r["id_a"], r["id_b"])
            for r in candidate_pairs(keyed, cfg_cold).collect()
        }
        assert len(cold_pairs) == n * (n - 1) // 2
        assert hot_pairs == cold_pairs


class TestScoring:
    def test_jaro_winkler_known_values(self):
        assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
        assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
        assert jaro_winkler("abc", "abc") == 1.0
        assert jaro_winkler("abc", "xyz") == 0.0

    def test_jaro_winkler_batch_matches_scalar(self):
        """The numpy-vectorized batch path (the pair-scoring hot loop)
        must agree with the scalar reference on every pair, including
        empties, CJK, transpositions, and >64-char fallback rows."""
        import random

        from kawa_spark.operators.scoring import jaro_winkler_batch

        rng = random.Random(11)
        alpha = "abcdef 北京xyz"
        cases = [
            ("", ""), ("", "a"), ("a", ""), ("a", "a"), ("ab", "ba"),
            ("martha", "marhta"), ("dixon", "dicksonx"),
            ("x" * 70, "x" * 70 + "y"), (None, "a"),
        ]
        for _ in range(2000):
            la, lb = rng.randint(0, 14), rng.randint(0, 14)
            cases.append(
                ("".join(rng.choice(alpha) for _ in range(la)),
                 "".join(rng.choice(alpha) for _ in range(lb)))
            )
        got = jaro_winkler_batch([c[0] for c in cases], [c[1] for c in cases])
        for i, (x, y) in enumerate(cases):
            want = jaro_winkler(x or "", y or "")
            assert got[i] == pytest.approx(want, abs=1e-12), (x, y)

    def test_batch_cosine_matches_scalar(self, corpus):
        """The matmul-vectorized cosine path (pair-scoring hot loop when
        embeddings are on) must agree with the per-pair scalar reference
        on every pair: known/unknown tokens, multi-token compounds,
        empties, None, and repeated surfaces (the memo path)."""
        import math
        import random

        import numpy as np

        from kawa_spark.operators.scoring import batch_cosine, cosine_scalar

        vecs = {k: np.asarray(v, dtype=np.float32) for k, v in corpus.embeddings.items()}
        toks = list(vecs.keys())
        tok2id = {t: i for i, t in enumerate(toks)}
        mat = np.stack([vecs[t] for t in toks])

        rng = random.Random(7)
        known = toks[:40]

        def surf():
            r = rng.random()
            if r < 0.05:
                return None
            if r < 0.10:
                return ""
            if r < 0.20:
                return "zz_unknown_" + str(rng.randint(0, 3))
            k = rng.randint(1, 3)
            return "_".join(rng.choice(known) for _ in range(k))

        a = [surf() for _ in range(600)]
        b = [surf() for _ in range(600)]
        # force repeats so the unique/memo path is exercised
        a[100:200] = a[0:100]
        b[100:200] = b[0:100]
        memo: dict = {}
        got = batch_cosine(a, b, tok2id, mat, "_", memo)
        # second call hits the memo for every surface
        got2 = batch_cosine(a, b, tok2id, mat, "_", memo)
        for i in range(len(a)):
            want = cosine_scalar(a[i], b[i], vecs, "_")
            if math.isnan(want):
                assert math.isnan(got[i]) and math.isnan(got2[i]), (a[i], b[i])
            else:
                assert got[i] == pytest.approx(want, abs=1e-9), (a[i], b[i])
                assert got2[i] == got[i]

    def test_score_pipeline(self, spark, corpus):
        pdf = pd.DataFrame(
            {
                "id_a": ["p1", "p2"],
                "id_b": ["q1", "q2"],
                "norm_a": ["alice_anderson", "alice_anderson"],
                "norm_b": ["alise_anderson", "quartz_window"],
                "block_key": ["k", "k"],
            }
        )
        scored = score_pairs(
            spark.createDataFrame(pdf), corpus.embeddings
        ).collect()
        by = {r["id_a"]: r for r in scored}
        assert by["p1"]["score"] > 0.85
        assert by["p2"]["score"] < 0.6


class TestEndToEnd:
    def test_pairwise_f1_gate(self, spark, corpus, docs_df, tmp_path):
        """The headline gate: pairwise F1 >= 0.99 on labeled within-block
        pairs (BASELINE.json:2)."""
        _, w2n, _, truth = corpus_to_pandas(corpus)
        pipe = ERPipeline(
            spark,
            corpus.word2ner,
            corpus.embeddings,
            out_dir=str(tmp_path / "er"),
        )
        clusters = pipe.run(docs_df)
        keyed = add_block_keys(
            clusters.select("mention_id", "norm"), pipe.cfg
        )
        truth_df = spark.createDataFrame(truth)
        labeled = labeled_pairs_from_truth(clusters, truth_df, keyed)
        stats = pairwise_f1(labeled)
        assert stats["f1"] >= 0.99, stats
        # independent gate in the B-cubed family: every mention weighted
        # equally, so over/under-merging cannot hide in cluster-size
        # skew the way it can in the pairwise count. B3 is GLOBAL —
        # unlike the within-block pairwise contract (BASELINE.json:2) it
        # also counts same-entity mentions that never share a blocking
        # key, which blocking-based ER cannot merge by design; on this
        # corpus that cross-block split mass is ~8% of recall
        # (measured 1.000 P / 0.919 R). Gates are calibrated to catch
        # regressions in each failure mode separately: any over-merge
        # breaks the precision gate, any widening of the split mass
        # breaks the recall gate.
        assignments = (
            clusters.select("mention_id", "norm", "cluster_id")
            .withColumn("surface", F.regexp_replace("norm", "_", " "))
            .join(truth_df.withColumn("surface", F.lower("surface")),
                  "surface", "left")
            .select("mention_id", "cluster_id", "entity_id")
        )
        b3 = bcubed(assignments)
        assert b3["precision"] >= 0.995, b3
        assert b3["recall"] >= 0.90, b3
        assert b3["f1"] >= 0.95, b3

    def test_cbs_pruning_keeps_f1_gate(self, spark, corpus, docs_df):
        """cfg.min_shared_keys=2 (CBS meta-blocking prune) must still
        clear the pairwise-F1 contract: on the gate corpus true matches
        share >= 2 key spaces (exact/prefix/soundex/MinHash agree on
        near-identical norms), so pruning single-key coincidences costs
        zero recall — measured identical tp/fn to the default run."""
        _, w2n, _, truth = corpus_to_pandas(corpus)
        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            cfg=PipelineConfig(min_shared_keys=2),
        )
        clusters = pipe.run(docs_df)
        keyed = add_block_keys(clusters.select("mention_id", "norm"), pipe.cfg)
        truth_df = spark.createDataFrame(truth)
        stats = pairwise_f1(labeled_pairs_from_truth(clusters, truth_df, keyed))
        pipe.unpersist()
        assert stats["f1"] >= 0.99, stats
        assert stats["precision"] == 1.0, stats

    def test_resume_skips_and_matches(self, spark, corpus, docs_df, tmp_path):
        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings, out_dir=str(tmp_path / "er2")
        )
        first = pipe.run(docs_df).select("mention_id", "cluster_id").collect()
        pipe2 = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings, out_dir=str(tmp_path / "er2")
        )
        second = pipe2.run(docs_df, resume=True).select(
            "mention_id", "cluster_id"
        ).collect()
        assert sorted(map(tuple, first)) == sorted(map(tuple, second))
        assert all(m.resumed for m in pipe2.metrics), pipe2.metrics


class TestLexiconPathPipeline:
    def test_pipeline_from_saved_lexicon_matches_word2ner(
        self, spark, corpus, docs_df, tmp_path
    ):
        """S5 end-to-end: ERPipeline(lexicon_path=...) must produce the
        same clusters as the word2ner-broadcast path."""
        from kawa_spark.lexicon.matcher import KawaMatcher
        from kawa_spark.pipeline import ERPipeline

        w2n = [list(r) for r in corpus.word2ner]
        path = str(tmp_path / "lexicon.json.gz")
        KawaMatcher("", word2ner=[list(r) for r in w2n]).save(path)

        a = ERPipeline(spark, word2ner=w2n).run(docs_df)
        b = ERPipeline(spark, lexicon_path=path).run(docs_df)
        rows_a = {(r["mention_id"], r["cluster_id"]) for r in a.collect()}
        rows_b = {(r["mention_id"], r["cluster_id"]) for r in b.collect()}
        assert rows_a == rows_b


class TestPartitionedLineage:
    def test_value_keyed_lineage_and_hive_layout(
        self, spark, corpus, docs_df, tmp_path
    ):
        """partition_cols=['lang']: stages carrying lang write
        Hive/Iceberg layout (lang=en/...) and their manifests key the
        lineage block by partition VALUE; stages without lang fall back
        to physical-partition lineage. Resume still round-trips."""
        import json
        import os

        out = str(tmp_path / "er_part")
        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=out, partition_cols=["lang"],
        )
        first = pipe.run(docs_df).select("mention_id", "cluster_id").collect()

        with open(os.path.join(out, "mentions", "_MANIFEST.json")) as f:
            m = json.load(f)
        assert m["partition_cols"] == ["lang"]
        assert all(k.startswith("lang=") for k in m["partitions"])
        assert sum(m["partitions"].values()) == m["rows"]
        langs_on_disk = {
            d for d in os.listdir(os.path.join(out, "mentions"))
            if d.startswith("lang=")
        }
        assert langs_on_disk == set(m["partitions"])

        # surfaces has no lang column -> physical lineage fallback
        with open(os.path.join(out, "surfaces", "_MANIFEST.json")) as f:
            s = json.load(f)
        assert s["partition_cols"] == []

        pipe2 = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=out, partition_cols=["lang"],
        )
        second = pipe2.run(docs_df, resume=True).select(
            "mention_id", "cluster_id"
        ).collect()
        assert sorted(map(tuple, first)) == sorted(map(tuple, second))
        assert all(r.resumed for r in pipe2.metrics)

    def test_null_partition_value_keys_match_hive_layout(
        self, spark, corpus, docs_df, tmp_path
    ):
        """Rows with a NULL partition value land in
        lang=__HIVE_DEFAULT_PARTITION__/ on disk; the manifest must key
        that partition the same way (not 'lang=None')."""
        import json
        import os

        from pyspark.sql import functions as F

        docs_null = docs_df.withColumn(
            "lang",
            F.when(F.col("url").endswith("0"), F.lit(None)).otherwise(
                F.col("lang")
            ),
        )
        out = str(tmp_path / "er_null_part")
        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=out, partition_cols=["lang"],
        )
        pipe.run(docs_null)
        with open(os.path.join(out, "mentions", "_MANIFEST.json")) as f:
            m = json.load(f)
        langs_on_disk = {
            d for d in os.listdir(os.path.join(out, "mentions"))
            if d.startswith("lang=")
        }
        assert langs_on_disk == set(m["partitions"])
        assert "lang=None" not in m["partitions"]

    def test_special_char_partition_values_match_hive_layout(
        self, spark, corpus, docs_df, tmp_path
    ):
        """Spark Hive-escapes special characters in partition directory
        names ('a/b' -> 'a%2Fb'); the manifest must key those partitions
        exactly as they appear on disk."""
        import json
        import os

        from pyspark.sql import functions as F

        docs_weird = docs_df.withColumn(
            "lang",
            F.when(F.col("url").endswith("0"), F.lit("x:y/z=1")).otherwise(
                F.col("lang")
            ),
        )
        out = str(tmp_path / "er_weird_part")
        pipe = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings,
            out_dir=out, partition_cols=["lang"],
        )
        pipe.run(docs_weird)
        with open(os.path.join(out, "mentions", "_MANIFEST.json")) as f:
            m = json.load(f)
        langs_on_disk = {
            d for d in os.listdir(os.path.join(out, "mentions"))
            if d.startswith("lang=")
        }
        assert "lang=x%3Ay%2Fz%3D1" in langs_on_disk
        assert langs_on_disk == set(m["partitions"])


class TestSavedLexiconConfigGuard:
    def test_connector_mismatch_raises(self, spark, corpus, docs_df, tmp_path):
        """A lexicon saved with one connector used under a cfg with a
        different one would silently corrupt blocking keys — must raise."""
        import pytest as _pytest

        from kawa_spark.config import PipelineConfig
        from kawa_spark.lexicon.matcher import KawaMatcher
        from kawa_spark.pipeline import ERPipeline

        path = str(tmp_path / "lex_conn.json.gz")
        KawaMatcher(
            "", word2ner=[list(r) for r in corpus.word2ner], connector="-"
        ).save(path)
        cfg = PipelineConfig()  # default connector '_'
        assert cfg.connector != "-"
        pipe = ERPipeline(spark, lexicon_path=path, cfg=cfg)
        with _pytest.raises(Exception, match="connector"):
            pipe.run(docs_df).collect()


class TestClusterMetrics:
    def test_metrics_over_last_run(self, spark, corpus, docs_df):
        pipe = ERPipeline(spark, corpus.word2ner, corpus.embeddings)
        with pytest.raises(RuntimeError):
            pipe.cluster_metrics()  # before run(): nothing to diagnose
        clusters = pipe.run(docs_df)
        m = pipe.cluster_metrics().collect()
        assert m, "pipeline produced no multi-member clusters"
        comps = {r["component"] for r in m}
        for r in m:
            assert r["n_nodes"] >= 2
            assert 0 < r["density"] <= 1.0
            # scored edges passed the match threshold
            assert r["min_w"] >= pipe.cfg.match_threshold
            assert r["min_w"] <= r["max_w"]
        # the metrics table covers exactly the non-singleton components
        cluster_ids = {
            r["cluster_id"]
            for r in clusters.select("cluster_id").distinct().collect()
        }
        assert comps <= cluster_ids

    def test_cannot_link_excludes_cross_cluster_edges(self, spark, corpus,
                                                      docs_df):
        """Under a cannot-link split, the scored edge that crossed the
        repair boundary must not count toward either cluster's density."""
        pipe0 = ERPipeline(spark, corpus.word2ner, corpus.embeddings)
        pipe0.run(docs_df)
        base = {r["component"]: r["n_edges"]
                for r in pipe0.cluster_metrics().collect()}
        # pick the weakest edge of the largest cluster and forbid it
        edges = pipe0._last_edges
        comps = pipe0._last_components
        big = max(
            ((r["component"], r["n_nodes"], r["n_edges"])
             for r in pipe0.cluster_metrics().collect()),
            key=lambda t: t[1],
        )[0]
        members = {
            r["node"]
            for r in comps.filter(F.col("component") == big).collect()
        }
        weakest = (
            edges.filter(
                F.col("id_a").isin(members) & F.col("id_b").isin(members)
            )
            .orderBy("score", "id_a", "id_b")
            .first()
        )
        surf = (
            pipe0.run(docs_df)
            .select("norm", "mention_id").distinct()
        )
        norm_of = {
            r["mention_id"]: r["norm"]
            for r in surf.filter(
                F.col("mention_id").isin([weakest["id_a"], weakest["id_b"]])
            ).collect()
        }
        cl = spark.createDataFrame(
            [(norm_of[weakest["id_a"]], norm_of[weakest["id_b"]])],
            ["norm_a", "norm_b"],
        )
        pipe1 = ERPipeline(
            spark, corpus.word2ner, corpus.embeddings, cannot_link=cl
        )
        pipe1.run(docs_df)
        m1 = pipe1.cluster_metrics().collect()
        total_base = sum(base.values())
        total_cl = sum(r["n_edges"] for r in m1)
        # at least the forbidden edge is gone from the intra-cluster set
        assert total_cl < total_base
        for r in m1:
            if r["n_nodes"] == 1:
                # repair may strand a node as its own component:
                # density is undefined (NULL), edge count zero
                assert r["density"] is None and r["n_edges"] == 0
            else:
                assert 0 < r["density"] <= 1.0
