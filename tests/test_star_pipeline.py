"""ERPipeline wiring for the opt-in star clustering strategy
(PipelineConfig(clustering="star"), operators/star.py).

Pipeline runs are expensive, so the cc baseline and the star run are
module-scoped fixtures shared across tests (3 runs total); star
determinism at the operator level is pinned by tests/test_star.py.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401

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


def _norm_clusters(pipe, docs_df):
    out = {
        r["norm"]: r["cluster_id"]
        for r in pipe.run(docs_df)
        .select("norm", "cluster_id")
        .distinct()
        .collect()
    }
    pipe.unpersist()
    return out


@pytest.fixture(scope="module")
def cc_map(spark, corpus, docs_df):
    return _norm_clusters(
        ERPipeline(spark, word2ner=[list(r) for r in corpus.word2ner]),
        docs_df,
    )


@pytest.fixture(scope="module")
def star_map(spark, corpus, docs_df):
    return _norm_clusters(
        ERPipeline(
            spark,
            word2ner=[list(r) for r in corpus.word2ner],
            cfg=PipelineConfig(clustering="star"),
        ),
        docs_df,
    )


def test_star_is_a_partition_and_refines_cc(cc_map, star_map):
    # same norm universe, each norm in exactly one star cluster
    assert set(star_map) == set(cc_map)
    # refinement: a star cluster can never span two CC components
    # (star edges are a subset of the CC edge list), so mapping each
    # star cluster through the CC assignment must be single-valued
    by_star: dict = {}
    for norm, sid in star_map.items():
        by_star.setdefault(sid, set()).add(cc_map[norm])
    for sid, cc_ids in by_star.items():
        assert len(cc_ids) == 1, f"star cluster {sid} spans CC {cc_ids}"


def test_must_link_rejected_under_star(spark, corpus):
    ml = spark.createDataFrame([("a", "b")], "norm_a string, norm_b string")
    with pytest.raises(ValueError, match="must_link"):
        ERPipeline(
            spark,
            word2ner=[list(r) for r in corpus.word2ner],
            cfg=PipelineConfig(clustering="star"),
            must_link=ml,
        )


def test_unknown_strategy_rejected(spark, corpus):
    with pytest.raises(ValueError, match="clustering"):
        ERPipeline(
            spark,
            word2ner=[list(r) for r in corpus.word2ner],
            cfg=PipelineConfig(clustering="leiden"),
        )


def test_cannot_link_composes_with_star(spark, corpus, docs_df, star_map):
    by_cluster: dict = {}
    for norm, cid in star_map.items():
        by_cluster.setdefault(cid, set()).add(norm)
    pair = next(
        (
            tuple(sorted(ns)[:2])
            for _, ns in sorted(by_cluster.items())
            if len(ns) >= 2
        ),
        None,
    )
    if pair is None:
        pytest.skip("corpus produced no multi-norm star cluster")
    a, b = pair
    cl = spark.createDataFrame([(a, b)], "norm_a string, norm_b string")
    got = _norm_clusters(
        ERPipeline(
            spark,
            word2ner=[list(r) for r in corpus.word2ner],
            cfg=PipelineConfig(clustering="star"),
            cannot_link=cl,
        ),
        docs_df,
    )
    assert got[a] != got[b], "cannot-link pair still co-clustered"
