"""Streaming ingest wrapper: micro-batches through the batch operators,
idempotent per-batch state, incremental cluster folding."""

import os

import pytest

import __spark_entry__ as entry
from kawa_spark.streaming.ingest import StreamingERIngest


@pytest.fixture()
def pages(spark):
    def make(rows):
        return spark.createDataFrame(rows, "url string, text string, lang string")

    return make


def test_incremental_batches_merge_clusters(spark, tmp_path, pages):
    state = str(tmp_path / "state")
    ing = StreamingERIngest(spark, entry.CORPUS_WORD2NER, state)

    # batch 0: two docs, one shared surface
    ing.process_batch(
        pages([
            ("u1", "we used hash join here", "en"),
            ("u2", "prefer hash join again", "en"),
        ]),
        batch_id=0,
    )
    c0 = {r.norm: r.cluster_id for r in ing.current_clusters().collect()}
    assert "hash_join" in c0

    # batch 1: a near-variant surface that must merge with hash_join's
    # cluster via pairwise scoring (new-old pairing)
    ing.process_batch(
        pages([("u3", "the hash joins variant", "en")]), batch_id=1
    )
    c1 = {r.norm: r.cluster_id for r in ing.current_clusters().collect()}
    if "hash_joins" in c1:  # matched by the lexicon's greedy matcher
        assert c1["hash_joins"] == c1["hash_join"]

    # replaying batch 1 is idempotent (overwrite, not append)
    ing.process_batch(
        pages([("u3", "the hash joins variant", "en")]), batch_id=1
    )
    c2 = {r.norm: r.cluster_id for r in ing.current_clusters().collect()}
    assert c2 == c1


def test_stream_availablenow(spark, tmp_path, pages):
    src = str(tmp_path / "landing")
    os.makedirs(src, exist_ok=True)
    pages([
        ("s1", "big table scan and hash join", "en"),
        ("s2", "another table scan today", "en"),
    ]).coalesce(1).write.mode("append").parquet(src)

    state = str(tmp_path / "state")
    ing = StreamingERIngest(spark, entry.CORPUS_WORD2NER, state)
    q = ing.start(src, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    norms = {r.norm for r in ing.current_clusters().collect()}
    assert {"table_scan", "hash_join"} <= norms
