"""StreamingLinker: every micro-batch folded through incremental_link
must leave the standing state EXACTLY equal to a batch run over all
documents seen so far — for any split of the stream into batches — and
replayed batch ids must be no-ops (exactly-once on a plain file sink)."""

import os

import pytest
from pyspark.sql import functions as F

from kawa_spark.pipeline import ERPipeline
from kawa_spark.streaming.linker import StreamingLinker
from kawa_spark.testgen import corpus_to_pandas, generate


@pytest.fixture(scope="module")
def corpus():
    return generate(n_docs=90, n_entities=24, seed=13)


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    docs, _, _, _ = corpus_to_pandas(corpus)
    return spark.createDataFrame(docs)


def _surface_map(df):
    return {
        r["norm"]: r["cluster_id"]
        for r in df.groupBy("norm")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .collect()
    }


def _mention_map(df):
    return {
        r["mention_id"]: r["cluster_id"]
        for r in df.select("mention_id", "cluster_id").collect()
    }


def _parts(docs_df, n):
    h = F.pmod(F.xxhash64("url"), F.lit(n))
    return [docs_df.filter(h == i) for i in range(n)]


def test_three_batch_fold_equals_full(spark, corpus, docs_df, tmp_path):
    pipe = ERPipeline(spark, corpus.word2ner, corpus.embeddings)
    lk = StreamingLinker(pipe, str(tmp_path / "st"))
    for i, p in enumerate(_parts(docs_df, 3)):
        lk.process_batch(p, i)

    full = ERPipeline(spark, corpus.word2ner, corpus.embeddings).run(docs_df)
    assert _surface_map(lk.current_clusters()) == _surface_map(full)
    # mention-level view re-labels history through the current map
    assert _mention_map(lk.mentions_view()) == _mention_map(full)


def test_replayed_batch_is_noop(spark, corpus, docs_df, tmp_path):
    parts = _parts(docs_df, 3)
    pipe = ERPipeline(spark, corpus.word2ner, corpus.embeddings)
    lk = StreamingLinker(pipe, str(tmp_path / "st"))
    lk.process_batch(parts[0], 0)
    lk.process_batch(parts[1], 1)
    before = _surface_map(lk.current_clusters())
    # a replay delivers batch_id=1 again — even with different content
    # the committed pointer makes it a no-op (foreachBatch retry model)
    lk.process_batch(parts[2], 1)
    assert _surface_map(lk.current_clusters()) == before
    assert lk._read_pointer()["batch_id"] == 1


def test_stream_availablenow_one_file_per_batch(spark, corpus, docs_df, tmp_path):
    """End-to-end through readStream/foreachBatch: each landed file is
    its own micro-batch (maxFilesPerTrigger=1), in whatever order the
    file source picks — the exactness contract is split-invariant."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing, exist_ok=True)
    for p in _parts(docs_df, 3):
        p.coalesce(1).write.mode("append").parquet(landing)

    pipe = ERPipeline(spark, corpus.word2ner, corpus.embeddings)
    lk = StreamingLinker(pipe, str(tmp_path / "st"))
    q = lk.start(
        landing,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    assert lk._read_pointer()["batch_id"] >= 1, "expected multiple batches"

    full = ERPipeline(spark, corpus.word2ner, corpus.embeddings).run(docs_df)
    assert _surface_map(lk.current_clusters()) == _surface_map(full)
    assert _mention_map(lk.mentions_view()) == _mention_map(full)


def test_bootstrap_from_batch_state(spark, corpus, docs_df, tmp_path):
    """Seeding the stream from a completed batch run's checkpoint state
    (the batch->stream handoff) preserves exactness."""
    from kawa_spark.operators.incremental import ERState

    parts = _parts(docs_df, 3)
    base = parts[0].unionByName(parts[1])
    pipe = ERPipeline(
        spark, corpus.word2ner, corpus.embeddings,
        out_dir=str(tmp_path / "batch"),
    )
    pipe.run(base)
    boot = ERState.from_out_dir(spark, str(tmp_path / "batch"))

    lk = StreamingLinker(pipe, str(tmp_path / "st"), bootstrap=boot)
    lk.process_batch(parts[2], 0)

    full = ERPipeline(spark, corpus.word2ner, corpus.embeddings).run(docs_df)
    assert _surface_map(lk.current_clusters()) == _surface_map(full)
