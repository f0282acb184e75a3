"""CDC streaming linkage: micro-batches carrying an ``op`` column
(upsert/delete) folded through retract_docs + incremental_link must
leave the standing state EXACTLY equal to a batch run over the NET
corpus (latest add wins per url; deleted urls absent) — for adds,
deletes, re-crawls with changed text, delete-then-re-add, and the
within-batch upsert-wins tie rule."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kawa_spark.pipeline import ERPipeline
from kawa_spark.streaming.linker import StreamingLinker
from kawa_spark.testgen import corpus_to_pandas, generate


@pytest.fixture(scope="module")
def corpus():
    return generate(n_docs=80, n_entities=24, seed=17)


@pytest.fixture(scope="module")
def docs_pd(corpus):
    docs, _, _, _ = corpus_to_pandas(corpus)
    return docs[["url", "text", "lang"]]


CDC_SCHEMA = "url string, text string, lang string, op string"


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text", "lang", "op"]),
        schema=CDC_SCHEMA,
    )


def _surface_map(df):
    return {
        r["norm"]: r["cluster_id"]
        for r in df.groupBy("norm")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .collect()
    }


def _apply_ops(net: dict, rows):
    for url, text, lang, op in rows:
        if op == "delete":
            net.pop(url, None)
        else:
            net[url] = (text, lang)
    return net


def _net_df(spark, net):
    return spark.createDataFrame(
        pd.DataFrame(
            [(u, t, l) for u, (t, l) in sorted(net.items())],
            columns=["url", "text", "lang"],
        )
    )


def test_cdc_stream_equals_net_batch_run(spark, corpus, docs_pd, tmp_path):
    rows = list(docs_pd.itertuples(index=False, name=None))
    third = len(rows) // 3

    # batch 0: add the first two thirds
    b0 = [(u, t, l, "upsert") for u, t, l in rows[: 2 * third]]
    # batch 1: delete some, re-crawl others with CHANGED text, add fresh
    dels = [(u, None, None, "delete") for u, t, l in rows[:10]]
    recrawls = [
        (u, rows[(i + 1) % len(rows)][1], l, "upsert")
        for i, (u, t, l) in enumerate(rows[10:20])
    ]
    fresh = [(u, t, l, "upsert") for u, t, l in rows[2 * third :]]
    b1 = dels + recrawls + fresh
    # batch 2: re-add two deleted urls, delete a re-crawled one, and the
    # within-batch tie: url deleted AND upserted in the same batch
    readds = [(u, t, l, "upsert") for u, t, l in rows[:2]]
    del2 = [(rows[10][0], None, None, "delete")]
    tie_url, tie_text, tie_lang = rows[30]
    tie = [(tie_url, None, None, "delete"), (tie_url, tie_text, tie_lang, "upsert")]
    b2 = readds + del2 + tie

    pipe = ERPipeline(spark, corpus.word2ner, corpus.embeddings)
    lk = StreamingLinker(pipe, str(tmp_path / "cdc"))

    net: dict = {}
    for i, rows_i in enumerate((b0, b1, b2)):
        lk.process_batch(_batch(spark, rows_i), i)
        _apply_ops(net, rows_i)

    full = ERPipeline(spark, corpus.word2ner, corpus.embeddings).run(
        _net_df(spark, net)
    )
    assert _surface_map(lk.current_clusters()) == _surface_map(full)

    # the live mention view carries exactly the net corpus's mention
    # rows under the batch run's cluster ids
    live = {
        (r["url"], r["mention_id"]): r["cluster_id"]
        for r in lk.live_mentions().collect()
    }
    want = {
        (r["url"], r["mention_id"]): r["cluster_id"] for r in full.collect()
    }
    assert live == want
    # tie rule: the url is PRESENT with its upserted text
    assert any(u == tie_url for u, _ in live)


def test_cdc_replay_is_noop(spark, corpus, docs_pd, tmp_path):
    rows = list(docs_pd.itertuples(index=False, name=None))
    b0 = [(u, t, l, "upsert") for u, t, l in rows[:30]]
    b1 = [(u, None, None, "delete") for u, t, l in rows[:5]]

    pipe = ERPipeline(spark, corpus.word2ner, corpus.embeddings)
    lk = StreamingLinker(pipe, str(tmp_path / "replay"))
    lk.process_batch(_batch(spark, b0), 0)
    lk.process_batch(_batch(spark, b1), 1)
    before = _surface_map(lk.current_clusters())
    lk.process_batch(_batch(spark, b1), 1)  # replayed commit: no-op
    assert _surface_map(lk.current_clusters()) == before


def test_cdc_from_bootstrap_batch_run(spark, corpus, docs_pd, tmp_path):
    """Seed from a completed batch run (state + mention history), then
    delete bootstrap-era urls through the stream: the retraction must
    see the bootstrap mentions."""
    from kawa_spark.operators.incremental import ERState

    rows = list(docs_pd.itertuples(index=False, name=None))
    base = spark.createDataFrame(
        pd.DataFrame(rows[:50], columns=["url", "text", "lang"])
    )
    out = str(tmp_path / "base")
    pipe = ERPipeline(
        spark, corpus.word2ner, corpus.embeddings, out_dir=out
    )
    base_clusters = pipe.run(base)
    state = ERState.from_out_dir(spark, out)

    lk = StreamingLinker(
        pipe, str(tmp_path / "boot"), bootstrap=state,
        bootstrap_clusters=base_clusters,
    )
    b0 = [(u, None, None, "delete") for u, t, l in rows[:8]] + [
        (u, t, l, "upsert") for u, t, l in rows[50:60]
    ]
    lk.process_batch(_batch(spark, b0), 0)

    net: dict = {u: (t, l) for u, t, l in rows[:50]}
    _apply_ops(net, b0)
    full = ERPipeline(spark, corpus.word2ner, corpus.embeddings).run(
        _net_df(spark, net)
    )
    assert _surface_map(lk.current_clusters()) == _surface_map(full)
