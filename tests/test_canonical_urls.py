"""cfg.canonical_urls: SURT crawl-alias dedup ahead of the ER pipeline.

Contract: a corpus polluted with alias re-crawls (scheme/www/port/
trailing-slash/tracking-param variants of existing urls, each with an
OLDER warc_ts and possibly drifted text) clusters byte-identically —
urls, mention ids, cluster ids — to the clean corpus, because every
alias loses winner election to the original page.
"""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kawa_spark.config import PipelineConfig
from kawa_spark.operators.urls import dedup_canonical
from kawa_spark.pipeline import ERPipeline
from kawa_spark.testgen import corpus_to_pandas, generate

COLS = ["url", "mention", "start", "end", "label", "norm",
        "mention_id", "cluster_id"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def corpus():
    return generate(n_docs=40, n_entities=20, seed=11)


@pytest.fixture(scope="module")
def clean_df(spark, corpus):
    docs, _, _, _ = corpus_to_pandas(corpus)
    return spark.createDataFrame(docs[["url", "warc_ts", "text", "lang"]])


def _aliased(docs: pd.DataFrame) -> pd.DataFrame:
    """Alias re-crawls for every 3rd doc, one second OLDER, with text
    drift that would pollute clusters if the alias survived."""
    alias = docs.iloc[::3].copy()
    forms = [
        lambda u: "HTTP://WWW." + u.removeprefix("https://") + "/",
        lambda u: u.replace("https://", "https://crawler@") + "?utm_source=x",
        lambda u: u.replace(".example/", ".EXAMPLE:443/") + "#frag",
    ]
    alias["url"] = [forms[i % 3](u) for i, u in enumerate(alias["url"])]
    alias["warc_ts"] = alias["warc_ts"] - dt.timedelta(seconds=1)
    alias["text"] = alias["text"] + " zz_alias_drift zz_alias_drift"
    return pd.concat([docs, alias], ignore_index=True)


@pytest.fixture(scope="module")
def polluted_df(spark, corpus):
    docs, _, _, _ = corpus_to_pandas(corpus)
    return spark.createDataFrame(
        _aliased(docs[["url", "warc_ts", "text", "lang"]])
    )


def test_dedup_canonical_keeps_latest(spark, clean_df, polluted_df):
    out = dedup_canonical(polluted_df)
    assert _rows(out) == _rows(clean_df)


def test_newer_alias_wins(spark, clean_df):
    """Flip the timestamps: a NEWER alias crawl must replace the
    original page, not the other way around."""
    docs = clean_df.toPandas()
    alias = docs.iloc[:1].copy()
    alias["url"] = alias["url"].str.replace("https://", "HTTPS://WWW.")
    alias["warc_ts"] = alias["warc_ts"] + dt.timedelta(days=1)
    out = dedup_canonical(
        spark.createDataFrame(pd.concat([docs, alias], ignore_index=True))
    )
    got = {r["url"] for r in out.collect()}
    assert alias["url"].iloc[0] in got
    assert docs["url"].iloc[0] not in got
    assert len(got) == len(docs)


def test_pipeline_clusters_identical_to_clean(
    spark, corpus, clean_df, polluted_df
):
    base = _rows(ERPipeline(spark, corpus.word2ner).run(clean_df).select(*COLS))
    canon = _rows(
        ERPipeline(
            spark, corpus.word2ner, cfg=PipelineConfig(canonical_urls=True)
        ).run(polluted_df).select(*COLS)
    )
    assert base == canon
    # and the flag actually did something: without it the drifted alias
    # pages contribute extra mentions
    raw = ERPipeline(spark, corpus.word2ner).run(polluted_df)
    assert raw.count() > len(base)


def test_semi_join_plan_shape(spark, polluted_df):
    """Winner election must aggregate only the narrow projection: no
    wide column (text) on the aggregate side of the semi-join."""
    plan = dedup_canonical(polluted_df)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "LeftSemi" in plan
    agg_part = plan[plan.index("Aggregate"):]
    head = agg_part[:agg_part.index("Join") if "Join" in agg_part else len(agg_part)]
    assert "text" not in head
