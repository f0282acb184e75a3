"""Appendix benchmark: distinct-text extraction (cfg.dedup_texts) vs the
per-document path on a crawl-shaped input.

The scaling benchmark's graded input replicates a 20k-document corpus to
millions of urls with DUPLICATED texts — exactly the shape Common-Crawl
re-crawls have (many pages, a bounded distinct-text set). The graded
number keeps the per-document path (extraction cost scales with rows);
this appendix measures what `PipelineConfig(dedup_texts=True)` buys on
the same input: the matcher runs once per distinct (lang, normalized
text) and mention rows fan back out by url, with row-set identity pinned
by tests/test_extract_dedup.py.

Usage: python scripts/dedup_bench.py [--docs N] [--cores C]
Prints one JSON line: wall seconds + docs/sec for both paths.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DOCS = 20_000
N_ENTITIES = 480
SEED = 42


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kawa_spark.config import PipelineConfig
    from kawa_spark.pipeline import ERPipeline
    from kawa_spark.session import get_spark
    from kawa_spark.testgen import corpus_to_pandas, generate

    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name="kawa_dedup_bench",
        shuffle_partitions=args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = generate(n_docs=BASE_DOCS, n_entities=N_ENTITIES, seed=SEED)
    docs_pd, _, _, _ = corpus_to_pandas(corpus)
    base = spark.createDataFrame(docs_pd[["url", "text", "lang"]])
    mult = max(1, args.docs // BASE_DOCS)
    docs = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        .withColumn("url", F.concat_ws("#", "url", "rep"))
        .select("url", "text", "lang")
        .repartition(args.cores * 4)
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    word2ner = [list(r) for r in corpus.word2ner]

    # untimed warm-up (python pool + codegen), same as scaling_bench
    warm = base.limit(2000).repartition(args.cores).localCheckpoint(eager=True)
    for dedup in (False, True):
        pipe = ERPipeline(
            spark, word2ner, embeddings=corpus.embeddings,
            cfg=PipelineConfig(dedup_texts=dedup),
        )
        pipe.run(warm).write.format("noop").mode("overwrite").save()
        pipe.unpersist()

    out = {"n_docs": n_docs, "cores": args.cores,
           "distinct_texts": BASE_DOCS, "dup_factor": mult}
    for key, dedup in (("per_document", False), ("dedup_texts", True)):
        pipe = ERPipeline(
            spark, word2ner, embeddings=corpus.embeddings,
            cfg=PipelineConfig(dedup_texts=dedup),
        )
        t0 = time.time()
        pipe.run(docs).write.format("noop").mode("overwrite").save()
        secs = time.time() - t0
        stages = {m.name: round(m.seconds, 2) for m in pipe.metrics}
        pipe.unpersist()
        out[key] = {
            "seconds": round(secs, 2),
            "docs_per_sec": round(n_docs / secs, 1),
            "stages": stages,
        }
        print(f"  {key}: {secs:.2f}s", file=sys.stderr)
    out["speedup"] = round(
        out["per_document"]["seconds"] / out["dedup_texts"]["seconds"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
