"""Appendix benchmark: join-based extraction (cfg.extract_strategy=
"join") vs the broadcast path, extraction stage only.

The join fallback exists for lexicons too big to hold per Python worker
(~8.5M surface forms) — below the broadcast guards it is expected to be
SLOWER (it adds a distinct shuffle, the probe equi-join, and a second
documents pass in exchange for O(1)-per-worker lexicon memory). This
measures the overhead factor honestly on the synthetic corpus so the
crossover reasoning in README/BENCH.md rests on a number, not prose.

Usage: python scripts/extract_join_bench.py [--docs N] [--cores C]
Prints one JSON line.
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
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kawa_spark.config import PipelineConfig
    from kawa_spark.operators.extract import extract_mentions
    from kawa_spark.operators.extract_join import extract_mentions_join
    from kawa_spark.session import get_spark
    from kawa_spark.testgen import corpus_to_pandas, generate

    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name="kawa_extract_join_bench",
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
    cfg = PipelineConfig()

    # untimed warm-up (python pool + codegen + matcher/cascade builds)
    warm = base.limit(2000).repartition(args.cores).localCheckpoint(eager=True)
    extract_mentions(warm, word2ner, cfg, emit_text=False).write.format(
        "noop"
    ).mode("overwrite").save()
    extract_mentions_join(warm, word2ner, cfg, emit_text=False).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {"n_docs": n_docs, "cores": args.cores,
           "lexicon_rows": len(word2ner)}
    for key, fn in (("broadcast", extract_mentions),
                    ("join", extract_mentions_join)):
        t0 = time.time()
        fn(docs, word2ner, cfg, emit_text=False).write.format("noop").mode(
            "overwrite"
        ).save()
        secs = time.time() - t0
        out[key] = {"seconds": round(secs, 2),
                    "docs_per_sec": round(n_docs / secs, 1)}
        print(f"  {key}: {secs:.2f}s", file=sys.stderr)
    out["join_overhead_factor"] = round(
        out["join"]["seconds"] / out["broadcast"]["seconds"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
