"""spark-submit entry point for the ER pipeline (north rule,
BASELINE.json:14: "run via spark-submit --py-files on a multi-executor
cluster").

Usage (cluster):
    spark-submit --py-files "$(python -c 'import sys; sys.path.insert(0, "."); \
        from kawa_spark.session import package_zip; print(package_zip())')" \
        scripts/submit_pipeline.py \
        --input  s3://bucket/pages/        \
        --lexicon s3://bucket/word2ner.parquet \
        --out    s3://bucket/er_out/       \
        --resume

Usage (sandbox smoke):
    python scripts/submit_pipeline.py --input /root/testdata/sf0.001 \
        --out /tmp/er_out

The input is the contract page table (url, warc_ts, html, text, lang) —
Iceberg via --table, or a parquet path. Each stage writes parquet +
manifest under --out; --resume skips stages whose manifest matches the
config fingerprint (per-partition lineage rows inside).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet dir of pages, or a testdata sf dir")
    ap.add_argument("--table", default=None,
                    help="Iceberg/catalog table name instead of --input path")
    ap.add_argument("--lexicon", default=None,
                    help="parquet of word2ner (word,label,weight,idx); "
                         "default: built-in corpus lexicon")
    ap.add_argument("--out", required=True, help="stage output root")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--cannot-link", default=None,
                    help="parquet of (norm_a, norm_b) adjudicated-distinct "
                         "pairs; guaranteed split in the output clusters")
    ap.add_argument("--must-link", default=None,
                    help="parquet of (norm_a, norm_b) adjudicated-same "
                         "pairs; always co-clustered (cannot-link wins "
                         "on contradiction)")
    ap.add_argument("--fs-scoring", action="store_true",
                    help="EM-calibrated Fellegi-Sunter edge selection "
                         "instead of the fixed weighted-mean threshold")
    ap.add_argument("--clustering", default="cc", choices=["cc", "star"],
                    help="cluster strategy: transitive closure (default) "
                         "or diameter-2 star clustering (over-merge "
                         "control; incompatible with --must-link)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kawa_spark.pipeline import ERPipeline
    from kawa_spark.session import get_spark, ship_package

    # under spark-submit the master/deploy conf comes from the launcher;
    # only fall back to local for direct python invocation
    if SparkSession.getActiveSession() is None and "SPARK_ENV_LOADED" not in os.environ:
        spark = get_spark(master="local[8]", shuffle_partitions=args.shuffle_partitions or 8)
    else:
        spark = SparkSession.builder.getOrCreate()
        ship_package(spark)
        if args.shuffle_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))

    if args.table:
        docs = spark.table(args.table)
    else:
        path = args.input
        cand = os.path.join(path, "documents.parquet")
        if os.path.exists(cand):  # testdata sf dir convenience
            docs = (
                spark.read.parquet(cand)
                .select(
                    F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
                    "text",
                    "lang",
                )
            )
        else:
            docs = spark.read.parquet(path)
    docs = docs.select("url", "text", "lang")

    if args.lexicon:
        rows = spark.read.parquet(args.lexicon).collect()
        word2ner = [[r["word"], r["label"], float(r["weight"] or 0.0), i]
                    for i, r in enumerate(rows)]
    else:
        import __spark_entry__ as entry

        word2ner = entry.CORPUS_WORD2NER

    os.makedirs(args.out, exist_ok=True)
    for stage in ["mentions", "surfaces", "block_keys", "pairs", "edges", "clusters"]:
        os.makedirs(os.path.join(args.out, stage), exist_ok=True)

    from kawa_spark.config import PipelineConfig

    cfg = (
        PipelineConfig(
            fs_scoring=args.fs_scoring, clustering=args.clustering
        )
        if (args.fs_scoring or args.clustering != "cc")
        else None
    )
    cl = spark.read.parquet(args.cannot_link) if args.cannot_link else None
    ml = spark.read.parquet(args.must_link) if args.must_link else None
    pipe = ERPipeline(
        spark, word2ner, out_dir=args.out, cfg=cfg,
        cannot_link=cl, must_link=ml,
    )
    clusters = pipe.run(docs, resume=args.resume)
    n = clusters.count()
    report = {
        "clusters_rows": n,
        "stages": [
            {"stage": m.name, "rows": m.rows, "sec": round(m.seconds, 2),
             "resumed": m.resumed}
            for m in pipe.metrics
        ],
        "out": args.out,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
