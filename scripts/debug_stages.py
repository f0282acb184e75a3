"""Debug: per-stage wall time of the scaling-bench job at N cores."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(cores: int, total_docs: int) -> None:
    from pyspark.sql import functions as F

    from kawa_spark.config import DEFAULT_CONFIG as cfg
    from kawa_spark.operators.blocking import add_block_keys, candidate_pairs
    from kawa_spark.operators.cc import assign_surface_clusters, connected_components
    from kawa_spark.operators.extract import extract_mentions, split_outputs
    from kawa_spark.operators.scoring import match_edges, score_pairs
    from kawa_spark.session import get_spark
    from kawa_spark.testgen import corpus_to_pandas, generate

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = generate(n_docs=20_000, n_entities=480, seed=42)
    docs_pd, _, _, _ = corpus_to_pandas(corpus)
    base = spark.createDataFrame(docs_pd[["url", "text", "lang"]])
    mult = max(1, total_docs // 20_000)
    docs = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        .withColumn("url", F.concat_ws("#", "url", "rep"))
        .select("url", "text", "lang")
        .repartition(cores * 4)
        .localCheckpoint(eager=True)
    )
    word2ner = [list(r) for r in corpus.word2ner]

    _warm = F.pandas_udf(lambda v: v * 1.0, "double")
    spark.range(0, 1 << 18, 1, cores * 2).select(
        F.sum(_warm((F.col("id") % 97).cast("double")))
    ).collect()
    spark.range(0, 10_000, 1, cores * 2).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    from pyspark import StorageLevel

    def step(name, df):
        t = time.time()
        df = df.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        print(json.dumps({"stage": name, "sec": round(time.time() - t, 2)}))
        return df

    t_all = time.time()
    mentions = step(
        "mentions",
        extract_mentions(docs, word2ner, cfg, emit_text=False).filter(
            F.col("mention").isNotNull()
        ),
    )
    surfaces = step(
        "surfaces",
        mentions.groupBy("norm").agg(
            F.min("mention_id").alias("surface_id"), F.count("*").alias("n_mentions")
        ),
    )
    keyed = step(
        "block_keys",
        add_block_keys(
            surfaces.select(F.col("surface_id").alias("mention_id"), "norm"), cfg
        ),
    )
    pairs = step("pairs", candidate_pairs(keyed, cfg))
    edges = step("edges", match_edges(score_pairs(pairs, corpus.embeddings, cfg), cfg))
    t = time.time()
    comp = connected_components(edges, max_iter=cfg.cc_max_iter)
    comp = comp.localCheckpoint(eager=True)
    print(json.dumps({"stage": "cc", "sec": round(time.time() - t, 2)}))
    t = time.time()
    clusters = assign_surface_clusters(mentions, surfaces, comp)
    clusters.write.format("noop").mode("overwrite").save()
    print(json.dumps({"stage": "assign+noop", "sec": round(time.time() - t, 2)}))
    print(json.dumps({"stage": "TOTAL", "sec": round(time.time() - t_all, 2)}))


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
