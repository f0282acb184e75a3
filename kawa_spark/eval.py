"""Evaluation: pairwise P/R/F1 within blocking keys + NER string-match F1.

Pairwise metric (BASELINE.json:2): over labeled within-block mention
pairs, predicted-match = same cluster_id, gold-match = same entity_id;
F1 = 2PR/(P+R). NER metric mirrors the reference's type-insensitive
exact-string evaluation (/root/reference/eval.py:173-199).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def labeled_pairs_from_truth(
    clusters: DataFrame, truth: DataFrame, keyed: DataFrame
) -> DataFrame:
    """Join gold entity ids onto within-block candidate pairs.

    clusters: (mention_id, norm, cluster_id, ...); truth: (surface,
    entity_id) with surface = connector-free lowercase form; keyed:
    (mention_id, block_key). Pairs = same block key, id_a < id_b."""
    m = (
        clusters.select("mention_id", "norm", "cluster_id")
        .withColumn("surface", F.regexp_replace("norm", "_", " "))
        .join(truth.withColumn("surface", F.lower("surface")), "surface", "left")
    )
    k = keyed.select("mention_id", "block_key")
    a = m.join(k, "mention_id").select(
        F.col("mention_id").alias("id_a"),
        F.col("cluster_id").alias("cl_a"),
        F.col("entity_id").alias("ent_a"),
        "block_key",
    )
    b = m.join(k, "mention_id").select(
        F.col("mention_id").alias("id_b"),
        F.col("cluster_id").alias("cl_b"),
        F.col("entity_id").alias("ent_b"),
        "block_key",
    )
    return (
        a.join(b, "block_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("ent_a").isNotNull() & F.col("ent_b").isNotNull())
    )


def pairwise_f1(labeled: DataFrame) -> dict:
    agg = labeled.agg(
        F.sum(
            ((F.col("cl_a") == F.col("cl_b")) & (F.col("ent_a") == F.col("ent_b"))).cast(
                "long"
            )
        ).alias("tp"),
        F.sum(
            ((F.col("cl_a") == F.col("cl_b")) & (F.col("ent_a") != F.col("ent_b"))).cast(
                "long"
            )
        ).alias("fp"),
        F.sum(
            ((F.col("cl_a") != F.col("cl_b")) & (F.col("ent_a") == F.col("ent_b"))).cast(
                "long"
            )
        ).alias("fn"),
    ).first()
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": p, "recall": r, "f1": f1}


def bcubed(assignments: DataFrame) -> dict:
    """B-cubed precision/recall/F1 over (mention_id, cluster_id,
    entity_id) rows (Bagga & Baldwin 1998; extrinsic-measure survey in
    Amigo et al. 2009).

    Per-mention precision = |cluster n entity| / |cluster|, recall =
    |cluster n entity| / |entity|, averaged over mentions. Unlike
    pairwise F1 (which weights a cluster's errors quadratically in its
    size), B3 weights every mention equally — a single over-merged
    mega-cluster cannot hide behind many small correct clusters, and
    vice versa, so the two gates fail independently.

    Distributed shape: per-mention scores are constant within a
    (cluster, entity) cell, so the averages collapse to cell sums —
    precision = (1/N) sum n_ce^2 / n_c, recall = (1/N) sum n_ce^2 / n_e.
    Three partial-agg shuffles (cells, cluster sizes, entity sizes) and
    two joins of aggregated (vocabulary-sized) tables; no pairs are
    materialized, so this runs at corpus scales where O(pairs) metrics
    cannot. Mentions with NULL entity_id (unlabeled) are excluded.
    """
    a = assignments.select("mention_id", "cluster_id", "entity_id").filter(
        F.col("entity_id").isNotNull()
    )
    cells = a.groupBy("cluster_id", "entity_id").agg(F.count("*").alias("n_ce"))
    csize = a.groupBy("cluster_id").agg(F.count("*").alias("n_c"))
    esize = a.groupBy("entity_id").agg(F.count("*").alias("n_e"))
    agg = (
        cells.join(csize, "cluster_id")
        .join(esize, "entity_id")
        .agg(
            F.sum("n_ce").alias("n"),
            F.sum(F.col("n_ce") * F.col("n_ce") / F.col("n_c")).alias("sp"),
            F.sum(F.col("n_ce") * F.col("n_ce") / F.col("n_e")).alias("sr"),
        )
        .first()
    )
    n = agg["n"] or 0
    if not n:
        return {"n": 0, "precision": 1.0, "recall": 1.0, "f1": 1.0}
    p, r = agg["sp"] / n, agg["sr"] / n
    return {
        "n": n,
        "precision": p,
        "recall": r,
        "f1": 2 * p * r / (p + r) if p + r else 0.0,
    }


def ner_string_f1(pred_mentions: DataFrame, gold: DataFrame) -> dict:
    """Type-insensitive exact-string match per the reference harness
    (eval.py:173-188): predicted surface set vs gold surface set."""
    pred = (
        pred_mentions.select(F.lower(F.regexp_replace("mention", "_", " ")).alias("s"))
        .distinct()
        .withColumn("_p", F.lit(1))
    )
    g = gold.select(F.lower("surface").alias("s")).distinct().withColumn(
        "_g", F.lit(1)
    )
    # one full-outer join + one aggregate: tp/fp/fn in a single Spark job
    # (was three separate join+count jobs — round-2 review finding)
    agg = (
        pred.join(g, "s", "full_outer")
        .agg(
            F.sum((F.col("_p").isNotNull() & F.col("_g").isNotNull()).cast("long")).alias("tp"),
            F.sum((F.col("_p").isNotNull() & F.col("_g").isNull()).cast("long")).alias("fp"),
            F.sum((F.col("_p").isNull() & F.col("_g").isNotNull()).cast("long")).alias("fn"),
        )
        .first()
    )
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": p,
        "recall": r,
        "f1": 2 * p * r / (p + r) if p + r else 0.0,
    }
