"""Ontology-hierarchy maintenance: per-parent mean embeddings (A5) and
cluster hygiene (G5).

The reference maintains a memmapped KB hierarchy and, in cleanup_kb
(/root/reference/ontology/ontology_kb.py:1059-1153), walks it
level-by-level: every parent's embedding becomes the mean of its
children's embeddings (kb.py:1123), and parents whose cluster fell
below ``min_cluster_size`` are deleted with their children reattached
one level up (kb.py:1091-1096 — "declustered").

Here the hierarchy is a DataFrame ``(id, parent, level, vec)`` and the
sweep is a bounded bottom-up loop of joins/aggregations — each level is
one shuffle by parent id, so a 10^9-node taxonomy with <=8 levels is 8
grouped aggregations, not a driver walk.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parent_mean_embeddings(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    vec_col: str = "vec",
) -> DataFrame:
    """A5 (kb.py:1113-1123): (parent, vec = unweighted mean of children
    vecs, n_children). ``applyInPandas`` grouped map — groups are one
    parent's direct children (bounded by design: hygiene dissolves tiny
    clusters and the builder splits huge ones)."""

    def mean_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        return pd.DataFrame(
            {
                "parent": [key[0]],
                "vec": [vecs.mean(axis=0).astype(np.float32).tolist()],
                "n_children": [len(pdf)],
            }
        )

    return (
        nodes.filter(F.col(parent_col).isNotNull())
        .select(F.col(parent_col), F.col(vec_col))
        .groupBy(parent_col)
        .applyInPandas(
            mean_group, schema="parent string, vec array<float>, n_children long"
        )
    )


def cluster_hygiene(
    nodes: DataFrame,
    min_cluster_size: int = 2,
    max_level: int | None = None,
    recompute_means: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """G5 (cleanup_kb, kb.py:1059-1153): bottom-up sweep.

    nodes: (id, parent, level, vec) — level 0 = leaves; parent of the
    root is NULL. Per level L (ascending):

    1. parents at level L with < ``min_cluster_size`` children are
       DELETED; their children reattach to the deleted parent's parent
       (the reference's decluster + reattach, kb.py:1091-1096);
    2. surviving parents at level L get vec = mean(children vecs)
       (kb.py:1123) when ``recompute_means``.

    Returns (new_nodes, deleted) where deleted is (id, level). Each
    level is two joins + one grouped aggregation; the loop is bounded by
    the hierarchy depth, not the node count."""
    if max_level is None:
        max_level = nodes.agg(F.max("level")).first()[0] or 0
    cur = nodes.localCheckpoint(eager=True)
    deleted_all = None
    for lvl in range(1, max_level + 1):
        counts = (
            cur.filter(F.col("level") == lvl - 1)
            .filter(F.col("parent").isNotNull())
            .groupBy(F.col("parent").alias("cnt_parent"))
            .agg(F.count("*").alias("n_children"))
        )
        lvl_nodes = cur.filter(F.col("level") == lvl)
        small = (
            lvl_nodes.join(counts, lvl_nodes["id"] == counts["cnt_parent"], "left")
            .withColumn("n_children", F.coalesce("n_children", F.lit(0)))
            .filter(F.col("n_children") < min_cluster_size)
            .select(
                lvl_nodes["id"].alias("small_id"),
                lvl_nodes["level"].alias("small_level"),
                lvl_nodes["parent"].alias("grandparent"),
            )
            # tiny (dissolved parents only), consumed three times, and
            # sharing lineage with cur — materialize to break the
            # ambiguous self-join and avoid recomputing the count join
            .localCheckpoint(eager=True)
        )
        # reattach children of dissolved parents one level up
        cur = (
            cur.join(small, cur["parent"] == small["small_id"], "left")
            .withColumn(
                "parent",
                F.when(
                    F.col("small_id").isNotNull(), F.col("grandparent")
                ).otherwise(F.col("parent")),
            )
            .drop("small_id", "small_level", "grandparent")
        )
        # drop the dissolved parents themselves
        cur = cur.join(
            small.select(F.col("small_id").alias("id")), "id", "left_anti"
        )
        if recompute_means:
            means = parent_mean_embeddings(cur.filter(F.col("level") == lvl - 1))
            cur = (
                cur.join(
                    means.select(
                        F.col("parent").alias("id"),
                        F.col("vec").alias("new_vec"),
                    ),
                    "id",
                    "left",
                )
                .withColumn("vec", F.coalesce("new_vec", "vec"))
                .drop("new_vec")
            )
        cur = cur.localCheckpoint(eager=True)
        dl = small.select(
            F.col("small_id").alias("id"), F.col("small_level").alias("level")
        )
        deleted_all = dl if deleted_all is None else deleted_all.unionByName(dl)
    if deleted_all is None:
        deleted_all = cur.select("id", "level").limit(0)
    return cur, deleted_all
