"""Star clustering: diameter-2 entity clusters from a match-edge list.

Deterministic single-pass variant of star clustering (Aslam, Pelekhov &
Rus, JGAA 2004): a node is a *center* iff no neighbor dominates it
under the (degree, smaller-id) total order; every non-center attaches
to its best center neighbor (max degree, min id); non-centers with no
center neighbor fall back to singletons. Clusters therefore have
diameter <= 2 through their center — star clustering structurally
cannot chain-merge, which makes it the repair-minded alternative to
``connected_components`` when transitive closure daisy-chains
borderline matches into hair-balls (see ``component_metrics``).

This is an extension beyond the reference (its clustering is the
union-find closure, ontology-side), added for over-merge control; it is
exposed both as the ``star_clusters`` oracle-backed query and as
``PipelineConfig(clustering="star")``.

Scale shape (10^12 docs): one symmetrize projection, one degree
partial-agg shuffle, two node-key equi-joins, one domination
partial-agg, one attachment window whose partitions are bounded by the
max degree (which blocking bounds) — no iteration, no driver state, no
UDF. Contrast with CC's O(log n) star rounds each costing two joins
plus a checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def star_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """edge list -> (node, component, is_center). Like
    ``connected_components``, only nodes that appear in the edge list
    are emitted; callers coalesce(component, node) for singletons.
    ``component`` is the center's node id (or the node itself for
    orphan fallbacks), so labels are stable across re-partitioning."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    dega = deg.select(F.col("a").alias("na"), F.col("deg").alias("deg_a"))
    degb = deg.select(F.col("a").alias("nb"), F.col("deg").alias("deg_b"))
    nbr = (
        sym.join(dega, sym["a"] == dega["na"])
        .join(degb, sym["b"] == degb["nb"])
        .select("a", "b", "deg_a", "deg_b")
    )
    dominated = F.max(
        F.when(
            (F.col("deg_b") > F.col("deg_a"))
            | ((F.col("deg_b") == F.col("deg_a")) & (F.col("b") < F.col("a"))),
            1,
        ).otherwise(0)
    )
    centers = (
        nbr.groupBy("a")
        .agg(dominated.alias("dom"))
        .filter(F.col("dom") == 0)
        .select("a")
    )
    cand = nbr.join(
        centers.withColumnRenamed("a", "c"), nbr["b"] == F.col("c")
    ).join(centers, "a", "left_anti")
    w = Window.partitionBy("a").orderBy(F.col("deg_b").desc(), F.col("b"))
    attached = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("a", "b")
    )
    return (
        centers.select(
            F.col("a").alias("node"),
            F.col("a").alias("component"),
            F.lit(1).alias("is_center"),
        )
        .unionAll(
            attached.select(
                F.col("a").alias("node"),
                F.col("b").alias("component"),
                F.lit(0).alias("is_center"),
            )
        )
        .unionAll(
            deg.join(centers, "a", "left_anti")
            .join(attached.select("a"), "a", "left_anti")
            .select(
                F.col("a").alias("node"),
                F.col("a").alias("component"),
                F.lit(0).alias("is_center"),
            )
        )
    )
