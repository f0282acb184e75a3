"""Connected components via alternating large-star / small-star.

The reference resolves relation groups with a sequential, order-dependent
neighbor merge (/root/reference/ontology/ontology_builder.py:139-181);
we replace it with the shuffle-native large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
as BASELINE.json:14 mandates: iterative DataFrame self-joins,
checkpointed per iteration (lineage truncation — without it the plan
grows exponentially), O(log n) rounds.

Node ids are compared lexicographically (sha1 hex mention ids);
the component id is the lexicographic minimum — deterministic under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ckpt(df: DataFrame, reliable: bool) -> DataFrame:
    """Lineage-truncating materialization for the iterative loop.

    localCheckpoint blocks die with their executor — at cluster scale
    that turns one node loss into a job failure (round-1 review) — so
    callers with durable state (ERPipeline with an out_dir, which also
    sets the session checkpoint dir) pass ``reliable=True`` for a real
    checkpoint; local benches keep the cheaper localCheckpoint."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("m", F.least("u", "mn")).drop("mn")
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """On edges oriented large->small: connect all small neighbors of u
    (and u itself) to the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return relinked


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """edge list -> (node, component). Non-singleton nodes only; callers
    coalesce(component, node) for singletons."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = _ckpt(e, reliable_checkpoints)
    # Convergence probe (count + order-free xxhash fold) only every OTHER
    # iteration: each probe is a blocking driver round-trip, and with
    # typical convergence in <=10 star rounds the serial-sync count is
    # what a 1000-executor cluster feels, not the probe's data volume.
    # Worst case this runs one extra (cheap, already-converged) round.
    # The up-front take(1) empty-guard is folded into the first probe.
    prev_sig = None
    for it in range(max_iter):
        e = _small_star(_large_star(e))
        e = _ckpt(e, reliable_checkpoints)  # truncate the iterative lineage
        if it % 2 == 0 and it + 1 < max_iter:
            continue
        sig = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        sig = (sig["n"], sig["h"])
        if sig == prev_sig or sig[0] == 0:
            break
        prev_sig = sig
    # converged: every edge points node -> its component minimum
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("component"))
    )
    return comp.groupBy("node").agg(F.min("component").alias("component"))


def assign_clusters(mentions: DataFrame, components: DataFrame) -> DataFrame:
    """All mentions -> cluster_id (= component min id; singletons keep
    their own mention_id)."""
    return (
        mentions.join(
            components, mentions["mention_id"] == components["node"], "left"
        )
        .drop("node")
        .withColumn("cluster_id", F.coalesce("component", "mention_id"))
        .drop("component")
    )


def assign_surface_clusters(
    mentions: DataFrame, surfaces: DataFrame, components: DataFrame
) -> DataFrame:
    """Mentions -> cluster_id via their surface form.

    ``surfaces`` is (norm, surface_id = min mention_id of that norm);
    ``components`` is (node=surface_id, component). Every mention of a
    norm inherits the surface's component (or the surface_id itself for
    singleton surfaces). The surfaces table is orders of magnitude
    smaller than the mention stream (distinct forms vs occurrences), so
    this join is the cheap direction; at web scale the surface side is
    still distributed (no broadcast assumed)."""
    surf = (
        surfaces.join(components, surfaces["surface_id"] == components["node"], "left")
        .withColumn("cluster_id", F.coalesce("component", "surface_id"))
        .select("norm", "cluster_id")
    )
    return mentions.join(surf, "norm", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", "mention_id")
    )
