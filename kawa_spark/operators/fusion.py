"""Cluster fusion (survivorship): elect one golden record per entity
cluster from its member rows' attributes.

After clustering, every downstream consumer wants ONE value per
attribute per entity. The classic survivorship rules (data-fusion
literature: Bleiholder & Naumann's fusion functions; "golden record" in
MDM practice) are each one native aggregate here — no window, no
Python, one partial-agg shuffle on the cluster key (plus one
pre-aggregating shuffle per ``majority`` column, since the mode needs a
per-value count first):

* ``majority``   — most frequent non-null value; ties broken toward the
                   bytewise-greatest value (deterministic under any
                   partitioning).
* ``longest``    — longest string; ties toward bytewise-greatest.
* ``latest``     — value carried by the row with the greatest order
                   column (e.g. crawl timestamp); ties toward the
                   bytewise-greatest value.
* ``min``/``max``— plain extrema.

Scale shape: ``majority`` columns each cost one extra (cluster, value)
partial-agg exchange — counts combine map-side, so a hot cluster never
concentrates rows in one task; the per-column golden tables then
equi-join on the cluster key (each at most one row per cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuse_clusters(
    df: DataFrame,
    cluster_col: str,
    rules: dict[str, tuple],
) -> DataFrame:
    """``rules``: output column -> rule tuple, one of
    ``("majority", col)``, ``("longest", col)``,
    ``("latest", col, order_col)``, ``("min", col)``, ``("max", col)``.

    Returns one row per cluster: (cluster_col, *rules.keys()).
    NULL attribute values never win any rule (they are filtered from
    the candidate set); a cluster whose values are all NULL for a
    column gets NULL.
    """
    simple_aggs = []
    majority_parts = []
    for out, rule in rules.items():
        kind = rule[0]
        if kind == "majority":
            majority_parts.append((out, rule[1]))
        elif kind == "longest":
            col = F.col(rule[1])
            simple_aggs.append(
                F.max(
                    F.when(
                        col.isNotNull(), F.struct(F.length(col).alias("l"), col.alias("v"))
                    )
                )["v"].alias(out)
            )
        elif kind == "latest":
            col, order_col = F.col(rule[1]), F.col(rule[2])
            simple_aggs.append(
                F.max(
                    F.when(
                        col.isNotNull() & order_col.isNotNull(),
                        F.struct(order_col.alias("o"), col.alias("v")),
                    )
                )["v"].alias(out)
            )
        elif kind == "min":
            simple_aggs.append(F.min(rule[1]).alias(out))
        elif kind == "max":
            simple_aggs.append(F.max(rule[1]).alias(out))
        else:
            raise ValueError(f"unknown fusion rule: {rule!r}")

    if not simple_aggs and not majority_parts:
        raise ValueError("fuse_clusters needs at least one rule")
    if simple_aggs:
        golden = df.groupBy(cluster_col).agg(*simple_aggs)
    else:
        # majority-only: the cluster universe must not depend on the
        # first majority column being non-null somewhere
        golden = df.select(cluster_col).distinct()
    for out, src in majority_parts:
        counted = (
            df.filter(F.col(src).isNotNull())
            .groupBy(cluster_col, src)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        modal = counted.groupBy(cluster_col).agg(
            F.max(F.struct(F.col("_n"), F.col(src).alias("v")))["v"].alias(out)
        )
        golden = golden.join(modal, cluster_col, "left")
    # column order: cluster key, then rules in declaration order
    return golden.select(cluster_col, *rules.keys())
