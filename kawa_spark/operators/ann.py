"""IVF-style ANN index (G4 analog) — the second similarity-search scale
path next to the random-hyperplane LSH buckets in ``__spark_entry__``.

The reference builds a hierarchical embedding index by picking random
head nodes, assigning every vector to its nearest head, and re-bucketing
oversized leaves until they are "relatively balanced"
(create_indexer, /root/reference/ontology/ontology_kb.py:1404-1440).
Spark-first equivalent:

* heads   — a DETERMINISTIC pseudo-random sample: the first ``k`` ids
  ordered by ``md5(seed || vec_id)`` (cross-engine reproducible, unlike
  an RNG — the DuckDB oracle computes the identical head set);
* assign  — broadcast the k heads, argmax cosine per vector (one narrow
  pass; no shuffle on the big side);
* balance — lists over ``cap`` split into ``ceil(n/cap)`` sub-lists by
  md5-hash of the member id (the reference's random re-cluster made
  deterministic); max task input is bounded by cap, the IVF analog of
  the blocking triangle split;
* refine  — optional Lloyd iterations (centroid = per-dim mean of
  members, then reassign); pytest-gated (the oracle gates the
  no-refine path — means re-introduce float-order sensitivity).

Search probes the ``nprobe`` nearest head lists per query and ranks
exactly within them — at 10^9 vectors the probed fraction replaces the
cross join, same argument as the LSH path but with data-adaptive cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def ivf_heads(
    emb: DataFrame, k: int, seed: str = "ivf", id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic head sample: first k by md5(seed || id)."""
    return (
        emb.select(
            F.col(id_col).alias("head_id"), F.col(vec_col).alias("head_vec")
        )
        .orderBy(F.md5(F.concat(F.lit(seed), F.col("head_id").cast("string"))))
        .limit(k)
    )


def ivf_assign(
    emb: DataFrame, heads: DataFrame, cap: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec) x broadcast heads -> (id, vec, head_id, list_key).

    list_key == head_id for lists within ``cap``; oversized lists split
    deterministically into head_id#s sub-lists of <= cap members."""
    scored = (
        emb.join(F.broadcast(heads))
        .withColumn(
            "cos",
            _dot(F.col(vec_col), F.col("head_vec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("head_vec"))),
        )
        .groupBy(id_col, vec_col)
        .agg(F.max_by("head_id", F.struct(F.col("cos"), -F.col("head_id"))).alias("head_id"))
    )
    if cap is None:
        return scored.withColumn("list_key", F.col("head_id").cast("string"))
    sizes = scored.groupBy("head_id").agg(F.count("*").alias("n"))
    out = (
        scored.join(F.broadcast(sizes), "head_id")
        .withColumn("n_sub", F.ceil(F.col("n") / cap).cast("int"))
        .withColumn(
            "sub",
            F.pmod(
                F.abs(F.xxhash64(F.col(id_col).cast("string"))), F.col("n_sub")
            ),
        )
        .withColumn(
            "list_key",
            F.concat_ws("#", F.col("head_id").cast("string"), F.col("sub").cast("string")),
        )
        .drop("n", "n_sub", "sub")
    )
    return out


def ivf_refine(
    assigned: DataFrame, heads: DataFrame, iterations: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd refinement: centroid = per-dim mean of members, reassign.
    Returns refreshed heads (head_id, head_vec)."""
    cur = heads
    emb = assigned.select(id_col, vec_col)
    for _ in range(iterations):
        a = ivf_assign(emb, cur, cap=None, id_col=id_col, vec_col=vec_col)
        means = (
            a.select("head_id", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("head_id", "dim")
            .agg(F.avg("v").alias("m"))
            .groupBy("head_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("dim"), F.col("m")))
                    ),
                    lambda s: s["m"].cast("float"),
                ).alias("head_vec")
            )
        )
        cur = means
    return cur


def ivf_search(
    assigned: DataFrame,
    heads: DataFrame,
    queries: DataFrame,
    nprobe: int = 4,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """queries(query_id, qv) -> (query_id, neighbor_id, rank, dot):
    probe the nprobe nearest heads, exact-rank within their lists.
    Sub-lists (head_id#s) of a probed head are all searched."""
    probes = (
        queries.join(F.broadcast(heads))
        .withColumn(
            "cos",
            _dot(F.col("qv"), F.col("head_vec"))
            / (_norm(F.col("qv")) * _norm(F.col("head_vec"))),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cos"), "head_id")
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "head_id")
    )
    cand = probes.join(assigned, "head_id").filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = cand.withColumn("dot", _dot(F.col("qv"), F.col(vec_col)))
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("dot"), F.col(id_col))
        ),
    )
    return ranked.filter(F.col("rank") <= topk).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        # bigint: aligns with the DuckDB oracle's ROW_NUMBER type so the
        # driver's representation-sensitive hash sees one shape
        F.col("rank").cast("bigint").alias("rank"),
        F.round("dot", 4).alias("sim"),
    )
