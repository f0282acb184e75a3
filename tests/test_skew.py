"""Skew handling: triangle partitioning bounds the max task input
(SURVEY.md §5.5; BASELINE.json:14 explicit-salting mandate)."""

import pandas as pd
from pyspark.sql import functions as F

from kawa_spark.operators.blocking import _hot_replicas, bounded_self_pairs


def test_hot_key_max_subblock_bounded(spark):
    """A hot key with s mentions, split into g groups, must yield
    sub-blocks of at most ~2*ceil(s/g) replicas — i.e. the max task
    input drops from O(s) to O(s/g) while every pair still meets in
    exactly one sub-block."""
    s, g = 400, 8
    pdf = pd.DataFrame(
        {"mention_id": [f"m{i:04d}" for i in range(s)], "norm": ["hot"] * s}
    )
    hot = (
        spark.createDataFrame(pdf)
        .withColumn("block_key", F.lit("ex:hot"))
        .select("mention_id", "norm", "block_key")
    )
    sizes = (
        _hot_replicas(hot, g)
        .groupBy("sub_key")
        .count()
        .agg(F.max("count").alias("mx"), F.count("*").alias("n_blocks"))
        .first()
    )
    # diagonal sub-blocks hold ~s/g, off-diagonal ~2s/g; hashing jitter
    # stays well under 3s/g
    assert sizes["mx"] <= 3 * s // g, sizes
    # all g*(g+1)/2 sub-blocks exist (uniform-ish hash spread)
    assert sizes["n_blocks"] == g * (g + 1) // 2


def test_bounded_self_pairs_hot_band_key_equals_naive(spark):
    """One planted hot LSH band key (the ngram_lsh_dedup shape: boilerplate
    docs all hashing to one band bucket) + cold keys: the skew-bounded join
    must (a) produce the exact naive pair multiset and (b) never build a
    sub-block bigger than ~2s/g."""
    s, g = 300, 8
    rows = [("hot", i, 100 + (i % 7)) for i in range(s)]
    rows += [(f"cold{i % 5}", 1000 + i, 50 + i) for i in range(40)]
    keyed = spark.createDataFrame(rows, "bk string, doc_id long, n_tok long")

    bounded = bounded_self_pairs(
        keyed, key_col="bk", id_col="doc_id", payload_cols=("n_tok",),
        threshold=100, groups=g,
    )
    got = sorted(
        (r["bk"], r["id_a"], r["id_b"], r["n_tok_a"], r["n_tok_b"])
        for r in bounded.collect()
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    naive = (
        a.join(b, F.col("a.bk") == F.col("b.bk"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.bk").alias("bk"),
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_tok").alias("n_tok_a"),
            F.col("b.n_tok").alias("n_tok_b"),
        )
    )
    want = sorted(
        (r["bk"], r["id_a"], r["id_b"], r["n_tok_a"], r["n_tok_b"])
        for r in naive.collect()
    )
    assert got == want
    assert len(got) == s * (s - 1) // 2 + 5 * 8 * 7 // 2

    hot = keyed.filter(F.col("bk") == "hot")
    sizes = (
        _hot_replicas(hot, g, key_col="bk", id_col="doc_id")
        .groupBy("sub_key").count()
        .agg(F.max("count").alias("mx")).first()
    )
    assert sizes["mx"] <= 3 * s // g, sizes


def test_meta_block_pairs_equals_naive_with_hot_key(spark):
    """CBS meta-blocking == the naive per-key join + count-distinct +
    prune, including when one key space is hot enough to take the
    triangle-partitioned path, and duplicate (id, key) rows inflate
    nothing (cbs counts distinct keys)."""
    import random

    from kawa_spark.operators.blocking import meta_block_pairs

    rng = random.Random(11)
    rows = []
    for i in range(300):
        mid = f"e{i:04d}"
        rows.append((mid, "hot:shared"))  # hot key space: everyone
        rows.append((mid, f"w:{rng.randrange(12)}"))
        rows.append((mid, f"b:{rng.randrange(25)}"))
        if i % 7 == 0:
            rows.append((mid, f"w:{rng.randrange(12)}"))  # dup-ish keys
        if i % 3 == 0:
            rows.append((mid, rows[-1][1]))  # exact duplicate row
    keyed = spark.createDataFrame(rows, "mention_id string, block_key string")

    got = {
        (r["id_a"], r["id_b"], r["cbs"])
        for r in meta_block_pairs(
            keyed, min_shared=2, threshold=50, groups=4
        ).collect()
    }

    keyed.createOrReplaceTempView("mb_keyed")
    want = {
        (r["id_a"], r["id_b"], r["cbs"])
        for r in spark.sql("""
            SELECT a.mention_id AS id_a, b.mention_id AS id_b,
                   COUNT(DISTINCT a.block_key) AS cbs
            FROM mb_keyed a
            JOIN mb_keyed b ON a.block_key = b.block_key
                           AND a.mention_id < b.mention_id
            GROUP BY a.mention_id, b.mention_id
            HAVING COUNT(DISTINCT a.block_key) >= 2
        """).collect()
    }
    assert got == want
    assert len(got) > 0
    # pruning is real: some single-key pairs existed and were dropped
    all_pairs = meta_block_pairs(keyed, min_shared=1, threshold=50, groups=4)
    assert all_pairs.count() > len(got)


def test_candidate_pairs_min_shared_keys(spark):
    """cfg.min_shared_keys prunes single-key pairs from candidate_pairs
    and equals an explicit meta_block_pairs intersection; default=1
    output is unchanged."""
    from kawa_spark.config import PipelineConfig
    from kawa_spark.operators.blocking import candidate_pairs, meta_block_pairs

    rows = []
    for i in range(60):
        mid, norm = f"m{i:03d}", f"n{i:03d}"
        rows.append((mid, norm, f"pre:{i % 5}"))
        rows.append((mid, norm, f"sx:{i % 9}"))
    keyed = spark.createDataFrame(
        rows, "mention_id string, norm string, block_key string"
    )
    base = {(r["id_a"], r["id_b"]) for r in
            candidate_pairs(keyed, PipelineConfig()).collect()}
    pruned = {(r["id_a"], r["id_b"]) for r in
              candidate_pairs(
                  keyed, PipelineConfig(min_shared_keys=2)
              ).collect()}
    want = {(r["id_a"], r["id_b"]) for r in
            meta_block_pairs(keyed, min_shared=2).collect()}
    assert pruned == want
    assert pruned < base  # strictly fewer: single-key pairs dropped


def test_meta_block_pairs_wep_equals_naive_with_hot_key(spark):
    """WEP meta-blocking == naive count-distinct weights + the exact
    mean cut (cbs * n > total), through the triangle-partitioned hot
    path, with duplicate (id, key) rows inflating nothing."""
    import random

    from kawa_spark.operators.blocking import meta_block_pairs_wep

    rng = random.Random(13)
    rows = []
    for i in range(300):
        mid = f"e{i:04d}"
        rows.append((mid, "hot:shared"))
        rows.append((mid, f"w:{rng.randrange(12)}"))
        rows.append((mid, f"b:{rng.randrange(25)}"))
        if i % 5 == 0:
            rows.append((mid, rows[-1][1]))  # exact duplicate row
    keyed = spark.createDataFrame(rows, "mention_id string, block_key string")

    got = {
        (r["id_a"], r["id_b"], r["cbs"])
        for r in meta_block_pairs_wep(
            keyed, threshold=50, groups=4
        ).collect()
    }

    keyed.createOrReplaceTempView("wep_keyed")
    want = {
        (r["id_a"], r["id_b"], r["cbs"])
        for r in spark.sql("""
            WITH w AS (
                SELECT a.mention_id AS id_a, b.mention_id AS id_b,
                       COUNT(DISTINCT a.block_key) AS cbs
                FROM wep_keyed a
                JOIN wep_keyed b ON a.block_key = b.block_key
                               AND a.mention_id < b.mention_id
                GROUP BY a.mention_id, b.mention_id
            ),
            t AS (SELECT SUM(cbs) AS total, COUNT(*) AS n FROM w)
            SELECT id_a, id_b, cbs FROM w CROSS JOIN t
            WHERE cbs * n > total
        """).collect()
    }
    assert got == want
    assert got  # the cut keeps something on this corpus


def test_meta_block_wep_uniform_weights_keep_nothing(spark):
    """Redundancy-free corpus: every pair weight == mean -> WEP's
    strictly-greater rule keeps nothing (the published edge case)."""
    from kawa_spark.operators.blocking import meta_block_pairs_wep

    rows = [(f"m{i}", f"k:{i // 2}") for i in range(20)]
    keyed = spark.createDataFrame(rows, "mention_id string, block_key string")
    assert meta_block_pairs_wep(keyed).count() == 0
