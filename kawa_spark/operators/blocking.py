"""Candidate blocking: key generation + skew-safe pair generation.

Key spaces (union — a pair is a candidate if the mentions share ANY key;
SURVEY.md §7 step 4):

* ``exact``   — the digit-folded normalized form itself
* ``prefix``  — 3-char prefixes of first+last word (the reference's
                shingle-prefix cascade analog, ontology_manager.py:258-294)
* ``soundex`` — phonetic key of first+last word (built-in F.soundex)
* ``mh{b}``   — MinHash-LSH band keys over character shingles

MinHash is expressed **natively** (no UDF): char n-grams via
transform/sequence/substr, per-permutation min over xxhash64(seed, gram)
(fast path) or md5 (oracle-parity path, identical in DuckDB), band key =
hash of the band's minima. Whole-stage codegen keeps this JVM-side.

Skew: keys hotter than ``hot_key_threshold`` are triangle-partitioned
into g groups — each mention replicates to the g sub-blocks it can form
pairs in, so every within-key pair is still generated exactly once while
the max task input drops from O(s²) to O((s/g)²) per sub-block
(SURVEY.md §4 X10; BASELINE.json:14 explicit salting mandate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig


def _char_shingles(col: Column, n: int) -> Column:
    """Distinct character n-grams (padded so short strings still key).

    rpad truncates strings longer than n, so pad only the short case."""
    padded = F.when(F.length(col) < n, F.rpad(col, n, "#")).otherwise(col)
    cnt = F.greatest(F.length(padded) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), cnt), lambda i: padded.substr(i, F.lit(n)))
    )


_LONG_MAX = (1 << 63) - 1


def minhash_signature(col: Column, perms: int, n: int, native_hash: str = "xxhash64") -> Column:
    """array<string> of per-permutation minima over character n-gram
    shingles. ``native_hash`` is 'xxhash64' (fast) or 'md5'
    (cross-engine deterministic — DuckDB computes the identical value,
    used by the correctness oracle).

    The fast path is a SINGLE pass over the shingle array
    (``F.aggregate`` folding a perms-wide min vector) — the naive
    per-permutation ``array_min(transform(grams, ...))`` form re-walks
    (and re-builds) the gram array once per permutation, a measured ~7x
    CPU overhead that would dominate the blocking stage at 100 TB."""
    return minhash_from_grams(_char_shingles(col, n), perms, native_hash)


def minhash_from_grams(
    grams: Column, perms: int, native_hash: str = "xxhash64"
) -> Column:
    """MinHash fold over an arbitrary shingle array — lets callers pick
    the shingle space (char n-grams via minhash_signature, whitespace
    tokens, field values, ...) without duplicating the single-pass
    aggregate. Choosing shingles that match the downstream verify
    metric is what decides recall: char shingles under a token-Jaccard
    verify under-recall on token-permuted near-dups (see the
    blocking_recall vs blocking_recall_tokens queries)."""
    if native_hash == "md5":
        # oracle-parity path: ONE md5 per gram (computed in a transform
        # so it cannot be re-evaluated per permutation), then each
        # permutation takes an 8-hex-char slice of the digest at stride
        # 4 (offsets 1,5,..,29 — 32 hex chars bound this to 8 perms; the
        # last slice clips to 4 chars, consistently on both engines) and
        # the signature is the per-slice min. Stride 4 keeps the first 4
        # comparison chars of adjacent permutations disjoint — stride 3
        # shared 5 of 8 chars, so for docs with >~16^3 distinct shingles
        # the min was decided inside the overlap, correlating
        # permutations and weakening LSH band independence. Mirrored by
        # the DuckDB SQL in __spark_entry__ (same min over the same
        # slice set — fold order does not change a min). "~" (0x7E)
        # sorts above every lowercase-hex digest, so it is a safe
        # string +infinity.
        if perms > 8:
            raise ValueError("md5 minhash path supports at most 8 perms")
        digests = F.transform(grams, lambda g: F.md5(g))
        s_init = F.array_repeat(F.lit("~"), perms)

        def s_step(acc: Column, h: Column) -> Column:
            hashes = F.array(
                *[h.substr(F.lit(p * 4 + 1), F.lit(8)) for p in range(perms)]
            )
            return F.zip_with(acc, hashes, lambda a, b: F.least(a, b))

        return F.aggregate(digests, s_init, s_step)

    init = F.array_repeat(F.lit(_LONG_MAX).cast("long"), perms)

    def step(acc: Column, g: Column) -> Column:
        hashes = F.array(*[F.xxhash64(F.lit(p), g) for p in range(perms)])
        return F.zip_with(acc, hashes, lambda a, b: F.least(a, b))

    sig = F.aggregate(grams, init, step)
    return F.transform(sig, lambda v: v.cast("string"))


def simhash(col: Column, bits: int = 64, split_pattern: str = " ") -> Column:
    """64-bit SimHash over whitespace tokens, fully native: ONE pass
    over the token array (F.aggregate), per token one xxhash64 whose
    bits vote +-1 into a ``bits``-wide counter vector; the signature is
    the sign vector packed into a BIGINT. Near-duplicate docs differ in
    few bits (Hamming), so grouping on the top-k bits or XOR+bit_count
    thresholds gives a dedup key — all JVM-side, no UDF."""
    toks = F.array_distinct(F.split(col, split_pattern))
    init = F.array_repeat(F.lit(0).cast("long"), bits)

    def step(acc: Column, t: Column) -> Column:
        h = F.xxhash64(t)
        votes = F.array(
            *[
                (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
                for b in range(bits)
            ]
        )
        return F.zip_with(acc, votes, lambda a, v: a + v)

    counts = F.aggregate(toks, init, step)
    weights = F.array(
        *[
            F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")
            for b in range(bits)
        ]
    )
    # counts appears ONCE (zip_with), so the token fold runs once per row
    return F.aggregate(
        F.zip_with(counts, weights, lambda c, w: F.when(c > 0, w).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def band_keys(sig: Column, bands: int, perms: int) -> Column:
    """array<string> of LSH band keys (concat-hash of each band's rows).

    ``sig`` is bound ONCE via a one-element transform lambda before the
    per-band element_at references: Catalyst does not common-subexpress
    identical higher-order-function subtrees, so referencing the
    signature expression directly from each band would re-run the whole
    MinHash fold per reference (measured ~4x on the md5 path)."""
    rows = perms // bands

    def mk(s: Column) -> Column:
        keys = []
        for b in range(bands):
            band = F.concat_ws(
                "|", *[F.element_at(s, b * rows + r + 1) for r in range(rows)]
            )
            keys.append(F.concat(F.lit(f"mh{b}:"), F.md5(band)))
        return F.array(*keys)

    return F.element_at(F.transform(F.array(sig), mk), 1)


def add_block_keys(
    mentions: DataFrame, cfg: PipelineConfig | None = None, native_hash: str = "xxhash64"
) -> DataFrame:
    """mentions(mention_id, norm, ...) -> (mention_id, norm, block_key)
    exploded over the union of key spaces. All-native; no Python."""
    cfg = cfg or PipelineConfig()
    norm = F.col("norm")
    words = F.split(norm, cfg.connector)
    first_w, last_w = F.element_at(words, 1), F.element_at(words, -1)

    exact = F.concat(F.lit("ex:"), norm)
    prefix = F.concat(
        F.lit("px:"), F.substring(first_w, 1, 3), F.lit("|"), F.substring(last_w, 1, 3)
    )
    sdx = F.concat(F.lit("sx:"), F.soundex(first_w), F.lit("|"), F.soundex(last_w))
    mh = band_keys(
        minhash_signature(norm, cfg.minhash_perms, cfg.shingle_size, native_hash),
        cfg.minhash_bands,
        cfg.minhash_perms,
    )
    keys = F.array_union(F.array(exact, prefix, sdx), mh)
    if cfg.metaphone_keys or cfg.translit_keys:
        # F16 opt-in Arrow-UDF keys; cost is O(distinct surfaces), not
        # O(pairs) — the blocking stage runs over deduped norms
        from .phonetic import dm_primary_udf, dm_secondary_udf, latin_skeleton_udf

        # nullif guards the degenerate case: double_metaphone / latin_skeleton
        # return '' for surfaces with no Latin letters (CJK, Cyrillic, digits),
        # and a shared 'dm1:'/'tr:' key would cross-pair every such surface —
        # O(n^2) meaningless candidates at web scale. Empty code -> NULL key,
        # dropped by the post-explode filter.
        extra = []
        if cfg.metaphone_keys:
            extra.append(F.concat(F.lit("dm1:"), F.nullif(dm_primary_udf(first_w), F.lit(""))))
            extra.append(F.concat(F.lit("dm2:"), F.nullif(dm_secondary_udf(first_w), F.lit(""))))
        if cfg.translit_keys:
            extra.append(F.concat(F.lit("tr:"), F.nullif(latin_skeleton_udf(norm), F.lit(""))))
        keys = F.array_union(keys, F.array(*extra))
    return (
        mentions.select("mention_id", "norm", F.explode(keys).alias("block_key"))
        .filter(F.col("mention_id").isNotNull() & F.col("block_key").isNotNull())
    )


def _hot_replicas(
    hot: DataFrame,
    g: int,
    key_col: str = "block_key",
    id_col: str = "mention_id",
) -> DataFrame:
    """Triangle-partition replication: mention m (group g(m)) replicates
    to the g sub-blocks {(min(g(m),h), max(g(m),h))}. Max sub-block size
    is ~2s/g for a key of size s — the bound the skew test pins."""
    hot = hot.withColumn(
        "grp", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(g))
    )
    return hot.withColumn(
        "h", F.explode(F.sequence(F.lit(0), F.lit(g - 1)))
    ).withColumn(
        "sub_key",
        F.concat_ws(
            ":",
            F.col(key_col).cast("string"),
            F.least("grp", "h").cast("string"),
            F.greatest("grp", "h").cast("string"),
        ),
    )


def bounded_self_pairs(
    keyed: DataFrame,
    key_col: str = "block_key",
    id_col: str = "mention_id",
    payload_cols: tuple[str, ...] = (),
    threshold: int = 2000,
    groups: int = 8,
) -> DataFrame:
    """Skew-bounded self equi-join: emits the IDENTICAL row multiset to

        keyed.alias('a').join(keyed.alias('b'), key_col)
             .filter(a.id < b.id)

    (one row per shared key per ordered pair), but keys hotter than
    ``threshold`` are triangle-partitioned into ``groups`` sub-blocks so
    no single task materializes an O(s²) bucket — the 100-TB shape for
    every LSH/blocking bucket join (BASELINE.json explicit-skew
    mandate). Pair-set invariance is pinned by
    tests/test_pipeline_spark.py::test_triangle_partitioning_equals_naive
    and tests/test_skew.py.

    Cold keys: plain self equi-join (sort-merge/shuffle-hash, AQE picks).
    Hot keys: row x in group g(x) replicates to sub-blocks
    {(min(g(x),h), max(g(x),h)) : h in 0..groups-1}; a pair (x, y) is
    kept only where x's replica was addressed to y's group, so it meets
    in exactly one sub-block.

    Output: (key_col, id_a, id_b, <p>_a, <p>_b for each payload col).
    """
    counts = keyed.groupBy(key_col).count()
    hot_keys = counts.filter(F.col("count") > threshold).select(key_col)

    def out_cols() -> list[Column]:
        cols = [
            F.col(f"a.{key_col}").alias(key_col),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        ]
        for p in payload_cols:
            cols.append(F.col(f"a.{p}").alias(f"{p}_a"))
            cols.append(F.col(f"b.{p}").alias(f"{p}_b"))
        return cols

    cold = keyed.join(F.broadcast(hot_keys), key_col, "left_anti")
    ca, cb = cold.alias("a"), cold.alias("b")
    cold_pairs = (
        ca.join(cb, F.col(f"a.{key_col}") == F.col(f"b.{key_col}"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(*out_cols())
    )

    hot = _hot_replicas(
        keyed.join(F.broadcast(hot_keys), key_col),
        groups,
        key_col=key_col,
        id_col=id_col,
    )
    ha, hb = hot.alias("a"), hot.alias("b")
    hot_pairs = (
        ha.join(hb, F.col("a.sub_key") == F.col("b.sub_key"))
        .filter(
            (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # a pair (x, y) is kept only in the sub-block where x's
            # replica was addressed to y's group — exactly one sub-block
            & (F.col("a.h") == F.col("b.grp"))
        )
        .select(*out_cols())
    )
    return cold_pairs.unionByName(hot_pairs)


def candidate_pairs(keyed: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """(mention_id, norm, block_key) -> (block_key, id_a, norm_a, id_b, norm_b)

    Skew-bounded pair generation (see :func:`bounded_self_pairs`), then
    one dedup shuffle: a pair found via several key spaces is scored
    once. ``cfg.min_shared_keys > 1`` turns the same shuffle into CBS
    meta-blocking (see :func:`meta_block_pairs`): the distinct-key count
    rides the existing pair aggregate for free, and single-key
    coincidence pairs are pruned before scoring."""
    cfg = cfg or PipelineConfig()
    pairs = bounded_self_pairs(
        keyed,
        key_col="block_key",
        id_col="mention_id",
        payload_cols=("norm",),
        threshold=cfg.hot_key_threshold,
        groups=cfg.hot_key_groups,
    )
    aggs = [
        F.min("block_key").alias("block_key"),
        F.first("norm_a").alias("norm_a"),
        F.first("norm_b").alias("norm_b"),
    ]
    if cfg.min_shared_keys <= 1:
        # default path: plan unchanged (no distinct-aggregate stage)
        return pairs.groupBy("id_a", "id_b").agg(*aggs)
    aggs.append(F.count_distinct(F.col("block_key")).alias("cbs"))
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(*aggs)
        .filter(F.col("cbs") >= cfg.min_shared_keys)
        .drop("cbs")
    )


def bounded_cross_pairs(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "block_key",
    id_col: str = "mention_id",
    payload_cols: tuple[str, ...] = ("norm",),
    threshold: int = 2000,
    groups: int = 8,
) -> DataFrame:
    """Skew-bounded left x right equi-join on ``key_col``: emits the
    IDENTICAL row multiset to ``left.join(right, key_col)`` (one row per
    shared key per (l, r) combination — pair-set invariance pinned by
    tests/test_incremental.py::test_bounded_cross_pairs_equals_naive),
    but keys whose RIGHT side holds more than ``threshold`` rows are
    salted into ``groups`` sub-blocks: each hot right row hashes to one
    salt, each left row on a hot key replicates to all ``groups`` salts,
    so no task materializes an O(|L_k| x |R_k|) bucket.

    This is the delta-vs-corpus join shape for incremental linkage:
    ``left`` = new surfaces (delta-sized), ``right`` = the standing
    block-key index (web-scale, skewed), so hotness is judged on the
    right and the x``groups`` replication lands on the small side.

    Output: (key_col, id_l, id_r, <p>_l, <p>_r for each payload col).
    """
    counts = right.groupBy(key_col).count()
    hot_keys = counts.filter(F.col("count") > threshold).select(key_col)

    def out_cols() -> list[Column]:
        cols = [
            F.col(f"l.{key_col}").alias(key_col),
            F.col(f"l.{id_col}").alias("id_l"),
            F.col(f"r.{id_col}").alias("id_r"),
        ]
        for p in payload_cols:
            cols.append(F.col(f"l.{p}").alias(f"{p}_l"))
            cols.append(F.col(f"r.{p}").alias(f"{p}_r"))
        return cols

    cold_r = right.join(F.broadcast(hot_keys), key_col, "left_anti")
    cold_pairs = (
        left.alias("l")
        .join(cold_r.alias("r"), F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        .select(*out_cols())
    )

    hot_r = right.join(F.broadcast(hot_keys), key_col).withColumn(
        "salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(groups))
    )
    hot_l = left.join(F.broadcast(hot_keys), key_col).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(groups - 1)))
    )
    hot_pairs = (
        hot_l.alias("l")
        .join(
            hot_r.alias("r"),
            (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
            & (F.col("l.salt") == F.col("r.salt")),
        )
        .select(*out_cols())
    )
    return cold_pairs.unionByName(hot_pairs)


def meta_block_pairs(
    keyed: DataFrame,
    min_shared: int = 2,
    key_col: str = "block_key",
    id_col: str = "mention_id",
    threshold: int = 2000,
    groups: int = 8,
) -> DataFrame:
    """Meta-blocking: CBS (common-blocks scheme) pair weighting + pruning
    (Papadakis et al., "Meta-Blocking: Taking Entity Resolution to the
    Next Level", TKDE 2014).

    Redundancy-positive blocking (several key spaces per entity) makes
    the number of shared keys itself a cheap match signal: a pair that
    co-occurs in only one of its many blocks is usually a coincidence of
    one key space. This prunes the candidate stream BEFORE any string
    comparison runs — at 10^12 docs the comparisons saved dwarf the cost
    of the one counting shuffle added here.

    Shape: the per-key pair stream comes from :func:`bounded_self_pairs`
    (hot keys triangle-partitioned — the usual suspects for redundant
    pairs are exactly the hot blocks), then ONE partial-aggregating
    count-distinct shuffle on (id_a, id_b). Output: (id_a, id_b, cbs)
    for pairs sharing >= ``min_shared`` distinct keys. ``keyed`` may
    carry duplicate (id, key) rows — cbs counts distinct keys.
    """
    per_key = bounded_self_pairs(
        keyed, key_col=key_col, id_col=id_col,
        threshold=threshold, groups=groups,
    )
    return (
        per_key.groupBy("id_a", "id_b")
        .agg(F.count_distinct(F.col(key_col)).alias("cbs"))
        .filter(F.col("cbs") >= min_shared)
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense global 1-based rank over a total order WITHOUT the
    single-task trap: ``row_number() OVER (ORDER BY ...)`` with no
    PARTITION BY collapses the whole table into one window task, which
    is a scale-killer at 10^12 rows. Instead: range-partition on the
    order columns (non-overlapping, ordered ranges per partition id),
    rank locally per partition, then shift each partition by the total
    count of all earlier partitions. The only driver-side state is one
    row per partition (the count table) — O(parallelism), not O(rows).

    ``order_cols`` must be a unique total order (append a unique id as
    the last column); ranks are then independent of partitioning and
    sampling, so the output is deterministic and oracle-comparable.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    part = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    from pyspark.sql.window import Window

    local = part.withColumn(
        "_lr", F.row_number().over(Window.partitionBy("_pid").orderBy(*cols))
    )
    # PIN the partitioning before anything reads it twice:
    # repartitionByRange SAMPLES boundaries per evaluation, so without
    # materialization the counts collect below and the downstream join
    # would each re-evaluate with different boundaries — offsets from
    # one partitioning applied to another yields duplicate/overlapping
    # ranks (observed at sf0.1: +438 phantom pairs). On a cluster this
    # is a reliable checkpoint; locally localCheckpoint suffices.
    local = local.localCheckpoint(eager=True)
    # one tiny action: #partitions rows through the driver
    counts = sorted(
        local.groupBy("_pid").count().collect(), key=lambda r: r["_pid"]
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_pid"], acc))
        acc += r["count"]
    off = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], ["_pid", "_off"])
    )
    return (
        local.join(off, "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lr")).cast("bigint"))
        .drop("_pid", "_lr", "_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_cols: list[str],
    id_col: str,
    window: int = 4,
    payload_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995):
    rank all records by a sort key and emit every pair within ``window``
    ranks of each other — the classic complement to hash blocking
    (catches near-misses that share no exact key but sort adjacently,
    e.g. typos in a name's tail).

    Distributed shape: :func:`global_rank` (range partition + local
    rank + offset shift; no single-task window), then the same
    time-bucket trick as the temporal range join — bucket b =
    floor(rank / window); a pair with rank distance in [1, window-1]
    lives in the same or adjacent buckets, so the left side probes
    {b, b+1} and the join is a plain equi-join on the bucket. Every
    bucket holds exactly ``window`` consecutive ranks, so task input is
    uniformly bounded by construction — sorted-neighborhood is the one
    blocking scheme with NO hot-key problem (skew in the key space
    becomes adjacency in rank space, never a giant bucket).

    Output: (id_a, id_b, rank_a, rank_b, <p>_a, <p>_b ...), one row per
    pair, rank_a < rank_b.
    """
    ranked = global_rank(
        df, [*sort_cols, id_col], rank_col="rank",
        num_partitions=num_partitions,
    )
    bkt = ranked.withColumn(
        "_bkt", F.floor(F.col("rank") / F.lit(window)).cast("bigint")
    )
    probes = bkt.withColumn(
        "_probe", F.explode(F.array(F.col("_bkt"), F.col("_bkt") + 1))
    )
    cols = [
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.rank").alias("rank_a"),
        F.col("b.rank").alias("rank_b"),
    ]
    for p in payload_cols:
        cols.append(F.col(f"a.{p}").alias(f"{p}_a"))
        cols.append(F.col(f"b.{p}").alias(f"{p}_b"))
    return (
        probes.alias("a")
        .join(bkt.alias("b"), F.col("a._probe") == F.col("b._bkt"))
        .filter(
            (F.col("b.rank") > F.col("a.rank"))
            & (F.col("b.rank") - F.col("a.rank") <= window - 1)
        )
        .select(*cols)
    )


def dynamic_block_keys(
    df: DataFrame,
    key_fns,
    max_block: int,
    id_col: str = "mention_id",
) -> DataFrame:
    """Dynamic blocking (the recursive block-splitting scheme of
    McNeill/Kardes/Borthwick "Dynamic Record Blocking", and the
    oversized-block refinement in Bilenko's adaptive blocking line):
    rows start in the coarsest key space; any block larger than
    ``max_block`` moves ALL its rows down to the next, finer key space,
    recursively, until the block fits or key spaces run out. The result
    is a single non-redundant blocking assignment whose block sizes are
    bounded by construction everywhere a finer key can still split —
    the comparison-budget lever that keeps pair generation O(n·s_max)
    instead of O(s_hot²) at 10^12 docs.

    ``key_fns`` — coarse-to-fine list of callables, each mapping the
    remaining DataFrame to a key Column (e.g. first token, first two
    tokens, ...). A block that a finer key cannot split (all rows map
    to the same finer key — e.g. one-token texts) simply rides down to
    the terminal level; terminal blocks may therefore still exceed
    ``max_block`` and MUST be pair-generated via
    :func:`bounded_self_pairs`, exactly like any other hot key.

    Per level: one partial-agg size shuffle + one equi-join of the size
    table back onto the rows (no window — a window partition would
    materialize the entire hot block in one task; the groupBy's
    map-side combine never does). The level-(i+1) input is the level-i
    oversized remainder, so total work is sum of remainder sizes —
    geometric in practice (each split divides hot blocks by the finer
    key's fan-out).

    Returns ``(id_col, block_key, level)`` with ``level`` 1-based; keys
    are prefixed ``L{level}:`` so equal strings from different levels
    never collide into one block downstream.
    """
    if not key_fns:
        raise ValueError("dynamic_block_keys needs at least one key_fn")
    remaining = df
    levels: list[DataFrame] = []
    for level, kf in enumerate(key_fns, 1):
        keyed = remaining.withColumn("_dk", kf(remaining))
        terminal = level == len(key_fns)
        assigned_key = F.concat(
            F.lit(f"L{level}:"), F.col("_dk")
        ).alias("block_key")
        if terminal:
            levels.append(
                keyed.select(
                    F.col(id_col), assigned_key, F.lit(level).alias("level")
                )
            )
            break
        sizes = keyed.groupBy("_dk").agg(F.count(F.lit(1)).alias("_sz"))
        keyed = keyed.join(sizes, "_dk")
        levels.append(
            keyed.filter(F.col("_sz") <= max_block).select(
                F.col(id_col), assigned_key, F.lit(level).alias("level")
            )
        )
        remaining = keyed.filter(F.col("_sz") > max_block).drop("_dk", "_sz")
    out = levels[0]
    for part in levels[1:]:
        out = out.unionByName(part)
    return out


def meta_block_pairs_wep(
    keyed: DataFrame,
    key_col: str = "block_key",
    id_col: str = "mention_id",
    threshold: int = 2000,
    groups: int = 8,
) -> DataFrame:
    """Meta-blocking with WEP (weighted edge pruning, Papadakis et al.
    TKDE 2014 §4): instead of :func:`meta_block_pairs`'s fixed
    ``min_shared`` cut, keep the pairs whose CBS weight EXCEEDS the mean
    weight over all candidate pairs — the standard data-dependent
    threshold, which adapts to how redundant the key spaces actually
    are on this corpus instead of hard-coding it.

    Shape: the same skew-bounded per-key pair stream + ONE
    count-distinct shuffle as CBS; the mean is a 1-row scalar aggregate
    crossed back on (broadcast nested loop of one row — constant), then
    a codegen filter. Strictly-greater is the published rule: on a
    redundancy-free corpus every weight equals the mean and WEP keeps
    nothing extra.

    Output: (id_a, id_b, cbs) for pairs with cbs > mean(cbs).
    """
    per_key = bounded_self_pairs(
        keyed, key_col=key_col, id_col=id_col,
        threshold=threshold, groups=groups,
    )
    weighted = per_key.groupBy("id_a", "id_b").agg(
        F.count_distinct(F.col(key_col)).alias("cbs")
    )
    # exact mean as integer sum / integer count (one scalar row; the
    # comparison below is the only float op and is identical IEEE in
    # any engine: cbs * n > total is kept integer-exact instead)
    totals = weighted.agg(
        F.sum("cbs").alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    return (
        weighted.crossJoin(F.broadcast(totals))
        .filter(F.col("cbs") * F.col("_n") > F.col("_total"))
        .select("id_a", "id_b", "cbs")
    )


def meta_block_pairs_cnp(
    keyed: DataFrame,
    k: int = 3,
    key_col: str = "block_key",
    id_col: str = "mention_id",
    threshold: int = 2000,
    groups: int = 8,
) -> DataFrame:
    """Meta-blocking with CNP (cardinality node pruning, Papadakis et
    al. TKDE 2014 §4): the node-centric counterpart to
    :func:`meta_block_pairs_wep` — each node retains its ``k``
    highest-CBS neighbors (ties by neighbor id for determinism) and a
    pair survives if EITHER endpoint retained it (the published
    redundancy-positive union semantics). Where WEP's one global mean
    cut can starve sparse regions and under-prune dense ones, CNP
    bounds every node's comparison budget individually — the knob that
    directly caps per-entity work at 10^12 docs.

    Shape: the same skew-bounded per-key pair stream + count-distinct
    shuffle as CBS, then ONE per-node top-k window whose partitions are
    node neighbor lists (bounded by blocking, never corpus-sized), and
    a half-pair dedup aggregate. Output: (id_a, id_b, cbs) with
    id_a < id_b.
    """
    from pyspark.sql.window import Window

    per_key = bounded_self_pairs(
        keyed, key_col=key_col, id_col=id_col,
        threshold=threshold, groups=groups,
    )
    weighted = per_key.groupBy("id_a", "id_b").agg(
        F.count_distinct(F.col(key_col)).alias("cbs")
    )
    sym = weighted.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v"), "cbs"
    ).unionAll(
        weighted.select(
            F.col("id_b").alias("u"), F.col("id_a").alias("v"), "cbs"
        )
    )
    w = Window.partitionBy("u").orderBy(F.col("cbs").desc(), F.col("v"))
    kept = (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.least("u", "v").alias("id_a"),
            F.greatest("u", "v").alias("id_b"),
            "cbs",
        )
    )
    # union semantics: retained by either endpoint -> one output row
    return kept.groupBy("id_a", "id_b").agg(F.max("cbs").alias("cbs"))
