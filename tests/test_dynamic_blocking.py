"""dynamic_block_keys: recursive oversized-block splitting.

Pins the distributed operator against a naive driver-side
implementation of the same splitting law, including the two hazards:
a hot key that must split, and a block a finer key CANNOT split
(identical rows), which must ride down to the terminal level intact.
"""

from pyspark.sql import functions as F

from kawa_spark.operators.blocking import dynamic_block_keys


def _key_fns(levels):
    return [
        (lambda d, i=i: F.concat_ws(" ", F.slice(F.col("toks"), 1, i)))
        for i in range(1, levels + 1)
    ]


def _naive(rows, levels, max_block):
    """rows: list of (rid, toks). Returns {rid: (block_key, level)}."""
    out = {}
    remaining = rows
    for level in range(1, levels + 1):
        blocks: dict[str, list] = {}
        for rid, toks in remaining:
            k = " ".join(toks[:level])
            blocks.setdefault(k, []).append((rid, toks))
        remaining = []
        for k, members in blocks.items():
            if len(members) <= max_block or level == levels:
                for rid, _ in members:
                    out[rid] = (f"L{level}:{k}", level)
            else:
                remaining.extend(members)
    return out


def _run(spark, rows, levels, max_block):
    df = spark.createDataFrame(rows, "mention_id long, toks array<string>")
    got = dynamic_block_keys(df, _key_fns(levels), max_block)
    return {
        r["mention_id"]: (r["block_key"], r["level"]) for r in got.collect()
    }


def test_matches_naive_with_hot_key(spark):
    rows = []
    rid = 0
    # hot first-token block of 30: level 2 blocks ("hot a" ... "hot f")
    # are size 5 > max_block, so members split again to level 3
    for second in "abcdef":
        for third in "12345":
            rows.append((rid, ["hot", second, third]))
            rid += 1
    # cold blocks of size <= 3
    for w in ("x", "y", "z"):
        for j in range(3):
            rows.append((rid, [w, "t", str(j)]))
            rid += 1
    naive = _naive([(r[0], r[1]) for r in rows], 3, 4)
    got = _run(spark, rows, 3, 4)
    assert got == naive
    # cold keys assigned at level 1, hot key's members at level 2
    assert all(got[r][1] == 1 for r in range(30, 39))
    assert all(got[r][1] == 3 for r in range(30))


def test_unsplittable_block_rides_to_terminal(spark):
    # 10 identical one-token rows: no finer key can split them -> they
    # must land at the terminal level, intact, still oversized
    rows = [(i, ["same"]) for i in range(10)]
    rows += [(100 + i, ["ok", str(i)]) for i in range(2)]
    naive = _naive([(r[0], r[1]) for r in rows], 3, 4)
    got = _run(spark, rows, 3, 4)
    assert got == naive
    assert {got[i] for i in range(10)} == {("L3:same", 3)}
    assert got[100] == ("L1:ok", 1)


def test_every_nonterminal_block_is_bounded(spark):
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c"]
    rows = [
        (i, [rng.choice(vocab) for _ in range(3)]) for i in range(200)
    ]
    max_block = 9
    got = _run(spark, rows, 3, max_block)
    naive = _naive([(r[0], r[1]) for r in rows], 3, max_block)
    assert got == naive
    sizes: dict[tuple, int] = {}
    for bk_level in got.values():
        sizes[bk_level] = sizes.get(bk_level, 0) + 1
    for (bk, level), sz in sizes.items():
        if level < 3:
            assert sz <= max_block, (bk, level, sz)


def test_single_level_is_plain_blocking(spark):
    rows = [(i, ["k" + str(i % 2), "w"]) for i in range(6)]
    got = _run(spark, rows, 1, 2)
    assert {v for v in got.values()} == {("L1:k0", 1), ("L1:k1", 1)}
