"""Property-based pins (hypothesis) for the session-8 operators.

Each property compares the distributed operator against a pure-Python
naive model on randomly generated small inputs. max_examples is kept
low because every example runs real Spark jobs; hypothesis still buys
adversarial inputs (empty strings, duplicate rows, one-token texts,
all-identical blocks) and minimal shrunk counterexamples.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kawa_spark.operators.blocking import (
    dynamic_block_keys,
    meta_block_pairs_wep,
)
from kawa_spark.operators.fusion import fuse_clusters

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI determinism: same examples every run
)

_tok = st.sampled_from(["a", "b", "c", "aa", "b c"])
_toks = st.lists(_tok, min_size=1, max_size=4)


@given(rows=st.lists(_toks, min_size=1, max_size=40), max_block=st.integers(1, 6))
@_SETTINGS
def test_dynamic_blocking_matches_naive(spark, rows, max_block):
    data = [(i, t) for i, t in enumerate(rows)]
    df = spark.createDataFrame(data, "mention_id long, toks array<string>")
    key_fns = [
        (lambda d, i=i: F.concat_ws(" ", F.slice(F.col("toks"), 1, i)))
        for i in (1, 2)
    ]
    got = {
        r["mention_id"]: (r["block_key"], r["level"])
        for r in dynamic_block_keys(df, key_fns, max_block).collect()
    }

    want = {}
    remaining = data
    for level in (1, 2):
        blocks: dict[str, list] = {}
        for rid, toks in remaining:
            blocks.setdefault(" ".join(toks[:level]), []).append((rid, toks))
        remaining = []
        for k, members in blocks.items():
            if len(members) <= max_block or level == 2:
                for rid, _ in members:
                    want[rid] = (f"L{level}:{k}", level)
            else:
                remaining.extend(members)
    assert got == want


_key = st.sampled_from(["k1", "k2", "k3", "hot"])


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 15), _key), min_size=1, max_size=60
    )
)
@_SETTINGS
def test_wep_matches_naive(spark, rows):
    data = [(f"m{i:02d}", k) for i, k in rows]
    keyed = spark.createDataFrame(data, "mention_id string, block_key string")
    got = {
        (r["id_a"], r["id_b"], r["cbs"])
        for r in meta_block_pairs_wep(keyed, threshold=5, groups=3).collect()
    }

    dedup = set(data)
    weights: dict[tuple, set] = {}
    for ida, ka in dedup:
        for idb, kb in dedup:
            if ida < idb and ka == kb:
                weights.setdefault((ida, idb), set()).add(ka)
    if not weights:
        assert got == set()
        return
    total = sum(len(v) for v in weights.values())
    n = len(weights)
    want = {
        (ida, idb, len(v))
        for (ida, idb), v in weights.items()
        if len(v) * n > total
    }
    assert got == want


_val = st.one_of(st.none(), st.sampled_from(["x", "y", "zz", "zzz"]))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), _val, st.integers(0, 5)),
        min_size=1,
        max_size=50,
    )
)
@_SETTINGS
def test_fusion_matches_naive(spark, rows):
    df = spark.createDataFrame(rows, "cid long, name string, ord long")
    got = {
        r["cid"]: (r["modal"], r["latest"], r["longest"], r["lo"])
        for r in fuse_clusters(
            df,
            "cid",
            {
                "modal": ("majority", "name"),
                "latest": ("latest", "name", "ord"),
                "longest": ("longest", "name"),
                "lo": ("min", "ord"),
            },
        ).collect()
    }

    clusters: dict[int, list] = {}
    for cid, name, order in rows:
        clusters.setdefault(cid, []).append((name, order))
    want = {}
    for cid, members in clusters.items():
        named = [(v, o) for v, o in members if v is not None]
        if named:
            counts: dict[str, int] = {}
            for v, _ in named:
                counts[v] = counts.get(v, 0) + 1
            modal = max(counts, key=lambda v: (counts[v], v))
            latest = max(named, key=lambda p: (p[1], p[0]))[0]
            longest = max((v for v, _ in named), key=lambda v: (len(v), v))
        else:
            modal = latest = longest = None
        want[cid] = (modal, latest, longest, min(o for _, o in members))
    assert got == want


def _naive_cnp(rows, k):
    """Pure-python CNP model: CBS weights, per-node top-k by (cbs desc,
    neighbor asc), union semantics."""
    from collections import defaultdict

    keys = defaultdict(set)
    for i, toks in rows:
        for t in toks:
            keys[i].add(t)
    ids = sorted(keys)
    cbs = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            shared = len(keys[a] & keys[b])
            if shared:
                cbs[(a, b)] = shared
    nbrs = defaultdict(list)
    for (a, b), w in cbs.items():
        nbrs[a].append((-w, b, (a, b)))
        nbrs[b].append((-w, a, (a, b)))
    kept = set()
    for u, lst in nbrs.items():
        for _, _, pair in sorted(lst)[:k]:
            kept.add(pair)
    return {(a, b, cbs[(a, b)]) for a, b in kept}


@given(rows=st.lists(_toks, min_size=1, max_size=25), k=st.integers(1, 4))
@_SETTINGS
def test_cnp_matches_naive(spark, rows, k):
    from kawa_spark.operators.blocking import meta_block_pairs_cnp

    data = [
        (i, t) for i, toks in enumerate(rows) for t in set(toks)
    ]
    if not data:
        return
    keyed = spark.createDataFrame(
        data, "mention_id long, block_key string"
    )
    got = {
        (r["id_a"], r["id_b"], r["cbs"])
        for r in meta_block_pairs_cnp(keyed, k=k).collect()
    }
    want = _naive_cnp(list(enumerate(rows)), k)
    assert got == want
