"""IVF ANN index (G4 analog: ontology_kb.create_indexer)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kawa_spark.operators.ann import ivf_assign, ivf_heads, ivf_refine, ivf_search


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(9)
    # three tight clusters on distinct basis directions: nearest-head
    # assignment is unambiguous for every vector
    rows = []
    for i in range(60):
        base = np.zeros(8)
        base[[0, 3, 7][i % 3]] = 5.0
        v = base + rng.randn(8) * 0.1
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestIvf:
    def test_heads_deterministic(self, emb_df):
        h1 = [r.head_id for r in ivf_heads(emb_df, 8).collect()]
        h2 = [r.head_id for r in ivf_heads(emb_df, 8).collect()]
        assert h1 == h2 and len(h1) == 8

    def test_assign_groups_clusters_together(self, emb_df):
        heads = ivf_heads(emb_df, 6)
        assigned = ivf_assign(emb_df, heads)
        by_head = {}
        for r in assigned.collect():
            by_head.setdefault(r.head_id, []).append(r.vec_id)
        # every list is pure: all members share the head's residue class
        # (clusters are orthogonal, so cross-cluster cosine ~ 0)
        head_residue = {h: h % 3 for h in by_head}
        for h, members in by_head.items():
            assert all(m % 3 == head_residue[h] for m in members), (h, members)

    def test_cap_bounds_list_sizes(self, emb_df):
        heads = ivf_heads(emb_df, 2)
        assigned = ivf_assign(emb_df, heads, cap=10)
        # hash-balanced split: expected size cap, bound loosely at 2x
        # (the reference's "relatively balanced" leaves)
        sizes = assigned.groupBy("list_key").count().collect()
        assert max(r["count"] for r in sizes) <= 20
        assert len(sizes) >= 4  # oversized lists actually split

    def test_search_matches_bruteforce_within_probed_lists(self, emb_df):
        heads = ivf_heads(emb_df, 6)
        assigned = ivf_assign(emb_df, heads, cap=20)
        queries = emb_df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        out = ivf_search(assigned, heads, queries, nprobe=6, topk=3).collect()
        # nprobe == k -> every list probed -> results equal brute force
        vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb_df.collect()}
        for qid in (0, 1, 2):
            got = [r.neighbor_id for r in sorted(
                (r for r in out if r.query_id == qid), key=lambda r: r.rank
            )]
            dots = sorted(
                ((float(vecs[qid] @ v), -i) for i, v in vecs.items() if i != qid),
                reverse=True,
            )[:3]
            want = [-d[1] for d in dots]
            assert got == want, (qid, got, want)

    def test_refine_centroid_is_member_mean(self, emb_df):
        heads = ivf_heads(emb_df, 3)
        assigned = ivf_assign(emb_df, heads)
        refined = {r.head_id: np.array(r.head_vec) for r in
                   ivf_refine(assigned, heads, iterations=1).collect()}
        # semantic: refined head vec == per-dim mean of its members
        members = {}
        for r in assigned.collect():
            members.setdefault(r.head_id, []).append(np.array(r.embedding))
        for h, vecs in members.items():
            want = np.mean(vecs, axis=0)
            assert np.allclose(refined[h], want, atol=1e-5), h
