"""A5/G5: per-parent mean embeddings + cluster hygiene
(reference: ontology_kb.py cleanup_kb, 1059-1153)."""

import pytest
from pyspark.sql import functions as F

from kawa_spark.operators.hierarchy import cluster_hygiene, parent_mean_embeddings


def nodes_df(spark):
    rows = [
        # (id, parent, level, vec)
        ("a", "p1", 0, [1.0, 0.0]),
        ("b", "p1", 0, [0.0, 1.0]),
        ("c", "p1", 0, [1.0, 1.0]),
        ("d", "p2", 0, [4.0, 4.0]),
        ("p1", "r", 1, [9.0, 9.0]),
        ("p2", "r", 1, [9.0, 9.0]),
        ("r", None, 2, [9.0, 9.0]),
    ]
    return spark.createDataFrame(
        rows, "id string, parent string, level int, vec array<float>"
    )


class TestParentMeans:
    def test_unweighted_mean(self, spark):
        means = {
            r.parent: (tuple(r.vec), r.n_children)
            for r in parent_mean_embeddings(nodes_df(spark)).collect()
        }
        # kb.py:1123 — np.mean over children, unweighted
        assert means["p1"][1] == 3
        assert means["p1"][0] == pytest.approx((2 / 3, 2 / 3))
        assert means["p2"] == ((4.0, 4.0), 1)


class TestClusterHygiene:
    def test_small_cluster_dissolved_and_reattached(self, spark):
        new, deleted = cluster_hygiene(nodes_df(spark), min_cluster_size=2)
        by_id = {r.id: r for r in new.collect()}
        # level-1 sweep: p2 (1 child < 2) dissolved, d reattaches to r;
        # level-2 sweep: r has only 1 surviving level-1 child (p1) -> r
        # dissolves too, and ALL its children (p1 and the reattached d)
        # cascade to r's parent = NULL (kb.py:1091-1096 decluster)
        assert "p2" not in by_id and "r" not in by_id
        assert by_id["d"].parent is None
        assert by_id["p1"].parent is None
        # p1 survives with recomputed mean vec
        assert tuple(by_id["p1"].vec) == pytest.approx((2 / 3, 2 / 3))
        dels = {(r.id, r.level) for r in deleted.collect()}
        assert dels == {("p2", 1), ("r", 2)}

    def test_no_dissolution_when_threshold_met(self, spark):
        new, deleted = cluster_hygiene(nodes_df(spark), min_cluster_size=1)
        assert deleted.count() == 0
        assert new.count() == nodes_df(spark).count()

    def test_means_skipped_when_disabled(self, spark):
        new, _ = cluster_hygiene(
            nodes_df(spark), min_cluster_size=1, recompute_means=False
        )
        p1 = [r for r in new.collect() if r.id == "p1"][0]
        assert tuple(p1.vec) == (9.0, 9.0)
