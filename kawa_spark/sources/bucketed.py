"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the same keyed tables join again and again (surfaces x
surfaces, mentions x clusters, word tables x updates). Pre-bucketing
both sides on the join key (``CLUSTERED BY key INTO n BUCKETS``) makes
every later equi-join read co-partitioned data: Catalyst plans a
SortMergeJoin with NO Exchange on either side — the shuffle is paid
once at write time, amortized over every subsequent join. The same
layout serves Iceberg's ``bucket(n, key)`` partition transform on a
real lakehouse; Spark's Hive-format bucketing is the sandbox-local
equivalent (pinned by tests/test_bucketed.py: the joined plan contains
no Exchange).

Rules for the win to apply (and stay applied at scale):
* both sides bucketed on the JOIN key with the same bucket count
  (or a whole multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin``);
* bucket count chosen for target file sizes at full scale
  (``rows_per_bucket * row_width ~ 128-512 MB``), not for local cores;
* no re-partitioning of the read side before the join (that re-adds
  the exchange the layout exists to avoid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed table bucketed (and by default
    sorted) by ``key`` — the one-time shuffle that later joins skip.
    Sorting within buckets additionally removes the per-join Sort for
    SortMergeJoin."""
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table; the bucket spec rides in the catalog
    so joins on the bucket key avoid the exchange automatically."""
    return spark.table(table)
