"""Temporal operators: sessionization, as-of join, bucketed range join.

These are the event-stream / point-in-time operators a web-scale
pipeline needs around the ER core (the reference's data model carries
crawl timestamps — warc_ts in the page contract — but its single-node
engine has no temporal joins; these are the Spark-first equivalents).

Scale notes (10^12-row tables):
* ``sessionize`` — one shuffle on the entity key; the two window passes
  (lag + running sum) share the same (key, ts) sort so Spark plans a
  single Sort+Window stage, then a partial-aggregated groupBy.
* ``asof_join`` — the classic distributed point-in-time join: UNION the
  probe and build sides, one shuffle+sort on (key, ts), and a
  last_value(ignoreNulls) window carries the most recent build row
  forward. No range explosion, no per-key skew beyond the key's own
  row count — this is how you as-of join two 10^12-row tables without
  a cross join.
* ``bucketed_range_join`` — interval self-join via time buckets: each
  left row probes its own and the next bucket, so the join is a pure
  equi-join on (key, bucket) that AQE can plan/skew-split; the
  |t_b - t_a| <= window predicate filters after. Candidate fan-out is
  bounded by events-per-(key, window) — the correct behavior for an
  interval join (output is Θ(true pairs), not Θ(n²)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(ts_col: str) -> "F.Column":
    """Epoch microseconds. Parquet timestamps load as TIMESTAMP_NTZ in
    Spark 4; with a UTC session the cast makes unix_micros agree with
    DuckDB's epoch_us on the same naive values."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Split each key's event stream into sessions at gaps > ``gap_us``
    microseconds; returns per-session aggregates.

    Output: (key_col, session_seq, n_events, session_start_us,
    session_span_us). ``session_seq`` is 1-based in time order.
    """
    w = Window.partitionBy(key_col).orderBy("t")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = events.select(key_col, _micros(ts_col).alias("t"))
    is_new = (
        F.col("prev_t").isNull() | (F.col("t") - F.col("prev_t") > gap_us)
    ).cast("int")
    return (
        e.withColumn("prev_t", F.lag("t").over(w))
        .withColumn("session_seq", F.sum(is_new).over(run))
        .groupBy(key_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("t").alias("session_start_us"),
            (F.max("t") - F.min("t")).alias("session_span_us"),
        )
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    ts_col: str,
    carry_cols: list[str],
) -> DataFrame:
    """Left as-of join: for each probe row, attach ``carry_cols`` from
    the build row with the greatest ``ts_col`` <= the probe's (same
    key); NULLs when no build row precedes. Both inputs must share
    ``key_col`` + ``ts_col`` schemas on those columns.

    Equal timestamps: the build row sorts first, so a build event at
    exactly the probe's timestamp IS matched (DuckDB ASOF `>=`
    semantics). Build rows tied on (key, ts) are broken by the carry
    STRUCT ascending (the greatest carry tuple wins) — without this the
    winner would depend on shuffle order and the output would be
    nondeterministic run to run.

    Carry columns travel as ONE struct per build row, so the probe row
    always receives an atomic build row — including any NULL fields in
    it. Filling each carry column with an independent last(ignorenulls)
    window would stitch values from different build rows whenever the
    latest build row holds a NULL (the round-2 review finding).
    """
    from pyspark.sql.types import StructField, StructType

    pcols = probe.columns
    carry_type = StructType(
        [StructField(c, build.schema[c].dataType) for c in carry_cols]
    )
    p = probe.withColumn("_is_probe", F.lit(1)).withColumn(
        "_carry", F.lit(None).cast(carry_type)
    )
    b = build.select(
        key_col,
        ts_col,
        F.struct(*[F.col(c).alias(c) for c in carry_cols]).alias("_carry"),
    ).withColumn("_is_probe", F.lit(0))
    for c in pcols:
        if c not in (key_col, ts_col):
            b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
    u = p.select(*pcols, "_carry", "_is_probe").unionByName(
        b.select(*pcols, "_carry", "_is_probe")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_is_probe", "_carry")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *pcols,
        "_is_probe",
        F.last("_carry", ignorenulls=True).over(w).alias("_carry"),
    )
    return filled.filter(F.col("_is_probe") == 1).select(
        *pcols, *[F.col(f"_carry.{c}").alias(c) for c in carry_cols]
    )


def bucketed_range_join(
    events: DataFrame,
    window_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered within-window pairs per key: rows (id_a, id_b) with the
    same key and 0 < t_b - t_a <= ``window_us``. Equi-join on
    (key, bucket) with each left row probing buckets {b, b+1} — the
    scalable interval-join plan (no theta join, no cross product).

    Output: (key_col, id_a, id_b, dt_us).
    """
    e = events.select(
        F.col(key_col),
        F.col(id_col),
        _micros(ts_col).alias("t"),
    ).withColumn("b", F.expr(f"t div {int(window_us)}"))
    left = e.withColumn(
        "probe_b", F.explode(F.array(F.col("b"), F.col("b") + F.lit(1)))
    ).select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id_a"),
        F.col("t").alias("t_a"),
        "probe_b",
    )
    right = e.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id_b"),
        F.col("t").alias("t_b"),
        F.col("b").alias("probe_b"),
    )
    return (
        left.join(right, ["k", "probe_b"])
        .filter(
            (F.col("t_b") > F.col("t_a"))
            & (F.col("t_b") - F.col("t_a") <= window_us)
        )
        .select(
            F.col("k").alias(key_col),
            "id_a",
            "id_b",
            (F.col("t_b") - F.col("t_a")).alias("dt_us"),
        )
    )
