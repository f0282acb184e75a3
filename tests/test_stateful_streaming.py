"""applyInPandasWithState surface profiles: state accumulates across
micro-batches and restarts (checkpointed)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from kawa_spark.streaming.stateful import surface_profiles

SCHEMA = "norm string, url_hash long, ts long"


def write_batch(spark, src_dir, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("append").parquet(src_dir)


def run_stream(spark, src_dir, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        surface_profiles(stream)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


class TestSurfaceProfiles:
    def test_state_accumulates_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        write_batch(spark, src, [("acme", 1, 100), ("acme", 2, 90), ("zeta", 9, 50)])
        run_stream(spark, src, ckpt, out)
        write_batch(spark, src, [("acme", 1, 200), ("acme", 3, 300)])
        run_stream(spark, src, ckpt, out)

        # the LAST update row per norm carries the accumulated state
        rows = spark.read.parquet(out).collect()
        latest = {}
        for r in rows:
            cur = latest.get(r.norm)
            if cur is None or r.n_mentions > cur.n_mentions:
                latest[r.norm] = r
        acme = latest["acme"]
        assert acme.n_mentions == 4          # 2 + 2 across batches
        assert acme.first_seen == 90         # min ts survives the restart
        assert acme.approx_urls == 3         # urls {1,2,3}; repeat of 1 not double-counted
        assert latest["zeta"].n_mentions == 1


class TestWindowedCounts:
    def test_watermark_drops_late_and_finalizes_windows(self, spark, tmp_path):
        from kawa_spark.streaming.stateful import windowed_mention_counts

        schema = "norm string, ts_time timestamp"
        src = str(tmp_path / "wsrc")
        ckpt = str(tmp_path / "wckpt")
        out = str(tmp_path / "wout")

        def batch(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)

        def run():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                windowed_mention_counts(stream, watermark="10 minutes",
                                        window="5 minutes")
                .writeStream.format("parquet")
                .option("checkpointLocation", ckpt)
                .option("path", out)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        import datetime as dt

        t = dt.datetime(2024, 1, 1, 12, 0, 0)
        m = dt.timedelta(minutes=1)
        batch([("acme", t), ("acme", t + 2 * m)])
        run()
        # watermark advances at micro-batch END: this batch pushes it to
        # 12:30, finalizing (emitting) the first window [12:00, 12:05)
        batch([("acme", t + 40 * m)])
        run()
        # now a 12:01 event is behind the 12:30 watermark -> dropped;
        # the already-finalized first window must NOT change
        batch([("acme", t + 60 * m), ("acme", t + 1 * m)])
        run()

        rows = spark.read.parquet(out).collect()
        by_start = {r.window_start.minute: r.n_mentions for r in rows
                    if r.norm == "acme" and r.window_start.hour == 12}
        # first window [12:00,12:05): the 2 on-time events counted, the
        # late arrival (after watermark passed) dropped
        assert by_start.get(0) == 2
