"""Multimodal binary-column plumbing + native SimHash tests."""

import pandas as pd
from pyspark.sql import functions as F

from kawa_spark.operators.blocking import simhash
from kawa_spark.operators.multimodal import decode_media, media_meta


def _media_df(spark):
    rows = [
        ("u1", b"\x89PNG\r\n\x1a\nrest-of-png"),
        ("u2", b"\xff\xd8\xff\xe0jpegdata"),
        ("u3", b"<html><body>hi</body></html>"),
        ("u4", None),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


class TestMediaMeta:
    def test_magic_sniff_and_sizes(self, spark):
        out = {r.url: r for r in media_meta(_media_df(spark)).collect()}
        assert out["u1"].magic == "png"
        assert out["u2"].magic == "jpeg"
        assert out["u3"].magic == "html"
        assert out["u1"].n_bytes == len(b"\x89PNG\r\n\x1a\nrest-of-png")
        assert out["u4"].n_bytes is None

    def test_meta_prunes_binary_column(self, spark):
        # metadata-only reads must not need the decode stage at all —
        # the plan is pure project (no python evals)
        plan = media_meta(_media_df(spark))._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestDecodeStub:
    def test_decode_shapes_and_determinism(self, spark):
        out1 = {r.url: r for r in decode_media(_media_df(spark)).collect()}
        out2 = {r.url: r for r in decode_media(_media_df(spark)).collect()}
        for u, r in out1.items():
            assert 16 <= r.width < 80 and 16 <= r.height < 80
            assert 1 <= r.n_frames <= 8
            assert len(r.features) == 16
            assert out2[u].features == r.features  # deterministic
        # null payload still yields a row (empty-media policy: decode of b"")
        assert out1["u4"].width is not None


class TestSimhash:
    def test_near_dup_vs_distinct(self, spark):
        docs = [
            ("a", "the quick brown fox jumps over the lazy dog today"),
            ("b", "the quick brown fox jumps over the lazy cat today"),  # 1 tok off
            ("c", "completely unrelated text about database query engines"),
        ]
        df = spark.createDataFrame(docs, "id string, text string")
        out = {r.id: r.sh for r in df.select("id", simhash(F.col("text")).alias("sh")).collect()}

        def hamming(x, y):
            return bin((x ^ y) & ((1 << 64) - 1)).count("1")

        assert hamming(out["a"], out["b"]) < hamming(out["a"], out["c"])
        assert hamming(out["a"], out["b"]) <= 16

    def test_simhash_deterministic_and_native(self, spark):
        df = spark.createDataFrame([("x", "alpha beta gamma")], "id string, text string")
        q = df.select(simhash(F.col("text")).alias("sh"))
        assert q.first().sh == q.first().sh
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # stays JVM-side
