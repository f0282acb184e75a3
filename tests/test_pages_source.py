"""Pages source: contract schema (url, warc_ts, html, text, lang),
html fallback, and binary-column pruning."""

import datetime

import pytest
from pyspark.sql import functions as F

from kawa_spark.sources.pages import read_pages


@pytest.fixture()
def pages_parquet(spark, tmp_path):
    rows = [
        (
            "http://a.example/1",
            datetime.datetime(2024, 1, 1, 12, 0, 0),
            b"<html><head><style>p{}</style></head>"
            b"<body><p>Hello &amp; welcome</p><script>x()</script></body></html>",
            None,  # text must be derived from html
            "en",
        ),
        (
            "http://a.example/2",
            datetime.datetime(2024, 1, 2, 12, 0, 0),
            b"<html>ignored</html>",
            "already extracted",
            "en",
        ),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    path = str(tmp_path / "pages.parquet")
    df.write.parquet(path)
    return path


class TestReadPages:
    def test_contract_schema_and_fallback(self, spark, pages_parquet):
        pages = read_pages(spark, pages_parquet)
        assert pages.columns == ["url", "warc_ts", "text", "lang"]
        by_url = {r.url: r for r in pages.collect()}
        assert by_url["http://a.example/1"].text == "Hello & welcome"
        assert by_url["http://a.example/2"].text == "already extracted"

    def test_html_pruned_when_text_only(self, spark, pages_parquet):
        # text-only plan must not read the binary html column at the scan
        import re

        pages = read_pages(spark, pages_parquet, derive_text_from_html=False)
        plan = pages.select("url", "text")._jdf.queryExecution().executedPlan().toString()
        schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert schema and "html" not in schema.group(1), plan

    def test_missing_contract_columns_rejected(self, spark, tmp_path):
        path = str(tmp_path / "bad.parquet")
        spark.createDataFrame([("x",)], "url string").write.parquet(path)
        with pytest.raises(ValueError, match="text"):
            read_pages(spark, path)

    def test_keep_html(self, spark, pages_parquet):
        pages = read_pages(spark, pages_parquet, keep_html=True)
        assert "html" in pages.columns


def test_bare_relative_dir_is_read_as_path(spark, tmp_path, monkeypatch):
    """A parquet directory named without '/' or '.parquet' must not be
    misrouted to the table catalog."""
    import os

    import pandas as pd

    from kawa_spark.sources.pages import read_pages

    d = tmp_path / "pages_out"
    spark.createDataFrame(
        pd.DataFrame({"url": ["u1"], "text": ["hello"], "lang": ["en"]})
    ).write.parquet(str(d))
    monkeypatch.chdir(tmp_path)
    df = read_pages(spark, "pages_out")
    assert df.count() == 1
    # and the explicit override still works both ways
    assert read_pages(spark, str(d), fmt="parquet").count() == 1
