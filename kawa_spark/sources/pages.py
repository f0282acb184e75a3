"""Web-page input source — the contract table of the north rule.

Input shape (BASELINE.json input_hint): an Iceberg table of
Common-Crawl-style pages with columns::

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

``read_pages`` accepts either an Iceberg table name (``catalog.db.t`` —
used when the session has an Iceberg catalog configured; this sandbox
ships no Iceberg jars, so that path is exercised on a real cluster) or
a parquet path (the sandbox form). It validates the contract columns,
prunes to what the ER pipeline consumes, and optionally derives
``text`` from ``html`` when text is NULL.

The html->text step is a clearly-marked deterministic fallback, NOT a
production extractor: the reference pipeline consumes pre-extracted
text (its own extraction invariant is defined on the text column), and
real html boilerplate removal needs libraries this container does not
ship. The fallback strips tags/scripts natively (regexp, JVM-side) so
the Spark plumbing — schema, pruning, partitioning — is real and
tested, and the extractor can be swapped per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def html_to_text_fallback(html_col) -> "F.Column":
    """Native tag-strip fallback (NOT boilerplate removal — see module
    docstring): drop script/style blocks, strip tags, unescape the few
    entities that matter, collapse whitespace."""
    txt = html_col.cast("string")
    txt = F.regexp_replace(txt, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    txt = F.regexp_replace(txt, r"(?s)<[^>]+>", " ")
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")):
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def read_pages(
    spark: SparkSession,
    source: str,
    derive_text_from_html: bool = True,
    keep_html: bool = False,
    fmt: str | None = None,
) -> DataFrame:
    """Iceberg table name or parquet path -> pages DataFrame with the
    contract schema. Column pruning happens HERE so the binary html
    column never reaches the scan output unless requested — on a 10^12
    -row table the html bytes dominate IO and must prune out of every
    text-only plan (verified by test: the parquet ReadSchema excludes
    html).

    ``fmt``: force ``"parquet"`` or ``"table"`` dispatch. When omitted,
    paths are recognized by a '/' or '.parquet' suffix OR by existing on
    the local filesystem (so a bare relative directory name like
    ``"pages_out"`` is not misrouted to the catalog)."""
    if fmt is None:
        is_path = (
            "/" in source
            or source.endswith(".parquet")
            or os.path.exists(source)
        )
        fmt = "parquet" if is_path else "table"
    if fmt == "parquet" and os.path.exists(source):
        # the JVM resolves relative paths against ITS cwd, not Python's
        source = os.path.abspath(source)
    if fmt == "parquet":
        df = spark.read.parquet(source)
    elif fmt == "table":
        df = spark.read.table(source)
    else:
        raise ValueError(f"fmt must be 'parquet' or 'table', got {fmt!r}")
    missing = [c for c in ("url", "text") if c not in df.columns]
    if missing:
        raise ValueError(f"pages source missing contract columns: {missing}")
    has = set(df.columns)
    text = F.col("text")
    if derive_text_from_html and "html" in has:
        text = F.coalesce(F.col("text"), html_to_text_fallback(F.col("html")))
    cols = [
        F.col("url"),
        (F.col("warc_ts") if "warc_ts" in has else F.lit(None).cast("timestamp")).alias("warc_ts"),
        text.alias("text"),
        (F.col("lang") if "lang" in has else F.lit(None).cast("string")).alias("lang"),
    ]
    if keep_html and "html" in has:
        cols.insert(2, F.col("html"))
    return df.select(*cols)
