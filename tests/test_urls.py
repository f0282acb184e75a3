"""SURT canonicalization pins: Spark column builder vs an independent
pure-Python reference (written from the transform's spec in the
docstring, not from the Column code) over adversarial URLs."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from kawa_spark.operators.urls import (  # noqa: E402
    DROP_PARAM_RE,
    SCHEME_RE,
    USERINFO_RE,
    host_key,
    with_surt,
)


def py_surt(url: str) -> str:
    u = url.strip().lower()
    u = u.split("#", 1)[0]
    u = re.sub(SCHEME_RE, "", u)
    u = re.sub(USERINFO_RE, "", u)
    authority = u.split("/", 1)[0].split("?", 1)[0]
    rest = u[len(authority):]
    host = authority.split(":", 1)[0]
    host = re.sub(r"^www\.", "", host)
    hk = ",".join(reversed(host.split(".")))
    path = rest.split("?", 1)[0]
    path = re.sub(r"/+$", "", path)
    q = ""
    if "?" in rest:
        params = [
            p
            for p in rest.split("?", 1)[1].split("&")
            if p and not re.match(DROP_PARAM_RE, p)
        ]
        q = "&".join(sorted(params))
    return hk + ")" + path + ("?" + q if q else "")


CASES = [
    "https://www.News.Example.org/Arts/2024/story.html",
    "http://example.com",
    "http://example.com/",
    "http://example.com//",
    "HTTP://EXAMPLE.COM:80/a/",
    "https://example.com:443/a",
    "https://example.com:8443/a",
    "https://user:pw@example.com/a?b=2&a=1",
    "https://example.com/a?utm_source=tw&b=2&a=1&fbclid=xyz",
    "https://example.com/a?jsessionid=ABC123",
    "https://example.com/a?&&",
    "https://example.com/a#frag?not=query",
    "https://sub.www.example.co.uk/path/?z=1&y=2#x",
    "ftp://files.example.net/pub/",
    "https://www.example.com",
    "example.com/bare?b=1&a=2",  # scheme-less (crawl logs carry these)
    "https://example.com/a?a=1&a=1",  # duplicate params survive, sorted
    "  https://Example.com/Trim  ",
]


def test_spark_matches_python_reference(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = [r["surt"] for r in with_surt(df).orderBy("url").collect()]
    expected = [py_surt(u) for u in sorted(CASES)]
    assert got == expected


def test_aliases_collapse(spark):
    """The whole point: alias forms of one resource share one key."""
    aliases = [
        "https://www.Example.com/a/?b=2&a=1",
        "HTTP://EXAMPLE.COM:80/a?a=1&b=2&utm_campaign=x",
        "https://user@example.com/a/?b=2&a=1#sec",
    ]
    df = spark.createDataFrame([(u,) for u in aliases], "url string")
    keys = {r["surt"] for r in with_surt(df).collect()}
    assert keys == {"com,example)/a?a=1&b=2"}


def test_host_key_sorts_by_registered_domain(spark):
    df = spark.createDataFrame(
        [("https://a.example.com/x",), ("https://b.example.com/y",),
         ("https://example.org/z",)],
        "url string",
    )
    from pyspark.sql import functions as F

    keys = [r[0] for r in df.select(host_key(F.col("url"))).collect()]
    assert keys == ["com,example,a", "com,example,b", "org,example"]


def test_plan_is_single_narrow_projection(spark):
    """No Python, no shuffle: the SURT column is one JVM-side Project
    (the higher-order param filter keeps it out of WholeStageCodegen,
    but it must never become a Python eval node or an exchange)."""
    df = with_surt(spark.range(10).selectExpr(
        "concat('https://www.h', id, '.example.com/p/', id, '?b=2&a=1') AS url"
    ))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # two Projects: the fixture's URL synthesis + the SURT projection
    assert plan.count("Project") <= 2
