"""Bench harness (driver contract).

Runs every ``__spark_entry__.queries()`` entry at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default
32) and prints ONE JSON line::

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, ...}

Each query is forced end-to-end through the ``noop`` sink (full physical
plan executes, nothing is collected to the driver), so the timing covers
scan + shuffle + UDF work, not just ``count()`` short-circuits.

Extra keys (informational, beyond the driver contract): ``er_docs_per_sec``
(flagship-pipeline throughput), ``cpus``, ``sf_dir``.

Scaling evidence across two parallelism levels lives in
``scripts/scaling_bench.py`` (writes BENCH.md) — kept out of the per-round
bench so this file stays fast.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# The files whose changes invalidate a scaling measurement: the ER
# pipeline itself plus the measurement harness. Query-list / oracle /
# docs edits do not touch the measured job.
_SCALING_SCOPE = ("kawa_spark", "scripts/scaling_bench.py")


def _scaling_is_stale(scaling: dict) -> tuple[bool, str | None]:
    """A scaling number embedded from BENCH_SCALING.json is only evidence
    for the code it was measured on. Returns (stale, reason): stale when
    the stamp is missing, was taken on a dirty tree, or pipeline-scope
    files changed between the stamped commit and the current tree."""
    import subprocess

    commit = scaling.get("commit")
    if not commit:
        return True, "no commit stamp (pre-provenance measurement)"
    if commit.endswith("-dirty"):
        return True, f"measured on a dirty tree at {commit}"
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        diff = subprocess.run(
            ["git", "diff", "--name-only", commit, "--", *_SCALING_SCOPE],
            capture_output=True, text=True, cwd=repo, timeout=30,
        )
    except Exception as exc:  # git unavailable: can't attest either way
        return True, f"provenance check failed: {exc}"
    if diff.returncode != 0:
        return True, f"stamped commit {commit[:12]} not in repo"
    changed = [l for l in diff.stdout.strip().splitlines() if l]
    if changed:
        return True, f"pipeline code changed since {commit[:12]}: {changed[:5]}"
    # git diff ignores untracked files, but a brand-new module under
    # kawa_spark/ changes the measured pipeline just the same — mirror
    # the stamping side (which counts untracked as dirty) here too.
    try:
        untracked = subprocess.run(
            ["git", "ls-files", "--others", "--exclude-standard", "--",
             *_SCALING_SCOPE],
            capture_output=True, text=True, cwd=repo, timeout=30,
        )
    except Exception as exc:
        return True, f"provenance check failed: {exc}"
    new_files = [l for l in untracked.stdout.strip().splitlines() if l]
    if new_files:
        return True, f"untracked pipeline files since {commit[:12]}: {new_files[:5]}"
    return False, None


def run_bench(sf_dir: str, cpus: int) -> dict:
    import __spark_entry__ as entry
    from kawa_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="kawa_spark_bench",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up outside all timings: JVM codegen, and — critically — the
    # Python worker pool. Each of the local[N] cores forks a worker that
    # imports pandas/pyarrow on its first Arrow-UDF task (~1-2 s each,
    # contending); a long-running cluster amortizes this once per
    # executor, so timing it into per-query numbers would be noise.
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    _warm = F.pandas_udf(lambda v: v * 1.0, "double")

    spark.range(0, 1 << 18, 1, cpus * 2).select(
        F.sum(_warm((F.col("id") % 97).cast("double")))
    ).collect()
    spark.range(0, 10_000, 1, cpus * 2).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    # Register the table views once outside the timings: parquet file
    # listing + footer schema reads for all ten tables are a per-session
    # fixed cost (a warehouse would hold them in the catalog), and
    # without this the first timed query absorbs it.
    entry._views(spark, sf_dir)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    t_all = time.time()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    er_secs = 0.0
    for name, fn in entry.queries().items():
        # min of two executions: the steady-state number a long-running
        # cluster would see (first run can absorb pool/codegen warm-up)
        best = None
        for _ in range(2):
            t0 = time.time()
            force(fn(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        if name == "er_clusters":
            er_secs = timings[name]
    total = round(time.time() - t_all, 3)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    scaling = None
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json"
    )
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            scaling = json.load(f)
        scaling["stale"], scaling["stale_reason"] = _scaling_is_stale(scaling)
    return {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "er_docs_per_sec": round(n_docs / er_secs, 1) if er_secs else None,
        "scaling": scaling,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
