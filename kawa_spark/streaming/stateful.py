"""Custom stateful streaming operator (beyond-reference, SURVEY §2.11).

The batch pipeline already handles continuous ingest via foreachBatch
(streaming/ingest.py). This module adds the other Structured Streaming
primitive a training-data pipeline needs: per-key running state with
``applyInPandasWithState`` — here, per-surface-form mention statistics
(first-seen time, occurrence count, distinct-url estimate) maintained
incrementally across micro-batches. The reference has no streaming at
all; this is the Spark-native shape for "keep a live profile per
entity surface as pages stream in".

State per norm: (first_seen epoch, n_mentions, url_sketch) where
url_sketch is a small bounded set of url hashes (a poor-man's distinct
sketch — bounded memory per key, exact up to ``sketch_cap``)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "norm string, first_seen long, n_mentions long, approx_urls long"
)
STATE_SCHEMA = "first_seen long, n_mentions long, url_hashes array<long>"

SKETCH_CAP = 256


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (norm,) = key
    if state.exists:
        first_seen, n, hashes = state.get
        seen = set(hashes)
    else:
        first_seen, n, seen = None, 0, set()
    for pdf in pdfs:
        n += len(pdf)
        ts = pdf["ts"].min()
        first_seen = int(ts) if first_seen is None else min(first_seen, int(ts))
        if len(seen) < SKETCH_CAP:
            for h in pdf["url_hash"]:
                seen.add(int(h))
                if len(seen) >= SKETCH_CAP:
                    break
    state.update((first_seen, n, sorted(seen)))
    yield pd.DataFrame(
        {
            "norm": [norm],
            "first_seen": [first_seen],
            "n_mentions": [n],
            "approx_urls": [len(seen)],
        }
    )


def windowed_mention_counts(
    mentions: DataFrame,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per norm: the standard
    late-data pattern — events later than ``watermark`` behind the max
    seen ts are dropped, windows finalize (and emit, in append mode)
    once the watermark passes their end. mentions needs an event-time
    ``ts_time`` timestamp column."""
    from pyspark.sql import functions as F

    return (
        mentions.withWatermark("ts_time", watermark)
        .groupBy(F.window("ts_time", window).alias("w"), "norm")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "norm",
            "n_mentions",
        )
    )


def surface_profiles(mentions: DataFrame) -> DataFrame:
    """Streaming mentions (norm, url_hash, ts epoch-long) -> per-norm
    running profile, updated each micro-batch. Works on a streaming OR
    batch DataFrame (Spark routes both through the same grouped-map)."""
    # append output: each micro-batch APPENDS one snapshot row per
    # touched norm (an event-log of profiles — file sinks are
    # append-only; consumers take the max-n_mentions row per norm)
    return mentions.groupBy("norm").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
