"""Exact streaming linkage: micro-batches folded through
:func:`~kawa_spark.operators.incremental.incremental_link`.

:class:`~kawa_spark.streaming.ingest.StreamingERIngest` (the first
streaming front end) accumulates surface-level edges and re-resolves
components on read, with the documented caveat that merges of existing
clusters only re-label on a periodic re-canonicalization pass.
``StreamingLinker`` removes that caveat: every micro-batch runs the
incremental operator whose contract is EXACT equality with a full batch
run over everything seen so far — cluster ids included, for any split
of the stream into batches (pinned by tests/test_streaming_linker.py's
"any batching = one batch" assertions).

Exactly-once without a transactional sink: per-batch outputs
(``clusters/batch_id=N``, ``remaps/batch_id=N``, ``merges/batch_id=N``)
are overwritten on replay, and the standing state is written to a fresh
``state_v{N}`` directory committed by an atomic pointer flip that also
records the batch id — a replayed ``foreachBatch`` call with
``batch_id <= committed`` is a no-op, and a crash mid-batch leaves the
previous pointer (and state version) fully intact, so the retry redoes
the whole batch against the same input state. On an object store the
pointer flip maps to an Iceberg snapshot commit, as with the ingest
wrapper's surfaces pointer.

Scale shape: per-batch cost is the incremental operator's — it scales
with the DELTA (one semi-join prunes the standing block-key index to
touched keys; the broadcast remap join is the only other standing-table
pass). The per-batch ``state_v{N}`` rewrite of the surface tables is
the simple local-FS contract; the surface table is orders of magnitude
smaller than the mention stream, and a production deployment replaces
the rewrite with a MERGE into the catalog table.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import ERState, IncrementResult, incremental_link


class StreamingLinker:
    """foreachBatch bridge: page stream -> exact standing clusters.

    ``pipe`` is a configured :class:`~kawa_spark.pipeline.ERPipeline`
    (lexicon + embeddings + config); ``state_dir`` holds the versioned
    state plus per-batch outputs. Pass ``bootstrap`` to seed from a
    completed batch run's :meth:`ERState.from_out_dir` state; without
    it the stream starts from :meth:`ERState.empty`.
    """

    def __init__(self, pipe, state_dir: str, bootstrap: ERState | None = None):
        self.pipe = pipe
        self.spark: SparkSession = pipe.spark
        self.state_dir = state_dir
        self._bootstrap = bootstrap
        os.makedirs(state_dir, exist_ok=True)

    # -------------- batch-side (reused by foreachBatch) --------------

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        ptr = self._read_pointer()
        if ptr is not None and batch_id <= ptr["batch_id"]:
            return  # replayed, already-committed batch: exactly-once no-op
        state = self._current_state(ptr)
        inc: IncrementResult = incremental_link(self.pipe, state, docs)

        for name, df in (
            ("clusters", inc.new_clusters),
            ("remaps", inc.remap),
            ("merges", inc.merges),
        ):
            df.write.mode("overwrite").parquet(
                os.path.join(self.state_dir, name, f"batch_id={batch_id}")
            )

        vdir = os.path.join(self.state_dir, f"state_v{batch_id}")
        inc.state.save(vdir, self.pipe.cfg)
        self._flip_pointer(batch_id, prev=ptr)

    # ----------------------- read side -----------------------

    def current_state(self) -> ERState:
        return self._current_state(self._read_pointer())

    def current_clusters(self) -> DataFrame:
        """(norm, cluster_id) — the standing surface-level assignment,
        exact as of the last committed batch."""
        return self.current_state().surface_clusters.select("norm", "cluster_id")

    def mentions_view(self) -> DataFrame:
        """Mention-level view across ALL committed batches with CURRENT
        cluster ids: per-batch cluster outputs are immutable history, so
        instead of rewriting them after a merge the view re-joins the
        standing surface map on norm (the same reconciliation the batch
        query does with ``IncrementResult.remap``, folded transitively)."""
        all_batches = self.spark.read.parquet(
            os.path.join(self.state_dir, "clusters")
        )
        current = self.current_clusters().withColumnRenamed(
            "cluster_id", "current_cluster"
        )
        return (
            all_batches.drop("batch_id")
            .join(current, "norm", "left")
            .withColumn(
                "cluster_id", F.coalesce("current_cluster", "cluster_id")
            )
            .drop("current_cluster")
        )

    # ----------------------- stream wiring -----------------------

    def start(
        self,
        source_dir: str,
        checkpoint_dir: str,
        schema: str = "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
        max_files_per_trigger: int | None = None,
    ):
        """readStream over a landing directory -> foreachBatch through
        the incremental operator. Returns the StreamingQuery
        (availableNow: drain everything already landed, then stop)."""
        reader = self.spark.readStream.format("parquet").schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.load(source_dir)
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    # ----------------------- pointer plumbing -----------------------

    def _pointer_file(self) -> str:
        return os.path.join(self.state_dir, "state_CURRENT")

    def _read_pointer(self) -> dict | None:
        try:
            with open(self._pointer_file()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _current_state(self, ptr: dict | None) -> ERState:
        if ptr is None:
            if self._bootstrap is not None:
                return self._bootstrap
            return ERState.empty(self.spark)
        return ERState.load(
            self.spark, os.path.join(self.state_dir, ptr["version"])
        )

    def _flip_pointer(self, batch_id: int, prev: dict | None) -> None:
        """Atomic one-file rename commit (same rationale as the ingest
        wrapper's surfaces pointer: a crash before the replace leaves
        the old state fully live); prunes versions older than the one a
        concurrent reader may still hold."""
        ptr, tmp = self._pointer_file(), self._pointer_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": f"state_v{batch_id}", "batch_id": batch_id}, f)
        os.replace(tmp, ptr)
        keep = {f"state_v{batch_id}", prev and prev["version"]}
        for name in os.listdir(self.state_dir):
            if name.startswith("state_v") and name not in keep:
                shutil.rmtree(
                    os.path.join(self.state_dir, name), ignore_errors=True
                )
