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

CDC streams: a micro-batch may carry an ``op`` column — deletes retract
every standing mention of the url (``retract_docs``, the exact inverse
increment), upserts are retract-then-link (a re-crawled url replaces
its old mention set). Liveness across immutable per-batch mention
history is resolved by a url-level event log (latest add wins), so
nothing is ever rewritten: per-batch outputs stay immutable and the
current corpus is a partition-prunable semi-join of history against
the latest-event table. Without an ``op`` column the original
append-only contract is untouched.

Scale shape: per-batch cost is the incremental operator's — it scales
with the DELTA (one semi-join prunes the standing block-key index to
touched keys; the broadcast remap join is the only other standing-table
pass), plus, for CDC batches, retract_docs' one pass over the live
mention history. The per-batch ``state_v{N}`` rewrite of the surface
tables is the simple local-FS contract; the surface table is orders of
magnitude smaller than the mention stream, and a production deployment
replaces the rewrite with a MERGE into the catalog table (and the
mention history with an Iceberg table whose url-bucketed layout lets
the retraction pass prune).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import (
    ERState,
    IncrementResult,
    incremental_link,
    retract_docs,
)


class StreamingLinker:
    """foreachBatch bridge: page stream -> exact standing clusters.

    ``pipe`` is a configured :class:`~kawa_spark.pipeline.ERPipeline`
    (lexicon + embeddings + config); ``state_dir`` holds the versioned
    state plus per-batch outputs. Pass ``bootstrap`` to seed from a
    completed batch run's :meth:`ERState.from_out_dir` state; without
    it the stream starts from :meth:`ERState.empty`.
    """

    def __init__(
        self,
        pipe,
        state_dir: str,
        bootstrap: ERState | None = None,
        bootstrap_clusters: DataFrame | None = None,
    ):
        self.pipe = pipe
        self.spark: SparkSession = pipe.spark
        self.state_dir = state_dir
        self._bootstrap = bootstrap
        self._bootstrap_clusters = bootstrap_clusters
        os.makedirs(state_dir, exist_ok=True)

    # -------------- batch-side (reused by foreachBatch) --------------

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch. ``docs`` may carry an ``op`` column
        (``'upsert'``/``'add'`` vs ``'delete'``) for CDC streams:

        * deletes retract every standing mention of the url;
        * upserts are retract-then-link (a re-crawled url replaces its
          old mention set — fresh urls retract nothing by construction);
        * without an ``op`` column every row is an add (the original
          append-only contract, unchanged).

        Within one micro-batch ops carry no order: retractions apply
        against the pre-batch state first, then the add side links, so
        a url appearing as both delete and upsert in the same batch
        ends up PRESENT (upsert wins; documented tie rule). Everything
        stays exact — retract_docs and incremental_link each land the
        batch-run state for the corpus they leave behind."""
        ptr = self._read_pointer()
        if ptr is not None and batch_id <= ptr["batch_id"]:
            return  # replayed, already-committed batch: exactly-once no-op
        state = self._current_state(ptr)
        self._materialize_bootstrap_history(ptr)

        cdc = "op" in docs.columns
        if cdc:
            adds = docs.filter(F.col("op") != "delete").drop("op")
            add_urls = adds.select("url").distinct()
            del_urls = (
                docs.filter(F.col("op") == "delete")
                .select("url")
                .distinct()
                .join(add_urls, "url", "left_anti")  # upsert wins
            )
            retract_urls = add_urls.unionByName(del_urls)
        else:
            # append-only contract, byte-for-byte the original behavior
            adds, add_urls = docs, docs.select("url").distinct()
            del_urls, retract_urls = None, None

        if cdc and (ptr is not None or self._bootstrap_clusters is not None):
            # retracting urls with no standing mentions is a no-op, so
            # fresh adds cost nothing here; re-crawls and deletes drop
            # their old mentions before the add side links
            res = retract_docs(
                self.pipe, state,
                retract_urls,
                self._live_mentions_before(batch_id),
            )
            state = res.state
            for name, df in (
                ("retract_remaps", res.remap),
                ("splits", res.splits),
            ):
                df.write.mode("overwrite").parquet(
                    os.path.join(self.state_dir, name, f"batch_id={batch_id}")
                )

        inc: IncrementResult = incremental_link(self.pipe, state, adds)

        for name, df in (
            ("clusters", inc.new_clusters),
            ("remaps", inc.remap),
            ("merges", inc.merges),
        ):
            df.write.mode("overwrite").parquet(
                os.path.join(self.state_dir, name, f"batch_id={batch_id}")
            )
        events = add_urls.withColumn("op", F.lit("add"))
        if del_urls is not None:
            events = events.unionByName(
                del_urls.withColumn("op", F.lit("delete"))
            )
        events.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "events", f"batch_id={batch_id}")
        )

        vdir = os.path.join(self.state_dir, f"state_v{batch_id}")
        inc.state.save(vdir, self.pipe.cfg)
        self._flip_pointer(batch_id, prev=ptr)

    # ----------------------- liveness plumbing -----------------------

    def _materialize_bootstrap_history(self, ptr: dict | None) -> None:
        """Seeded streams need the bootstrap's mention-level rows in the
        history so later retractions can see them: written once, as the
        pseudo-batch ``batch_id=-1``, before the first real batch
        commits (idempotent under replay — pointer still None)."""
        if ptr is not None or self._bootstrap_clusters is None:
            return
        self._bootstrap_clusters.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "clusters", "batch_id=-1")
        )
        (
            self._bootstrap_clusters.select("url")
            .distinct()
            .withColumn("op", F.lit("add"))
            .write.mode("overwrite")
            .parquet(os.path.join(self.state_dir, "events", "batch_id=-1"))
        )

    def _history(self, name: str, max_batch: int) -> DataFrame:
        """Per-batch parquet history clamped to committed batches
        (< max_batch): a crashed attempt's partial ``batch_id=N`` files
        are invisible to the retry that re-reads state."""
        df = self.spark.read.parquet(os.path.join(self.state_dir, name))
        return df.filter(F.col("batch_id") < max_batch)

    def _live_urls(self, max_batch: int) -> DataFrame:
        """(url, batch_id) of each url's LATEST event if it was an add —
        the event log is url-level (orders of magnitude smaller than the
        mention stream), so the latest-event window is cheap."""
        from pyspark.sql import Window

        w = Window.partitionBy("url").orderBy(F.desc("batch_id"))
        return (
            self._history("events", max_batch)
            .withColumn("rk", F.row_number().over(w))
            .filter((F.col("rk") == 1) & (F.col("op") == "add"))
            .select("url", "batch_id")
        )

    def _live_mentions_before(self, batch_id: int) -> DataFrame:
        """The standing live mention-level table as of the pre-batch
        state: history rows from each live url's latest add batch
        (partition-prunable semi-join on (url, batch_id))."""
        return self._history("clusters", batch_id).join(
            self._live_urls(batch_id), ["url", "batch_id"], "left_semi"
        )

    def live_mentions(self) -> DataFrame:
        """Mention-level view of the CURRENT corpus (deletes and
        re-crawls resolved) under CURRENT cluster ids."""
        ptr = self._read_pointer()
        committed = -1 if ptr is None else ptr["batch_id"]
        live = self._live_mentions_before(committed + 1)
        current = self.current_clusters().withColumnRenamed(
            "cluster_id", "current_cluster"
        )
        return (
            live.drop("batch_id", "cluster_id")
            .join(current, "norm", "left")
            .withColumnRenamed("current_cluster", "cluster_id")
        )

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
