"""Physical-plan audit: verify the plans are the ones a 100 TB run needs.

For each audited query this prints a compact PASS/FAIL line per
assertion plus the evidence, checking the properties the engine's scale
story rests on:

* filters reach the parquet scan (``PushedFilters``);
* column pruning reaches the scan (``ReadSchema`` excludes unused
  columns — in particular the pages reader never scans ``html`` for
  text-only plans);
* small dimension joins broadcast (``BroadcastHashJoin``), big
  equi-joins shuffle (``SortMergeJoin``/``ShuffledHashJoin``) — no
  accidental ``CartesianProduct``/``BroadcastNestedLoopJoin`` in the
  hot path;
* expressions stay inside WholeStageCodegen spans.

Usage: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from kawa_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CHECKS = {
    # query -> list of (description, predicate over formatted plan)
    "scan_filter_project": [
        ("filter pushed to scan", lambda p: "PushedFilters: [" in p
         and "IsNotNull(event_type)" in p),
        ("scan prunes to 4 cols", lambda p: re.search(
            r"ReadSchema: struct<event_id:bigint,user_id:bigint,"
            r"event_type:string,value:double>", p) is not None),
        ("whole-stage codegen", lambda p: "[codegen id :" in p),
    ],
    "join_enrich_region": [
        ("dims broadcast", lambda p: p.count("BroadcastHashJoin") >= 2),
        ("no cartesian/BNLJ", lambda p: "CartesianProduct" not in p
         and "BroadcastNestedLoop" not in p),
    ],
    "topk_orders": [
        ("TakeOrdered plan (no global sort)", lambda p:
         "TakeOrderedAndProject" in p),
    ],
    "exact_dedup_fingerprint": [
        ("partial agg before shuffle", lambda p:
         "partial_" in p or "HashAggregate" in p),
    ],
    "ngram_lsh_dedup": [
        ("bucket join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        # bounded_self_pairs regression guard: the bucket self-join must
        # keep the hot/cold split — a LeftAnti (cold side excludes hot
        # keys) plus a Union of the cold and triangle-partitioned hot
        # pair streams. A plain uncapped self-join has neither.
        ("hot/cold split present (LeftAnti)", lambda p: "LeftAnti" in p),
        ("cold+hot pair union present", lambda p: "Union" in p),
    ],
    "range_join_counts": [
        ("interval join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
    ],
    "idf_weights": [
        ("partial agg before shuffle", lambda p: "HashAggregate" in p),
        ("scan prunes to doc_id+text", lambda p: re.search(
            r"ReadSchema: struct<doc_id:bigint,text:string>", p) is not None),
    ],
    "mention_cooccur": [
        ("self-join is equi on doc_id (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("partial agg before shuffle", lambda p: "partial_count" in p),
    ],
    # weighted_jaccard's plan contains ONE BroadcastNestedLoopJoin by
    # design: the 1-row corpus-count scalar crossed onto the vocab table
    # (CROSS JOIN n). The heavy join — (pair, token) full-outer — must
    # still shuffle on its keys, and nothing may plan as a cartesian.
    "weighted_jaccard": [
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("pair-token full-outer shuffles on keys", lambda p:
         "SortMergeJoin" in p and "FullOuter" in p),
        # formatted explain prints each node twice (tree + detail
        # section), so ONE BNLJ node = 2 string occurrences
        ("only the scalar-count BNLJ", lambda p:
         p.count("BroadcastNestedLoopJoin") <= 2),
    ],
    # blocking_recall / ann_recall contain a brute-force side that IS a
    # bounded nested-loop by design (truth on a fixed probe subset);
    # the scale evidence is the probe filter reaching the parquet scan,
    # which bounds that loop at any corpus size.
    "blocking_recall_tokens": [
        ("probe-set filter pushed to scan", lambda p:
         "LessThan(doc_id,200)" in p),
    ],
    "ann_recall_multi": [
        ("probe filter pushed to scan", lambda p:
         "LessThan(vec_id,8)" in p),
    ],
    "asof_error": [
        ("single window pass (one sort per partition key)", lambda p:
         p.count("Window") <= 2),
        ("no join at all (union + window)", lambda p:
         "Join" not in p),
    ],
    # the distinct-text dedup key: ONE aggregate exchange with a
    # map-side partial (the combiner that keeps the exchange at
    # ~distinct-texts rows, not corpus rows, at 10^12 docs)
    "text_dedup_stats": [
        ("map-side partial agg before the key exchange", lambda p:
         "partial_" in p),
        ("single shuffle (one key exchange)", lambda p:
         p.count("Exchange hashpartitioning") <= 2),
        ("scan prunes to doc_id+text+lang", lambda p: re.search(
            r"ReadSchema: struct<doc_id:bigint,text:string,lang:string>",
            p) is not None),
    ],
    # corpus-level passage dedup: pruned scan, partial aggs before every
    # exchange, and the chunk-frequency re-join stays an equi hash join
    "chunk_dedup": [
        ("scan prunes to doc_id+text", lambda p: re.search(
            r"ReadSchema: struct<doc_id:bigint,text:string>", p) is not None),
        ("freq re-join is equi (no theta)", lambda p:
         "Join condition: None" in p and "Cartesian" not in p
         and "NestedLoop" not in p),
        ("map-side partial agg before exchanges", lambda p:
         "partial_" in p),
    ],
    "dup_span_coverage": [
        ("scan prunes to doc_id+text", lambda p: re.search(
            r"ReadSchema: struct<doc_id:bigint,text:string>", p) is not None),
        ("freq re-join is equi (no theta)", lambda p:
         "Cartesian" not in p and "NestedLoop" not in p),
        ("map-side partial agg before exchanges", lambda p:
         "partial_" in p),
        ("exactly one window pass for the interval union", lambda p:
         len(re.findall(r"\n\(\d+\) Window\b", p)) == 1),
    ],
    "surt_host_stats": [
        ("scan prunes to doc_id+lang+source", lambda p: re.search(
            r"ReadSchema: struct<doc_id:bigint,lang:string,source:string>",
            p) is not None),
        ("no join (canonicalization is a projection)", lambda p:
         "Join" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("map-side partial agg before the host exchange", lambda p:
         "partial_" in p),
    ],
    "hash_split": [
        ("no join at all", lambda p: "Join" not in p),
        ("map-side partial agg before the split exchange", lambda p:
         "partial_" in p),
    ],
    "stratified_sample": [
        ("scan prunes to doc_id+lang", lambda p: re.search(
            r"ReadSchema: struct<doc_id:bigint,lang:string>", p) is not None),
        ("single per-stratum window (no join)", lambda p:
         "Window" in p and "Join" not in p),
    ],
    # Fellegi-Sunter pattern weights: blocked equi self-join, bounded
    # (<=2^K-row) aggregate with a map-side partial, weights folded to
    # codegen literals — never a UDF or a weight-table join
    "fs_pattern_weights": [
        ("block join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("map-side partial agg before the pattern exchange", lambda p:
         "partial_" in p),
        ("no Python in the plan (weights are literals)", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("scan prunes to the 4 compared columns", lambda p: re.search(
            r"ReadSchema: struct<p_name:string,p_brand:string,"
            r"p_type:string,p_size:int>", p) is not None),
    ],
    # CBS meta-blocking: the per-key pair stream must keep the
    # bounded_self_pairs hot/cold split, and the cbs count must
    # partial-aggregate before its exchange
    "meta_blocking": [
        ("hot/cold split present (LeftAnti)", lambda p: "LeftAnti" in p),
        ("cold+hot pair union present", lambda p: "Union" in p),
        ("no cartesian/BNLJ", lambda p: "CartesianProduct" not in p
         and "BroadcastNestedLoop" not in p),
        ("map-side partial agg before the cbs exchange", lambda p:
         "partial_" in p),
        ("scan prunes to name+brand", lambda p: re.search(
            r"ReadSchema: struct<p_name:string(,p_brand:string)?>", p)
         is not None),
    ],
    # CNP meta-blocking: same CBS stream, then a per-node top-k window
    # (partitions = neighbor lists) and a half-pair dedup agg
    "cnp_meta_blocking": [
        ("hot/cold split present (LeftAnti)", lambda p: "LeftAnti" in p),
        ("no cartesian/BNLJ", lambda p: "CartesianProduct" not in p
         and "BroadcastNestedLoop" not in p),
        ("per-node top-k window present", lambda p: "Window" in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # uncertainty sampling: blocked pair stream -> literal-folded
    # weight arithmetic -> TakeOrdered top-k (never a full sort/
    # materialization of the stream)
    "uncertainty_sample": [
        ("top-k via TakeOrdered", lambda p: "TakeOrdered" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # capture-recapture: four partial-agg count pipelines over one
    # pruned scan + 1-row scalar crosses; pairs are never materialized
    "capture_recapture": [
        ("scan prunes to text only", lambda p: all(
            m in ("struct<>", "struct<text:string>")
            for m in re.findall(r"ReadSchema: (struct<[^\n]*>)", p))),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no equi-join (pair counts, not pair rows)", lambda p:
         "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
         and "BroadcastHashJoin" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # decontamination: n-gram fan-out + distinct train-set shuffle +
    # one equi-join of test grams + bounded aggregates
    "decontamination": [
        ("scan prunes to doc_id+text", lambda p: re.search(
            r"ReadSchema: struct<doc_id:bigint,text:string>", p) is not None),
        ("gram join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # unigram-NLL outliers: token fan-out + vocab equi-join + per-doc
    # partial agg + bounded per-lang top-k window; the 1-row total
    # rides a scalar cross
    "unigram_nll_outliers": [
        ("scan prunes to doc_id+text+lang", lambda p: re.search(
            r"ReadSchema: struct<doc_id:bigint,text:string,lang:string>",
            p) is not None),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("per-lang window has a partition spec", lambda p: not re.search(
            r"Window \[[^\]]*row_number[^\]]*\], \[\]", p)),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # Zipf head coverage: vocabulary rank via global_rank (range
    # partition + local rank), never a single-task global window
    "zipf_head_coverage": [
        ("no single-task window (every window has a partition spec)",
         lambda p: not re.search(
             r"Window \[[^\]]*row_number[^\]]*\], \[\]", p)),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # Gopher quality gate: all signals are JVM-side codegen expressions
    # over one pruned scan with a map-side partial agg — no Python, no
    # join, no window
    "gopher_quality": [
        ("scan prunes to text+lang", lambda p: re.search(
            r"ReadSchema: struct<text:string,lang:string>", p) is not None),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("no join at all", lambda p: "Join" not in p),
        ("map-side partial agg before the lang exchange", lambda p:
         "partial_" in p),
    ],
    # temperature resampling: the quota table is a tiny agg; the ONLY
    # big exchange is the per-source rank sort-shuffle. The 1-row
    # total-weight scalar crosses on via one BNLJ (2 plan occurrences
    # = 1 node) by design.
    "temperature_resample": [
        ("scan prunes to doc_id+source", lambda p: re.search(
            r"ReadSchema: struct<doc_id:bigint,source:string>", p)
         is not None),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("only the scalar-total BNLJ", lambda p:
         p.count("BroadcastNestedLoopJoin") <= 2),
        ("per-source window (partition spec kept)", lambda p:
         "Window" in p),
    ],
    # sorted-neighborhood: every row_number window must keep a
    # partition spec (_pid) — a partition-less global window is the
    # single-task scale-killer this operator exists to avoid — and the
    # rank-bucket join must stay an equi join
    "sorted_neighborhood": [
        ("rank windows are partitioned (_pid)", lambda p: all(
            "_pid" in ln for ln in p.splitlines()
            if "row_number" in ln and "Window" in ln)),
        ("rank-bucket join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # B-cubed: pure aggregate pipeline — partial aggs before every
    # exchange, equi joins only, no Python
    "bcubed_eval": [
        ("no x16 bit fan-out before the first aggregate", lambda p:
         "sequence(0, 15)" not in p),

        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no cartesian beyond the 1-row scalar crosses", lambda p:
         "CartesianProduct" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # ARI: same aggregate-pipeline shape as bcubed_eval — the only
    # joins are the doc_id equi-join and the 1-row scalar crosses
    "ari_eval": [
        ("no x16 bit fan-out before the first aggregate", lambda p:
         "sequence(0, 15)" not in p),

        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no cartesian beyond the 1-row scalar crosses", lambda p:
         "CartesianProduct" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # block-size histogram: one pruned scan, two partial-agg
    # exchanges, bounded output — no join, no window, no Python
    "block_size_histogram": [
        ("scan prunes to text only", lambda p: re.search(
            r"ReadSchema: struct<text:string>", p) is not None),
        ("no join at all", lambda p: "Join" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # cluster diagnostics: CC checkpoints truncate the upstream loop;
    # the metrics stage itself must stay equi-join + partial aggs
    "cluster_density": [
        ("metrics join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("partial agg before shuffle", lambda p: "HashAggregate" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # threshold calibration: the 10-row grid must replicate via
    # broadcast (BNLJ on the tiny side is the intended replication,
    # not a quadratic blowup); the pair join itself stays equi
    "threshold_sweep": [
        ("grid replicates via broadcast", lambda p:
         "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("partial agg before shuffle", lambda p: "HashAggregate" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # block filtering: size join is equi, per-record windows, exact-int
    # budget arithmetic — and no pair stream is ever materialized
    "block_filtering": [
        ("size join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("per-record window present", lambda p: "Window" in p),
        ("partial agg before shuffle", lambda p: "HashAggregate" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # symmetric-best 1:1 assignment: two row_number windows, equi pair
    # join, no global sort of the pair stream beyond the window sorts
    "mutual_best_match": [
        ("row_number windows present", lambda p: "Window" in p),
        ("pair join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # progressive ER: the budget cut must be TakeOrdered (per-partition
    # top-k + merge), never a global sort of the full pair stream
    "progressive_pairs": [
        ("TakeOrdered budget cut (no global sort)", lambda p:
         "TakeOrderedAndProject" in p),
        ("hot/cold split present (LeftAnti)", lambda p: "LeftAnti" in p),
        ("no cartesian/BNLJ", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # LSH band planner: constant plan — no table scan, no exchange,
    # no Python (pure unrolled arithmetic over a generated grid)
    "lsh_band_planner": [
        ("no table scan", lambda p: "Scan parquet" not in p),
        ("no exchange", lambda p: "Exchange" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # cross-source dup rate: pure pair counting — bucket C(n,2) sums,
    # never a pair materialization; only the 1-row scalar crosses
    "cross_source_dup_rate": [
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no cartesian beyond the 1-row scalar crosses", lambda p:
         "CartesianProduct" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # dynamic blocking + pair budget: same shape as dynamic_blocking
    # (the pair counts are C(sz,2) over the size table, no pair join)
    "dynamic_block_pairs": [
        ("scan prunes to text only", lambda p: re.search(
            r"ReadSchema: struct<text:string>", p) is not None),
        ("no window (hot block never in one task)", lambda p:
         "Window" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # cluster fusion: all-native aggregates — partial aggs before every
    # exchange, per-cluster golden tables equi-join, no window in the
    # Spark path (windows exist only in the DuckDB oracle), no Python
    "cluster_fusion": [
        ("scan prunes to the 5 fused columns", lambda p: re.search(
            r"ReadSchema: struct<ts:timestamp(_ntz)?,user_id:bigint,"
            r"event_type:string,value:double,props:string>", p) is not None),
        ("no window (hot cluster never in one task)", lambda p:
         "Window" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("golden joins are equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # WEP meta-blocking: CBS shape + one 1-row scalar broadcast cross;
    # the gate is integer arithmetic in codegen
    "meta_blocking_wep": [
        ("hot/cold split present (LeftAnti)", lambda p: "LeftAnti" in p),
        ("cold+hot pair union present", lambda p: "Union" in p),
        ("no cartesian (scalar cross is BNLJ)", lambda p:
         "CartesianProduct" not in p),
        ("only the 1-row scalar BNLJ", lambda p:
         p.count("BroadcastNestedLoopJoin") <= 2),
        ("map-side partial agg before the cbs exchange", lambda p:
         "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # dynamic blocking: per-level size shuffle + equi-join, never a
    # window (a window partition would materialize the whole hot block
    # in one task), no Python
    "dynamic_blocking": [
        # the size-table query never uses doc_id, and pruning reaches
        # through all three levels' joins to the scan
        ("scan prunes to text only", lambda p: re.search(
            r"ReadSchema: struct<text:string>", p) is not None),
        ("size joins are equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("no window (hot block never in one task)", lambda p:
         "Window" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # canonical-representative election: window + agg over one
    # partitioning — no join, no cartesian
    "cluster_canonical": [
        ("no join at all", lambda p: "Join" not in p),
        ("window election present", lambda p: "Window" in p),
        ("scan prunes to text only", lambda p: re.search(
            r"ReadSchema: struct<text:string>", p) is not None),
    ],
    # declarative EM: the only data-scale op is the pattern aggregate;
    # everything after runs on <=16-row tables (scalar cross joins are
    # the sanctioned single-row BNLJ pattern)
    "fs_em_weights": [
        ("map-side partial agg before pattern exchange", lambda p:
         "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("scan never reads p_retailprice", lambda p:
         "p_retailprice" not in p),
    ],
    # star clustering: degree aggregate + two node-key equi joins + one
    # bounded attachment window — never a theta join
    "star_clusters": [
        ("no cartesian/BNLJ", lambda p: "CartesianProduct" not in p
         and "BroadcastNestedLoop" not in p),
        ("map-side partial agg for degrees", lambda p: "partial_" in p),
        ("single attachment window", lambda p: p.count("Window") >= 1),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # Monge-Elkan: the measure itself must add NOTHING to the plan —
    # no explode (Generate), no window, no Python; just the blocked
    # equi-join plus codegen'd higher-order-function projection
    "monge_elkan": [
        ("no explode (pure HOF projection)", lambda p:
         "Generate" not in p),
        ("no window", lambda p: "Window" not in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("block join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("scan never reads p_retailprice", lambda p:
         "p_retailprice" not in p),
    ],
    # group linkage: blocked member equi-join + group-key partial aggs
    "group_linkage": [
        ("member join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # multi-pass blocking: three key equi-joins + pair-key partial agg
    "multipass_blocking": [
        ("pass joins are equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("map-side partial agg on pair key", lambda p: "partial_" in p),
    ],
    # NMI: same contingency shapes as ari_eval — two partial-agg
    # shuffles at data scale, entropy tail over the bounded cell table
    "nmi_eval": [
        ("no x16 bit fan-out before the first aggregate", lambda p:
         "sequence(0, 15)" not in p),

        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    # soft-TFIDF: weight dim built on distinct names, joined to the
    # blocked pair stream; best-partner window partitions are
    # single-name token sets
    "soft_tfidf": [
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("best-partner window present", lambda p: "Window" in p),
        ("scan never reads p_retailprice", lambda p:
         "p_retailprice" not in p),
    ],
    # SN window sweep: the pair stream is built once (rank-bucket
    # equi-join, no single-task window) and replicated only against
    # the 7-row broadcast grid
    "snm_window_sweep": [
        ("no single-task window (every window has a partition spec)",
         lambda p: not re.search(r"Window \[[^\]]*row_number[^\]]*\],"
                                 r" \[\]", p)),
        ("grid join broadcast (no cartesian)", lambda p:
         "CartesianProduct" not in p),
        # the pair side sits behind global_rank's checkpoint
        # (LogicalRDD), so the only visible scans are the totals
        # branches — they must prune to text (or the bare count scan)
        ("visible scans prune to text only", lambda p: all(
            m in ("struct<>", "struct<text:string>")
            for m in re.findall(r"ReadSchema: (struct<[^\n]*>)", p))),
    ],
    # purity: exact-int maxima over the bounded contingency — same
    # shuffle shapes as ari/nmi
    "purity_eval": [
        ("no x16 bit fan-out before the first aggregate", lambda p:
         "sequence(0, 15)" not in p),

        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    # 3-level FS: one blocked equi-join + one bounded pattern agg;
    # weights are literals (no join, no Python)
    "fs_missing_weights": [
        ("block join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("map-side partial agg on the pattern key", lambda p:
         "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("scan never reads p_retailprice", lambda p:
         "p_retailprice" not in p),
    ],
    # value-specific weights: two per-field partial aggs + scalar
    # totals; the weight table itself is vocabulary-bounded
    "value_specific_weights": [
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("only scalar-total BNLJ (no cartesian)", lambda p:
         "CartesianProduct" not in p),
        ("scan never reads p_retailprice", lambda p:
         "p_retailprice" not in p),
    ],
    # temporal decay: ONE window pass per stream, no join at all
    "temporal_decay_pairs": [
        ("no join at all", lambda p: "Join" not in p),
        ("single stream window", lambda p: "Window" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
        ("scan prunes off value/props", lambda p:
         "props" not in p),
    ],
    # crosswalk: CC components are checkpointed, so the visible plan is
    # the overlap join + size aggs + best-overlap window
    "cluster_crosswalk": [
        ("no cartesian/BNLJ", lambda p: "CartesianProduct" not in p
         and "BroadcastNestedLoop" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("best-overlap window present", lambda p: "Window" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
    # kNN sparsification: stats side is all partial aggs (the per-node
    # top-k window + mutuality agg run during the eager edge/mutual
    # checkpoints, so they sit behind LogicalRDDs in the final plan —
    # their shape is pinned where it executes, in the shared window/agg
    # builders, and by the oracle row)
    "knn_sparsify": [
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("map-side partial aggs", lambda p: "partial_" in p),
        ("mutual side checkpointed (no recompute per branch)", lambda p:
         "ExistingRDD" in p or "LogicalRDD" in p or "Scan ExistingRDD" in p),
        ("no Python in the plan", lambda p:
         "BatchEvalPython" not in p and "ArrowEval" not in p),
    ],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    failures = 0
    for name, checks in CHECKS.items():
        df = qs[name](spark, sf_dir)
        plan = plan_of(df)
        for desc, pred in checks:
            ok = pred(plan)
            failures += 0 if ok else 1
            print(f"{'PASS' if ok else 'FAIL'}  {name}: {desc}")
            if not ok:
                print("---- plan ----")
                print(plan[:4000])
                print("--------------")

    # embedding_near_dup: CC checkpoints truncate the final plan, so the
    # bounded-bucket assertion runs on the exposed edges stage (the same
    # code path the query executes before clustering)
    edges_plan = plan_of(entry._embedding_near_dup_edges(spark, sf_dir))
    for desc, pred in [
        ("bucket join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("hot/cold split present (LeftAnti)", lambda p: "LeftAnti" in p),
        ("cold+hot pair union present", lambda p: "Union" in p),
    ]:
        ok = pred(edges_plan)
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  embedding_near_dup[edges]: {desc}")
        if not ok:
            print("---- plan ----")
            print(edges_plan[:4000])
            print("--------------")

    # bounded_cross_pairs (incremental linkage's delta-vs-corpus join):
    # assert the hot/cold split survives — hot standing keys are
    # anti-joined out of the cold stream, and the salted hot stream
    # unions back in. A refactor to a plain equi-join would lose both.
    from kawa_spark.operators.blocking import bounded_cross_pairs

    ldf = spark.createDataFrame(
        [("l1", "n1", "k1")], "mention_id string, norm string, block_key string"
    )
    rdf = spark.createDataFrame(
        [("r1", "m1", "k1")], "mention_id string, norm string, block_key string"
    )
    cross_plan = plan_of(bounded_cross_pairs(ldf, rdf, threshold=10, groups=4))
    for desc, pred in [
        ("cross join is equi (no theta)", lambda p:
         "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("hot/cold split present (LeftAnti)", lambda p: "LeftAnti" in p),
        ("cold+hot pair union present", lambda p: "Union" in p),
        ("delta side replicates via explode (salt fan-out)", lambda p:
         "Generate explode" in p or "Explode" in p or "explode" in p),
    ]:
        ok = pred(cross_plan)
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  bounded_cross_pairs: {desc}")
        if not ok:
            print("---- plan ----")
            print(cross_plan[:4000])
            print("--------------")

    # pages reader: text-only plan must not scan the html binary column
    from kawa_spark.sources.pages import read_pages

    import pandas as pd  # noqa: F401

    pages = spark.createDataFrame(
        [("u", None, b"<p>x</p>", "x", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    tmp = "/tmp/_audit_pages.parquet"
    pages.write.mode("overwrite").parquet(tmp)
    plan = plan_of(read_pages(spark, tmp, derive_text_from_html=False)
                   .select("url", "text"))
    ok = "html" not in re.search(r"ReadSchema: (\S+)", plan).group(1)
    failures += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'}  pages reader: html column pruned "
          f"from text-only scan")

    print(f"\n{failures} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
