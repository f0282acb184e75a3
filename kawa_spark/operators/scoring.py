"""Pairwise scoring: Jaro-Winkler + Levenshtein + embedding cosine.

Per the north star (BASELINE.json:6): batched Arrow UDFs combining
Jaro-Winkler (no Spark built-in -> pandas_udf) and Levenshtein
(built-in ``F.levenshtein``, JVM-side) with cosine similarity over
word-embedding vectors broadcast as a dict of float32 arrays
(reference embedding semantics: mean-pooled over tokens, L2-normalized;
/root/reference/extract_word_embeddings.py:33-40).

Plan shape: one narrow stage over the pair stream — the broadcast dict
rides once per executor; cosine is a numpy matrix op per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..config import PipelineConfig


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Standard Jaro-Winkler similarity (public algorithm; Winkler 1990)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    jaro = (
        matches / len1 + matches / len2 + (matches - transpositions / 2) / matches
    ) / 3
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1 - jaro)


# strings longer than this fall back to the scalar path (surface forms
# are overwhelmingly short; the batch matrices are (n, _JW_MAXLEN))
_JW_MAXLEN = 64


def _codepoint_matrix(strs: list[str], width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, zero-padded (NUL never occurs
    in surface forms, so 0 is a safe pad sentinel). One NUL-padded join
    + one encode: ~5x cheaper than per-string encode/frombuffer/assign."""
    buf = "".join(s[:width].ljust(width, "\0") for s in strs)
    return np.frombuffer(buf.encode("utf-32-le"), dtype=np.uint32).reshape(
        len(strs), width
    )


def jaro_winkler_batch(
    a: list[str], b: list[str], prefix_weight: float = 0.1
) -> np.ndarray:
    """Vectorized Jaro-Winkler over pair batches: numpy ops across all
    pairs at once, a Python loop only over character positions (<=64).
    Exactly matches the scalar ``jaro_winkler`` (pinned by pytest);
    scoring is the hottest O(candidate-pairs) loop in the pipeline, so
    this replaces the per-row-Python inner loop the round-1 review
    flagged."""
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    if not n:
        return out
    a = ["" if x is None else x for x in a]
    b = ["" if x is None else x for x in b]
    len1 = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    len2 = np.fromiter((len(x) for x in b), dtype=np.int64, count=n)

    big = (len1 > _JW_MAXLEN) | (len2 > _JW_MAXLEN)
    if big.any():
        for i in np.flatnonzero(big):
            out[i] = jaro_winkler(a[i], b[i], prefix_weight)

    # exact equality (includes empty==empty -> 1.0, like the scalar)
    eq_rows = np.fromiter((x == y for x, y in zip(a, b)), dtype=bool, count=n)
    out[eq_rows & ~big] = 1.0

    todo = ~eq_rows & ~big & (len1 > 0) & (len2 > 0)
    if not todo.any():
        return out
    idx = np.flatnonzero(todo)
    l1, l2 = len1[idx], len2[idx]
    # width = longest live string, not _JW_MAXLEN: every inner op is
    # O(n*width), and surface forms are mostly <16 chars
    width = int(max(l1.max(), l2.max()))
    A = _codepoint_matrix([a[i] for i in idx], width)
    B = _codepoint_matrix([b[i] for i in idx], width)
    m = len(idx)
    window = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)[:, None]
    cols = np.arange(width)
    flags1 = np.zeros((m, width), dtype=bool)
    flags2 = np.zeros((m, width), dtype=bool)
    rows = np.arange(m)
    # open2[r, j] = "j is a live match target in row r" (unflagged, < l2);
    # B==0 pad cells never equal a real codepoint so l2 needs no mask.
    open2 = B != 0
    for i in range(int(l1.max())):
        # |i - j| <= window is the Jaro match window; rows with l1 <= i
        # contribute no A char (A pad cell is 0, matching nothing).
        cand = (B == A[:, i, None]) & open2 & (np.abs(cols - i) <= window)
        hit = cand.any(axis=1)
        j = cand.argmax(axis=1)  # first unflagged equal char in window
        open2[rows[hit], j[hit]] = False
        flags1[hit, i] = True
    flags2 = (B != 0) & ~open2

    matches = flags1.sum(axis=1)
    # matched subsequences in row order: scatter by running match index
    pos1 = np.cumsum(flags1, axis=1, dtype=np.int32) - 1
    pos2 = np.cumsum(flags2, axis=1, dtype=np.int32) - 1
    M1 = np.zeros((m, width), dtype=np.uint32)
    M2 = np.zeros((m, width), dtype=np.uint32)
    r1, c1 = np.nonzero(flags1)
    r2, c2 = np.nonzero(flags2)
    M1[r1, pos1[r1, c1]] = A[r1, c1]
    M2[r2, pos2[r2, c2]] = B[r2, c2]
    t_raw = ((M1 != M2) & (cols < matches[:, None])).sum(axis=1)

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (
            matches / l1
            + matches / l2
            + (matches - t_raw / 2) / np.maximum(matches, 1)
        ) / 3.0
    jaro = np.where(matches > 0, jaro, 0.0)

    p4 = (A[:, :4] == B[:, :4]) & (A[:, :4] != 0) & (B[:, :4] != 0)
    prefix = np.cumprod(p4, axis=1).sum(axis=1)
    score = np.where(
        matches > 0, jaro + prefix * prefix_weight * (1.0 - jaro), 0.0
    )
    out[idx] = score
    return out


@F.pandas_udf(DoubleType())
def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(jaro_winkler_batch(a.tolist(), b.tolist()), dtype="float64")


def cosine_scalar(
    norm_a: str, norm_b: str, vecs: dict[str, np.ndarray], connector: str = "_"
) -> float:
    """Reference per-pair cosine: mean-pooled, L2-normalized token
    vectors; NaN when either side has no known token (or a zero-norm
    pool). The batched UDF below is pinned against this in pytest."""

    def embed(norm: str):
        toks = [vecs[t] for t in (norm or "").split(connector) if t in vecs]
        if not toks:
            return None
        v = np.mean(np.stack(toks).astype(np.float64), axis=0)
        n = np.linalg.norm(v)
        return v / n if n else None

    va, vb = embed(norm_a), embed(norm_b)
    if va is None or vb is None:
        return float("nan")
    return float(np.dot(va, vb))


def batch_cosine(
    a: list[str],
    b: list[str],
    tok2id: dict[str, int],
    mat: np.ndarray,
    connector: str = "_",
    _cache: dict | None = None,
) -> np.ndarray:
    """Vectorized pair cosine: every per-pair op is a numpy matrix op.

    Python touches only the UNIQUE surfaces in the batch (tokenize +
    gather token ids — candidate pairs repeat surfaces heavily, and a
    per-process cache memoizes across batches); pooling is one
    ``add.reduceat`` over the stacked (vocab, dim) matrix, normalization
    one rowwise divide, and the pair dots one einsum. This replaces the
    round-2-flagged per-element Python loop in the O(candidate-pairs)
    hot path. float64 accumulation throughout; pinned against
    cosine_scalar by a fuzz test (tests/test_pipeline_spark.py)."""
    n = len(a)
    out = np.full(n, np.nan)
    if not n:
        return out
    allnorms = ["" if x is None else x for x in a] + [
        "" if x is None else x for x in b
    ]
    uniq, inv = np.unique(np.asarray(allnorms, dtype=object), return_inverse=True)
    cache = _cache if _cache is not None else {}
    id_lists: list[tuple[int, ...]] = []
    for s in uniq:
        ids = cache.get(s)
        if ids is None:
            ids = tuple(
                tok2id[t] for t in s.split(connector) if t in tok2id
            )
            if len(cache) < 1_000_000:  # bound the per-process memo
                cache[s] = ids
        id_lists.append(ids)
    counts = np.fromiter((len(x) for x in id_lists), dtype=np.int64, count=len(uniq))
    pooled = np.zeros((len(uniq), mat.shape[1] if mat.size else 1), dtype=np.float64)
    live = counts > 0
    if live.any():
        flat = np.fromiter(
            (i for ids in id_lists for i in ids), dtype=np.int64, count=int(counts.sum())
        )
        offsets = np.zeros(int(live.sum()), dtype=np.int64)
        np.cumsum(counts[live], out=offsets)
        offsets = np.concatenate(([0], offsets[:-1]))
        pooled[live] = np.add.reduceat(
            mat[flat].astype(np.float64), offsets, axis=0
        ) / counts[live, None]
    nrm = np.linalg.norm(pooled, axis=1)
    valid = live & (nrm > 0)
    unit = np.zeros_like(pooled)
    unit[valid] = pooled[valid] / nrm[valid, None]
    ua, ub = unit[inv[:n]], unit[inv[n:]]
    dots = np.einsum("ij,ij->i", ua, ub)
    ok = valid[inv[:n]] & valid[inv[n:]]
    out[ok] = dots[ok]
    return out


def make_cosine_udf(spark, embeddings: dict[str, np.ndarray], connector: str = "_"):
    """Cosine over mean-pooled, L2-normalized token vectors from a
    broadcast dict[str, float32 array]. Unknown-token mentions -> NaN
    (the score falls back to string similarity only). The heavy state —
    token-id dict + stacked (vocab, dim) float32 matrix — is built once
    per task from the broadcast and reused across Arrow batches, so the
    broadcast ships the dict once per executor and the per-batch work is
    pure numpy (see batch_cosine)."""
    bc = spark.sparkContext.broadcast(
        {k: np.asarray(v, dtype=np.float32) for k, v in embeddings.items()}
    )
    state: dict = {}

    def _ensure():
        if "mat" not in state:
            vecs = bc.value
            toks = list(vecs.keys())
            state["tok2id"] = {t: i for i, t in enumerate(toks)}
            state["mat"] = (
                np.stack([np.asarray(vecs[t], dtype=np.float32) for t in toks])
                if toks
                else np.zeros((0, 1), dtype=np.float32)
            )
            state["memo"] = {}
        return state["tok2id"], state["mat"], state["memo"]

    @F.pandas_udf(DoubleType())
    def cos_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        tok2id, mat, memo = _ensure()
        return pd.Series(
            batch_cosine(a.tolist(), b.tolist(), tok2id, mat, connector, memo)
        )

    return cos_udf


def score_pairs(
    pairs: DataFrame,
    embeddings: dict[str, np.ndarray] | None = None,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """(id_a, id_b, norm_a, norm_b, ...) -> + jw, lev_sim, cos, score."""
    cfg = cfg or PipelineConfig()
    # string comparisons on the connector-free surface
    sa = F.regexp_replace("norm_a", cfg.connector, " ")
    sb = F.regexp_replace("norm_b", cfg.connector, " ")
    scored = pairs.withColumn("jw", jw_udf(sa, sb)).withColumn(
        "lev_sim",
        1.0
        - F.levenshtein("norm_a", "norm_b")
        / F.greatest(F.length("norm_a"), F.length("norm_b")),
    )
    if embeddings:
        cos_udf = make_cosine_udf(pairs.sparkSession, embeddings, cfg.connector)
        scored = scored.withColumn("cos", cos_udf("norm_a", "norm_b"))
    else:
        scored = scored.withColumn("cos", F.lit(None).cast("double"))

    w_jw, w_lev, w_cos = cfg.jw_weight, cfg.lev_weight, cfg.cos_weight
    with_cos = (w_jw * F.col("jw") + w_lev * F.col("lev_sim") + w_cos * F.col("cos")) / (
        w_jw + w_lev + w_cos
    )
    without = (w_jw * F.col("jw") + w_lev * F.col("lev_sim")) / (w_jw + w_lev)
    return scored.withColumn(
        "score",
        F.when(F.col("cos").isNotNull() & ~F.isnan("cos"), with_cos).otherwise(without),
    )


def match_edges(scored: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    cfg = cfg or PipelineConfig()
    return scored.filter(F.col("score") >= cfg.match_threshold).select(
        "id_a", "id_b", "score", "block_key"
    )


def fs_match_edges(
    scored: DataFrame,
    cfg: PipelineConfig | None = None,
    register_persist=None,
    surfaces: DataFrame | None = None,
) -> DataFrame:
    """Fellegi-Sunter alternative to :func:`match_edges` (cfg.fs_scoring).

    Binarizes the similarity columns at cfg.fs_*_cut, fits m/u by EM on
    the bounded agreement-pattern table (<= 2^3 rows at any scale — the
    one sanctioned collect, see operators/linkage.py), scores every pair
    with the literal-folded log2 decision weight, and keeps pairs at or
    above cfg.fs_threshold. Without embeddings the cos bit is constant
    0 and EM drives its weight to ~0 — harmless. An empty pair stream
    returns an empty edge set (the match_edges contract), not an EM
    error. Same output contract as match_edges: (id_a, id_b, score,
    block_key), with score = the FS weight so downstream greedy repair
    orders by calibrated evidence.

    ``register_persist``: optional callback receiving the persisted
    agreement-vector frame (e.g. ``ERPipeline._persisted.append``). The
    EM collect is one full pass over the scored pairs, and the returned
    edges re-read the same frame — persisting between the two keeps the
    most expensive lineage (pair generation + similarity UDFs) from
    running twice at the 10^12-pair design point.

    Refinements (both opt-in via cfg, composable):

    * ``cfg.fs_missing_aware`` — an unevaluable cosine (no embedding
      for either surface) becomes a third MISSING level contributing
      zero weight instead of a forced disagree; EM runs on the bounded
      three-level pattern table (linkage.fellegi_sunter_em_levels).
    * ``cfg.fs_value_specific`` — adds a first-token exact-agreement
      field whose agree weight is Winkler's frequency-based per-value
      weight w_v = log2(m*(N-1)/(n_v-1)): token frequencies come from
      ``surfaces`` (required with this flag), a vocabulary-bounded
      table broadcast onto the pair stream; N is its scalar count (one
      bounded collect alongside the sanctioned pattern collect).
    """
    from pyspark import StorageLevel

    from .linkage import (
        agreement_levels,
        agreement_vectors,
        fellegi_sunter_em,
        fellegi_sunter_em_levels,
        fs_weight_expr,
        fs_weight_expr_levels,
        pattern_counts,
        value_specific_agree_weight,
    )

    cfg = cfg or PipelineConfig()
    refined = cfg.fs_missing_aware or cfg.fs_value_specific
    if cfg.fs_value_specific and surfaces is None:
        raise ValueError(
            "cfg.fs_value_specific needs the surfaces frame for token "
            "frequencies — pass fs_match_edges(..., surfaces=...)"
        )

    if not refined:
        fields = {
            "jw_hi": F.col("jw") >= cfg.fs_jw_cut,
            "lev_hi": F.col("lev_sim") >= cfg.fs_lev_cut,
            "cos_hi": F.col("cos").isNotNull()
            & ~F.isnan("cos")
            & (F.col("cos") >= cfg.fs_cos_cut),
        }
        vec = agreement_vectors(scored, fields)
        vec = vec.persist(StorageLevel.MEMORY_AND_DISK)
        if register_persist is not None:
            register_persist(vec)
        rows = pattern_counts(vec).collect()
        names = sorted(fields)
        if not rows:
            return vec.filter(F.lit(False)).select(
                "id_a", "id_b", F.lit(0.0).alias("score"), "block_key"
            )
        w = fellegi_sunter_em(
            [(r["pattern"], r["n_pairs"]) for r in rows], names
        )
        return (
            vec.withColumn(
                "score", fs_weight_expr(list(w.fields), list(w.m), list(w.u))
            )
            .filter(F.col("score") >= cfg.fs_threshold)
            .select("id_a", "id_b", "score", "block_key")
        )

    # refined path: three-level encoding (binary fields never emit 1)
    lv2 = F.lit(2)
    lv0 = F.lit(0)
    levels = {
        "jw_hi": F.when(F.col("jw") >= cfg.fs_jw_cut, lv2).otherwise(lv0),
        "lev_hi": F.when(
            F.col("lev_sim") >= cfg.fs_lev_cut, lv2
        ).otherwise(lv0),
    }
    cos_missing = F.col("cos").isNull() | F.isnan("cos")
    if cfg.fs_missing_aware:
        levels["cos_hi"] = (
            F.when(cos_missing, F.lit(1))
            .when(F.col("cos") >= cfg.fs_cos_cut, lv2)
            .otherwise(lv0)
        )
    else:
        levels["cos_hi"] = F.when(
            ~cos_missing & (F.col("cos") >= cfg.fs_cos_cut), lv2
        ).otherwise(lv0)
    tok_a = F.split_part(F.col("norm_a"), F.lit(cfg.connector), F.lit(1))
    tok_b = F.split_part(F.col("norm_b"), F.lit(cfg.connector), F.lit(1))
    if cfg.fs_value_specific:
        levels["tok1_eq"] = F.when(tok_a == tok_b, lv2).otherwise(lv0)

    vec = agreement_levels(scored, levels)
    if cfg.fs_value_specific:
        # frequency dim from the surface table: vocabulary-bounded,
        # broadcast onto the pair stream keyed by the agreed token
        # (tok_a == tok_b on every row where the weight is applied)
        freq = (
            surfaces.select(
                F.split_part(
                    F.col("norm"), F.lit(cfg.connector), F.lit(1)
                ).alias("tok1_val")
            )
            .groupBy("tok1_val")
            .agg(F.count("*").alias("tok1_n"))
        )
        n_total = surfaces.count()  # scalar, bounded collect
        vec = vec.withColumn("tok1_val", tok_a).join(
            F.broadcast(freq), "tok1_val", "left"
        )
    vec = vec.persist(StorageLevel.MEMORY_AND_DISK)
    if register_persist is not None:
        register_persist(vec)
    rows = pattern_counts(vec).collect()
    names = sorted(levels)
    if not rows:
        return vec.filter(F.lit(False)).select(
            "id_a", "id_b", F.lit(0.0).alias("score"), "block_key"
        )
    w = fellegi_sunter_em_levels(
        [(r["pattern"], r["n_pairs"]) for r in rows], names
    )
    overrides = None
    if cfg.fs_value_specific:
        m_tok1 = w.m[w.fields.index("tok1_eq")]
        overrides = {
            "tok1_eq": value_specific_agree_weight(
                F.col("tok1_n"), n_total, m_tok1
            )
        }
    return (
        vec.withColumn(
            "score",
            fs_weight_expr_levels(
                list(w.fields), list(w.m), list(w.u), overrides
            ),
        )
        .filter(F.col("score") >= cfg.fs_threshold)
        .select("id_a", "id_b", "score", "block_key")
    )
