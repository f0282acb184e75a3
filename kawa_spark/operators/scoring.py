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


@F.pandas_udf(DoubleType())
def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )


def make_cosine_udf(spark, embeddings: dict[str, np.ndarray], connector: str = "_"):
    """Cosine over mean-pooled, L2-normalized token vectors from a
    broadcast dict[str, float32 array]. Unknown-token mentions -> NaN
    (the score falls back to string similarity only)."""
    bc = spark.sparkContext.broadcast(
        {k: np.asarray(v, dtype=np.float32) for k, v in embeddings.items()}
    )

    @F.pandas_udf(DoubleType())
    def cos_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        vecs = bc.value

        def embed(norm: str):
            toks = [vecs[t] for t in (norm or "").split(connector) if t in vecs]
            if not toks:
                return None
            v = np.mean(toks, axis=0)
            n = np.linalg.norm(v)
            return v / n if n else None

        out = np.full(len(a), np.nan)
        for i, (x, y) in enumerate(zip(a, b)):
            va, vb = embed(x), embed(y)
            if va is not None and vb is not None:
                out[i] = float(np.dot(va, vb))
        return pd.Series(out)

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
