"""Fellegi-Sunter probabilistic record linkage over candidate pairs.

The reference scores candidate pairs with fixed-formula string and
embedding similarities (/root/reference/ontology/ontology_manager.py:
jaro-winkler + levenshtein + cosine, combined with hand-set weights).
This module adds the classical *calibrated* alternative on top of the
same pair stream: Fellegi & Sunter (JASA 1969) decision weights with
the m/u probabilities estimated by Winkler's EM (1988) under the usual
conditional-independence model. It is an extension beyond the
reference's inventory (sanctioned "beyond the reference" linkage
capability), not a port of anything.

Scale shape (10^12 docs):

* ``agreement_vectors`` is a pure column expression over the already
  blocked/bounded pair stream — no shuffle of its own.
* ``pattern_counts`` is one partial-aggregating groupBy on a key with
  at most 2^K distinct values (K = number of comparison fields, so
  <= 2^K rows total at ANY input scale).
* ``fellegi_sunter_em`` runs driver-side on that <=2^K-row table —
  the one sanctioned collect (the table is bounded by construction,
  not by the data volume).
* ``fs_pair_weights`` turns the fitted m/u into a per-pair log2
  likelihood-ratio weight as a native column expression (the per-field
  agree/disagree contributions are folded to literals), so scoring a
  trillion pairs is whole-stage-codegen arithmetic, never a UDF or a
  join.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def agreement_vectors(pairs: DataFrame, agreements: dict[str, Column]) -> DataFrame:
    """Append one 0/1 int column per comparison field plus a ``pattern``
    string (field bits concatenated in sorted field-name order, so the
    pattern encoding never depends on dict ordering)."""
    out = pairs
    names = sorted(agreements)
    for name in names:
        out = out.withColumn(name, agreements[name].cast("int"))
    return out.withColumn(
        "pattern", F.concat(*[F.col(n).cast("string") for n in names])
    )


def pattern_counts(vectors: DataFrame) -> DataFrame:
    """(pattern, n_pairs) — bounded at 2^K rows regardless of input size."""
    return vectors.groupBy("pattern").agg(F.count("*").alias("n_pairs"))


@dataclass(frozen=True)
class FSWeights:
    """Fitted Fellegi-Sunter parameters (field order = sorted names)."""

    fields: tuple[str, ...]
    m: tuple[float, ...]  # P(agree on field k | pair is a match)
    u: tuple[float, ...]  # P(agree on field k | pair is a non-match)
    p_match: float  # estimated match prevalence

    def agree_weight(self, k: int) -> float:
        return math.log2(self.m[k] / self.u[k])

    def disagree_weight(self, k: int) -> float:
        return math.log2((1.0 - self.m[k]) / (1.0 - self.u[k]))


def _clamp(x: float) -> float:
    return min(max(x, _EPS), 1.0 - _EPS)


def fellegi_sunter_em(
    counts: list[tuple[str, int]],
    fields: list[str],
    n_iter: int = 50,
    p0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
) -> FSWeights:
    """EM over the aggregated agreement-pattern table.

    ``counts`` is the collected (pattern, n_pairs) list — at most 2^K
    rows by construction. Deterministic: fixed initialization, fixed
    iteration count (no data-dependent stopping), pure float math.
    Conditional independence between fields is assumed, as in Winkler
    (1988); fields that violate it should be merged or dropped by the
    caller.
    """
    if list(fields) != sorted(fields):
        # pattern bits are encoded in sorted field-name order by
        # agreement_vectors; a differently-ordered field list would
        # silently decode every pattern against the wrong fields
        raise ValueError("fields must be in sorted order (pattern bit order)")
    K = len(fields)
    pats = [(tuple(int(c) for c in pat), float(n)) for pat, n in counts]
    if any(len(p) != K for p, _ in pats):
        raise ValueError("pattern length does not match the field list")
    total = sum(n for _, n in pats)
    if total <= 0:
        raise ValueError("empty pattern table")
    p = _clamp(p0)
    m = [_clamp(m0)] * K
    u = [_clamp(u0)] * K
    for _ in range(n_iter):
        # E-step: posterior match probability per pattern
        w = []
        for gamma, n in pats:
            pm = p
            pu = 1.0 - p
            for k in range(K):
                pm *= m[k] if gamma[k] else 1.0 - m[k]
                pu *= u[k] if gamma[k] else 1.0 - u[k]
            w.append(pm / (pm + pu) if pm + pu > 0 else 0.0)
        # M-step
        wm = sum(n * wi for (_, n), wi in zip(pats, w))
        wu = total - wm
        p = _clamp(wm / total)
        for k in range(K):
            mk = sum(n * wi for (g, n), wi in zip(pats, w) if g[k])
            uk = sum(n * (1.0 - wi) for (g, n), wi in zip(pats, w) if g[k])
            m[k] = _clamp(mk / wm) if wm > 0 else _EPS
            u[k] = _clamp(uk / wu) if wu > 0 else _EPS
    return FSWeights(tuple(fields), tuple(m), tuple(u), p)


def fit_fs_weights(vectors: DataFrame, fields: list[str], **em_kw) -> FSWeights:
    """Aggregate + collect the bounded pattern table, then EM on it."""
    rows = pattern_counts(vectors).collect()
    return fellegi_sunter_em(
        [(r["pattern"], r["n_pairs"]) for r in rows], sorted(fields), **em_kw
    )


def fs_weight_expr(
    fields: list[str], m: list[float], u: list[float]
) -> Column:
    """Per-pair FS match weight as a native column expression: the
    per-field agree/disagree log2 contributions are Python-side
    literals, so the whole thing is codegen'd arithmetic over the 0/1
    agreement columns — no join, no UDF, no shuffle.

    ``m``/``u`` must be aligned with ``fields``, and ``fields`` must be
    in sorted order (the order agreement_vectors encodes and the EM
    fits) — enforced loudly rather than silently re-sorted, which would
    pair weights with the wrong columns."""
    names = list(fields)
    if names != sorted(names):
        raise ValueError("fields must be in sorted order (m/u alignment)")
    if not (len(names) == len(m) == len(u)):
        raise ValueError("fields/m/u length mismatch")
    expr = F.lit(0.0)
    for k, name in enumerate(names):
        wa = math.log2(_clamp(m[k]) / _clamp(u[k]))
        wd = math.log2((1.0 - _clamp(m[k])) / (1.0 - _clamp(u[k])))
        expr = expr + F.when(F.col(name) == 1, F.lit(wa)).otherwise(F.lit(wd))
    return expr


def fs_pair_weights(
    vectors: DataFrame, weights: FSWeights, out_col: str = "fs_weight"
) -> DataFrame:
    """Attach the fitted FS weight to every pair (native expression)."""
    return vectors.withColumn(
        out_col,
        fs_weight_expr(list(weights.fields), list(weights.m), list(weights.u)),
    )


# --- three-level (agree / missing / disagree) refinement ----------------
#
# The standard missing-data treatment (Splink-style, and the
# fs_missing_weights analytic query in __spark_entry__): when a
# comparison cannot be evaluated (e.g. no embedding vector for either
# surface) the field is UNINFORMATIVE — it must contribute zero log2
# weight, not be forced into the disagree branch (which would penalize
# every pair with a sparse attribute). Levels: 2 = agree, 1 = missing,
# 0 = disagree. Binary fields simply never emit level 1, so the
# three-level EM/expr reduce exactly to the binary ones on complete
# data (pinned by tests/test_fs_refined.py).


def agreement_levels(pairs: DataFrame, levels: dict[str, Column]) -> DataFrame:
    """Append one 0/1/2 int level column per comparison field plus a
    ``pattern`` string (sorted field-name order, like
    :func:`agreement_vectors`). Each Column must already evaluate to
    the integer level."""
    out = pairs
    names = sorted(levels)
    for name in names:
        out = out.withColumn(name, levels[name].cast("int"))
    return out.withColumn(
        "pattern", F.concat(*[F.col(n).cast("string") for n in names])
    )


def fellegi_sunter_em_levels(
    counts: list[tuple[str, int]],
    fields: list[str],
    n_iter: int = 50,
    p0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
) -> FSWeights:
    """Winkler EM over a three-level agreement-pattern table.

    Same contract and determinism as :func:`fellegi_sunter_em`; the
    pattern alphabet is {0,1,2} (disagree/missing/agree) and the table
    is bounded at 3^K rows by construction. Missing levels contribute a
    likelihood factor of 1 to both classes (uninformative) and are
    excluded from the M-step denominators, so the fitted m/u are
    conditional on the field being OBSERVED — exactly the parameters
    the zero-weight missing branch of :func:`fs_weight_expr_levels`
    needs. A field that is never observed keeps its current m/u (its
    weight is never applied, every pair takes the 0.0 missing branch).
    """
    if list(fields) != sorted(fields):
        raise ValueError("fields must be in sorted order (pattern bit order)")
    K = len(fields)
    pats = [(tuple(int(c) for c in pat), float(n)) for pat, n in counts]
    if any(len(p) != K for p, _ in pats):
        raise ValueError("pattern length does not match the field list")
    if any(lv not in (0, 1, 2) for p, _ in pats for lv in p):
        raise ValueError("levels must be 0 (disagree), 1 (missing), 2 (agree)")
    total = sum(n for _, n in pats)
    if total <= 0:
        raise ValueError("empty pattern table")
    p = _clamp(p0)
    m = [_clamp(m0)] * K
    u = [_clamp(u0)] * K
    for _ in range(n_iter):
        w = []
        for gamma, n in pats:
            pm = p
            pu = 1.0 - p
            for k in range(K):
                if gamma[k] == 2:
                    pm *= m[k]
                    pu *= u[k]
                elif gamma[k] == 0:
                    pm *= 1.0 - m[k]
                    pu *= 1.0 - u[k]
                # level 1 (missing): factor 1 in both classes
            w.append(pm / (pm + pu) if pm + pu > 0 else 0.0)
        wm = sum(n * wi for (_, n), wi in zip(pats, w))
        wu = total - wm
        p = _clamp(wm / total)
        for k in range(K):
            m_obs = sum(
                n * wi for (g, n), wi in zip(pats, w) if g[k] != 1
            )
            u_obs = sum(
                n * (1.0 - wi) for (g, n), wi in zip(pats, w) if g[k] != 1
            )
            mk = sum(n * wi for (g, n), wi in zip(pats, w) if g[k] == 2)
            uk = sum(n * (1.0 - wi) for (g, n), wi in zip(pats, w) if g[k] == 2)
            if m_obs > 0:
                m[k] = _clamp(mk / m_obs)
            if u_obs > 0:
                u[k] = _clamp(uk / u_obs)
    return FSWeights(tuple(fields), tuple(m), tuple(u), p)


def fs_weight_expr_levels(
    fields: list[str],
    m: list[float],
    u: list[float],
    agree_overrides: dict[str, Column] | None = None,
) -> Column:
    """Three-level analogue of :func:`fs_weight_expr`: level 2 adds the
    agree weight, level 0 the disagree weight, level 1 (missing) adds
    exactly 0.0. Still pure literal-folded codegen arithmetic.

    ``agree_overrides`` optionally replaces the *agree* branch of a
    field with an arbitrary Column — the hook for value-specific
    agreement weights (Winkler's frequency-based refinement), where
    agreeing on a rare value carries a larger weight than the
    field-level log2(m/u). Disagree/missing branches are unaffected.
    """
    names = list(fields)
    if names != sorted(names):
        raise ValueError("fields must be in sorted order (m/u alignment)")
    if not (len(names) == len(m) == len(u)):
        raise ValueError("fields/m/u length mismatch")
    overrides = agree_overrides or {}
    unknown = set(overrides) - set(names)
    if unknown:
        raise ValueError(f"agree_overrides for unknown fields: {sorted(unknown)}")
    expr = F.lit(0.0)
    for k, name in enumerate(names):
        wa = math.log2(_clamp(m[k]) / _clamp(u[k]))
        wd = math.log2((1.0 - _clamp(m[k])) / (1.0 - _clamp(u[k])))
        agree_term = overrides.get(name, F.lit(wa))
        expr = expr + (
            F.when(F.col(name) == 2, agree_term)
            .when(F.col(name) == 1, F.lit(0.0))
            .otherwise(F.lit(wd))
        )
    return expr


def value_specific_agree_weight(
    n_v: Column, n_total: int, m: float
) -> Column:
    """Winkler's frequency-based agree weight for an exact-match field:
    with per-value u_v = n_v(n_v-1)/(N(N-1)) and match mass
    proportional to prevalence (m_v = m * n_v/N), the agree weight
    collapses to w_v = log2(m * (N-1) / (n_v - 1)). Rare values carry
    large positive weights; ubiquitous values drop toward the field
    floor. Singletons clamp the denominator at 0.5 (u_v would be 0 —
    agreement on a unique value is near-conclusive, kept finite like
    the EM's 1e-6 clamps). Mirrors the value_specific_weights analytic
    query in __spark_entry__ exactly.
    """
    if n_total < 2:
        raise ValueError("value-specific weights need at least 2 records")
    return F.log2(
        F.lit(_clamp(m) * (n_total - 1))
        / F.greatest(n_v.cast("double") - 1.0, F.lit(0.5))
    )
