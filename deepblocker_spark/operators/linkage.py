"""Fellegi-Sunter probabilistic record linkage with unsupervised EM.

The reference pipeline (``/root/reference/deep_blocker.py:48-74``) stops at
candidate-pair emission; the classic downstream decision stage — score each
candidate pair with a probabilistic match/non-match model — is the
Fellegi-Sunter model (Fellegi & Sunter 1969), with the m/u parameters
estimated unsupervised by EM over the comparison-pattern contingency table
(Winkler 1988; the same public design popularised by Splink).

Spark-first decomposition — the three stages have wildly different sizes,
and only the first one touches the data:

1. **Comparison vectors** (``comparison_vectors``): each candidate pair is
   reduced to a tuple of small integer agreement levels ("gammas"), one per
   compared field. Pure JVM ``Column`` expressions (CASE ladders over
   equality / numeric distance / string-similarity columns) — whole-stage
   codegen, no Python in the hot path. This is the only full-data pass.
2. **Pattern contingency table** (``pattern_counts``): groupBy the gamma
   columns, count. Output cardinality is bounded by the *product of level
   counts* (e.g. 2x3x3 = 18 rows) regardless of pair count — at 100 TB this
   is one partial+final hash aggregation producing a few dozen rows.
3. **EM fit** (``fs_em``): runs on the collected pattern table on the
   driver in numpy. Iterating EM over 18 weighted rows is microseconds;
   distributing it would be pure overhead. Conditional-independence
   (naive-Bayes) mixture of a match and a non-match class, exactly the
   textbook estimator.
4. **Scoring** (``score_pairs`` / ``match_weight_col``): the fitted
   log2(m/u) weights are baked back into CASE expressions as *precomputed
   double literals* — scoring a pair is a handful of JVM additions and one
   multiply chain, no log/exp at runtime, trivially codegen'd and exactly
   reproducible.
5. **Term-frequency adjustment** (``term_frequencies`` /
   ``tf_adjusted_scores``): Winkler's frequency-based matching (Winkler
   1989; the same public design as Splink's ``tf_adjustments``). The
   global u-probability for *agreement* on a field is the average chance
   two random records share a value — but agreeing on a RARE value
   ("Zbigniew") is far stronger evidence than agreeing on a common one
   ("Smith"). The adjustment replaces the averaged agreement-u with the
   shared value's own relative frequency tf(v): the Bayes factor is
   multiplied by u_agree / tf(v) (>1 for rare values, <1 for common).
   Spark shape: a groupBy value-frequency table (bounded by vocabulary
   size) broadcast-joined onto the pair frame — one narrow join, no
   runtime transcendentals anywhere (the factor is a single IEEE divide,
   so oracles reproduce it bit-exactly).

``fs_link`` composes 1-4 end to end.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Comparison",
    "FSParams",
    "comparison_vectors",
    "pattern_counts",
    "fs_em",
    "match_ratio_col",
    "match_weight_col",
    "match_probability_col",
    "score_pairs",
    "fs_link",
    "term_frequencies",
    "tf_adjustment_factor_col",
    "tf_adjusted_scores",
]

_EPS = 1e-6  # probability floor — keeps EM away from degenerate 0/1 corners


@dataclass(frozen=True)
class Comparison:
    """One compared field: a name, the number of agreement levels, and a
    JVM Column producing the integer level (0 = strongest disagreement,
    ``levels - 1`` = strongest agreement) over the joined pair frame.

    The expression must be NULL-safe: wrap nullable inputs so missing
    values land on a deliberate level (conventionally 0) instead of NULL —
    a NULL gamma would silently drop the pair from ``pattern_counts``'
    contribution to its pattern and poison the CASE scoring ladder.

    ``gamma`` may be None when the comparison is only used driver-side
    (``fs_em`` on an already-materialised pattern table needs names and
    level counts, not Spark expressions).
    """

    name: str
    levels: int
    gamma: Column | None = None

    @property
    def col(self) -> str:
        return f"gamma_{self.name}"


@dataclass
class FSParams:
    """Fitted Fellegi-Sunter parameters.

    ``m[name][l]`` = P(gamma_name = l | match), ``u[name][l]`` = the same
    conditioned on non-match; ``lam`` = P(match) prior over the candidate
    pairs the model was fitted on.
    """

    lam: float
    m: dict[str, list[float]]
    u: dict[str, list[float]]
    n_iter: int = 0
    converged: bool = True
    loglik: list[float] = field(default_factory=list)

    def ratio(self, name: str, level: int) -> float:
        return self.m[name][level] / self.u[name][level]

    def log2_ratio(self, name: str, level: int) -> float:
        return math.log2(self.ratio(name, level))


def comparison_vectors(
    pairs: DataFrame,
    comparisons: list[Comparison],
    keep: tuple[str, ...] = ("a", "b"),
) -> DataFrame:
    """Reduce each candidate pair to its integer agreement-level vector.

    ``pairs`` must already carry the attribute columns the gamma
    expressions reference (the caller joins them in — typically two
    broadcast/shuffle joins back to the source tables, the same join-back
    shape as ``q_cand_jw_scores``). Output: ``keep`` + one int column per
    comparison, all JVM-side.
    """
    missing = [c.name for c in comparisons if c.gamma is None]
    if missing:
        raise ValueError(f"comparison_vectors: no gamma expression for {missing}")
    cols = [F.col(c) for c in keep]
    cols += [c.gamma.cast("int").alias(c.col) for c in comparisons]
    return pairs.select(*cols)


def pattern_counts(gammas: DataFrame, comparisons: list[Comparison]) -> DataFrame:
    """Contingency table of gamma patterns: one row per observed pattern
    with its pair count. Bounded by prod(levels) rows — collectable at any
    data scale; this is the ONLY thing EM ever sees."""
    keys = [c.col for c in comparisons]
    return gammas.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_pairs"))


def _default_init(
    comparisons: list[Comparison],
) -> tuple[dict[str, list[float]], dict[str, list[float]]]:
    """Symmetric default init: matches concentrate on the top level,
    non-matches on level 0 — the standard symmetry-breaking prior that
    steers EM toward the (match, non-match) labelling rather than its
    mirror image."""
    m: dict[str, list[float]] = {}
    u: dict[str, list[float]] = {}
    for c in comparisons:
        rest = 0.2 / (c.levels - 1) if c.levels > 1 else 0.0
        mv = [rest] * c.levels
        mv[-1] = 0.8
        uv = [rest] * c.levels
        uv[0] = 0.8
        m[c.name] = mv
        u[c.name] = uv
    return m, u


def fs_em(
    patterns: pd.DataFrame,
    comparisons: list[Comparison],
    *,
    init_lambda: float = 0.1,
    init_m: dict[str, list[float]] | None = None,
    init_u: dict[str, list[float]] | None = None,
    max_iter: int = 200,
    tol: float = 1e-9,
) -> FSParams:
    """EM over the pattern contingency table (columns ``gamma_*`` +
    ``n_pairs``). Deterministic: fixed init, fixed iteration order, numpy
    float64 throughout; converges when the max absolute parameter update
    falls below ``tol``. All probabilities are floored at 1e-6 so a level
    unobserved in one class can't produce a 0/0 Bayes factor."""
    if patterns.empty:
        raise ValueError("fs_em: empty pattern table")
    counts = patterns["n_pairs"].to_numpy(dtype=np.float64)
    gam = {c.name: patterns[c.col].to_numpy(dtype=np.int64) for c in comparisons}
    for c in comparisons:
        bad = (gam[c.name] < 0) | (gam[c.name] >= c.levels)
        if bad.any():
            raise ValueError(
                f"fs_em: gamma_{c.name} outside [0, {c.levels}) "
                f"in rows {np.nonzero(bad)[0].tolist()}"
            )

    m0, u0 = _default_init(comparisons)
    m = {k: np.asarray((init_m or m0)[k], dtype=np.float64) for k in m0}
    u = {k: np.asarray((init_u or u0)[k], dtype=np.float64) for k in u0}
    lam = float(init_lambda)
    total = counts.sum()
    loglik: list[float] = []
    converged = False
    it = 0

    def _clip(v: np.ndarray) -> np.ndarray:
        # normalize the weighted counts to a distribution FIRST, then floor
        # (flooring raw counts would flatten any table with counts >> 1)
        s = v.sum()
        v = v / s if s > 0 else np.full_like(v, 1.0 / len(v))
        v = np.clip(v, _EPS, 1.0 - _EPS)
        return v / v.sum()

    for it in range(1, max_iter + 1):
        # E-step: responsibility of the match class for each pattern
        pm = np.full_like(counts, lam)
        pu = np.full_like(counts, 1.0 - lam)
        for c in comparisons:
            pm *= m[c.name][gam[c.name]]
            pu *= u[c.name][gam[c.name]]
        denom = pm + pu
        loglik.append(float(np.dot(counts, np.log(denom))))
        r = pm / denom

        # M-step: weighted relative frequencies
        new_lam = float(np.clip(np.dot(counts, r) / total, _EPS, 1.0 - _EPS))
        delta = abs(new_lam - lam)
        wm = counts * r
        wu = counts * (1.0 - r)
        for c in comparisons:
            nm = _clip(np.bincount(gam[c.name], weights=wm, minlength=c.levels))
            nu = _clip(np.bincount(gam[c.name], weights=wu, minlength=c.levels))
            delta = max(delta, float(np.abs(nm - m[c.name]).max()))
            delta = max(delta, float(np.abs(nu - u[c.name]).max()))
            m[c.name] = nm
            u[c.name] = nu
        lam = new_lam
        if delta < tol:
            converged = True
            break

    return FSParams(
        lam=lam,
        m={k: v.tolist() for k, v in m.items()},
        u={k: v.tolist() for k, v in u.items()},
        n_iter=it,
        converged=converged,
        loglik=loglik,
    )


def _level_case(col: str, values: list[float]) -> Column:
    """CASE gamma_col WHEN l THEN <double literal> — precomputed weights,
    no runtime transcendentals."""
    expr = F.lit(float(values[0]))
    for lvl in range(1, len(values)):
        expr = F.when(F.col(col) == lvl, float(values[lvl])).otherwise(expr)
    return expr


def match_ratio_col(comparisons: list[Comparison], params: FSParams) -> Column:
    """Bayes factor K = prod m/u — a chain of CASE-literal multiplies."""
    out = F.lit(1.0)
    for c in comparisons:
        ratios = [params.ratio(c.name, lvl) for lvl in range(c.levels)]
        out = out * _level_case(c.col, ratios)
    return out


def match_weight_col(comparisons: list[Comparison], params: FSParams) -> Column:
    """log2 Bayes factor — SUM of per-field CASE-mapped log2(m/u) literals
    (each log2 evaluated once on the driver, so the column is exact IEEE
    addition of constants)."""
    out = F.lit(0.0)
    for c in comparisons:
        w = [params.log2_ratio(c.name, lvl) for lvl in range(c.levels)]
        out = out + _level_case(c.col, w)
    return out


def match_probability_col(
    comparisons: list[Comparison], params: FSParams
) -> Column:
    """Posterior P(match | gamma) = lam*K / (lam*K + 1-lam)."""
    k = match_ratio_col(comparisons, params)
    lk = F.lit(params.lam) * k
    return lk / (lk + F.lit(1.0 - params.lam))


def score_pairs(
    gammas: DataFrame, comparisons: list[Comparison], params: FSParams
) -> DataFrame:
    """Append match_weight and match_probability to a gamma frame."""
    return gammas.withColumns(
        {
            "match_weight": match_weight_col(comparisons, params),
            "match_probability": match_probability_col(comparisons, params),
        }
    )


def fs_link(
    pairs: DataFrame,
    comparisons: list[Comparison],
    *,
    keep: tuple[str, ...] = ("a", "b"),
    init_lambda: float = 0.1,
    max_iter: int = 200,
    tol: float = 1e-9,
) -> tuple[DataFrame, FSParams]:
    """End-to-end unsupervised linkage over a candidate-pair frame that
    already carries the compared attributes: gammas (one data pass) ->
    pattern table (hash agg, <= prod(levels) rows) -> driver EM -> scored
    pairs. The gamma frame is computed lazily twice (pattern pass + score
    pass); callers with an expensive upstream (e.g. LSH candidates) should
    persist ``pairs`` or checkpoint it — the frame itself is not cached
    here because at 100 TB the caller owns the storage-level decision."""
    gam = comparison_vectors(pairs, comparisons, keep=keep)
    pats = pattern_counts(gam, comparisons).toPandas()
    params = fs_em(
        pats, comparisons, init_lambda=init_lambda, max_iter=max_iter, tol=tol
    )
    return score_pairs(gam, comparisons, params), params


def term_frequencies(
    df: DataFrame,
    value_col: str,
    out_value: str = "value",
    out_tf: str = "tf",
) -> DataFrame:
    """-> (``out_value``, ``out_tf``): each distinct value of ``value_col``
    with its relative frequency tf = n_value / N as an exact IEEE double
    division of two counts (so any SQL engine recomputing count/count gets
    the bit-identical double). NULLs are excluded — a NULL never "agrees"
    with anything, so it has no term frequency.

    Scale shape: one partial+final hash aggregation bounded by the field's
    vocabulary; the scalar total arrives by broadcast cross-join (no
    single-partition window, no collect)."""
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias(out_value))
        .agg(F.count(F.lit(1)).alias("_n_value"))
    )
    # distinct names even under spark.sql.caseSensitive=false (the default),
    # where `_n` and `_N` would collide
    total = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.count(F.lit(1)).alias("_n_total"))
    )
    return counts.crossJoin(F.broadcast(total)).select(
        out_value,
        (F.col("_n_value").cast("double") / F.col("_n_total")).alias(out_tf),
    )


def tf_adjustment_factor_col(
    comparison: Comparison,
    params: FSParams,
    tf_col: Column,
    min_tf: float | None = None,
) -> Column:
    """Multiplicative Bayes-factor correction for full agreement on a
    shared value whose relative frequency is ``tf_col`` (Winkler 1989;
    Splink's public ``tf_adjustments``): u_agree / tf(v), applied only at
    the comparison's top agreement level and only when the tf is known
    (a left-join miss keeps the unadjusted factor 1.0). ``min_tf`` floors
    the frequency (Splink's guard against exploding weights on near-unique
    values); the floor is a greatest() — still pure +,*,/ IEEE arithmetic,
    so oracles reproduce the factor exactly."""
    u_agree = params.u[comparison.name][comparison.levels - 1]
    tf = tf_col if min_tf is None else F.greatest(tf_col, F.lit(float(min_tf)))
    # tf_col > 0 guard (ADVICE r5 #4): a malformed 0.0 frequency with no
    # min_tf floor would yield an Infinity factor; it now degrades to the
    # unadjusted 1.0. No-op for any real relative frequency (> 0 by
    # construction), so oracle-checked outputs are unchanged.
    return F.when(
        (F.col(comparison.col) == comparison.levels - 1)
        & tf_col.isNotNull()
        & (tf_col > 0),
        F.lit(float(u_agree)) / tf,
    ).otherwise(F.lit(1.0))


def tf_adjusted_scores(
    gammas: DataFrame,
    comparisons: list[Comparison],
    params: FSParams,
    tf_cols: dict[str, Column],
    min_tf: float | None = None,
) -> DataFrame:
    """``score_pairs`` plus term-frequency adjustment: appends

    - ``match_weight`` / ``match_probability`` — the unadjusted scores,
    - ``tf_factor`` — the left-associated product of per-field adjustment
      factors (1.0 wherever no adjustment applies),
    - ``adj_match_probability`` — the posterior with the adjusted Bayes
      factor K' = K * tf_factor.

    ``gammas`` must carry, besides the gamma columns, whatever columns the
    ``tf_cols`` expressions reference — typically the shared value's tf
    joined in by broadcast from ``term_frequencies`` (the caller owns the
    join so one tf table can serve both sides of a dyadic linkage).
    ``tf_cols`` maps comparison name -> tf Column; fold order is the
    ``comparisons`` list order, mirrored literally by the SQL oracle.
    Everything stays CASE-literal +,*,/ arithmetic — no log/exp at
    runtime, identical IEEE results on any engine."""
    by_name = {c.name: c for c in comparisons}
    unknown = sorted(set(tf_cols) - set(by_name))
    if unknown:
        raise ValueError(f"tf_adjusted_scores: unknown comparisons {unknown}")
    factor = F.lit(1.0)
    for c in comparisons:
        if c.name in tf_cols:
            factor = factor * tf_adjustment_factor_col(
                c, params, tf_cols[c.name], min_tf=min_tf
            )
    k = match_ratio_col(comparisons, params)
    lam, one_minus = float(params.lam), float(1.0 - params.lam)
    lk = F.lit(lam) * k
    lk_adj = F.lit(lam) * (k * factor)
    return gammas.withColumns(
        {
            "match_weight": match_weight_col(comparisons, params),
            "match_probability": lk / (lk + F.lit(one_minus)),
            "tf_factor": factor,
            "adj_match_probability": lk_adj / (lk_adj + F.lit(one_minus)),
        }
    )
