"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter,
JASA 1969) with EM parameter estimation (Winkler 1988, "Using the EM
algorithm for weight computation in the Fellegi-Sunter model").

The reference resolves purely through deterministic cascades plus a
trained linear scorer (hamerkop/resolver.py:61-210); it has no
probabilistic-linkage model. This module adds the classic one:

* ``fs_match_weight`` — the log2 likelihood-ratio match weight of a
  candidate pair given per-field agreement indicators and (m, u)
  probabilities.  The per-field agreement / disagreement weights are
  folded to fixed-point integers on the driver, so the per-row work is
  a codegen'd integer CASE-sum — hash-stable across engines and free
  of float-accumulation order effects.
* ``fit_fs_em`` — unsupervised (m, u, p) estimation by EM over binary
  agreement vectors.  Scale shape: ONE distributed pass histograms the
  agreement patterns (groupBy over k 0/1 columns -> at most 2^k rows,
  map-side combinable), then EM iterates driver-side over the tiny
  pattern-count table with numpy.  Iteration cost is therefore
  independent of the number of pairs — the standard trick that makes
  EM linkage viable at web scale (the 100-TB cost is the single
  histogram shuffle, which any estimator needs).
* ``field_agreement`` — null-safe 0/1 agreement indicator.

Weights from ``fit_fs_em`` feed straight back into
``fs_match_weight``; thresholding / margin tuning reuses
operators/train.py (tune_margin) and resolve.py's NIL gating.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FP_SCALE = 1_000_000

# Probabilities are clipped away from {0, 1} so log-weights stay finite
# and EM never paints itself into a degenerate corner.
_EPS = 1e-6


def field_agreement(a, b):
    """0/1 agreement indicator for one comparison field: 1 iff both
    sides are non-null and equal (<=> is null-safe; null vs anything
    counts as disagreement, the conventional conservative choice)."""
    return (
        F.when(F.col(a).isNull() | F.col(b).isNull(), F.lit(0))
        .otherwise((F.col(a) == F.col(b)).cast("int"))
    )


def fs_weight_constants(
    m: dict[str, float], u: dict[str, float]
) -> dict[str, tuple[int, int]]:
    """Fixed-point (agreement, disagreement) log2 weights per field:
    aw = log2(m/u), dw = log2((1-m)/(1-u)), each floor(w*1e6 + 0.5).

    Computed once on the driver in Python floats; per-row scoring is
    then pure integer arithmetic, so Spark and any ANSI oracle produce
    bit-identical weights.
    """
    out = {}
    for f in m:
        mi = min(max(float(m[f]), _EPS), 1.0 - _EPS)
        ui = min(max(float(u[f]), _EPS), 1.0 - _EPS)
        aw = math.log2(mi / ui)
        dw = math.log2((1.0 - mi) / (1.0 - ui))
        out[f] = (
            math.floor(aw * FP_SCALE + 0.5),
            math.floor(dw * FP_SCALE + 0.5),
        )
    return out


def fs_match_weight(
    comparisons: DataFrame,
    fields: list[str],
    m: dict[str, float],
    u: dict[str, float],
    weight_col: str = "fs_weight_fp",
) -> DataFrame:
    """Append the Fellegi-Sunter composite match weight to a comparison
    table whose ``fields`` columns are 0/1 agreement indicators.

    weight = sum_i  [ gamma_i * log2(m_i/u_i)
                      + (1-gamma_i) * log2((1-m_i)/(1-u_i)) ]

    emitted as fixed-point millionths (BIGINT).  All per-row work is a
    codegen'd integer CASE-sum — no UDF, no shuffle, no float."""
    consts = fs_weight_constants({f: m[f] for f in fields}, u)
    expr = None
    for f in fields:
        aw, dw = consts[f]
        term = F.when(F.col(f) == 1, F.lit(aw)).otherwise(F.lit(dw))
        expr = term if expr is None else expr + term
    return comparisons.withColumn(weight_col, expr.cast("bigint"))


# 1e6 / ln(2): multiplying a NATURAL log by this literal yields log2 in
# fixed-point millionths. Both engines evaluate ln() with platform libm
# (parity proven by the f_tfidf_cosine oracle) and then one float
# multiply by the SAME literal + floor — bit-identical cross-engine.
LOG2E_FP = 1_000_000 / math.log(2.0)


def tf_table(records: DataFrame, value_col: str) -> DataFrame:
    """Per-value rarity table for term-frequency adjustment (Winkler
    1995 §3 "value-specific weights"; the same adjustment Splink calls
    term_frequency_adjustments): ``(value, tf_log2_fp)`` where

        tf_log2_fp = floor( log2(N / n_v) * 1e6 + 0.5 )

    over the non-null values of ``value_col``. One groupBy count + a
    1-row total broadcast — O(distinct values) output, joinable
    (broadcast when small) against candidate pairs.
    """
    counts = (
        records.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("value"))
        .agg(F.count("*").alias("n_v"))
    )
    total = counts.agg(F.sum("n_v").alias("n_total"))
    return counts.join(F.broadcast(total)).select(
        "value",
        F.floor(
            F.log(F.col("n_total").cast("double") / F.col("n_v").cast("double"))
            * F.lit(LOG2E_FP)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("tf_log2_fp"),
    )


def fs_tf_match_weight(
    comparisons: DataFrame,
    fields: list[str],
    m: dict[str, float],
    u: dict[str, float],
    tf: dict[str, tuple[str, DataFrame]],
    weight_col: str = "fs_weight_fp",
    cap_bits: float = 8.0,
) -> DataFrame:
    """Fellegi-Sunter match weight with term-frequency-adjusted
    agreement weights (Winkler 1995): agreeing on "John Smith" is weak
    evidence, agreeing on "Xochitl Nakamura" is strong. For a field in
    ``tf`` agreeing on value v with share p_v = n_v/N, the agreement
    weight log2(m/u) becomes

        log2(m / p_v) = aw + delta(v),   delta(v) = log2(u) + log2(N/n_v)

    i.e. the field's AVERAGE u-probability is replaced by the value's
    own collision probability. delta is clamped to keep the adjusted
    weight inside [dw, aw + cap_bits]: an ultra-common value can at
    worst look like a disagreement, never worse (the conservative
    convention), and an ultra-rare value's boost is capped so one
    singleton value cannot dominate a whole weight vector.

    :param tf: {field: (value_col, tf_table_df)} — value_col is the
        comparison table's column holding the (agreed) value to look
        up; non-TF fields score exactly as ``fs_match_weight``.

    Scale shape: one left hash join per TF field against its
    O(distinct values) rarity table (broadcast when small), then the
    same codegen'd integer CASE-sum as ``fs_match_weight`` — all
    fixed-point BIGINTs, so the DuckDB twin hash-matches.
    """
    consts = fs_weight_constants({f: m[f] for f in fields}, u)
    df = comparisons
    expr = None
    drop_cols = []
    for f in fields:
        aw, dw = consts[f]
        if f in tf:
            value_col, tf_df = tf[f]
            vcol, fpcol = f"_tfv_{f}", f"_tffp_{f}"
            t = tf_df.select(
                F.col("value").alias(vcol), F.col("tf_log2_fp").alias(fpcol)
            )
            df = df.join(t, df[value_col] == F.col(vcol), "left")
            drop_cols += [vcol, fpcol]
            ui = min(max(float(u[f]), _EPS), 1.0 - _EPS)
            log2u_fp = math.floor(math.log2(ui) * FP_SCALE + 0.5)
            cap_fp = math.floor(cap_bits * FP_SCALE + 0.5)
            # value missing from the tf table (built on another corpus
            # slice) -> no evidence either way: delta := 0
            delta = F.when(F.col(fpcol).isNull(), F.lit(0)).otherwise(
                F.col(fpcol) + F.lit(log2u_fp)
            )
            adj = F.greatest(
                F.lit(dw), F.least(F.lit(aw) + delta, F.lit(aw + cap_fp))
            )
            term = F.when(F.col(f) == 1, adj).otherwise(F.lit(dw))
        else:
            term = F.when(F.col(f) == 1, F.lit(aw)).otherwise(F.lit(dw))
        expr = term if expr is None else expr + term
    return df.withColumn(weight_col, expr.cast("bigint")).drop(*drop_cols)


def agreement_pattern_counts(
    comparisons: DataFrame, fields: list[str]
) -> DataFrame:
    """Histogram of agreement patterns: one row per distinct 0/1 vector
    with its pair count.  The single shuffle of the EM path; map-side
    combinable, output bounded by 2^k rows regardless of input size."""
    cols = [F.col(f).cast("int").alias(f) for f in fields]
    return comparisons.select(*cols).groupBy(fields).agg(
        F.count("*").alias("n")
    )


def fit_fs_em(
    comparisons: DataFrame,
    fields: list[str],
    iterations: int = 100,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
    tol: float = 1e-9,
) -> dict:
    """Estimate Fellegi-Sunter parameters by EM under the standard
    conditional-independence model:

        P(gamma) = p * prod_i m_i^g_i (1-m_i)^(1-g_i)
                 + (1-p) * prod_i u_i^g_i (1-u_i)^(1-g_i)

    E-step/M-step run over the *pattern histogram* (<= 2^k rows pulled
    to the driver, numpy-vectorized), so the distributed cost is one
    groupBy pass over the pairs no matter how many iterations run.

    Returns {"p", "m", "u", "n", "iterations", "converged"} — feed
    m/u into ``fs_match_weight`` to score.

    ``len(fields)`` is capped at 20 (2^20 pattern rows ~ driver-safe);
    more comparison fields than that is a modeling smell anyway.
    """
    import numpy as np

    if len(fields) > 20:
        raise ValueError(
            f"fit_fs_em supports at most 20 fields, got {len(fields)}"
        )
    hist = agreement_pattern_counts(comparisons, fields).collect()
    if not hist:
        raise ValueError("fit_fs_em: empty comparison table")
    gam = np.array([[r[f] for f in fields] for r in hist], dtype=np.float64)
    cnt = np.array([r["n"] for r in hist], dtype=np.float64)
    n_total = float(cnt.sum())

    p = float(init_p)
    m = np.full(len(fields), float(init_m))
    u = np.full(len(fields), float(init_u))
    it_done, converged = 0, False
    for it in range(iterations):
        # E-step: responsibility of the match class per pattern
        # (log-space for numeric safety on long vectors).
        log_m = gam @ np.log(m) + (1.0 - gam) @ np.log(1.0 - m)
        log_u = gam @ np.log(u) + (1.0 - gam) @ np.log(1.0 - u)
        a = np.log(p) + log_m
        b = np.log1p(-p) + log_u
        hi = np.maximum(a, b)
        g = np.exp(a - hi) / (np.exp(a - hi) + np.exp(b - hi))
        # M-step: count-weighted means
        gm = g * cnt
        gu = (1.0 - g) * cnt
        p_new = gm.sum() / n_total
        m_new = (gam * gm[:, None]).sum(axis=0) / max(gm.sum(), _EPS)
        u_new = (gam * gu[:, None]).sum(axis=0) / max(gu.sum(), _EPS)
        p_new = min(max(p_new, _EPS), 1.0 - _EPS)
        m_new = np.clip(m_new, _EPS, 1.0 - _EPS)
        u_new = np.clip(u_new, _EPS, 1.0 - _EPS)
        delta = max(
            abs(p_new - p),
            float(np.abs(m_new - m).max()),
            float(np.abs(u_new - u).max()),
        )
        p, m, u = p_new, m_new, u_new
        it_done = it + 1
        if delta < tol:
            converged = True
            break
    # Canonical orientation: the "match" class is the one whose members
    # agree more; EM from a symmetric start can converge to the
    # label-swapped optimum (classic mixture identifiability).
    if float(m.sum()) < float(u.sum()):
        m, u, p = u, m, 1.0 - p
    return {
        "p": float(p),
        "m": {f: float(m[i]) for i, f in enumerate(fields)},
        "u": {f: float(u[i]) for i, f in enumerate(fields)},
        "n": int(n_total),
        "iterations": it_done,
        "converged": converged,
    }


def fs_resolver(
    m: dict[str, float],
    u: dict[str, float],
    fields: list[str] | None = None,
    threshold_fp: int = 0,
    margin_fp: int = 0,
):
    """Fellegi-Sunter decision stage in the resolver-cascade contract
    (operators/resolve.py: pairs -> (decisions, remaining)): per chain,
    argmax of the composite match weight with a NIL threshold and an
    optional runner-up ambiguity margin, both in fixed-point millionths
    of a log2 unit.

    Drop-in alongside linear_resolver — e.g. after EM estimation:

        fit = fit_fs_em(pairs, fields)
        cascade_resolver(pairs, [fs_resolver(fit["m"], fit["u"])])

    Deterministic tie-break by entity_id; all scoring stays in codegen
    (integer CASE-sum + one window)."""
    from pyspark.sql import Window

    from hamerkop_spark.operators.resolve import CHAIN

    flds = fields or list(m)

    def run(pairs: DataFrame):
        scored = fs_match_weight(pairs, flds, m, u)
        w = Window.partitionBy(*CHAIN).orderBy(
            F.desc("fs_weight_fp"), F.col("entity_id")
        )
        ranked = scored.withColumn("rn", F.row_number().over(w))
        accept = (F.col("rn") == 1) & (
            F.col("fs_weight_fp") >= F.lit(int(threshold_fp))
        )
        if margin_fp > 0:
            ranked = ranked.withColumn(
                "next_w", F.lead("fs_weight_fp").over(w)
            )
            accept = accept & (
                F.col("next_w").isNull()
                | (
                    F.col("fs_weight_fp") - F.col("next_w")
                    >= F.lit(int(margin_fp))
                )
            )
        decisions = ranked.where(accept).select(*CHAIN, "entity_id")
        remaining = scored.drop("fs_weight_fp").join(
            decisions.select(*CHAIN), CHAIN, "left_anti"
        )
        return decisions, remaining

    return run


def mutual_best_match(
    pairs: DataFrame,
    left_col: str = "chain_id",
    right_col: str = "entity_id",
    score_col: str = "match_score",
) -> DataFrame:
    """One round of locally-dominant pair extraction: keep (l, r) iff r
    is l's best candidate AND l is r's best, under the deterministic
    total order (score desc, left asc, right asc).

    "Mutual best" is the classic symmetric-argmax one-to-one filter
    (a.k.a. locally dominant edges — Preis '99 / Manne & Bisseling '07
    distributed greedy matching). Scores must be non-null; ties are
    broken by the id columns, so the order is total and the result is
    deterministic.

    Scale shape: two hash-partitioned window row_numbers (one per side)
    — no driver state, no per-group sequential work, skew bounded by
    the largest candidate list per record.
    """
    wl = Window.partitionBy(left_col).orderBy(
        F.desc(score_col), F.asc(right_col)
    )
    wr = Window.partitionBy(right_col).orderBy(
        F.desc(score_col), F.asc(left_col)
    )
    return (
        pairs.withColumn("_rl", F.row_number().over(wl))
        .withColumn("_rr", F.row_number().over(wr))
        .where((F.col("_rl") == 1) & (F.col("_rr") == 1))
        .drop("_rl", "_rr")
    )


def one_to_one_assignment(
    pairs: DataFrame,
    left_col: str = "chain_id",
    right_col: str = "entity_id",
    score_col: str = "match_score",
    max_rounds: int | None = None,
    round_col: str = "match_round",
) -> DataFrame:
    """Greedy maximum-weight one-to-one matching over a scored bipartite
    candidate table, computed as iterated locally-dominant extraction:
    each round keeps every mutual-best pair, removes both endpoints,
    and repeats on the shrinking remainder.

    Under the total order (score desc, left, right) this reproduces the
    SEQUENTIAL greedy matching exactly (the globally best remaining
    edge is always mutual-best, and removing locally dominant edges
    never changes later greedy choices) — but each round is a fully
    distributed pair of window passes instead of a driver-side sort.
    Greedy matching is a 1/2-approximation of the optimal assignment;
    the reference resolves each mention independently
    (resolver.py:192-213) and has no one-to-one stage — this is the
    standard Fellegi-Sunter one-to-one restriction for A-file/B-file
    record linkage.

    Rounds needed: O(log n) in expectation on random score orders;
    `max_rounds` caps the loop (pass None to run to fixpoint). Each
    round localCheckpoints the remainder so lineage stays flat.

    Returns matched pairs (all input columns) plus `round_col` = the
    1-indexed round the pair was extracted in.
    """
    # NULL ids or scores would be unremovable by the anti-joins below
    # (NULL never equals NULL), re-matching forever — drop them up
    # front instead of spinning (review finding)
    remaining = pairs.where(
        F.col(left_col).isNotNull()
        & F.col(right_col).isNotNull()
        & F.col(score_col).isNotNull()
    )
    matched: DataFrame | None = None
    rnd = 0
    while True:
        rnd += 1
        best = mutual_best_match(
            remaining, left_col, right_col, score_col
        ).withColumn(round_col, F.lit(rnd))
        best = best.localCheckpoint(eager=True)
        matched = best if matched is None else matched.unionByName(best)
        if max_rounds is not None and rnd >= max_rounds:
            break
        if best.isEmpty():
            break
        remaining = (
            remaining.join(
                best.select(left_col), left_col, "left_anti"
            ).join(best.select(right_col), right_col, "left_anti")
        ).localCheckpoint(eager=True)
        if remaining.isEmpty():
            break
    return matched


def one_to_one_resolver(
    score_col: str = "match_score",
    threshold: float | None = None,
    max_rounds: int | None = None,
):
    """One-to-one assignment as a resolver-cascade stage
    (operators/resolve.py contract: pairs -> (decisions, remaining)):
    run greedy matching between chains and entities, decide every
    matched chain, leave unmatched chains' pairs for later stages.

    `threshold` drops pairs scoring below it BEFORE matching (NIL
    gate); unmatched chains stay in the pool rather than resolving to
    a worse candidate — the one-to-one constraint is the whole point.
    """
    from hamerkop_spark.operators.resolve import CHAIN

    def run(pairs: DataFrame):
        pool = pairs
        if threshold is not None:
            pool = pool.where(F.col(score_col) >= F.lit(float(threshold)))
        key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in CHAIN])
        flat = pool.withColumn("_chain_key", key)
        m = one_to_one_assignment(
            flat,
            left_col="_chain_key",
            right_col="entity_id",
            score_col=score_col,
            max_rounds=max_rounds,
        )
        decisions = m.select(*CHAIN, "entity_id")
        # remove BOTH sides from the pool: a later cascade stage must
        # not re-assign an entity this stage just claimed, or the
        # global one-to-one guarantee silently breaks (review finding)
        remaining = pairs.join(
            decisions.select(*CHAIN), CHAIN, "left_anti"
        ).join(decisions.select("entity_id"), "entity_id", "left_anti")
        return decisions, remaining

    return run


def fs_three_band(
    comparisons: DataFrame,
    fields: list[str],
    m: dict[str, float],
    u: dict[str, float],
    upper_fp: int,
    lower_fp: int,
    band_col: str = "fs_band",
) -> DataFrame:
    """The Fellegi-Sunter three-way decision rule (F-S 1969 §3): pairs
    with composite weight >= `upper_fp` are links, <= `lower_fp` are
    non-links, and the band between goes to CLERICAL REVIEW — the
    output every production linkage system queues for humans.

    Thresholds are fixed-point millionths of a log2 unit (the
    fs_match_weight scale); derive them from target error rates with
    ``fs_thresholds_for_error``. Appends `fs_weight_fp` and `band_col`
    ('match' / 'possible' / 'non_match') — pure codegen, no UDF.
    """
    if upper_fp < lower_fp:
        raise ValueError("upper_fp must be >= lower_fp")
    scored = fs_match_weight(comparisons, fields, m, u)
    return scored.withColumn(
        band_col,
        F.when(F.col("fs_weight_fp") >= F.lit(int(upper_fp)), "match")
        .when(F.col("fs_weight_fp") <= F.lit(int(lower_fp)), "non_match")
        .otherwise("possible"),
    )


def fs_thresholds_for_error(
    comparisons: DataFrame,
    fields: list[str],
    m: dict[str, float],
    u: dict[str, float],
    mu: float = 0.001,
    lam: float = 0.001,
) -> dict:
    """Error-bounded threshold selection — the actual theorem of
    Fellegi & Sunter 1969 (§3.2, the "optimal linkage rule"): given a
    target false-match rate `mu` (P(link | true non-match)) and false-
    non-match rate `lam` (P(non-link | true match)), order the
    agreement patterns by likelihood ratio and sweep cutoffs so the
    u-mass above the upper threshold <= mu and the m-mass below the
    lower threshold <= lam. The rule is optimal: it minimizes the
    clerical-review band at those error levels.

    Distributed cost is ONE groupBy (the same <=2^k agreement-pattern
    histogram fit_fs_em uses); the sweep runs driver-side over the
    tiny pattern table with model-implied m/u masses (so thresholds
    are well-defined even for patterns unseen in the sample).

    Returns {"upper_fp", "lower_fp", "mu_achieved", "lam_achieved",
    "n_patterns"} ready for ``fs_three_band``.
    """
    import numpy as np

    hist = agreement_pattern_counts(comparisons, fields).collect()
    if not hist:
        raise ValueError("fs_thresholds_for_error: empty comparison table")
    gam = np.array([[r[f] for f in fields] for r in hist], dtype=np.float64)
    return _fs_threshold_sweep(gam, fields, m, u, mu, lam)


def fs_model_thresholds(
    fields: list[str],
    m: dict[str, float],
    u: dict[str, float],
    mu: float = 0.001,
    lam: float = 0.001,
) -> dict:
    """``fs_thresholds_for_error`` over ALL 2^k agreement patterns
    enumerated from the model instead of the observed histogram — no
    DataFrame needed, so callers (e.g. oracle fixtures) can derive the
    identical thresholds without touching the cluster. Equivalent to
    the observed-pattern variant whenever every pattern occurs."""
    import itertools

    import numpy as np

    gam = np.array(
        list(itertools.product([0.0, 1.0], repeat=len(fields))),
        dtype=np.float64,
    )
    return _fs_threshold_sweep(gam, fields, m, u, mu, lam)


def _fs_threshold_sweep(gam, fields, m, u, mu, lam) -> dict:
    import numpy as np

    consts = fs_weight_constants({f: m[f] for f in fields}, u)
    # clamp like fs_weight_constants: a raw 0.0/1.0 probability would
    # put 0 * log(0) = NaN into the masses and silently degenerate
    # both cuts (review finding)
    mv = np.clip([float(m[f]) for f in fields], _EPS, 1.0 - _EPS)
    uv = np.clip([float(u[f]) for f in fields], _EPS, 1.0 - _EPS)
    # model-implied class masses per pattern
    pm = np.exp(gam @ np.log(mv) + (1.0 - gam) @ np.log(1.0 - mv))
    pu = np.exp(gam @ np.log(uv) + (1.0 - gam) @ np.log(1.0 - uv))
    w = np.array(
        [
            sum(
                consts[f][0] if row[i] == 1 else consts[f][1]
                for i, f in enumerate(fields)
            )
            for row in gam
        ],
        dtype=np.int64,
    )
    # fs_three_band cuts with >= / <= on the WEIGHT, so the sweep must
    # treat equal-weight patterns as one indivisible step — otherwise a
    # cut "between" two tied patterns links more mass than the error
    # budget allows while under-reporting mu_achieved (review finding)
    uniq = np.unique(w)[::-1]  # distinct weights, best first
    pm_w = np.array([pm[w == x].sum() for x in uniq])
    pu_w = np.array([pu[w == x].sum() for x in uniq])
    pm, pu, w = pm_w, pu_w, uniq
    pm = pm / pm.sum()
    pu = pu / pu.sum()
    # upper: largest prefix (links) whose u-mass <= mu
    cum_u = np.cumsum(pu)
    k_up = int(np.searchsorted(cum_u, mu, side="right"))
    # lower: largest suffix (non-links) whose m-mass <= lam
    cum_m_rev = np.cumsum(pm[::-1])
    k_lo = int(np.searchsorted(cum_m_rev, lam, side="right"))
    n = len(w)
    # thresholds sit on pattern-weight boundaries; an empty link set
    # gets a sentinel above the max weight (nothing auto-links)
    upper_fp = int(w[k_up - 1]) if k_up > 0 else int(w[0]) + 1
    lower_fp = int(w[n - k_lo]) if k_lo > 0 else int(w[-1]) - 1
    if upper_fp < lower_fp:
        # bands crossed: mu/lam are loose enough that review vanishes;
        # collapse to a single cut at the upper threshold
        lower_fp = upper_fp - 1
        k_lo = n - k_up
    return {
        "upper_fp": upper_fp,
        "lower_fp": lower_fp,
        "mu_achieved": float(cum_u[k_up - 1]) if k_up > 0 else 0.0,
        "lam_achieved": float(cum_m_rev[k_lo - 1]) if k_lo > 0 else 0.0,
        "n_patterns": n,  # distinct weight levels after tie-merge
    }


def sample_for_review(
    banded: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "fs_band",
    key_cols: tuple[str, ...] = ("chain_id", "entity_id"),
    oversample: float = 4.0,
) -> DataFrame:
    """Deterministic stratified sample for the clerical-review queue:
    up to `n_per_stratum` pairs per stratum (typically the fs_three_band
    bands), selected by a content hash so every engine — and every
    resume — draws the SAME sample, with no RNG state.

    Scale shape (two phases, never a full per-stratum sort):
      1. hash-range pre-filter: per-stratum keep-probability
         p = min(1, oversample*n/stratum_count) applied as
         md5-fraction < p — one broadcast join against the tiny
         stratum-count table, embarrassingly parallel;
      2. exact top-n window over the ~oversample*n survivors per
         stratum (small by construction).
    A stratum smaller than n keeps every row (p = 1). The hash order
    (integer of the first 8 md5 hex digits, tie-broken by the key
    string) is reproducible in any ANSI engine — md5 is bit-identical
    everywhere, unlike engine-specific hash functions.
    """
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    hval = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    hfrac = hval.cast("double") / F.lit(float(16 ** 8))
    counts = banded.groupBy(stratum_col).agg(F.count("*").alias("_sn"))
    p = F.least(
        F.lit(1.0),
        F.lit(float(oversample)) * F.lit(float(n_per_stratum)) / F.col("_sn"),
    )
    pre = (
        banded.join(F.broadcast(counts), stratum_col)
        .withColumn("_hv", hval)
        .where(hfrac < p)
    )
    w = Window.partitionBy(stratum_col).orderBy(F.asc("_hv"), F.asc(key))
    return (
        pre.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(int(n_per_stratum)))
        .drop("_sn", "_hv", "_rn")
    )


def uncertainty_queue(
    scored: DataFrame,
    k: int,
    prob_col: str = "match_prob",
    id_cols: tuple[str, ...] = ("a_id", "b_id"),
    mode: str = "sort",
) -> DataFrame:
    """Active-learning labeling queue: the k pairs CLOSEST to the
    decision boundary — uncertainty sampling (Lewis & Gale, SIGIR
    1994; in ER: Sarawagi & Bhamidipaty's ALIAS, KDD 2002, and
    Tejada et al. 2001), the standard complement to the stratified
    clerical sample (`sample_for_review` draws representatively;
    this draws where a label buys the most model improvement).

    Uncertainty is 1e6 - |2p - 1| in exact millionth fixed point
    (`uncertainty_fp`, added to the output; p = 0.5 scores the
    maximal 1e6), so ordering is integer-deterministic across
    engines. Selection reuses progressive.select_top_pairs — the
    same sort / radix-threshold machinery and bounds as the
    comparison budget; ties break on ``id_cols``.
    """
    from hamerkop_spark.operators.progressive import select_top_pairs

    margin_fp = F.abs(
        F.floor(
            (F.lit(2.0) * F.col(prob_col) - F.lit(1.0)) * F.lit(1e6)
            + F.lit(0.5)
        ).cast("bigint")
    )
    with_u = scored.withColumn(
        "uncertainty_fp", F.lit(1_000_000).cast("bigint") - margin_fp
    )
    return select_top_pairs(
        with_u, k, weight_col="uncertainty_fp", id_cols=tuple(id_cols),
        mode=mode,
    )


# --------------------------------------------------------------- multi-level


def field_agreement_levels(sim, cuts: tuple[float, ...] = (0.88, 0.95)):
    """Ordinal agreement level from a similarity column (Winkler 1990,
    "String Comparator Metrics and Enhanced Decision Rules in the
    Fellegi-Sunter Model"): binary agree/disagree wastes the signal in
    approximate string matches, so the comparison takes L = len(cuts)+1
    levels — 0 below cuts[0], 1 in [cuts[0], cuts[1]), ..., L-1 at the
    top. Null similarity -> level 0 (conservative, matching
    field_agreement). Pure CASE expression."""
    expr = F.lit(0)
    for i, c in enumerate(cuts):
        expr = F.when(sim >= F.lit(float(c)), F.lit(i + 1)).otherwise(expr)
    return F.when(sim.isNull(), F.lit(0)).otherwise(expr).cast("int")


def fs_level_weight_constants(
    m: dict[str, list[float]], u: dict[str, list[float]]
) -> dict[str, list[int]]:
    """Fixed-point log2 likelihood-ratio weight per (field, level):
    w[f][l] = floor(log2(m[f][l] / u[f][l]) * 1e6 + 0.5). Probability
    vectors are clamped away from 0 and renormalized, so a level never
    observed in one class still gets a finite weight."""
    out = {}
    for f in m:
        mv = [min(max(float(x), _EPS), 1.0) for x in m[f]]
        uv = [min(max(float(x), _EPS), 1.0) for x in u[f]]
        if len(mv) != len(uv):
            raise ValueError(f"level count mismatch for field {f!r}")
        sm, su = sum(mv), sum(uv)
        out[f] = [
            math.floor(math.log2((a / sm) / (b / su)) * FP_SCALE + 0.5)
            for a, b in zip(mv, uv)
        ]
    return out


def fs_match_weight_levels(
    comparisons: DataFrame,
    fields: list[str],
    m: dict[str, list[float]],
    u: dict[str, list[float]],
    weight_col: str = "fs_weight_fp",
) -> DataFrame:
    """Composite Fellegi-Sunter weight over MULTI-LEVEL agreement
    columns (values 0..L_f-1): weight = sum_f w[f][gamma_f], emitted
    fixed-point. Per-row work is an integer CASE-sum per field — same
    codegen shape as the binary fs_match_weight, hash-stable in any
    ANSI engine."""
    consts = fs_level_weight_constants(
        {f: m[f] for f in fields}, {f: u[f] for f in fields}
    )
    expr = None
    for f in fields:
        term = F.lit(consts[f][0])
        for lvl in range(1, len(consts[f])):
            term = F.when(
                F.col(f) == lvl, F.lit(consts[f][lvl])
            ).otherwise(term)
        expr = term if expr is None else expr + term
    return comparisons.withColumn(weight_col, expr.cast("bigint"))


def fit_fs_em_levels(
    comparisons: DataFrame,
    fields: list[str],
    levels: dict[str, int],
    iterations: int = 100,
    init_p: float = 0.1,
    tol: float = 1e-9,
) -> dict:
    """EM for the multi-level Fellegi-Sunter model with categorical
    emissions: P(gamma) = p * prod_f m_f[gamma_f]
                        + (1-p) * prod_f u_f[gamma_f].

    Same scale shape as the binary ``fit_fs_em``: ONE distributed
    groupBy histograms the level-vector patterns (bounded by
    prod_f levels[f] rows, map-side combinable), then numpy EM runs
    driver-side over the count table. The init breaks symmetry by
    making the match class prefer HIGHER levels (linear ramp) — the
    canonical orientation for ordinal agreement, checked and swapped
    after convergence like the binary fit.

    Returns {"p", "m", "u", "n", "iterations", "converged"} with m/u
    as per-field level-probability lists, ready for
    ``fs_match_weight_levels``.
    """
    import numpy as np

    total_patterns = 1
    for f in fields:
        if levels[f] < 2:
            raise ValueError(f"field {f!r} needs >= 2 levels")
        total_patterns *= levels[f]
    if total_patterns > 1_000_000:
        raise ValueError(
            f"pattern space {total_patterns} too large for the "
            "driver-side EM table"
        )
    hist = agreement_pattern_counts(comparisons, fields).collect()
    if not hist:
        raise ValueError("fit_fs_em_levels: empty comparison table")
    gam = np.array([[r[f] for f in fields] for r in hist], dtype=np.int64)
    cnt = np.array([r["n"] for r in hist], dtype=np.float64)
    n_total = float(cnt.sum())

    p = float(init_p)
    m = {}
    u = {}
    for f in fields:
        L = levels[f]
        ramp = np.arange(1, L + 1, dtype=np.float64)
        m[f] = ramp / ramp.sum()          # match class prefers high levels
        u[f] = ramp[::-1] / ramp.sum()    # non-match prefers low levels
    it_done, converged = 0, False
    fi = {f: i for i, f in enumerate(fields)}
    for it in range(iterations):
        log_m = np.zeros(len(hist))
        log_u = np.zeros(len(hist))
        for f in fields:
            log_m += np.log(m[f])[gam[:, fi[f]]]
            log_u += np.log(u[f])[gam[:, fi[f]]]
        a = np.log(p) + log_m
        b = np.log1p(-p) + log_u
        hi = np.maximum(a, b)
        g = np.exp(a - hi) / (np.exp(a - hi) + np.exp(b - hi))
        gm = g * cnt
        gu = (1.0 - g) * cnt
        p_new = min(max(gm.sum() / n_total, _EPS), 1.0 - _EPS)
        delta = abs(p_new - p)
        m_new, u_new = {}, {}
        for f in fields:
            L = levels[f]
            col = gam[:, fi[f]]
            mm = np.array([gm[col == l].sum() for l in range(L)])
            uu = np.array([gu[col == l].sum() for l in range(L)])
            mm = np.clip(mm / max(mm.sum(), _EPS), _EPS, 1.0)
            uu = np.clip(uu / max(uu.sum(), _EPS), _EPS, 1.0)
            mm, uu = mm / mm.sum(), uu / uu.sum()
            delta = max(
                delta,
                float(np.abs(mm - m[f]).max()),
                float(np.abs(uu - u[f]).max()),
            )
            m_new[f], u_new[f] = mm, uu
        p, m, u = p_new, m_new, u_new
        it_done = it + 1
        if delta < tol:
            converged = True
            break
    # canonical orientation: the match class is the one whose expected
    # agreement LEVEL is higher (summed over fields)
    def mean_level(d):
        return sum(
            float((np.arange(len(d[f])) * d[f]).sum()) for f in fields
        )

    if mean_level(m) < mean_level(u):
        m, u, p = u, m, 1.0 - p
    return {
        "p": float(p),
        "m": {f: [float(x) for x in m[f]] for f in fields},
        "u": {f: [float(x) for x in u[f]] for f in fields},
        "n": int(n_total),
        "iterations": it_done,
        "converged": converged,
    }


def group_linkage(
    member_pairs: DataFrame,
    sizes_a: DataFrame | None = None,
    sizes_b: DataFrame | None = None,
    group_a: str = "group_a",
    group_b: str = "group_b",
    a_col: str = "a_id",
    b_col: str = "b_id",
    score_col: str = "score",
    max_rounds: int | None = None,
) -> DataFrame:
    """Group (household) linkage: similarity between record GROUPS as
    the greedy one-to-one bipartite matching of their scored member
    pairs, normalized by the larger group size — On, Koudas, Lee &
    Srivastava 2007 ("Group Linkage", ICDE), with the optimal bipartite
    matching replaced by this engine's distributed greedy 1/2-approx
    (`one_to_one_assignment`, which reproduces sequential greedy
    exactly). The reference links single records; households, author
    groups, and company subsidiaries link as SETS, where per-member
    links double-count and a moved member must not vote twice.

    :param member_pairs: scored member-level candidate pairs carrying
        (group_a, group_b, a_id, b_id, score) — blocked upstream like
        any pair table; this operator never generates pairs.
    :param sizes_a: optional (group_a, n_a) TRUE group sizes; derived
        from the distinct members seen in `member_pairs` when omitted
        (an undercount if some members had no candidates — pass real
        sizes for the published measure).
    :param max_rounds: forwarded to the inner assignment (None =
        fixpoint); the one-to-one constraint is scoped WITHIN each
        (group_a, group_b) pair via composite matching keys, so a
        member may match different counterparts in different candidate
        group pairings.
    :return: one row per candidate group pair:
        (group_a, group_b, n_matched, sum_score, n_a, n_b, group_sim)
        with group_sim = sum_score / greatest(n_a, n_b) — callers
        threshold or feed it to the resolver cascade as a pair score.
    """
    mp = member_pairs.withColumn(
        "_gl", F.struct(F.col(group_a), F.col(group_b), F.col(a_col))
    ).withColumn(
        "_gr", F.struct(F.col(group_a), F.col(group_b), F.col(b_col))
    )
    matched = one_to_one_assignment(
        mp, "_gl", "_gr", score_col, max_rounds=max_rounds
    )
    per_group = matched.groupBy(group_a, group_b).agg(
        F.count("*").alias("n_matched"),
        F.sum(score_col).alias("sum_score"),
    )
    if sizes_a is None:
        sizes_a = (
            member_pairs.select(group_a, a_col).distinct()
            .groupBy(group_a).agg(F.count("*").alias("n_a"))
        )
    if sizes_b is None:
        sizes_b = (
            member_pairs.select(group_b, b_col).distinct()
            .groupBy(group_b).agg(F.count("*").alias("n_b"))
        )
    return (
        per_group.join(sizes_a, group_a)
        .join(sizes_b, group_b)
        .withColumn(
            "group_sim",
            F.col("sum_score") / F.greatest(F.col("n_a"), F.col("n_b")),
        )
        .select(group_a, group_b, "n_matched", "sum_score",
                "n_a", "n_b", "group_sim")
    )
