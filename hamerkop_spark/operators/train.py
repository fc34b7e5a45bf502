"""Calibrate the logistic match decision from labeled pairs
(north_rule: "calibrated logistic-combination match decision";
reference analog: SvmResolver's trained model, resolver.py:325-343,
fed by FeatureRecorder rows, resolver.py:157-189).

Training data = the R8 FeatureRecorder output (features.
record_labeled_pairs): one row per (chain, candidate) with feature
columns and label 1 iff the candidate is a gold link. The model is a
plain logistic regression; two equivalent fit paths share one
update rule:

  * `fit_logistic` — numpy full-batch gradient descent after a driver
    collect; right when labeled supervision is small (the reference's
    sklearn fit is equally in-memory, resolver.py:337-343);
  * `fit_logistic_distributed` — the SAME full-batch updates with the
    per-iteration gradient computed as ONE Spark aggregation
    (sum((p - y) * x_i) is a map-side-combinable agg over the cached
    feature table): no row ever reaches the driver, so a labeled-pair
    table that grows with the corpus (R8 emits one row per candidate
    pair with gold) trains at any scale. Everything stays JVM-side —
    the sigmoid/standardization are codegen'd column expressions, not
    UDFs; the driver holds only (d+1) floats per iteration.

`fit_logistic` auto-delegates to the distributed path above
`driver_collect_limit` rows, so no caller can accidentally
`toPandas()` a 10M-row table. Scoring stays a native column
expression either way (no model object shipped to executors).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed-point scale shared by calibration_bins / calibrate_linear_scores
FP_SCALE = 1_000_000


def fit_logistic(
    labeled: DataFrame,
    feature_cols: list[str],
    iterations: int = 400,
    lr: float = 0.5,
    l2: float = 1e-3,
    seed: int = 7,
    driver_collect_limit: int = 1_000_000,
) -> dict:
    """Fit w, b on (feature_cols..., label) rows; returns
    {"weights": {col: w}, "bias": b, "n": rows, "train_accuracy": acc}.

    Deterministic: fixed init, full-batch gradient descent. Inputs
    larger than `driver_collect_limit` rows take the distributed
    gradient path instead of collecting (same updates, same answer to
    float-noise tolerance)."""
    # bounded guard scan: limit(k+1).count() stops reading at k+1 rows
    # instead of executing the full upstream lineage twice (once for a
    # bare count, once for the collect/fit that follows)
    if labeled.limit(driver_collect_limit + 1).count() > driver_collect_limit:
        return fit_logistic_distributed(
            labeled, feature_cols, iterations, lr, l2, seed
        )
    pdf = labeled.select(*feature_cols, "label").toPandas()
    X = pdf[feature_cols].to_numpy(dtype=np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)
    n, d = X.shape
    # standardize for conditioning; fold back into raw-space weights
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    rng = np.random.RandomState(seed)
    w = rng.normal(0, 0.01, d)
    b = 0.0
    for _ in range(iterations):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        w -= lr * (Xs.T @ g / n + l2 * w)
        b -= lr * g.mean()
    # raw-space: score = sum(w_i/sd_i * x_i) + (b - sum(w_i*mu_i/sd_i))
    w_raw = w / sd
    b_raw = float(b - np.sum(w * mu / sd))
    preds = (Xs @ w + b) > 0
    acc = float((preds == (y > 0.5)).mean())
    return {
        "weights": {c: float(wi) for c, wi in zip(feature_cols, w_raw)},
        "bias": b_raw,
        "n": int(n),
        "train_accuracy": acc,
    }


def fit_logistic_distributed(
    labeled: DataFrame,
    feature_cols: list[str],
    iterations: int = 400,
    lr: float = 0.5,
    l2: float = 1e-3,
    seed: int = 7,
) -> dict:
    """`fit_logistic` without the driver collect: identical full-batch
    updates, each iteration's gradient computed by one Spark job.

    Per iteration, with current (w, b) injected as literals:

        z   = sum_i w_i * (x_i - mu_i) / sd_i + b      (codegen'd)
        p   = sigmoid(clip(z, ±30))
        agg = [ sum((p-y) * xs_i) for i ] + [ sum(p-y), sum(correct) ]

    — (d + 2) map-side-combinable sums over the cached projection, so
    shuffle volume per iteration is (d + 2) doubles per task, never
    rows. Standardization (mu, sd) is the pandas path's two-pass
    population std, computed as two aggregations up front. 400
    iterations = 400 small jobs over a cached table: latency-bound on
    a quiet cluster, and the honest scale shape — gradients have no
    sufficient statistics to shortcut."""
    proj = labeled.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col("label").cast("double").alias("label"),
    ).persist()
    try:
        n = proj.count()
        d = len(feature_cols)
        stats = proj.agg(
            *[F.avg(c).alias(f"mu{i}") for i, c in enumerate(feature_cols)]
        ).first()
        mu = np.array([stats[f"mu{i}"] for i in range(d)])
        var = proj.agg(
            *[
                F.avg(F.pow(F.col(c) - F.lit(float(mu[i])), 2)).alias(f"v{i}")
                for i, c in enumerate(feature_cols)
            ]
        ).first()
        sd = np.sqrt(np.array([var[f"v{i}"] for i in range(d)]))
        sd[sd == 0] = 1.0

        xs = [
            (F.col(c) - F.lit(float(mu[i]))) / F.lit(float(sd[i]))
            for i, c in enumerate(feature_cols)
        ]
        rng = np.random.RandomState(seed)
        w = rng.normal(0, 0.01, d)
        b = 0.0

        def z_expr():
            z = F.lit(float(b))
            for i in range(d):
                z = z + F.lit(float(w[i])) * xs[i]
            return z

        def p_expr():
            zc = F.greatest(F.least(z_expr(), F.lit(30.0)), F.lit(-30.0))
            return F.lit(1.0) / (F.lit(1.0) + F.exp(-zc))

        for _ in range(iterations):
            g = p_expr() - F.col("label")
            row = proj.agg(
                *[F.sum(g * xs[i]).alias(f"g{i}") for i in range(d)],
                F.sum(g).alias("gb"),
            ).first()
            grad = np.array([row[f"g{i}"] for i in range(d)]) / n
            w = w - lr * (grad + l2 * w)
            b = b - lr * (row["gb"] / n)

        correct = (
            (z_expr() > 0).cast("double") == (F.col("label") > 0.5).cast("double")
        )
        acc_row = proj.agg(F.avg(correct.cast("double")).alias("acc")).first()
        w_raw = w / sd
        b_raw = float(b - np.sum(w * mu / sd))
        return {
            "weights": {c: float(wi) for c, wi in zip(feature_cols, w_raw)},
            "bias": b_raw,
            "n": int(n),
            "train_accuracy": float(acc_row["acc"]),
        }
    finally:
        proj.unpersist()


def training_rows_from_gold(
    scored_pairs: DataFrame, ground_truth: DataFrame, mentions_chained: DataFrame
) -> DataFrame:
    """R8 end-to-end: attach gold labels to the scored-pairs table via
    the parsed ground truth (features.record_labeled_pairs plumbing)."""
    from hamerkop_spark.operators.features import record_labeled_pairs
    from hamerkop_spark.sources.output import parse_ground_truth

    gt = parse_ground_truth(ground_truth)
    chained = mentions_chained.select(
        "doc_id", "char_start", "char_stop", "chain_id"
    )
    gold = gt.join(chained, ["doc_id", "char_start", "char_stop"]).select(
        "doc_id", "chain_id", "link_type", "gold_links"
    ).dropDuplicates(["doc_id", "chain_id"])
    return record_labeled_pairs(scored_pairs, gold)


def tune_margin(
    labeled: DataFrame,
    weights: dict[str, float],
    bias: float,
    threshold: float,
    margins: tuple = (0.0, 0.1, 0.25, 0.5, 0.75, 1.0),
) -> dict:
    """Pick the linear resolver's ambiguity margin from labeled pairs.

    One distributed pass builds the per-chain decision surface — top-1
    score, top-1 label, and the gap to the runner-up (the exact
    quantities linear_resolver(margin=...) gates on) — then every
    candidate margin is evaluated from conditional aggregates over that
    one small table: no per-margin re-scoring, no driver-side loop over
    rows. Decision-level metrics: precision = correct links / links
    made, recall = correct links / chains that have a gold entity.

    Returns {"best_margin", "results": [{margin, precision, recall,
    f1, decided}, ...]} with ties broken toward the SMALLER margin
    (less abstention at equal F1).

    Scope note: this optimizes the LINEAR STAGE's decision F1, which
    counts every abstention as a miss. End-to-end pairwise F1 is softer
    on abstention — an abstained chain still clusters through the
    NIL-name path — so the pipeline-level optimum can sit at a larger
    margin than the tuner's (measured: tuner 0.0 vs e2e 0.25 on the
    100x noisy corpus, BASELINE.md). Use the tuner's pick as the
    conservative floor and the e2e sweep for the final knob."""
    from pyspark.sql import Window

    score = F.lit(float(bias))
    for col, wgt in weights.items():
        score = score + F.lit(float(wgt)) * F.col(col)
    chain = ["doc_id", "chain_id"]
    w = Window.partitionBy(*chain).orderBy(
        F.desc("match_score"), F.col("entity_id")
    )
    ranked = (
        labeled.withColumn("match_score", score)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("next_score", F.lead("match_score").over(w))
        .withColumn("has_gold", F.max("label").over(Window.partitionBy(*chain)))
    )
    top = ranked.where(F.col("rn") == 1).select(
        "match_score",
        F.coalesce(
            F.col("match_score") - F.col("next_score"), F.lit(float("inf"))
        ).alias("gap"),
        F.col("label").alias("top_label"),
        "has_gold",
    )
    aggs = [F.sum("has_gold").alias("n_gold")]
    for i, m in enumerate(margins):
        decided = (F.col("match_score") >= threshold) & (F.col("gap") >= m)
        aggs.append(F.sum(decided.cast("int")).alias(f"d{i}"))
        aggs.append(
            F.sum((decided & (F.col("top_label") == 1)).cast("int")).alias(
                f"c{i}"
            )
        )
    row = top.agg(*aggs).collect()[0]
    n_gold = row["n_gold"] or 0  # empty input aggregates to NULLs
    results = []
    for i, m in enumerate(margins):
        dec, cor = row[f"d{i}"] or 0, row[f"c{i}"] or 0
        p = cor / dec if dec else 0.0
        r = cor / n_gold if n_gold else 0.0
        f1 = 2 * p * r / (p + r) if (p + r) else 0.0
        results.append(
            {"margin": float(m), "precision": p, "recall": r, "f1": f1,
             "decided": int(dec)}
        )
    best = max(results, key=lambda x: (x["f1"], -x["margin"]))
    return {"best_margin": best["margin"], "results": results}


def fit_platt(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    smooth: bool = True,
    **fit_kw,
) -> dict:
    """Platt scaling (Platt 1999): map a raw match score s to a
    calibrated probability sigmoid(a*s + b) by fitting a 1-D logistic
    regression on labeled pairs.

    `smooth=True` applies Platt's out-of-sample target regularization —
    positives train toward (N+ + 1)/(N+ + 2) and negatives toward
    1/(N- + 2) instead of hard {0,1} — which keeps the MAP fit from
    saturating on separable score distributions (the common case for a
    well-tuned linear ranker, resolve.py linear_match_score).

    Reuses `fit_logistic`, so small labeled sets fit on the driver and
    corpus-scale ones take the distributed gradient path automatically;
    gradients are identical because d/dz BCE(p, t) = p - t holds for
    soft targets too. Returns {"a", "b", "n", "train_accuracy"}.
    """
    base = scored.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("double").alias("label"),
    )
    if smooth:
        row = base.agg(
            F.sum(F.when(F.col("label") > 0.5, 1).otherwise(0)).alias("np"),
            F.count("*").alias("n"),
        ).collect()[0]
        n_pos = row["np"] or 0
        n_neg = (row["n"] or 0) - n_pos
        t_pos = (n_pos + 1.0) / (n_pos + 2.0)
        t_neg = 1.0 / (n_neg + 2.0)
        base = base.withColumn(
            "label",
            F.when(F.col("label") > 0.5, F.lit(t_pos)).otherwise(F.lit(t_neg)),
        )
    m = fit_logistic(base, ["s"], **fit_kw)
    return {
        "a": m["weights"]["s"],
        "b": m["bias"],
        "n": m["n"],
        "train_accuracy": m["train_accuracy"],
    }


def calibrated_probability(score_col, a: float, b: float):
    """Column expression sigmoid(clip(a*s + b, ±30)) — same clipping as
    training, all codegen'd (no UDF)."""
    z = F.lit(float(a)) * F.col(score_col) + F.lit(float(b))
    z = F.greatest(F.lit(-30.0), F.least(F.lit(30.0), z))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def calibration_bins(
    scored: DataFrame,
    prob_col: str = "prob",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table: bucket predicted probabilities into
    `n_bins` equal-width bins and compare mean prediction with observed
    positive rate per bin — the standard calibration audit (and the
    input to ECE = sum_b n_b/N * |mean_p_b - pos_rate_b|).

    To stay hash-stable across engines, probabilities are fixed-pointed
    first (floor(p*1e6 + 0.5) as BIGINT): the bin id, the per-bin sum
    and the derived means are then exact integer arithmetic — float
    SUM order never enters. Output: (bin, n, n_pos, mean_prob_fp,
    pos_rate_fp), one shuffle (groupBy bin, map-side combinable).
    """
    p_fp = F.floor(
        F.col(prob_col).cast("double") * F.lit(1e6) + F.lit(0.5)
    ).cast("bigint")
    step = int(1_000_000 // n_bins)
    binned = scored.select(
        F.least(
            F.lit(n_bins - 1), F.floor(p_fp / F.lit(step)).cast("int")
        ).alias("bin"),
        p_fp.alias("p_fp"),
        F.col(label_col).cast("bigint").alias("label"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("label").alias("n_pos"),
            F.floor(F.sum("p_fp") / F.count("*")).cast("bigint").alias(
                "mean_prob_fp"
            ),
            F.floor(F.sum("label") * F.lit(1_000_000) / F.count("*"))
            .cast("bigint")
            .alias("pos_rate_fp"),
        )
    )


def calibrate_linear_scores(
    labeled: DataFrame,
    weights: dict[str, float],
    bias: float,
    n_bins: int = 10,
    **fit_kw,
) -> dict:
    """End-to-end calibration audit of the pipeline's linear match
    scorer (the north rule's "calibrated logistic-combination match
    decision"): score labeled pairs with the same literal-weight column
    expression linear_resolver uses, Platt-fit score -> probability,
    then measure expected calibration error from the reliability bins.

    Returns {"a", "b", "ece", "n", "bins"} where ece =
    sum_b n_b/N * |mean_prob_b - pos_rate_b| over non-empty bins (both
    in probability units). Two distributed passes (one Platt fit, one
    bin aggregate); everything else is per-bin driver arithmetic.
    """
    score = F.lit(float(bias))
    for col, wgt in weights.items():
        score = score + F.lit(float(wgt)) * F.col(col)
    scored = labeled.withColumn("match_score", score)
    platt = fit_platt(scored, score_col="match_score", **fit_kw)
    probed = scored.select(
        calibrated_probability("match_score", platt["a"], platt["b"]).alias(
            "prob"
        ),
        F.col("label"),
    )
    bins = sorted(
        (r.asDict() for r in calibration_bins(probed, n_bins=n_bins).collect()),
        key=lambda r: r["bin"],
    )
    n = sum(b["n"] for b in bins)
    ece = (
        sum(
            b["n"] * abs(b["mean_prob_fp"] - b["pos_rate_fp"])
            for b in bins
        )
        / (n * float(FP_SCALE))
        if n
        else 0.0
    )
    return {"a": platt["a"], "b": platt["b"], "ece": ece, "n": n, "bins": bins}
