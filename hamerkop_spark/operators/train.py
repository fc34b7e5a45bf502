"""Calibrate the logistic match decision from labeled pairs
(north_rule: "calibrated logistic-combination match decision";
reference analog: SvmResolver's trained model, resolver.py:325-343,
fed by FeatureRecorder rows, resolver.py:157-189).

Training data = the R8 FeatureRecorder output (features.
record_labeled_pairs): one row per (chain, candidate) with feature
columns and label 1 iff the candidate is a gold link. The model is a
plain logistic regression fit driver-side with numpy gradient descent —
labeled supervision is tiny relative to the corpus (sample if not), so
collecting it is the right boundary; scoring stays a native column
expression (no model object shipped to executors).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_logistic(
    labeled: DataFrame,
    feature_cols: list[str],
    iterations: int = 400,
    lr: float = 0.5,
    l2: float = 1e-3,
    seed: int = 7,
) -> dict:
    """Fit w, b on (feature_cols..., label) rows; returns
    {"weights": {col: w}, "bias": b, "n": rows, "train_accuracy": acc}.

    Deterministic: fixed init, full-batch gradient descent.
    """
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
