"""Calibrated logistic match decision: FeatureRecorder rows -> trained
weights -> held-out pipeline F1 (the north_rule's 'calibrated
logistic-combination' end-to-end)."""

from hamerkop_spark.operators.features import STANDARD_FEATURES
from hamerkop_spark.operators.train import fit_logistic, training_rows_from_gold
from hamerkop_spark.plans.pipeline import evaluate_pipeline, run_pipeline
from hamerkop_spark.synth import make_corpus


def test_trained_weights_generalize(spark, tmp_path):
    feats = list(STANDARD_FEATURES)
    train_c = make_corpus(spark, n_docs=30, seed=21, misspell_prob=0.3)
    tr = run_pipeline(spark, train_c, str(tmp_path / "train"), resume=False)
    labeled = training_rows_from_gold(
        tr["scored_pairs"], train_c["ground_truth"], tr["mentions_chained"]
    )
    model = fit_logistic(labeled, feats)
    assert model["n"] > 100
    assert model["train_accuracy"] >= 0.95
    # string-similarity features must carry the signal
    assert model["weights"]["f_jaro_winkler"] > 0
    assert model["weights"]["f_levenshtein"] < 0

    test_c = make_corpus(spark, n_docs=30, seed=77, misspell_prob=0.3)
    res = run_pipeline(
        spark, test_c, str(tmp_path / "test"), resume=False,
        weights=model["weights"], bias=model["bias"], threshold=0.0,
    )
    ev = evaluate_pipeline(res, test_c["labeled_pairs"])
    assert ev.tp + ev.fn > 0
    assert ev.f1 >= 0.99, ev


def test_fit_logistic_deterministic(spark):
    rows = [(float(i % 2), float((i * 7) % 3) / 3, i % 2) for i in range(60)]
    df = spark.createDataFrame(rows, "a double, b double, label int")
    m1 = fit_logistic(df, ["a", "b"], iterations=100)
    m2 = fit_logistic(df, ["a", "b"], iterations=100)
    assert m1 == m2
    assert m1["weights"]["a"] > 0  # a == label perfectly
