"""Calibrated logistic match decision: FeatureRecorder rows -> trained
weights -> held-out pipeline F1 (the north_rule's 'calibrated
logistic-combination' end-to-end)."""

import pytest

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


def test_tune_margin_picks_gap_that_separates_ambiguity(spark):
    """Chains where two candidates score equally (top is WRONG half the
    time) are pure precision loss at margin 0; the tuner must pick a
    margin big enough to abstain on them but small enough to keep the
    clean chains' links."""
    from hamerkop_spark.operators.train import tune_margin

    rows = []
    # 10 clean chains: gold candidate scores 1.0, runner-up 0.0
    for i in range(10):
        rows.append((f"d", f"clean{i}", "G", 1.0, 1))
        rows.append((f"d", f"clean{i}", "X", 0.0, 0))
    # 10 ambiguous chains: two candidates at 1.0, top (by id) is wrong
    for i in range(10):
        rows.append((f"d", f"amb{i}", "A", 1.0, 0))
        rows.append((f"d", f"amb{i}", "B", 1.0, 1))
    labeled = spark.createDataFrame(
        rows, "doc_id string, chain_id string, entity_id string, "
              "f_s double, label int"
    )
    out = tune_margin(
        labeled, weights={"f_s": 1.0}, bias=0.0, threshold=0.5,
        margins=(0.0, 0.5),
    )
    # margin 0: 20 decided, 10 correct -> P 0.5, R 0.5, F1 0.5
    # margin 0.5: 10 decided (clean only), all correct -> P 1, R 0.5, F1 2/3
    by_m = {r["margin"]: r for r in out["results"]}
    assert by_m[0.0]["precision"] == pytest.approx(0.5)
    assert by_m[0.5]["precision"] == pytest.approx(1.0)
    assert by_m[0.5]["recall"] == pytest.approx(0.5)
    assert out["best_margin"] == 0.5


def test_tune_margin_prefers_smaller_margin_on_ties(spark):
    """With no ambiguity, every margin below the clean gap has equal F1
    — the tuner must return the smallest."""
    from hamerkop_spark.operators.train import tune_margin

    rows = [("d", "c1", "G", 1.0, 1), ("d", "c1", "X", 0.0, 0)]
    labeled = spark.createDataFrame(
        rows, "doc_id string, chain_id string, entity_id string, "
              "f_s double, label int"
    )
    out = tune_margin(
        labeled, weights={"f_s": 1.0}, bias=0.0, threshold=0.5,
        margins=(0.0, 0.25, 0.5),
    )
    assert out["best_margin"] == 0.0


def test_fit_logistic_distributed_matches_pandas_path(spark, tmp_path):
    """VERDICT r3 #2: the distributed gradient path (one Spark agg per
    iteration, no driver materialization of rows) must reproduce the
    numpy path's weights to float-noise tolerance on the acceptance
    corpus, and auto-engage via driver_collect_limit."""
    from hamerkop_spark.operators.train import fit_logistic_distributed

    feats = list(STANDARD_FEATURES)
    train_c = make_corpus(spark, n_docs=30, seed=21, misspell_prob=0.3)
    tr = run_pipeline(spark, train_c, str(tmp_path / "train"), resume=False)
    labeled = training_rows_from_gold(
        tr["scored_pairs"], train_c["ground_truth"], tr["mentions_chained"]
    )
    m_np = fit_logistic(labeled, feats, iterations=120)
    m_sp = fit_logistic_distributed(labeled, feats, iterations=120)
    assert m_sp["n"] == m_np["n"]
    for c in feats:
        assert abs(m_sp["weights"][c] - m_np["weights"][c]) < 1e-9, (
            c, m_sp["weights"][c], m_np["weights"][c]
        )
    assert abs(m_sp["bias"] - m_np["bias"]) < 1e-9
    assert m_sp["train_accuracy"] == m_np["train_accuracy"]

    # limit below n forces fit_logistic itself onto the distributed path
    m_auto = fit_logistic(labeled, feats, iterations=120,
                          driver_collect_limit=10)
    for c in feats:
        assert abs(m_auto["weights"][c] - m_sp["weights"][c]) < 1e-12
