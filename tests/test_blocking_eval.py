"""Sorted-neighborhood blocking, meta-blocking (CNP), blocking quality
metrics, and Platt calibration (operators/blocking_eval.py, train.py)."""

import math

from pyspark.sql import functions as F

from hamerkop_spark.operators.blocking_eval import (
    blocking_quality,
    global_sorted_rank,
    meta_blocking_cnp,
    sorted_neighborhood_candidates,
    suffix_array_candidates,
)
from hamerkop_spark.operators.train import (
    calibrated_probability,
    calibration_bins,
    fit_platt,
)
from tests.conftest import rows


def test_global_sorted_rank_matches_total_order(spark):
    data = [("m", 3), ("a", 1), ("m", 1), ("z", 9), ("b", 4), ("m", 2)]
    df = spark.createDataFrame(data, "k string, i int")
    got = {
        (r["k"], r["i"]): r["rank"]
        for r in global_sorted_rank(df, ["k", "i"], num_partitions=3).collect()
    }
    expected = {kv: n + 1 for n, kv in enumerate(sorted(data))}
    assert got == expected


def test_global_sorted_rank_empty(spark):
    df = spark.createDataFrame([], "k string, i int")
    assert global_sorted_rank(df, ["k", "i"]).count() == 0


def test_sorted_neighborhood_pairs_exact(spark):
    recs = [(i, key) for i, key in enumerate(["ann", "anna", "bob", "bobby", "carl", "carla"])]
    df = spark.createDataFrame(recs, "rid int, name string")
    got = rows(
        sorted_neighborhood_candidates(df, "name", "rid", window=3),
        "a_id", "b_id", "rank_dist",
    )
    order = [r[0] for r in sorted(recs, key=lambda r: (r[1], r[0]))]
    expected = sorted(
        (order[i], order[i + d], d)
        for i in range(len(order))
        for d in (1, 2)
        if i + d < len(order)
    )
    assert got == expected
    # output size is key-distribution independent: (w-1)*n - tail
    assert len(got) == 2 * len(recs) - 3


def test_meta_blocking_purges_and_weights(spark):
    # block "hot" exceeds max_block_size and must not contribute pairs;
    # (1,2) share two surviving blocks -> cbs 2; (1,3)/(2,3) share one.
    blocks = [("x", 1), ("x", 2), ("y", 1), ("y", 2), ("y", 3)] + [
        ("hot", i) for i in range(1, 8)
    ]
    df = spark.createDataFrame(blocks, "block_key string, record_id int")
    got = rows(
        meta_blocking_cnp(df, top_k=5, max_block_size=5), "a_id", "b_id", "cbs"
    )
    assert got == [(1, 2, 2), (1, 3, 1), (2, 3, 1)]


def test_meta_blocking_cnp_topk_union(spark):
    # node 0 co-blocks with 1..4 at weights 4,3,2,1 (via distinct keys);
    # top_k=2 keeps 0's edges to 1 and 2 — but the edge (0,3) survives
    # via node 3's own top-k (3 has only one neighbour), CNP union rule.
    blocks = []
    for nbr, w in [(1, 4), (2, 3), (3, 2)]:
        for j in range(w):
            blocks.append((f"k{nbr}_{j}", 0))
            blocks.append((f"k{nbr}_{j}", nbr))
    df = spark.createDataFrame(blocks, "block_key string, record_id int")
    got = rows(meta_blocking_cnp(df, top_k=2), "a_id", "b_id", "cbs")
    assert got == [(0, 1, 4), (0, 2, 3), (0, 3, 2)]


def test_blocking_quality_metrics(spark):
    cand = spark.createDataFrame(
        [(1, 2, "s1"), (3, 4, "s1"), (2, 1, "s1"), (5, 6, "s2")],
        "a_id int, b_id int, source string",
    )
    gold = spark.createDataFrame([(2, 1), (5, 6), (7, 8)], "a_id int, b_id int")
    got = {
        r["source"]: r
        for r in blocking_quality(cand, gold, total_possible_pairs=100).collect()
    }
    s1 = got["s1"]  # dedup (1,2)/(2,1) -> 2 candidates, 1 tp
    assert (s1["n_candidates"], s1["n_true_positives"], s1["n_gold"]) == (2, 1, 3)
    assert s1["pc_fp"] == math.floor(1 / 3 * 1e6 + 0.5)
    assert s1["pq_fp"] == 500000
    assert s1["rr_fp"] == math.floor((1 - 2 / 100) * 1e6 + 0.5)
    al = got["__all__"]
    assert (al["n_candidates"], al["n_true_positives"]) == (3, 2)


def test_fit_platt_calibrates_separable_scores(spark):
    pts = [(float(s), 1 if s > 0 else 0) for s in range(-20, 21) if s != 0]
    df = spark.createDataFrame(pts * 5, "score double, label int")
    m = fit_platt(df, iterations=200)
    assert m["a"] > 0 and m["n"] == len(pts) * 5
    probe = spark.createDataFrame(
        [(-10.0,), (0.0,), (10.0,)], "score double"
    ).select(calibrated_probability("score", m["a"], m["b"]).alias("p"))
    lo, mid, hi = [r["p"] for r in probe.collect()]
    assert lo < 0.2 and hi > 0.8 and lo < mid < hi
    # smoothing keeps the fit off the saturation rails
    assert 0.001 < lo and hi < 0.999


def test_calibration_bins_exact(spark):
    data = [(0.05, 0), (0.08, 1), (0.55, 1), (0.52, 0), (0.58, 1), (0.99, 1)]
    df = spark.createDataFrame(data, "prob double, label int")
    got = rows(
        calibration_bins(df, n_bins=10), "bin", "n", "n_pos",
        "mean_prob_fp", "pos_rate_fp",
    )
    assert got == [
        (0, 2, 1, 65000, 500000),
        (5, 3, 2, 550000, 666666),
        (9, 1, 1, 990000, 1000000),
    ]


def test_calibrate_linear_scores_e2e(spark, tmp_path):
    """North-rule 'calibrated logistic-combination match decision':
    Platt-calibrate the flagship linear scorer on pipeline-produced
    labeled pairs and check the reliability audit comes back sane."""
    from hamerkop_spark.operators.train import (
        calibrate_linear_scores,
        training_rows_from_gold,
    )
    from hamerkop_spark.plans.pipeline import (
        DEFAULT_BIAS,
        DEFAULT_WEIGHTS,
        run_pipeline,
    )
    from hamerkop_spark.synth import make_corpus

    c = make_corpus(spark, n_docs=30, seed=21, misspell_prob=0.3)
    r = run_pipeline(spark, c, str(tmp_path / "cal"), resume=False)
    labeled = training_rows_from_gold(
        r["scored_pairs"], c["ground_truth"], r["mentions_chained"]
    )
    audit = calibrate_linear_scores(labeled, DEFAULT_WEIGHTS, DEFAULT_BIAS)
    assert audit["a"] > 0 and audit["n"] > 100
    # calibrated probabilities track observed match rates
    assert audit["ece"] < 0.15, audit
    # bins table is the fixed-point reliability diagram
    assert all(0 <= b["bin"] <= 9 for b in audit["bins"])
    assert sum(b["n"] for b in audit["bins"]) == audit["n"]


def test_sn_local_equals_join_strategy(spark):
    import random

    rng = random.Random(5)
    recs = [(i, f"k{rng.randrange(7)}") for i in range(500)]
    df = spark.createDataFrame(recs, "rid int, name string").repartition(13)
    cols = ("a_id", "b_id", "a_key", "b_key", "rank_dist")
    local = rows(
        sorted_neighborhood_candidates(df, "name", "rid", window=6), *cols
    )
    join = rows(
        sorted_neighborhood_candidates(
            df, "name", "rid", window=6, strategy="join"
        ),
        *cols,
    )
    assert local == join
    assert len(local) == 5 * 500 - 15


def test_sn_local_short_and_empty_partitions(spark):
    # more partitions than rows: the boundary walk must cross several
    # short/empty partitions to find each tail row's true successors
    df = spark.createDataFrame([(i, "x") for i in range(7)], "rid int, name string")
    got = rows(
        sorted_neighborhood_candidates(
            df, "name", "rid", window=5, num_partitions=16
        ),
        "a_id", "b_id", "rank_dist",
    )
    expected = sorted(
        (i, j, j - i) for i in range(7) for j in range(i + 1, min(i + 5, 7))
    )
    assert got == expected


def test_sn_local_multi_arrow_batch(spark):
    # force multiple Arrow batches per partition: the carry buffer must
    # stitch pairs across batch boundaries
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        df = spark.createDataFrame(
            [(i, f"g{i % 3}") for i in range(200)], "rid int, name string"
        )
        got = rows(
            sorted_neighborhood_candidates(
                df, "name", "rid", window=4, num_partitions=2
            ),
            "a_id", "b_id", "rank_dist",
        )
        order = [r[0] for r in sorted([(i, f"g{i % 3}") for i in range(200)],
                                      key=lambda r: (r[1], r[0]))]
        expected = sorted(
            (order[i], order[i + d], d)
            for i in range(200)
            for d in (1, 2, 3)
            if i + d < 200
        )
        assert got == expected
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_sn_local_correct_under_union_self_reference(spark):
    # regression: TaskContext.partitionId() is stage-local, so a union
    # embedding the SN subtree twice used to offset the second branch's
    # ids and break its boundary pairs (blocking_quality __all__ path)
    df = spark.createDataFrame(
        [(i, f"g{i % 5}") for i in range(300)], "rid int, name string"
    ).repartition(11)
    sn = sorted_neighborhood_candidates(df, "name", "rid", window=4).select(
        "a_id", "b_id"
    )
    doubled = sn.unionByName(sn)
    assert doubled.distinct().count() == 3 * 300 - 6
    assert doubled.count() == 2 * (3 * 300 - 6)


def test_suffix_array_exact_small(spark):
    # min_suffix_len=3: maria -> {maria, aria, ria}; aria -> {aria, ria};
    # ria -> {ria}; bob -> {bob}. Blocks: aria={1,2}, ria={1,2,3}.
    df = spark.createDataFrame(
        [(1, "maria"), (2, "aria"), (3, "ria"), (4, "bob")],
        "rid int, name string",
    )
    got = rows(
        suffix_array_candidates(df, "name", "rid", min_suffix_len=3),
        "a_id", "b_id", "n_shared",
    )
    assert got == [(1, 2, 2), (1, 3, 1), (2, 3, 1)]


def test_suffix_array_hot_suffix_purged(spark):
    # 12 records share every suffix of 'commonend' but nothing else;
    # cap 10 purges all those blocks -> zero pairs survive
    # per-record letter prefixes share no characters, so the ONLY
    # cross-record suffixes are substrings of 'commonend'
    df = spark.createDataFrame(
        [(i, f"{chr(97 + i) * 2}commonend") for i in range(12)],
        "rid int, name string",
    )
    out = suffix_array_candidates(
        df, "name", "rid", min_suffix_len=3, max_block_size=10
    )
    assert out.count() == 0


def test_suffix_array_short_keys_use_whole_key(spark):
    # keys shorter than min_suffix_len block on the whole key instead
    # of dropping out
    df = spark.createDataFrame(
        [(1, "ab"), (2, "ab"), (3, "xy")], "rid int, name string"
    )
    got = rows(
        suffix_array_candidates(df, "name", "rid", min_suffix_len=5),
        "a_id", "b_id", "n_shared",
    )
    assert got == [(1, 2, 1)]


def test_suffix_array_survives_prefix_damage_where_sn_fails(spark):
    # the documented claim: head-of-key damage (truncation, dropped
    # honorific) leaves suffixes intact, so suffix blocking keeps the
    # true pair while a sort-order neighborhood loses it
    syll = ["kar", "mol", "vet", "san", "bor", "lim", "tos", "rud"]
    base = [
        syll[i % 8] + syll[(i * 3 + 1) % 8] + syll[(i * 5 + 2) % 8] + f"{i:04d}"
        for i in range(120)
    ]
    recs = [(i, nm) for i, nm in enumerate(base)] + [
        (1000 + i, nm[2:]) for i, nm in enumerate(base)  # head-damaged dup
    ]
    df = spark.createDataFrame(recs, "rid int, name string")
    gold = {(i, 1000 + i) for i in range(120)}

    sa = {
        (a, b)
        for a, b in rows(
            suffix_array_candidates(
                df, "name", "rid", min_suffix_len=5, max_block_size=200
            ),
            "a_id", "b_id",
        )
    }
    sa_recall = len(sa & gold) / len(gold)
    assert sa_recall == 1.0  # the digit tail is a shared suffix by construction

    sn = {
        (min(a, b), max(a, b))
        for a, b in rows(
            sorted_neighborhood_candidates(df, "name", "rid", window=4),
            "a_id", "b_id",
        )
    }
    sn_recall = len(sn & gold) / len(gold)
    assert sn_recall < 0.5  # head damage scatters the dup in sort order
