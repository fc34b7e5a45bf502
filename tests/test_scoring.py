"""Eval metrics: pairwise F1, MUC, B3 (values mirror the reference's
tests/test_coref.py math), candidate recall, resolver report."""

import math

import pytest

from hamerkop_spark.operators import scoring as SC


def assign(spark, pairs):
    return spark.createDataFrame(pairs, "mention_id string, cluster string")


def test_pairwise_f1_perfect(spark):
    a = assign(spark, [("m1", "c1"), ("m2", "c1"), ("m3", "c2")])
    lp = spark.createDataFrame(
        [("m1", "m2", "k", 1), ("m1", "m3", "k", 0)],
        "key_a string, key_b string, block_key string, label int",
    )
    r = SC.pairwise_f1(a, lp)
    assert (r.precision, r.recall, r.f1) == (1.0, 1.0, 1.0)


def test_pairwise_f1_mixed(spark):
    # predicted merges m1,m2,m3; truth: only m1-m2 same
    a = assign(spark, [("m1", "c"), ("m2", "c"), ("m3", "c")])
    lp = spark.createDataFrame(
        [("m1", "m2", "k", 1), ("m1", "m3", "k", 0), ("m2", "m3", "k", 0)],
        "key_a string, key_b string, block_key string, label int",
    )
    r = SC.pairwise_f1(a, lp)
    assert r.precision == pytest.approx(1 / 3)
    assert r.recall == 1.0


def clus(spark, pairs):
    return spark.createDataFrame(pairs, "mention_key string, cluster string")


def test_muc_identical(spark):
    pred = clus(spark, [("a", "1"), ("b", "1"), ("c", "2"), ("d", "2")])
    r = SC.muc(pred, pred)
    assert (r.precision, r.recall, r.f1) == (1.0, 1.0, 1.0)


def test_muc_one_merge_error(spark):
    # gold: {a,b},{c,d}; pred: {a,b,c,d} — MUC: p_num=4-2=2, p_den=3,
    # r_num=(2-1)+(2-1)=2, r_den=2 -> P=2/3, R=1
    pred = clus(spark, [("a", "1"), ("b", "1"), ("c", "1"), ("d", "1")])
    gold = clus(spark, [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")])
    r = SC.muc(pred, gold)
    assert r.precision == pytest.approx(2 / 3)
    assert r.recall == pytest.approx(1.0)


def test_b3_identical_multi(spark):
    pred = clus(spark, [("a", "1"), ("b", "1"), ("c", "2"), ("d", "2")])
    r = SC.b3(pred, pred)
    assert (r.precision, r.recall) == (1.0, 1.0)


def test_b3_merge_error(spark):
    # pred {a,b,c,d}, gold {a,b},{c,d}:
    # precision: (2^2 + 2^2)/4 / 4 = 2/4 = 0.5 ; recall: each gold cluster
    # num=(2^2)/2=2 -> (2+2)/4 = 1.0
    pred = clus(spark, [("a", "1"), ("b", "1"), ("c", "1"), ("d", "1")])
    gold = clus(spark, [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")])
    r = SC.b3(pred, gold)
    assert r.precision == pytest.approx(0.5)
    assert r.recall == pytest.approx(1.0)


def test_candidate_recall(spark):
    cands = spark.createDataFrame(
        [("d1", "c1", "E1"), ("d1", "c1", "E2"), ("d1", "c2", "E3")],
        "doc_id string, chain_id string, entity_id string",
    )
    gold = spark.createDataFrame(
        [("d1", "c1", "PER", ["E1"]), ("d1", "c2", "PER", ["E9"]),
         ("d1", "c3", "GPE", ["E3"])],
        "doc_id string, chain_id string, entity_type string, gold_links array<string>",
    )
    out = {r["entity_type"]: r["recall"] for r in SC.candidate_recall(cands, gold).collect()}
    assert out["PER"] == pytest.approx(0.5)
    assert out["GPE"] == 0.0


def test_kb_loading_recall(spark):
    kb = spark.createDataFrame([("E1",), ("E2",)], "entity_id string")
    gold = spark.createDataFrame([("E1",), ("E3",)], "entity_id string")
    r = SC.kb_loading_recall(kb, gold)
    assert r.recall == pytest.approx(0.5)
    assert r.missed == 1


def test_pairwise_f1_dropped_mention_counts_as_fn(spark):
    """A labeled pair whose mention was dropped upstream (absent from the
    assignments) must score pred=0: label=1 pairs become FALSE NEGATIVES
    instead of silently leaving the metric (ADVICE r1)."""
    a = assign(spark, [("m1", "c1"), ("m2", "c1")])
    lp = spark.createDataFrame(
        [("m1", "m2", "k", 1), ("m1", "mGONE", "k", 1), ("m2", "mGONE", "k", 0)],
        "key_a string, key_b string, block_key string, label int",
    )
    r = SC.pairwise_f1(a, lp)
    assert (r.tp, r.fp, r.fn) == (1, 0, 1)
    assert r.dropped_pairs == 2
    assert r.recall == 0.5


# ------------------------------------------------- pair-counting metrics


def _clusters_df(spark, assign):
    return spark.createDataFrame(
        [(k, c) for k, c in assign.items()], "mention_key string, cluster string"
    )


def test_cluster_pair_counts_exact(spark):
    from hamerkop_spark.operators.scoring import cluster_pair_counts

    # pred: {a,b,c} {d,e}   gold: {a,b} {c,d,e}
    pred = _clusters_df(
        spark, {"a": "p1", "b": "p1", "c": "p1", "d": "p2", "e": "p2"}
    )
    gold = _clusters_df(
        spark, {"a": "g1", "b": "g1", "c": "g2", "d": "g2", "e": "g2"}
    )
    r = cluster_pair_counts(pred, gold, "mention_key").collect()[0]
    assert (r.n, r.pred_pairs, r.gold_pairs) == (5, 4, 4)
    # co-clustered in both: (a,b) and (d,e)
    assert r.both_pairs == 2


def test_pairwise_cluster_prf_values(spark):
    from hamerkop_spark.operators.scoring import pairwise_cluster_prf

    pred = _clusters_df(
        spark, {"a": "p1", "b": "p1", "c": "p1", "d": "p2", "e": "p2"}
    )
    gold = _clusters_df(
        spark, {"a": "g1", "b": "g1", "c": "g2", "d": "g2", "e": "g2"}
    )
    r = pairwise_cluster_prf(pred, gold, "mention_key").collect()[0]
    assert r.p_fp == 500000      # 2/4
    assert r.r_fp == 500000      # 2/4
    assert r.f1_fp == 500000


def test_pairwise_prf_perfect_and_disjoint(spark):
    from hamerkop_spark.operators.scoring import pairwise_cluster_prf

    same = _clusters_df(spark, {"a": "x", "b": "x", "c": "y"})
    r = pairwise_cluster_prf(same, same, "mention_key").collect()[0]
    assert (r.p_fp, r.r_fp, r.f1_fp) == (1000000, 1000000, 1000000)


def test_adjusted_rand_matches_hand_formula(spark):
    from hamerkop_spark.operators.scoring import adjusted_rand_index

    pred = _clusters_df(
        spark, {"a": "p1", "b": "p1", "c": "p1", "d": "p2", "e": "p2"}
    )
    gold = _clusters_df(
        spark, {"a": "g1", "b": "g1", "c": "g2", "d": "g2", "e": "g2"}
    )
    r = adjusted_rand_index(pred, gold, "mention_key").collect()[0]
    # idx=2, a2=4, b2=4, C(5,2)=10 -> e=1.6, max=4 -> ari=(2-1.6)/(4-1.6)
    want = (2 - 1.6) / (4 - 1.6)
    assert r.ari_fp == math.floor(want * 1e6 + 0.5)


def test_adjusted_rand_identity_and_degenerate(spark):
    from hamerkop_spark.operators.scoring import adjusted_rand_index

    same = _clusters_df(spark, {"a": "x", "b": "x", "c": "y", "d": "z"})
    assert adjusted_rand_index(same, same, "mention_key").collect()[0].ari_fp \
        == 1000000
    # all singletons vs all singletons: Max == Expected == 0 -> null
    singl = _clusters_df(spark, {"a": "1", "b": "2", "c": "3"})
    assert adjusted_rand_index(singl, singl, "mention_key").collect()[0].ari_fp \
        is None


def test_blanc_hand_worked(spark):
    from hamerkop_spark.operators.scoring import blanc

    # pred {1,2}{3}{4,5}  gold {1,2,3}{4,5}: T=10, Cp=2, Cg=4, rc=2,
    # rn=10-2-4+2=6 -> F_c=2*1*.5/1.5, F_n=2*.75*1/1.75, BLANC=avg
    pred = _clusters_df(
        spark, {"1": "p1", "2": "p1", "3": "p2", "4": "p3", "5": "p3"}
    )
    gold = _clusters_df(
        spark, {"1": "g1", "2": "g1", "3": "g1", "4": "g2", "5": "g2"}
    )
    r = blanc(pred, gold, "mention_key").collect()[0]
    assert (r.total_links, r.both_pairs, r.rn) == (10, 2, 6)
    assert (r.p_c_fp, r.r_c_fp, r.f_c_fp) == (1000000, 500000, 666667)
    assert (r.p_n_fp, r.r_n_fp, r.f_n_fp) == (750000, 1000000, 857143)
    assert r.blanc_fp == 761905


def test_blanc_degenerate_conventions(spark):
    from hamerkop_spark.operators.scoring import blanc

    # no coref links on either side -> BLANC := F_n = 1
    singl = _clusters_df(spark, {"a": "1", "b": "2", "c": "3"})
    assert blanc(singl, singl, "mention_key").collect()[0].blanc_fp == 1000000
    # no non-coref links on either side -> BLANC := F_c = 1
    one = _clusters_df(spark, {"a": "x", "b": "x", "c": "x"})
    assert blanc(one, one, "mention_key").collect()[0].blanc_fp == 1000000
    # identity, mixed -> both halves perfect
    same = _clusters_df(spark, {"a": "x", "b": "x", "c": "y"})
    assert blanc(same, same, "mention_key").collect()[0].blanc_fp == 1000000
    # pred all-singleton vs gold {a,b}{c}: F_c=0 (rc=0), F_n=0.8
    gold = _clusters_df(spark, {"a": "g", "b": "g", "c": "h"})
    r = blanc(singl, gold, "mention_key").collect()[0]
    assert (r.f_c_fp, r.f_n_fp, r.blanc_fp) == (0, 800000, 400000)


def test_adjusted_rand_universe_is_key_intersection(spark):
    from hamerkop_spark.operators.scoring import cluster_pair_counts

    pred = _clusters_df(spark, {"a": "p", "b": "p", "zz": "p"})
    gold = _clusters_df(spark, {"a": "g", "b": "g", "yy": "g"})
    r = cluster_pair_counts(pred, gold, "mention_key").collect()[0]
    assert r.n == 2 and r.both_pairs == 1


def _py_vmeasure(assign_pred, assign_gold):
    from collections import Counter
    keys = set(assign_pred) & set(assign_gold)
    cells = Counter((assign_pred[k], assign_gold[k]) for k in keys)
    pc = Counter(assign_pred[k] for k in keys)
    gc = Counter(assign_gold[k] for k in keys)
    n = len(keys)

    def H(counts):
        return -sum(c / n * math.log(c / n) for c in counts.values())

    def Hcond(cells, outer_idx):
        # H(inner | outer): sum over cells -n_ij/n log(n_ij / n_outer)
        tot = 0.0
        outer = pc if outer_idx == 0 else gc
        for (p, g), c in cells.items():
            o = outer[p if outer_idx == 0 else g]
            tot -= c / n * math.log(c / o)
        return tot

    h_gold, h_pred = H(gc), H(pc)
    h = 1.0 if h_gold == 0 else 1.0 - Hcond(cells, 0) / h_gold
    c = 1.0 if h_pred == 0 else 1.0 - Hcond(cells, 1) / h_pred
    v = 0.0 if h + c == 0 else 2 * h * c / (h + c)
    return h, c, v


def test_v_measure_matches_reference_formula(spark):
    from hamerkop_spark.operators.scoring import v_measure

    ap = {"a": "p1", "b": "p1", "c": "p1", "d": "p2", "e": "p2"}
    ag = {"a": "g1", "b": "g1", "c": "g2", "d": "g2", "e": "g2"}
    r = v_measure(_clusters_df(spark, ap), _clusters_df(spark, ag))
    h, c, v = _py_vmeasure(ap, ag)
    assert abs(r.homogeneity - h) < 1e-9
    assert abs(r.completeness - c) < 1e-9
    assert abs(r.v_measure - v) < 1e-9
    assert r.n == 5


def test_v_measure_identity_and_degenerate(spark):
    from hamerkop_spark.operators.scoring import v_measure

    same = _clusters_df(spark, {"a": "x", "b": "x", "c": "y"})
    r = v_measure(same, same)
    assert (r.homogeneity, r.completeness, r.v_measure) == (1.0, 1.0, 1.0)
    # one pred cluster vs gold split: perfectly complete, not homogeneous
    pred = _clusters_df(spark, {"a": "x", "b": "x", "c": "x", "d": "x"})
    gold = _clusters_df(spark, {"a": "1", "b": "1", "c": "2", "d": "2"})
    r2 = v_measure(pred, gold)
    assert r2.completeness == 1.0 and r2.homogeneity == 0.0


def test_pairwise_prf_zero_denominators_are_zero(spark):
    from hamerkop_spark.operators.scoring import pairwise_cluster_prf

    # all-singleton pred: no predicted pairs -> P := 0, F1 := 0
    pred = _clusters_df(spark, {"a": "1", "b": "2", "c": "3"})
    gold = _clusters_df(spark, {"a": "x", "b": "x", "c": "x"})
    r = pairwise_cluster_prf(pred, gold, "mention_key").collect()[0]
    assert (r.p_fp, r.r_fp, r.f1_fp) == (0, 0, 0)
    # disjoint clusterings: both_pairs = 0 -> all three are 0, not NULL
    p2 = _clusters_df(spark, {"a": "1", "b": "1", "c": "2", "d": "2"})
    g2 = _clusters_df(spark, {"a": "x", "b": "y", "c": "x", "d": "y"})
    r2 = pairwise_cluster_prf(p2, g2, "mention_key").collect()[0]
    assert (r2.p_fp, r2.r_fp, r2.f1_fp) == (0, 0, 0)


def test_pr_curve_exact_counts(spark):
    from hamerkop_spark.operators.scoring import pr_curve

    scored = spark.createDataFrame(
        [(0.9, True), (0.8, False), (0.7, True)],
        "score double, is_match boolean",
    )
    rows = {r.threshold: r for r in pr_curve(scored).collect()}
    assert rows[0.9].tp == 1 and rows[0.9].fp == 0 and rows[0.9].fn == 1
    assert rows[0.9].precision_micro == 1_000_000
    assert rows[0.9].recall_micro == 500_000
    assert rows[0.9].f1_micro == 666_666
    assert rows[0.8].f1_micro == 500_000
    assert rows[0.7].tp == 2 and rows[0.7].fp == 1 and rows[0.7].fn == 0
    assert rows[0.7].f1_micro == 800_000


def test_pr_curve_matches_bruteforce(spark):
    from hamerkop_spark.operators.scoring import pr_curve

    data = [((i * 37) % 100, (i * 53) % 7 < 3) for i in range(200)]
    scored = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in data], "score double, is_match boolean"
    )
    got = {r.threshold: (r.tp, r.fp, r.fn) for r in pr_curve(scored).collect()}
    for th, counts in got.items():
        tp = sum(1 for s, y in data if s >= th and y)
        fp = sum(1 for s, y in data if s >= th and not y)
        fn = sum(1 for s, y in data if s < th and y)
        assert counts == (tp, fp, fn), th


def test_cluster_audit_chain_vs_clique(spark):
    # X = 5-node chain (density 0.4 -> suspect), Y = triangle (1.0),
    # Z = singleton; straddling edge (5,6) ignored; (7,6) is a
    # duplicate orientation of (6,7) collapsing to the min score;
    # self-loop dropped.
    asg = spark.createDataFrame(
        [(i, "X") for i in range(1, 6)]
        + [(i, "Y") for i in range(6, 9)]
        + [(9, "Z")],
        "mention_key int, cluster string",
    )
    edges = spark.createDataFrame(
        [
            (1, 2, 0.9), (2, 3, 0.4), (3, 4, 0.9), (4, 5, 0.9),
            (6, 7, 0.8), (7, 8, 0.8), (6, 8, 0.8),
            (7, 6, 0.85),   # duplicate orientation
            (5, 6, 0.9),    # straddles X/Y
            (7, 7, 1.0),    # self-loop
        ],
        "a_id int, b_id int, score double",
    )
    got = {
        r.cluster: r for r in SC.cluster_audit(asg, edges).collect()
    }
    x = got["X"]
    assert (x.n_nodes, x.n_edges, x.possible_pairs) == (5, 4, 10)
    assert x.density_fp == 400_000
    assert x.min_score_fp == 400_000
    assert x.mean_score_fp == 775_000
    assert x.chaining_suspect
    y = got["Y"]
    assert (y.n_nodes, y.n_edges, y.possible_pairs) == (3, 3, 3)
    assert y.density_fp == 1_000_000
    assert y.min_score_fp == 800_000 and y.mean_score_fp == 800_000
    assert not y.chaining_suspect
    z = got["Z"]
    assert (z.n_nodes, z.n_edges, z.possible_pairs) == (1, 0, 0)
    assert z.density_fp is None and z.min_score_fp is None
    assert not z.chaining_suspect


def test_cluster_audit_pairs_never_suspect(spark):
    # n_nodes >= 3 guard: a 2-node cluster is its own edge support
    asg = spark.createDataFrame(
        [(1, "P"), (2, "P"), (3, "Q"), (4, "Q"), (5, "Q")],
        "mention_key int, cluster string",
    )
    edges = spark.createDataFrame(
        [(1, 2, 0.3), (3, 4, 0.9)], "a_id int, b_id int, score double"
    )
    got = {r.cluster: r for r in SC.cluster_audit(asg, edges).collect()}
    assert not got["P"].chaining_suspect          # n=2, density 1.0
    assert got["Q"].chaining_suspect              # n=3, 1 of 3 edges
    assert got["Q"].density_fp == 333_333
