"""Fellegi-Sunter probabilistic linkage (operators/linkage.py)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows

from hamerkop_spark.operators.linkage import (
    FP_SCALE,
    agreement_pattern_counts,
    field_agreement,
    fit_fs_em,
    fs_match_weight,
    fs_weight_constants,
)


def _synth_pairs(n, p, m, u, seed=7):
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        is_match = rng.random() < p
        probs = m if is_match else u
        rows.append(tuple(int(rng.random() < pi) for pi in probs))
    return rows


def test_fs_weight_constants_exact():
    c = fs_weight_constants({"f": 0.9}, {"f": 0.1})
    assert c["f"][0] == math.floor(math.log2(9.0) * FP_SCALE + 0.5)
    assert c["f"][1] == math.floor(math.log2(0.1 / 0.9) * FP_SCALE + 0.5)


def test_fs_match_weight_integer_sum(spark):
    df = spark.createDataFrame(
        [(1, 1, 0), (2, 0, 0), (3, 1, 1)], "pid int, g1 int, g2 int"
    )
    m = {"g1": 0.9, "g2": 0.8}
    u = {"g1": 0.1, "g2": 0.4}
    consts = fs_weight_constants(m, u)
    got = {
        r["pid"]: r["fs_weight_fp"]
        for r in fs_match_weight(df, ["g1", "g2"], m, u).collect()
    }
    aw1, dw1 = consts["g1"]
    aw2, dw2 = consts["g2"]
    assert got == {1: aw1 + dw2, 2: dw1 + dw2, 3: aw1 + aw2}


def test_field_agreement_null_safe(spark):
    df = spark.createDataFrame(
        [("x", "x"), ("x", "y"), (None, "x"), (None, None)], "a string, b string"
    )
    vals = [r["g"] for r in df.select(field_agreement("a", "b").alias("g")).collect()]
    assert vals == [1, 0, 0, 0]


def test_agreement_pattern_counts_bounded(spark):
    rows = _synth_pairs(2000, 0.3, [0.9, 0.8], [0.1, 0.3])
    df = spark.createDataFrame(rows, "g1 int, g2 int")
    hist = agreement_pattern_counts(df, ["g1", "g2"]).collect()
    assert len(hist) <= 4
    assert sum(r["n"] for r in hist) == 2000


def test_fit_fs_em_recovers_mixture(spark):
    true_p, true_m, true_u = 0.25, [0.92, 0.85, 0.95], [0.08, 0.25, 0.04]
    rows = _synth_pairs(40000, true_p, true_m, true_u, seed=11)
    df = spark.createDataFrame(rows, "g1 int, g2 int, g3 int")
    fit = fit_fs_em(df, ["g1", "g2", "g3"], iterations=300)
    assert abs(fit["p"] - true_p) < 0.03
    for i, f in enumerate(["g1", "g2", "g3"]):
        assert abs(fit["m"][f] - true_m[i]) < 0.05, (f, fit["m"])
        assert abs(fit["u"][f] - true_u[i]) < 0.05, (f, fit["u"])
    assert fit["n"] == 40000
    # fitted params must rank a full-agreement pair above a full-miss
    scored = fs_match_weight(
        spark.createDataFrame([(1, 1, 1), (0, 0, 0)], "g1 int, g2 int, g3 int"),
        ["g1", "g2", "g3"],
        fit["m"],
        fit["u"],
    ).collect()
    w = {tuple(r[f] for f in ["g1", "g2", "g3"]): r["fs_weight_fp"] for r in scored}
    assert w[(1, 1, 1)] > 0 > w[(0, 0, 0)]


def test_fit_fs_em_label_swap_canonicalized(spark):
    # symmetric init (m == u) relies on the canonical orientation step
    rows = _synth_pairs(20000, 0.5, [0.9, 0.9], [0.1, 0.1], seed=3)
    df = spark.createDataFrame(rows, "g1 int, g2 int")
    fit = fit_fs_em(df, ["g1", "g2"], init_m=0.6, init_u=0.4, iterations=300)
    assert fit["m"]["g1"] > fit["u"]["g1"]


def test_fit_fs_em_guards(spark):
    df = spark.createDataFrame([], "g1 int")
    with pytest.raises(ValueError):
        fit_fs_em(df, ["g1"])
    with pytest.raises(ValueError):
        fit_fs_em(df.withColumn("x", F.lit(1)), [f"f{i}" for i in range(21)])


def test_fs_resolver_in_cascade(spark):
    from hamerkop_spark.operators.linkage import fs_resolver
    from hamerkop_spark.operators.resolve import cascade_resolver

    m = {"g1": 0.9, "g2": 0.9}
    u = {"g1": 0.1, "g2": 0.1}
    # chain (d1,1): e10 agrees twice (positive weight), e11 never ->
    # decided to e10. chain (d1,2): all candidates disagree -> NIL.
    pairs = spark.createDataFrame(
        [
            ("d1", 1, "e10", 1, 1),
            ("d1", 1, "e11", 0, 0),
            ("d1", 2, "e20", 0, 0),
            ("d1", 2, "e21", 0, 0),
        ],
        "doc_id string, chain_id int, entity_id string, g1 int, g2 int",
    )
    out = cascade_resolver(pairs, [fs_resolver(m, u, threshold_fp=0)])
    got = {(r["doc_id"], r["chain_id"]): r["entity_id"] for r in out.collect()}
    assert got == {("d1", 1): "e10"}


def test_fs_resolver_margin_abstains(spark):
    from hamerkop_spark.operators.linkage import fs_resolver, fs_weight_constants

    m = {"g1": 0.9}
    u = {"g1": 0.1}
    aw, _ = fs_weight_constants(m, u)["g1"]
    pairs = spark.createDataFrame(
        [("d", 1, "a", 1), ("d", 1, "b", 1), ("d", 2, "c", 1), ("d", 2, "d", 0)],
        "doc_id string, chain_id int, entity_id string, g1 int",
    )
    dec, rem = fs_resolver(m, u, margin_fp=aw)(pairs)
    got = {(r["doc_id"], r["chain_id"]): r["entity_id"] for r in dec.collect()}
    # chain 1: both candidates tie -> margin gate abstains;
    # chain 2: gap == aw - dw > aw (dw negative) -> decided
    assert got == {("d", 2): "c"}
    assert rem.where("chain_id = 1").count() == 2


# ---------------------------------------------------------------- one-to-one


def _seq_greedy(edges):
    """Sequential greedy matching oracle: sort by (score desc, l, r),
    accept when both endpoints free. Returns {(l, r): round} where
    round is the locally-dominant extraction round (computed after)."""
    taken_l, taken_r, out = set(), set(), []
    for s, l, r in sorted(((s, l, r) for l, r, s in edges),
                          key=lambda t: (-t[0], t[1], t[2])):
        if l not in taken_l and r not in taken_r:
            taken_l.add(l)
            taken_r.add(r)
            out.append((l, r, s))
    return out


def _dominant_rounds(edges):
    """Round number per matched pair under iterated locally-dominant
    extraction (reference implementation, driver-side)."""
    remaining = list(edges)
    rounds = {}
    rnd = 0
    while remaining:
        rnd += 1
        best_l, best_r = {}, {}
        for l, r, s in remaining:
            k = (-s, r)
            if l not in best_l or k < best_l[l][0]:
                best_l[l] = (k, r)
            k2 = (-s, l)
            if r not in best_r or k2 < best_r[r][0]:
                best_r[r] = (k2, l)
        dom = [(l, r, s) for l, r, s in remaining
               if best_l[l][1] == r and best_r[r][1] == l]
        if not dom:
            break
        for l, r, s in dom:
            rounds[(l, r)] = rnd
        matched_l = {l for l, _, _ in dom}
        matched_r = {r for _, r, _ in dom}
        remaining = [e for e in remaining
                     if e[0] not in matched_l and e[1] not in matched_r]
    return rounds


def test_mutual_best_match_basic(spark):
    from hamerkop_spark.operators.linkage import mutual_best_match

    # l1's best is r1 (9) and r1's best is l1 -> kept.
    # l2's best is r1 (8) but r1 prefers l1 -> dropped.
    df = spark.createDataFrame(
        [("l1", "r1", 9), ("l2", "r1", 8), ("l2", "r2", 3), ("l3", "r2", 3)],
        "chain_id string, entity_id string, match_score int",
    )
    got = rows(mutual_best_match(df), "chain_id", "entity_id")
    # ties on r2 (3 vs 3): left tiebreak asc -> l2 wins r2; l2's best is
    # r1 though, so neither (l2,r2) nor (l3,r2) is mutual-best round 1.
    assert got == [("l1", "r1")]


def test_one_to_one_matches_sequential_greedy(spark):
    import random

    from hamerkop_spark.operators.linkage import one_to_one_assignment

    rng = random.Random(41)
    for trial in range(4):
        edges = set()
        for _ in range(220):
            edges.add((f"l{rng.randrange(40)}", f"r{rng.randrange(35)}",
                       rng.randrange(50)))
        edges = sorted(edges)
        df = spark.createDataFrame(
            edges, "chain_id string, entity_id string, match_score int"
        )
        got = one_to_one_assignment(df).orderBy("chain_id").collect()
        want = _seq_greedy(edges)
        assert sorted((r.chain_id, r.entity_id, r.match_score) for r in got) \
            == sorted(want), f"trial {trial}"
        # round column matches the reference dominant-rounds trace
        want_rounds = _dominant_rounds(edges)
        for r in got:
            assert r.match_round == want_rounds[(r.chain_id, r.entity_id)]


def test_one_to_one_max_rounds_prefix(spark):
    from hamerkop_spark.operators.linkage import one_to_one_assignment

    # chain of strictly decreasing scores forces one match per round:
    # (l0,r0,100) dominates; then (l1,r1,99)... 4 rounds needed.
    edges = []
    for i in range(4):
        edges.append((f"l{i}", f"r{i}", 100 - i))
        if i + 1 < 4:
            edges.append((f"l{i + 1}", f"r{i}", 100 - i))
    df = spark.createDataFrame(
        edges, "chain_id string, entity_id string, match_score int"
    )
    full = one_to_one_assignment(df)
    assert full.count() == 4
    capped = one_to_one_assignment(df, max_rounds=2)
    assert capped.count() == 2
    assert capped.agg({"match_round": "max"}).collect()[0][0] == 2


def test_one_to_one_resolver_stage(spark):
    from hamerkop_spark.operators.linkage import one_to_one_resolver
    from hamerkop_spark.operators.resolve import cascade_resolver

    pairs = spark.createDataFrame(
        [
            ("d1", 1, "e1", 0.9),
            ("d1", 1, "e2", 0.5),
            ("d1", 2, "e1", 0.8),   # loses e1 to chain 1, stays NIL
            ("d2", 1, "e2", 0.2),   # below threshold -> never matched
        ],
        "doc_id string, chain_id int, entity_id string, match_score double",
    )
    stage = one_to_one_resolver(threshold=0.3)
    decisions, remaining = stage(pairs)
    got = rows(decisions, "doc_id", "chain_id", "entity_id")
    assert got == [("d1", 1, "e1")]
    # chain (d1,2)'s only candidate was e1, which this stage claimed —
    # its pair LEAVES the pool (a later stage must not steal e1), so
    # the chain is NIL; chain (d2,1) had only a sub-threshold pair and
    # stays for later stages
    assert rows(remaining, "doc_id", "chain_id") == [("d2", 1)]
    # and composes with the cascade contract
    dec = cascade_resolver(pairs, [stage])
    assert dec.count() == 1


# ------------------------------------------------------------- three-band


FS2_M = {"f1": 0.9, "f2": 0.8}
FS2_U = {"f1": 0.1, "f2": 0.2}


def _all_patterns_df(spark):
    return spark.createDataFrame(
        [(1, 1), (1, 0), (0, 1), (0, 0)], "f1 int, f2 int"
    )


def test_fs_thresholds_tight_errors(spark):
    from hamerkop_spark.operators.linkage import (
        fs_thresholds_for_error,
        fs_three_band,
        fs_weight_constants,
    )

    df = _all_patterns_df(spark)
    th = fs_thresholds_for_error(df, ["f1", "f2"], FS2_M, FS2_U,
                                 mu=0.05, lam=0.05)
    c = fs_weight_constants(FS2_M, FS2_U)
    w11 = c["f1"][0] + c["f2"][0]
    w00 = c["f1"][1] + c["f2"][1]
    # u-mass: (1,1)=.02 <= .05 < .10 -> only (1,1) auto-links;
    # m-mass: (0,0)=.02 <= .05 < .10 -> only (0,0) auto-non-links
    assert th["upper_fp"] == w11
    assert th["lower_fp"] == w00
    assert abs(th["mu_achieved"] - 0.02) < 1e-12
    assert abs(th["lam_achieved"] - 0.02) < 1e-12
    banded = fs_three_band(df, ["f1", "f2"], FS2_M, FS2_U,
                           th["upper_fp"], th["lower_fp"])
    got = {(r.f1, r.f2): r.fs_band for r in banded.collect()}
    assert got == {
        (1, 1): "match", (1, 0): "possible",
        (0, 1): "possible", (0, 0): "non_match",
    }


def test_fs_thresholds_loose_errors_collapse_review_band(spark):
    from hamerkop_spark.operators.linkage import (
        fs_thresholds_for_error,
        fs_three_band,
    )

    df = _all_patterns_df(spark)
    th = fs_thresholds_for_error(df, ["f1", "f2"], FS2_M, FS2_U,
                                 mu=0.5, lam=0.5)
    assert th["upper_fp"] > th["lower_fp"]
    banded = fs_three_band(df, ["f1", "f2"], FS2_M, FS2_U,
                           th["upper_fp"], th["lower_fp"])
    bands = {(r.f1, r.f2): r.fs_band for r in banded.collect()}
    # review band collapsed: every pattern auto-decides
    assert "possible" not in bands.values()
    assert bands[(1, 1)] == "match" and bands[(0, 0)] == "non_match"


def test_fs_three_band_guard(spark):
    from hamerkop_spark.operators.linkage import fs_three_band

    with pytest.raises(ValueError):
        fs_three_band(_all_patterns_df(spark), ["f1", "f2"],
                      FS2_M, FS2_U, upper_fp=0, lower_fp=1)


def test_fs_thresholds_on_em_fit_mixture(spark):
    """End-to-end: synthesize the mixture, fit EM, derive thresholds,
    band — the match band should be overwhelmingly true matches."""
    from hamerkop_spark.operators.linkage import (
        fit_fs_em,
        fs_three_band,
        fs_thresholds_for_error,
    )

    rng = random.Random(23)
    m_true, u_true = [0.95, 0.9, 0.85], [0.1, 0.15, 0.2]
    labeled = []
    for _ in range(20000):
        is_match = rng.random() < 0.15
        probs = m_true if is_match else u_true
        labeled.append(
            tuple(int(rng.random() < pi) for pi in probs) + (int(is_match),)
        )
    df = spark.createDataFrame(labeled, "g1 int, g2 int, g3 int, label int")
    fields = ["g1", "g2", "g3"]
    fit = fit_fs_em(df, fields)
    th = fs_thresholds_for_error(df, fields, fit["m"], fit["u"],
                                 mu=0.01, lam=0.05)
    banded = fs_three_band(df, fields, fit["m"], fit["u"],
                           th["upper_fp"], th["lower_fp"])
    stats = banded.groupBy("fs_band").agg(
        F.count("*").alias("n"), F.avg("label").alias("purity")
    ).collect()
    by = {r.fs_band: r for r in stats}
    assert by["match"].purity > 0.8
    assert by["non_match"].purity < 0.1


# ----------------------------------------------------------- review sample


def test_sample_for_review_deterministic_and_capped(spark):
    from hamerkop_spark.operators.linkage import sample_for_review

    rows_ = [(f"c{i}", f"e{i}", "possible" if i % 3 else "match")
             for i in range(300)]
    df = spark.createDataFrame(
        rows_, "chain_id string, entity_id string, fs_band string"
    )
    s1 = sample_for_review(df, 10)
    s2 = sample_for_review(df, 10)
    got1 = sorted((r.fs_band, r.chain_id) for r in s1.collect())
    got2 = sorted((r.fs_band, r.chain_id) for r in s2.collect())
    assert got1 == got2                      # same sample every run
    per = {}
    for band, _ in got1:
        per[band] = per.get(band, 0) + 1
    assert per == {"match": 10, "possible": 10}


def test_sample_for_review_small_stratum_keeps_all(spark):
    from hamerkop_spark.operators.linkage import sample_for_review

    df = spark.createDataFrame(
        [("c1", "e1", "match"), ("c2", "e2", "match"),
         ("c3", "e3", "non_match")],
        "chain_id string, entity_id string, fs_band string",
    )
    out = sample_for_review(df, 10).collect()
    assert len(out) == 3                     # p = 1 keeps everything
    # schema passes through untouched
    assert set(out[0].asDict()) == {"chain_id", "entity_id", "fs_band"}


def test_one_to_one_null_ids_dropped_not_looped(spark):
    from hamerkop_spark.operators.linkage import one_to_one_assignment

    df = spark.createDataFrame(
        [("l1", "r1", 5.0), (None, "r9", 9.0), ("l2", None, 8.0),
         ("l2", "r2", None)],
        "chain_id string, entity_id string, match_score double",
    )
    got = one_to_one_assignment(df).collect()
    assert [(r.chain_id, r.entity_id) for r in got] == [("l1", "r1")]


def test_one_to_one_resolver_blocks_claimed_entities_downstream(spark):
    from hamerkop_spark.operators.linkage import one_to_one_resolver
    from hamerkop_spark.operators.resolve import (
        cascade_resolver,
        first_resolver,
    )

    pairs = spark.createDataFrame(
        [("d", 1, "e1", 0.9), ("d", 2, "e1", 0.8)],
        "doc_id string, chain_id int, entity_id string, match_score double",
    )
    # stage 1 claims e1 for chain 1; stage 2 (first_resolver) must NOT
    # re-assign e1 to chain 2 — its pool no longer contains e1 pairs
    dec = cascade_resolver(pairs, [one_to_one_resolver(), first_resolver])
    got = {(r.doc_id, r.chain_id): r.entity_id for r in dec.collect()}
    assert got == {("d", 1): "e1"}


def test_fs_threshold_sweep_merges_weight_ties(spark):
    from hamerkop_spark.operators.linkage import fs_model_thresholds

    # symmetric fields -> patterns (1,0) and (0,1) share one weight;
    # with mu between the one-pattern and the tie-inclusive u-mass the
    # cut must NOT split the tie: the whole level stays out of the
    # link band and mu_achieved reports only the (1,1) mass (0.01)
    th = fs_model_thresholds(
        ["f1", "f2"], {"f1": 0.9, "f2": 0.9}, {"f1": 0.1, "f2": 0.1},
        mu=0.12, lam=0.001,
    )
    assert abs(th["mu_achieved"] - 0.01) < 1e-12
    # upper sits at the (1,1) weight, strictly above the tied level
    from hamerkop_spark.operators.linkage import fs_weight_constants
    c = fs_weight_constants({"f1": 0.9, "f2": 0.9}, {"f1": 0.1, "f2": 0.1})
    assert th["upper_fp"] == c["f1"][0] + c["f2"][0]


def test_fs_model_thresholds_clamps_degenerate_probs(spark):
    from hamerkop_spark.operators.linkage import fs_model_thresholds

    th = fs_model_thresholds(
        ["f1", "f2"], {"f1": 1.0, "f2": 0.8}, {"f1": 0.5, "f2": 0.14},
        mu=0.1, lam=0.05,
    )
    # no NaN degeneracy: the top pattern auto-links (u-mass 0.07 <=
    # 0.1) and some pattern auto-rejects — pre-fix, NaN masses made
    # BOTH cuts empty sentinels
    assert th["mu_achieved"] > 0.0 and th["lam_achieved"] > 0.0


# ------------------------------------------------------------- multi-level


def test_field_agreement_levels_cuts(spark):
    from hamerkop_spark.operators.linkage import field_agreement_levels

    df = spark.createDataFrame(
        [(0.5,), (0.88,), (0.94,), (0.95,), (1.0,), (None,)], "sim double"
    )
    got = [r.lvl for r in df.select(
        field_agreement_levels(F.col("sim")).alias("lvl")).collect()]
    assert got == [0, 1, 1, 2, 2, 0]


def test_fs_level_weight_constants_and_weight(spark):
    from hamerkop_spark.operators.linkage import (
        fs_level_weight_constants,
        fs_match_weight_levels,
    )

    m = {"name": [0.05, 0.15, 0.80]}
    u = {"name": [0.80, 0.15, 0.05]}
    c = fs_level_weight_constants(m, u)["name"]
    assert c[0] == math.floor(math.log2(0.05 / 0.80) * 1e6 + 0.5)
    assert c[1] == 0                       # log2(0.15/0.15) == 0
    assert c[2] == math.floor(math.log2(0.80 / 0.05) * 1e6 + 0.5)
    df = spark.createDataFrame([(0,), (1,), (2,)], "name int")
    got = [r.fs_weight_fp for r in
           fs_match_weight_levels(df, ["name"], m, u).collect()]
    assert got == c
    # binary special case must agree with fs_match_weight
    from hamerkop_spark.operators.linkage import fs_match_weight
    m2, u2 = {"g": 0.9}, {"g": 0.1}
    dfb = spark.createDataFrame([(0,), (1,)], "g int")
    bin_w = [r.fs_weight_fp for r in
             fs_match_weight(dfb, ["g"], m2, u2).collect()]
    lvl_w = [r.fs_weight_fp for r in fs_match_weight_levels(
        dfb, ["g"], {"g": [0.1, 0.9]}, {"g": [0.9, 0.1]}).collect()]
    assert bin_w == lvl_w


def test_fit_fs_em_levels_recovers_mixture(spark):
    from hamerkop_spark.operators.linkage import fit_fs_em_levels

    rng = random.Random(17)
    # three conditionally-independent fields: the categorical mixture
    # is identifiable (Kruskal) — with only two, EM drifts to the
    # extremes and tolerances would have to be loose
    m_true = {"a": [0.05, 0.15, 0.80], "b": [0.10, 0.90],
              "c": [0.20, 0.80]}
    u_true = {"a": [0.70, 0.20, 0.10], "b": [0.85, 0.15],
              "c": [0.75, 0.25]}

    def draw(probs):
        x, acc = rng.random(), 0.0
        for i, pr in enumerate(probs):
            acc += pr
            if x < acc:
                return i
        return len(probs) - 1

    rows_ = []
    for _ in range(40000):
        src = m_true if rng.random() < 0.3 else u_true
        rows_.append((draw(src["a"]), draw(src["b"]), draw(src["c"])))
    df = spark.createDataFrame(rows_, "a int, b int, c int")
    fit = fit_fs_em_levels(df, ["a", "b", "c"], {"a": 3, "b": 2, "c": 2},
                           iterations=300)
    assert abs(fit["p"] - 0.3) < 0.04
    for f, truth in m_true.items():
        for lvl, pr in enumerate(truth):
            assert abs(fit["m"][f][lvl] - pr) < 0.06, (f, lvl, fit["m"])
    for f, truth in u_true.items():
        for lvl, pr in enumerate(truth):
            assert abs(fit["u"][f][lvl] - pr) < 0.06, (f, lvl, fit["u"])


def test_fit_fs_em_levels_guards(spark):
    from hamerkop_spark.operators.linkage import fit_fs_em_levels

    df = spark.createDataFrame([(0,)], "a int")
    with pytest.raises(ValueError):
        fit_fs_em_levels(df, ["a"], {"a": 1})
    with pytest.raises(ValueError):
        fit_fs_em_levels(
            df.select(*[F.lit(0).alias(f"f{i}") for i in range(8)]),
            [f"f{i}" for i in range(8)], {f"f{i}": 8 for i in range(8)},
        )


def test_group_linkage_one_to_one_semantics(spark):
    """On et al. group measure: greedy bipartite matching of member
    pairs — the second member must take the second-best counterpart,
    not double-count the first's."""
    from hamerkop_spark.operators.linkage import group_linkage

    pairs = spark.createDataFrame(
        [("X", "Y", "a1", "b1", 0.9), ("X", "Y", "a1", "b2", 0.8),
         ("X", "Y", "a2", "b2", 0.7), ("X", "Y", "a2", "b1", 0.2)],
        "group_a string, group_b string, a_id string, b_id string,"
        " score double",
    )
    out = group_linkage(pairs).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_matched == 2
    assert abs(r.sum_score - 1.6) < 1e-9          # 0.9 + 0.7, NOT 0.9+0.8
    assert r.n_a == 2 and r.n_b == 2
    assert abs(r.group_sim - 0.8) < 1e-9


def test_group_linkage_scoped_per_group_pair(spark):
    """A member may match different counterparts in different candidate
    group pairings — the one-to-one constraint binds within (ga, gb)."""
    from hamerkop_spark.operators.linkage import group_linkage

    pairs = spark.createDataFrame(
        [("X", "Y", "a1", "y1", 0.9),
         ("X", "Z", "a1", "z1", 0.8)],
        "group_a string, group_b string, a_id string, b_id string,"
        " score double",
    )
    out = {(r.group_a, r.group_b): r for r in group_linkage(pairs).collect()}
    assert out[("X", "Y")].n_matched == 1
    assert out[("X", "Z")].n_matched == 1


def test_group_linkage_explicit_sizes(spark):
    """True group sizes dominate the normalization when members lack
    candidates."""
    from hamerkop_spark.operators.linkage import group_linkage

    pairs = spark.createDataFrame(
        [("X", "Y", "a1", "b1", 1.0)],
        "group_a string, group_b string, a_id string, b_id string,"
        " score double",
    )
    sizes_a = spark.createDataFrame([("X", 4)], "group_a string, n_a long")
    sizes_b = spark.createDataFrame([("Y", 2)], "group_b string, n_b long")
    r = group_linkage(pairs, sizes_a=sizes_a, sizes_b=sizes_b).first()
    assert r.n_a == 4 and r.n_b == 2
    assert abs(r.group_sim - 0.25) < 1e-9         # 1.0 / max(4, 2)


# ------------------------------------------------- uncertainty sampling


def test_uncertainty_queue_orders_by_boundary_distance(spark):
    from hamerkop_spark.operators.linkage import uncertainty_queue

    rows = [
        (1, 10, 0.5),    # uncertainty 1e6 (max)
        (2, 20, 0.45),   # 900000
        (3, 30, 0.62),   # 760000
        (4, 40, 0.05),   # 100000
        (5, 50, 0.99),   # 20000
    ]
    df = spark.createDataFrame(rows, "a_id int, b_id int, match_prob double")
    got = uncertainty_queue(df, 3).collect()
    assert [(r["a_id"], r["uncertainty_fp"]) for r in
            sorted(got, key=lambda r: -r["uncertainty_fp"])] == [
        (1, 1_000_000), (2, 900_000), (3, 760_000)
    ]


def test_uncertainty_queue_modes_agree_and_tiebreak(spark):
    from hamerkop_spark.operators.linkage import uncertainty_queue

    # symmetric probs p and 1-p produce EQUAL uncertainty: ties broken
    # by ids, and both selection modes agree
    rows = [(i, i + 100, 0.5 + (i % 4) * 0.1) for i in range(12)]
    rows += [(i + 50, i + 150, 0.5 - (i % 4) * 0.1) for i in range(12)]
    df = spark.createDataFrame(rows, "a_id int, b_id int, match_prob double")
    a = {(r["a_id"], r["b_id"]) for r in uncertainty_queue(df, 7).collect()}
    b = {
        (r["a_id"], r["b_id"])
        for r in uncertainty_queue(df, 7, mode="threshold").collect()
    }
    assert a == b and len(a) == 7
    # scalar oracle
    def ufp(p):
        import math
        return 1_000_000 - abs(math.floor((2 * p - 1) * 1e6 + 0.5))
    want = set(sorted(
        ((a_, b_) for a_, b_, p in rows),
        key=lambda ab: (-ufp(dict(((x, y), q) for x, y, q in rows)[ab]),
                        ab[0], ab[1]),
    )[:7])
    assert a == want


# ------------------------------------------------ term-frequency adjustment


def test_tf_table_exact_fp(spark):
    import math

    from hamerkop_spark.operators.linkage import LOG2E_FP, tf_table

    recs = spark.createDataFrame(
        [("smith",)] * 8 + [("nakamura",)] * 2 + [(None,)],
        "name string",
    )
    got = {r["value"]: r["tf_log2_fp"] for r in tf_table(recs, "name").collect()}
    # N=10 (null excluded): smith log2(10/8), nakamura log2(10/2)
    assert got["smith"] == math.floor(math.log(10 / 8) * LOG2E_FP + 0.5)
    assert got["nakamura"] == math.floor(math.log(10 / 2) * LOG2E_FP + 0.5)
    assert None not in got


def test_fs_tf_weight_rare_beats_common(spark):
    from hamerkop_spark.operators.linkage import (
        fs_match_weight,
        fs_tf_match_weight,
        fs_weight_constants,
        tf_table,
    )

    recs = spark.createDataFrame(
        [("smith",)] * 90 + [("nakamura",)] * 2 + [("lee",)] * 8,
        "name string",
    )
    tf = tf_table(recs, "name")
    m, u = {"g_name": 0.92}, {"g_name": 0.05}
    cmp_df = spark.createDataFrame(
        [(1, 1, "smith"), (2, 1, "nakamura"), (3, 0, "smith"),
         (4, 1, "unseen-value")],
        "pid int, g_name int, a_name string",
    )
    got = {
        r["pid"]: r["fs_weight_fp"]
        for r in fs_tf_match_weight(
            cmp_df, ["g_name"], m, u, {"g_name": ("a_name", tf)}
        ).collect()
    }
    aw, dw = fs_weight_constants(m, u)["g_name"]
    # rare agreeing value outweighs the common one; common 'smith'
    # (p=0.9 >> u=0.05) is penalized BELOW the unadjusted aw
    assert got[2] > got[1]
    assert got[1] < aw
    # disagreement is untouched by TF
    assert got[3] == dw
    # value absent from the tf table -> delta 0 -> plain aw
    assert got[4] == aw
    # and with tf={} the function degrades to fs_match_weight exactly
    plain = {
        r["pid"]: r["fs_weight_fp"]
        for r in fs_match_weight(cmp_df, ["g_name"], m, u).collect()
    }
    un = {
        r["pid"]: r["fs_weight_fp"]
        for r in fs_tf_match_weight(cmp_df, ["g_name"], m, u, {}).collect()
    }
    assert un == plain


def test_fs_tf_weight_clamps(spark):
    import math

    from hamerkop_spark.operators.linkage import (
        FP_SCALE,
        fs_tf_match_weight,
        fs_weight_constants,
        tf_table,
    )

    # upper cap: a 1-in-1024 value's boost is log2(1024)+log2(u) bits;
    # cap_bits=1 must clip it to aw + 1e6
    recs = spark.createDataFrame(
        [("common",)] * 1023 + [("rare",)], "name string"
    )
    tf = tf_table(recs, "name")
    m, u = {"g": 0.9}, {"g": 0.5}
    cmp_df = spark.createDataFrame(
        [(1, 1, "rare"), (2, 1, "common")], "pid int, g int, a_name string"
    )
    aw, dw = fs_weight_constants(m, u)["g"]
    got = {
        r["pid"]: r["fs_weight_fp"]
        for r in fs_tf_match_weight(
            cmp_df, ["g"], m, u, {"g": ("a_name", tf)}, cap_bits=1.0
        ).collect()
    }
    assert got[1] == aw + FP_SCALE
    # lower clamp: with small m, an all-one-value field's adjusted
    # weight log2(m/p_v)=log2(m) would fall BELOW dw; clamp holds at dw
    m2, u2 = {"g": 0.2}, {"g": 0.1}
    aw2, dw2 = fs_weight_constants(m2, u2)["g"]
    assert math.floor(math.log2(0.2) * FP_SCALE + 0.5) < dw2
    one = spark.createDataFrame([("x",)] * 50, "name string")
    cmp2 = spark.createDataFrame([(1, 1, "x")], "pid int, g int, a_name string")
    got2 = fs_tf_match_weight(
        cmp2, ["g"], m2, u2, {"g": ("a_name", tf_table(one, "name"))}
    ).collect()[0]["fs_weight_fp"]
    assert got2 == dw2
