"""One-call self-dedup plan (plans/dedupe.py)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows
from hamerkop_spark.plans.dedupe import dedupe_records


@pytest.fixture(scope="module")
def noisy(spark):
    data = [
        (1, "John Smith", "NYC"),
        (2, "Jon Smith", "NYC"),          # typo dup of 1
        (3, "JOHN  SMITH", "Boston"),     # case/space dup of 1
        (4, "Mary Jones", "LA"),
        (5, "Marie Jones", None),         # near dup of 4
        (6, "Completely Different", "SF"),
        (7, None, "X"),                   # null name -> singleton
    ]
    return spark.createDataFrame(data, "record_id int, name string, city string")


def test_dedupe_clusters_and_golden(spark, noisy):
    # JW("mary jones", "marie jones") = 0.882 — threshold below it
    out = dedupe_records(noisy, attrs=["name", "city"], jw_threshold=0.85)
    cl = {r.record_id: r.cluster for r in out["clusters"].collect()}
    assert cl[1] == cl[2] == cl[3]
    assert cl[4] == cl[5]
    assert len({cl[1], cl[4], cl[6], cl[7]}) == 4
    assert out["n_clusters"] == 4
    g = {r.cluster: (r.cluster_size, r.name, r.city)
         for r in out["golden"].collect()}
    # john cluster: 3 rows, modal city NYC (2 vs 1); names all distinct
    # post-normalization variants -> value-asc tiebreak on raw strings
    assert g[cl[1]][0] == 3 and g[cl[1]][2] == "NYC"
    # null-name record survives as its own singleton with its city
    assert g[cl[7]] == (1, None, "X")


def test_dedupe_block_cap_prevents_blowup(spark):
    # 200 records share the token "corp": cap 100 skips that key, but
    # the exact key still pairs the two true duplicates
    data = [(i, f"unique{i} corp") for i in range(200)]
    data += [(500, "acme holdings"), (501, "acme holdings")]
    df = spark.createDataFrame(data, "record_id int, name string")
    out = dedupe_records(df, max_block=100, jw_threshold=0.95)
    pairs = rows(out["pairs"], "a_id", "b_id")
    assert (500, 501) in pairs
    # the hot "t:corp" key generated no pairs
    assert out["n_pairs"] < 50


def test_dedupe_unknown_generator_raises(spark, noisy):
    with pytest.raises(ValueError):
        dedupe_records(noisy, blocking=("exact", "zz_bogus"))
    with pytest.raises(ValueError):
        dedupe_records(noisy, blocking=())


def test_dedupe_canopy_blocking_recovers_token_reordered_dups(spark):
    # "maria elena garcia lopez" vs "garcia lopez maria elena": no
    # exact/soundex-head key survives the reorder, but the token-
    # overlap canopy co-blocks them; JW alone would also miss, so
    # check the canopy CANDIDATES carry the pair
    data = [
        (1, "maria elena garcia lopez"),
        (2, "garcia lopez maria elena"),
        (3, "john smith"),
        (4, "totally different person"),
    ]
    df = spark.createDataFrame(data, "record_id int, name string")
    out = dedupe_records(
        df, blocking=("canopy",), jw_threshold=0.99, canopy_t1=4,
        canopy_t2=3,
    )
    pairs = rows(out["pairs"], "a_id", "b_id")
    assert (1, 2) in pairs


def test_dedupe_pairwise_f1_on_synthetic_dups(spark):
    """150 base names, each duplicated with a deterministic character
    edit — pairwise F1 of the plan's clusters vs truth must be >= 0.95."""
    import random

    from hamerkop_spark.operators.scoring import pairwise_f1

    rng = random.Random(5)
    first = ["james", "maria", "robert", "linda", "michael", "sarah",
             "david", "karen", "thomas", "nancy"]
    last = ["johnson", "williams", "brown", "garcia", "miller", "davis",
            "martinez", "wilson", "anderson", "taylor"]
    rows_, labeled = [], []
    rid = 0
    for i in range(150):
        name = f"{rng.choice(first)} {rng.choice(last)} {i}"
        dup = list(name)
        pos = rng.randrange(len(dup) - 2)
        dup[pos] = "x" if dup[pos] != "x" else "y"
        a, b = rid, rid + 1
        rid += 2
        rows_ += [(a, name), (b, "".join(dup))]
        labeled.append((a, b, 1))
        if i:
            labeled.append((a, a - 2, 0))
    df = spark.createDataFrame(rows_, "record_id int, name string")
    out = dedupe_records(df, jw_threshold=0.9)
    lp = spark.createDataFrame(labeled, "key_a int, key_b int, label int")
    r = pairwise_f1(
        out["clusters"].select(
            F.col("record_id").alias("mention_id"), "cluster"
        ),
        lp,
    )
    assert r.f1 >= 0.95, r


def test_dedupe_pivot_clustering_partitions(spark, noisy):
    out = dedupe_records(
        noisy, attrs=["name", "city"], jw_threshold=0.85, clustering="pivot"
    )
    cl = {r.record_id: r.cluster for r in out["clusters"].collect()}
    # every record clustered exactly once (partition, incl. singletons)
    assert sorted(cl) == [1, 2, 3, 4, 5, 6, 7]
    assert cl[4] == cl[5]
    assert len({cl[6], cl[7]}) == 2 and cl[6] != cl[4] and cl[7] != cl[4]
    # the john triple is a clique at this threshold -> pivot keeps it
    # together (the pivot grabs both neighbours in one step)
    assert cl[1] == cl[2] == cl[3]


def test_dedupe_pivot_breaks_chains_cc_merges(spark):
    # A~B and B~C but never A~C: transitive closure merges all three,
    # pivot cannot put A and C in one cluster without an A-C edge
    data = [
        (1, "jonathan smithers"),
        (2, "jonathan smither"),    # jw(1,2) high
        (3, "jonathan smitherx"),   # jw(2,3) high, jw(1,3) lower
    ]
    df = spark.createDataFrame(data, "record_id int, name string")
    # pick a threshold between jw(1,3) and min(jw(1,2), jw(2,3))
    probe = dedupe_records(df, jw_threshold=0.0)["pairs"].collect()
    jw = {(r.a_id, r.b_id): r.jw for r in probe}
    thr = (jw[(1, 3)] + min(jw[(1, 2)], jw[(2, 3)])) / 2
    cc = dedupe_records(df, jw_threshold=thr, clustering="cc")
    pv = dedupe_records(df, jw_threshold=thr, clustering="pivot")
    cc_cl = {r.record_id: r.cluster for r in cc["clusters"].collect()}
    pv_cl = {r.record_id: r.cluster for r in pv["clusters"].collect()}
    assert cc_cl[1] == cc_cl[2] == cc_cl[3]          # chained
    assert not (pv_cl[1] == pv_cl[2] == pv_cl[3])    # partitioned
    assert len(set(pv_cl.values())) == 2


def test_dedupe_unknown_clustering_raises(spark, noisy):
    with pytest.raises(ValueError):
        dedupe_records(noisy, clustering="zz_bogus")


def test_dedupe_soft_tfidf_scorer_handles_token_reorder(spark):
    # whole-string JW collapses on token reordering; corpus-weighted
    # token matching does not
    data = [
        (1, "john smith"),
        (2, "smith john"),          # same tokens, reordered
        (3, "mary jones"),
        (4, "unrelated name"),
    ]
    df = spark.createDataFrame(data, "record_id int, name string")
    jw = dedupe_records(df, jw_threshold=0.9, scorer="jw")
    soft = dedupe_records(df, jw_threshold=0.9, scorer="soft_tfidf")
    jw_cl = {r.record_id: r.cluster for r in jw["clusters"].collect()}
    s_cl = {r.record_id: r.cluster for r in soft["clusters"].collect()}
    assert jw_cl[1] != jw_cl[2]          # JW misses the reorder
    assert s_cl[1] == s_cl[2]            # SoftTFIDF pairs it (score 1.0)
    assert s_cl[3] != s_cl[1] and s_cl[4] != s_cl[1]
    # both scorers expose the unified score column
    assert "score" in jw["pairs"].columns
    assert "score" in soft["pairs"].columns
    sc = {(r.a_id, r.b_id): r.score for r in soft["pairs"].collect()}
    assert abs(sc[(1, 2)] - 1.0) < 1e-6


def test_dedupe_unknown_scorer_raises(spark, noisy):
    with pytest.raises(ValueError):
        dedupe_records(noisy, scorer="zz_bogus")


def test_dedupe_hac_clustering_partitions(spark, noisy):
    out = dedupe_records(
        noisy, attrs=["name", "city"], jw_threshold=0.85, clustering="hac"
    )
    cl = {r.record_id: r.cluster for r in out["clusters"].collect()}
    assert sorted(cl) == [1, 2, 3, 4, 5, 6, 7]
    assert cl[4] == cl[5]
    # the john triple is a clique at this threshold: its cross-pair
    # averages stay above the cut, so average linkage keeps it whole
    assert cl[1] == cl[2] == cl[3]


def test_dedupe_hac_dilutes_chain_cc_merges(spark):
    # same A~B~C chain as the pivot test: after {1,2} (or {2,3})
    # merges, the cluster-pair average to the third record falls
    # under the cut (the unscored far pair counts 0), so HAC splits
    # what CC chains.
    data = [
        (1, "jonathan smithers"),
        (2, "jonathan smither"),
        (3, "jonathan smitherx"),
    ]
    df = spark.createDataFrame(data, "record_id int, name string")
    probe = dedupe_records(df, jw_threshold=0.0)["pairs"].collect()
    jw = {(r.a_id, r.b_id): r.jw for r in probe}
    thr = (jw[(1, 3)] + min(jw[(1, 2)], jw[(2, 3)])) / 2
    cc = dedupe_records(df, jw_threshold=thr, clustering="cc")
    hc = dedupe_records(df, jw_threshold=thr, clustering="hac")
    cc_cl = {r.record_id: r.cluster for r in cc["clusters"].collect()}
    hc_cl = {r.record_id: r.cluster for r in hc["clusters"].collect()}
    assert cc_cl[1] == cc_cl[2] == cc_cl[3]
    assert not (hc_cl[1] == hc_cl[2] == hc_cl[3])
    assert len(set(hc_cl.values())) == 2


def test_dedupe_lpa_clustering_covers_all_records(spark, noisy):
    out = dedupe_records(
        noisy, attrs=["name", "city"], jw_threshold=0.85,
        clustering="lpa", lpa_rounds=4,
    )
    cl = {r.record_id: r.cluster for r in out["clusters"].collect()}
    assert sorted(cl) == [1, 2, 3, 4, 5, 6, 7]
    assert cl[4] == cl[5]
    assert cl[1] == cl[2] == cl[3]


def test_dedupe_meta_pruning_keeps_dups_prunes_chaff(spark):
    """On a realistic mix (multi-key duplicate families + one-shared-
    token chaff) the WEP mean bar and CNP top-k both keep the true
    pairs and prune chaff volume. (On a chaff-FREE graph WEP's mean is
    all signal and correctly prunes the weaker true pairs — that
    degenerate case is pinned in test_meta_wep_modularity.py.)"""
    data = [
        (1, "John Smith", None), (2, "Jon Smith", None),
        (3, "JOHN  SMITH", None), (4, "Mary Jones", None),
        (5, "Marie Jones", None),
    ]
    # chaff: 20 records whose pairs share only the "common" token and
    # its soundex (CBS 2) — distinct first letters keep the filler
    # words' soundex codes from forming a 20-record block of their own
    data += [
        (10 + i, f"{chr(98 + i)}iller{i} common", None) for i in range(20)
    ]
    df = spark.createDataFrame(data, "record_id int, name string, x string")
    base = dedupe_records(df, jw_threshold=0.85)
    for mode in ("wep", "cnp", "rcnp", "wnp"):
        out = dedupe_records(df, jw_threshold=0.85, meta_pruning=mode)
        cl = {r.record_id: r.cluster for r in out["clusters"].collect()}
        assert cl[1] == cl[2] == cl[3], mode
        assert cl[4] == cl[5], mode
        assert out["n_pairs"] <= base["n_pairs"], mode


def test_dedupe_adaptive_sn_generator_catches_sort_adjacent(spark):
    # single-token misspelling: no shared exact/token key; with ONLY
    # the adaptive_sn generator the sort-adjacency still pairs them
    data = [(1, "katherine"), (2, "katherina"), (3, "zzz unrelated")]
    df = spark.createDataFrame(data, "record_id int, name string")
    out = dedupe_records(
        df, blocking=("adaptive_sn",), jw_threshold=0.9, asn_key_dist=2
    )
    pairs = rows(out["pairs"], "a_id", "b_id")
    assert (1, 2) in pairs
    cl = {r.record_id: r.cluster for r in out["clusters"].collect()}
    assert cl[1] == cl[2] != cl[3]


def test_dedupe_meta_and_budget_guards(spark, noisy):
    with pytest.raises(ValueError):
        dedupe_records(noisy, meta_pruning="wep", budget=10)
    with pytest.raises(ValueError):
        dedupe_records(noisy, meta_pruning="zz")
    with pytest.raises(ValueError):
        dedupe_records(noisy, blocking=("adaptive_sn",), budget=10)
