"""WEP meta-blocking + Newman modularity tests (differential vs scalar
references, plus the semantic stories each operator exists for)."""

import math
import random

from pyspark.sql import functions as F

from hamerkop_spark.operators.blocking_eval import meta_blocking_wep
from hamerkop_spark.operators.scoring import modularity


def rows(df, *cols):
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- WEP


def _scalar_wep(blocks, max_block_size=100, scheme="cbs"):
    """Scalar reference: purge, CBS edges, (E)CBS weights in micro
    units, keep weight*n >= sum (the exact integer mean test)."""
    by_key = {}
    for k, r in set(blocks):
        by_key.setdefault(k, set()).add(r)
    kept = {
        k: v for k, v in by_key.items() if 2 <= len(v) <= max_block_size
    }
    cbs = {}
    for members in kept.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cbs[(a, b)] = cbs.get((a, b), 0) + 1
    if scheme == "cbs":
        w = {p: c * 1_000_000 for p, c in cbs.items()}
    else:
        nb = {}
        for k, members in kept.items():
            for r in members:
                nb[r] = nb.get(r, 0) + 1
        B = float(len(kept))
        w = {
            (a, b): math.floor(
                c * math.log(B / nb[a]) * math.log(B / nb[b]) * 1e6
            )
            for (a, b), c in cbs.items()
        }
    n, s = len(w), sum(w.values())
    return sorted(
        (a, b, wv) for (a, b), wv in w.items() if wv * n >= s
    )


def _random_blocks(rng, n_rec=30, n_keys=12, density=0.25):
    out = []
    for r in range(n_rec):
        for k in range(n_keys):
            if rng.random() < density:
                out.append((f"k{k}", r))
    return out


def test_wep_differential_cbs_and_ecbs(spark):
    rng = random.Random(7)
    for trial in range(3):
        blocks = _random_blocks(rng)
        df = spark.createDataFrame(blocks, ["block_key", "record_id"])
        for scheme in ("cbs", "ecbs"):
            got = rows(
                meta_blocking_wep(df, scheme=scheme),
                "a_id", "b_id", "w_micro",
            )
            want = _scalar_wep(blocks, scheme=scheme)
            assert got == want, (trial, scheme)


def test_wep_mean_bar_story(spark):
    """One pair sharing 3 blocks survives the mean bar; the 1-block
    chaff around it does not (mean = (3+1+1+1)/4 = 1.5)."""
    blocks = [
        ("x1", 1), ("x1", 2), ("x2", 1), ("x2", 2), ("x3", 1), ("x3", 2),
        ("y1", 3), ("y1", 4), ("y2", 5), ("y2", 6), ("y3", 7), ("y3", 8),
    ]
    df = spark.createDataFrame(blocks, ["block_key", "record_id"])
    got = rows(meta_blocking_wep(df), "a_id", "b_id")
    assert got == [(1, 2)]


def test_wep_purges_oversized_blocks(spark):
    big = [("hot", r) for r in range(20)] + [("ok", 1), ("ok", 2)]
    df = spark.createDataFrame(big, ["block_key", "record_id"])
    got = rows(meta_blocking_wep(df, max_block_size=10), "a_id", "b_id")
    assert got == [(1, 2)]


def test_wep_ecbs_downweights_promiscuous_records(spark):
    """Two pairs with the same CBS: under plain CBS both survive (all
    weights equal the mean); under ECBS the pair whose members sit in
    many blocks drops below the mean bar."""
    blocks = [
        # pair (1,2): together in s1, and in NO other blocks
        ("s1", 1), ("s1", 2),
        # pair (3,4): together in s2, but 3 and 4 also haunt 4 blocks each
        ("s2", 3), ("s2", 4),
        ("h1", 3), ("h1", 5), ("h2", 3), ("h2", 6),
        ("h3", 4), ("h3", 7), ("h4", 4), ("h4", 8),
    ]
    df = spark.createDataFrame(blocks, ["block_key", "record_id"])
    cbs_pairs = rows(meta_blocking_wep(df, scheme="cbs"), "a_id", "b_id")
    ecbs_pairs = rows(meta_blocking_wep(df, scheme="ecbs"), "a_id", "b_id")
    assert (1, 2) in cbs_pairs and (3, 4) in cbs_pairs
    assert (1, 2) in ecbs_pairs and (3, 4) not in ecbs_pairs


def test_wep_unknown_scheme_raises(spark):
    df = spark.createDataFrame([("k", 1)], ["block_key", "record_id"])
    try:
        meta_blocking_wep(df, scheme="nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# -------------------------------------------------------- modularity


def _scalar_modularity(assign, edges):
    """Scalar reference with the operator's exact fixed-point algebra."""
    e = {}
    for a, b, s in edges:
        if a == b or a not in assign or b not in assign:
            continue
        k = (min(a, b), max(a, b))
        w = math.floor(s * 1e6 + 0.5)
        e[k] = min(e.get(k, w), w)
    m = sum(e.values())
    w_in, deg = {}, {}
    for (a, b), w in e.items():
        ca, cb = assign[a], assign[b]
        deg[ca] = deg.get(ca, 0) + w
        deg[cb] = deg.get(cb, 0) + w
        if ca == cb:
            w_in[ca] = w_in.get(ca, 0) + w
    out = {}
    for c in set(assign.values()):
        wi, d = w_in.get(c, 0), deg.get(c, 0)
        contrib = (
            math.floor(float(wi) * 1e9 / float(m))
            - math.floor(float(d) * float(d) * 1e9 / (4.0 * float(m) ** 2))
            if m > 0 else 0
        )
        out[str(c)] = contrib
    return out, sum(out.values())


def _mod_df(spark, assign, edges):
    a_df = spark.createDataFrame(
        list(assign.items()), ["mention_key", "cluster"]
    )
    e_df = spark.createDataFrame(edges, ["a_id", "b_id", "score"])
    return modularity(a_df, e_df)


def test_modularity_differential_random(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 20
        assign = {i: f"c{rng.randrange(4)}" for i in range(n)}
        edges = [
            (rng.randrange(n), rng.randrange(n), round(rng.random(), 3))
            for _ in range(60)
        ]
        got = {
            r["cluster"]: r["contrib_nano"]
            for r in _mod_df(spark, assign, edges).collect()
        }
        want, q = _scalar_modularity(assign, edges)
        total = got.pop("__total__")
        assert got == want, trial
        assert total == q, trial


def test_modularity_single_cluster_is_zero(spark):
    """Everything in one cluster: Q = m/m - (2m/2m)^2 = 0 exactly."""
    assign = {i: "all" for i in range(5)}
    edges = [(0, 1, 0.9), (1, 2, 0.8), (3, 4, 0.7)]
    out = {r["cluster"]: r["contrib_nano"]
           for r in _mod_df(spark, assign, edges).collect()}
    assert out["__total__"] == 0


def test_modularity_prefers_respecting_dense_groups(spark):
    """Two triangles + one weak bridge: the 2-cluster partition scores
    far above one-big-cluster (0) and above a partition that cuts a
    triangle in half."""
    tri1 = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    tri2 = [(3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0)]
    bridge = [(2, 3, 0.1)]
    edges = tri1 + tri2 + bridge
    good = {0: "a", 1: "a", 2: "a", 3: "b", 4: "b", 5: "b"}
    bad = {0: "a", 1: "a", 2: "b", 3: "b", 4: "b", 5: "b"}
    q_good = {r["cluster"]: r["contrib_nano"]
              for r in _mod_df(spark, good, edges).collect()}["__total__"]
    q_bad = {r["cluster"]: r["contrib_nano"]
             for r in _mod_df(spark, bad, edges).collect()}["__total__"]
    assert q_good > q_bad > 0
    one = {i: "x" for i in range(6)}
    q_one = {r["cluster"]: r["contrib_nano"]
             for r in _mod_df(spark, one, edges).collect()}["__total__"]
    assert q_one == 0
    assert q_good > 400_000_000  # ~0.45 for this classic shape


def test_modularity_excludes_unassigned_endpoints(spark):
    """An edge to a node outside `assignments` contributes nothing."""
    assign = {0: "a", 1: "a"}
    edges = [(0, 1, 1.0), (1, 99, 1.0)]
    out = {r["cluster"]: (r["w_in_fp"], r["deg_fp"])
           for r in _mod_df(spark, assign, edges).collect()}
    assert out["a"] == (1_000_000, 2_000_000)


# ------------------------------------------------------- RCNP


def _scalar_cnp(blocks, top_k=5, max_block_size=100, reciprocal=False):
    by_key = {}
    for k, r in set(blocks):
        by_key.setdefault(k, set()).add(r)
    kept = {
        k: v for k, v in by_key.items() if 2 <= len(v) <= max_block_size
    }
    cbs = {}
    for members in kept.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cbs[(a, b)] = cbs.get((a, b), 0) + 1
    keep_dirs = {}
    nbrs = {}
    for (a, b), c in cbs.items():
        nbrs.setdefault(a, []).append((b, c))
        nbrs.setdefault(b, []).append((a, c))
    for node, lst in nbrs.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for nbr, _ in lst[:top_k]:
            p = (min(node, nbr), max(node, nbr))
            keep_dirs[p] = keep_dirs.get(p, 0) + 1
    need = 2 if reciprocal else 1
    return sorted(
        (a, b, cbs[(a, b)])
        for (a, b), n in keep_dirs.items() if n >= need
    )


def test_rcnp_differential_and_subset(spark):
    from hamerkop_spark.operators.blocking_eval import meta_blocking_cnp

    rng = random.Random(13)
    for trial in range(3):
        blocks = _random_blocks(rng)
        df = spark.createDataFrame(blocks, ["block_key", "record_id"])
        cnp = rows(meta_blocking_cnp(df, top_k=3), "a_id", "b_id", "cbs")
        rcnp = rows(
            meta_blocking_cnp(df, top_k=3, reciprocal=True),
            "a_id", "b_id", "cbs",
        )
        assert cnp == _scalar_cnp(blocks, top_k=3), trial
        assert rcnp == _scalar_cnp(blocks, top_k=3, reciprocal=True), trial
        assert set(rcnp) <= set(cnp), trial


def test_rcnp_drops_one_sided_affinity(spark):
    """Record 9 shares one block with hub 0, but the hub's top-1 is its
    3-block partner 1: CNP keeps (0,9) via 9's side, RCNP drops it."""
    from hamerkop_spark.operators.blocking_eval import meta_blocking_cnp

    blocks = [
        ("h1", 0), ("h1", 1), ("h2", 0), ("h2", 1), ("h3", 0), ("h3", 1),
        ("w", 0), ("w", 9),
    ]
    df = spark.createDataFrame(blocks, ["block_key", "record_id"])
    cnp = rows(meta_blocking_cnp(df, top_k=1), "a_id", "b_id")
    rcnp = rows(
        meta_blocking_cnp(df, top_k=1, reciprocal=True), "a_id", "b_id"
    )
    assert (0, 9) in cnp and (0, 1) in cnp
    assert rcnp == [(0, 1)]


# -------------------------------------------------------- WNP


def _scalar_wnp(blocks, max_block_size=100, reciprocal=False):
    by_key = {}
    for k, r in set(blocks):
        by_key.setdefault(k, set()).add(r)
    kept = {
        k: v for k, v in by_key.items() if 2 <= len(v) <= max_block_size
    }
    cbs = {}
    for members in kept.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cbs[(a, b)] = cbs.get((a, b), 0) + 1
    inc = {}
    for (a, b), c in cbs.items():
        inc.setdefault(a, []).append(c)
        inc.setdefault(b, []).append(c)
    votes = {}
    for (a, b), c in cbs.items():
        for node in (a, b):
            lst = inc[node]
            if c * len(lst) >= sum(lst):
                votes[(a, b)] = votes.get((a, b), 0) + 1
    need = 2 if reciprocal else 1
    return sorted(
        (a, b, cbs[(a, b)]) for (a, b), v in votes.items() if v >= need
    )


def test_wnp_differential_both_modes(spark):
    from hamerkop_spark.operators.blocking_eval import meta_blocking_wnp

    rng = random.Random(17)
    for trial in range(3):
        blocks = _random_blocks(rng)
        df = spark.createDataFrame(blocks, ["block_key", "record_id"])
        for recip in (False, True):
            got = rows(
                meta_blocking_wnp(df, reciprocal=recip),
                "a_id", "b_id", "cbs",
            )
            assert got == _scalar_wnp(blocks, reciprocal=recip), (
                trial, recip,
            )


def test_wnp_local_bar_vs_wep_global_bar(spark):
    """A locally-strong edge in a weak neighbourhood: pair (8,9) shares
    2 blocks while the corpus is dominated by a 5-block clique pair, so
    the GLOBAL mean (WEP) kills (8,9) but each of 8 and 9 sees it as
    their best-and-only edge, so the LOCAL bar (WNP) keeps it."""
    from hamerkop_spark.operators.blocking_eval import (
        meta_blocking_wep,
        meta_blocking_wnp,
    )

    blocks = []
    for i in range(5):  # pair (1,2): CBS 5
        blocks += [(f"s{i}", 1), (f"s{i}", 2)]
    blocks += [("w1", 8), ("w1", 9), ("w2", 8), ("w2", 9)]  # CBS 2
    df = spark.createDataFrame(blocks, ["block_key", "record_id"])
    wep = rows(meta_blocking_wep(df), "a_id", "b_id")
    wnp = rows(meta_blocking_wnp(df), "a_id", "b_id")
    assert (8, 9) not in wep          # 2*2 < 5+2
    assert (8, 9) in wnp and (1, 2) in wnp


def test_wnp_reciprocal_subset(spark):
    from hamerkop_spark.operators.blocking_eval import meta_blocking_wnp

    rng = random.Random(19)
    blocks = _random_blocks(rng)
    df = spark.createDataFrame(blocks, ["block_key", "record_id"])
    either = set(rows(meta_blocking_wnp(df), "a_id", "b_id"))
    both = set(rows(meta_blocking_wnp(df, reciprocal=True), "a_id", "b_id"))
    assert both <= either
