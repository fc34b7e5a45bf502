"""Canopy clustering (operators/canopy.py): exact parity with a
scalar oracle of the min-id dominance rule, total coverage, and the
blocking-recall behaviour the technique exists for."""

import random

from pyspark.sql import functions as F

from hamerkop_spark.operators.canopy import (
    canopy_assignments,
    canopy_candidates,
    token_overlap_pairs,
)


def _scalar_canopies(recs, t1, t2, max_posting=500):
    """Pure-python oracle of the same deterministic rule: inverted
    index + posting purge, min-id dominance centers, loose-close
    membership, singleton fallback."""
    tok_sets = {rid: set(toks) for rid, toks in recs}
    posting = {}
    for rid, toks in tok_sets.items():
        for t in toks:
            posting.setdefault(t, set()).add(rid)
    posting = {
        t: rs for t, rs in posting.items() if 2 <= len(rs) <= max_posting
    }
    ov = {}
    for rs in posting.values():
        rs = sorted(rs)
        for i, a in enumerate(rs):
            for b in rs[i + 1:]:
                ov[(a, b)] = ov.get((a, b), 0) + 1
    centers = {
        r
        for r in tok_sets
        if not any(
            ov.get((s, r), 0) >= t1 for s in tok_sets if s < r
        )
    }
    out = {(c, c) for c in centers}
    for (a, b), n in ov.items():
        if n >= t2:
            if a in centers:
                out.add((b, a))
            if b in centers:
                out.add((a, b))
    covered = {r for r, _ in out}
    out |= {(r, r) for r in tok_sets if r not in covered}
    return out


def _to_df(spark, recs):
    return spark.createDataFrame(
        recs, "record_id int, tokens array<string>"
    )


def test_canopy_matches_scalar_oracle(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    recs = [
        (i, rng.sample(vocab, rng.randint(2, 6))) for i in range(120)
    ]
    got = {
        (r.record_id, r.center_id)
        for r in canopy_assignments(
            _to_df(spark, recs), t1_overlap=3, t2_overlap=2
        ).collect()
    }
    assert got == _scalar_canopies(recs, t1=3, t2=2)


def test_canopy_total_coverage_and_center_self_rows(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(20)]
    recs = [(i, rng.sample(vocab, 4)) for i in range(80)]
    asn = canopy_assignments(
        _to_df(spark, recs), t1_overlap=3, t2_overlap=2
    ).collect()
    covered = {r.record_id for r in asn}
    assert covered == {i for i, _ in recs}
    centers = {r.center_id for r in asn}
    self_rows = {r.record_id for r in asn if r.record_id == r.center_id}
    # every center canopies itself (fallback singletons included)
    assert centers <= self_rows


def test_canopy_posting_purge_drops_stopword_token(spark):
    # 'the' is in every record: with the purge it contributes no pairs
    recs = [(i, ["the", f"u{i}", f"u{i + 1}"]) for i in range(10)]
    ov = {
        (r.a_id, r.b_id): r.ov
        for r in token_overlap_pairs(
            _to_df(spark, recs), min_overlap=1, max_posting=5
        ).collect()
    }
    # only adjacent records share a surviving u-token
    assert set(ov) == {(i, i + 1) for i in range(9)}
    assert all(v == 1 for v in ov.values())


def test_canopy_candidates_cover_tight_duplicates(spark):
    # duplicate-bearing corpus: each base record gets a near-copy
    # sharing 4 of 5 tokens; canopy blocking must co-canopy the pair
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(400)]
    recs, gold = [], set()
    for i in range(0, 300, 2):
        toks = rng.sample(vocab, 5)
        dup = toks[:4] + [rng.choice(vocab)]
        recs.append((i, toks))
        recs.append((i + 1, dup))
        gold.add((i, i + 1))
    asn = canopy_assignments(
        _to_df(spark, recs), t1_overlap=5, t2_overlap=3
    )
    cands = {
        (r.a_id, r.b_id) for r in canopy_candidates(asn).collect()
    }
    recall = len(gold & cands) / len(gold)
    assert recall >= 0.95
    # and it is a real reduction: nowhere near all-pairs
    n = len(recs)
    assert len(cands) < 0.2 * n * (n - 1) / 2


def test_canopy_t1_below_t2_rejected(spark):
    try:
        canopy_assignments(
            _to_df(spark, [(1, ["a"])]), t1_overlap=1, t2_overlap=2
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_canopy_deterministic_across_runs(spark):
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(25)]
    recs = [(i, rng.sample(vocab, 4)) for i in range(60)]
    df = _to_df(spark, recs)
    one = {
        (r.record_id, r.center_id)
        for r in canopy_assignments(
            df, t1_overlap=3, t2_overlap=2
        ).collect()
    }
    two = {
        (r.record_id, r.center_id)
        for r in canopy_assignments(
            df.repartition(7), t1_overlap=3, t2_overlap=2
        ).collect()
    }
    assert one == two
