"""Adaptive sorted-neighborhood (Yan et al. 2007) tests: scalar
differential + the two failure modes of fixed-window SN it exists to
fix."""

import random

from hamerkop_spark.operators.blocking_eval import (
    adaptive_sorted_neighborhood,
    sorted_neighborhood_candidates,
)


def rows(df, *cols):
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def _scalar_asn(recs, max_key_dist=2, max_block_size=50):
    """Scalar reference: sort by (key, id), cut where adjacent keys
    jump, pair within kept blocks."""
    srt = sorted((k, r) for r, k in recs if k is not None)
    blocks, cur = [], []
    for i, (k, r) in enumerate(srt):
        if i > 0 and _lev(srt[i - 1][0], k) > max_key_dist:
            blocks.append(cur)
            cur = []
        cur.append((k, r))
    if cur:
        blocks.append(cur)
    out = []
    for bid, blk in enumerate(blocks, 1):
        if not (2 <= len(blk) <= max_block_size):
            continue
        for i in range(len(blk)):
            for j in range(i + 1, len(blk)):
                out.append((blk[i][1], blk[j][1], bid))
    return sorted(out)


def _df(spark, recs):
    return spark.createDataFrame(recs, ["rec_id", "key"])


def test_differential_random(spark):
    rng = random.Random(5)
    pool = ["smith", "smyth", "smithe", "jones", "jonas",
            "zhang", "zhung", "brown", "browne", "lee"]
    for trial in range(3):
        recs = [
            (i, rng.choice(pool) + (rng.choice(["", "x", "xy"])))
            for i in range(60)
        ]
        got = rows(
            adaptive_sorted_neighborhood(
                _df(spark, recs), "key", "rec_id", bucket=16
            ),
            "a_id", "b_id", "block_id",
        )
        assert got == _scalar_asn(recs), trial


def test_large_family_beyond_fixed_window(spark):
    """12 near-identical keys: fixed window w=5 misses the far pairs;
    the adaptive block holds all 66."""
    recs = [(i, f"smith{i:02d}") for i in range(12)]
    recs += [(100, "zzz-unrelated")]
    df = _df(spark, recs)
    adaptive = rows(
        adaptive_sorted_neighborhood(df, "key", "rec_id", max_key_dist=2),
        "a_id", "b_id",
    )
    fixed = rows(
        sorted_neighborhood_candidates(df, "key", "rec_id", window=5),
        "a_id", "b_id",
    )
    family = [(a, b) for a, b in adaptive if a != 100 and b != 100]
    assert len(family) == 66  # 12 choose 2
    assert (0, 11) in family  # rank distance 11 — invisible to w=5
    assert (0, 11) not in fixed


def test_key_jump_closes_block(spark):
    """Sparse key space: fixed-window SN pairs sort-neighbours that
    share nothing; the adaptive cut emits zero pairs."""
    recs = [(1, "aaaa"), (2, "mmmm"), (3, "zzzz")]
    df = _df(spark, recs)
    adaptive = rows(
        adaptive_sorted_neighborhood(df, "key", "rec_id"), "a_id", "b_id"
    )
    fixed = rows(
        sorted_neighborhood_candidates(df, "key", "rec_id", window=3),
        "a_id", "b_id",
    )
    assert adaptive == []
    assert len(fixed) > 0


def test_oversize_block_purged(spark):
    recs = [(i, "same") for i in range(30)] + [(100, "okA"), (101, "okB")]
    got = rows(
        adaptive_sorted_neighborhood(
            df := _df(spark, recs), "key", "rec_id",
            max_key_dist=1, max_block_size=10,
        ),
        "a_id", "b_id",
    )
    assert got == [(100, 101)]


def test_block_ids_deterministic_across_buckets(spark):
    """Block numbering must not depend on the bucket size (the
    two-level cumsum is an implementation detail)."""
    rng = random.Random(9)
    recs = [(i, rng.choice(["ada", "adb", "pqr", "pqs", "xyz"]))
            for i in range(40)]
    df = _df(spark, recs)
    a = rows(adaptive_sorted_neighborhood(df, "key", "rec_id", bucket=4),
             "a_id", "b_id", "block_id")
    b = rows(adaptive_sorted_neighborhood(df, "key", "rec_id", bucket=4096),
             "a_id", "b_id", "block_id")
    assert a == b
