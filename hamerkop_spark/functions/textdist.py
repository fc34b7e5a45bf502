"""String-distance bundle: batched Arrow/pandas UDFs + native forms.

The reference computes min-over-name-pairs normalized Levenshtein
(hamerkop/features.py:191-204, resolver.py:306-322) with the C
`editdistance` package, row at a time. Here:

* Levenshtein on exploded name pairs uses the native `F.levenshtein`
  (JVM, codegen) — the preferred scale path.
* Jaro-Winkler (north_rule feature) has no native Spark function; it is a
  pandas UDF batched via Arrow, never per-row Python.
* token-set Jaccard and cosine are pure-native (array_intersect /
  zip_with + aggregate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def levenshtein_norm(a: Column, b: Column) -> Column:
    """Normalized edit distance d/max(len) (features.py:201), native.
    Two empty strings are identical -> 0.0 (the greatest(...,1) floor
    also keeps ANSI mode — Spark 4 default — from raising
    DIVIDE_BY_ZERO on that pair)."""
    return F.levenshtein(a, b) / F.greatest(
        F.length(a), F.length(b), F.lit(1)
    )


def token_jaccard(a: Column, b: Column) -> Column:
    """Jaccard over token arrays; 0.0 when union empty."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def shared_token_ratio(tokens_a: Column, tokens_b: Column) -> Column:
    """|A ∩ B| / |A| — the asymmetric overlap of SharedTokensFeature
    (features.py:156-171), on token-set arrays."""
    inter = F.size(F.array_intersect(tokens_a, tokens_b)).cast("double")
    return F.when(F.size(tokens_a) == 0, F.lit(0.0)).otherwise(
        inter / F.size(tokens_a).cast("double")
    )


def cosine_native(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns, fully
    native: zip_with for the dot product, aggregate for norms."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler_py(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Reference-free Jaro-Winkler (standard definition, prefix cap 4)."""
    j = _jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1.0 - j)


def jaro_winkler_np(
    xs: np.ndarray, ys: np.ndarray, prefix_weight: float = 0.1
) -> np.ndarray:
    """Batch-vectorized Jaro-Winkler over two equal-length arrays of
    strings (numpy unicode arrays): length-bucketed dispatch over the
    O(L1*L2) vectorized core below. The core's window scan runs
    L_max * (2*w_max + 1) boolean passes over the WHOLE batch, where
    both maxima are batch-global — so 0.5% of 60-char names in a batch
    of 15-char names makes every row pay the 60-char window (measured
    10x on exactly that mix). Sorting pairs by max(len) into
    power-of-two buckets and scoring each bucket with its own tight
    window removes the skew tax without changing a single result (the
    core is elementwise across rows; property tests pin parity vs the
    scalar oracle)."""
    n = len(xs)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    if n <= _JW_BUCKET_MIN:
        # would flush as ONE bucket anyway — skip the sort, the two
        # fancy-index input copies, and the output scatter
        return _jaro_winkler_np_core(xs, ys, prefix_weight)
    key = np.maximum(np.char.str_len(xs), np.char.str_len(ys))
    order = np.argsort(key, kind="stable")
    sk = key[order]
    out = np.empty(n, dtype=np.float64)
    # adaptive buckets: walk distinct key lengths in ascending order and
    # flush once a bucket holds >= _JW_BUCKET_MIN rows, so each core call
    # is (a) length-tight — sorted keys mean a bucket's window is set by
    # its own longest member, outliers only ever pool with other long
    # strings — and (b) big enough to amortize the core's fixed numpy
    # cost (exact per-length buckets measured SLOWER than no bucketing
    # at Arrow-batch sizes; this rule wins in both regimes: 3.3x at
    # 500k rows, 1.8x at 10k-row batches on the KB name distribution).
    seg = np.concatenate([[0], np.nonzero(np.diff(sk))[0] + 1, [n]])
    start = 0
    for e in seg[1:]:
        e = int(e)
        if e - start >= _JW_BUCKET_MIN or e == n:
            idx = order[start:e]
            out[idx] = _jaro_winkler_np_core(xs[idx], ys[idx], prefix_weight)
            start = e
    return out


_JW_BUCKET_MIN = 4096


def _jaro_winkler_np_core(
    xs: np.ndarray, ys: np.ndarray, prefix_weight: float = 0.1
) -> np.ndarray:
    """One homogeneous-length bucket: the matching-window scan as
    vectorized column ops over the whole bucket instead of a Python
    loop per pair. Same definition as ``jaro_winkler_py`` (verified
    identical by property test).

    The scan is memory-bandwidth-bound at 8+ parallel workers, so the
    inner loop is written for minimum traffic: all-Latin-1 buckets
    narrow the code-point matrices uint32 -> uint8 (4x fewer bytes per
    comparison pass — the common case for lowercased web names), the
    per-(i,j) window test is a precomputed column lookup (w >= |i-j|)
    instead of two fresh comparisons, and the match bookkeeping runs
    as in-place &=/^= updates (a candidate set is always a subset of
    the mask it updates) rather than fresh boolean temporaries."""
    n = len(xs)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    l1 = np.char.str_len(xs).astype(np.int64)
    l2 = np.char.str_len(ys).astype(np.int64)
    maxw = max(int(l1.max(initial=1)), 1)
    maxw2 = max(int(l2.max(initial=1)), 1)
    # fixed-width UCS4 views: (n, L) code-point matrices, zero padded
    A = xs.astype(f"U{maxw}").view(np.uint32).reshape(n, maxw)
    B = ys.astype(f"U{maxw2}").view(np.uint32).reshape(n, maxw2)
    if A.max(initial=0) < 256 and B.max(initial=0) < 256:
        A = A.astype(np.uint8)
        B = B.astype(np.uint8)

    w = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
    wmax = int(w.max(initial=0))
    # W[:, k] == (w >= k): the window test j in [i-w, i+w] becomes one
    # column lookup at k = |i-j| (combined with j < l2 via um2 below)
    W = w[:, None] >= np.arange(wmax + 1, dtype=np.int64)[None, :]
    validB = l2[:, None] > np.arange(maxw2, dtype=np.int64)[None, :]
    um2 = validB.copy()  # True = position j of B is still matchable
    m1 = np.zeros((n, maxw), dtype=bool)
    matches = np.zeros(n, dtype=np.int64)
    rem = np.empty(n, dtype=bool)
    for i in range(maxw):
        np.greater(l1, i, out=rem)  # rem = active rows not yet matched at i
        if not rem.any():
            break
        c = A[:, i]
        jlo = max(0, i - wmax)
        jhi = min(maxw2, i + wmax + 1)
        for j in range(jlo, jhi):
            k = abs(i - j)
            cand = B[:, j] == c
            if k:
                cand &= W[:, k]
            cand &= rem
            cand &= um2[:, j]
            if cand.any():
                um2[:, j] ^= cand  # cand is a subset of um2[:, j]
                rem ^= cand        # cand is a subset of rem
                m1[:, i] |= cand
        matches += m1[:, i]
    m2 = validB & ~um2

    # transpositions: compact matched code points in position order and
    # count index-wise mismatches between the two compacted sequences
    out1 = np.zeros((n, maxw), dtype=A.dtype)
    r1, c1 = np.nonzero(m1)
    ranks1 = (np.cumsum(m1, axis=1)[r1, c1] - 1)
    out1[r1, ranks1] = A[r1, c1]
    out2 = np.zeros((n, maxw2), dtype=B.dtype)
    r2, c2 = np.nonzero(m2)
    ranks2 = (np.cumsum(m2, axis=1)[r2, c2] - 1)
    out2[r2, ranks2] = B[r2, c2]
    k = min(maxw, maxw2)
    pos = np.arange(k)
    valid = pos[None, :] < matches[:, None]
    t = ((out1[:, :k] != out2[:, :k]) & valid).sum(axis=1) // 2

    m = matches.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    jaro = np.where(matches == 0, 0.0, jaro)
    jaro = np.where((l1 == 0) | (l2 == 0), 0.0, jaro)

    # winkler prefix boost (common prefix up to 4) where jaro > 0.7
    p = np.zeros(n, dtype=np.float64)
    still = np.ones(n, dtype=bool)
    for i in range(min(4, maxw, maxw2)):
        still = still & (i < l1) & (i < l2) & (A[:, i] == B[:, i])
        p += still
    jw = np.where(jaro > 0.7, jaro + p * prefix_weight * (1.0 - jaro), jaro)
    # scalar definition: identical strings (including "" == "") are 1.0
    return np.where(xs == ys, 1.0, jw)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler similarity, numpy-vectorized across the
    batch (no native JVM impl exists; this is the one deliberate Python
    crossing in the scoring bundle)."""
    av = a.fillna("").to_numpy(dtype=object)
    bv = b.fillna("").to_numpy(dtype=object)
    xs = np.array(av, dtype="U")
    ys = np.array(bv, dtype="U")
    return pd.Series(jaro_winkler_np(xs, ys))


@F.pandas_udf(DoubleType())
def jaro_winkler_max_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Max Jaro-Winkler over the cross product of two small name arrays
    (lowercased) — the pairwise-scoring bundle form (north_rule). The
    cross products are flattened across the whole Arrow batch, scored in
    one vectorized call, then segment-maxed back per row."""
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    flat_x: list[str] = []
    flat_y: list[str] = []
    idx: list[int] = []
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    for i in range(n):
        xs = av[i]
        ys = bv[i]
        if xs is None or ys is None or len(xs) == 0 or len(ys) == 0:
            continue
        for x in xs:
            for y in ys:
                flat_x.append(x)
                flat_y.append(y)
                idx.append(i)
    if flat_x:
        X = np.char.lower(np.array(flat_x, dtype="U"))
        Y = np.char.lower(np.array(flat_y, dtype="U"))
        jw = jaro_winkler_np(X, Y)
        np.maximum.at(out, np.array(idx, dtype=np.int64), jw)
    return pd.Series(out)


def levenshtein_py(s1: str, s2: str) -> int:
    """Pure-python Levenshtein for parity tests against F.levenshtein."""
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def monge_elkan_py(
    xs: list[str], ys: list[str], sim=None
) -> float:
    """Scalar symmetric Monge-Elkan (Monge & Elkan 1996; symmetrized
    mean-of-both-directions form, Jimenez et al. 2009):

        ME(A,B) = 1/|A| * sum_{x in A} max_{y in B} sim(x, y)
        score   = (ME(A,B) + ME(B,A)) / 2

    Used as the test oracle for ``monge_elkan_udf``."""
    sim = sim or jaro_winkler_py
    if not xs or not ys:
        return 0.0

    def one_way(a, b):
        return sum(max(sim(x, y) for y in b) for x in a) / len(a)

    return (one_way(xs, ys) + one_way(ys, xs)) / 2.0


@F.pandas_udf(DoubleType())
def monge_elkan_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Symmetric Monge-Elkan over two token arrays with the vectorized
    Jaro-Winkler kernel as the inner similarity — the classic hybrid
    that forgives token reordering AND per-token typos at once
    ("jon q smith" vs "smith jonathan").

    All token cross products in the Arrow batch are flattened into ONE
    jaro_winkler_np call (the same batching trick as
    jaro_winkler_max_udf), then segment-maxed per (row, direction,
    source token) and segment-meaned per direction with np.maximum.at /
    np.add.at — no per-row Python in the scoring loop."""
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    flat_x: list[str] = []
    flat_y: list[str] = []
    slot_of_pair: list[int] = []
    slot_row: list[int] = []
    slot_dir: list[int] = []
    n_slots = 0
    for i in range(n):
        xs, ys = av[i], bv[i]
        if xs is None or ys is None or len(xs) == 0 or len(ys) == 0:
            continue
        for d, (src, dst) in enumerate(((xs, ys), (ys, xs))):
            for x in src:
                for y in dst:
                    flat_x.append(x)
                    flat_y.append(y)
                    slot_of_pair.append(n_slots)
                slot_row.append(i)
                slot_dir.append(d)
                n_slots += 1
    if not flat_x:
        return pd.Series(out)
    X = np.char.lower(np.array(flat_x, dtype="U"))
    Y = np.char.lower(np.array(flat_y, dtype="U"))
    jw = jaro_winkler_np(X, Y)
    slot_max = np.zeros(n_slots, dtype=np.float64)
    np.maximum.at(slot_max, np.array(slot_of_pair, dtype=np.int64), jw)
    rows = np.array(slot_row, dtype=np.int64)
    dirs = np.array(slot_dir, dtype=np.int64)
    sums = np.zeros((n, 2), dtype=np.float64)
    cnts = np.zeros((n, 2), dtype=np.float64)
    np.add.at(sums, (rows, dirs), slot_max)
    np.add.at(cnts, (rows, dirs), 1.0)
    has = cnts[:, 0] > 0
    out[has] = (
        sums[has, 0] / cnts[has, 0] + sums[has, 1] / cnts[has, 1]
    ) / 2.0
    return pd.Series(out)


# --------------------------------------------------------- affine gap

# Integer edit costs (Gotoh 1982 / Bilenko & Mooney KDD'03 affine-gap
# edit distance): a contiguous gap of length g costs open + (g-1)*ext,
# so ONE block insertion ("John Smith" -> "John Q. Smith") is far
# cheaper than the same character count scattered as isolated edits —
# the failure mode of plain Levenshtein on truncated / middle-name /
# initialed person names. sub > ext keeps single-char typos cheaper
# than a close-and-reopen; open > sub keeps gaps from shadowing
# substitutions.
AFFINE_SUB = 2
AFFINE_OPEN = 3
AFFINE_EXT = 1

_AFFINE_INF = np.int64(1) << 40


def affine_gap_py(
    s1: str, s2: str,
    sub: int = AFFINE_SUB, open_: int = AFFINE_OPEN, ext: int = AFFINE_EXT,
) -> int:
    """Scalar Gotoh affine-gap edit distance (three-matrix DP) — the
    parity oracle for ``affine_gap_np``. Exact integers throughout."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0:
        return 0 if l2 == 0 else open_ + (l2 - 1) * ext
    if l2 == 0:
        return open_ + (l1 - 1) * ext
    inf = int(_AFFINE_INF)
    m_prev = [0] + [inf] * l2
    y_prev = [inf] + [open_ + j * ext for j in range(l2)]
    x_prev = [inf] * (l2 + 1)
    for i in range(1, l1 + 1):
        m_cur = [inf] * (l2 + 1)
        x_cur = [inf] * (l2 + 1)
        y_cur = [inf] * (l2 + 1)
        x_cur[0] = open_ + (i - 1) * ext
        for j in range(1, l2 + 1):
            d = 0 if s1[i - 1] == s2[j - 1] else sub
            m_cur[j] = min(m_prev[j - 1], x_prev[j - 1], y_prev[j - 1]) + d
            x_cur[j] = min(
                m_prev[j] + open_, x_prev[j] + ext, y_prev[j] + open_
            )
            y_cur[j] = min(
                m_cur[j - 1] + open_, y_cur[j - 1] + ext, x_cur[j - 1] + open_
            )
        m_prev, x_prev, y_prev = m_cur, x_cur, y_cur
    return min(m_prev[l2], x_prev[l2], y_prev[l2])


def affine_gap_sim_py(s1: str, s2: str) -> float:
    """[0,1] similarity form: 1 - dist / cost(delete all + insert all).
    The normalizer is an always-available alignment, so dist <= it."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    worst = 2 * AFFINE_OPEN + (l1 - 1 + l2 - 1) * AFFINE_EXT
    return 1.0 - affine_gap_py(s1, s2) / worst


def _affine_gap_np_core(
    xs: np.ndarray, ys: np.ndarray,
    sub: int, open_: int, ext: int,
) -> np.ndarray:
    """One length bucket of the batch-vectorized Gotoh DP: outer loop
    over positions of x only; each row of M / X is elementwise over
    (batch, L2), and the gap-in-x matrix Y — whose textbook recurrence
    is sequential in j — is closed into a min-plus prefix scan,

        Y[i][j] = min_{k<j}( min(M,X)[i][k] + open + (j-1-k)*ext )
                = runmin_{k<j}( min(M,X)[i][k] - k*ext ) + open + (j-1)*ext,

    one ``np.minimum.accumulate`` per row. Total python iterations =
    L1_max of the bucket, everything else vectorized int64."""
    n = len(xs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    l1 = np.char.str_len(xs).astype(np.int64)
    l2 = np.char.str_len(ys).astype(np.int64)
    maxw = max(int(l1.max(initial=1)), 1)
    maxw2 = max(int(l2.max(initial=1)), 1)
    A = xs.astype(f"U{maxw}").view(np.uint32).reshape(n, maxw)
    B = ys.astype(f"U{maxw2}").view(np.uint32).reshape(n, maxw2)
    if A.max(initial=0) < 256 and B.max(initial=0) < 256:
        A = A.astype(np.uint8)
        B = B.astype(np.uint8)
    inf = _AFFINE_INF
    jj = np.arange(maxw2 + 1, dtype=np.int64)
    # row 0 boundaries
    m_prev = np.full((n, maxw2 + 1), inf, dtype=np.int64)
    m_prev[:, 0] = 0
    y_prev = np.full((n, maxw2 + 1), inf, dtype=np.int64)
    y_prev[:, 1:] = open_ + (jj[1:] - 1) * ext
    x_prev = np.full((n, maxw2 + 1), inf, dtype=np.int64)
    # columns beyond each row's own l2 must stay "unreachable": mask
    # once at the end by gathering at column l2 — intermediate junk in
    # the padding columns never flows left, and M/X/Y only read
    # equal-or-lower columns of the previous row plus lower columns of
    # the current row, all of which are exact for j <= l2.
    for i in range(1, maxw + 1):
        active = l1 >= i
        if not active.any():
            break
        d = np.where(B == A[:, i - 1][:, None], 0, sub).astype(np.int64)
        m_cur = np.full((n, maxw2 + 1), inf, dtype=np.int64)
        x_cur = np.full((n, maxw2 + 1), inf, dtype=np.int64)
        prev_best = np.minimum(np.minimum(m_prev, x_prev), y_prev)
        m_cur[:, 1:] = prev_best[:, :-1] + d
        x_cur[:, 0] = open_ + (i - 1) * ext
        x_cur[:, 1:] = np.minimum(
            np.minimum(m_prev[:, 1:], y_prev[:, 1:]) + open_,
            x_prev[:, 1:] + ext,
        )
        # Y via the min-plus prefix scan over min(M,X) of THIS row
        base = np.minimum(m_cur, x_cur)
        run = np.minimum.accumulate(base - jj[None, :] * ext, axis=1)
        y_cur = np.full((n, maxw2 + 1), inf, dtype=np.int64)
        y_cur[:, 1:] = run[:, :-1] + open_ + (jj[1:] - 1) * ext
        np.minimum(y_cur, inf, out=y_cur)
        # rows already past their own length keep their final state
        m_prev = np.where(active[:, None], m_cur, m_prev)
        x_prev = np.where(active[:, None], x_cur, x_prev)
        y_prev = np.where(active[:, None], y_cur, y_prev)
    best = np.minimum(np.minimum(m_prev, x_prev), y_prev)
    out = best[np.arange(n), l2]
    # empty-side conventions (the DP above assumes l1 >= 1 reached)
    gap_all = lambda l: open_ + (l - 1) * ext  # noqa: E731
    out = np.where(l1 == 0, np.where(l2 == 0, 0, gap_all(l2)), out)
    out = np.where((l2 == 0) & (l1 > 0), gap_all(l1), out)
    return out.astype(np.int64)


def affine_gap_np(
    xs: np.ndarray, ys: np.ndarray,
    sub: int = AFFINE_SUB, open_: int = AFFINE_OPEN, ext: int = AFFINE_EXT,
) -> np.ndarray:
    """Batch affine-gap distances with the same adaptive max-length
    bucketing as ``jaro_winkler_np`` (the DP pads every row to the
    bucket-global (L1,L2), so one long outlier must not tax the whole
    Arrow batch)."""
    n = len(xs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n <= _JW_BUCKET_MIN:
        return _affine_gap_np_core(xs, ys, sub, open_, ext)
    key = np.maximum(np.char.str_len(xs), np.char.str_len(ys))
    order = np.argsort(key, kind="stable")
    sk = key[order]
    out = np.empty(n, dtype=np.int64)
    seg = np.concatenate([[0], np.nonzero(np.diff(sk))[0] + 1, [n]])
    start = 0
    for e in seg[1:]:
        e = int(e)
        if e - start >= _JW_BUCKET_MIN or e == n:
            idx = order[start:e]
            out[idx] = _affine_gap_np_core(xs[idx], ys[idx], sub, open_, ext)
            start = e
    return out


@F.pandas_udf(DoubleType())
def affine_gap_sim_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched affine-gap similarity in [0,1] (Gotoh distance
    normalized by the delete-all+insert-all alignment cost): the
    block-gap-tolerant member of the scorer set — middle names,
    initials, and truncations cost ONE gap open, where Levenshtein and
    Jaro-Winkler charge every character."""
    av = a.fillna("").to_numpy(dtype=object)
    bv = b.fillna("").to_numpy(dtype=object)
    xs = np.array(av, dtype="U")
    ys = np.array(bv, dtype="U")
    dist = affine_gap_np(xs, ys).astype(np.float64)
    l1 = np.char.str_len(xs).astype(np.float64)
    l2 = np.char.str_len(ys).astype(np.float64)
    worst = 2 * AFFINE_OPEN + (l1 - 1 + l2 - 1) * AFFINE_EXT
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = 1.0 - dist / worst
    sim = np.where((l1 == 0) | (l2 == 0), 0.0, sim)
    return pd.Series(np.where(xs == ys, 1.0, sim))
