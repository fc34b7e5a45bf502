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
    """Normalized edit distance d/max(len) (features.py:201), native."""
    return F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b))


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


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler similarity. Python per element inside the
    batch, but batch transfer amortizes the boundary (no native JVM impl)."""
    out = np.empty(len(a), dtype=np.float64)
    av = a.fillna("").to_numpy()
    bv = b.fillna("").to_numpy()
    for i in range(len(av)):
        out[i] = jaro_winkler_py(av[i], bv[i])
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def jaro_winkler_max_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Max Jaro-Winkler over the cross product of two small name arrays
    (lowercased) — the pairwise-scoring bundle form (north_rule). Name
    sets per pair are tiny (chain strings x entity names), so the nested
    loop is bounded; the Arrow batch amortizes the Python boundary."""
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        xs = a.iloc[i]
        ys = b.iloc[i]
        best = 0.0
        if xs is not None and ys is not None:
            for x in xs:
                lx = x.lower()
                for y in ys:
                    v = jaro_winkler_py(lx, y.lower())
                    if v > best:
                        best = v
        out[i] = best
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
