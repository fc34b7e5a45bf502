"""Threshold average-linkage hierarchical agglomerative clustering
(HAC) within connected components of a scored candidate-pair graph —
the clustering rule of the classic `dedupe` toolchain (Gregg & Eder;
Bilenko & Mooney KDD 2003 use the same cut-threshold agglomeration)
and the standard anti-chaining alternative to transitive closure that
still PARTITIONS the graph (unlike star.py, which overlaps) while
using EDGE WEIGHTS (unlike pivot.py, which only sees the positive/
negative split): two clusters merge while their average cross
similarity stays above the cut threshold, so one spurious 0.9 edge
cannot chain two 50-record groups — the 100 cross-pair average
dilutes it to ~0.018.

Semantics (exact, deterministic):

* input = canonical scored pairs ``(a_id < b_id, w_micro)`` with
  similarity in integer micro-units (the repo-wide fixed-point
  convention — bit-exact across engines, no float ties);
* linkage(A, B) = S_AB / (|A|·|B|) where S_AB is the sum of OBSERVED
  edge weights between A and B and every unscored cross pair counts
  as 0 (the `dedupe` convention: blocking declared those pairs
  non-candidates, so they dilute, and a cluster pair with no observed
  edge can never merge);
* repeatedly merge the argmax-linkage cluster pair while linkage >=
  ``threshold_micro``; comparisons are exact integer cross-products
  (S₁·n₂ vs S₂·n₁ — no float order), ties broken by the ascending
  (min-member-id, min-member-id) pair key, so the dendrogram cut is
  reproducible anywhere;
* output = (record_id, cluster_id) with cluster_id the minimum member
  id, every edge endpoint covered (never-merged nodes are singleton
  clusters).

``linkage="complete"`` swaps the rule for the strict clique-style
cut: linkage(A,B) = min observed cross weight when ALL |A||B| cross
pairs are observed, else 0 (one unscored pair vetoes the merge) —
state per cluster pair becomes (count, min) and the argmax is a
plain integer max, no ratios. Average dilutes weak evidence;
complete refuses it outright.

Scale shape: HAC is quadratic in cluster-pair state, so it runs WHERE
the graph is small — per connected component. Stage 1 is the audited
two-phase large-star/small-star closure (operators/cc.py, measured
flat to 22M edges) over the candidate edges; stage 2 ships each
component's edge list through ONE ``applyInPandas`` (Arrow-batched,
grouped shuffle on the component key — never a driver collect) and
runs the exact merge loop vectorized in numpy: each round is one
O(m)-vectorized validity/argmax scan (float prefilter with a 1e-9
relative guard band, exact integer compare among the survivors) and
one canonicalize-and-aggregate of the touched sums, rounds bounded by
merges <= k. Components above ``max_component`` raise with guidance
(raise the score floor / tighten blocking) rather than silently
stalling an executor — at crawl scale a million-record component is a
blocking bug, not a clustering input. The reference has no weighted
clustering at all (its coref merge is an unweighted greedy dict sweep,
hamerkop/coref.py:266-282); this is a new capability.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hamerkop_spark.operators.cc import connected_components


def _hac_component(
    ids: np.ndarray, src: np.ndarray, dst: np.ndarray, w: np.ndarray,
    threshold: int,
) -> np.ndarray:
    """Exact average-linkage merge loop for ONE component.

    ids: sorted unique node keys (any comparable dtype); src/dst:
    int64 indices into ids (src < dst); w: int64 micro-unit weights.
    Returns cluster-REPRESENTATIVE INDEX per ids position (the min
    member index, so mapping back through ids yields min-member-id
    labels for numeric AND lexicographic string ids alike).
    """
    k = len(ids)
    size = np.ones(k, dtype=np.int64)
    # members[r] = list of member indices for active representative r
    members: dict[int, list[int]] = {i: [i] for i in range(k)}
    # active cluster-pair state: canonical (px < py) rep indices + sum
    px, py, s = src.copy(), dst.copy(), w.astype(np.int64).copy()
    while len(s):
        nx = size[px] * size[py]
        ok = s >= threshold * nx
        if not ok.any():
            break
        # argmax linkage s/nx: float prefilter with a relative guard
        # band, exact integer cross-product compare among survivors
        # (micro-unit sums and <=max_component sizes keep every
        # product far inside int64/Python-int range)
        link = s[ok] / nx[ok]
        cand = np.flatnonzero(ok)[link >= link.max() * (1.0 - 1e-9)]
        best = None
        for i in cand.tolist():
            if best is None:
                best = i
                continue
            lhs = int(s[i]) * int(nx[best])
            rhs = int(s[best]) * int(nx[i])
            if lhs > rhs or (
                lhs == rhs
                and (px[i], py[i]) < (px[best], py[best])
            ):
                best = i
        x, y = int(px[best]), int(py[best])  # x < y: rep stays x
        members[x].extend(members.pop(y))
        size[x] += size[y]
        # rewrite y -> x, canonicalize, drop the merged pair itself,
        # and re-aggregate duplicates (S_{x∪y,C} = S_xC + S_yC)
        px = np.where(px == y, x, px)
        py = np.where(py == y, x, py)
        keep = px != py
        px, py, s = px[keep], py[keep], s[keep]
        lo, hi = np.minimum(px, py), np.maximum(px, py)
        key = lo * k + hi
        order = np.argsort(key, kind="stable")
        key, lo, hi, s = key[order], lo[order], hi[order], s[order]
        uniq, start = np.unique(key, return_index=True)
        s = np.add.reduceat(s, start) if len(key) else s
        px, py = lo[start], hi[start]
    rep = np.arange(k, dtype=np.int64)
    for r, ms in members.items():
        rep[np.asarray(ms, dtype=np.int64)] = min(ms)
    return rep


def _hac_complete_component(
    ids: np.ndarray, src: np.ndarray, dst: np.ndarray, w: np.ndarray,
    threshold: int,
) -> np.ndarray:
    """Complete-linkage twin of :func:`_hac_component`: linkage(A,B)
    is the MINIMUM observed cross weight when every one of the
    |A||B| cross pairs is observed, else 0 (an unscored pair counts
    0, and min includes it) — so only fully-scored cluster pairs can
    merge, the strict clique-style rule. State per cluster pair is
    (count, min); the argmax compare is a plain integer max on the
    min weight (no ratios), ties by the ascending pair key."""
    k = len(ids)
    size = np.ones(k, dtype=np.int64)
    members: dict[int, list[int]] = {i: [i] for i in range(k)}
    px, py, mn = src.copy(), dst.copy(), w.astype(np.int64).copy()
    cnt = np.ones(len(mn), dtype=np.int64)
    while len(mn):
        full = cnt == size[px] * size[py]
        ok = full & (mn >= threshold)
        if not ok.any():
            break
        cand = np.flatnonzero(ok)
        best = None
        for i in cand.tolist():
            if best is None or mn[i] > mn[best] or (
                mn[i] == mn[best]
                and (px[i], py[i]) < (px[best], py[best])
            ):
                best = i
        x, y = int(px[best]), int(py[best])
        members[x].extend(members.pop(y))
        size[x] += size[y]
        px = np.where(px == y, x, px)
        py = np.where(py == y, x, py)
        keep = px != py
        px, py, mn, cnt = px[keep], py[keep], mn[keep], cnt[keep]
        lo, hi = np.minimum(px, py), np.maximum(px, py)
        key = lo * k + hi
        order = np.argsort(key, kind="stable")
        key, lo, hi = key[order], lo[order], hi[order]
        mn, cnt = mn[order], cnt[order]
        uniq, start = np.unique(key, return_index=True)
        if len(key):
            mn = np.minimum.reduceat(mn, start)
            cnt = np.add.reduceat(cnt, start)
        px, py = lo[start], hi[start]
    rep = np.arange(k, dtype=np.int64)
    for r, ms in members.items():
        rep[np.asarray(ms, dtype=np.int64)] = min(ms)
    return rep


def hac_clusters(
    edges: DataFrame,
    threshold_micro: int,
    a_col: str = "a_id",
    b_col: str = "b_id",
    w_col: str = "w_micro",
    max_component: int = 100_000,
    linkage: str = "average",
) -> DataFrame:
    """(record_id, cluster_id) threshold HAC memberships over scored
    candidate pairs.

    :param edges: canonical scored pairs; ``a_col``/``b_col`` any
        orderable id type (numeric or string), ``w_col`` similarity in
        nonnegative integer micro-units. Duplicate pairs are summed
        under average linkage and min'd under complete linkage
        (callers should pre-aggregate; symmetric duplicates are the
        caller's bug).
    :param threshold_micro: cut threshold in micro-units, >= 1 (a
        zero threshold would merge unscored pairs and degenerate to
        transitive closure — use cc.py for that).
    :param max_component: hard guard on component size; a component
        above it raises with remediation guidance instead of letting
        one executor run an unbounded quadratic loop.
    :param linkage: ``"average"`` (S_AB/(|A||B|), unscored pairs
        dilute) or ``"complete"`` (the minimum cross weight, and ANY
        unscored cross pair vetoes the merge — the strict clique-style
        rule; single linkage is deliberately absent: with a threshold
        it IS transitive closure over the passing edges, cc.py).
    :return: one row per distinct edge endpoint; ``cluster_id`` is the
        minimum member id (same dtype as the inputs). Records with no
        candidate edge are absent — union singletons at the call site,
        as with the other clusterers.
    """
    if threshold_micro < 1:
        raise ValueError(
            "threshold_micro must be >= 1 (0 degenerates to transitive "
            "closure; use operators/cc.py)"
        )
    if linkage not in ("average", "complete"):
        raise ValueError("linkage must be 'average' or 'complete'")
    id_type = edges.schema[a_col].dataType
    e = edges.select(
        F.col(a_col).alias("a"),
        F.col(b_col).alias("b"),
        F.col(w_col).cast("bigint").alias("w"),
    ).where(F.col("a") != F.col("b"))
    comp = connected_components(
        e.select(
            F.col("a").cast("string").alias("src"),
            F.col("b").cast("string").alias("dst"),
        )
    )
    tagged = e.join(
        comp.select(
            F.col("node").cast(id_type).alias("a"), "component"
        ),
        "a",
    )
    out_schema = T.StructType(
        [
            T.StructField("record_id", id_type),
            T.StructField("cluster_id", id_type),
        ]
    )
    thr, cap = int(threshold_micro), int(max_component)
    complete = linkage == "complete"

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(
            np.concatenate([pdf["a"].to_numpy(), pdf["b"].to_numpy()])
        )
        if len(ids) > cap:
            raise ValueError(
                f"HAC component has {len(ids)} records "
                f"(max_component={cap}); raise the candidate score "
                "floor or tighten blocking before clustering"
            )
        src = np.searchsorted(ids, pdf["a"].to_numpy())
        dst = np.searchsorted(ids, pdf["b"].to_numpy())
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        w = pdf["w"].to_numpy().astype(np.int64)
        # fold duplicate observations of one unordered pair up front
        # (the loop's own re-aggregation only runs after a merge):
        # sum under average linkage, min under complete
        key = lo * len(ids) + hi
        order = np.argsort(key, kind="stable")
        key, lo, hi, w = key[order], lo[order], hi[order], w[order]
        _, start = np.unique(key, return_index=True)
        if len(key):
            w = (np.minimum if complete else np.add).reduceat(w, start)
        lo, hi = lo[start], hi[start]
        fn = _hac_complete_component if complete else _hac_component
        rep = fn(ids, lo, hi, w, thr)
        return pd.DataFrame(
            {"record_id": ids, "cluster_id": ids[rep]}
        )

    return tagged.groupBy("component").applyInPandas(_one, out_schema)
