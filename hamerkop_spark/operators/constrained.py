"""Cannot-link constrained greedy agglomeration: transitive-style
clustering of a scored candidate-pair graph under hard "not a match"
constraints — the enforcement half of the clerical-review loop
(operators/blocking_eval.uncertainty_queue proposes pairs to label;
this operator makes the NEGATIVE answers binding). The semantics are
the classic constrained single-linkage sweep (Wagstaff & Cardie,
ICML 2000 COP-constraints; Bansal, Blum & Chawla correlation
clustering treats them as -inf edges): process candidate edges in
descending weight order and union the endpoints' clusters unless the
union would put some cannot-link pair into one cluster.

Semantics (exact, deterministic):

* input = canonical scored pairs ``(a_id < b_id, w_micro)`` with
  positive integer micro-unit weights (duplicate observations of one
  unordered pair sum), plus cannot-link pairs (any orientation);
* sweep edges by (weight DESC, a_id ASC, b_id ASC); an edge whose
  endpoints already share a cluster is skipped; an edge whose union
  would join the two sides of any cannot-link pair is skipped —
  clusters only grow, so a skipped edge stays invalid forever and
  the one-pass sweep equals the "repeatedly merge the max-weight
  valid cross edge" fixpoint (the form the SQL oracle unrolls);
* cluster label = minimum member id; a cannot-link pair given also
  as a positive edge keeps the CONSTRAINT (hard labels outrank
  scores); output = (record_id, cluster_id) for every edge endpoint.

Without constraints this is exactly transitive closure (cc.py);
constraints are what make it a different — and at review time, the
correct — rule.

Scale shape: stage 1 tags components with the audited two-phase
large-star/small-star CC over the POSITIVE edges only (a constraint
can only ever split, never join, so components bound the repair
scope); stage 2 cogroups each component's edges with its
(component-internal) cannot-links through ONE
``applyInPandas``-style cogroup (Arrow-batched, grouped shuffle —
never a driver collect) and runs the sweep as a union-find whose
validity check is incremental. Components above ``max_component``
raise with guidance, as in hac.py. The reference has no notion of
negative evidence at all (its coref/resolver only add links); this
is a new capability.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hamerkop_spark.operators.cc import connected_components


def _sweep(
    ids: np.ndarray,
    ea: np.ndarray, eb: np.ndarray, ew: np.ndarray,
    ca: np.ndarray, cb: np.ndarray,
) -> np.ndarray:
    """Constrained union-find sweep for ONE component. ea/eb/ca/cb
    are int64 indices into ids; returns min-member rep index per
    ids position."""
    k = len(ids)
    rep = np.arange(k, dtype=np.int64)

    def find(x: int) -> int:
        while rep[x] != x:
            rep[x] = rep[rep[x]]
            x = rep[x]
        return x

    # cannot-link adjacency between ROOTS, updated as roots merge
    cl: dict[int, set[int]] = {}
    for p, q in zip(ca.tolist(), cb.tolist()):
        rp, rq = find(p), find(q)
        if rp == rq:
            continue  # already-violated input; nothing to enforce
        cl.setdefault(rp, set()).add(rq)
        cl.setdefault(rq, set()).add(rp)
    order = np.lexsort((eb, ea, -ew))
    for i in order.tolist():
        ra, rb = find(int(ea[i])), find(int(eb[i]))
        if ra == rb:
            continue
        if rb in cl.get(ra, ()):  # union would join a cannot-link
            continue
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        rep[hi] = lo  # min-member root stays the root
        if hi in cl:
            peers = cl.pop(hi)
            for r in peers:
                cl[r].discard(hi)
                cl[r].add(lo)
            cl.setdefault(lo, set()).update(peers)
    return np.fromiter((find(i) for i in range(k)), np.int64, k)


def constrained_clusters(
    edges: DataFrame,
    cannot_links: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    w_col: str = "w_micro",
    max_component: int = 100_000,
) -> DataFrame:
    """(record_id, cluster_id) constrained greedy-agglomeration
    memberships over scored pairs with hard cannot-link constraints.

    :param edges: canonical scored pairs; ``a_col``/``b_col`` any
        orderable id type, ``w_col`` positive integer micro-unit
        weights (duplicates of one unordered pair sum).
    :param cannot_links: pairs (same ``a_col``/``b_col`` names, any
        orientation) that must NOT share a cluster. Constraints whose
        endpoints fall in different positive components are trivially
        satisfied; a constraint duplicated as a positive edge wins —
        the edge is skipped.
    :param max_component: hard guard on positive-component size, as
        in hac.py.
    :return: one row per distinct edge endpoint; ``cluster_id`` is
        the minimum member id. Nodes appearing only in
        ``cannot_links`` are absent (no positive evidence — they were
        never going to cluster); union singletons at the call site.
    """
    id_type = edges.schema[a_col].dataType
    e = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
            F.col(w_col).cast("bigint").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    comp = connected_components(
        e.select(
            F.col("a").cast("string").alias("src"),
            F.col("b").cast("string").alias("dst"),
        )
    ).select(F.col("node").cast(id_type).alias("n"), "component")
    tagged_e = e.join(
        comp.select(F.col("n").alias("a"), "component"), "a"
    )
    # a constraint binds only if BOTH endpoints share a positive
    # component — tag each side and keep the agreeing rows (fresh
    # aliases per copy: two joins against the same comp plan would
    # otherwise trip the ambiguous-self-join analyzer)
    cl = cannot_links.select(
        F.least(F.col(a_col), F.col(b_col)).alias("a"),
        F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
    ).where(F.col("a") != F.col("b")).distinct()
    comp_a = comp.select(
        F.col("n").alias("a"), F.col("component").alias("component_a")
    )
    comp_b = comp.select(
        F.col("n").alias("b"), F.col("component").alias("component_b")
    )
    tagged_c = (
        cl.join(comp_a, "a")
        .join(comp_b, "b")
        .where(F.col("component_a") == F.col("component_b"))
        .select("a", "b", F.col("component_a").alias("component"))
    )
    out_schema = T.StructType(
        [
            T.StructField("record_id", id_type),
            T.StructField("cluster_id", id_type),
        ]
    )
    cap = int(max_component)

    def _one(key, epdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if epdf.empty:
            return pd.DataFrame({"record_id": [], "cluster_id": []})
        ids = np.unique(
            np.concatenate([epdf["a"].to_numpy(), epdf["b"].to_numpy()])
        )
        if len(ids) > cap:
            raise ValueError(
                f"constrained component has {len(ids)} records "
                f"(max_component={cap}); raise the candidate score "
                "floor or tighten blocking before clustering"
            )
        ea = np.searchsorted(ids, epdf["a"].to_numpy())
        eb = np.searchsorted(ids, epdf["b"].to_numpy())
        ew = epdf["w"].to_numpy().astype(np.int64)
        ca = np.searchsorted(ids, cpdf["a"].to_numpy())
        cb = np.searchsorted(ids, cpdf["b"].to_numpy())
        rep = _sweep(ids, ea, eb, ew, ca, cb)
        return pd.DataFrame({"record_id": ids, "cluster_id": ids[rep]})

    return (
        tagged_e.groupby("component")
        .cogroup(tagged_c.groupby("component"))
        .applyInPandas(_one, out_schema)
    )
