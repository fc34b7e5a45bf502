"""Weighted synchronous label propagation (LPA; Raghavan, Albert &
Kumara, Phys. Rev. E 2007 — the weighted form is eq. 6 of Barber &
Clark 2009) over a scored candidate-pair graph: the linear-cost
weighted partitioner of the clustering matrix. Transitive CC
(operators/cc.py) unions everything reachable regardless of weight;
HAC (operators/hac.py) weighs evidence exactly but pays a quadratic
per-component merge loop; LPA weighs evidence at O(E) per round with
NO per-component state, so it is the rule that still runs when a
blocking bug hands you a 10M-record component — each round is one
join + one grouped argmax, shuffling on the node key.

Semantics (exact, deterministic — no randomized visit order):

* input = canonical scored pairs ``(a_id, b_id, w_micro)`` with
  positive integer micro-unit weights (the repo-wide fixed-point
  convention); duplicate observations of one unordered pair sum;
* labels start as the node's own id;
* one SYNCHRONOUS round relabels every node to
  ``argmax_L sum(w(u,v) for u in N(v) if label(u) = L)`` — the
  weighted-degree vote of its neighbourhood — PLUS a self-retention
  vote for the node's CURRENT label weighted by its maximum
  incident edge weight (static across rounds). The retention term
  is the self-loop regularization of Leung et al. 2009 (Phys. Rev.
  E 79, "preference"): without it, every isolated duplicate PAIR —
  the most common entity-resolution component — swaps labels
  forever under synchronous updates (GraphFrames' LPA documents the
  same caveat); with it, a pair ties at the max weight and the
  MIN-label tie-break converges both sides to the smaller id. A
  single edge therefore pulls a node only if its label sorts lower;
  two corroborating same-label neighbours pull it regardless
  (their sum beats the max-incident retention). Exact integer sums,
  ties broken by the minimum label — bit-reproducible on any engine
  (the paper's random asynchronous order is deliberately replaced:
  determinism is what lets a DuckDB twin replay the rounds);
* exactly ``rounds`` rounds run, stopping early only at a fixpoint
  (a no-change round — provably a no-op for every later round, so
  early exit never diverges from the fixed-round contract; any
  residual multi-node oscillation is bounded by the same
  fixed-round contract rather than hidden by it);
* output = (record_id, cluster_id = final label), one row per
  distinct edge endpoint. LPA labels need not induce connected
  clusters (a node can keep a label whose holders all relabelled
  away); that is the documented nature of the rule, not a bug —
  callers wanting connectivity compose with cc.py on the
  within-label edge subset.

Scale shape: labels and the symmetrized edge list both hash-partition
on the node key; each round is one shuffle join (edge.dst -> label)
plus one groupBy argmax on (node, label) with map-side partial sums,
then a window top-1 — the same per-round cost envelope as the audited
CC loop, with ``localCheckpoint`` per round keeping the iterated plan
flat. No driver collect anywhere; the fixpoint test is a single
count() action per round. The reference has no weighted clustering at
all (its coref merge is an unweighted greedy dict sweep,
hamerkop/coref.py:266-282); this is a new capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    rounds: int = 5,
    a_col: str = "a_id",
    b_col: str = "b_id",
    w_col: str = "w_micro",
) -> DataFrame:
    """(record_id, cluster_id) weighted synchronous LPA memberships
    after exactly ``rounds`` deterministic rounds (early fixpoint
    exit is a provable no-op).

    :param edges: scored pairs; ``a_col``/``b_col`` any orderable id
        type, ``w_col`` positive integer micro-unit weights.
        Duplicate observations of one unordered pair are summed;
        self-loops are dropped.
    :param rounds: synchronous round count, >= 1. The value is part
        of the semantics (synchronous LPA can 2-cycle on bipartite
        structures), so callers pin it like a threshold.
    :return: one row per distinct edge endpoint; ``cluster_id`` is
        the node's final label (same dtype as the ids). Records with
        no candidate edge are absent — union singletons at the call
        site, as with the other clusterers.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
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
    sym = (
        e.select(F.col("a").alias("v"), F.col("b").alias("u"), "w")
        .unionByName(
            e.select(F.col("b").alias("v"), F.col("a").alias("u"), "w")
        )
        .localCheckpoint(eager=False)
    )
    # static self-retention vote = a SELF-LOOP of the node's max
    # incident weight (Leung et al. 2009 self-loop preference —
    # kills the isolated-pair swap 2-cycle that pure synchronous LPA
    # oscillates on): folding it into the edge list keeps each round
    # at ONE join, since a self-loop (v,v,mw) votes for v's current
    # label by construction
    mw = sym.groupBy("v").agg(F.max("w").alias("mw"))
    sym = sym.unionByName(
        mw.select("v", F.col("v").alias("u"), F.col("mw").alias("w"))
    ).localCheckpoint(eager=False)
    labels = mw.select(
        F.col("v").alias("node"), F.col("v").alias("lab")
    ).localCheckpoint(eager=False)
    top = Window.partitionBy("v").orderBy(
        F.col("s").desc(), F.col("lab").asc()
    )
    for _ in range(int(rounds)):
        votes = (
            sym.join(labels, sym["u"] == labels["node"])
            .groupBy("v", "lab")
            .agg(F.sum("w").alias("s"))
        )
        new = (
            votes.withColumn("rn", F.row_number().over(top))
            .where(F.col("rn") == 1)
            .select(F.col("v").alias("node"), "lab")
            .localCheckpoint(eager=False)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lab") != F.col("o.lab"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("record_id"), F.col("lab").alias("cluster_id")
    )
