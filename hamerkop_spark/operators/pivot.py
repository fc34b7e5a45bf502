"""Pivot correlation clustering (KwikCluster — Ailon, Charikar &
Newman, JACM 2008 "Aggregating Inconsistent Information"; parallelized
as in Chierichetti, Dasgupta & Kumar, KDD 2014 "Correlation Clustering
in MapReduce") over a positive-edge similarity graph: process vertices
in a random order pi; an unclustered vertex becomes a pivot and grabs
its unclustered neighbours. Absent edges are implicit negatives, so —
unlike transitive closure (operators/cc.py), which unions everything
reachable, and star clustering (operators/star.py), which overlaps —
KwikCluster PARTITIONS the graph while charging each disagreement to a
bad triangle: expected cost <= 3x optimal correlation clustering. It
is the family member to reach for when the edge set carries
conflicting evidence (a says match, transitivity says otherwise).

Exact sequential parity without sequential execution: the pivot set of
KwikCluster under order pi is precisely the greedy (lexicographically
first) maximal independent set in pi-order — v is a pivot iff v is
unclustered when reached iff no pi-earlier neighbour is a pivot. And a
non-pivot u is grabbed by the pi-FIRST adjacent pivot, which always
precedes u (otherwise u would have been a pivot at its own turn). So:

    1. fixpoint the greedy MIS over the dominance DAG (edges pointing
       at the pi-smaller endpoint), exactly the star.py decision rules
       with priority = hash rank instead of degree;
    2. assign each non-pivot its min-priority dominating pivot
       neighbour — one join + one window, after all statuses are final
       (assigning mid-fixpoint is WRONG: a smaller-rank neighbour may
       become a pivot later and sequential order grabs first).

pi is the deterministic Knuth multiplicative hash of the vertex id
(ties broken by id), so every engine — and the DuckDB oracle, via a
recursive CTE — reproduces the clustering bit-exactly; re-runs are
idempotent. Randomized-pi expectation guarantees transfer to the hash
family in the usual pairwise-independence sense; callers needing a
fresh draw can pre-scramble ids.

Plan shape at 10^12 edges: one symmetrize union; the dominance filter
is a pure column expression (rank is a function of id — no degree
aggregation, no join, unlike star); each fixpoint round is two
anti-joins and one semi-join, all shuffling on the node key; rounds
are bounded by the longest strictly-rank-decreasing path, O(log n)
w.h.p. for hashed ranks. Eager localCheckpoints per round keep the
union lineage flat (the plan-growth lesson from cc.py/star.py).

The reference has no clustering beyond its greedy in-memory coref
merge (hamerkop/coref.py:266-282); correlation clustering is a new
capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RANK_MULT = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)
RANK_MOD = 4294967296  # 2^32
RANK_ID_MOD = 2147483648  # 2^31: (2^31-1) * RANK_MULT < 2^63, no overflow

def _rank(col: F.Column, string_ids: bool = False) -> F.Column:
    """Deterministic pseudo-random rank of a vertex id: exact BIGINT
    arithmetic, reproducible in any ANSI engine. Numeric ids are
    reduced mod 2^31 before the multiply so the product never
    overflows BIGINT for ANY bigint id; ids congruent mod 2^31 share
    a rank but the (rank, id) order stays total via the id tie-break.
    String ids rank via the md5-hex 60-bit convention (the same
    portable `conv(substr(md5(x),1,15),16,10)` used by the MinHash
    oracle) — collisions fall to the id tie-break as well."""
    if string_ids:
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
        ).cast("bigint")
    return F.pmod(
        F.pmod(col.cast("bigint"), F.lit(RANK_ID_MOD)) * F.lit(RANK_MULT),
        F.lit(RANK_MOD),
    )

def _sym_edges(edges: DataFrame, a_col: str, b_col: str) -> DataFrame:
    e = edges.select(
        F.col(a_col).alias("node"), F.col(b_col).alias("nbr")
    ).where(F.col(a_col) != F.col(b_col))
    return e.unionByName(
        e.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))
    ).distinct()

def _nbr_precedes(string_ids: bool = False) -> F.Column:
    """nbr precedes node in pi: (rank ASC, id ASC) total order."""
    rn = _rank(F.col("node"), string_ids)
    rb = _rank(F.col("nbr"), string_ids)
    return (rb < rn) | ((rb == rn) & (F.col("nbr") < F.col("node")))

def pivot_clusters(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 64,
    string_ids: bool = False,
) -> DataFrame:
    """(record_id, cluster_id) KwikCluster partition of the positive
    edge graph, cluster_id = the pivot's vertex id. Exact parity with
    the sequential sweep under the hash-rank order (pytest-gated
    against a scalar oracle). Every edge endpoint appears exactly
    once; vertices outside `edges` don't exist to the operator (an
    isolated vertex is trivially its own singleton — prepend it).
    Set ``string_ids=True`` for non-numeric vertex ids (md5-based
    ranks instead of the multiplicative hash).
    """
    spark = edges.sparkSession
    sym = _sym_edges(edges, a_col, b_col).localCheckpoint(eager=True)
    # dominance DAG: edges pointing at the pi-earlier endpoint. A pure
    # filter — rank needs no aggregation, so no join here (cf. star).
    dd = sym.where(_nbr_precedes(string_ids)).localCheckpoint(eager=True)
    nodes = sym.select("node").distinct().localCheckpoint(eager=True)
    # roots of the DAG (pi-local minima) are pivots immediately
    centers = nodes.join(
        dd.select("node").distinct(), "node", "left_anti"
    ).localCheckpoint(eager=True)
    decided_non = spark.createDataFrame([], nodes.schema)
    for _ in range(max_rounds):
        n_c = centers.count()
        # non-pivots: some pi-earlier neighbour is a decided pivot
        new_non = (
            dd.join(centers.select(F.col("node").alias("nbr")), "nbr")
            .select("node")
            .distinct()
            .join(decided_non, "node", "left_anti")
        )
        decided_non = decided_non.unionByName(new_non).localCheckpoint(
            eager=True
        )
        decided = centers.unionByName(decided_non)
        # blocked: some pi-earlier neighbour is not yet decided-non
        blocked = (
            dd.join(
                decided_non.select(F.col("node").alias("nbr")),
                "nbr",
                "left_anti",
            )
            .select("node")
            .distinct()
        )
        new_centers = nodes.join(decided, "node", "left_anti").join(
            blocked, "node", "left_anti"
        )
        centers = centers.unionByName(new_centers).localCheckpoint(
            eager=True
        )
        if centers.count() == n_c and new_non.isEmpty():
            break
    else:
        raise RuntimeError(
            f"pivot fixpoint did not converge in {max_rounds} rounds"
        )
    pivots = centers.select(F.col("node").alias("_pv"))
    # each non-pivot joins its pi-first adjacent pivot — which always
    # dominates it, so only the DAG edges need scanning
    w = Window.partitionBy("node").orderBy(
        _rank(F.col("nbr"), string_ids), F.col("nbr")
    )
    asg = (
        dd.join(pivots, dd.nbr == pivots._pv)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("node").alias("record_id"), F.col("nbr").alias("cluster_id"))
    )
    self_rows = pivots.select(
        F.col("_pv").alias("record_id"), F.col("_pv").alias("cluster_id")
    )
    return self_rows.unionByName(asg)
