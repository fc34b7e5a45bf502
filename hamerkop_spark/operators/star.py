"""Star clustering (Aslam, Pelekhov & Rus 1998/2004, "The Star
Clustering Algorithm") over a thresholded similarity graph: pick the
highest-degree unmarked vertex as a center, mark its neighbours as
satellites, repeat. Every cluster is a star (diameter <= 2), so —
unlike transitive closure (operators/cc.py) — one weak edge cannot
chain two dense groups into a single mega-cluster; satellites may sit
in several stars, giving the same redundancy-positive overlapping
shape as canopies (operators/canopy.py).

Degrees are computed ONCE on the input graph (as in the paper), so
the greedy order is the static priority p(u) = (degree(u) DESC,
u ASC) and the sequential sweep has a closed characterization:

    center(u)  <=>  every neighbour v with p(v) > p(u) is NOT a center

i.e. the lexicographically-first maximal independent set in priority
order. Two implementations:

* ``star_clusters_exact`` — the exact fixpoint: per round, an
  undecided vertex becomes a center when all its higher-priority
  neighbours are decided non-centers, a non-center when any is a
  center. >=1 vertex (the highest-priority undecided one) is decided
  per round, convergence fingerprint-checked like the CC loop. Greedy
  parity is pytest-gated against a scalar sweep.
* ``star_assignments`` — the one-shot dominance relaxation (same
  trick as canopy centers): a vertex is a center iff NO neighbour has
  higher priority. This is exactly round 1 of the fixpoint, so
  relaxed centers are a subset of exact centers' candidates decided
  without waiting on the cascade; vertices left uncovered (dominated,
  but with no locally-maximal neighbour) fall back to singleton
  stars, making coverage total. All arithmetic is integer
  degree/ids, so any ANSI engine reproduces it bit-exactly — this is
  the oracle-checked variant.

Plan shape at 10^12 edges: one symmetrize union, one partial-agg
degree shuffle, one degree-attach join per side, one anti-join for
dominance, one membership join, one coverage anti-join. The exact
variant adds the fixpoint loop (rounds bounded by the longest
strictly-priority-decreasing path; persist + fingerprint per round).

The reference has no clustering beyond its greedy in-memory coref
merge (hamerkop/coref.py:266-282); star clustering is a new
capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym_edges(edges: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Distinct symmetric (node, nbr) view of an undirected edge list,
    self-loops dropped."""
    e = edges.select(
        F.col(a_col).alias("node"), F.col(b_col).alias("nbr")
    ).where(F.col(a_col) != F.col(b_col))
    return (
        e.unionByName(
            e.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))
        )
        .distinct()
    )


def _with_degrees(sym: DataFrame) -> DataFrame:
    """(node, nbr, deg_n, deg_b): static degrees attached both sides.
    Priority = (deg DESC, id ASC); `_dominates` below is that order."""
    deg = sym.groupBy("node").agg(F.count("*").alias("deg"))
    return (
        sym.join(deg, "node")
        .withColumnRenamed("deg", "deg_n")
        .join(
            deg.select(
                F.col("node").alias("nbr"), F.col("deg").alias("deg_b")
            ),
            "nbr",
        )
    )


def _nbr_dominates():
    # Column exprs need an active session, so build lazily
    return (F.col("deg_b") > F.col("deg_n")) | (
        (F.col("deg_b") == F.col("deg_n")) & (F.col("nbr") < F.col("node"))
    )


def star_assignments(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """(record_id, center_id) star memberships under the one-shot
    dominance relaxation: centers are the vertices with no
    higher-priority neighbour; satellites join EVERY adjacent center's
    star (overlap by design — two DOMINANCE centers are never
    adjacent, priority is a total order); dominated vertices with no
    adjacent center become singleton stars, so coverage is total
    (fallback singletons may be adjacent to anything — they exist
    precisely because no local maximum reached them).
    Deterministic, one pass, bit-exact in any ANSI engine.
    """
    sym = _sym_edges(edges, a_col, b_col).localCheckpoint(eager=False)
    dd = _with_degrees(sym)
    dominated = (
        dd.where(_nbr_dominates()).select("node").distinct()
    )
    nodes = sym.select("node").distinct()
    centers = nodes.join(dominated, "node", "left_anti").select(
        F.col("node").alias("center_id")
    )
    memb = (
        sym.join(centers, sym.nbr == centers.center_id)
        .select(F.col("node").alias("record_id"), "center_id")
    )
    self_rows = centers.select(
        F.col("center_id").alias("record_id"), "center_id"
    )
    covered = memb.unionByName(self_rows).localCheckpoint(eager=False)
    orphans = nodes.join(
        covered.select(F.col("record_id").alias("node")).distinct(),
        "node",
        "left_anti",
    ).select(F.col("node").alias("record_id"), F.col("node").alias("center_id"))
    return covered.unionByName(orphans)


def star_clusters_exact(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 50,
) -> DataFrame:
    """(record_id, center_id) with EXACT parity to the sequential
    greedy star sweep under static priority (degree DESC, id ASC):
    fixpoint over

        undecided u -> CENTER     if all higher-priority nbrs are
                                  decided non-centers (or none exist)
        undecided u -> NON-CENTER if any higher-priority nbr is a
                                  decided center

    The highest-priority undecided vertex always decides each round,
    so the loop terminates; rounds are bounded by the longest
    strictly-priority-decreasing path (typically O(log n) on
    similarity graphs). At the fixpoint every non-center has an
    adjacent center by construction — no fallback needed — and each
    satellite joins every adjacent center's star, as in the paper.
    """
    spark = edges.sparkSession
    # eager localCheckpoints everywhere in the loop: the per-round
    # unions otherwise stack logical plans geometrically (plan
    # stringification alone OOM'd the JVM at ~8 rounds before this)
    sym = _sym_edges(edges, a_col, b_col).localCheckpoint(eager=True)
    # dd = the higher-priority in-neighbourhood of each node
    dd = (
        _with_degrees(sym)
        .where(_nbr_dominates())
        .select("node", "nbr")
        .localCheckpoint(eager=True)
    )
    nodes = sym.select("node").distinct().localCheckpoint(eager=True)
    # roots: no higher-priority neighbour -> centers immediately
    centers = (
        nodes.join(dd.select("node").distinct(), "node", "left_anti")
        .localCheckpoint(eager=True)
    )
    decided_non = spark.createDataFrame([], nodes.schema)
    for _ in range(max_rounds):
        n_c = centers.count()
        # non-centers: an adjacent (higher-priority) center exists
        new_non = (
            dd.join(
                centers.select(F.col("node").alias("nbr")), "nbr"
            )
            .select("node")
            .distinct()
            .join(decided_non, "node", "left_anti")
        )
        decided_non = decided_non.unionByName(new_non).localCheckpoint(
            eager=True
        )
        decided = centers.unionByName(decided_non)
        # centers: every higher-priority nbr decided non-center ==
        # undecided with no higher nbr outside decided_non
        blocked = (
            dd.join(
                decided_non.select(F.col("node").alias("nbr")),
                "nbr",
                "left_anti",
            )
            .select("node")
            .distinct()
        )
        new_centers = (
            nodes.join(decided, "node", "left_anti")
            .join(blocked, "node", "left_anti")
        )
        centers = centers.unionByName(new_centers).localCheckpoint(
            eager=True
        )
        if centers.count() == n_c and new_non.isEmpty():
            break
    else:
        raise RuntimeError(
            f"star fixpoint did not converge in {max_rounds} rounds"
        )
    centers = centers.select(F.col("node").alias("center_id"))
    memb = sym.join(centers, sym.nbr == centers.center_id).select(
        F.col("node").alias("record_id"), "center_id"
    )
    self_rows = centers.select(
        F.col("center_id").alias("record_id"), "center_id"
    )
    return memb.unionByName(self_rows)
