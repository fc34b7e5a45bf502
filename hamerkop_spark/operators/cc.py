"""Connected components on an edge DataFrame.

The clustering backbone of the engine (SURVEY.md §2.3/§2.7): the
reference's greedy in-document chain merges (hamerkop/coref.py:226-234)
and its *missing* corpus-level NIL clustering (io.py:273-274) both become
transitive closure over merge edges.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame groupBy/join iterations. Each iteration is a shuffle on the
node id; convergence is detected by an aggregate (no driver-side
collect of the graph). At in-document scale components are tiny (2-3
rounds); the same code handles corpus-level clusters. Hot components
(mega-blocks from stop-word names) are bounded upstream by blocking-key
caps; AQE skew-join splitting covers the residual skew.

Node ids are arbitrary strings; the component label is the lexicographic
minimum node id in the component — stable across runs and cluster sizes,
which checkpoint/resume requires.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Edge-count gate for the fused star-forest convergence test: at or
#: below this many edges a round's convergence check also tests
#: star-forest-ness exactly (three countDistinct aggregates), letting
#: the loop exit WITHOUT the confirmation round; above it the check is
#: the plain (count, hash-sum) fingerprint. The default marks where
#: per-round cost stops being scheduling latency and starts being data
#: work (measured: the distinct trio costs 0.5-0.9x a round at 5M
#: edges); override per deployment via HK_CC_STAR_CHECK_MAX_EDGES.
_STAR_CHECK_MAX_EDGES = int(
    os.environ.get("HK_CC_STAR_CHECK_MAX_EDGES", "1000000")
)


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
    round_walls: list | None = None,
) -> DataFrame:
    """Compute connected components.

    :param edges: DataFrame with columns (src: string, dst: string).
    :param nodes: optional DataFrame with column (node: string); isolated
        nodes (no edges) appear as singleton components.
    :param max_iterations: safety bound; converges in O(log n) rounds.
    :param checkpoint_dir: when set, per-iteration state uses RELIABLE
        checkpoints (survives executor loss — the cluster setting);
        default localCheckpoint is faster and fine on local[N].
    :param round_walls: optional list the per-round wall seconds are
        appended to — the skew telemetry for the scale ladder (a round
        over ~2x the median indicates a hot component in the star
        phases).
    :return: DataFrame (node: string, component: string) where component is
        the min node id in the component.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _persist(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        # r6: LAZY local checkpoint — the per-round fingerprint collect
        # is the materializing action, so each round costs ONE job
        # instead of two (eager checkpoint job + fingerprint job);
        # later rounds read the checkpointed blocks exactly as before
        return df.localCheckpoint(eager=False)
    # Alternating large-star / small-star (Kiveris et al., SoCC'14,
    # Two-Phase). Edges are kept in CANONICAL orientation (u, v) with
    # u > v (string order — the same order the component label uses).
    #
    #   large-star(c): every neighbor u > c re-attaches to
    #       m = min(Γ(c) ∪ {c})       -> new edge (u, m)
    #   small-star(c): c and all its smaller neighbors re-attach to
    #       m = min(Γ_<(c) ∪ {c})     -> new edges (c, m), (x, m)
    #
    # Each phase strictly shrinks a potential over the edge set, and
    # the alternation provably converges in O(log n) rounds to a
    # forest of stars rooted at each component's minimum — unlike
    # min-label propagation over the ORIGINAL graph, whose round count
    # grows with component eccentricity (measured: 30+ rounds and 10x
    # the wall on chain-of-10 graphs before this rewrite).
    #
    # Convergence check: (count, xxhash64-sum) of the canonical edge
    # set — one aggregate job per round; equal fingerprints on
    # consecutive rounds end the loop (a 2^-64 collision is the
    # accepted tradeoff for never shipping the graph to the driver).
    # No repartition("u") anywhere in the loop: each round's large-star
    # starts by unioning the edge set with its swap, which destroys any
    # u-partitioning — so a repartition would be a pure extra shuffle
    # per round (measured 10-15% of total CC wall at 2.3M edges). The
    # groupBys and joins shuffle on their own keys as needed.
    canon = edges.where(F.col("src") != F.col("dst")).select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).distinct()
    e = _persist(canon)

    def _fingerprint(df: DataFrame):
        row = df.agg(
            F.count("*").alias("n"),
            # decimal(38,0) accumulator: a long sum of xxhash64 values
            # overflows, which ANSI mode (Spark 4 default) makes fatal
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def _round_stats(df: DataFrame):
        """(fingerprint, is_star_forest) in ONE aggregate job — the
        SMALL-graph flavor of the per-round convergence check.

        Every edge is oriented (u, v) with v < u (canon, large_star and
        small_star all preserve it), so the set is a converged star
        forest exactly when BOTH hold:

        (1) unique parent: every u has exactly one outgoing edge
            (count == countDistinct(u) — small_star CAN emit a node
            with two parents when it was a smaller neighbor of two
            different hubs, and such a set is not converged even when
            condition 2 holds);
        (2) depth 1: no u also appears as a v — each leaf points
            straight at its root and the root (the component minimum;
            smaller than every leaf by the orientation invariant) has
            no outgoing edge. Disjointness of the u- and v-sets is
            inclusion-exclusion over countDistinct:
            |u ∪ v| == |u| + |v|.

        Expressed over per-node degrees (NOT countDistinct — a
        multi-distinct aggregate plans an Expand that triples the rows
        and was measured slower than the confirmation round it saves):
        out-degree od(c) = smaller neighbors, in-degree = larger, and
        the set is a star forest iff no node has od >= 2 (multi-parent)
        or od >= 1 together with in-degree >= 1 (depth 2). One explode
        to (node, is_out) rows, one map-side-combined groupBy(node),
        one global aggregate; the u-side row carries the edge hash so
        the fingerprint lands on exactly the plain (count, hash-sum)
        scale and either check flavor compares against the other.

        Such a star forest is a fixpoint of both star phases (and every
        fixpoint is one — Kiveris et al.), so detecting it the round it
        APPEARS saves the confirmation round the fingerprint-equality
        exit needs (r6: one whole round job per CC invocation, two per
        incremental fold — scheduling latency on small graphs)."""
        ex = df.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("u").alias("node"),
                        F.lit(1).alias("o"),
                        F.xxhash64("u", "v").alias("hh"),
                    ),
                    F.struct(
                        F.col("v").alias("node"),
                        F.lit(0).alias("o"),
                        F.lit(0).cast("long").alias("hh"),
                    ),
                )
            ).alias("r")
        ).select("r.node", "r.o", "r.hh")
        per = ex.groupBy("node").agg(
            F.sum("o").alias("od"),
            F.count("*").alias("deg2"),
            # decimal(38,0) accumulator: a long sum of xxhash64 values
            # overflows, which ANSI mode (Spark 4 default) makes fatal
            F.sum(F.col("hh").cast("decimal(38,0)")).alias("h"),
        )
        row = per.agg(
            F.sum("od").alias("n"),
            F.sum("h").alias("h"),
            F.sum(
                F.when(
                    (F.col("od") >= 2)
                    | ((F.col("od") >= 1) & (F.col("deg2") > F.col("od"))),
                    1,
                ).otherwise(0)
            ).alias("bad"),
        ).collect()[0]
        fp = (int(row["n"] or 0), row["h"])
        return fp, not row["bad"]

    # the initial count doubles as the emptiness check AND materializes
    # the canon localCheckpoint before round 1 references it three
    # times (r6: the separate isEmpty() job is gone — n == 0 says the
    # same thing; the old initial xxhash64-sum fingerprint is gone too:
    # the loop's equality backstop is seeded with None, so the hash was
    # never compared)
    n_est = e.count()
    if n_est == 0:
        if nodes is not None:
            return nodes.select(
                F.col("node"), F.col("node").alias("component")
            ).distinct()
        return spark.createDataFrame([], "node string, component string")

    def large_star(es: DataFrame) -> DataFrame:
        sym = es.unionByName(
            es.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("mn", F.col("u")).alias("m"))
        # r6: no .distinct() here — small_star's min-agg is duplicate-
        # insensitive and its own final distinct dedupes the round's
        # output, so the per-round edge SET is unchanged while one full
        # exchange per round disappears
        return (
            sym.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )

    def small_star(es: DataFrame) -> DataFrame:
        m = es.groupBy("u").agg(F.min("v").alias("m"))
        j = es.join(m, "u")
        out = j.select(F.col("v").alias("u"), F.col("m").alias("v")).unionByName(
            m.select(F.col("u"), F.col("m").alias("v"))
        )
        return out.where(F.col("u") != F.col("v")).distinct()

    import time as _time

    # seed the equality backstop with a never-equal sentinel; the first
    # comparable fingerprint is round 1's
    prev_fp = None
    for _ in range(max_iterations):
        t0 = _time.time()
        e_new = _persist(small_star(large_star(e)))
        # Size-gated convergence check (scale-adaptive, exact either
        # way). Small edge sets (scheduling-latency-bound rounds) get
        # the star-forest test fused into the round's aggregate and can
        # exit the round the fixpoint APPEARS; large sets keep the
        # cheap (count, hash-sum) fingerprint — the countDistinct trio
        # was measured at 0.5-0.9x a full round's data work at 5M
        # edges, more than the confirmation round it saves, while at
        # bench-scale graphs it saves ~20% of total CC wall. The gate
        # uses the PREVIOUS round's exact edge count (initially the
        # canon count): off by at most one round of shrinkage, and a
        # mis-gated round only costs the backstop path, never
        # correctness. Large graphs whose edge set shrinks under the
        # gate mid-convergence pick up the early exit for their final
        # rounds.
        if n_est <= _STAR_CHECK_MAX_EDGES:
            fp, is_star = _round_stats(e_new)
        else:
            fp, is_star = _fingerprint(e_new), False
        if round_walls is not None:
            round_walls.append(round(_time.time() - t0, 3))
        e = e_new
        n_est = fp[0]
        # primary exit: the edge set IS a star forest (fixpoint reached
        # THIS round — no confirmation round). The fingerprint equality
        # stays as the backstop (and as the sole exit above the gate).
        if is_star or fp == prev_fp:
            break
        prev_fp = fp

    # stable edge set = stars (node -> component min); add the roots.
    # The min-agg guarantees ONE label per node even if the loop exited
    # via max_iterations before the fingerprint converged (a non-star
    # edge set can carry a node with several neighbors).
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    labels = labels.unionByName(
        labels.select(F.col("component").alias("node"), F.col("component"))
    ).groupBy("node").agg(F.min("component").alias("component"))

    if nodes is not None:
        labels = (
            nodes.select("node")
            .distinct()
            .join(labels, "node", "left")
            .select(
                "node", F.coalesce("component", F.col("node")).alias("component")
            )
        )
    return labels


def cluster_mentions(
    mentions: DataFrame,
    edges: DataFrame,
    id_col: str = "mention_id",
    out_col: str = "chain_id",
) -> DataFrame:
    """Attach a transitive cluster label to a mentions-like DataFrame.

    Singletons (no edges) keep their own id as the label.
    """
    nodes = mentions.select(F.col(id_col).alias("node"))
    comps = connected_components(edges, nodes=nodes)
    return mentions.join(
        comps.select(
            F.col("node").alias(id_col), F.col("component").alias(out_col)
        ),
        id_col,
        "left",
    ).withColumn(out_col, F.coalesce(F.col(out_col), F.col(id_col)))


def incremental_components(
    prev: DataFrame,
    new_edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fold a batch of NEW edges into an existing component assignment
    (the streaming / micro-batch ER shape: yesterday's clusters + one
    crawl batch of fresh merge edges).

    `prev` (node, component) is itself an edge set — every node points
    at its label — and it is STAR-SHAPED: depth 1 by construction. The
    union of those stars with the new edges therefore closes in O(log
    |new|) label-propagation rounds that touch mostly the components
    the new edges actually bridge; untouched stars re-confirm their
    label in the first round and stop changing. Correctness does not
    depend on that locality: the result equals full CC over (all
    original edges + new edges), because a star is closure-equivalent
    to the subgraph it summarizes (tests/test_cc.py proves equality).

    Labels stay the lexicographic min node id, so a component keeps its
    label unless a new edge merges it with a lexicographically smaller
    one — exactly the stability checkpoint/resume needs.

    Every node of `prev` survives into the output even when nothing in
    the new batch touches it.

    Scale shape (round-3 rewrite): the closure runs on the COMPONENT
    graph, not the node graph. New-edge endpoints map to their prior
    labels (one equi-join per side), the distinct (label, label) pairs
    close — a graph whose node count is the number of prior components
    plus genuinely-new nodes, orders of magnitude below the corpus —
    and the result relabels `prev` through one label->label join whose
    build side is bounded by the component count. Measured at 11M base
    edges + 1M new: the previous stars+new full closure took the same
    wall as recomputing from scratch (~130 s); the component-graph fold
    is join-bound (BASELINE.md). Labels stay the lexicographic min node
    id: a component's id IS its min node, so the min over merged
    component ids is the global min — byte-identical to full CC over
    (original + new), which tests/test_cc.py and the `cc_incremental`
    oracle row assert."""
    plab = prev.select("node", "component")
    e = (
        new_edges.select("src", "dst")
        .join(
            plab.select(
                F.col("node").alias("src"), F.col("component").alias("src_c")
            ),
            "src",
            "left",
        )
        .join(
            plab.select(
                F.col("node").alias("dst"), F.col("component").alias("dst_c")
            ),
            "dst",
            "left",
        )
    )
    # endpoints unseen by prev enter as their own (singleton) labels
    comp_edges = (
        e.select(
            F.coalesce("src_c", F.col("src")).alias("src"),
            F.coalesce("dst_c", F.col("dst")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    new_nodes = (
        new_edges.select(F.col("src").alias("node"))
        .unionByName(new_edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    unseen = new_nodes.join(plab.select("node"), "node", "left_anti")
    comp_nodes = (
        prev.select(F.col("component").alias("node"))
        .distinct()
        .unionByName(unseen)
    )
    relab = connected_components(
        comp_edges,
        nodes=comp_nodes,
        max_iterations=max_iterations,
        checkpoint_dir=checkpoint_dir,
    )
    mapping = relab.select(
        F.col("node").alias("old_c"), F.col("component").alias("new_c")
    )
    out = prev.join(
        mapping, prev["component"] == mapping["old_c"], "left"
    ).select(
        "node", F.coalesce("new_c", F.col("component")).alias("component")
    )
    out = out.unionByName(
        unseen.join(mapping, unseen["node"] == mapping["old_c"]).select(
            "node", F.col("new_c").alias("component")
        )
    )
    if nodes is not None:
        extra = (
            nodes.select("node")
            .distinct()
            .join(out.select("node"), "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        out = out.unionByName(extra)
    return out
