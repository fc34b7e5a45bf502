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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Compute connected components.

    :param edges: DataFrame with columns (src: string, dst: string).
    :param nodes: optional DataFrame with column (node: string); isolated
        nodes (no edges) appear as singleton components.
    :param max_iterations: safety bound; converges in O(log n) rounds.
    :param checkpoint_dir: when set, per-iteration state uses RELIABLE
        checkpoints (survives executor loss — the cluster setting);
        default localCheckpoint is faster and fine on local[N].
    :return: DataFrame (node: string, component: string) where component is
        the min node id in the component.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _persist(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)
    # label[v] = min(v, min over neighbors) — start from the edge list as a
    # neighbor relation and iterate min-label propagation. This is the
    # "small-star only on a min-label graph" simplification: each round
    #   l'(v) = min(l(v), min_{u in N(v)} l(u))
    # propagated through the *current label graph*, which contracts paths
    # by pointer jumping (join labels on both endpoints) — O(log d) rounds.
    e = _symmetrize(edges)
    if e.isEmpty():
        if nodes is not None:
            return nodes.select(
                F.col("node"), F.col("node").alias("component")
            ).distinct()
        return spark.createDataFrame([], "node string, component string")

    # initial labels: every endpoint labels itself
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    e = _persist(e.repartition("src"))
    labels = _persist(labels)

    for _ in range(max_iterations):
        # candidate labels: own label + each neighbor's label
        neighbor_labels = (
            e.join(labels.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            
        )
        new_labels = _persist(new_labels)
        # pointer jumping: re-label through the label of the label
        parents = new_labels.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        jump = (
            new_labels.join(
                parents, new_labels["component"] == parents["p_node"], "left"
            )
            .select(
                F.col("node"),
                F.coalesce(F.col("p_comp"), F.col("component")).alias("component"),
            )
        )
        jump = _persist(jump)
        changed = (
            jump.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = jump
        if changed == 0:
            break

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
    the new batch touches it: a singleton's (x, x) star edge is a
    self-loop the closure filters out, so prev's node set is always
    folded into `nodes`."""
    star = prev.select(
        F.col("node").alias("src"), F.col("component").alias("dst")
    )
    edges = star.unionByName(
        new_edges.select("src", "dst")
    )
    # `nodes` is the OUTPUT UNIVERSE for connected_components, so it
    # must contain every prev node (or singletons vanish — their (x, x)
    # star edge is a self-loop the closure filters) AND every new-edge
    # endpoint (or fresh nodes vanish), plus whatever the caller adds
    all_nodes = prev.select("node").unionByName(
        new_edges.select(F.col("src").alias("node"))
    ).unionByName(new_edges.select(F.col("dst").alias("node")))
    if nodes is not None:
        all_nodes = all_nodes.unionByName(nodes.select("node"))
    return connected_components(
        edges,
        nodes=all_nodes,
        max_iterations=max_iterations,
        checkpoint_dir=checkpoint_dir,
    )
