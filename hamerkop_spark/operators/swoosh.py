"""Merge-based entity resolution (the Swoosh family).

Benjelloun, Garcia-Molina, Menestrina, Su, Whang & Widom, "Swoosh: a
generic approach to entity resolution" (VLDB Journal 18(1), 2009) and
the distributed variant D-Swoosh (Benjelloun et al., ICDE 2007). The
reference engine has no merge-based ER at all — its coref/linkage
stages only DECIDE pairs (hamerkop/coref.py, resolver.py); records
never change. This module adds the other classic paradigm: matched
records MERGE into a composite record whose enriched value set can
match records that neither source record matched alone, and matching
repeats on the composites until nothing new matches — the *merge
closure* R-bar(R) of the paper.

Model instance implemented here:

* a record is a set of values (tokens, alt-names, keys — any
  ``array<string>`` column);
* ``merge(r, s) = values(r) UNION values(s)`` (union merge);
* ``match(r, s) = |values(r) INTERSECT values(s)| >= min_shared``.

Union merge is idempotent/commutative/associative, and the overlap
predicate is MONOTONE under union (growing a value set never breaks
an existing match), so the pair satisfies the ICAR properties of
Swoosh §2.2 (representativity = monotonicity here). Under ICAR the
merge closure is UNIQUE and order-independent (Swoosh Props 2.1-2.3),
which licenses the round-parallel evaluation below: instead of the
paper's sequential R-Swoosh sweep (one record at a time against a
buffer), each round matches ALL current composites at once, closes
the round's match graph transitively, and merges every component in
one aggregation — the D-Swoosh observation that any schedule reaches
the same closure. ``tests/test_swoosh.py`` proves the equality
against a scalar sequential R-Swoosh on randomized corpora.

Why transitive closure INSIDE a round is sound: if match(a,b) and
match(b,c), R-Swoosh may merge a,b first and c might only match the
composite — but union-merge associativity makes <a,b,c> one composite
either way, and monotonicity guarantees the composite still matches
everything its members matched, so eagerly merging whole components
never over- or under-merges relative to the sequential sweep.

Round shape (pure DataFrame algebra; no driver-side state):

1. postings: explode each composite's value set to (value, rid);
   optionally drop values hotter than ``max_value_df`` (block purge —
   the same cap-and-caveat as the ngram retrieval's ``max_df``: a
   stop-value must not emit cap^2 candidate pairs). The cap is a
   RECALL knob, not a correctness one; the oracle query runs uncapped.
2. candidate pairs: postings self-join on value, pair groupBy with a
   map-side partial count, keep pairs with >= min_shared shared
   values. This is the only shuffle that grows with value frequency.
3. components: two-phase large-star/small-star closure
   (operators/cc.py — measured flat to 22M edges) over this round's
   match edges; component label = min member id.
4. merge: one groupBy component — values = sorted distinct union
   (deterministic regardless of collect order), id = component label
   (the transitive min, so entity ids are stable content-derived
   keys); membership lineage composed with one join per round.

Rounds repeat until no pair matches; every merging round strictly
decreases the composite count, so termination is bounded by n (2-4
rounds on real corpora — merge cascades flatten fast). At 100 TB each
round is the same postings-join + CC + partial-agg groupBy shape as
the blocking/dedup operators, all shuffle-partitioned on value/pair/
component keys; per-round ``localCheckpoint`` keeps the logical plan
flat across iterations exactly like the CC loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hamerkop_spark.operators.cc import connected_components


def _postings(cur: DataFrame, max_value_df: int | None) -> DataFrame:
    """(rid, val) exploded distinct postings of the current composites,
    with the optional hot-value purge."""
    tok = cur.select("rid", F.explode("vals").alias("val"))
    if max_value_df is not None:
        hot = (
            tok.groupBy("val")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_value_df)
            .select("val")
        )
        tok = tok.join(F.broadcast(hot), "val", "left_anti")
    return tok


def _match_pairs(tok: DataFrame, min_shared: int) -> DataFrame:
    """(src, dst) composite pairs sharing >= min_shared values. The
    groupBy count is a partial-aggregable sum over the postings join;
    src < dst canonicalizes the undirected pair."""
    a = tok.alias("a")
    b = tok.alias("b")
    return (
        a.join(b, "val")
        .where(F.col("a.rid") < F.col("b.rid"))
        .groupBy(
            F.col("a.rid").alias("src"), F.col("b.rid").alias("dst")
        )
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
        .select("src", "dst")
    )


def swoosh_merge(
    records: DataFrame,
    id_col: str = "record_id",
    values_col: str = "values",
    min_shared: int = 2,
    max_value_df: int | None = None,
    max_rounds: int = 25,
) -> tuple[DataFrame, DataFrame]:
    """Compute the Swoosh merge closure of ``records``.

    :param records: one row per base record; ``values_col`` is an
        ``array<string>`` value set (null/empty arrays stay singleton
        entities). ``id_col`` values must be unique; they are compared
        as strings, so pass zero-padded or otherwise order-consistent
        ids when numeric entity labels matter (the returned labels are
        the per-entity MINIMUM member id).
    :param min_shared: match threshold — composites sharing at least
        this many distinct values merge. 1 degenerates to connected
        components of the share-a-value graph (no second round can
        ever fire); >= 2 exercises true merge-closure dynamics.
    :param max_value_df: optional per-round hot-value purge (block
        cap). Trades recall for a bounded postings join, exactly like
        the retrieval ``max_df`` knob; None (default) is exact.
    :param max_rounds: safety bound on merge rounds.
    :return: ``(entities, membership)`` —
        entities (entity_id, values array<string>, n_members bigint),
        membership (record_id, entity_id). entity_id is the minimum
        member record id; values is the sorted distinct union of the
        members' value sets.
    """
    cur = records.select(
        F.col(id_col).cast("string").alias("rid"),
        F.array_distinct(
            F.coalesce(values_col, F.array().cast("array<string>"))
        ).alias("vals"),
    ).localCheckpoint(eager=False)
    membership = cur.select(
        F.col("rid").alias("record_id"), F.col("rid")
    )
    for _ in range(max_rounds):
        pairs = _match_pairs(_postings(cur, max_value_df), min_shared)
        if pairs.isEmpty():
            break
        comp = connected_components(
            pairs, nodes=cur.select(F.col("rid").alias("node"))
        )
        cur = (
            cur.join(comp, cur.rid == comp.node)
            .groupBy("component")
            .agg(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("vals")))
                ).alias("vals")
            )
            .select(F.col("component").alias("rid"), "vals")
            .localCheckpoint(eager=True)
        )
        membership = (
            membership.join(
                comp.withColumnRenamed("node", "rid"), "rid"
            )
            .select("record_id", F.col("component").alias("rid"))
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"swoosh merge closure did not converge in {max_rounds} rounds"
        )
    membership = membership.select(
        "record_id", F.col("rid").alias("entity_id")
    )
    entities = (
        membership.groupBy("entity_id")
        .agg(F.count("*").alias("n_members"))
        .join(
            cur.select(F.col("rid").alias("entity_id"), "vals"), "entity_id"
        )
        .select(
            "entity_id", F.col("vals").alias("values"), "n_members"
        )
    )
    return entities, membership
