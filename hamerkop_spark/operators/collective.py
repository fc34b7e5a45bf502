"""Collective (document-level) entity disambiguation.

The reference resolves each chain independently (resolver.py:192-213
cascades per-chain decisions; no stage looks at the OTHER chains of the
document). This module adds the textbook next step — coherence-based
collective disambiguation (Milne & Witten 2008 relatedness; Hoffart et
al. 2011 AIDA; Ratinov et al. 2011 GLOW): candidate entities that are
related in the KB support each other across the mentions of one
document, so "Paris" next to "Seine" resolves to the city even when the
local string score prefers the person.

Model (fixed-iteration message passing, all joins/groupBys, no UDFs):

    s_0(c,e)   = per-chain min-max-normalized local score
    rel(e,e')  = |links(e) ∩ links(e')| / |links(e) ∪ links(e')|
    msg_t(c,e) = Σ_{c'≠c in doc}  max_{e'}  rel(e,e') · s_t(c',e')
    s_{t+1}    = (1-λ)·s_0 + λ·norm_chain(msg_t)

Every quantity is held in FIXED-POINT MICRO-UNITS (bigint, 1e6 = 1.0):
products use integer floor, sums are exact integer additions — so the
result is independent of aggregation order and bit-identical across
engines (the same discipline as the ngram-IDF retrieval scores,
blocking.py). The only float ops are single `floor(1e6·a/b)` divisions
of exactly-representable integers, which IEEE-754 pins to one result.

Scale shape: candidates are pruned to `top_k` per chain BEFORE the
doc-level pair join, so the message-passing edge set is bounded by
Σ_doc (top_k · n_chains)² with n_chains the document's chain count —
never KB-sized; relatedness is computed once on the DISTINCT
co-occurring entity pairs (explode links → equi-join → count), and the
per-iteration update is one equi-join + two aggregations on that fixed
edge set. Iterations are a compile-time constant (default 2), so the
whole plan is a static DAG Catalyst sees end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hamerkop_spark.operators.resolve import CHAIN

#: 1.0 in fixed-point micro-units.
MICRO = 1_000_000


def _micro_ratio(num, den):
    """floor(1e6·num/den) with a den==0 → 0 guard; num, den integer
    columns small enough that 1e6·num is exact as a double (< 2^53 up
    to num ≈ 9e9 — link-overlap counts at any real KB are far below)."""
    return F.when(den == 0, F.lit(0)).otherwise(
        F.floor(F.lit(MICRO) * num / den)
    ).cast("long")


def entity_pair_relatedness(
    entity_pairs: DataFrame, entity_links: DataFrame
) -> DataFrame:
    """Link-set Jaccard relatedness for given entity pairs, in micro-units.

    :param entity_pairs: distinct (a_entity, b_entity) pairs to score.
    :param entity_links: (entity_id, link) one row per KB link/relation
        of an entity (duplicates tolerated — counted once).
    :return: (a_entity, b_entity, rel_micro) — pairs with zero overlap
        are ABSENT (a sparse result; callers treat missing as 0), and
        an identical pair scores 1e6 by construction.
    """
    links = entity_links.select(
        F.col("entity_id"), F.col("link")
    ).distinct()
    sizes = links.groupBy("entity_id").agg(F.count("*").alias("n_links"))
    la = links.select(
        F.col("entity_id").alias("a_entity"), "link"
    )
    lb = links.select(
        F.col("entity_id").alias("b_entity"), "link"
    )
    inter = (
        entity_pairs.join(la, "a_entity")
        .join(lb, ["b_entity", "link"])
        .groupBy("a_entity", "b_entity")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("entity_id", "a_entity")
                   .withColumnRenamed("n_links", "na"), "a_entity")
        .join(sizes.withColumnRenamed("entity_id", "b_entity")
              .withColumnRenamed("n_links", "nb"), "b_entity")
        .select(
            "a_entity", "b_entity",
            _micro_ratio(
                F.col("n_inter"),
                F.col("na") + F.col("nb") - F.col("n_inter"),
            ).alias("rel_micro"),
        )
        .where(F.col("rel_micro") > 0)
    )


def _norm_chain_micro(df: DataFrame, col: str, out: str) -> DataFrame:
    """Per-chain min-max normalization into [0, 1e6] micro-units.
    Constant groups (max == min) normalize to 1e6: a chain with one
    candidate (or all-equal scores) has full confidence in each, and the
    downstream argmax breaks ties on entity_id either way."""
    w = Window.partitionBy(*CHAIN)
    lo, hi = F.min(col).over(w), F.max(col).over(w)
    # association matters: the RATIO is computed first so the max
    # element divides two identical doubles (exactly 1.0 -> exactly
    # 1e6); `1e6*(s-lo)/(hi-lo)` left-to-right floors the max row to
    # 999999 whenever (s-lo) is inexact. Oracle SQL must mirror the
    # same parenthesization.
    return df.withColumn(
        out,
        F.when(hi == lo, F.lit(MICRO)).otherwise(
            F.floor(F.lit(MICRO) * ((F.col(col) - lo) / (hi - lo)))
        ).cast("long"),
    )


def coherence_rerank(
    cand: DataFrame,
    entity_links: DataFrame,
    lam_micro: int = 300_000,
    iterations: int = 2,
    top_k: int = 5,
) -> DataFrame:
    """Re-rank candidates by local score blended with document coherence.

    :param cand: (doc_id, chain_id, entity_id, score) candidates with a
        numeric local score (any scale — it is min-max normalized per
        chain before blending).
    :param entity_links: (entity_id, link) KB link rows for relatedness.
    :param lam_micro: coherence weight λ in micro-units (0 → pure local
        score, 1e6 → pure coherence).
    :param iterations: message-passing rounds (compile-time constant;
        each unrolls into one join + two aggs in the plan).
    :param top_k: per-chain candidate prune applied BEFORE the doc-level
        pair join — the standard AIDA-style bound that keeps the edge
        set (top_k · chains/doc)² instead of KB-sized.
    :return: (doc_id, chain_id, entity_id, score_micro) — final blended
        score; input rows beyond `top_k` per chain are dropped.
    """
    if not 0 <= lam_micro <= MICRO:
        raise ValueError(f"lam_micro must be in [0, {MICRO}]")
    w = Window.partitionBy(*CHAIN).orderBy(F.desc("score"), "entity_id")
    pruned = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .drop("_rn")
    )
    s0 = _norm_chain_micro(pruned, "score", "s0_micro").select(
        *CHAIN, "entity_id", "s0_micro"
    )
    # persist across the iteration joins AND the two uses per round
    s0 = s0.localCheckpoint(eager=False)
    if iterations <= 0 or lam_micro == 0:
        return s0.select(
            *CHAIN, "entity_id", F.col("s0_micro").alias("score_micro")
        )

    # doc-level message edges: (receiver chain c/entity e) <- (sender
    # chain c'/entity e'), c ≠ c', both directions by construction of
    # the inequality join. Built ONCE; every iteration reuses it.
    a = s0.select(
        F.col("doc_id"), F.col("chain_id"), F.col("entity_id")
    )
    b = s0.select(
        F.col("doc_id"), F.col("chain_id").alias("o_chain"),
        F.col("entity_id").alias("o_entity"),
    )
    edges = a.join(b, "doc_id").where(F.col("chain_id") != F.col("o_chain"))
    rel = entity_pair_relatedness(
        edges.select(
            F.col("entity_id").alias("a_entity"),
            F.col("o_entity").alias("b_entity"),
        ).distinct(),
        entity_links,
    )
    # inner join: zero-relatedness edges carry no message, dropping them
    # is exact and keeps the iterated edge set sparse
    edges = edges.join(
        rel,
        (edges["entity_id"] == rel["a_entity"])
        & (edges["o_entity"] == rel["b_entity"]),
    ).select(*CHAIN, "entity_id", "o_chain", "o_entity", "rel_micro")
    edges = edges.localCheckpoint(eager=False)

    s = s0.withColumn("s_micro", F.col("s0_micro")).drop("s0_micro")
    for _ in range(iterations):
        sender = s.select(
            "doc_id",
            F.col("chain_id").alias("o_chain"),
            F.col("entity_id").alias("o_entity"),
            "s_micro",
        )
        # max over the sender chain's candidates, then exact integer sum
        # over sender chains — both order-independent aggregates
        msg = (
            edges.join(sender, ["doc_id", "o_chain", "o_entity"])
            # explicit floor, not cast: double->long CASTS truncate in
            # Spark but ROUND in DuckDB — floor() agrees everywhere
            .withColumn(
                "contrib",
                F.floor(
                    F.col("rel_micro") * F.col("s_micro") / F.lit(MICRO)
                ).cast("long"),
            )
            .groupBy(*CHAIN, "entity_id", "o_chain")
            .agg(F.max("contrib").alias("best"))
            .groupBy(*CHAIN, "entity_id")
            .agg(F.sum("best").alias("coh_raw"))
        )
        # candidates with no related co-occurring entity get coherence 0
        blended = s0.join(msg, [*CHAIN, "entity_id"], "left").withColumn(
            "coh_raw", F.coalesce(F.col("coh_raw"), F.lit(0))
        )
        blended = _norm_chain_micro(blended, "coh_raw", "coh_micro")
        s = blended.select(
            *CHAIN, "entity_id",
            F.floor(
                (
                    F.lit(MICRO - lam_micro) * F.col("s0_micro")
                    + F.lit(lam_micro) * F.col("coh_micro")
                ) / F.lit(MICRO)
            ).cast("long").alias("s_micro"),
        )
    return s.withColumnRenamed("s_micro", "score_micro")


def decisions_as_links(decisions: DataFrame) -> DataFrame:
    """Co-occurrence relatedness source for KBs WITHOUT link structure:
    treat historical link decisions as the link table — links(e) = the
    documents e was linked in, so `entity_pair_relatedness` computes
    document-co-occurrence Jaccard instead of KB-link Jaccard, with
    the identical exact-arithmetic path.

    The standard bootstrap (self-training collective ER): run a local
    resolver pass first, feed its decisions back through this into
    `coherence_resolver`, and the second pass disambiguates against
    the corpus's own co-occurrence statistics."""
    return decisions.select(
        "entity_id", F.col("doc_id").cast("string").alias("link")
    )


def coherence_resolver(
    entity_links: DataFrame,
    lam_micro: int = 300_000,
    iterations: int = 2,
    top_k: int = 5,
    threshold_micro: int = 0,
    margin_micro: int = 0,
):
    """Resolver-stage wrapper: rerank by coherence, then per-chain argmax
    with the same NIL-threshold / ambiguity-margin contract as
    `linear_resolver` (resolve.py). Pairs must carry `match_score`
    (any numeric local score). Returns the (decisions, remaining)
    cascade shape, so it drops into `cascade_resolver` directly."""

    def run(pairs: DataFrame):
        cand = pairs.select(
            *CHAIN, "entity_id", F.col("match_score").alias("score")
        )
        rer = coherence_rerank(
            cand, entity_links,
            lam_micro=lam_micro, iterations=iterations, top_k=top_k,
        )
        w = Window.partitionBy(*CHAIN).orderBy(
            F.desc("score_micro"), "entity_id"
        )
        ranked = rer.withColumn("rn", F.row_number().over(w))
        accept = (F.col("rn") == 1) & (
            F.col("score_micro") >= F.lit(int(threshold_micro))
        )
        if margin_micro > 0:
            ranked = ranked.withColumn(
                "next_micro", F.lead("score_micro").over(w)
            )
            accept = accept & (
                F.col("next_micro").isNull()
                | (F.col("score_micro") - F.col("next_micro")
                   >= F.lit(int(margin_micro)))
            )
        decisions = ranked.where(accept).select(*CHAIN, "entity_id")
        remaining = pairs.join(
            decisions.select(*CHAIN), CHAIN, "left_anti"
        )
        return decisions, remaining

    return run
