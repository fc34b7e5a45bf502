"""Resolution: rank / decide / match (SURVEY.md §2.6, R1-R7).

Resolvers act on the scored-pairs DataFrame and produce/refine a
decisions table (doc_id, chain_id, entity_id). The reference's
one/many/none narrowing (resolver.py:253-303) becomes window counting;
the cascade (resolver.py:192-213) is a fold where decided chains leave
the candidate pool.

A resolver here is a function pairs -> (decisions, remaining_pairs):
  decisions       — chains this stage resolved (doc_id, chain_id, entity_id)
  remaining_pairs — the (possibly narrowed) pairs for downstream stages
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hamerkop_spark.operators.features import (
    exact_match_feature,
    levenshtein_feature,
    wikipedia_feature,
)

CHAIN = ["doc_id", "chain_id"]
Resolver = Callable[[DataFrame], tuple[DataFrame, DataFrame]]


def first_resolver(pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R1 FirstResolver (resolver.py:245-250): pick the first candidate in
    generator order (carried as source_rank/retrieval_rank)."""
    order = [
        c for c in ("source_rank", "retrieval_rank", "entity_id") if c in pairs.columns
    ]
    w = Window.partitionBy(*CHAIN).orderBy(*order)
    decisions = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(*CHAIN, "entity_id")
    )
    remaining = pairs.join(decisions.select(*CHAIN), CHAIN, "left_anti")
    return decisions, remaining


def _one_many_none(pairs: DataFrame, match: Column) -> tuple[DataFrame, DataFrame]:
    """Shared one/many/none narrowing (ExactNameResolver semantics,
    resolver.py:253-272): exactly one match -> decide; several -> narrow
    candidates to the matches; none -> pass through untouched."""
    w = Window.partitionBy(*CHAIN)
    flagged = pairs.withColumn("m", match.cast("int")).withColumn(
        "n_match", F.sum("m").over(w)
    )
    decisions = flagged.where((F.col("n_match") == 1) & (F.col("m") == 1)).select(
        *CHAIN, "entity_id"
    )
    remaining = (
        flagged.where(F.col("n_match") != 1)
        .where((F.col("n_match") == 0) | (F.col("m") == 1))
        .drop("m", "n_match")
    )
    return decisions, remaining


def exact_name_resolver(pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R2 ExactNameResolver (resolver.py:253-272). Match = CI name overlap
    of chain mention strings and entity names (chain.names, not
    all_strings — resolver.py:264 uses chain.names)."""
    match = F.arrays_overlap(
        F.array_distinct(F.transform(F.col("chain_names"), F.lower)),
        F.array_distinct(F.transform(F.col("entity_names"), F.lower)),
    )
    return _one_many_none(pairs, match)


def wikipedia_resolver(pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R3 WikipediaResolver (resolver.py:275-303): same narrowing keyed on
    the wikipedia-url match."""
    from hamerkop_spark.operators.features import ensure_derived

    return _one_many_none(ensure_derived(pairs), wikipedia_feature() > 0)


def edit_distance_resolver(
    pairs: DataFrame, threshold: float = 0.1, margin: float = 0.0
) -> tuple[DataFrame, DataFrame]:
    """R4 EditDistanceResolver (resolver.py:306-322): per-chain argmin of
    min-over-name-pairs normalized edit distance; accept when < threshold.
    (The reference's accidental cross-candidate carry-over of `distance`
    is not replicated; per-chain argmin is the documented intent —
    SURVEY.md §7(b).) Deterministic tie-break by entity_id.

    `margin` > 0 adds an ambiguity gate: abstain (leave for later
    stages / NIL) when the runner-up candidate's distance is within
    `margin` of the best — at web-scale KB surface density, a fuzzy
    argmin with several near-equal candidates is evidence of a
    collision, not a link."""
    from hamerkop_spark.operators.features import ensure_derived

    d = (
        ensure_derived(pairs).withColumn("dist", levenshtein_feature())
        if "f_levenshtein" not in pairs.columns
        else pairs.withColumn("dist", F.col("f_levenshtein"))
    )
    w = Window.partitionBy(*CHAIN).orderBy("dist", "entity_id")
    ranked = d.withColumn("rn", F.row_number().over(w))
    accept = (F.col("rn") == 1) & (F.col("dist") < threshold)
    if margin > 0:
        nxt = F.lead("dist").over(w)
        ranked = ranked.withColumn("next_dist", nxt)
        accept = accept & (
            F.col("next_dist").isNull()
            | (F.col("next_dist") - F.col("dist") >= margin)
        )
    decisions = ranked.where(accept).select(*CHAIN, "entity_id")
    remaining = d.drop("dist").join(decisions.select(*CHAIN), CHAIN, "left_anti")
    return decisions, remaining


def linear_resolver(
    weights: dict[str, float], bias: float = 0.0, threshold: float = 0.0,
    margin: float = 0.0,
) -> Resolver:
    """R5 SvmResolver (resolver.py:325-343) generalized: a calibrated
    linear/logistic combination over feature columns. All scores below
    `threshold` -> NIL (no decision); else argmax (deterministic
    tie-break by entity_id). Score is a native column expression — the
    model's weights are literals, so the whole decision stays in codegen.

    `margin` > 0 abstains when the runner-up's score is within `margin`
    (logit units) of the best: an ambiguity gate against fuzzy-collision
    links at dense KB surface neighborhoods."""

    def run(pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
        score = F.lit(float(bias))
        for col, wgt in weights.items():
            score = score + F.lit(float(wgt)) * F.col(col)
        scored = pairs.withColumn("match_score", score)
        w = Window.partitionBy(*CHAIN).orderBy(
            F.desc("match_score"), F.col("entity_id")
        )
        ranked = scored.withColumn("rn", F.row_number().over(w))
        accept = (F.col("rn") == 1) & (F.col("match_score") >= threshold)
        if margin > 0:
            ranked = ranked.withColumn(
                "next_score", F.lead("match_score").over(w)
            )
            accept = accept & (
                F.col("next_score").isNull()
                | (F.col("match_score") - F.col("next_score") >= margin)
            )
        decisions = ranked.where(accept).select(*CHAIN, "entity_id")
        remaining = scored.drop("match_score").join(
            decisions.select(*CHAIN), CHAIN, "left_anti"
        )
        return decisions, remaining

    return run


def type_specific(resolver: Resolver, *types: str) -> Resolver:
    """R7 TypeSpecificResolver (resolver.py:229-242): stage only sees pairs
    whose chain type is in `types`; others pass through untouched."""

    def run(pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
        inside = pairs.where(F.col("chain_type").isin(list(types)))
        outside = pairs.where(~F.col("chain_type").isin(list(types)))
        decisions, remaining = resolver(inside)
        return decisions, remaining.unionByName(outside)

    return run


def language_specific(resolver: Resolver, *langs: str) -> Resolver:
    """R7 LanguageSpecificResolver (resolver.py:216-227); pairs must carry
    a `lang` column."""

    def run(pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
        inside = pairs.where(F.col("lang").isin(list(langs)))
        outside = pairs.where(~F.col("lang").isin(list(langs)))
        decisions, remaining = resolver(inside)
        return decisions, remaining.unionByName(outside)

    return run


def cascade_resolver(
    pairs: DataFrame, resolvers: Sequence[Resolver]
) -> DataFrame:
    """R6 CascadeResolver (resolver.py:192-213): run stages in order;
    resolved chains leave the pool; later stages see narrowed candidate
    sets. Returns the union of all stage decisions."""
    all_decisions = None
    remaining = pairs
    for resolver in resolvers:
        decisions, remaining = resolver(remaining)
        all_decisions = (
            decisions
            if all_decisions is None
            else all_decisions.unionByName(decisions)
        )
        remaining = remaining.localCheckpoint(eager=False)
    return all_decisions


def decisions_to_links(
    mentions_with_chains: DataFrame, decisions: DataFrame
) -> DataFrame:
    """Project decisions back to mentions: entity_id or null (NIL)."""
    return mentions_with_chains.join(decisions, CHAIN, "left")
