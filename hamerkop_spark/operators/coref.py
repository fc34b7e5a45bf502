"""In-document coreference as a sieve of merge-edge generators
(SURVEY.md §2.3, C1-C6).

The reference's CascadeCoref (hamerkop/coref.py:197-211) seeds every
mention as a singleton chain and lets each stage greedily merge chains.
Declaratively: every stage *generates merge edges* between current chain
ids; the post-stage chains are the connected components of those edges.
Sieve ordering is preserved by relabeling between stages. The reference's
greedy order-dependence (AcronymStage first-match, coref.py:308-321) is
deliberately relaxed to transitive closure — cluster-level parity is what
the acceptance metric checks (SURVEY.md §7 "what's hard" (b)).

Input mentions DataFrame needs: mention_id, doc_id, type, string, lang,
char_start; plus a chain_id column (initialize with `init_chains`).
Stages return edge DataFrames (src, dst) over chain ids.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hamerkop_spark.functions.strings import acronym_initials
from hamerkop_spark.operators.cc import connected_components

EdgeGen = Callable[[DataFrame], DataFrame]


def init_chains(mentions: DataFrame) -> DataFrame:
    """Seed: every mention is its own chain (coref.py:208-209)."""
    return mentions.withColumn("chain_id", F.col("mention_id"))


def _edges_from_groups(df: DataFrame, key_cols: list) -> DataFrame:
    """Turn 'all chain_ids sharing a key merge' into edges: each chain in a
    group points at the group's min chain id. Shuffle on the group key;
    no self-join needed (window min over the key partition)."""
    w = Window.partitionBy(*key_cols)
    return (
        df.select(*key_cols, "chain_id")
        .distinct()
        .withColumn("root", F.min("chain_id").over(w))
        .where(F.col("chain_id") != F.col("root"))
        .select(F.col("chain_id").alias("src"), F.col("root").alias("dst"))
        .distinct()
    )


def exact_match_stage(mentions: DataFrame) -> DataFrame:
    """C2 ExactMatchStage (coref.py:266-282): chains sharing a
    case-insensitive mention string, per (doc, mention type), merge."""
    keyed = mentions.withColumn("xkey", F.lower(F.col("string")))
    return _edges_from_groups(keyed, ["doc_id", "type", "xkey"])


def _chains_view(mentions: DataFrame) -> DataFrame:
    """Per-chain helper: chain type = first mention's type (core.py:232-234,
    'first' = document order, i.e. min char_start)."""
    w = Window.partitionBy("chain_id").orderBy("char_start", "mention_id")
    return (
        mentions.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "chain_type", F.first("type").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        )
    )


def acronym_stage(min_length: int = 3) -> EdgeGen:
    """C3 AcronymStage (coref.py:285-335): an all-caps mention (len >=
    min_length) merges with a same-doc same-type chain whose mention
    initials spell it. Greedy-first-match relaxed to transitive merge."""

    def run(mentions: DataFrame) -> DataFrame:
        chains = _chains_view(mentions)
        acronyms = (
            chains.where(
                (F.length("string") >= min_length)
                & (F.upper(F.col("string")) == F.col("string"))
                & F.col("string").rlike(r"[A-Z]")
            )
            .select(
                "doc_id",
                F.col("chain_type").alias("type_k"),
                F.col("chain_id").alias("acr_chain"),
                F.col("string").alias("acronym"),
            )
            .distinct()
        )
        initials = (
            chains.withColumn("initials", acronym_initials(F.col("string")))
            .where(F.length("initials") >= min_length)
            .select(
                "doc_id",
                F.col("chain_type").alias("type_k"),
                F.col("chain_id").alias("other_chain"),
                F.col("initials"),
            )
            .distinct()
        )
        return (
            acronyms.join(
                initials,
                (acronyms.doc_id == initials.doc_id)
                & (acronyms.type_k == initials.type_k)
                & (acronyms.acronym == initials.initials),
            )
            .where(F.col("acr_chain") != F.col("other_chain"))
            .select(
                F.col("acr_chain").alias("src"), F.col("other_chain").alias("dst")
            )
            .distinct()
        )

    return run


def single_token_match_stage(index: int) -> EdgeGen:
    """C4 SingleTokenMatchStage (coref.py:338-382): a chain's single-token
    name merges with chains whose multi-token name has that token at
    `index` (0 = first, -1 = last), CI, same doc + type. The reference
    merges the single chain with ALL matches at once, so transitive
    semantics are already its semantics."""
    # 0-based `index` -> 1-based element_at position; negatives pass
    # through (element_at and python share tail semantics). index+1, not
    # index: mapping positive indexes straight through made index=1
    # fetch the FIRST token (review fix)
    element = index + 1 if index >= 0 else index

    def run(mentions: DataFrame) -> DataFrame:
        chains = _chains_view(mentions)
        singles = (
            chains.where(~F.col("string").contains(" "))
            .select(
                "doc_id",
                F.col("chain_type").alias("type_k"),
                F.col("chain_id").alias("single_chain"),
                F.lower(F.col("string")).alias("tok"),
            )
            .distinct()
        )
        multis = (
            chains.where(F.col("string").contains(" "))
            .withColumn(
                "tok",
                F.lower(
                    F.element_at(
                        F.filter(F.split(F.col("string"), r"\s+"), lambda t: t != ""),
                        element,
                    )
                ),
            )
            .select(
                "doc_id",
                F.col("chain_type").alias("type_k"),
                F.col("chain_id").alias("multi_chain"),
                "tok",
            )
            .distinct()
        )
        return (
            singles.join(multis, ["doc_id", "type_k", "tok"])
            .where(F.col("single_chain") != F.col("multi_chain"))
            .select(
                F.col("single_chain").alias("src"),
                F.col("multi_chain").alias("dst"),
            )
            .distinct()
        )

    return run


def language_specific(stage: EdgeGen, *langs: str) -> EdgeGen:
    """C5 LanguageSpecificStage (coref.py:237-247)."""

    def run(mentions: DataFrame) -> DataFrame:
        return stage(mentions.where(F.col("lang").isin(list(langs))))

    return run


def type_specific(stage: EdgeGen, *types: str) -> EdgeGen:
    """C6 TypeSpecificStage (coref.py:250-263): restrict to chains of the
    given types (chain type = first mention's type)."""

    def run(mentions: DataFrame) -> DataFrame:
        chains = _chains_view(mentions)
        return stage(
            chains.where(F.col("chain_type").isin(list(types))).drop(
                "rn", "chain_type"
            )
        )

    return run


def apply_stage(mentions: DataFrame, stage: EdgeGen) -> DataFrame:
    """Run one sieve stage: generate edges over current chain ids, take
    connected components, relabel chain_id (min chain id in component)."""
    edges = stage(mentions)
    comps = connected_components(edges)
    relabel = comps.select(
        F.col("node").alias("chain_id"), F.col("component").alias("new_chain")
    )
    return (
        mentions.join(relabel, "chain_id", "left")
        .withColumn("chain_id", F.coalesce("new_chain", "chain_id"))
        .drop("new_chain")
    )


def cascade_coref(mentions: DataFrame, stages: Sequence[EdgeGen]) -> DataFrame:
    """C1 CascadeCoref (coref.py:197-211): singleton init + ordered stages.
    Returns the mentions DataFrame with a final chain_id column."""
    df = init_chains(mentions)
    for i, stage in enumerate(stages):
        df = apply_stage(df, stage)
        # truncate lineage between sieve stages (iterative plan growth)
        df = df.localCheckpoint(eager=False)
    return df


def chains_table(mentions_with_chains: DataFrame) -> DataFrame:
    """Aggregate the per-chain view (MentionChain, core.py:178-240):
    name = longest mention string (core.py:192-198, max_by length),
    names = distinct strings, type = first mention's type, plus longest
    translit/translate strings (core.py:208-220)."""
    m = mentions_with_chains
    first_struct = F.struct(
        F.col("char_start"), F.col("mention_id"), F.col("type")
    )
    # max_by keys are (length, value) structs: among equal-length distinct
    # strings a bare length key would tie-break nondeterministically across
    # partitionings, and the chain name feeds blocking probe keys, NIL edge
    # keys, and checkpointed tables (byte-stable determinism convention)
    return m.groupBy("doc_id", "chain_id").agg(
        F.max_by("string", F.struct(F.length("string"), F.col("string"))).alias(
            "name"
        ),
        F.collect_set("string").alias("names"),
        F.min_by("type", F.struct(F.col("char_start"), F.col("mention_id"))).alias("type"),
        F.max_by(
            "translit_string",
            F.when(
                F.col("translit_string").isNotNull(),
                F.struct(F.length("translit_string"), F.col("translit_string")),
            ),
        ).alias("translit_name"),
        F.max_by(
            "translate_string",
            F.when(
                F.col("translate_string").isNotNull(),
                F.struct(F.length("translate_string"), F.col("translate_string")),
            ),
        ).alias("translate_name"),
        F.array_distinct(
            F.flatten(
                F.collect_list(
                    F.array_compact(
                        F.array(
                            F.col("string"),
                            F.col("translit_string"),
                            F.col("translate_string"),
                        )
                    )
                )
            )
        ).alias("all_strings"),
        F.count("*").alias("n_mentions"),
        # document-order first, NOT F.first (non-deterministic across
        # partitionings) — lang can vary per mention in multilingual
        # docs and chains feed checkpointed tables + language routing,
        # so byte-stable determinism requires an ordered pick
        F.min_by("lang", F.struct("char_start", "mention_id")).alias("lang"),
        F.min_by(
            "doc_type", F.struct("char_start", "mention_id")
        ).alias("doc_type"),
    )
