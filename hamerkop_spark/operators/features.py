"""Pairwise features on (mention chain x candidate entity) pairs
(SURVEY.md §2.5, F1-F11; reference hamerkop/features.py).

Input: a pairs DataFrame produced by `build_pairs` — one row per
(doc_id, chain_id, entity_id) with the chain's name arrays and the
entity's attributes. Each feature adds one double column; cheap set/array
features are pure native; the reference computes every string comparison
over *lowercased* name sets (CaseInsensitiveSet stores lowercase,
utilities.py:23-24), so all comparisons here lower both sides first.

Name-pair minimization (F7/F9) uses nested higher-order aggregates —
still JVM-side, no UDF; name sets per pair are tiny (bounded by chain
size and KB alt-name counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hamerkop_spark.functions.strings import wikipedia_link


def build_pairs(
    chains: DataFrame,
    candidates: DataFrame,
    kb_entities: DataFrame,
    embeddings: bool = False,
    emb_dim: int = 32,
) -> DataFrame:
    """Assemble the scored-pairs input: candidates joined to chain name
    data and entity attributes. The KB side joins on entity_id (broadcast
    when small; hash join otherwise — Catalyst decides).

    Each side also precomputes its lowered / tokenized / last-token name
    arrays BEFORE the join: string normalization then runs once per chain
    and once per KB entity instead of once per candidate pair (a chain
    meets ~25 candidates, an entity can meet thousands of chains), and —
    because the derived columns sit below a join boundary — Catalyst
    cannot re-inline the normalization expressions into the per-pair
    nested-aggregate lambdas of the feature bundle (higher-order-function
    lambdas re-evaluate referenced expressions per element; see
    functions/strings.char_ngrams for the same trap)."""
    chain_side = chains.select(
        "doc_id",
        "chain_id",
        F.col("type").alias("chain_type"),
        F.col("name").alias("chain_name"),
        F.col("names").alias("chain_names"),
        F.col("all_strings").alias("chain_all_strings"),
    )
    chain_side = ensure_derived(chain_side)
    if embeddings:
        # hashing-trick name embeddings, PER SIDE below the join (same
        # hoisting rule as the other derived columns); opt-in because
        # they add emb_dim doubles per row to any checkpointed pairs
        from hamerkop_spark.functions.embed import add_hashed_embedding

        chain_side = add_hashed_embedding(
            chain_side, "chain_name", "chain_emb", dim=emb_dim
        )
    entity_side = kb_entities.select(
        "entity_id",
        F.col("names").alias("entity_names"),
        F.col("urls").alias("entity_urls"),
        "origin",
        "geo_country",
        "per_location",
        "org_location",
    )
    entity_side = ensure_derived(entity_side)
    if embeddings:
        from hamerkop_spark.functions.embed import add_hashed_embedding

        entity_side = add_hashed_embedding(
            # F.get, not element_at: ANSI mode (Spark 4 default) throws
            # on out-of-bounds element_at, and caller-supplied KBs can
            # legitimately carry names=[] rows
            entity_side.withColumn(
                "__entity_primary",
                F.coalesce(F.get(F.col("entity_names"), 0), F.lit("")),
            ),
            "__entity_primary",
            "entity_emb",
            dim=emb_dim,
        ).drop("__entity_primary")
    return (
        candidates.join(chain_side, ["doc_id", "chain_id"])
        .join(entity_side, "entity_id")
    )


def _lower_arr(c: Column) -> Column:
    return F.array_distinct(F.transform(c, F.lower))


def _token_set(name: Column) -> Column:
    return F.array_distinct(F.filter(F.split(name, r"\s+"), lambda t: t != ""))


def _last_tokens(arr: Column) -> Column:
    """Last token of each multi-token (space-containing) name."""
    multi = F.filter(arr, lambda s: s.contains(" "))
    return F.array_distinct(
        F.transform(multi, lambda s: F.element_at(_token_set(s), -1))
    )


#: derived name-normalization columns the feature bundle consumes:
#: name -> (source columns, expression). build_pairs computes them per
#: side BEFORE the join (once per chain / per entity); ensure_derived adds
#: any that are missing for callers passing raw pairs (fallback, per-pair).
DERIVED_COLS = {
    "chain_lower": (
        ["chain_all_strings"],
        lambda: _lower_arr(F.col("chain_all_strings")),
    ),
    "chain_wiki_links": (
        ["chain_names"],
        lambda: _lower_arr(F.transform(F.col("chain_names"), wikipedia_link)),
    ),
    # expressed over the chain_lower/entity_lower INTERMEDIATES (their
    # true dependency) — ensure_derived resolves transitively, and
    # build_pairs applies the exact same definitions, so there is one
    # source of truth for every normalization
    "chain_toks": (
        ["chain_lower"],
        lambda: F.transform(F.col("chain_lower"), _token_set),
    ),
    "chain_last": (
        ["chain_lower"],
        lambda: _last_tokens(F.col("chain_lower")),
    ),
    "entity_lower": (
        ["entity_names"],
        lambda: _lower_arr(F.col("entity_names")),
    ),
    "entity_urls_lower": (
        ["entity_urls"],
        lambda: _lower_arr(F.coalesce(F.col("entity_urls"), F.array())),
    ),
    "entity_toks": (
        ["entity_lower"],
        lambda: F.transform(F.col("entity_lower"), _token_set),
    ),
    "entity_last": (
        ["entity_lower"],
        lambda: _last_tokens(F.col("entity_lower")),
    ),
    "entity_n_names": (
        ["entity_names"],
        lambda: F.size("entity_names"),
    ),
    "entity_n_urls": (
        ["entity_urls"],
        lambda: F.when(F.col("entity_urls").isNull(), 0).otherwise(
            F.size("entity_urls")
        ),
    ),
}

#: the column set the STANDARD_FEATURES bundle actually reads — callers
#: that cache or checkpoint pairs before scoring should project to ids +
#: these first: dropping the raw name arrays roughly halves the cached
#: bytes the scoring stage must stream (the 8+-thread scoring stage is
#: memory-bandwidth-bound, not compute-bound).
SCORING_INPUT_COLS = [
    "origin",
    "chain_lower",
    "entity_lower",
    "chain_toks",
    "entity_toks",
    "chain_last",
    "entity_last",
    "chain_wiki_links",
    "entity_urls_lower",
    "entity_n_names",
    "entity_n_urls",
]


def scoring_projection(pairs: DataFrame, keep: list[str]) -> DataFrame:
    """Project pairs down to `keep` + the bundle's input columns."""
    cols = keep + [c for c in SCORING_INPUT_COLS if c in pairs.columns]
    return pairs.select(*cols)


def ensure_derived(pairs: DataFrame) -> DataFrame:
    """Add any missing derived normalization columns whose source columns
    are present, resolving transitively (chain_toks needs chain_lower,
    which may itself need deriving) — the per-pair fallback for callers
    that bypass build_pairs, and the single derivation path build_pairs
    itself uses per side."""
    while True:
        missing = {
            name: expr()
            for name, (srcs, expr) in DERIVED_COLS.items()
            if name not in pairs.columns
            and all(s in pairs.columns for s in srcs)
        }
        if not missing:
            return pairs
        pairs = pairs.withColumns(missing)


def origin_feature() -> Column:
    """F1 OriginFeature (features.py:69-82): GEO/AUG -> 1, APB/WLL -> 0."""
    return (
        F.when(F.col("origin").isin("geonames", "augmentation"), 1.0)
        .otherwise(0.0)
        .cast("double")
    )


def in_country_feature(*cc: str) -> Column:
    """F2 InCountryFeature (features.py:85-107): entity's location/country
    in the configured set. Per-type context resolution: PER/ORG use
    location, GEO uses country (features.py:100-107)."""
    country = F.coalesce(
        F.col("per_location"), F.col("org_location"), F.col("geo_country"), F.lit("")
    )
    return country.isin(list(cc)).cast("double")


def number_of_names_feature() -> Column:
    """F3 (features.py:110-116): 1 - 1/(1+|names|)."""
    return F.lit(1.0) - F.lit(1.0) / (1.0 + F.col("entity_n_names"))


def number_of_links_feature() -> Column:
    """F4 (features.py:119-125): 1 - 1/(1+|urls|)."""
    return F.lit(1.0) - F.lit(1.0) / (1.0 + F.col("entity_n_urls"))


def wikipedia_feature() -> Column:
    """F5 WikipediaFeature (features.py:128-141): any chain name, rendered
    as an en.wikipedia.org link, CI-matches an entity url."""
    return F.arrays_overlap(
        F.col("chain_wiki_links"), F.col("entity_urls_lower")
    ).cast("double")


def exact_match_feature() -> Column:
    """F6 ExactMatchFeature (features.py:144-153): CI intersection of chain
    all-strings (incl. translit/translate, core.py:222-230) and entity
    names non-empty."""
    return F.arrays_overlap(
        F.col("chain_lower"), F.col("entity_lower")
    ).cast("double")


def shared_tokens_feature() -> Column:
    """F7 SharedTokensFeature (features.py:156-171): max over (chain name,
    entity name) pairs of |tokens(x) ∩ tokens(y)| / |tokens(x)|, on
    lowercased names. Nested native aggregate over the PRE-TOKENIZED
    per-side arrays — tokenization must not sit inside these lambdas
    (it would rerun per (x, y) pair)."""
    return F.aggregate(
        F.col("chain_toks"),
        F.lit(0.0),
        lambda acc, xt: F.greatest(
            acc,
            F.aggregate(
                F.col("entity_toks"),
                F.lit(0.0),
                lambda acc2, yt: F.greatest(
                    acc2,
                    F.size(F.array_intersect(xt, yt)).cast("double")
                    / F.greatest(F.size(xt), F.lit(1)).cast("double"),
                ),
            ),
        ),
    )


def last_name_feature() -> Column:
    """F8 LastNameFeature (features.py:174-188): chain and entity share the
    last token of some multi-token name (lowercased per
    CaseInsensitiveSet storage)."""
    return F.arrays_overlap(
        F.col("chain_last"), F.col("entity_last")
    ).cast("double")


def levenshtein_feature() -> Column:
    """F9 LevenshteinFeature (features.py:191-204): min over name pairs of
    editdistance/max(len), lowercased. Native F.levenshtein inside nested
    higher-order aggregate (JVM, no UDF).

    Guards: an EMPTY name array on either side yields 1.0 (max
    distance) instead of the +Infinity the aggregate's inf seed would
    leak — build_pairs explicitly admits names=[] KB rows, and one
    Infinity in a feature vector poisons the linear score and NaNs
    logistic training. The greatest(...,1) divisor floor keeps a pair
    of empty STRINGS (distance 0) from raising ANSI DIVIDE_BY_ZERO."""
    xs = F.col("chain_lower")
    ys = F.col("entity_lower")
    inf = F.lit(float("inf"))
    agg = F.aggregate(
        xs,
        inf,
        lambda acc, x: F.least(
            acc,
            F.aggregate(
                ys,
                inf,
                lambda acc2, y: F.least(
                    acc2,
                    F.levenshtein(x, y).cast("double")
                    / F.greatest(
                        F.length(x), F.length(y), F.lit(1)
                    ).cast("double"),
                ),
            ),
        ),
    )
    return F.when(
        (F.size(xs) == 0) | (F.size(ys) == 0), F.lit(1.0)
    ).otherwise(agg)


def jaro_winkler_feature() -> Column:
    """north_rule string-distance bundle: max Jaro-Winkler over (chain
    all-strings x entity names), Arrow-batched pandas UDF (the one
    deliberate Python crossing in the scoring stage)."""
    from hamerkop_spark.functions.textdist import jaro_winkler_max_udf

    return jaro_winkler_max_udf(
        F.col("chain_lower"), F.col("entity_lower")
    )


def token_jaccard_feature() -> Column:
    """north_rule string-distance bundle: SYMMETRIC token-set Jaccard
    |A∩B| / |A∪B| over the flattened token sets of all chain strings vs
    all entity names (F7 shared_tokens is the reference's asymmetric
    max-per-name-pair variant; this is the set-level complement).
    Top-level expressions (no lambda nesting), so Catalyst CSE applies."""
    a = F.array_distinct(F.flatten(F.col("chain_toks")))
    b = F.array_distinct(F.flatten(F.col("entity_toks")))
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def monge_elkan_feature() -> Column:
    """Symmetric Monge-Elkan with the Jaro-Winkler inner kernel over
    the distinct flattened token sets of both sides — the classic
    hybrid similarity (token reordering + per-token typos at once);
    no reference analog (its string features are whole-string only,
    features.py:69-116). Same Arrow batching as jaro_winkler_feature."""
    from hamerkop_spark.functions.textdist import monge_elkan_udf

    a = F.array_distinct(F.flatten(F.col("chain_toks")))
    b = F.array_distinct(F.flatten(F.col("entity_toks")))
    return monge_elkan_udf(a, b)


def monge_elkan_lev_pairs(
    pairs: DataFrame,
    keys: list[str],
    left_toks: str = "q_toks",
    right_toks: str = "c_toks",
    scale: int = 1_000_000,
) -> DataFrame:
    """One-directional Monge-Elkan (the canonical Monge & Elkan 1996
    form) with a normalized-Levenshtein inner kernel, fully JVM-native:

        ME(A,B) = 1/|A| * sum_{x in A} max_{y in B} sim(x, y)
        sim(x,y) = (L - lev(x,y)) / L,  L = max(len(x), len(y))

    computed in exact integer micro-units (``(L-lev)*scale div L``,
    then ``sum div count``) so the distributed aggregation is
    order-independent and the result is bit-stable against a SQL
    oracle. This is the scale-path complement to ``monge_elkan_udf``
    (the symmetric Jaro-Winkler variant, an Arrow-batched pandas UDF):
    here every op — explode, levenshtein, both aggregates — stays
    inside whole-stage codegen, so there is no Python crossing at all
    in the hot loop. No reference analog (its string features are
    whole-string only, features.py:69-116).

    ``pairs`` must carry the pair-identifying ``keys`` columns plus two
    token-array columns; per-pair fan-out is |A|x|B| token rows
    (bounded by name lengths), and both groupBys partial-aggregate
    map-side before the shuffle on the pair key.

    Returns ``keys + [me_micro]`` (bigint, 0..scale); pairs with an
    empty side are dropped (no tokens to score).
    """
    toks = pairs.select(
        *keys,
        F.explode(F.array_distinct(F.col(left_toks))).alias("tok_a"),
        F.array_distinct(F.col(right_toks)).alias("_bt"),
    ).select(*keys, "tok_a", F.explode("_bt").alias("tok_b"))
    # exact floor division: ((L - lev) * scale) div L via expr-level `div`
    per_tok = (
        toks.where((F.length("tok_a") > 0) & (F.length("tok_b") > 0))
        .withColumn(
            "sim_micro",
            F.expr(
                f"((greatest(length(tok_a), length(tok_b)) "
                f"- levenshtein(tok_a, tok_b)) * cast({int(scale)} as bigint)) "
                f"div greatest(length(tok_a), length(tok_b))"
            ),
        )
    )
    best = per_tok.groupBy(*keys, "tok_a").agg(
        F.max("sim_micro").alias("best")
    )
    return (
        best.groupBy(*keys)
        .agg(F.sum("best").alias("_s"), F.count(F.lit(1)).alias("_n"))
        .select(*keys, F.expr("_s div _n").alias("me_micro"))
    )


def embedding_cosine_feature() -> Column:
    """north_rule "cosine over name/context embedding features": cosine
    between per-side embedding columns `chain_emb` / `entity_emb`
    (array<float/double>). Attach them with
    build_pairs(..., embeddings=True) — a native hashing-trick n-gram
    embedding (functions/embed.py) — or join model-produced vectors
    under the same column names; the feature is agnostic."""
    from hamerkop_spark.functions.textdist import cosine_native

    return cosine_native(F.col("chain_emb"), F.col("entity_emb"))


STANDARD_FEATURES = {
    "f_origin": origin_feature,
    "f_num_names": number_of_names_feature,
    "f_num_links": number_of_links_feature,
    "f_wikipedia": wikipedia_feature,
    "f_exact_match": exact_match_feature,
    "f_shared_tokens": shared_tokens_feature,
    "f_last_name": last_name_feature,
    "f_levenshtein": levenshtein_feature,
    "f_jaro_winkler": jaro_winkler_feature,
}

#: STANDARD (the reference-parity bundle the default pipeline and bench
#: measure) + the north_rule's token-set Jaccard and embedding cosine.
#: Opt-in: extract_features(pairs, features=EXTENDED_FEATURES); the
#: cosine needs build_pairs(..., embeddings=True) or caller-attached
#: chain_emb/entity_emb columns.
EXTENDED_FEATURES = {
    **STANDARD_FEATURES,
    "f_token_jaccard": token_jaccard_feature,
    "f_emb_cosine": embedding_cosine_feature,
    "f_monge_elkan": monge_elkan_feature,
}


def extract_features(pairs: DataFrame, features: dict | None = None) -> DataFrame:
    """F11 EntityFeatureExtractor (features.py:58-66): one column per
    feature plus an assembled `features` array (FeatureVector analog,
    bools already cast to double)."""
    feats = features or STANDARD_FEATURES
    out = ensure_derived(pairs)
    # one withColumns call: feature expressions never reference other
    # feature columns, so batch-adding is plan-identical to the chained
    # per-feature withColumn while paying one py4j plan-wrap instead of
    # len(feats) of them (driver wall inside the TIMED scoring section)
    out = out.withColumns({name: fn() for name, fn in feats.items()})
    return out.withColumn("features", F.array(*[F.col(n) for n in feats]))


def record_labeled_pairs(
    scored_pairs: DataFrame, gold: DataFrame
) -> DataFrame:
    """R8 FeatureRecorder (resolver.py:157-189): label = 1 iff the
    candidate entity is among the gold links for the chain's mention;
    NIL-gold rows are all label 0. `gold` needs (doc_id, chain_id,
    gold_links array<string>, link_type)."""
    joined = scored_pairs.join(gold, ["doc_id", "chain_id"])
    label = (
        (F.col("link_type") == "link")
        & F.array_contains(F.col("gold_links"), F.col("entity_id"))
    ).cast("int")
    return joined.withColumn("label", label)
