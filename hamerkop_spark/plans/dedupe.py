"""One-call record deduplication: the self-linkage (A = B) composition
of the engine's ER stages — multi-key self-blocking, vectorized
pairwise scoring, threshold decision, transitive clustering, and
survivorship — for users who want `dedupe(records)` rather than wiring
the stages themselves.

The reference links mentions against a KB and has no self-dedup plan;
this is the standard single-file arrangement (Christen 2012 ch. 2) of
the same operators:

    records --(multi-key blocking, a<b)--> candidate pairs
            --(Jaro-Winkler, Arrow-vectorized)--> scored pairs
            --(threshold)--> match edges
            --(large-star/small-star CC)--> clusters
            --(golden_record)--> canonical records

Scale shape: every blocking key is a (key, id) melt + per-key count
cap (`max_block`) + within-key self-join — cost bounded by
#keys·cap², never all-pairs; the only Python crossing is the one
vectorized JW batch over surviving candidates (zero crossings with
``scorer="soft_tfidf"`` — that path is all-JVM); clustering is the
measured-to-22M-edges CC, or KwikCluster (``clustering="pivot"``)
when one borderline edge must not chain two dense groups together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hamerkop_spark.functions.phonetic import soundex_key
from hamerkop_spark.functions.textdist import jaro_winkler_udf
from hamerkop_spark.operators.canonical import golden_record
from hamerkop_spark.operators.canopy import (
    canopy_assignments,
    canopy_candidates,
)
from hamerkop_spark.operators.cc import connected_components
from hamerkop_spark.operators.hac import hac_clusters
from hamerkop_spark.operators.lpa import label_propagation
from hamerkop_spark.operators.pivot import pivot_clusters

#: blocking key generators: name -> Column producing an ARRAY of keys
#: (exploded; null/empty elements dropped). Each key namespace is
#: prefixed so keys from different generators never collide.
_KEYERS = {
    "exact": lambda norm: F.array(F.concat(F.lit("x:"), norm)),
    "soundex": lambda norm: F.transform(
        F.split(norm, " "),
        lambda t: F.concat(F.lit("s:"), soundex_key(t)),
    ),
    "token": lambda norm: F.transform(
        F.array_distinct(F.split(norm, " ")),
        lambda t: F.concat(F.lit("t:"), t),
    ),
}


def dedupe_records(
    records: DataFrame,
    id_col: str = "record_id",
    name_col: str = "name",
    attrs: list[str] | None = None,
    blocking: tuple[str, ...] = ("exact", "soundex", "token"),
    jw_threshold: float = 0.92,
    max_block: int = 100,
    canopy_t1: int = 3,
    canopy_t2: int = 2,
    clustering: str = "cc",
    lpa_rounds: int = 5,
    scorer: str = "jw",
    soft_theta_micro: int = 800_000,
    budget: int | None = None,
    budget_mode: str = "sort",
    meta_pruning: str | None = None,
    meta_top_k: int = 5,
    asn_key_dist: int = 2,
) -> dict:
    """Deduplicate a single record table by name similarity.

    :param records: one row per input record; `name_col` non-null rows
        participate, others come back as singleton clusters.
    :param attrs: columns to canonicalize into the golden record
        (defaults to just `name_col`).
    :param blocking: subset of {"exact", "soundex", "token", "canopy",
        "adaptive_sn"} — sources are unioned, so recall is the union
        of the generators' reach. "canopy" is corpus-level (McCallum
        et al. 2000, operators/canopy.py): token-overlap canopies with
        the min-id dominance center rule, tight/loose thresholds
        ``canopy_t1``/``canopy_t2``. "adaptive_sn" is sort-based
        (Yan et al. 2007 — see ``asn_key_dist``).
    :param jw_threshold: Jaro-Winkler decision threshold on the
        normalized names.
    :param max_block: per-key pair-generation cap; a hotter key is
        skipped (the standard block-purge bound — a stop-word token
        must not generate cap² pairs).
    :param clustering: "cc" (default — transitive closure; one match
        chain merges everything reachable), "pivot" (KwikCluster
        correlation clustering, operators/pivot.py — partitions the
        match graph, so a single borderline edge cannot chain two
        dense groups into one mega-cluster; expected disagreement
        cost ≤ 3× optimal), "hac" (threshold average-linkage,
        operators/hac.py — WEIGHTED anti-chaining: clusters grow only
        while their cross-pair average score stays ≥ `jw_threshold`,
        so a lone borderline edge dilutes instead of chaining), or
        "lpa" (weighted label propagation, operators/lpa.py —
        weighted voting at O(E)/round with no per-component state;
        `lpa_rounds` synchronous rounds).
    :param lpa_rounds: round count for clustering="lpa".
    :param scorer: "jw" (default — whole-string Jaro-Winkler, the
        Arrow-vectorized UDF) or "soft_tfidf" (SoftTFIDF with the
        exact-integer Levenshtein kernel, functions/tfidf.
        soft_tfidf_lev_pairs — corpus-IDF-weighted token matching
        that is order-invariant: "john smith" vs "smith john" scores
        ~1.0 where whole-string JW collapses) or "affine_gap"
        (Gotoh affine-gap similarity, functions/textdist.
        affine_gap_sim_udf — a contiguous block insertion/truncation
        "john smith" vs "john q. smith" costs ONE gap open, where JW
        and Levenshtein charge every character). All emit a `score`
        column in [0, 1]; `jw_threshold` applies to it either way.
    :param soft_theta_micro: the soft scorer's close-token kernel
        threshold in micro-units (tokens below it contribute 0).
    :param budget: progressive (pay-as-you-go) comparison budget —
        when set, candidate pairs are ranked by ARCS blocking-graph
        weight (operators/progressive.py: sum over shared blocking
        keys of 1/C(|block|,2)) and only the top `budget` pairs are
        scored. Requires key-based generators only (no "canopy":
        canopy pairs carry no per-key evidence to rank by).
    :param budget_mode: "sort" (TakeOrderedAndProject; budgets up to
        a few million) or "threshold" (exact radix quickselect; the
        scale path — see progressive.select_top_pairs).
    :param meta_pruning: None (default), "cnp", "rcnp", "wnp", or "wep" —
        graph meta-blocking over the key-based block collection
        (operators/blocking_eval.meta_blocking_cnp / _wep): candidate
        pairs are pruned to each record's CBS top-`meta_top_k`
        neighbours (cnp; rcnp requires BOTH endpoints' top-k), to
        pairs at/above each endpoint's LOCAL mean incident weight
        (wnp), or to pairs at/above the global mean CBS weight (wep)
        BEFORE any scoring runs. The standard lever when
        token blocking over web text yields a redundancy-positive
        pair explosion. Mutually exclusive with `budget` (both rank
        pairs); applies to the key-based generators only ("canopy" /
        "adaptive_sn" pairs union in unpruned — they carry no block
        evidence to weigh).
    :param asn_key_dist: boundary distance for the "adaptive_sn"
        blocking generator (Yan et al. 2007,
        operators/blocking_eval.adaptive_sorted_neighborhood): sorted
        normalized names are cut into variable blocks wherever
        adjacent keys differ by more than this levenshtein distance.
        A pair-based generator like "canopy" (excluded from budget
        ranking), catching sort-adjacent misspelling families that
        share no exact token or soundex key.
    :return: {"pairs": scored candidate pairs (a_id, b_id, score[,
                  jw | soft_tfidf_lev_fp]),
              "clusters": (id, cluster),
              "golden": one canonical row per cluster,
              "n_pairs": int, "n_clusters": int}
    """
    unknown = set(blocking) - set(_KEYERS) - {"canopy", "adaptive_sn"}
    if unknown:
        raise ValueError(f"unknown blocking generators: {sorted(unknown)}")
    pair_gens = {"canopy", "adaptive_sn"} & set(blocking)
    if budget is not None and pair_gens:
        raise ValueError(
            "budget ranking requires key-based generators only: "
            f"{sorted(pair_gens)} pairs carry no per-key evidence for "
            "ARCS weighting"
        )
    if meta_pruning not in (None, "cnp", "rcnp", "wep", "wnp"):
        raise ValueError(f"unknown meta_pruning: {meta_pruning!r}")
    if meta_pruning is not None and budget is not None:
        raise ValueError(
            "meta_pruning and budget both rank candidate pairs; pick one"
        )
    norm = F.trim(F.regexp_replace(F.lower(F.col(name_col)), r"\s+", " "))
    recs = records.withColumn("_norm", norm)
    keyed_src = recs.where(
        F.col("_norm").isNotNull() & (F.col("_norm") != "")
    ).select(F.col(id_col).alias("_id"), "_norm")

    cand = None
    melted = None
    for gen in blocking:
        if gen in ("canopy", "adaptive_sn"):
            continue
        part = keyed_src.select(
            "_id", F.explode(_KEYERS[gen](F.col("_norm"))).alias("_key")
        ).where(F.col("_key").isNotNull() & (F.col("_key") != ""))
        melted = part if melted is None else melted.unionByName(part)
    if melted is not None:
        melted = melted.distinct()
        if budget is not None:
            from hamerkop_spark.operators.progressive import (
                arcs_pair_weights,
                select_top_pairs,
            )

            weighted = arcs_pair_weights(
                melted, key_col="_key", id_col="_id",
                max_block_size=max_block,
            )
            cand = select_top_pairs(
                weighted, budget, mode=budget_mode
            ).select("a_id", "b_id")
        elif meta_pruning is not None:
            from hamerkop_spark.operators.blocking_eval import (
                meta_blocking_cnp,
                meta_blocking_wep,
                meta_blocking_wnp,
            )

            if meta_pruning in ("cnp", "rcnp"):
                cand = meta_blocking_cnp(
                    melted, key_col="_key", id_col="_id",
                    top_k=meta_top_k, max_block_size=max_block,
                    reciprocal=meta_pruning == "rcnp",
                ).select("a_id", "b_id")
            elif meta_pruning == "wnp":
                cand = meta_blocking_wnp(
                    melted, key_col="_key", id_col="_id",
                    max_block_size=max_block,
                ).select("a_id", "b_id")
            else:
                cand = meta_blocking_wep(
                    melted, key_col="_key", id_col="_id",
                    max_block_size=max_block,
                ).select("a_id", "b_id")
        else:
            ok_keys = (
                melted.groupBy("_key")
                .agg(F.count("*").alias("_kn"))
                .where((F.col("_kn") > 1) & (F.col("_kn") <= max_block))
                .select("_key")
            )
            keyed = melted.join(ok_keys, "_key")
            a = keyed.select("_key", F.col("_id").alias("a_id"))
            b = keyed.select("_key", F.col("_id").alias("b_id"))
            cand = (
                a.join(b, "_key")
                .where(F.col("a_id") < F.col("b_id"))
                .select("a_id", "b_id")
            )
    if "adaptive_sn" in blocking:
        from hamerkop_spark.operators.blocking_eval import (
            adaptive_sorted_neighborhood,
        )

        # ASN emits a<b in SORT order (by key); re-canonicalize by ID
        # so the cross-generator distinct can actually dedupe
        asn_raw = adaptive_sorted_neighborhood(
            keyed_src, key_col="_norm", id_col="_id",
            max_key_dist=asn_key_dist, max_block_size=max_block,
        )
        apairs = asn_raw.select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        )
        cand = apairs if cand is None else cand.unionByName(apairs)
    if "canopy" in blocking:
        asn = canopy_assignments(
            keyed_src.select(
                F.col("_id").alias("record_id"),
                F.array_distinct(F.split("_norm", " ")).alias("tokens"),
            ),
            t1_overlap=canopy_t1,
            t2_overlap=canopy_t2,
            max_posting=max_block,
        )
        cpairs = canopy_candidates(asn).select("a_id", "b_id")
        cand = cpairs if cand is None else cand.unionByName(cpairs)
    if cand is None:
        raise ValueError("blocking must name at least one generator")
    cand = cand.distinct()
    if scorer == "jw":
        na = keyed_src.select(
            F.col("_id").alias("a_id"), F.col("_norm").alias("_na")
        )
        nb = keyed_src.select(
            F.col("_id").alias("b_id"), F.col("_norm").alias("_nb")
        )
        scored = (
            cand.join(na, "a_id")
            .join(nb, "b_id")
            .withColumn("jw", jaro_winkler_udf(F.col("_na"), F.col("_nb")))
            .withColumn("score", F.col("jw"))
            .drop("_na", "_nb")
        )
    elif scorer == "affine_gap":
        from hamerkop_spark.functions.textdist import affine_gap_sim_udf

        na = keyed_src.select(
            F.col("_id").alias("a_id"), F.col("_norm").alias("_na")
        )
        nb = keyed_src.select(
            F.col("_id").alias("b_id"), F.col("_norm").alias("_nb")
        )
        scored = (
            cand.join(na, "a_id")
            .join(nb, "b_id")
            .withColumn(
                "affine_gap", affine_gap_sim_udf(F.col("_na"), F.col("_nb"))
            )
            .withColumn("score", F.col("affine_gap"))
            .drop("_na", "_nb")
        )
    elif scorer == "soft_tfidf":
        from hamerkop_spark.functions.tfidf import (
            soft_tfidf_lev_pairs,
            tfidf_norms,
            tfidf_weights,
            token_idf,
        )

        toks = keyed_src.select(
            F.col("_id").alias("record_id"),
            F.split("_norm", " ").alias("tokens"),
        )
        idf = token_idf(toks, "tokens")
        w = tfidf_weights(toks, idf).localCheckpoint(eager=False)
        n = tfidf_norms(w).localCheckpoint(eager=False)
        scored = soft_tfidf_lev_pairs(
            cand, w, n, theta_micro=soft_theta_micro
        ).withColumn(
            "score", F.col("soft_tfidf_lev_fp").cast("double") / F.lit(1e6)
        )
    else:
        raise ValueError(f"unknown scorer: {scorer!r}")
    edges = scored.where(F.col("score") >= F.lit(float(jw_threshold))).select(
        F.col("a_id").cast("string").alias("src"),
        F.col("b_id").cast("string").alias("dst"),
    )
    nodes = records.select(F.col(id_col).cast("string").alias("node"))
    if clustering == "cc":
        comps = connected_components(edges, nodes=nodes)
    elif clustering in ("pivot", "hac", "lpa"):
        if clustering == "pivot":
            asn = pivot_clusters(
                edges, a_col="src", b_col="dst", string_ids=True
            )
        else:
            wedges = scored.where(
                F.col("score") >= F.lit(float(jw_threshold))
            ).select(
                F.col("a_id").cast("string").alias("src"),
                F.col("b_id").cast("string").alias("dst"),
                F.round(F.col("score") * F.lit(1e6))
                .cast("bigint")
                .alias("w_micro"),
            )
            if clustering == "hac":
                # cut = the decision threshold itself: a cluster may
                # only grow while its cross-pair AVERAGE stays at
                # least as good as the pairwise accept bar
                asn = hac_clusters(
                    wedges,
                    threshold_micro=int(round(jw_threshold * 1e6)),
                    a_col="src",
                    b_col="dst",
                )
            else:
                asn = label_propagation(
                    wedges, rounds=lpa_rounds, a_col="src", b_col="dst"
                )
        covered = asn.select(
            F.col("record_id").alias("node"),
            F.col("cluster_id").alias("component"),
        )
        singles = nodes.join(
            covered.select("node"), "node", "left_anti"
        ).select("node", F.col("node").alias("component"))
        comps = covered.unionByName(singles)
    else:
        raise ValueError(f"unknown clustering strategy: {clustering!r}")
    # CC runs on string node ids; map components back onto the
    # ORIGINAL id column/type so callers join without surprises
    clusters = records.select(
        id_col, F.col(id_col).cast("string").alias("_jk")
    ).join(
        comps.select(
            F.col("node").alias("_jk"), F.col("component").alias("cluster")
        ),
        "_jk",
    ).drop("_jk")
    golden_attrs = list(attrs) if attrs else [name_col]
    with_cluster = records.withColumn(
        "_jk", F.col(id_col).cast("string")
    ).join(
        clusters.withColumn("_jk", F.col(id_col).cast("string")).select(
            "_jk", "cluster"
        ),
        "_jk",
    ).drop("_jk")
    golden = golden_record(with_cluster, golden_attrs)
    return {
        "pairs": scored,
        "clusters": clusters,
        "golden": golden,
        "n_pairs": scored.count(),
        "n_clusters": golden.count(),
    }
