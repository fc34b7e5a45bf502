"""Evaluation metrics as batch aggregations (SURVEY.md §2.3 C7, §2.4 B10/
B11, §2.6 R9) plus the pairwise-F1 acceptance metric (BASELINE.json).

The reference computes these incrementally per document (coref.py:51-194,
candidates.py:54-75, resolver.py:106-137); batch re-expression is plain
joins + groupBy counts producing identical totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def pairwise_f1(
    assignments: DataFrame, labeled_pairs: DataFrame, id_col: str = "mention_id"
) -> Row:
    """THE acceptance metric (BASELINE.json north_rule): pairwise
    precision/recall/F1 of predicted cluster assignments against labeled
    pairs (FIXTURES.md §7: columns *_a, *_b, label).

    :param assignments: (id_col, cluster) predicted clustering.
    :param labeled_pairs: (key_a, key_b, label) where key_x matches id_col.
    """
    a = assignments.select(
        F.col(id_col).alias("key_a"), F.col("cluster").alias("cluster_a")
    )
    b = assignments.select(
        F.col(id_col).alias("key_b"), F.col("cluster").alias("cluster_b")
    )
    # LEFT joins from the labeled side: a labeled pair whose mention was
    # dropped upstream (type validator, garbage/too-long removers) must
    # count as pred=0 — label=1 pairs become FALSE NEGATIVES instead of
    # silently leaving the metric and inflating F1
    joined = labeled_pairs.join(a, "key_a", "left").join(b, "key_b", "left")
    scored = joined.withColumn(
        "pred",
        (
            F.col("cluster_a").isNotNull()
            & F.col("cluster_b").isNotNull()
            & (F.col("cluster_a") == F.col("cluster_b"))
        ).cast("int"),
    ).withColumn(
        "dropped",
        (F.col("cluster_a").isNull() | F.col("cluster_b").isNull()).cast("int"),
    )
    agg = scored.agg(
        F.sum(F.col("pred") * F.col("label")).alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("label"))).alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("label")).alias("fn"),
        F.sum("dropped").alias("dropped_pairs"),
    ).collect()[0]
    tp, fp, fn = (agg["tp"] or 0), (agg["fp"] or 0), (agg["fn"] or 0)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return Row(
        precision=p, recall=r, f1=f1, tp=tp, fp=fp, fn=fn,
        dropped_pairs=(agg["dropped_pairs"] or 0),
    )


def muc(pred: DataFrame, gold: DataFrame, key: str = "mention_key") -> Row:
    """MUC link-based P/R/F1 (CorefScorer.muc, coref.py:116-129), batch.

    pred/gold: (key, cluster). MUC numerator for P: sum over predicted
    clusters of |c| - |distinct gold clusters touched| - |unmapped
    mentions|; denominator: |c| - 1. Recall swaps roles.
    """

    def side(clusters: DataFrame, mapping: DataFrame) -> tuple[float, float]:
        j = clusters.join(
            mapping.withColumnRenamed("cluster", "other_cluster"), key, "left"
        )
        per = j.groupBy("cluster").agg(
            F.count("*").alias("n"),
            F.count("other_cluster").alias("mapped"),
            F.countDistinct("other_cluster").alias("linked"),
        )
        agg = per.agg(
            F.sum(F.col("mapped") - F.col("linked")).alias("num"),
            F.sum(F.col("n") - 1).alias("den"),
        ).collect()[0]
        return float(agg["num"] or 0), float(agg["den"] or 0)

    p_num, p_den = side(pred, gold)
    r_num, r_den = side(gold, pred)
    p = p_num / p_den if p_den else 0.0
    r = r_num / r_den if r_den else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return Row(precision=p, recall=r, f1=f1)


def b3(pred: DataFrame, gold: DataFrame, key: str = "mention_key") -> Row:
    """B³ P/R/F1 (CorefScorer.b3, coref.py:131-147), batch: per cluster c,
    num += Σ_{gt groups g in c} |g|² / |c|, dem += |c|; singleton clusters
    skipped (coref.py:135-136). (The reference's `len(c2) != 1` guard
    compares the *string length* of the cluster id — a no-op for its
    'C<n>' ids — so it is not replicated.)"""

    def side(clusters: DataFrame, mapping: DataFrame) -> tuple[float, float]:
        sizes = clusters.groupBy("cluster").agg(F.count("*").alias("csize"))
        multi = sizes.where(F.col("csize") > 1)
        j = (
            clusters.join(multi, "cluster")
            .join(mapping.withColumnRenamed("cluster", "other_cluster"), key, "left")
            .where(F.col("other_cluster").isNotNull())
        )
        grouped = j.groupBy("cluster", "csize", "other_cluster").agg(
            F.count("*").alias("g")
        )
        agg = grouped.groupBy("cluster", "csize").agg(
            F.sum(F.col("g") * F.col("g")).alias("correct")
        )
        tot = agg.agg(
            F.sum(F.col("correct") / F.col("csize")).alias("num")
        ).collect()[0]
        dem = multi.agg(F.sum("csize").alias("dem")).collect()[0]
        return float(tot["num"] or 0), float(dem["dem"] or 0)

    p_num, p_den = side(pred, gold)
    r_num, r_den = side(gold, pred)
    p = p_num / p_den if p_den else 0.0
    r = r_num / r_den if r_den else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return Row(precision=p, recall=r, f1=f1)


def candidate_recall(
    candidates: DataFrame, gold: DataFrame
) -> DataFrame:
    """B10 CandidatesScorer (candidates.py:54-75): per type, fraction of
    linked gold mentions whose gold entity appears in the chain's
    candidate set. gold: (doc_id, chain_id, entity_type, gold_links
    array) restricted to link rows."""
    cand_sets = candidates.groupBy("doc_id", "chain_id").agg(
        F.collect_set("entity_id").alias("cand_ids")
    )
    j = gold.join(cand_sets, ["doc_id", "chain_id"], "left").withColumn(
        "hit",
        F.coalesce(
            F.arrays_overlap("gold_links", "cand_ids").cast("int"), F.lit(0)
        ),
    )
    return j.groupBy("entity_type").agg(
        F.count("*").alias("n_gold"),
        F.sum("hit").alias("n_hit"),
        F.round(F.sum("hit") / F.count("*"), 6).alias("recall"),
    )


def kb_loading_recall(kb_entities: DataFrame, gold_ids: DataFrame) -> Row:
    """B11 KBLoadingScorer (kb.py:59-81): fraction of gold entity ids
    present in the loaded KB. gold_ids: (entity_id)."""
    total = gold_ids.distinct().count()
    missed = (
        gold_ids.distinct()
        .join(kb_entities.select("entity_id"), "entity_id", "left_anti")
        .count()
    )
    recall = (total - missed) / total if total else 0.0
    return Row(recall=recall, total=total, missed=missed)


def resolver_report(
    decisions: DataFrame, candidates: DataFrame, gold: DataFrame
) -> DataFrame:
    """R9 ResolverScorer (resolver.py:106-137) per type:
    precision denominator = mentions whose chain selected an entity;
    recall denominator = linked gold mentions whose candidate set
    contained a gold id; numerator = selected entity in gold links."""
    cand_sets = candidates.groupBy("doc_id", "chain_id").agg(
        F.collect_set("entity_id").alias("cand_ids")
    )
    j = (
        gold.join(cand_sets, ["doc_id", "chain_id"], "left")
        .join(decisions, ["doc_id", "chain_id"], "left")
    )
    link = F.col("link_type") == "link"
    gold_in_cands = F.coalesce(
        F.arrays_overlap("gold_links", "cand_ids"), F.lit(False)
    )
    correct = F.coalesce(
        F.array_contains("gold_links", F.col("entity_id")), F.lit(False)
    )
    return j.groupBy("entity_type").agg(
        F.sum(F.col("entity_id").isNotNull().cast("int")).alias("n_selected"),
        F.sum((link & gold_in_cands).cast("int")).alias("n_recallable"),
        F.sum((link & gold_in_cands & correct).cast("int")).alias("n_correct"),
        F.sum(((~link) & F.col("entity_id").isNotNull()).cast("int")).alias(
            "n_false_alarm"
        ),
    )


def _contingency_cells(pred: DataFrame, gold: DataFrame, key: str) -> DataFrame:
    """(pc, gc, nij) contingency cells over the key intersection — the
    shared core of every pair-counting / information-theoretic cluster
    metric here."""
    j = pred.select(F.col(key).alias("k"), F.col("cluster").alias("pc")).join(
        gold.select(F.col(key).alias("k"), F.col("cluster").alias("gc")), "k"
    )
    return j.groupBy("pc", "gc").agg(F.count("*").alias("nij"))


def cluster_pair_counts(
    pred: DataFrame, gold: DataFrame, key: str = "mention_key"
) -> DataFrame:
    """Pair-counting contingency totals between two clusterings of the
    same item set — the shared core of adjusted Rand and pairwise
    P/R/F1 (Hubert & Arabie 1985; Menestrina et al. VLDB'10 eval
    survey). pred/gold: (key, cluster); items are inner-joined on key
    so both sides see the same universe.

    Returns ONE row of exact BIGINT totals:
      n           — items in the common universe
      both_pairs  — sum_ij C(n_ij, 2): pairs co-clustered in BOTH
      pred_pairs  — sum_i  C(a_i, 2):  pairs co-clustered in pred
      gold_pairs  — sum_j  C(b_j, 2):  pairs co-clustered in gold

    Scale shape: one inner join on the item key, then a single
    groupBy(pred, gold) count — C(n,2) sums are computed from the
    contingency cells, never by materializing item pairs, so cost is
    O(items) + O(distinct cluster intersections), not O(pairs). All
    counts are exact integers — no float accumulation.
    """
    cells = _contingency_cells(pred, gold, key)

    def pairs2(c):
        # sum n*(n-1) exactly in BIGINT, halve with an integer shift —
        # no float accumulation anywhere on the exact-count path
        return F.shiftright(F.sum(F.col(c) * (F.col(c) - 1)).cast("bigint"), 1)

    per_pred = cells.groupBy("pc").agg(F.sum("nij").alias("ai"))
    per_gold = cells.groupBy("gc").agg(F.sum("nij").alias("bj"))
    both = cells.agg(
        F.sum("nij").cast("bigint").alias("n"), pairs2("nij").alias("both_pairs")
    )
    return (
        both.crossJoin(per_pred.agg(pairs2("ai").alias("pred_pairs")))
        .crossJoin(per_gold.agg(pairs2("bj").alias("gold_pairs")))
    )


def pairwise_cluster_prf(
    pred: DataFrame, gold: DataFrame, key: str = "mention_key"
) -> DataFrame:
    """Pairwise precision/recall/F1 between a predicted clustering and a
    gold clustering, from pair counts (the north-rule metric computed
    cluster-to-cluster instead of against a labeled-pairs table —
    pairwise_f1 above handles the labeled-pairs form).

    P = both/pred_pairs, R = both/gold_pairs, F1 = 2PR/(P+R), emitted
    as fixed-point millionths (BIGINT) alongside the exact counts; the
    float path is division-only on exact integers, so any ANSI engine
    reproduces the hash.
    """
    c = cluster_pair_counts(pred, gold, key)
    p = F.col("both_pairs").cast("double") / F.col("pred_pairs").cast("double")
    r = F.col("both_pairs").cast("double") / F.col("gold_pairs").cast("double")

    def _fp(x):
        return F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("bigint")

    zero = F.lit(0).cast("bigint")
    # zero-denominator conventions: all-singleton pred/gold has no
    # pairs to be right or wrong about (P/R := 0), and P=R=0 makes
    # F1 := 0 — never NULL / ANSI divide-by-zero (review finding)
    p_fp = F.when(F.col("pred_pairs") > 0, _fp(p)).otherwise(zero)
    r_fp = F.when(F.col("gold_pairs") > 0, _fp(r)).otherwise(zero)
    f1_fp = F.when(
        (F.col("pred_pairs") > 0)
        & (F.col("gold_pairs") > 0)
        & (F.col("both_pairs") > 0),
        _fp(F.lit(2.0) * p * r / (p + r)),
    ).otherwise(zero)
    return (
        c.withColumn("p_fp", p_fp)
        .withColumn("r_fp", r_fp)
        .withColumn("f1_fp", f1_fp)
    )


def adjusted_rand_index(
    pred: DataFrame, gold: DataFrame, key: str = "mention_key"
) -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie 1985) between two
    clusterings, chance-corrected pair counting:

        ARI = (Index - Expected) / (Max - Expected)
        Index    = sum_ij C(n_ij,2)
        Expected = sum_i C(a_i,2) * sum_j C(b_j,2) / C(n,2)
        Max      = (sum_i C(a_i,2) + sum_j C(b_j,2)) / 2

    Emitted as fixed-point millionths plus the exact integer pair
    counts. Degenerate case (Max == Expected: both clusterings all-
    singleton or all-one-cluster) emits null. The float expression is
    written in one fixed evaluation order over exact integers so
    engines agree bit-for-bit.
    """
    c = cluster_pair_counts(pred, gold, key)
    total2 = F.shiftright(F.col("n") * (F.col("n") - 1), 1).cast("double")
    a2 = F.col("pred_pairs").cast("double")
    b2 = F.col("gold_pairs").cast("double")
    idx = F.col("both_pairs").cast("double")
    expected = a2 * b2 / total2
    mx = (a2 + b2) / F.lit(2.0)
    ari = (idx - expected) / (mx - expected)
    return c.withColumn(
        "ari_fp",
        F.when(
            mx - expected != 0,
            F.floor(ari * F.lit(1e6) + F.lit(0.5)).cast("bigint"),
        ),
    )


def blanc(
    pred: DataFrame, gold: DataFrame, key: str = "mention_key"
) -> DataFrame:
    """BLANC (Recasens & Hovy 2011: the Rand index adapted to
    coreference) between a predicted and a gold clustering — completes
    the coref-metric set next to MUC / B³ / CEAF: it is the only one
    that rewards getting NON-coreference links right, so all-singleton
    and all-one-cluster degenerate outputs stop looking good.

    From the exact pair-counting totals (cluster_pair_counts — one
    join + one groupBy, never materialized pairs):

        T  = C(n,2)                    total links
        rc = both_pairs                right coref links
        rn = T - pred_pairs - gold_pairs + rc   right non-coref links
        P_c = rc/pred_pairs     R_c = rc/gold_pairs      F_c = harmonic
        P_n = rn/(T-pred_pairs) R_n = rn/(T-gold_pairs)  F_n = harmonic
        BLANC = (F_c + F_n) / 2

    Boundary conventions follow the published scorer (Luo et al. 2014
    §2 identical-mention case): when NEITHER side has a coref link,
    BLANC := F_n alone; when neither side has a non-coref link,
    BLANC := F_c alone; any ratio with a zero denominator or zero
    numerator is 0. Emitted as fixed-point millionths of
    division-only floats over exact BIGINTs (one fixed evaluation
    order), so any ANSI engine reproduces the hash.
    """
    c = cluster_pair_counts(pred, gold, key)
    t = F.shiftright(F.col("n") * (F.col("n") - 1), 1).cast("bigint")
    c = c.withColumn("rn", t - F.col("pred_pairs") - F.col("gold_pairs")
                     + F.col("both_pairs")).withColumn("total_links", t)
    rc_d = F.col("both_pairs").cast("double")
    rn_d = F.col("rn").cast("double")
    cp = F.col("pred_pairs")
    cg = F.col("gold_pairs")
    np_ = F.col("total_links") - cp  # non-coref links in pred
    ng = F.col("total_links") - cg

    def _fp(x):
        return F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("bigint")

    zero = F.lit(0).cast("bigint")
    p_c = rc_d / cp.cast("double")
    r_c = rc_d / cg.cast("double")
    f_c = F.lit(2.0) * p_c * r_c / (p_c + r_c)
    p_n = rn_d / np_.cast("double")
    r_n = rn_d / ng.cast("double")
    f_n = F.lit(2.0) * p_n * r_n / (p_n + r_n)
    ok_c = (cp > 0) & (cg > 0) & (F.col("both_pairs") > 0)
    ok_n = (np_ > 0) & (ng > 0) & (F.col("rn") > 0)
    f_c_safe = F.when(ok_c, f_c).otherwise(F.lit(0.0))
    f_n_safe = F.when(ok_n, f_n).otherwise(F.lit(0.0))
    blanc_val = (
        F.when((cp == 0) & (cg == 0), f_n_safe)
        .when((np_ == 0) & (ng == 0), f_c_safe)
        .otherwise((f_c_safe + f_n_safe) / F.lit(2.0))
    )
    return (
        c.withColumn("p_c_fp", F.when(cp > 0, _fp(p_c)).otherwise(zero))
        .withColumn("r_c_fp", F.when(cg > 0, _fp(r_c)).otherwise(zero))
        .withColumn("f_c_fp", F.when(ok_c, _fp(f_c)).otherwise(zero))
        .withColumn("p_n_fp", F.when(np_ > 0, _fp(p_n)).otherwise(zero))
        .withColumn("r_n_fp", F.when(ng > 0, _fp(r_n)).otherwise(zero))
        .withColumn("f_n_fp", F.when(ok_n, _fp(f_n)).otherwise(zero))
        .withColumn("blanc_fp", _fp(blanc_val))
    )


def v_measure(
    pred: DataFrame, gold: DataFrame, key: str = "mention_key", beta: float = 1.0
) -> Row:
    """Homogeneity / completeness / V-measure (Rosenberg & Hirschberg,
    EMNLP 2007) between two clusterings:

        h = 1 - H(gold|pred) / H(gold)    (each pred cluster pure)
        c = 1 - H(pred|gold) / H(pred)    (each gold cluster whole)
        V = (1+beta) h c / (beta h + c)

    Entropies are computed distributively from the contingency cells
    (sum of n·ln n aggregates — one groupBy, no pair materialization).
    Returns Python floats: entropy is irreducibly float, so this is a
    REPORTING metric (pytest-gated), not a hash-exact oracle row — use
    adjusted_rand_index / pairwise_cluster_prf for those.

    Conventions (matching the published definition): h = 1 when
    H(gold) = 0, c = 1 when H(pred) = 0, V = 0 when h + c = 0.
    """
    import math

    # three driver actions read the cells: pin ONE materialization so
    # the join+groupBy lineage doesn't execute three times (review
    # finding), mirroring attach_tfidf_cosine's checkpoint pattern
    cells = _contingency_cells(pred, gold, key).localCheckpoint()
    nlogn = F.sum(F.col("_m") * F.log(F.col("_m")))
    agg = cells.agg(
        F.sum("nij").alias("n"),
        F.sum(F.col("nij") * F.log("nij")).alias("s_cells"),
    ).collect()[0]
    sa = (
        cells.groupBy("pc").agg(F.sum("nij").alias("_m"))
        .agg(nlogn.alias("v")).collect()[0]["v"]
    )
    sb = (
        cells.groupBy("gc").agg(F.sum("nij").alias("_m"))
        .agg(nlogn.alias("v")).collect()[0]["v"]
    )
    n = float(agg["n"])
    lg = n * math.log(n)
    # H(gold|pred) = (sa - s_cells)/n ; H(gold) = (lg - sb)/n ; etc.
    # Entropies are differences of float sums computed partly JVM-side
    # and partly driver-side: clamp at zero and treat anything within
    # float-sum noise of zero AS zero, or a ~1e-13 residual entropy
    # would turn the 0/0 guard into garbage ratios.
    eps = 1e-9 * max(1.0, abs(lg) / n)
    h_gold_given_pred = max(0.0, (sa - float(agg["s_cells"])) / n)
    h_pred_given_gold = max(0.0, (sb - float(agg["s_cells"])) / n)
    h_gold = max(0.0, (lg - sb) / n)
    h_pred = max(0.0, (lg - sa) / n)
    h = 1.0 if h_gold <= eps else 1.0 - min(h_gold_given_pred, h_gold) / h_gold
    c = 1.0 if h_pred <= eps else 1.0 - min(h_pred_given_gold, h_pred) / h_pred
    v = 0.0 if h + c == 0 else (1 + beta) * h * c / (beta * h + c)
    return Row(homogeneity=h, completeness=c, v_measure=v, n=int(n))


def pr_curve(
    scored: DataFrame,
    label_col: str = "is_match",
    score_col: str = "score",
) -> DataFrame:
    """Precision-recall curve over decision thresholds, exact and
    integer throughout.

    One row per DISTINCT score value θ (descending), counting the
    decision "link every pair with score >= θ": cumulative tp/fp via a
    window over the per-score histogram — one groupBy + one ordered
    window over #distinct-scores rows, never a per-threshold rescan.
    F1 uses the integer identity f1 = 2tp/(2tp+fp+fn), so every output
    is a floor(1e6·ratio) of exact counts — engine-portable, no float
    accumulation. The reference scores only fixed operating points
    (scorer.py); threshold sweeps are how a linkage THRESHOLD is
    actually chosen (Fellegi-Sunter band placement, see
    fs_thresholds_for_error).

    :param scored: pairs with a numeric score and a boolean/0-1 label.
    :return: (threshold, tp, fp, fn, precision_micro, recall_micro,
        f1_micro) ordered by threshold descending.

    Scale note: the cumulative window is GLOBAL (one partition over
    the threshold histogram) — fine when scores are discretized
    (fixed-point micro scores, det_round, bucketed logits), which is
    how every score in this engine is produced; pre-bucket raw
    continuous scores before sweeping or the histogram degenerates to
    one row per pair.
    """
    from pyspark.sql import Window as W

    hist = (
        scored.select(
            F.col(score_col).alias("threshold"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .groupBy("threshold")
        .agg(
            F.sum("_y").alias("_pos"),
            (F.count("*") - F.sum("_y")).alias("_neg"),
        )
    )
    w = W.orderBy(F.desc("threshold")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    total_pos = F.sum("_pos").over(
        W.orderBy(F.lit(1)).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
    )
    cum = hist.select(
        "threshold",
        F.sum("_pos").over(w).alias("tp"),
        F.sum("_neg").over(w).alias("fp"),
        (total_pos - F.sum("_pos").over(w)).alias("fn"),
    )
    micro = lambda num, den: F.when(  # noqa: E731
        den == 0, F.lit(0)
    ).otherwise(F.floor(F.lit(1_000_000) * num / den)).cast("long")
    return cum.select(
        "threshold", "tp", "fp", "fn",
        micro(F.col("tp"), F.col("tp") + F.col("fp"))
        .alias("precision_micro"),
        micro(F.col("tp"), F.col("tp") + F.col("fn"))
        .alias("recall_micro"),
        micro(2 * F.col("tp"),
              2 * F.col("tp") + F.col("fp") + F.col("fn"))
        .alias("f1_micro"),
    )


def _hungarian_max(sim: list[list[float]]) -> float:
    """Exact maximum-weight assignment VALUE for a dense similarity
    matrix (Kuhn-Munkres with potentials, O(n^2 m)). Rows are matched
    injectively into columns; with all similarities >= 0 a maximum
    perfect-on-rows matching is also the maximum partial matching.
    Only the optimal VALUE is returned (it is unique; the argmax need
    not be)."""
    if not sim or not sim[0]:
        return 0.0
    a = sim if len(sim) <= len(sim[0]) else [
        list(col) for col in zip(*sim)
    ]
    n, m = len(a), len(a[0])
    INF = float("inf")
    # minimize negated similarities (the classic e-maxx formulation,
    # 1-indexed with a virtual 0 row/col)
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = -a[i0 - 1][j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    return float(sum(a[p[j] - 1][j - 1] for j in range(1, m + 1) if p[j]))


def ceaf(
    pred: DataFrame,
    gold: DataFrame,
    key: str = "mention_key",
    phi: str = "phi4",
) -> Row:
    """CEAF (Luo, EMNLP 2005): precision/recall/F1 under the OPTIMAL
    one-to-one alignment between gold and system entities — the third
    member of the standard coreference trio beside ``muc`` and ``b3``.

    phi="phi4" is entity-based CEAF-e (phi4(G,S) = 2|G∩S|/(|G|+|S|),
    denominators = entity counts); phi="phi3" is mention-based CEAF-m
    (phi3 = |G∩S|, denominators = mention counts).

    Scale shape: the global assignment problem DECOMPOSES exactly —
    entities that share no mention have phi = 0, so the optimal
    alignment is block-diagonal over the connected components of the
    gold-system overlap graph (within a corpus those components are
    document-sized). The component ids come from the engine's own
    large-star/small-star CC over the bipartite overlap edges; each
    component's dense subproblem is solved EXACTLY by Kuhn-Munkres
    inside one applyInPandas group (components are tiny by
    construction; a component with one chain per side skips the O(n^3)
    path entirely). Entities overlapping nothing contribute 0 to the
    numerator and join only the denominators — they never reach the
    Python stage. No reference analog (hamerkop scores MUC/B3 only,
    coref.py:116-147).
    """
    if phi not in ("phi3", "phi4"):
        raise ValueError(f"unknown phi: {phi!r}")
    from hamerkop_spark.operators.cc import connected_components

    p_ = pred.select(F.col(key).alias("k"), F.col("cluster").alias("sc"))
    g_ = gold.select(F.col(key).alias("k"), F.col("cluster").alias("gc"))
    p_sizes = p_.groupBy("sc").agg(F.count("*").alias("ssize"))
    g_sizes = g_.groupBy("gc").agg(F.count("*").alias("gsize"))
    overlap = (
        g_.join(p_, "k")
        .groupBy("gc", "sc")
        .agg(F.count("*").alias("common"))
        .join(g_sizes, "gc")
        .join(p_sizes, "sc")
    ).persist()
    edges = overlap.select(
        F.concat(F.lit("g:"), F.col("gc").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("sc").cast("string")).alias("dst"),
    )
    comp = connected_components(edges)
    withcomp = (
        overlap.join(
            comp.withColumnRenamed("node", "gnode"),
            F.concat(F.lit("g:"), F.col("gc").cast("string"))
            == F.col("gnode"),
        )
        .drop("gnode")
        .withColumnRenamed("component", "comp")
    )
    is4 = phi == "phi4"

    def solve(pdf):
        import pandas as pd

        gcs = {g: i for i, g in enumerate(pdf["gc"].unique())}
        scs = {s: i for i, s in enumerate(pdf["sc"].unique())}
        sim = [[0.0] * len(scs) for _ in gcs]
        for r in pdf.itertuples():
            val = (
                2.0 * r.common / (r.gsize + r.ssize) if is4
                else float(r.common)
            )
            sim[gcs[r.gc]][scs[r.sc]] = val
        if len(gcs) == 1 and len(scs) == 1:
            best = sim[0][0]
        else:
            best = _hungarian_max(sim)
        return pd.DataFrame({"phi_sum": [best]})

    parts = withcomp.groupBy("comp").applyInPandas(
        solve, "phi_sum double"
    )
    phi_total = (
        parts.agg(F.sum("phi_sum").alias("s")).collect()[0]["s"] or 0.0
    )
    if phi == "phi4":
        p_den = p_sizes.count()
        g_den = g_sizes.count()
    else:
        p_den = p_.count()
        g_den = g_.count()
    overlap.unpersist()
    prec = phi_total / p_den if p_den else 0.0
    rec = phi_total / g_den if g_den else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return Row(precision=prec, recall=rec, f1=f1, phi=phi_total)


def cluster_audit(
    assignments: DataFrame,
    edges: DataFrame,
    key: str = "mention_key",
    cluster_col: str = "cluster",
    a_col: str = "a_id",
    b_col: str = "b_id",
    score_col: str = "score",
    min_density_fp: int = 500_000,
) -> DataFrame:
    """Transitive-closure integrity audit: per-cluster edge-support
    metrics that expose CHAINING — the classic failure of CC-based ER,
    where a->b and b->c decisions glue a and c into one entity no
    scorer ever compared. A chained cluster shows low edge density
    (a pure path of n nodes has n-1 of the n(n-1)/2 possible edges)
    and/or one weak bridge edge holding two dense groups together.

    Output, one row per cluster:
      (cluster, n_nodes, n_edges, possible_pairs, density_fp,
       min_score_fp, mean_score_fp, chaining_suspect)

    density_fp = floor(1e6 * n_edges / possible_pairs) for n_nodes >= 2
    (NULL for singletons); scores are fixed-pointed PER EDGE before
    aggregation, so min is exact and the mean is an integer division of
    an order-independent integer sum — hash-stable across engines.
    chaining_suspect = n_nodes >= 3 AND density below the threshold:
    the actionable review queue for a splitter (re-score the weakest
    edges, or re-run CC with the bridge edge dropped).

    Edges are canonicalized (a<b, self-loops dropped, duplicate pairs
    collapsed to their min score) so either orientation is accepted;
    only intra-cluster edges count — a pair straddling two clusters is
    a blocking/decision artifact, not cluster support.

    Scale shape: two equi-joins (edge endpoints -> assignments), one
    pair-keyed dedup agg, one cluster-keyed agg with partial
    aggregation, one node-count agg. No windows, no driver collection;
    at 10^12 rows each shuffle is keyed by pair or cluster id, and hot
    (huge) clusters aggregate associatively.

    The reference has no cluster auditor (its coref merges are greedy
    per-document, coref.py:266-282, so corpus-level chaining cannot be
    inspected at all); new capability for the corpus-level CC this
    engine adds.
    """
    asg = assignments.select(
        F.col(key).alias("_node"), F.col(cluster_col).alias("_cl")
    )
    swap = F.col(a_col) > F.col(b_col)
    e = (
        edges.select(
            F.when(swap, F.col(b_col)).otherwise(F.col(a_col)).alias("_a"),
            F.when(swap, F.col(a_col)).otherwise(F.col(b_col)).alias("_b"),
            F.floor(
                F.col(score_col).cast("double") * F.lit(1e6) + F.lit(0.5)
            )
            .cast("bigint")
            .alias("_s_fp"),
        )
        .where(F.col(a_col) != F.col(b_col))
        .groupBy("_a", "_b")
        .agg(F.min("_s_fp").alias("_s_fp"))
    )
    intra = (
        e.join(asg.withColumnRenamed("_node", "_a"), "_a")
        .withColumnRenamed("_cl", "_cl_a")
        .join(asg.withColumnRenamed("_node", "_b"), "_b")
        .where(F.col("_cl_a") == F.col("_cl"))
    )
    edge_stats = intra.groupBy(F.col("_cl").alias("cluster")).agg(
        F.count("*").alias("n_edges"),
        F.min("_s_fp").alias("min_score_fp"),
        F.sum("_s_fp").alias("_sum_fp"),
    )
    node_stats = asg.groupBy(F.col("_cl").alias("cluster")).agg(
        F.count("*").alias("n_nodes")
    )
    out = node_stats.join(edge_stats, "cluster", "left").select(
        "cluster",
        "n_nodes",
        F.coalesce(F.col("n_edges"), F.lit(0)).cast("bigint").alias("n_edges"),
        (F.col("n_nodes") * (F.col("n_nodes") - 1) / 2)
        .cast("bigint")
        .alias("possible_pairs"),
        "min_score_fp",
        "_sum_fp",
    )
    density = F.when(
        F.col("possible_pairs") > 0,
        F.floor(
            F.col("n_edges") * F.lit(1_000_000) / F.col("possible_pairs")
        ).cast("bigint"),
    )
    return (
        out.withColumn("density_fp", density)
        .withColumn(
            "mean_score_fp",
            F.when(
                F.col("n_edges") > 0,
                F.floor(F.col("_sum_fp") / F.col("n_edges")).cast("bigint"),
            ),
        )
        .withColumn(
            "chaining_suspect",
            (F.col("n_nodes") >= 3)
            & (F.coalesce(F.col("density_fp"), F.lit(0)) < F.lit(int(min_density_fp))),
        )
        .select(
            "cluster", "n_nodes", "n_edges", "possible_pairs",
            "density_fp", "min_score_fp", "mean_score_fp",
            "chaining_suspect",
        )
    )


def modularity(
    assignments: DataFrame,
    edges: DataFrame,
    key: str = "mention_key",
    cluster_col: str = "cluster",
    a_col: str = "a_id",
    b_col: str = "b_id",
    score_col: str = "score",
) -> DataFrame:
    """Newman-Girvan weighted modularity of a clustering against the
    scored pair graph — the label-free companion to ``cluster_audit``:
    the audit flags individual chained clusters; modularity scores the
    WHOLE partition (did the clusterer cut where the evidence is thin
    and keep where it is dense?) with one number comparable across
    clusterers (cc vs star vs pivot vs hac vs lpa on the same edges).

    Q = sum_c [ w_in_c / m  -  (deg_c / 2m)^2 ]  (Newman, PNAS 2006)

    with w_in_c = total intra-cluster edge weight, deg_c = summed
    weighted degree of the cluster's nodes (intra edges count twice,
    by definition), m = total edge weight. Range (-0.5, 1]; a random
    cut scores ~0, a partition that respects dense groups scores high.

    Determinism contract (the repo-wide fixed-point discipline): edge
    weights ROUND-half-up to integer micro-units FIRST
    (floor(x*1e6 + 0.5)); w_in/deg/m aggregate exactly as integers;
    each cluster's contribution becomes
    ``contrib_nano = floor(1e9*w_in/m) - floor(1e9*deg^2/(4m^2))``.
    Precision note (ADVICE r5): the two divisions are evaluated in
    double precision, and ``deg_fp^2 * 1e9`` exceeds 2^53 once a
    cluster's summed weighted degree passes ~3 score units — past that
    point the floors are computed on correctly-rounded doubles rather
    than exact integers. The result stays IEEE-deterministic on any
    engine that divides doubles (the cross-engine hash contract the
    oracle checks), but it is NOT exact integer division at large
    degree sums. The global Q is the INTEGER sum of the per-cluster
    contributions — no float accumulation — and slightly under-reports
    (<= 2 ulp-of-floor per cluster), harmless for comparing
    clusterings.

    Output, one row per cluster plus a ``__total__`` row:
      (cluster, n_nodes, w_in_fp, deg_fp, contrib_nano)
    where the total row carries sums (its contrib_nano IS Q_nano).

    Scale shape: same joins as cluster_audit (edge endpoints ->
    assignments), then two keyed partial aggs; the only broadcast is
    the 1-row global (m). Self-loops are dropped, duplicate pairs
    collapse to min score, either orientation accepted. Nodes missing
    from ``assignments`` contribute degree only if their edge partner
    resolves — edges with ANY unassigned endpoint are excluded
    entirely (a blocking artifact, not partition evidence).
    """
    asg = assignments.select(
        F.col(key).alias("_node"), F.col(cluster_col).alias("_cl")
    )
    swap = F.col(a_col) > F.col(b_col)
    e = (
        edges.select(
            F.when(swap, F.col(b_col)).otherwise(F.col(a_col)).alias("_a"),
            F.when(swap, F.col(a_col)).otherwise(F.col(b_col)).alias("_b"),
            F.floor(
                F.col(score_col).cast("double") * F.lit(1e6) + F.lit(0.5)
            )
            .cast("bigint")
            .alias("_w"),
        )
        .where(F.col(a_col) != F.col(b_col))
        .groupBy("_a", "_b")
        .agg(F.min("_w").alias("_w"))
    )
    # pin the resolved-endpoints table: it fans out FOUR ways (two
    # degree union branches, w_in, and the global m) and the endpoint
    # joins would otherwise replay per branch (plan-audited: 43
    # Exchanges unpinned, 11 pinned at the driver query's shape)
    both = (
        e.join(asg.withColumnRenamed("_node", "_a"), "_a")
        .withColumnRenamed("_cl", "_cl_a")
        .join(asg.withColumnRenamed("_node", "_b"), "_b")
        .withColumnRenamed("_cl", "_cl_b")
    ).localCheckpoint(eager=False)
    # weighted degree per cluster: each edge endpoint adds w to its
    # endpoint's cluster (intra edges thus count twice — by definition)
    deg = (
        both.select(F.col("_cl_a").alias("cluster"), "_w")
        .unionByName(both.select(F.col("_cl_b").alias("cluster"), "_w"))
        .groupBy("cluster")
        .agg(F.sum("_w").alias("deg_fp"))
    )
    w_in = (
        both.where(F.col("_cl_a") == F.col("_cl_b"))
        .groupBy(F.col("_cl_a").alias("cluster"))
        .agg(F.sum("_w").alias("w_in_fp"))
    )
    nodes = asg.groupBy(F.col("_cl").alias("cluster")).agg(
        F.count("*").alias("n_nodes")
    )
    per = (
        nodes.join(deg, "cluster", "left")
        .join(w_in, "cluster", "left")
        .select(
            "cluster",
            "n_nodes",
            F.coalesce("w_in_fp", F.lit(0)).cast("bigint").alias("w_in_fp"),
            F.coalesce("deg_fp", F.lit(0)).cast("bigint").alias("deg_fp"),
        )
    )
    m = both.agg(
        F.coalesce(F.sum("_w"), F.lit(0)).cast("bigint").alias("_m")
    )
    # ALL-DOUBLE inner math (explicit casts, mirrored in the SQL twin):
    # deg^2 and w_in*1e9 overflow 64-bit integers long before they lose
    # double precision in any way that matters, and IEEE doubles give
    # the identical floor on every engine
    degd = F.col("deg_fp").cast("double")
    md = F.col("_m").cast("double")
    contrib = F.when(F.col("_m") > 0, (
        F.floor(F.col("w_in_fp").cast("double") * F.lit(1e9) / md)
        - F.floor(degd * degd * F.lit(1e9) / (F.lit(4.0) * md * md))
    ).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    per = per.crossJoin(F.broadcast(m)).withColumn(
        "contrib_nano", contrib
    )
    total = per.agg(
        F.lit("__total__").alias("cluster"),
        F.sum("n_nodes").alias("n_nodes"),
        F.sum("w_in_fp").alias("w_in_fp"),
        F.sum("deg_fp").alias("deg_fp"),
        F.sum("contrib_nano").alias("contrib_nano"),
    )
    return per.select(
        F.col("cluster").cast("string").alias("cluster"),
        "n_nodes", "w_in_fp", "deg_fp", "contrib_nano",
    ).unionByName(total)
