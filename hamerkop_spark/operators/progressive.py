"""Progressive (pay-as-you-go) entity resolution: rank candidate
pairs by cheap blocking-graph evidence so a fixed comparison budget
resolves the most likely matches first, instead of scoring the whole
candidate set in arbitrary order.

At 10^12 documents the candidate set after blocking is still far too
large to score exhaustively in one pass; the operational question is
"which B pairs do we score TODAY". The published answer (Whang,
Marmaros & Garcia-Molina, "Pay-As-You-Go Entity Resolution", TKDE
2013; Papenbrock, Heise & Naumann, "Progressive Duplicate Detection",
TKDE 2015; Simonini, Papadakis, Palpanas & Bergamaschi,
"Schema-agnostic Progressive Entity Resolution", ICDE 2018) is to
order pairs by a cheap match-likelihood proxy computed from the
blocking structure itself. The proxy here is ARCS (Aggregated
Reciprocal Comparisons Scheme, Papadakis et al. TKDE 2014): a pair's
weight is the sum over the blocks it co-occurs in of 1/C(|block|, 2),
so co-occurrence in a tiny (discriminative) block counts for far more
than co-occurrence in a broad one.

No reference analog: hamerkop scores every candidate its generators
emit (hamerkop/coref.py + resolve.py run the full cascade over the
whole candidate list); a comparison budget is a new, corpus-scale
capability.

Everything is exact integer fixed-point (ARCS_SCALE // C(bsz, 2)) so
results hash identically across engines (the driver's oracle gate),
and the top-B selection has a scale path (`mode="threshold"`) that
finds the exact B-th weight by distributed radix quickselect — 64-way
histograms over 6-bit digits, <= 11 rounds, O(levels * 64) driver
rows — instead of a global sort or a driver-side top-B merge.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point scale for ARCS weights. 1e12 keeps the reciprocal of
#: any realistic block size exactly representable (a purge-surviving
#: block of 10^4 records has C2 = ~5*10^7, contributing 2*10^4 — still
#: 5 significant digits), while the sum over a pair's shared blocks
#: stays far inside int64 (a pair would need ~9*10^6 shared minimal
#: blocks to overflow; the per-record key count bounds it to ~dozens).
ARCS_SCALE = 1_000_000_000_000


def arcs_pair_weights(
    blocks: DataFrame,
    key_col: str = "block_key",
    id_col: str = "record_id",
    min_block_size: int = 2,
    max_block_size: int = 100,
) -> DataFrame:
    """ARCS-weighted candidate pairs from a block collection (one row
    per (block key, record) assignment — the same input shape as
    ``blocking_eval.meta_blocking_cnp``).

    Output: (a_id, b_id, arcs_fp, n_shared) with a < b; ``arcs_fp`` =
    sum over shared blocks of ARCS_SCALE // C(|block|, 2) — an exact
    integer, deterministic across engines; ``n_shared`` = CBS (number
    of shared blocks), kept as the secondary diagnostic.

    Plan shape at scale: distinct assignments -> one partial-agg
    shuffle for block sizes -> size-capped within-block self-join
    (cost <= #blocks * max_block_size^2 regardless of key skew) ->
    one pair-keyed partial-agg shuffle. No windows, no driver data.
    """
    b = (
        blocks.select(
            F.col(key_col).alias("bk"), F.col(id_col).alias("rid")
        )
        .where(F.col(key_col).isNotNull() & F.col(id_col).isNotNull())
        .distinct()
    )
    sizes = b.groupBy("bk").agg(F.count("*").alias("bsz"))
    # contribution computed ONCE per block, before the fan-out
    contrib = sizes.where(
        (F.col("bsz") >= int(min_block_size))
        & (F.col("bsz") <= int(max_block_size))
    ).select(
        "bk",
        F.expr(
            f"{ARCS_SCALE} div ((bsz * (bsz - 1)) div 2)"
        ).alias("contrib"),
    )
    # pin the kept postings: the self-join would otherwise re-run the
    # distinct AND the size aggregation on both sides (the Catalyst
    # CSE gap measured for suffix_array_candidates/tfidf_weights)
    kept = b.join(contrib, "bk").localCheckpoint(eager=False)
    pairs = (
        kept.select("bk", "contrib", F.col("rid").alias("a_id"))
        .join(
            kept.select("bk", F.col("rid").alias("b_id")), "bk"
        )
        .where(F.col("a_id") < F.col("b_id"))
    )
    return pairs.groupBy("a_id", "b_id").agg(
        F.sum("contrib").alias("arcs_fp"),
        F.count("*").alias("n_shared"),
    )


def _radix_threshold(
    weighted: DataFrame, budget: int, weight_col: str
) -> tuple[int | None, int]:
    """Exact distributed quickselect over non-negative int64 weights:
    find ``thr`` such that count(w > thr) <= budget < count(w >= thr).
    Returns (thr, n_above_thr); (None, total) when total <= budget.

    Radix descent on 6-bit digits: each round histograms the CURRENT
    candidate stratum into <= 64 buckets (one partial-agg job, <= 64
    driver rows), keeps everything in buckets strictly above the
    boundary as "definitely selected", and recurses into the boundary
    bucket only. 11 rounds cover 64 bits; the stratum shrinks every
    round (to rows sharing one more 6-bit digit of the threshold), so
    later rounds touch geometrically less data. This is the selection
    shape that survives budgets far past what TakeOrderedAndProject's
    driver-side top-B merge can hold.
    """
    stats = weighted.agg(
        F.count("*").alias("n"), F.max(weight_col).alias("mx")
    ).collect()[0]
    total = stats["n"]
    if total <= budget:
        return None, total
    # start the descent at the max weight's bit length: every shift
    # above it would histogram the whole input into one bucket (a full
    # scan that learns nothing)
    top_shift = 6 * ((max(int(stats["mx"]), 1).bit_length() - 1) // 6)
    cur = weighted.select(F.col(weight_col).alias("_w"))
    n_above = 0  # rows in strata already known to be above the threshold
    remaining = budget
    for shift in range(top_shift, -1, -6):
        hist = (
            cur.groupBy(
                F.shiftright(F.col("_w"), shift).alias("_b")
            )
            .agg(F.count("*").alias("_n"))
            .collect()
        )
        cum = 0
        boundary = n_b = None
        for row in sorted(hist, key=lambda r: -r["_b"]):
            if cum + row["_n"] > remaining:
                boundary, n_b = int(row["_b"]), row["_n"]
                break
            cum += row["_n"]
        # cum = rows in buckets strictly above the boundary bucket
        n_above += cum
        remaining -= cum
        # budget aligns with a stratum edge: the threshold needs no
        # more digits (count(w > thr) == budget exactly, so the caller
        # has no boundary ties to resolve)
        if remaining == 0:
            return ((boundary + 1) << shift) - 1, n_above
        if remaining == n_b:
            return (boundary << shift) - 1, n_above + n_b
        # recurse into the boundary bucket; eager checkpoint bounds the
        # re-scan (each later round otherwise re-filters from the root)
        cur = cur.where(
            F.shiftright(F.col("_w"), shift) == boundary
        )
        if shift > 0:
            cur = cur.localCheckpoint(eager=True)
    # shift == 0: the boundary "bucket" is a single exact weight value
    return boundary, n_above


def select_top_pairs(
    weighted: DataFrame,
    budget: int,
    weight_col: str = "arcs_fp",
    id_cols: tuple[str, ...] = ("a_id", "b_id"),
    mode: str = "sort",
    boundary: str = "exact",
) -> DataFrame:
    """Keep the ``budget`` highest-weight pairs, deterministically
    (total order: weight desc, then ``id_cols`` asc).

    ``mode="sort"`` (default): orderBy + limit — Spark plans this as
    TakeOrderedAndProject (per-partition top-B heaps merged on the
    driver), exact and fast while B rows fit on the driver; the right
    choice for interactive budgets up to a few million.

    ``mode="threshold"``: the scale path — exact radix quickselect for
    the B-th weight (<= 11 histogram rounds, <= 64 driver rows each),
    then a filter. No global sort, no driver-side B-row merge;
    boundary ties (pairs whose weight EQUALS the threshold, of which
    only some fit the budget) are resolved per ``boundary``:

      * "exact": rank ties by ``id_cols`` and keep the first
        (budget - above) — bit-identical to mode="sort". The tie rank
        is a single-partition window over ONLY the tied rows; exact
        ARCS sums collide rarely, but a degenerate corpus (all pairs
        one weight) makes the tie set the whole input — use "all" or
        "drop" there.
      * "all": keep every tie (result >= budget; no window at all).
      * "drop": keep none (result <= budget; no window at all).
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    # null weights are unrankable: drop them up front so the sort and
    # threshold paths select the same set (desc puts nulls last, which
    # would otherwise let them leak in when budget > non-null count)
    weighted = weighted.where(F.col(weight_col).isNotNull())
    order = [F.desc(weight_col)] + [F.asc(c) for c in id_cols]
    if mode == "sort":
        return weighted.orderBy(*order).limit(int(budget))
    if mode != "threshold":
        raise ValueError(f"unknown mode: {mode!r}")
    thr, n_above = _radix_threshold(weighted, int(budget), weight_col)
    if thr is None:  # total <= budget: everything fits
        return weighted
    above = weighted.where(F.col(weight_col) > thr)
    if n_above == int(budget):
        # the budget fell exactly on a weight-stratum edge: no tie
        # resolution needed in ANY boundary mode (and thr may be a
        # synthetic between-strata value — tie filters would be wrong)
        return above
    if boundary == "drop":
        return above
    ties = weighted.where(F.col(weight_col) == thr)
    if boundary == "all":
        return above.unionByName(ties)
    if boundary != "exact":
        raise ValueError(f"unknown boundary: {boundary!r}")
    r = int(budget) - n_above
    w = Window.orderBy(*[F.asc(c) for c in id_cols])
    kept_ties = (
        ties.withColumn("_tr", F.row_number().over(w))
        .where(F.col("_tr") <= r)
        .drop("_tr")
    )
    return above.unionByName(kept_ties)


def recall_at_budget(
    weighted: DataFrame,
    truth: DataFrame,
    fracs: list[float],
    weight_col: str = "arcs_fp",
    id_cols: tuple[str, str] = ("a_id", "b_id"),
) -> DataFrame:
    """Evaluation helper: what fraction of the TRUE matching pairs in
    ``truth`` (same two id columns, a < b) rank inside the top
    ``frac * n_candidates`` pairs, per frac — the progressive-ER
    quality curve (recall@budget).

    Output: (frac, budget, n_truth, n_found, recall), one row per
    frac, recall rounded to 6 places for hash stability.

    Eval-only plan: ranks come from ONE global row_number window
    (weight desc, ids asc) — fine at evaluation scale; production
    selection never ranks globally (see ``select_top_pairs``).
    """
    a, b = id_cols
    n = weighted.count()
    order = [F.desc(weight_col), F.asc(a), F.asc(b)]
    ranked = weighted.withColumn(
        "_rank", F.row_number().over(Window.orderBy(*order))
    ).select(a, b, "_rank")
    marked = truth.select(a, b).distinct().join(ranked, [a, b], "left")
    budgets = [(float(f), int(math.ceil(f * n))) for f in fracs]
    spark = weighted.sparkSession
    bdf = spark.createDataFrame(budgets, "frac double, budget long")
    return (
        bdf.crossJoin(marked)  # tiny x small: eval-scale cross join
        .groupBy("frac", "budget")
        .agg(
            F.count("*").alias("n_truth"),
            F.sum(
                F.when(
                    F.col("_rank").isNotNull()
                    & (F.col("_rank") <= F.col("budget")),
                    1,
                ).otherwise(0)
            ).alias("n_found"),
        )
        .withColumn(
            "recall",
            F.round(
                F.col("n_found").cast("double") / F.col("n_truth"), 6
            ),
        )
    )
