"""Canopy clustering (McCallum, Nigam & Ungar, KDD 2000) as a
blocking-stage operator: group records into overlapping "canopies"
with a CHEAP similarity so that the expensive pairwise measure only
runs inside canopies.

The original algorithm is a sequential greedy sweep: pop an arbitrary
record as a center, remove everything within the tight threshold T1,
keep everything within the loose threshold T2 in the canopy, repeat.
That sweep is driver-bound and order-dependent, so this module uses
the standard deterministic parallel relaxation (the same min-id
dominance trick as the CC large-star rule, operators/cc.py):

* cheap similarity = shared distinct-token COUNT via an inverted
  index (pure integers, so any ANSI engine reproduces it bit-exactly);
* a record is a CENTER iff no record with a smaller id is tight-close
  (overlap >= t1) to it — the parallel analogue of "removed from the
  candidate pool by an earlier center";
* every record joins the canopy of each center that is loose-close
  (overlap >= t2); centers belong to their own canopy; a record
  covered by no center becomes its own singleton canopy, so coverage
  is TOTAL by construction.

Exactly like greedy canopies, the relaxation is an approximation: a
tight pair is co-canopied when either member survives as a center,
which the tests measure on a duplicate-bearing corpus rather than
assert universally (the greedy sweep has the same caveat — its
guarantee also depends on T1/T2 and pop order).

Plan shape at 10^12 rows: one explode bounded by tokens-per-record,
one partial-agg shuffle for posting sizes with a `max_posting` purge
(a stop-word token must not contribute |posting|² pairs — McCallum's
own "frequent feature" pruning), one size-capped self-join, two
integer aggregations, two anti-joins. No windows, no driver
collection, no Python in the loop.

The reference has no canopy (or any blocking evaluator); its indexes
are driver-side dicts (hamerkop/kb.py:132-305). New capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_overlap_pairs(
    records: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "record_id",
    min_overlap: int = 1,
    max_posting: int = 500,
) -> DataFrame:
    """Canonical (a_id < b_id) record pairs with their shared
    distinct-token count `ov`, via an inverted index with a posting-
    size purge. The cheap-similarity kernel for canopies, reusable as
    a blocking source on its own (CBS-style weight = ov).
    """
    toks = records.select(
        F.col(id_col).alias("rid"),
        F.explode(F.array_distinct(F.col(tokens_col))).alias("tok"),
    ).where(F.col("tok").isNotNull() & (F.col("tok") != ""))
    kept_tok = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("psz"))
        .where((F.col("psz") >= 2) & (F.col("psz") <= int(max_posting)))
        .select("tok")
    )
    # pin the surviving postings once: the self-join would otherwise
    # re-run the explode and the posting-size agg on both sides (the
    # same Catalyst CSE gap suffix_array_candidates hit — plan-audited
    # there at 4 scans unpinned vs 1 pinned)
    post = toks.join(kept_tok, "tok").localCheckpoint(eager=False)
    a = post.select("tok", F.col("rid").alias("a_id"))
    b = post.select("tok", F.col("rid").alias("b_id"))
    return (
        a.join(b, "tok")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("ov"))
        .where(F.col("ov") >= int(min_overlap))
    )


def canopy_assignments(
    records: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "record_id",
    t1_overlap: int = 4,
    t2_overlap: int = 2,
    max_posting: int = 500,
) -> DataFrame:
    """(record_id, center_id) canopy memberships under the min-id
    dominance relaxation. ``t1_overlap`` (tight) >= ``t2_overlap``
    (loose) — as in McCallum et al., T1 decides which records stop
    being centers, T2 decides canopy reach.

    Every input record appears in >= 1 row (total coverage); centers
    are exactly the records with a (record_id == center_id) row whose
    id dominates their tight neighbourhood; canopies OVERLAP by
    design — downstream consumers pair records per shared canopy and
    de-duplicate pairs, precisely like any redundancy-positive
    blocking collection.
    """
    if t1_overlap < t2_overlap:
        raise ValueError(
            f"tight threshold t1={t1_overlap} must be >= loose t2={t2_overlap}"
        )
    rid = F.col(id_col)
    ids = records.select(rid.alias("rid"))
    ov = token_overlap_pairs(
        records,
        tokens_col=tokens_col,
        id_col=id_col,
        min_overlap=int(t2_overlap),
        max_posting=max_posting,
    )
    # the overlap table feeds the dominance anti-join, the center-side
    # assignment join, and the record-side assignment join; pin it so
    # the inverted-index self-join runs once, not three times
    ov = ov.localCheckpoint(eager=False)
    # dominated: a tight-close record with a smaller id exists. ov is
    # canonical (a < b), so the dominated side is exactly b_id.
    dominated = ov.where(F.col("ov") >= int(t1_overlap)).select(
        F.col("b_id").alias("rid")
    )
    centers = ids.join(dominated, "rid", "left_anti").select(
        F.col("rid").alias("center_id")
    )
    # loose-close memberships, both orientations of the canonical pair
    memb = (
        ov.join(centers, ov.a_id == centers.center_id)
        .select(F.col("b_id").alias("record_id"), "center_id")
        .unionByName(
            ov.join(centers, ov.b_id == centers.center_id).select(
                F.col("a_id").alias("record_id"), "center_id"
            )
        )
        .distinct()
    )
    self_rows = centers.select(
        F.col("center_id").alias("record_id"), "center_id"
    )
    # covered feeds both the result union and the orphans anti-join;
    # unpinned, Catalyst rebuilds the memb-distinct shuffle and the
    # two assignment joins a second time inside the anti-join
    # (plan-audited: ops 69-84 duplicated ops 27-38)
    covered = memb.unionByName(self_rows).localCheckpoint(eager=False)
    orphans = ids.join(
        covered.select(F.col("record_id").alias("rid")).distinct(),
        "rid",
        "left_anti",
    ).select(F.col("rid").alias("record_id"), F.col("rid").alias("center_id"))
    return covered.unionByName(orphans)


def canopy_candidates(
    assignments: DataFrame,
    source: str = "canopy",
) -> DataFrame:
    """Candidate pairs from co-canopy membership: (a_id, b_id,
    n_shared, source) with a < b and n_shared = number of canopies the
    pair co-occupies — the standard redundancy-positive block
    collection shape, directly feedable to blocking_quality or
    meta_blocking_cnp. Canopy sizes are bounded by the posting purge
    upstream, so the per-canopy self-join fan-out is capped."""
    a = assignments.select(
        F.col("center_id"), F.col("record_id").alias("a_id")
    )
    b = assignments.select(
        F.col("center_id"), F.col("record_id").alias("b_id")
    )
    return (
        a.join(b, "center_id")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
        .withColumn("source", F.lit(source))
    )
