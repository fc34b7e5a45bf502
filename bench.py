"""Benchmark runner (driver contract).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "pairs_scored_per_sec": ..., "scaling": {...}}

Two parts:
1. Headline queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; each
   forced through the noop sink so projections can't be pruned away.
2. The north-rule scaling evidence: the candidate-pair scoring workload
   (fuzzy blocking + full pairwise feature bundle over a Spark-generated
   probe corpus) run at local[N] and local[4N] on identical input
   (default 2 vs 8 — see SCALING_CORES); reports pairs-scored/sec at
   both and efficiency = (thr_4N / thr_N) / 4. (No real cluster in this
   sandbox — two parallelism levels stand in for N vs 4N executors, per
   BASELINE.md.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_pricing",
    "b2_exact_block",
    "b3_ngram_idf",
    "cc_transitive",
    "f9_levenshtein_argmin",
    "r2_one_many_none",
    "r5_linear_argmax",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_search",
    "text_quality",
    "events_sessionize",
]

SCALING_VARIANTS = int(os.environ.get("SPARK_GRAFT_BENCH_VARIANTS", "450"))
SCALING_KB_MULT = int(os.environ.get("SPARK_GRAFT_BENCH_KB_MULT", "6"))
# N -> 4N parallelism pair for the scaling-efficiency evidence. 2 -> 8 is
# deliberately below this host's ~16 physical cores so the measurement
# reflects the engine's parallel structure, not SMT/memory-bandwidth
# saturation of the sandbox VM (local[32] shares 16 physical cores).
SCALING_CORES = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_CORES", "2,8").split(",")
)


def force(df) -> int:
    """Execute the full plan exactly once and return the row count.
    Hashing every column inside the same aggregation defeats column
    pruning (a bare count() would let Catalyst skip the expensive
    projections entirely)."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return row["n"]


def scoring_workload(spark, variants: int) -> tuple[int, float]:
    """The north-rule throughput metric: candidate pairs scored per
    second through fuzzy blocking (char-4-gram IDF retrieval) + the full
    pairwise feature bundle.

    The probe side is generated *inside Spark* (each KB name exploded
    into `variants` deterministic char-drop misspellings via xxhash64),
    so the workload scales without driver-side data generation and every
    partition carries real compute. Returns (pairs_scored, seconds)."""
    from pyspark.sql import functions as F

    from hamerkop_spark.operators import blocking as B
    from hamerkop_spark.operators.features import build_pairs, extract_features
    from hamerkop_spark.sources.kb import load_kb
    from hamerkop_spark.synth import make_corpus

    corpus = make_corpus(spark, n_docs=1, seed=42, kb_mult=SCALING_KB_MULT)
    kb = load_kb(corpus["kb_entities_raw"], corpus["kb_alt_names"]).cache()
    kb_names = B.build_kb_names(kb).cache()
    kb_names.count()

    base = kb_names.select("type", "name").distinct()
    probes = (
        base.withColumn("v", F.explode(F.sequence(F.lit(1), F.lit(variants))))
        .withColumn(
            "pos",
            (
                F.pmod(F.xxhash64("name", "v"),
                       F.greatest(F.length("name") - 2, F.lit(1))) + 2
            ).cast("int"),
        )
        .withColumn(
            "qname",
            F.concat(
                F.expr("substring(name, 1, pos - 1)"),
                F.expr("substring(name, pos + 1)"),
            ),
        )
    )
    chains = probes.select(
        F.lit("bench").alias("doc_id"),
        F.concat_ws("#", "name", "v").alias("chain_id"),
        "type",
        F.col("qname").alias("name"),
        F.array("qname").alias("names"),
        F.array("qname").alias("all_strings"),
    ).repartition(spark.sparkContext.defaultParallelism).cache()
    n_probes = chains.count()  # corpus prep excluded from the timed section

    # blocking: ngram-IDF retrieval -> candidate pairs (timed separately;
    # the headline metric is pairs SCORED per second)
    t0 = time.time()
    postings, _ = B.build_ngram_postings(kb_names)
    cands = B.ngram_candidates(chains, postings, limit=25,
                               broadcast_postings=True)
    # AQE coalesces the small post-aggregation shuffle (~tens of MB) into
    # very few partitions — size-based, blind to the expensive pairwise
    # feature projection downstream. Re-spread explicitly so the scoring
    # compute uses every core; at cluster scale this is the
    # repartition-before-UDF-stage idiom.
    pairs = build_pairs(chains, cands, kb).repartition(
        spark.sparkContext.defaultParallelism * 2
    ).cache()
    n_pairs = pairs.count()
    block_dt = time.time() - t0

    # scoring: the full pairwise feature bundle over the candidate pairs
    t0 = time.time()
    scored = extract_features(pairs)
    force(scored)
    score_dt = time.time() - t0

    kb.unpersist()
    kb_names.unpersist()
    chains.unpersist()
    pairs.unpersist()
    return n_pairs, block_dt, score_dt


def new_session(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from hamerkop_spark.session import get_spark

    s = get_spark(app_name=f"hamerkop-bench-{cores}", cores=cores,
                  shuffle_partitions=max(8, 2 * cores))
    s.sparkContext.setLogLevel("ERROR")
    return s


BENCH_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "520"))


def main() -> None:
    import __spark_entry__ as E

    bench_t0 = time.time()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = None

    spark = new_session(cpus)
    qs = E.queries()
    # JIT/codegen warmup: run every headline query once at the smallest
    # SF so the timed pass measures steady-state execution, not first-
    # compile (cold-JVM first runs are 2-5x slower)
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and warm_sf != sf_dir:
        for name in HEADLINE:
            try:
                force(qs[name](spark, warm_sf))
            except Exception:
                pass
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    # scaling evidence: identical workload at local[N] vs local[4N];
    # one small warmup per fresh JVM first (JIT/codegen dominates cold
    # runs and would corrupt the ratio)
    scaling = {}
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        lo, hi = SCALING_CORES
        thr = {}
        for cores in (lo, hi):
            s = new_session(cores)
            scoring_workload(s, max(SCALING_VARIANTS // 6, 50))  # JIT warmup
            # best-of-2 against host noise (±20% between identical runs);
            # drop the repeat when the soft wall-clock budget is tight
            best_score, best_block, pairs = None, None, 0
            for attempt in range(2):
                p, block_dt, score_dt = scoring_workload(s, SCALING_VARIANTS)
                pairs = p
                best_score = score_dt if best_score is None else min(best_score, score_dt)
                best_block = block_dt if best_block is None else min(best_block, block_dt)
                remaining = BENCH_BUDGET_S - (time.time() - bench_t0)
                if attempt == 0 and remaining < (score_dt + block_dt) * 1.3:
                    break
            thr[cores] = pairs / best_score if best_score else 0.0
            scaling[f"local{cores}_pairs_per_sec"] = round(thr[cores], 1)
            scaling[f"local{cores}_score_seconds"] = round(best_score, 3)
            scaling[f"local{cores}_blocking_seconds"] = round(best_block, 3)
            scaling["n_pairs"] = pairs
        ratio = hi / lo
        scaling[f"efficiency_{lo}_to_{hi}"] = round(
            thr[hi] / thr[lo] / ratio, 4
        )
        scaling["efficiency"] = scaling[f"efficiency_{lo}_to_{hi}"]

    out = {
        "metric": "headline query wall-clock at sf, plus candidate-pairs "
                  "scored/sec at local[N] vs local[4N]",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pairs_scored_per_sec": scaling.get(
            f"local{SCALING_CORES[1]}_pairs_per_sec"
        ),
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
