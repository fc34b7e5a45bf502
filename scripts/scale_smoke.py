"""Large-scale end-to-end smoke: run the full pipeline on a synthetic
corpus 100x the test fixtures and report per-stage wall, skew stats, and
pairwise F1. This is the would-it-survive-a-scale-up check the unit
tests can't give: every stage runs with real shuffle volume, the
candidate stage sees a KB with thousands of colliding-token surfaces,
and connected components runs over hundreds of thousands of edges.

    python scripts/scale_smoke.py --docs 5000 --kb-mult 25 --cores 16
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--kb-mult", type=int, default=25)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--misspell", type=float, default=0.3)
    ap.add_argument("--margin", type=float, default=0.0)
    ap.add_argument("--edit-margin", type=float, default=0.0)
    ap.add_argument(
        "--ngram-max-df", default="auto",
        help="int, 'none' (reference-exact every-gram scoring), or "
             "'auto' (cap engages above the broadcast size threshold)",
    )
    ap.add_argument(
        "--broadcast-postings", default="auto",
        choices=["auto", "true", "false"],
        help="ngram retrieval join: broadcast / shuffled / size-based auto",
    )
    ap.add_argument("--workdir", default="/tmp/hk_scale_smoke")
    ap.add_argument(
        "--generators", default="exact,ngram",
        help="comma-separated blocking generator names",
    )
    args = ap.parse_args()

    from hamerkop_spark.plans.pipeline import evaluate_pipeline, run_pipeline
    from hamerkop_spark.session import get_spark
    from hamerkop_spark.synth import make_corpus

    spark = get_spark(
        app_name="scale-smoke", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    corpus = make_corpus(
        spark, n_docs=args.docs, seed=42, misspell_prob=args.misspell,
        kb_mult=args.kb_mult,
    )
    gen_s = round(time.time() - t0, 1)

    import shutil

    shutil.rmtree(args.workdir, ignore_errors=True)
    t0 = time.time()
    res = run_pipeline(
        spark, corpus, args.workdir, resume=False,
        generators=tuple(args.generators.split(",")),
        margin=args.margin, edit_margin=args.edit_margin,
        ngram_max_df=(
            "auto" if args.ngram_max_df == "auto"
            else None if str(args.ngram_max_df).lower() == "none"
            else int(args.ngram_max_df)
        ),
        broadcast_postings={
            "auto": "auto", "true": True, "false": False
        }[args.broadcast_postings],
    )
    wall = round(time.time() - t0, 1)
    f1 = evaluate_pipeline(res, corpus["labeled_pairs"]).asDict()
    print(json.dumps({
        "docs": args.docs,
        "kb_entities": res["kb_entities"].count(),
        "mentions": corpus["n_mentions"],
        "labeled_pairs": corpus["labeled_pairs"].count(),
        "misspell_prob": args.misspell,
        "margin": args.margin,
        "edit_margin": args.edit_margin,
        "cores": args.cores,
        "ngram_join": res["ngram_join"],
        "ngram_max_df": res["ngram_max_df"],
        "gen_seconds": gen_s,
        "pipeline_seconds": wall,
        "stages": [
            {k: m[k] for k in
             ("stage", "rows", "seconds", "max_partition_rows")
             if k in m}
            for m in res["metrics"]
        ],
        "f1": f1,
    }))


if __name__ == "__main__":
    main()
