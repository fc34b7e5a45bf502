"""spark-submit entry point for the record-linkage pipeline
(north_rule: "run via spark-submit --py-files on a multi-executor
cluster").

Usage (local sandbox):

    cd /root/repo && zip -qr /tmp/hamerkop_spark.zip hamerkop_spark
    spark-submit --master "local[8]" --py-files /tmp/hamerkop_spark.zip \
        scripts/submit_pipeline.py --workdir /tmp/hk_submit \
        --synthetic-docs 40 --evaluate

On a cluster, swap --master / add executor confs; the pipeline itself is
identical — every stage is a DataFrame function, checkpointed under
--workdir, resumable with --resume.

Inputs: either --synthetic-docs N (seeded generator, self-contained) or
--pages/--conll/--kb-entities/--kb-alt-names parquet paths.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--synthetic-docs", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--misspell-prob", type=float, default=0.0)
    ap.add_argument("--pages")
    ap.add_argument("--conll")
    ap.add_argument("--kb-entities")
    ap.add_argument("--kb-alt-names")
    ap.add_argument("--generators", default="exact,ngram")
    ap.add_argument("--evaluate", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from hamerkop_spark.plans.pipeline import (
        evaluate_pipeline,
        run_pipeline,
    )

    # under spark-submit the session/master comes from the submit args —
    # never override it here
    spark = SparkSession.builder.appName("hamerkop-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic_docs:
        from hamerkop_spark.synth import make_corpus

        tables = make_corpus(
            spark, n_docs=args.synthetic_docs, seed=args.seed,
            misspell_prob=args.misspell_prob,
        )
    else:
        required = [args.pages, args.conll, args.kb_entities, args.kb_alt_names]
        if not all(required):
            ap.error("provide --synthetic-docs or all four input paths")
        tables = {
            "pages": spark.read.parquet(args.pages),
            "conll": spark.read.parquet(args.conll),
            "kb_entities_raw": spark.read.parquet(args.kb_entities),
            "kb_alt_names": spark.read.parquet(args.kb_alt_names),
        }

    result = run_pipeline(
        spark, tables, args.workdir, resume=args.resume,
        generators=tuple(args.generators.split(",")),
    )
    out = {
        "stages": result["metrics"],
        "clusters": result["clusters"].count(),
        "decisions": result["decisions"].count(),
    }
    if args.evaluate and "labeled_pairs" in tables:
        ev = evaluate_pipeline(result, tables["labeled_pairs"])
        out["pairwise_f1"] = ev.f1
        out["precision"] = ev.precision
        out["recall"] = ev.recall
    print(json.dumps(out))


if __name__ == "__main__":
    main()
