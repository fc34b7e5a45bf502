"""Per-query isolation bench (guide §1.4) — NOT the driver bench.

bench.py is frozen for measurement; this harness exists so optimization
work can time single queries, capture ``explain("formatted")`` plans,
and compare before/after without touching the driver contract.

Usage:
    python bench_extra.py [--sf DIR] [--repeats N] [--plans OUTDIR] \
        [--warm] [query ...]

Each query is forced exactly the way bench.py forces it (hash-all-columns
aggregate, so projections cannot be pruned), after an optional warm pass
at sf0.001.  Prints one JSON line per query and a total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, force, new_session  # noqa: E402


def main() -> None:
    import __spark_entry__ as E

    args = sys.argv[1:]

    def _opt(flag: str, default=None):
        return args[args.index(flag) + 1] if flag in args else default

    sf_dir = _opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR",
                                         "/root/testdata/sf0.1"))
    repeats = int(_opt("--repeats", "2"))
    plans_dir = _opt("--plans")
    warm = "--warm" in args
    names = [a for a in args if not a.startswith("--")
             and a not in {sf_dir, str(repeats), plans_dir}]
    if not names:
        names = list(HEADLINE)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = new_session(cpus)
    qs = E.queries()

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps({"plans_written": names, "dir": plans_dir}))

    warm_sf = "/root/testdata/sf0.001"
    if warm and os.path.isdir(warm_sf):
        for name in names:
            try:
                force(qs[name](spark, warm_sf))
            except Exception:
                pass

    results: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            n = force(qs[name](spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        results[name] = runs
        print(json.dumps({"query": name, "rows": n, "runs": runs,
                          "best": min(runs)}))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "sf_dir": sf_dir,
        "total_best": round(sum(min(r) for r in results.values()), 3),
        "queries": {k: min(v) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
