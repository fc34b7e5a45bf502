"""Streaming incremental-dedup throughput: N micro-batches x B docs
(default 10 x 2,000; --batches/--per-batch to scale), near-dups
planted ACROSS batches (so every hit needs the accumulated band
store), availableNow trigger."""
import argparse
import random, sys, time, shutil, os
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from hamerkop_spark.session import get_spark
import hamerkop_spark.streaming.incremental as S

rng = random.Random(21)
VOCAB = [f"tok{i:03d}" for i in range(800)]
base = "/tmp/hk_stream_bench"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(f"{base}/in")

spark = get_spark(cores=16, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

def make_doc(n=60):
    return " ".join(rng.choice(VOCAB) for _ in range(n))

def perturb(t):
    ws = t.split()
    for _ in range(2):
        ws[rng.randrange(len(ws))] = rng.choice(VOCAB)
    return " ".join(ws)

ap = argparse.ArgumentParser()
ap.add_argument("--batches", type=int, default=10)
ap.add_argument("--per-batch", type=int, default=2000)
ap.add_argument("--compact-every", type=int, default=None,
                help="fold the band store every N batches (flatness knob)")
args = ap.parse_args()
n_batches, per_batch = args.batches, args.per_batch
texts = {}
truth = set()
for b in range(n_batches):
    rows = []
    for i in range(per_batch):
        did = f"b{b:02d}d{i:05d}"
        if b > 0 and i < 100:  # 100 near-dups of PREVIOUS-batch docs
            src = f"b{b-1:02d}d{i:05d}"
            rows.append((did, perturb(texts[src])))
            truth.add((src, did))
        else:
            rows.append((did, make_doc()))
        texts[did] = rows[-1][1]
    spark.createDataFrame(rows, "url string, text string").coalesce(1) \
         .write.mode("overwrite").parquet(f"{base}/in/batch={b:02d}")

stream = (spark.readStream.schema("url string, text string")
          .option("maxFilesPerTrigger", 1)
          .parquet(f"{base}/in/batch=*"))
t0 = time.time()
q = S.foreach_batch_dedup(
    stream, f"{base}/state", f"{base}/sink", f"{base}/ckpt",
    num_hashes=32, num_bands=8, compact_every=args.compact_every,
).start()
q.awaitTermination(1800)
wall = time.time() - t0
# per-batch walls from the query's own progress log (last 100 kept)
batch_walls = [
    p["durationMs"]["triggerExecution"] / 1000.0
    for p in q.recentProgress
    if p.get("numInputRows", 0) > 0
]
pairs = {tuple(sorted((r["src"], r["dst"])))
         for r in spark.read.parquet(f"{base}/sink").collect()}
truth_sorted = {tuple(sorted(t)) for t in truth}
tp = len(pairs & truth_sorted)
total = n_batches * per_batch

def lineage(did):
    # near-dup lineages share the doc index i (i < 100): bXXd000NN
    b, i = int(did[1:3]), int(did[4:])
    return i if i < 100 else None

same_lineage = sum(
    1 for a, b2 in pairs
    if lineage(a) is not None and lineage(a) == lineage(b2)
)
flat = ""
if len(batch_walls) >= 6:
    from statistics import median
    k = max(3, len(batch_walls) // 5)
    head, tail = batch_walls[1:1 + k], batch_walls[-k:]
    flat = (f" head_median={median(head):.2f}s tail_median={median(tail):.2f}s "
            f"growth={median(tail)/median(head):.2f}x max_batch={max(batch_walls):.2f}s")
print(f"docs={total} batches={n_batches} wall={wall:.1f}s docs_per_sec={total/wall:.0f} "
      f"adjacent_recall={tp/len(truth_sorted):.3f} found={len(pairs)} "
      f"lineage_precision={same_lineage/len(pairs) if pairs else 0:.3f}"
      f"{flat} compact_every={args.compact_every}")
if batch_walls:
    print("batch_walls_s=" + ",".join(f"{w:.2f}" for w in batch_walls))
