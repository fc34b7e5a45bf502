"""Measure MinHash-LSH dedup precision/recall on a planted near-dup
corpus: 1500 base docs + 400 near-dup copies at controlled word-level
perturbation rates."""
import random
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hamerkop_spark.session import get_spark
from hamerkop_spark.operators.dedup import minhash_dedup_pairs

rng = random.Random(13)
VOCAB = [f"tok{i:03d}" for i in range(800)]

def make_doc(n=80):
    return [rng.choice(VOCAB) for _ in range(n)]

def perturb(words, rate):
    out = []
    for w in words:
        r = rng.random()
        if r < rate / 3: continue                      # delete
        if r < 2 * rate / 3: out.append(rng.choice(VOCAB)); continue  # replace
        out.append(w)
        if rng.random() < rate / 3: out.append(rng.choice(VOCAB))     # insert
    return out

docs, truth = [], set()
for i in range(1500):
    docs.append((f"d{i:05d}", " ".join(make_doc())))
for j in range(400):
    src = j  # first 400 bases get a near-dup
    rate = 0.05 if j % 2 == 0 else 0.15
    did = f"n{j:05d}"
    docs.append((did, " ".join(perturb(docs[src][1].split(), rate))))
    truth.add((f"d{src:05d}", did))

spark = get_spark(cores=16, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame(docs, "doc_id string, text string")
for nh, nb in [(32, 8), (64, 16)]:
    pairs = {
        tuple(sorted((r["src"], r["dst"])))
        for r in minhash_dedup_pairs(df, num_hashes=nh, num_bands=nb).collect()
    }
    tp = len(pairs & truth)
    prec = tp / len(pairs) if pairs else 0
    rec = tp / len(truth)
    # split recall by perturbation rate
    light = {t for t in truth if int(t[1][1:]) % 2 == 0}
    heavy = truth - light
    rl = len(pairs & light) / len(light)
    rh = len(pairs & heavy) / len(heavy)
    print(f"hashes={nh} bands={nb} pairs={len(pairs)} precision={prec:.3f} "
          f"recall={rec:.3f} (5% perturb: {rl:.3f}, 15% perturb: {rh:.3f})")

for nh, nb in [(32, 16)]:
    pairs = {
        tuple(sorted((r["src"], r["dst"])))
        for r in minhash_dedup_pairs(df, num_hashes=nh, num_bands=nb).collect()
    }
    tp = len(pairs & truth)
    prec = tp / len(pairs) if pairs else 0
    rec = tp / len(truth)
    light = {t for t in truth if int(t[1][1:]) % 2 == 0}
    heavy = truth - light
    rl = len(pairs & light) / len(light)
    rh = len(pairs & heavy) / len(heavy)
    print(f"hashes={nh} bands={nb} (2 rows/band) pairs={len(pairs)} precision={prec:.3f} "
          f"recall={rec:.3f} (5% perturb: {rl:.3f}, 15% perturb: {rh:.3f})")

