"""Dedup operator tests: exact, minhash-LSH, simhash, n-gram jaccard,
embedding cosine."""

import pytest

from hamerkop_spark.operators import dedup as D

BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while officials reported "
    "that the meeting about water supply was postponed until further notice"
)
NEAR = BASE_TEXT.replace("lazy", "sleepy")
FAR = (
    "completely different content about mining projects in the northern "
    "province approved by the council yesterday evening"
)


def docs(spark):
    return spark.createDataFrame(
        [("a", BASE_TEXT), ("b", BASE_TEXT + "!"), ("c", NEAR), ("d", FAR)],
        "doc_id string, text string",
    )


def test_exact_dedup(spark):
    out = {r["doc_id"]: (r["dup_of"], r["is_duplicate"])
           for r in D.exact_dedup(docs(spark)).collect()}
    # 'a' and 'b' differ only by punctuation -> same fingerprint
    assert out["a"] == ("a", False)
    assert out["b"] == ("a", True)
    assert out["c"][1] is False
    assert out["d"][1] is False


def test_minhash_pairs_find_near(spark):
    pairs = {
        (r["src"], r["dst"])
        for r in D.minhash_dedup_pairs(docs(spark), num_hashes=64, num_bands=16).collect()
    }
    assert ("a", "b") in pairs
    assert ("a", "c") in pairs or ("c", "a") in pairs or ("a", "c") in pairs
    assert not any("d" in p for p in pairs)


def test_minhash_dedup_end_to_end(spark):
    out = {r["doc_id"]: r["dup_cluster"]
           for r in D.minhash_dedup(docs(spark), num_hashes=64, num_bands=16).collect()}
    assert out["a"] == out["b"] == out["c"]
    assert out["d"] != out["a"]


def test_simhash_pairs_md5(spark):
    # md5-native 60-bit variant (oracle-checkable): a~c differ by one
    # substituted word (hamming 3); a~b differ by a '!'-suffixed final
    # token (a whole-token replacement, hamming ~10); d is far from all
    pairs = {
        tuple(sorted((r["src"], r["dst"])))
        for r in D.simhash_dedup_pairs(docs(spark), max_hamming=6).collect()
    }
    assert ("a", "c") in pairs
    assert not any("d" in p for p in pairs)
    wide = {
        tuple(sorted((r["src"], r["dst"])))
        for r in D.simhash_dedup_pairs(docs(spark), max_hamming=12).collect()
    }
    assert ("a", "b") in wide
    assert not any("d" in p for p in wide)


def test_simhash_pairs_fnv(spark):
    pairs = {
        tuple(sorted((r["src"], r["dst"])))
        for r in D.simhash_dedup_pairs(
            docs(spark), max_hamming=6, hash_fn="fnv"
        ).collect()
    }
    assert ("a", "b") in pairs
    assert not any("d" in p for p in pairs)


def test_simhash_deterministic(spark):
    s1 = D._simhash64(["hello", "world"])
    s2 = D._simhash64(["hello", "world"])
    assert s1 == s2
    assert D._simhash64(["hello"]) != D._simhash64(["goodbye"])


def test_ngram_jaccard_pairs(spark):
    out = {
        tuple(sorted((r["src"], r["dst"]))): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs(spark), min_jaccard=0.5).collect()
    }
    assert out[("a", "b")] == pytest.approx(1.0)  # punct normalized away
    assert ("a", "c") in out
    assert not any("d" in p for p in out)


def test_embedding_neardup(spark):
    emb = spark.createDataFrame(
        [
            ("v1", [1.0, 0.0, 0.0, 0.0]),
            ("v2", [0.99, 0.05, 0.0, 0.0]),
            ("v3", [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id string, embedding array<float>",
    )
    # default LSH-bucketed path (dim required); near-parallel vectors
    # share a bucket w.h.p., orthogonal ones don't matter (cosine filter)
    out = {
        tuple(sorted((r["src"], r["dst"])))
        for r in D.embedding_neardup_pairs(emb, min_cosine=0.95, dim=4).collect()
    }
    assert out == {("v1", "v2")}
    # exact brute-force audit variant agrees here
    bf = {
        tuple(sorted((r["src"], r["dst"])))
        for r in D.embedding_neardup_pairs(
            emb, min_cosine=0.95, brute_force=True
        ).collect()
    }
    assert bf == {("v1", "v2")}


def test_prefix_filter_blocking_is_lossless_vs_brute_force(spark):
    """ppjoin prefix-filter lemma check: the q_f_token_jaccard_docs
    blocking (per-doc rarest |A| - ceil(t|A|) + 1 tokens under a global
    frequency order) must produce EXACTLY the brute-force thresholded
    pair set on a randomized corpus — the filter may only drop pairs
    below the threshold, never above."""
    import itertools
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    # skewed frequencies: low-index words are stopword-hot
    docs = []
    for i in range(120):
        n = rng.randrange(3, 14)
        toks = {
            vocab[min(rng.randrange(60), rng.randrange(60))]
            for _ in range(n)
        }
        docs.append((i, sorted(toks)))
    t = 0.1

    def jac(a, b):
        a, b = set(a), set(b)
        u = len(a | b)
        return len(a & b) / u if u else 0.0

    want = {
        (i, j)
        for (i, ta), (j, tb) in itertools.combinations(docs, 2)
        if jac(ta, tb) >= t
    }

    da = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    tok = da.select("doc_id", F.explode("toks").alias("tok"))
    df_tok = tok.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    pref = (
        tok.join(df_tok, "tok")
        .withColumn("rn", F.row_number().over(w))
        .join(da.select("doc_id", F.size("toks").alias("s")), "doc_id")
        .where(F.col("rn") <= F.col("s") - F.ceil(F.col("s") * F.lit(t)) + 1)
        .select("doc_id", "tok")
    )
    cand = (
        pref.select(F.col("doc_id").alias("src"), "tok")
        .join(pref.select(F.col("doc_id").alias("dst"), "tok"), "tok")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    pairs = cand.join(
        da.select(F.col("doc_id").alias("src"), F.col("toks").alias("ta")),
        "src",
    ).join(
        da.select(F.col("doc_id").alias("dst"), F.col("toks").alias("tb")),
        "dst",
    )
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    union = F.size(F.array_union("ta", "tb")).cast("double")
    jc = F.when(union == 0, 0.0).otherwise(inter / union)
    got = {
        (r["src"], r["dst"])
        for r in pairs.where(jc >= t).select("src", "dst").collect()
    }
    assert got == want, (len(got), len(want), got ^ want)


def test_exact_dedup_null_text_rows_survive_as_singletons(spark):
    """Review fix: NULL-text rows must not vanish through the fp
    equi-join (and must NOT merge with each other — no content is not
    identical content)."""
    from hamerkop_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [("a", None), ("b", "same text"), ("c", "same text"), ("d", None)],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: (r["dup_of"], r["is_duplicate"])
           for r in exact_dedup(df).collect()}
    assert got["a"] == ("a", False)
    assert got["d"] == ("d", False)
    assert got["b"] == ("b", False) and got["c"] == ("b", True)


def test_ngram_jaccard_consistent_universe_with_hot_grams(spark):
    """Review r4: identical docs that share ultra-common (dropped) grams
    must still score jaccard 1.0 — sizes and intersection now use the
    SAME post-drop gram universe — while boilerplate-only pairs stay
    unpaired (their shared grams are exactly the dropped ones)."""
    import hamerkop_spark.operators.dedup as D
    from pyspark.sql import functions as F

    boiler = "aaaaaaaa"  # one 5-gram universe: 'aaaaa' x4 -> distinct 'aaaaa'
    rows = [(f"d{i}", boiler) for i in range(10)]  # boilerplate-only docs
    uniq = "zqxjkvwpy"
    rows += [("x1", boiler + " " + uniq), ("x2", boiler + " " + uniq)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = D.ngram_jaccard_pairs(
        docs, n=5, min_jaccard=0.99, max_df=5
    ).collect()
    # x1/x2 identical -> 1.0 despite sharing the hot boilerplate gram;
    # the 10 boilerplate-only docs share ONLY dropped grams -> no pairs
    assert [(r["src"], r["dst"], r["jaccard"]) for r in pairs] == [
        ("x1", "x2", 1.0)
    ]
