"""End-to-end acceptance: full pipeline on the seeded synthetic corpus,
pairwise F1 >= 0.99 (BASELINE.json metric), resume, invariant."""

import shutil

import pytest
from pyspark.sql import functions as F

from hamerkop_spark.plans.pipeline import evaluate_pipeline, run_pipeline
from hamerkop_spark.synth import make_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    return make_corpus(spark, n_docs=40, seed=42)


@pytest.fixture(scope="module")
def result(spark, corpus, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("hkwork"))
    return run_pipeline(spark, corpus, work, resume=False), work


def test_pairwise_f1_gate(spark, corpus, result):
    res, _ = result
    ev = evaluate_pipeline(res, corpus["labeled_pairs"])
    assert ev.tp + ev.fn > 0, "labeled-pair surface must be non-empty"
    assert ev.f1 >= 0.99, f"pairwise F1 {ev.f1} below gate (p={ev.precision}, r={ev.recall})"


def test_all_stages_produce_rows(result):
    res, _ = result
    for m in res["metrics"]:
        assert m["rows"] > 0, m


def test_resume_skips_stages(spark, corpus, result):
    res, work = result
    res2 = run_pipeline(spark, corpus, work, resume=True)
    assert all(m["resumed"] for m in res2["metrics"])
    ev = evaluate_pipeline(res2, corpus["labeled_pairs"])
    assert ev.f1 >= 0.99


def test_extraction_invariant_enforced(spark, corpus, tmp_path):
    bad = corpus["pages"].withColumn(
        "html",
        F.when(
            F.col("url").contains("000001"),
            F.lit(bytearray(b"<html><body><article>tampered</article></body></html>")),
        ).otherwise(F.col("html")),
    )
    tables = dict(corpus)
    tables["pages"] = bad
    with pytest.raises(AssertionError, match="extraction invariant"):
        run_pipeline(spark, tables, str(tmp_path / "bad"), resume=False)


def test_decisions_reference_kb(result):
    res, _ = result
    ids = {r["entity_id"] for r in res["decisions"].collect()}
    kb_ids = {r["entity_id"] for r in res["kb_entities"].collect()}
    assert ids <= kb_ids


def test_noisy_corpus_fuzzy_path(spark, tmp_path):
    """25-30% of mention surfaces misspelled: the fuzzy path (ngram
    blocking + Jaro-Winkler linear decision) must still clear the F1
    gate — this is the web-text robustness the north_rule targets."""
    noisy = make_corpus(spark, n_docs=40, seed=7, misspell_prob=0.3)
    res = run_pipeline(
        spark, noisy, str(tmp_path / "noisy"), resume=False,
        generators=("exact", "ngram", "phonetic", "double_metaphone",
                    "minhash"),
    )
    ev = evaluate_pipeline(res, noisy["labeled_pairs"])
    assert ev.tp + ev.fn > 0
    assert ev.f1 >= 0.99, f"noisy-corpus F1 {ev.f1} (p={ev.precision}, r={ev.recall})"


def test_evaluate_full_battery(spark, corpus, result):
    from hamerkop_spark.plans.pipeline import evaluate_full

    res, _ = result
    ev = evaluate_full(res, corpus["ground_truth"], corpus["labeled_pairs"])
    assert ev["pairwise"].f1 >= 0.99
    cr = {r["entity_type"]: r["recall"] for r in ev["candidate_recall"].collect()}
    assert all(v >= 0.95 for v in cr.values()), cr
    rr = ev["resolver_report"].collect()
    total_correct = sum(r["n_correct"] for r in rr)
    total_recallable = sum(r["n_recallable"] for r in rr)
    assert total_recallable > 0
    assert total_correct / total_recallable >= 0.95
    assert sum(r["n_false_alarm"] for r in rr) == 0
    assert ev["muc"].f1 >= 0.95
    assert ev["b3"].f1 >= 0.95
    assert ev["kb_recall"].recall == 1.0


def test_corpus_determinism(spark):
    c1 = make_corpus(spark, n_docs=5, seed=123)
    c2 = make_corpus(spark, n_docs=5, seed=123)
    t1 = sorted(r["text"] for r in c1["pages"].collect())
    t2 = sorted(r["text"] for r in c2["pages"].collect())
    assert t1 == t2


def test_resume_invalidates_on_config_change(spark, corpus, tmp_path_factory):
    """Stage fingerprints chain config + lineage: rerunning with a changed
    decision threshold against the same workdir must RECOMPUTE decisions
    and clusters (not serve stale checkpoints) while upstream stages
    still resume."""
    work = str(tmp_path_factory.mktemp("fp") / "wk")
    run_pipeline(spark, corpus, work, resume=False)
    res2 = run_pipeline(spark, corpus, work, resume=True, threshold=0.9)
    by_stage = {m["stage"]: m for m in res2["metrics"]}
    assert by_stage["documents"]["resumed"] is True
    assert by_stage["scored_pairs"]["resumed"] is True
    assert by_stage["decisions"]["resumed"] is False
    assert by_stage["clusters"]["resumed"] is False


def test_ngram_postings_auto_switch_shuffled_f1_green(spark, corpus, tmp_path):
    """VERDICT r3 #1 (flagship wiring): broadcast_postings='auto' with a
    limit below the KB's total name chars must take the shuffled join
    end-to-end, report it in the result, and keep the F1 gate green —
    the degrade-gracefully path for KBs too big to broadcast."""
    res = run_pipeline(
        spark, corpus, str(tmp_path / "shuf"), resume=False,
        broadcast_postings="auto", broadcast_postings_limit=10,
    )
    assert res["ngram_join"] == "shuffled"
    ev = evaluate_pipeline(res, corpus["labeled_pairs"])
    assert ev.f1 >= 0.99, ev

    # default auto on the small fixture KB broadcasts (and resumes
    # leave the choice undecided=None rather than stale)
    res2 = run_pipeline(
        spark, corpus, str(tmp_path / "bc"), resume=False,
    )
    assert res2["ngram_join"] == "broadcast"
    res3 = run_pipeline(spark, corpus, str(tmp_path / "bc"), resume=True)
    assert res3["ngram_join"] is None
    assert all(m.get("resumed") for m in res3["metrics"])


def test_translate_generators_resolve_translated_corpus(spark, tmp_path):
    """VERDICT r3 #5: on a corpus whose mention surfaces are dictionary-
    obfuscated (every token reversed), the exact/ngram generators fail
    (control F1 well below the gate) but the exact_translate /
    ngram_translate path — dict_translator feeding translate_name probe
    keys (reference TranslatedIndexBasedGenerator,
    candidates.py:206-222) — restores F1 >= 0.99."""
    from hamerkop_spark.operators import blocking as B
    from hamerkop_spark.sources import kb as KBL

    corpus = dict(make_corpus(spark, n_docs=40, seed=42))
    # obfuscate every mention token in-place (tag != O); reversal keeps
    # token length, so conll char offsets and the labeled-pair surface
    # stay valid
    corpus["conll"] = corpus["conll"].withColumn(
        "token",
        F.when(F.col("tag") != "O", F.reverse(F.col("token"))).otherwise(
            F.col("token")
        ),
    )
    # translation dictionary: reversed KB surface -> original
    kb_names = B.build_kb_names(
        KBL.load_kb(corpus["kb_entities_raw"], corpus["kb_alt_names"])
    )
    tmap = {
        " ".join(t[::-1] for t in r["name"].split()): r["name"]
        for r in kb_names.select("name").distinct().collect()
    }

    control = run_pipeline(
        spark, corpus, str(tmp_path / "control"), resume=False
    )
    ev_c = evaluate_pipeline(control, corpus["labeled_pairs"])
    assert ev_c.f1 < 0.9, ev_c  # exact/ngram genuinely can't link these

    res = run_pipeline(
        spark, corpus, str(tmp_path / "translate"), resume=False,
        generators=("exact", "exact_translate", "ngram_translate"),
        translation_map=tmap,
    )
    ev = evaluate_pipeline(res, corpus["labeled_pairs"])
    assert ev.tp + ev.fn > 0
    assert ev.f1 >= 0.99, ev


def test_broadcast_postings_rejects_unknown_strings(spark, corpus, tmp_path):
    """Review r4: bool('false') is True — a config-plumbed string other
    than 'auto' must raise instead of silently forcing the broadcast
    join at exactly the scale False exists to survive."""
    import pytest

    from hamerkop_spark.plans.pipeline import run_pipeline

    with pytest.raises(ValueError, match="broadcast_postings"):
        run_pipeline(
            spark, corpus, str(tmp_path / "wd"), resume=False,
            broadcast_postings="false",
        )


def test_resolve_ngram_max_df_auto_semantics():
    """'auto' caps posting df only above the broadcast size threshold;
    explicit int/None always wins; config-plumbed strings are refused
    (the bool('false') class of trap, same rule as broadcast_postings)."""
    import pytest

    from hamerkop_spark.plans.pipeline import (
        NGRAM_AUTO_MAX_DF,
        resolve_ngram_max_df,
    )

    assert resolve_ngram_max_df("auto", 1_000, 2_000_000) is None
    assert resolve_ngram_max_df("auto", 2_000_001, 2_000_000) == \
        NGRAM_AUTO_MAX_DF
    assert resolve_ngram_max_df(None, 10_000_000, 2) is None
    assert resolve_ngram_max_df(500, 10_000_000, 2) == 500
    with pytest.raises(ValueError):
        resolve_ngram_max_df("2000", 0, 2_000_000)


def test_dedup_urls_collapses_refetch_variants(spark, tmp_path):
    """Opt-in canonical-URL pre-dedup: re-fetches of the same page under
    tracking-param/casing URL variants collapse to the latest fetch
    before extraction; answers match the clean run bit-for-bit."""
    corpus = dict(make_corpus(spark, n_docs=12, seed=42))
    pages = corpus["pages"]
    n0 = pages.count()
    # re-fetch every page under a tracking-variant URL, one hour later;
    # extraction reads only <article>, so the html bytes stay valid for
    # the variant row and the invariant must still hold after dedup
    variants = pages.select(
        F.concat(F.col("url"), F.lit("?utm_source=refetch")).alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")).alias("warc_ts"),
        "html", "text", "lang",
    )
    corpus["pages"] = pages.unionByName(variants)
    res = run_pipeline(
        spark, corpus, str(tmp_path / "wd"), resume=False, dedup_urls=True
    )
    docs = res["documents"]
    assert docs.count() == n0
    # the survivor of each canonical group is the LATEST fetch -> every
    # surviving raw url carries the tracking variant
    n_variant = docs.where(F.col("url").contains("utm_source")).count()
    assert n_variant == n0
    # without the flag, both fetches flow through as separate documents
    res2 = run_pipeline(
        spark, corpus, str(tmp_path / "wd2"), resume=False
    )
    assert res2["documents"].count() == 2 * n0
