"""The flagship record-linkage pipeline (SURVEY.md §3.1 re-expressed):

    pages --extract--> documents
    conll --chunk----> mentions --preprocess--> mentions'
    kb_raw --load----> kb_entities --explode--> kb_names / postings
    mentions' --coref sieve--> chains
    chains x kb --blocking--> candidates --features--> scored pairs
    scored pairs --resolver cascade--> decisions
    decisions + chains (+ NIL name keys) --connected components--> clusters

Every stage writes its table to the work dir with a metrics/lineage row
(stage, rows, wall seconds, fingerprint of inputs); `resume=True` skips
stages whose output already exists — the north_rule's mid-run resume.
Deterministic throughout: stable ids, stable ordering, seeded synth.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hamerkop_spark.operators import blocking as B
from hamerkop_spark.operators import coref as C
from hamerkop_spark.operators import preprocess as P
from hamerkop_spark.operators import resolve as R
from hamerkop_spark.operators.cc import connected_components
from hamerkop_spark.operators.features import build_pairs, extract_features
from hamerkop_spark.operators.scoring import pairwise_f1
from hamerkop_spark.sources import kb as KBL
from hamerkop_spark.sources.conll import extract_mentions
from hamerkop_spark.sources.web import check_extraction_invariant, ingest_pages

# Default linear match decision (R5 analog): calibrated so exact-name or
# wikipedia evidence alone crosses the threshold, and strong
# Jaro-Winkler similarity (>= ~0.93, i.e. a one-edit misspelling of a
# medium-length name) links while generic name resemblance (~0.6-0.8)
# stays NIL. Mirrors the reference's cascade preference order; the
# cascade's earlier exact/wikipedia/edit-distance stages take the easy
# decisions, so this stage only sees the fuzzy residue.
DEFAULT_WEIGHTS = {
    "f_exact_match": 2.0,
    "f_wikipedia": 1.5,
    "f_jaro_winkler": 4.2,
    "f_shared_tokens": 0.5,
    "f_last_name": 0.25,
    "f_levenshtein": -1.0,
    "f_num_names": 0.05,
    "f_num_links": 0.05,
}
DEFAULT_BIAS = -3.45
DEFAULT_THRESHOLD = 0.25

# ngram_max_df="auto" resolves to this cap once the KB is past the
# broadcast size threshold. 2000 ~ 0.4% of a 483k-name KB: round-2
# density sweeps measured a cap at this order cutting retrieval wall
# 30-70% for <1% candidate-set change, and the round-5 483k profile
# (BASELINE.md) re-measured it end-to-end at identical pairwise F1.
NGRAM_AUTO_MAX_DF = 2000


def resolve_ngram_max_df(
    setting: int | None | str,
    est_name_chars: int,
    broadcast_limit: int,
) -> int | None:
    """Resolve the ngram_max_df knob. "auto" applies NGRAM_AUTO_MAX_DF
    only above the broadcast size threshold — the same single size
    estimate that picks the join strategy: small KBs keep the
    reference's exact every-gram scoring, large KBs get the bounded
    block sizes a web-scale run needs. Explicit int/None always wins."""
    if setting == "auto":
        return NGRAM_AUTO_MAX_DF if est_name_chars > broadcast_limit else None
    if isinstance(setting, str):
        raise ValueError(
            f"ngram_max_df must be an int, None, or 'auto'; got {setting!r}"
        )
    return setting


class StageRunner:
    """Checkpoint/resume + lineage metrics for pipeline stages.

    Each stage carries a FINGERPRINT chained through its dependencies:
    md5(stage name, the stage's own parameters, the fingerprints of its
    upstream stages). It is written to a `_hk_fingerprint` sidecar at
    write time and checked on resume — rerunning against the same workdir
    with changed weights/threshold/generators invalidates exactly the
    stages downstream of the change instead of silently serving stale
    checkpoints. (Code changes inside a stage body are not captured —
    only parameters and lineage; wipe the workdir after editing stage
    logic.)

    Backends: plain parquet dirs + `_SUCCESS` + fingerprint sidecars by
    default, or pass `catalog=IcebergishCatalog(...)` to checkpoint each
    stage as a snapshot-versioned table (atomic visibility, time travel,
    fingerprint stored in snapshot properties) — the north_rule's
    "checkpoints each stage to Iceberg" shape."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        resume: bool = True,
        catalog=None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.resume = resume
        self.catalog = catalog
        self.metrics: list[dict] = []
        self.fingerprints: dict[str, str] = {}
        os.makedirs(workdir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _fingerprint(self, stage: str, params: dict | None, deps: tuple) -> str:
        import hashlib

        payload = json.dumps(
            {
                "stage": stage,
                "params": params or {},
                "deps": {d: self.fingerprints.get(d, "?") for d in deps},
            },
            sort_keys=True,
            default=str,
        )
        return hashlib.md5(payload.encode()).hexdigest()

    def _partition_stats(self, df: DataFrame) -> dict:
        """Per-partition lineage row (north_rule: per-partition lineage +
        metrics): partition count and row-count distribution — min/max
        exposes skew a stage-level total would hide."""
        from pyspark.sql import functions as F

        per = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .agg(
                F.count("*").alias("n_partitions"),
                F.min("count").alias("min_rows"),
                F.max("count").alias("max_rows"),
            )
            .collect()[0]
        )
        return {
            "n_partitions": per["n_partitions"],
            "min_partition_rows": per["min_rows"],
            "max_partition_rows": per["max_rows"],
        }

    def run(
        self,
        stage: str,
        fn,
        partition_by: list | None = None,
        params: dict | None = None,
        deps: tuple = (),
    ) -> DataFrame:
        fp = self._fingerprint(stage, params, deps)
        self.fingerprints[stage] = fp
        t0 = time.time()
        if self.catalog is not None:
            return self._run_catalog(stage, fn, partition_by, fp, t0)
        path = self._path(stage)
        marker = os.path.join(path, "_SUCCESS")
        sidecar = os.path.join(self.workdir, f"{stage}._hk_fingerprint")
        if self.resume and os.path.exists(marker):
            stored = None
            if os.path.exists(sidecar):
                with open(sidecar) as fh:
                    stored = fh.read().strip()
            if stored == fp:
                df = self.spark.read.parquet(path)
                self.metrics.append(
                    {"stage": stage, "resumed": True, "rows": df.count(),
                     "seconds": round(time.time() - t0, 3), "fingerprint": fp}
                )
                return df
            # config/lineage changed (or pre-fingerprint checkpoint):
            # recompute instead of serving a stale table
        df = fn()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        with open(sidecar, "w") as fh:
            fh.write(fp)
        out = self.spark.read.parquet(path)
        entry = {"stage": stage, "resumed": False, "rows": out.count(),
                 "seconds": round(time.time() - t0, 3), "fingerprint": fp}
        entry.update(self._partition_stats(out))
        self.metrics.append(entry)
        return out

    def _catalog_table(self, stage: str) -> str:
        """Namespace catalog tables by workdir (as the plain-parquet
        backend implicitly does): two pipelines sharing one warehouse
        but using different workdirs must never resume each other's
        checkpoints — the fingerprint hashes config and lineage, not
        the input data itself."""
        import hashlib

        ns = hashlib.md5(os.path.abspath(self.workdir).encode()).hexdigest()[:8]
        return f"{ns}__{stage}"

    def _run_catalog(self, stage, fn, partition_by, fp, t0) -> DataFrame:
        """Catalog backend: the fingerprint lives in the current
        snapshot's properties; a mismatch commits a fresh snapshot (the
        stale one stays time-travelable instead of being overwritten)."""
        tbl = self._catalog_table(stage)
        if self.resume and self.catalog.exists(tbl):
            snap = self.catalog.current_snapshot(tbl)
            if snap["properties"].get("fingerprint") == fp:
                df = self.catalog.read(tbl)
                self.metrics.append(
                    {"stage": stage, "resumed": True,
                     "rows": snap["summary"]["rows"],
                     "seconds": round(time.time() - t0, 3),
                     "fingerprint": fp,
                     "snapshot_id": snap["snapshot_id"]}
                )
                return df
        df = fn()
        sid = self.catalog.commit(
            tbl, df, mode="overwrite", partition_by=partition_by,
            properties={"fingerprint": fp},
        )
        out = self.catalog.read(tbl)
        snap = self.catalog.current_snapshot(tbl)
        entry = {"stage": stage, "resumed": False,
                 "rows": snap["summary"]["rows"],
                 "seconds": round(time.time() - t0, 3),
                 "fingerprint": fp, "snapshot_id": sid}
        entry.update(self._partition_stats(out))
        self.metrics.append(entry)
        return out

    def write_metrics(self) -> str:
        p = os.path.join(self.workdir, "metrics.jsonl")
        with open(p, "w") as fp:
            for m in self.metrics:
                fp.write(json.dumps(m) + "\n")
        return p


def default_coref_stages() -> list:
    """The reference's canonical sieve (README.md:40-44): exact match,
    then acronyms, then aggressive last-token person matching."""
    return [
        C.exact_match_stage,
        C.acronym_stage(min_length=3),
        C.type_specific(C.single_token_match_stage(-1), "PER"),
    ]


def _dict_fingerprint(d: dict) -> str:
    import hashlib

    payload = json.dumps(sorted(d.items()), ensure_ascii=False)
    return hashlib.md5(payload.encode()).hexdigest()


def default_preprocessors() -> list:
    from hamerkop_spark.functions.translit import romanize

    return [
        P.type_validator,
        P.text_normalizer,
        P.garbage_remover,
        P.too_long_mention_remover(6),
        P.twitter_hashtag_processor,
        # T9 romanizer: ASCII/English rows come out NULL; the UDF's
        # isascii() fast path keeps the table walk off Latin
        # corpora out of the pandas UDF entirely
        P.name_projector(romanize),
    ]


def run_pipeline(
    spark: SparkSession,
    tables: dict,
    workdir: str,
    resume: bool = True,
    weights: dict | None = None,
    bias: float = DEFAULT_BIAS,
    threshold: float = DEFAULT_THRESHOLD,
    margin: float = 0.0,
    edit_margin: float = 0.0,
    candidate_limit: int = 25,
    generators: tuple = ("exact", "ngram"),
    ngram_max_df: int | None | str = "auto",
    broadcast_postings: bool | str = "auto",
    broadcast_postings_limit: int = 2_000_000,
    translation_map: dict | None = None,
    catalog=None,
    dedup_urls: bool = False,
) -> dict:
    """Run end-to-end. `tables` needs: pages, conll, kb_entities_raw,
    kb_alt_names (DataFrames). Returns dict with every stage DataFrame
    plus the metrics list. Pass `catalog=IcebergishCatalog(...)` to
    checkpoint stages as snapshot-versioned tables instead of plain
    parquet dirs.

    `broadcast_postings`: join strategy for the ngram retrieval.
    True forces the map-side broadcast hash join (postings must fit in
    executor memory); False forces the shuffled join (AQE picks the
    physical strategy and handles hot-ngram skew); "auto" (default)
    estimates the postings size from ONE cheap scan of kb_names — total
    formatted-name characters bound the posting rows (one ngram start
    per char) — and broadcasts only under `broadcast_postings_limit`.
    The reference's full KB (~23M names, io.py:577) lands far above any
    sane broadcast, so auto keeps the flagship alive at that scale;
    the physical join choice never enters the checkpoint fingerprint
    because both paths produce identical rows.

    `ngram_max_df`: "auto" (default) applies NGRAM_AUTO_MAX_DF to the
    ngram retrieval only above the same size threshold (small KBs keep
    reference-exact every-gram scoring; resolved caps DO enter the
    candidates fingerprint since they change rows). An int forces the
    cap, None disables it."""
    runner = StageRunner(spark, workdir, resume=resume, catalog=catalog)

    # 0. (opt-in) crawl re-fetch collapse: one page per CANONICAL url
    # (functions/url.url_canonicalize — casing/default-port/tracking-
    # param/fragment variants), keeping the latest fetch with the raw
    # url as tie-break. Off by default: the flagship contract keys
    # documents by RAW url (input_hint), and mentions referencing a
    # dropped variant url would dangle — enable it for crawl corpora
    # where the mention source is derived from the pages themselves.
    # Deterministic representative => resume/fingerprint-stable.
    pages = tables["pages"]
    if dedup_urls:
        def mk_pages_dedup():
            from pyspark.sql import Window as W

            from hamerkop_spark.functions.url import url_canonicalize

            canon = F.coalesce(url_canonicalize("url"), F.col("url"))
            w = W.partitionBy(canon).orderBy(
                F.desc("warc_ts"), F.asc("url")
            )
            return (
                pages.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") == 1)
                .drop("_rk")
            )

        pages = runner.run(
            "pages_dedup", mk_pages_dedup, params={"dedup_urls": True}
        )

    # 1. ingest + extraction invariant
    documents = runner.run(
        "documents", lambda: ingest_pages(pages),
        deps=("pages_dedup",) if dedup_urls else (),
    )
    violations = check_extraction_invariant(documents)
    if violations:
        raise AssertionError(
            f"extraction invariant violated for {violations} urls"
        )

    # 2. mentions (chunker + preprocessors + doc lang)
    def mk_mentions():
        m = extract_mentions(tables["conll"])
        langs = documents.select(F.col("url").alias("doc_id"), "lang")
        m = m.join(langs, "doc_id", "left")
        ops = default_preprocessors()
        if translation_map:
            # T7/B6 translate path (reference DictTranslator,
            # string.py:92-102 feeding TranslatedIndexBasedGenerator,
            # candidates.py:206-222): populate translate_string so the
            # exact_translate / ngram_translate generators below have a
            # probe key
            ops.append(P.dict_translator(translation_map))
        for op in ops:
            m = op(m)
        return m

    mentions = runner.run(
        "mentions", mk_mentions, deps=("documents",),
        # translation dict enters the fingerprint only when set (same
        # rule as ngram_max_df: default must not invalidate existing
        # checkpoints); the content hash, not the dict, keeps the
        # params row small
        params=(
            {"translation_fp": _dict_fingerprint(translation_map)}
            if translation_map else None
        ),
    )

    # 3. KB
    kb_entities = runner.run(
        "kb_entities",
        lambda: KBL.load_kb(tables["kb_entities_raw"], tables["kb_alt_names"]),
    )
    kb_names = runner.run("kb_names", lambda: B.build_kb_names(kb_entities), deps=("kb_entities",))

    # 4. coref sieve -> chains
    chained = runner.run(
        "mentions_chained",
        lambda: C.cascade_coref(mentions, default_coref_stages()),
        deps=("mentions",),
    )
    chains = runner.run("chains", lambda: C.chains_table(chained), deps=("mentions_chained",))

    # 5. blocking cascade (B8): precise key families first, fuzzy ones
    #    fill remaining candidate slots
    # ngram postings are shared by the ngram and ngram_translit
    # generators: build once, decide broadcast-vs-shuffled once. The
    # SAME one-scan size estimate resolves ngram_max_df="auto" — and
    # that resolution must happen BEFORE the candidates stage runs so
    # the resolved cap can enter the checkpoint fingerprint (a lazy
    # resolve inside the stage would make fingerprint-identical runs
    # produce different candidates at different KB sizes).
    if isinstance(broadcast_postings, str) and broadcast_postings != "auto":
        # a config-plumbed "false"/"true" string would hit
        # bool("false") == True and force the broadcast join at
        # exactly the KB scale False exists to survive — refuse
        # every string except the documented "auto"
        raise ValueError(
            "broadcast_postings must be True, False, or 'auto'; "
            f"got string {broadcast_postings!r}"
        )
    needs_est = any(g.startswith("ngram") for g in generators) and (
        broadcast_postings == "auto" or ngram_max_df == "auto"
    )
    est_chars = (
        int(kb_names.agg(F.sum(F.length("name"))).first()[0] or 0)
        if needs_est
        else 0
    )
    if any(g.startswith("ngram") for g in generators):
        ngram_max_df = resolve_ngram_max_df(
            ngram_max_df, est_chars, int(broadcast_postings_limit)
        )
    else:
        ngram_max_df = None if ngram_max_df == "auto" else ngram_max_df
    _postings_state: dict = {}

    def get_postings():
        if not _postings_state:
            postings, _ = B.build_ngram_postings(kb_names)
            if broadcast_postings == "auto":
                bc = est_chars <= int(broadcast_postings_limit)
            else:
                bc = bool(broadcast_postings)
            _postings_state.update(postings=postings, broadcast=bc)
        return _postings_state["postings"], _postings_state["broadcast"]

    def mk_candidates():
        sets = []
        for gen in generators:
            if gen == "exact":
                sets.append(B.exact_match_candidates(chains, kb_names))
            elif gen == "ngram":
                # ngram_max_df skips grams posting to more than that
                # many names — at dense KBs a ~10%-of-names cap cuts
                # retrieval wall 30-70% for <1% candidate loss
                # (BASELINE.md); None (default) scores every gram like
                # the reference does
                postings, bc = get_postings()
                sets.append(
                    B.ngram_candidates(
                        chains, postings, limit=candidate_limit,
                        broadcast_postings=bc, max_df=ngram_max_df,
                    )
                )
            elif gen == "phonetic":
                sets.append(
                    B.phonetic_candidates(
                        chains, kb_names, key="soundex", limit=candidate_limit
                    )
                )
            elif gen == "double_metaphone":
                sets.append(
                    B.phonetic_candidates(
                        chains, kb_names, key="double_metaphone",
                        limit=candidate_limit,
                    )
                )
            elif gen == "minhash":
                sets.append(
                    B.minhash_lsh_candidates(
                        chains, kb_names, limit=candidate_limit
                    )
                )
            elif gen == "exact_translit":
                # B6 TranslitIndexBasedGenerator (candidates.py:187-204):
                # same blocking join keyed on the chain's longest
                # transliterated string
                sets.append(
                    B.exact_match_candidates(
                        chains, kb_names, name_col="translit_name",
                        source="exact_translit",
                    )
                )
            elif gen == "ngram_translit":
                postings, bc = get_postings()
                sets.append(
                    B.ngram_candidates(
                        chains, postings, name_col="translit_name",
                        limit=candidate_limit, broadcast_postings=bc,
                        source="ngram_translit",
                    )
                )
            elif gen == "exact_translate":
                # B6 TranslatedIndexBasedGenerator, exact key
                # (candidates.py:206-222): blocking join on the chain's
                # dictionary-translated name (dict_translator output,
                # requires translation_map)
                sets.append(
                    B.exact_match_candidates(
                        chains, kb_names, name_col="translate_name",
                        source="exact_translate",
                    )
                )
            elif gen == "ngram_translate":
                postings, bc = get_postings()
                sets.append(
                    B.ngram_candidates(
                        chains, postings, name_col="translate_name",
                        limit=candidate_limit, broadcast_postings=bc,
                        source="ngram_translate",
                    )
                )
            else:
                raise ValueError(f"unknown generator: {gen}")
        return B.cascade_candidates(sets, num_candidates=candidate_limit)

    candidates = runner.run(
        "candidates",
        mk_candidates,
        # ngram_max_df enters the fingerprint only when set: adding the
        # key unconditionally would invalidate every pre-existing
        # checkpoint at the default (None = identical behavior)
        params={"generators": list(generators), "limit": candidate_limit,
                **({"ngram_max_df": ngram_max_df}
                   if ngram_max_df is not None else {})},
        deps=("chains", "kb_names"),
    )

    # 6. pairs + features
    scored = runner.run(
        "scored_pairs",
        lambda: extract_features(build_pairs(chains, candidates, kb_entities)),
        deps=("chains", "candidates", "kb_entities"),
    )

    # 7. resolver cascade
    def mk_decisions():
        return R.cascade_resolver(
            scored,
            [
                R.exact_name_resolver,
                R.wikipedia_resolver,
                # margin and edit_margin are SEPARATE knobs: the linear
                # stage's margin is in logit units, the edit stage's in
                # normalized-distance units ([0,1], accept range < 0.1)
                # — one coupled value would disable the edit stage long
                # before it tightens the linear one
                lambda p: R.edit_distance_resolver(
                    p, threshold=0.1, margin=edit_margin
                ),
                R.linear_resolver(
                    weights or DEFAULT_WEIGHTS, bias, threshold, margin=margin
                ),
            ],
        )

    decisions = runner.run(
        "decisions",
        mk_decisions,
        params={"weights": weights or DEFAULT_WEIGHTS, "bias": bias,
                "threshold": threshold, "margin": margin,
                "edit_margin": edit_margin},
        deps=("scored_pairs",),
    )

    # 8. corpus-level transitive clustering (north_rule §2.7): edges =
    #    in-doc chain membership + shared decided entity + shared NIL
    #    normalized name. Entities and NIL name keys are virtual nodes.
    def mk_clusters():
        m = chained.select("mention_id", "doc_id", "chain_id")
        chain_nodes = m.select(
            F.col("mention_id").alias("src"),
            F.concat(F.lit("CH:"), F.col("doc_id"), F.lit("/"), F.col("chain_id")).alias("dst"),
        )
        decided = m.join(decisions, ["doc_id", "chain_id"]).select(
            F.col("mention_id").alias("src"),
            F.concat(F.lit("ENT:"), F.col("entity_id")).alias("dst"),
        )
        nil_chains = chains.join(decisions, ["doc_id", "chain_id"], "left_anti")
        nil_edges = (
            chained.join(
                nil_chains.select("doc_id", "chain_id", "name"),
                ["doc_id", "chain_id"],
            )
            .select(
                F.col("mention_id").alias("src"),
                F.concat(F.lit("NIL:"), F.lower("name")).alias("dst"),
            )
        )
        edges = chain_nodes.unionByName(decided).unionByName(nil_edges)
        comps = connected_components(
            edges, nodes=m.select(F.col("mention_id").alias("node"))
        )
        return comps.select(
            F.col("node").alias("mention_id"), F.col("component").alias("cluster")
        )

    clusters = runner.run("clusters", mk_clusters, deps=("mentions_chained", "chains", "decisions"))

    runner.write_metrics()
    return {
        "documents": documents,
        "mentions": mentions,
        "kb_entities": kb_entities,
        "kb_names": kb_names,
        "mentions_chained": chained,
        "chains": chains,
        "candidates": candidates,
        "scored_pairs": scored,
        "decisions": decisions,
        "clusters": clusters,
        "metrics": runner.metrics,
        # observability: which physical join the ngram retrieval took
        # (None when the candidates stage resumed from checkpoint and
        # postings were never built this run)
        "ngram_join": (
            None if "broadcast" not in _postings_state
            else ("broadcast" if _postings_state["broadcast"] else "shuffled")
        ),
        # observability: what "auto" resolved to (int cap or None)
        "ngram_max_df": ngram_max_df,
    }


def evaluate_pipeline(result: dict, labeled_pairs: DataFrame):
    """Pairwise F1 of the produced clusters on the labeled-pair surface."""
    return pairwise_f1(result["clusters"], labeled_pairs, id_col="mention_id")


def evaluate_full(result: dict, ground_truth: DataFrame, labeled_pairs: DataFrame) -> dict:
    """The complete scorer battery the reference runs in-pipeline
    (SURVEY.md B10/B11/R9/C7): candidate recall by type, resolver P/R
    counts by type, MUC and B³ against gold clusters, plus the pairwise
    F1 acceptance metric."""
    from hamerkop_spark.operators.scoring import (
        b3,
        candidate_recall,
        kb_loading_recall,
        muc,
        resolver_report,
    )
    from hamerkop_spark.sources.output import gold_cluster_key, parse_ground_truth

    gt = parse_ground_truth(ground_truth)
    chained = result["mentions_chained"].select(
        "doc_id", "char_start", "char_stop", "chain_id", "mention_id"
    )
    gt_chain = gt.join(chained, ["doc_id", "char_start", "char_stop"])
    gold_rows = gt_chain.select(
        "doc_id", "chain_id", "entity_type", "link_type", "gold_links"
    )
    linked_gold = gold_rows.where(F.col("link_type") == "link")

    pred_clusters = result["clusters"].select(
        F.col("mention_id").alias("mention_key"), "cluster"
    )
    gold_clusters = gold_cluster_key(gt_chain).select(
        F.col("mention_id").alias("mention_key"),
        F.col("gold_cluster").alias("cluster"),
    )
    gold_ids = (
        linked_gold.select(F.explode("gold_links").alias("entity_id")).distinct()
    )
    return {
        "pairwise": pairwise_f1(result["clusters"], labeled_pairs, "mention_id"),
        "candidate_recall": candidate_recall(result["candidates"], linked_gold),
        "resolver_report": resolver_report(
            result["decisions"], result["candidates"], gold_rows
        ),
        "muc": muc(pred_clusters, gold_clusters),
        "b3": b3(pred_clusters, gold_clusters),
        "kb_recall": kb_loading_recall(result["kb_entities"], gold_ids),
    }
