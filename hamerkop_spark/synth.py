"""Deterministic synthetic web corpus + KB generator (SURVEY.md §7 M0).

Everything is seeded (`random.Random(seed)`) and generated driver-side,
so two runs produce byte-identical tables — required because the
acceptance surface (labeled pairs, extraction byte-parity) is derived
from this corpus. No external data (brief requirement).

Shapes follow FIXTURES.md:
  pages           (url, warc_ts, html, text, lang)       — input_hint
  conll           CONLL schema (token tag doc_id start stop sent row_idx)
  kb_entities_raw 47-column LoReHLT shape (io.py:339-386)
  kb_alt_names    (entityid, alternatename)
  ground_truth    submission format (io.py:257-266)
  labeled_pairs   (key_a, key_b, block_key, label)       — F1 surface
"""

from __future__ import annotations

import datetime as _dt
import random

from pyspark.sql import SparkSession

from hamerkop_spark.schemas import CONLL, GROUND_TRUTH, KB_COLUMNS, KB_RAW, PAGES
from hamerkop_spark.sources.web import wrap_text_as_html

FIRST = ["John", "Mary", "Ahmed", "Fatima", "Wei", "Chen", "Ivan", "Olga",
         "Kofi", "Amina", "Jose", "Lucia", "Pierre", "Anna", "David", "Sara",
         "Elena", "Omar", "Grace", "Tariq", "Mei", "Paulo", "Nadia", "Viktor"]
LAST = ["Smith", "Johnson", "Okafor", "Haile", "Zhang", "Petrov", "Garcia",
        "Dubois", "Keita", "Mwangi", "Rahman", "Silva", "Kim", "Tanaka",
        "Novak", "Berg", "Costa", "Ali", "Moreno", "Weber"]
CITY = ["Springfield", "Rivertown", "Lakeview", "Hillcrest", "Stonebridge",
        "Fairview", "Maplewood", "Ashford", "Brookfield", "Claremont",
        "Addis Ketema", "Port Azure"]
ORG_A = ["United", "National", "Global", "Eastern", "Central", "Royal",
         "Pacific", "Northern"]
ORG_B = ["Development", "Trade", "Relief", "Water", "Health", "Mining",
         "Transport", "Energy"]
ORG_C = ["Council", "Agency", "Commission", "Bank", "Institute", "Union",
         "Authority", "Cooperative"]
LOCS = ["Blue River", "Mount Harmon", "Lake Solara", "Green Valley",
        "Sand Hills", "Crystal Falls"]
FILLER = ("officials reported that the meeting about water supply and "
          "regional trade was postponed until further notice because of "
          "heavy rain across the province").split()
COUNTRIES = ["US", "ET", "NG", "FR", "CN", "RU", "BR", "KE"]


def _misspell(rng: random.Random, name: str) -> str:
    """Deterministic single-character misspelling (never first char)."""
    if len(name) < 4:
        return name + "e"
    positions = [
        j for j in range(1, len(name) - 1)
        if name[j] != " " and name[j + 1] != " "
    ]
    if not positions:
        return name + "e"
    i = rng.choice(positions)
    op = rng.randrange(3)
    if op == 0:  # drop
        return name[:i] + name[i + 1:]
    if op == 1:  # double
        return name[:i] + name[i] + name[i:]
    return name[:i] + name[i + 1] + name[i] + name[i + 2:]  # swap


def _acronym(name: str) -> str:
    return "".join(w[0].upper() for w in name.split())


def build_kb(rng: random.Random, n_per=40, n_org=30, n_gpe=24, n_loc=6):
    """Returns (entities_rows_47col, alt_name_rows, entity_meta dict)."""
    entities, alts, meta = [], [], {}

    def blank_row():
        return ["" for _ in KB_COLUMNS]

    used_surfaces: set = set()

    def add(eid, etype, name, origin, country, links, alt_names):
        # every surface (canonical or alt) maps to exactly ONE entity:
        # colliding surfaces (e.g. two orgs sharing an acronym) make the
        # gold labels ambiguous — a deterministic resolver (ours or the
        # reference's) merges them and gets graded on a coin flip
        used_surfaces.add(name.lower())
        alt_names = [
            a for a in alt_names
            if a.lower() != name.lower() and a.lower() not in used_surfaces
        ]
        for a in alt_names:
            used_surfaces.add(a.lower())
        row = blank_row()
        row[0], row[1], row[2], row[3], row[4] = origin, etype, eid, name, name
        row[12] = country
        if etype in ("GPE", "LOC"):
            row[5] = f"{rng.uniform(-60, 60):.4f}"
            row[6] = f"{rng.uniform(-150, 150):.4f}"
            row[9] = "PPL"
            row[10] = "populated place"
            row[21] = str(rng.randrange(1000, 5_000_000))
        if etype == "PER":
            row[26] = country
            row[27] = rng.choice(["minister", "director", "president"])
        if etype == "ORG":
            row[39] = country
        row[46] = "|".join(links)
        entities.append(row)
        for a in alt_names:
            alts.append((eid, a))
        meta[eid] = {"type": etype, "name": name, "alts": list(alt_names)}

    eid = 1
    used = set()

    def unique_name(gen, widen):
        """Rejection-sample from `gen`, escaping to `widen` once the base
        pool is (nearly) exhausted — the base PER pool is only
        |FIRST|x|LAST| = 480 combos, so large KBs would otherwise loop
        forever. Deterministic (driven by `rng`) and guaranteed to
        terminate: the final escape appends a never-reused counter."""
        name = gen()
        tries = 0
        while name in used:
            tries += 1
            if tries <= 30:
                name = gen()
            elif tries <= 120:
                name = widen()
            else:
                name = f"{widen()} {len(used)}"
        used.add(name)
        return name

    import string as _string

    for _ in range(n_per):
        name = unique_name(
            lambda: f"{rng.choice(FIRST)} {rng.choice(LAST)}",
            lambda: (
                f"{rng.choice(FIRST)} "
                f"{rng.choice(_string.ascii_uppercase)}. {rng.choice(LAST)}"
            ),
        )
        alt = [_misspell(rng, name)]
        links = []
        if rng.random() < 0.5:
            links = ["http://en.wikipedia.org/wiki/" + name.replace(" ", "_")]
        add(f"E{eid:05d}", "PER", name, "WLL", rng.choice(COUNTRIES), links, alt)
        eid += 1
    for _ in range(n_org):
        name = unique_name(
            lambda: f"{rng.choice(ORG_A)} {rng.choice(ORG_B)} {rng.choice(ORG_C)}",
            lambda: (
                f"{rng.choice(ORG_A)} {rng.choice(ORG_B)} {rng.choice(ORG_C)} "
                f"of {rng.choice(CITY)}"
            ),
        )
        alt = [_acronym(name), _misspell(rng, name)]
        links = ["http://en.wikipedia.org/wiki/" + name.replace(" ", "_")]
        add(f"E{eid:05d}", "ORG", name, "APB", rng.choice(COUNTRIES), links, alt)
        eid += 1
    gpe_prefix = ["", "New ", "East ", "West ", "North ", "South ", "Upper ",
                  "Lower ", "Old ", "Port "]
    for i in range(n_gpe):
        base = CITY[i % len(CITY)]
        series = i // len(CITY)
        name = f"{gpe_prefix[series % len(gpe_prefix)]}{base}"
        if series >= len(gpe_prefix):
            name = f"{name} {series // len(gpe_prefix)}"
        alt = [_misspell(rng, name)]
        links = []
        if rng.random() < 0.7:
            links = ["http://en.wikipedia.org/wiki/" + name.replace(" ", "_")]
        add(f"E{eid:05d}", "GPE", name, "GEO", rng.choice(COUNTRIES), links, alt)
        eid += 1
    for i in range(n_loc):
        base = LOCS[i % len(LOCS)]
        series = i // len(LOCS)
        name = base if series == 0 else f"{base} {series}"
        add(f"E{eid:05d}", "LOC", name, "GEO", rng.choice(COUNTRIES), [], [])
        eid += 1
    return entities, alts, meta


def build_docs(rng: random.Random, meta: dict, n_docs: int,
               misspell_prob: float = 0.0):
    """Generate documents mentioning KB entities (by canonical name, alt
    name or acronym) plus NIL mentions (invented names). Returns
    (page_rows, conll_rows, gt_rows, mention_records)."""
    pages, conll, gt = [], [], []
    mention_records = []  # (mention_key, entity_or_nil_cluster, block_key)
    ids = sorted(meta.keys())
    doc_tokens_choices = ["_NW_", "_DF_", "_WL_", "_SN_", "_RF_"]
    # NIL identities must be clearly out-of-KB: a single trailing char
    # (old scheme) left them one edit from real entities — an undecidable
    # case that even the reference's edit-distance resolver borderlines.
    # "-gar/-sky" suffixes keep them name-like but 3+ edits from any KB
    # name.
    nil_names = [
        f"{rng.choice(FIRST)}gar {rng.choice(LAST)}sky" for _ in range(12)
    ]

    for d in range(n_docs):
        dt_token = doc_tokens_choices[d % len(doc_tokens_choices)]
        url = f"http://news.example.com/en/IL5{dt_token}{d:06d}.html"
        n_ment = rng.randrange(3, 9)
        tokens, tags = [], []
        mentions = []  # (start_tok, n_tok, type, eid, surface)
        for _ in range(n_ment):
            # filler prefix
            for _ in range(rng.randrange(2, 6)):
                tokens.append(rng.choice(FILLER))
                tags.append("O")
            if rng.random() < 0.15:
                surface = rng.choice(nil_names)
                etype = "PER"
                ref = "NIL:" + surface.lower()
            else:
                ref = rng.choice(ids)
                e = meta[ref]
                etype = e["type"]
                choices = [e["name"]] + e["alts"]
                surface = rng.choice(choices)
                # optional surface noise: exercises the fuzzy-blocking +
                # edit-distance path and diversifies the probe-key space
                # (bench scaling workload); off by default so exact-path
                # tests stay deterministic
                if misspell_prob and rng.random() < misspell_prob:
                    surface = _misspell(rng, surface)
            stoks = surface.split()
            mentions.append((len(tokens), len(stoks), etype, ref, surface))
            for j, t in enumerate(stoks):
                tokens.append(t)
                tags.append(("B-" if j == 0 else "I-") + etype)
        # trailing filler
        for _ in range(rng.randrange(2, 6)):
            tokens.append(rng.choice(FILLER))
            tags.append("O")

        # char offsets: 1-based inclusive, single spaces between tokens
        text = " ".join(tokens)
        pos = 1
        offs = []
        for t in tokens:
            offs.append((pos, pos + len(t) - 1))
            pos += len(t) + 1
        ts = _dt.datetime(2025, 1, 1) + _dt.timedelta(minutes=d)
        pages.append((url, ts, bytearray(wrap_text_as_html(text, url)), text, "eng"))
        sent = 0
        for i, (t, tag) in enumerate(zip(tokens, tags)):
            conll.append((t, tag, url, offs[i][0], offs[i][1], f"segment-{sent}", int(offs[i][0])))
            if t.endswith("."):
                sent += 1
        for (st, ntok, etype, ref, surface) in mentions:
            c_start = offs[st][0]
            c_stop = offs[st + ntok - 1][1]
            key = f"{url}:{c_start}-{c_stop}"
            if ref.startswith("NIL:"):
                kb_id = "NIL" + format(abs(hash_stable(ref)) % 100000, "05d")
            else:
                kb_id = ref
            gt.append(
                ("gold", key, surface, f"{url}:{c_start}-{c_stop}", kb_id,
                 etype, "NAM", 1.0)
            )
            block_key = surface.split()[-1].lower()
            mention_records.append((key, kb_id, block_key))
    return pages, conll, gt, mention_records


def hash_stable(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def build_labeled_pairs(mention_records, max_pairs_per_key: int = 200):
    """Pairs of mentions sharing a blocking key, labeled same-entity (1)
    or not (0) — the pairwise-F1 surface (FIXTURES.md §7)."""
    by_key: dict[str, list] = {}
    for key, ref, block in mention_records:
        by_key.setdefault(block, []).append((key, ref))
    pairs = []
    for block, members in sorted(by_key.items()):
        members = sorted(members)[: int(max_pairs_per_key**0.5) * 2 + 20]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                ka, ra = members[i]
                kb, rb = members[j]
                pairs.append((ka, kb, block, 1 if ra == rb else 0))
    return pairs


def make_corpus(
    spark: SparkSession,
    n_docs: int = 60,
    seed: int = 42,
    misspell_prob: float = 0.0,
    kb_mult: int = 1,
) -> dict:
    rng = random.Random(seed)
    entities, alts, meta = build_kb(
        rng, n_per=40 * kb_mult, n_org=30 * kb_mult, n_gpe=24 * kb_mult,
        n_loc=6 * kb_mult,
    )
    pages, conll, gt, mention_records = build_docs(
        rng, meta, n_docs, misspell_prob=misspell_prob
    )
    pairs = build_labeled_pairs(mention_records)
    return {
        "pages": spark.createDataFrame(pages, PAGES),
        "conll": spark.createDataFrame(conll, CONLL),
        "kb_entities_raw": spark.createDataFrame(entities, KB_RAW),
        "kb_alt_names": spark.createDataFrame(
            alts, "entityid string, alternatename string"
        ),
        "ground_truth": spark.createDataFrame(gt, GROUND_TRUTH),
        "labeled_pairs": spark.createDataFrame(
            pairs, "key_a string, key_b string, block_key string, label int"
        ),
        "n_mentions": len(mention_records),
    }
