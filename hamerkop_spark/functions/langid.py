"""Language identification as native column expressions.

The reference wraps the `langdetect` package per document
(hamerkop/lang.py:421-437) and normalizes ISO 639-1 -> 639-3
(lang.py:10-195). That package isn't a public dependency we can assume at
scale, and per-document Python is the slow path — so the engine ships a
deterministic native heuristic: Unicode-script profiling first, then
stopword-frequency voting among Latin-script languages. Pure Catalyst
(regexp counts + arithmetic), so it is also DuckDB-expressible for the
correctness oracle. Returns ISO 639-3 codes like the reference Lang enum
(lang.py:198-397).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# script -> (Java regex class, ISO 639-3 emitted when dominant)
SCRIPT_CLASSES = [
    ("cyrillic", r"[Ѐ-ӿ]", "rus"),
    ("arabic", r"[؀-ۿ]", "ara"),
    ("cjk", r"[一-鿿]", "cmn"),
    ("ethiopic", r"[ሀ-፿]", "amh"),
    ("sinhala", r"[඀-෿]", "sin"),
    ("oriya", r"[଀-୿]", "ori"),
]

# Latin-script stopword votes: token surrounded by spaces, counted by
# occurrence. Chosen to be high-frequency and mutually exclusive.
LATIN_STOPWORDS = {
    "eng": [" the ", " and ", " of ", " is "],
    "fra": [" le ", " la ", " les ", " et "],
    "spa": [" el ", " los ", " una ", " y "],
    "deu": [" der ", " die ", " und ", " ist "],
}
LATIN_ORDER = ["eng", "fra", "spa", "deu"]  # deterministic tie-break


def occurrences(c: Column, needle: str) -> Column:
    """Number of times `needle` occurs in the string (native)."""
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def script_char_count(c: Column, cls: str) -> Column:
    """Count of characters matching a regex character class."""
    return F.length(c) - F.length(F.regexp_replace(c, cls, ""))


def detect_lang(c: Column) -> Column:
    """ISO 639-3 language guess for a text column.

    Script dominance (>30% of chars) wins; otherwise Latin stopword vote;
    falls back to 'eng'. Deterministic, order-stable.
    """
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    total = F.greatest(F.length(c), F.lit(1))

    expr = None
    # stopword votes computed once
    votes = {
        lang: sum(
            (occurrences(padded, w) for w in words),
            F.lit(0),
        )
        for lang, words in LATIN_STOPWORDS.items()
    }
    best_latin = F.lit("eng")
    best_score = votes["eng"]
    for lang in LATIN_ORDER[1:]:
        cond = votes[lang] > best_score
        best_latin = F.when(cond, F.lit(lang)).otherwise(best_latin)
        best_score = F.when(cond, votes[lang]).otherwise(best_score)

    expr = best_latin
    for _, cls, iso in reversed(SCRIPT_CLASSES):
        expr = F.when(
            script_char_count(c, cls) * 10 > total * 3, F.lit(iso)
        ).otherwise(expr)
    return expr


# ISO 639-1 -> 639-3 for the codes the reference enumerates most
# (lang.py:10-195, abridged to the languages this engine emits).
ISO1_TO_ISO3 = {
    "en": "eng", "fr": "fra", "es": "spa", "de": "deu", "ru": "rus",
    "ar": "ara", "zh": "cmn", "zh-cn": "cmn", "zh-tw": "cmn", "am": "amh",
    "si": "sin", "or": "ori", "ti": "tir", "om": "orm", "so": "som",
    "sw": "swa", "ha": "hau", "yo": "yor", "ig": "ibo", "pt": "por",
    "it": "ita", "nl": "nld", "pl": "pol", "tr": "tur", "fa": "fas",
    "hi": "hin", "bn": "ben", "ur": "urd", "ta": "tam", "te": "tel",
    "th": "tha", "vi": "vie", "id": "ind", "ms": "msa", "ja": "jpn",
    "ko": "kor", "uk": "ukr", "he": "heb", "el": "ell", "cs": "ces",
}


def normalize_lang_code(c: Column) -> Column:
    """639-1 -> 639-3 normalization (lang.py:390-397); 3-letter codes and
    unknowns pass through lowercased."""
    mapping = F.create_map(
        *[F.lit(x) for kv in ISO1_TO_ISO3.items() for x in kv]
    )
    low = F.lower(c)
    return F.coalesce(mapping[low], low)
