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

# script -> (Java regex class, ISO 639-3 emitted when dominant, threshold
# in tenths of the text length). Earlier entries take precedence: kana
# outranks the unified-CJK block (Japanese text mixes kanji with kana, so
# any substantial kana presence decides jpn before the kanji share can
# vote cmn) with a correspondingly lower threshold.
SCRIPT_CLASSES = [
    ("kana", "[぀-ヿ]", "jpn", 1),
    ("hangul", "[가-힣ᄀ-ᇿ]", "kor", 3),
    ("cyrillic", "[Ѐ-ӿ]", "rus", 3),
    ("arabic", "[؀-ۿ]", "ara", 3),
    # zho (not cmn): normalize_lang_code folds zh -> zho per the
    # reference's table, and the detector must agree with normalized
    # metadata codes for Chinese
    ("cjk", "[一-鿿]", "zho", 3),
    ("ethiopic", "[ሀ-፿]", "amh", 3),
    ("sinhala", "[඀-෿]", "sin", 3),
    ("oriya", "[଀-୿]", "ori", 3),
    ("greek", "[Ͱ-Ͽ]", "ell", 3),
    ("hebrew", "[֐-׿]", "heb", 3),
    ("devanagari", "[ऀ-ॿ]", "hin", 3),
    ("bengali", "[ঀ-৿]", "ben", 3),
    ("gurmukhi", "[਀-੿]", "pan", 3),
    ("gujarati", "[઀-૿]", "guj", 3),
    ("tamil", "[஀-௿]", "tam", 3),
    ("telugu", "[ఀ-౿]", "tel", 3),
    ("kannada", "[ಀ-೿]", "kan", 3),
    ("malayalam", "[ഀ-ൿ]", "mal", 3),
    ("thai", "[฀-๿]", "tha", 3),
    ("lao", "[຀-໿]", "lao", 3),
    ("tibetan", "[ༀ-࿿]", "bod", 3),
    ("myanmar", "[က-႟]", "mya", 3),
    ("georgian", "[Ⴀ-ჿ]", "kat", 3),
    ("armenian", "[԰-֏]", "hye", 3),
    ("khmer", "[ក-៿]", "khm", 3),
]

# Within-script refinements: when `script` wins, the presence of any
# marker character flips the verdict to the refined language. Ordered:
# the first matching refinement wins (Urdu's retroflex letters never
# appear in Persian, while Persian's پ/چ/ژ/گ DO appear in Urdu, so the
# Urdu check must run first).
SCRIPT_REFINEMENTS = {
    "cyrillic": [("[іїєґ]", "ukr")],  # і ї є ґ
    "arabic": [
        ("[ٹڈڑںے]", "urd"),  # ٹ ڈ ڑ ں ے
        ("[پچژگ]", "fas"),  # پ چ ژ گ
    ],
}

# Latin-script stopword votes: token surrounded by spaces, counted by
# occurrence. Chosen to be high-frequency within their language and
# rarely shared across this set; ties break deterministically by
# LATIN_ORDER position.
LATIN_STOPWORDS = {
    "eng": [" the ", " and ", " of ", " is "],
    "fra": [" le ", " la ", " les ", " et "],
    "spa": [" el ", " los ", " una ", " y "],
    "deu": [" der ", " die ", " und ", " ist "],
    "por": [" não ", " uma ", " os ", " do "],
    "ita": [" il ", " che ", " di ", " è "],
    "nld": [" het ", " een ", " van ", " niet "],
    "pol": [" się ", " nie ", " jest ", " w "],
    "tur": [" bir ", " ve ", " bu ", " için "],
    "vie": [" của ", " và ", " là ", " không "],
    "ind": [" yang ", " dan ", " di ", " ini "],
    "swa": [" ya ", " na ", " kwa ", " ni "],
    "ces": [" je ", " se ", " na ", " že "],
    "ron": [" și ", " este ", " să ", " în "],
    "hun": [" és ", " egy ", " nem ", " az "],
    "swe": [" och ", " att ", " det ", " är "],
    "dan": [" og ", " det ", " er ", " til "],
    "fin": [" ja ", " on ", " ei ", " että "],
}
LATIN_ORDER = [
    "eng", "fra", "spa", "deu", "por", "ita", "nld", "pol", "tur",
    "vie", "ind", "swa", "ces", "ron", "hun", "swe", "dan", "fin",
]  # deterministic tie-break


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

    Script dominance (per-script share threshold) wins, with marker-letter
    refinements inside Cyrillic (ukr) and Arabic script (urd/fas);
    otherwise Latin stopword vote over 18 languages; falls back to 'eng'.
    Deterministic, order-stable, pure Catalyst.
    """
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    total = F.greatest(F.length(c), F.lit(1))

    # Stopword votes computed once. Argmax via greatest + first-equal scan:
    # a running best_score when-chain would embed itself twice per
    # language (2^18 expression blowup — the lambda-CSE trap's cousin);
    # greatest keeps every vote subtree to two linear appearances.
    votes = {
        lang: sum(
            (occurrences(padded, w) for w in words),
            F.lit(0),
        )
        for lang, words in LATIN_STOPWORDS.items()
    }
    mx = F.greatest(*[votes[lang] for lang in LATIN_ORDER])
    best_latin = F.lit(LATIN_ORDER[-1])
    for lang in reversed(LATIN_ORDER[:-1]):
        best_latin = F.when(votes[lang] == mx, F.lit(lang)).otherwise(best_latin)

    expr = best_latin
    lowered = F.lower(c)  # marker classes are lowercase letters; the
    # script-share classes span both cases, but refinements must see
    # ALL-CAPS Ukrainian/Urdu text too
    for name, cls, iso, tenths in reversed(SCRIPT_CLASSES):
        verdict = F.lit(iso)
        for marker_cls, refined in reversed(SCRIPT_REFINEMENTS.get(name, [])):
            verdict = F.when(
                script_char_count(lowered, marker_cls) > 0, F.lit(refined)
            ).otherwise(verdict)
        expr = F.when(
            script_char_count(c, cls) * 10 > total * tenths, verdict
        ).otherwise(expr)
    return expr


# Complete ISO 639-1 -> 639-3 table (public ISO standard data; the
# reference carries the same standard table at lang.py:10-195). The
# langdetect-style regional codes zh-cn/zh-tw fold to zh first, as the
# reference does at lang.py:435-436.
ISO1_TO_ISO3 = {
    "ab": "abk", "aa": "aar", "af": "afr", "ak": "aka", "sq": "sqi",
    "am": "amh", "ar": "ara", "an": "arg", "hy": "hye", "as": "asm",
    "av": "ava", "ae": "ave", "ay": "aym", "az": "aze", "bm": "bam",
    "ba": "bak", "eu": "eus", "be": "bel", "bn": "ben", "bh": "bih",
    "bi": "bis", "bs": "bos", "br": "bre", "bg": "bul", "my": "mya",
    "ca": "cat", "ch": "cha", "ce": "che", "ny": "nya", "zh": "zho",
    "zh-cn": "zho", "zh-tw": "zho",
    "cv": "chv", "kw": "cor", "co": "cos", "cr": "cre", "hr": "hrv",
    "cs": "ces", "da": "dan", "dv": "div", "nl": "nld", "dz": "dzo",
    "en": "eng", "eo": "epo", "et": "est", "ee": "ewe", "fo": "fao",
    "fj": "fij", "fi": "fin", "fr": "fra", "ff": "ful", "gl": "glg",
    "ka": "kat", "de": "deu", "el": "ell", "gn": "grn", "gu": "guj",
    "ht": "hat", "ha": "hau", "he": "heb", "hz": "her", "hi": "hin",
    "ho": "hmo", "hu": "hun", "ia": "ina", "id": "ind", "ie": "ile",
    "ga": "gle", "ig": "ibo", "ik": "ipk", "io": "ido", "is": "isl",
    "it": "ita", "iu": "iku", "ja": "jpn", "jv": "jav", "kl": "kal",
    "kn": "kan", "kr": "kau", "ks": "kas", "kk": "kaz", "km": "khm",
    "ki": "kik", "rw": "kin", "ky": "kir", "kv": "kom", "kg": "kon",
    "ko": "kor", "ku": "kur", "kj": "kua", "la": "lat", "lb": "ltz",
    "lg": "lug", "li": "lim", "ln": "lin", "lo": "lao", "lt": "lit",
    "lu": "lub", "lv": "lav", "gv": "glv", "mk": "mkd", "mg": "mlg",
    "ms": "msa", "ml": "mal", "mt": "mlt", "mi": "mri", "mr": "mar",
    "mh": "mah", "mn": "mon", "na": "nau", "nv": "nav", "nb": "nob",
    "nd": "nde", "ne": "nep", "ng": "ndo", "nn": "nno", "no": "nor",
    "ii": "iii", "nr": "nbl", "oc": "oci", "oj": "oji", "cu": "chu",
    "om": "orm", "or": "ori", "os": "oss", "pa": "pan", "pi": "pli",
    "fa": "fas", "pl": "pol", "ps": "pus", "pt": "por", "qu": "que",
    "rm": "roh", "rn": "run", "ro": "ron", "ru": "rus", "sa": "san",
    "sc": "srd", "sd": "snd", "se": "sme", "sm": "smo", "sg": "sag",
    "sr": "srp", "gd": "gla", "sn": "sna", "si": "sin", "sk": "slk",
    "sl": "slv", "so": "som", "st": "sot", "es": "spa", "su": "sun",
    "sw": "swa", "ss": "ssw", "sv": "swe", "ta": "tam", "te": "tel",
    "tg": "tgk", "th": "tha", "ti": "tir", "bo": "bod", "tk": "tuk",
    "tl": "tgl", "tn": "tsn", "to": "ton", "tr": "tur", "ts": "tso",
    "tt": "tat", "tw": "twi", "ty": "tah", "ug": "uig", "uk": "ukr",
    "ur": "urd", "uz": "uzb", "ve": "ven", "vi": "vie", "vo": "vol",
    "wa": "wln", "cy": "cym", "wo": "wol", "fy": "fry", "xh": "xho",
    "yi": "yid", "yo": "yor", "za": "zha", "zu": "zul",
}


def normalize_lang_code(c: Column) -> Column:
    """639-1 -> 639-3 normalization (lang.py:390-397); 3-letter codes and
    unknowns pass through lowercased."""
    mapping = F.create_map(
        *[F.lit(x) for kv in ISO1_TO_ISO3.items() for x in kv]
    )
    low = F.lower(c)
    return F.coalesce(mapping[low], low)
