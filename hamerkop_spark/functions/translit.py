"""Romanization / transliteration (SURVEY.md §2.8 T9).

The reference shells out to the uroman Perl script per string
(hamerkop/string.py:135-155), skipping English and pure-ASCII inputs.
This engine ships a deterministic pure-python romanizer with the same
contract (None for English/ASCII, else best-effort Latin): NFKD
diacritic folding plus explicit Cyrillic/Greek tables; characters
without a mapping pass through. Executed as an Arrow-batched pandas UDF
with the ASCII short-circuit applied BEFORE the UDF (a `when` guard
keeps ASCII rows out of Python entirely — SURVEY.md §4 'ASCII
short-circuit').
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

CYRILLIC = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "y", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "yu", "я": "ya",
}
GREEK = {
    "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z", "η": "i",
    "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n", "ξ": "x",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t", "υ": "y",
    "φ": "f", "χ": "ch", "ψ": "ps", "ω": "o",
}

# Arabic script (incl. the Persian and Urdu extension letters). Short
# vowels are harakat — combining marks, dropped by the main loop exactly
# as uroman's output omits them for unvocalized text.
ARABIC = {
    "ا": "a", "ب": "b", "ت": "t", "ث": "th", "ج": "j", "ح": "h",
    "خ": "kh", "د": "d", "ذ": "dh", "ر": "r", "ز": "z", "س": "s",
    "ش": "sh", "ص": "s", "ض": "d", "ط": "t", "ظ": "z", "ع": "'",
    "غ": "gh", "ف": "f", "ق": "q", "ك": "k", "ل": "l", "م": "m",
    "ن": "n", "ه": "h", "و": "w", "ي": "y", "ء": "'", "آ": "a",
    "أ": "a", "ؤ": "'", "إ": "i", "ئ": "'", "ة": "h", "ى": "a",
    # Persian
    "پ": "p", "چ": "ch", "ژ": "zh", "گ": "g",
    # Urdu
    "ٹ": "t", "ڈ": "d", "ڑ": "r", "ں": "n", "ے": "e", "ک": "k",
    "ی": "y", "ھ": "h", "ہ": "h",
    "،": ",", "؟": "?", "؛": ";",
}

# Ge'ez (Ethiopic) is a syllabary: codepoints sit in series of 8
# (consonant x vowel order), so the table is generated, not hand-written.
# Orders: 1st(a-umlaut)->e, then u/i/a/ie, 6th (schwa/bare)->'', o, wa —
# the scheme that renders the common city/name forms (selam, adis abeba).
_ETHIOPIC_SERIES = [
    (0x1200, "h"), (0x1208, "l"), (0x1210, "h"), (0x1218, "m"),
    (0x1220, "s"), (0x1228, "r"), (0x1230, "s"), (0x1238, "sh"),
    (0x1240, "q"), (0x1250, "q"), (0x1260, "b"), (0x1268, "v"),
    (0x1270, "t"), (0x1278, "ch"), (0x1280, "h"), (0x1290, "n"),
    (0x1298, "ny"), (0x12A0, ""), (0x12A8, "k"), (0x12B8, "kh"),
    (0x12C8, "w"), (0x12D0, ""), (0x12D8, "z"), (0x12E0, "zh"),
    (0x12E8, "y"), (0x12F0, "d"), (0x12F8, "dd"), (0x1300, "j"),
    (0x1308, "g"), (0x1318, "gg"), (0x1320, "t"), (0x1328, "ch"),
    (0x1330, "p"), (0x1338, "ts"), (0x1340, "ts"), (0x1348, "f"),
    (0x1350, "p"),
]
_ETHIOPIC_ORDERS = ["e", "u", "i", "a", "ie", "", "o", "oa"]


def _ethiopic_table() -> dict:
    table = {}
    for base, cons in _ETHIOPIC_SERIES:
        for order, vowel in enumerate(_ETHIOPIC_ORDERS):
            ch = chr(base + order)
            # vowel-carrier series (glottal/pharyngeal) emit the vowel
            # alone; their 1st and 6th orders read as a / i
            if cons == "":
                syl = {0: "a", 5: "i"}.get(order, vowel)
            else:
                syl = cons + vowel
            table[ch] = syl
    return table


_TABLE = {**CYRILLIC, **GREEK, **ARABIC, **_ethiopic_table()}

# --- Brahmic abugidas (Sinhala, Odia): consonant carries an inherent
# 'a' unless followed by a virama (kills the vowel) or a dependent
# vowel sign (replaces it). Independent vowels go straight in _ABUGIDA
# standalone entries via VOWEL_SIGNS fall-through.
SINHALA_CONS = {
    "ක": "k", "ඛ": "kh", "ග": "g", "ඝ": "gh", "ඞ": "ng", "ඟ": "ng",
    "ච": "ch", "ඡ": "chh", "ජ": "j", "ඣ": "jh", "ඤ": "ny", "ඥ": "gn",
    "ට": "t", "ඨ": "th", "ඩ": "d", "ඪ": "dh", "ණ": "n", "ඬ": "nd",
    "ත": "t", "ථ": "th", "ද": "d", "ධ": "dh", "න": "n", "ඳ": "nd",
    "ප": "p", "ඵ": "ph", "බ": "b", "භ": "bh", "ම": "m", "ඹ": "mb",
    "ය": "y", "ර": "r", "ල": "l", "ව": "v", "ශ": "sh", "ෂ": "sh",
    "ස": "s", "හ": "h", "ළ": "l", "ෆ": "f",
}
ORIYA_CONS = {
    "କ": "k", "ଖ": "kh", "ଗ": "g", "ଘ": "gh", "ଙ": "ng",
    "ଚ": "ch", "ଛ": "chh", "ଜ": "j", "ଝ": "jh", "ଞ": "ny",
    "ଟ": "t", "ଠ": "th", "ଡ": "d", "ଢ": "dh", "ଣ": "n",
    "ତ": "t", "ଥ": "th", "ଦ": "d", "ଧ": "dh", "ନ": "n",
    "ପ": "p", "ଫ": "ph", "ବ": "b", "ଭ": "bh", "ମ": "m",
    "ଯ": "j", "ୟ": "y", "ର": "r", "ଲ": "l", "ଳ": "l",
    "ଵ": "v", "ୱ": "w", "ଶ": "sh", "ଷ": "sh", "ସ": "s", "ହ": "h",
}
_ABUGIDA_CONS = {**SINHALA_CONS, **ORIYA_CONS}
# Dependent vowel signs: only these may replace a consonant's inherent
# 'a'. Independent vowels open their own syllable and live in
# STANDALONE, which also carries anusvara/visarga.
DEP_SIGNS = {
    # Sinhala
    "ා": "a", "ැ": "ae", "ෑ": "ae", "ි": "i", "ී": "i", "ු": "u",
    "ූ": "u", "ෘ": "ru", "ෙ": "e", "ේ": "e", "ෛ": "ai", "ො": "o",
    "ෝ": "o", "ෞ": "au",
    # Odia
    "ା": "a", "ି": "i", "ୀ": "i", "ୁ": "u", "ୂ": "u", "ୃ": "ru",
    "େ": "e", "ୈ": "ai", "ୋ": "o", "ୌ": "au",
}
STANDALONE = {
    # Sinhala independent vowels
    "අ": "a", "ආ": "a", "ඇ": "ae", "ඈ": "ae", "ඉ": "i", "ඊ": "i",
    "උ": "u", "ඌ": "u", "එ": "e", "ඒ": "e", "ඓ": "ai", "ඔ": "o",
    "ඕ": "o", "ඖ": "au",
    # Odia independent vowels
    "ଅ": "a", "ଆ": "a", "ଇ": "i", "ଈ": "i", "ଉ": "u", "ଊ": "u",
    "ଋ": "ru", "ଏ": "e", "ଐ": "ai", "ଓ": "o", "ଔ": "au",
    # anusvara / visarga / candrabindu
    "ං": "n", "ඃ": "h", "ଂ": "n", "ଃ": "h", "ଁ": "n",
}
VIRAMA = {"්", "୍"}


def romanize_py(s: str) -> str:
    """Best-effort deterministic romanization of one string.

    NFC keeps two-part Indic vowel signs composed (ො must not split
    into e + aa); table misses fall back to per-char NFKD so accented
    Latin/Greek/Cyrillic still fold (é -> e, ή -> η -> i). Abugida
    consonants (Sinhala/Odia) look ahead past nuktas: virama suppresses
    the inherent 'a', a dependent vowel sign replaces it. ZWJ/ZWNJ
    (ligature controls) are dropped."""
    chars = unicodedata.normalize("NFC", s).replace("‌", "").replace(
        "‍", ""
    )
    out = []
    i, n = 0, len(chars)
    while i < n:
        ch = chars[i]
        if ch in _ABUGIDA_CONS:
            base = _ABUGIDA_CONS[ch]
            j = i + 1
            while (
                j < n
                and chars[j] not in DEP_SIGNS
                and chars[j] not in VIRAMA
                and unicodedata.combining(chars[j])
            ):
                j += 1  # nukta and friends sit between consonant and sign
            nxt = chars[j] if j < n else None
            if nxt in VIRAMA:
                out.append(base)
                i = j + 1
                continue
            if nxt in DEP_SIGNS:
                out.append(base + DEP_SIGNS[nxt])
                i = j + 1
                continue
            out.append(base + "a")
            i = j
            continue
        if ch in STANDALONE:
            out.append(STANDALONE[ch])
            i += 1
            continue
        if ch in DEP_SIGNS:
            out.append(DEP_SIGNS[ch])
            i += 1
            continue
        if ch in VIRAMA:
            i += 1
            continue
        if unicodedata.combining(ch):
            i += 1
            continue
        low = ch.lower()
        if low in _TABLE:
            rep = _TABLE[low]
            out.append(rep.capitalize() if ch.isupper() and rep else rep)
        else:
            # per-char NFKD: fold diacritics, then retry the table once
            for sub in unicodedata.normalize("NFKD", ch):
                if unicodedata.combining(sub):
                    continue
                sl = sub.lower()
                if sl in _TABLE:
                    rep = _TABLE[sl]
                    out.append(
                        rep.capitalize() if sub.isupper() and rep else rep
                    )
                else:
                    out.append(sub)
        i += 1
    return "".join(out)


@F.pandas_udf(StringType())
def romanize_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: romanize_py(x) if x is not None else None)


def romanize(string_col: Column, lang_col: Column) -> Column:
    """The T9 projector function for preprocess.name_projector: None for
    English docs and pure-ASCII strings (string.py:145-150) — the guard
    is a native `when`, so those rows never reach the pandas UDF."""
    is_ascii = string_col.rlike(r"^[\x00-\x7F]*$")
    return F.when(
        (lang_col == "eng") | is_ascii, F.lit(None).cast("string")
    ).otherwise(romanize_udf(string_col))
