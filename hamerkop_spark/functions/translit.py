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
_TABLE = {**CYRILLIC, **GREEK}


def romanize_py(s: str) -> str:
    """Best-effort deterministic romanization of one string. NFKD first
    so accented Cyrillic/Greek (ή = η + tonos) decompose before the
    table lookup; combining marks are dropped (é -> e, ğ -> g)."""
    out = []
    for ch in unicodedata.normalize("NFKD", s):
        if unicodedata.combining(ch):
            continue
        low = ch.lower()
        if low in _TABLE:
            rep = _TABLE[low]
            out.append(rep.capitalize() if ch.isupper() and rep else rep)
        else:
            out.append(ch)
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
