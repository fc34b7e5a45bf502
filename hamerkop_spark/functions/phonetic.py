"""Phonetic blocking keys (north_rule: Soundex + metaphone-family).

Soundex is native (`F.soundex`, JVM). NYSIIS and a Metaphone-style key are
pandas UDFs (Arrow-batched); both are deterministic pure functions so block
keys are stable across runs — a requirement for checkpoint/resume.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def soundex_key(c: Column) -> Column:
    """Native Soundex of the first token, uppercased."""
    first = F.upper(F.element_at(F.split(F.trim(c), r"\s+"), 1))
    return F.soundex(first)


#: letter -> soundex digit map ('0' = vowel/H/W/Y separator)
_SOUNDEX_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SOUNDEX_CODES = "01230120022455012623010202"


def soundex_portable(c: Column) -> Column:
    """Russell-variant Soundex built ONLY from dialect-portable string ops
    (upper/translate/regexp_replace-without-backreferences/substr/rpad) so
    a SQL oracle can compute the identical key: uppercase, keep A-Z, map
    letters to digits, collapse adjacent equal digits, drop the first
    position, remove separators, first-letter + 3 digits zero-padded.

    Differs from American Soundex (F.soundex) only in the H/W rule: here
    H/W separate equal codes like vowels do (ASHCRAFT -> A226, not A261).
    Empty / letterless input yields ''."""
    letters = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    mapped = F.translate(letters, _SOUNDEX_ALPHA, _SOUNDEX_CODES)
    for d in "123456":
        mapped = F.regexp_replace(mapped, d + "{2,}", d)
    tail = F.substring(mapped, 2, 1 << 30)
    digits = F.regexp_replace(tail, "0", "")
    code = F.concat(
        F.substring(letters, 1, 1), F.rpad(F.substring(digits, 1, 3), 3, "0")
    )
    return F.when(F.length(letters) == 0, F.lit("")).otherwise(code)


def soundex_portable_sql(expr: str) -> str:
    """The DuckDB twin of soundex_portable over SQL expression `expr` —
    generated from the same constants so the two cannot drift."""
    s = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    m = f"translate({s}, '{_SOUNDEX_ALPHA}', '{_SOUNDEX_CODES}')"
    for d in "123456":
        m = f"regexp_replace({m}, '{d}{{2,}}', '{d}', 'g')"
    digits = f"regexp_replace(substr({m}, 2), '0', '', 'g')"
    code = f"substr({s}, 1, 1) || rpad(substr({digits}, 1, 3), 3, '0')"
    return f"CASE WHEN length({s}) = 0 THEN '' ELSE {code} END"


_VOWELS = set("AEIOU")


def nysiis_py(name: str) -> str:
    """NYSIIS phonetic code (standard algorithm), ASCII letters only."""
    s = "".join(ch for ch in name.upper() if ch.isalpha())
    if not s:
        return ""
    # initial substitutions
    for pre, rep in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
                     ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")):
        if s.startswith(pre):
            s = rep + s[len(pre):]
            break
    for suf, rep in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                     ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if s.endswith(suf):
            s = s[: -len(suf)] + rep
            break
    key = s[0]
    i = 1
    prev = s[0]
    while i < len(s):
        ch = s[i]
        if s[i : i + 2] == "EV":
            ch2, skip = "AF", 2
        elif ch in _VOWELS:
            ch2, skip = "A", 1
        elif ch == "Q":
            ch2, skip = "G", 1
        elif ch == "Z":
            ch2, skip = "S", 1
        elif ch == "M":
            ch2, skip = "N", 1
        elif s[i : i + 2] == "KN":
            ch2, skip = "N", 2
        elif ch == "K":
            ch2, skip = "C", 1
        elif s[i : i + 3] == "SCH":
            ch2, skip = "SSS", 3
        elif s[i : i + 2] == "PH":
            ch2, skip = "FF", 2
        elif ch == "H" and (prev not in _VOWELS or (i + 1 < len(s) and s[i + 1] not in _VOWELS)):
            # replacement inherits the previous char's *mapped* value:
            # vowels have all been folded to A
            ch2, skip = ("A" if prev in _VOWELS else prev), 1
        elif ch == "W" and prev in _VOWELS:
            ch2, skip = "A", 1
        else:
            ch2, skip = ch, 1
        for c2 in ch2:
            if c2 != key[-1]:
                key += c2
        prev = ch
        i += skip
    if key.endswith("S") and len(key) > 1:
        key = key[:-1]
    if key.endswith("AY"):
        key = key[:-2] + "Y"
    if key.endswith("A") and len(key) > 1:
        key = key[:-1]
    return key


def metaphone_py(name: str, maxlen: int = 8) -> str:
    """Compact Metaphone-style key (Lawrence Philips' Metaphone, simplified
    but deterministic): used as the second phonetic key family alongside
    Soundex. Not a full Double-Metaphone; block-key quality validated in
    tests by grouping known spelling variants."""
    s = "".join(ch for ch in name.upper() if ch.isalpha())
    if not s:
        return ""
    # drop silent starters
    for pre in ("AE", "GN", "KN", "PN", "WR"):
        if s.startswith(pre):
            s = s[1:]
            break
    if s.startswith("X"):
        s = "S" + s[1:]
    if s.startswith("WH"):
        s = "W" + s[2:]
    out = []
    i = 0
    n = len(s)
    while i < n and len(out) < maxlen:
        ch = s[i]
        nxt = s[i + 1] if i + 1 < n else ""
        prev = s[i - 1] if i > 0 else ""
        if ch in "AEIOU":
            if i == 0:
                out.append(ch)
            i += 1
            continue
        if ch == nxt and ch != "C":
            i += 1
            continue
        if ch == "B":
            if not (i == n - 1 and prev == "M"):
                out.append("B")
        elif ch == "C":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif ch == "D":
            if nxt == "G" and i + 2 < n and s[i + 2] in "IEY":
                out.append("J")
                i += 1
            else:
                out.append("T")
        elif ch == "G":
            if nxt == "H":
                if i + 2 >= n:
                    i += 1  # silent GH at end -> often silent
                else:
                    out.append("K")
                    i += 1
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif ch == "H":
            if prev in "AEIOU" and nxt not in "AEIOU":
                pass  # silent
            else:
                out.append("H")
        elif ch in "FJLMNR":
            out.append(ch)
        elif ch == "K":
            if prev != "C":
                out.append("K")
        elif ch == "P":
            out.append("F" if nxt == "H" else "P")
            if nxt == "H":
                i += 1
        elif ch == "Q":
            out.append("K")
        elif ch == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif s[i : i + 3] in ("SIO", "SIA"):
                out.append("X")
            else:
                out.append("S")
        elif ch == "T":
            if nxt == "H":
                out.append("0")
                i += 1
            elif s[i : i + 3] in ("TIO", "TIA"):
                out.append("X")
            else:
                out.append("T")
        elif ch == "V":
            out.append("F")
        elif ch == "W":
            if nxt in "AEIOU":
                out.append("W")
        elif ch == "X":
            out.append("KS")
        elif ch == "Y":
            if nxt in "AEIOU":
                out.append("Y")
        elif ch == "Z":
            out.append("S")
        i += 1
    return "".join(out)[:maxlen]


@F.pandas_udf(StringType())
def nysiis_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(nysiis_py)


@F.pandas_udf(StringType())
def metaphone_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(metaphone_py)
