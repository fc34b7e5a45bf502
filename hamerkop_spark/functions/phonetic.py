"""Phonetic blocking keys (north_rule: Soundex + metaphone-family).

Soundex is native (`F.soundex`, JVM). NYSIIS and a Metaphone-style key are
pandas UDFs (Arrow-batched); both are deterministic pure functions so block
keys are stable across runs — a requirement for checkpoint/resume.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def soundex_key(c: Column) -> Column:
    """Native Soundex of the first token, uppercased."""
    first = F.upper(F.element_at(F.split(F.trim(c), r"\s+"), 1))
    return F.soundex(first)


#: letter -> soundex digit map ('0' = vowel/H/W/Y separator)
_SOUNDEX_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_SOUNDEX_CODES = "01230120022455012623010202"


def soundex_portable(c: Column) -> Column:
    """Russell-variant Soundex built ONLY from dialect-portable string ops
    (upper/translate/regexp_replace-without-backreferences/substr/rpad) so
    a SQL oracle can compute the identical key: uppercase, keep A-Z, map
    letters to digits, collapse adjacent equal digits, drop the first
    position, remove separators, first-letter + 3 digits zero-padded.

    Differs from American Soundex (F.soundex) only in the H/W rule: here
    H/W separate equal codes like vowels do (ASHCRAFT -> A226, not A261).
    Empty / letterless input yields ''.

    Case folding is ASCII-only (translate a-z -> A-Z), NOT upper():
    Java's upper('ß') expands to 'SS' while DuckDB's yields 'ẞ'
    (stripped), so a upper()-based twin diverges on any name carrying
    ß — the one locale-sensitive crack in an otherwise portable op."""
    letters = F.regexp_replace(
        F.translate(c, _ASCII_LOWER, _SOUNDEX_ALPHA), "[^A-Z]", ""
    )
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
    generated from the same constants so the two cannot drift. ASCII
    translate-based case fold, NOT upper() (see soundex_portable)."""
    s = (
        f"regexp_replace(translate({expr}, '{_ASCII_LOWER}', "
        f"'{_SOUNDEX_ALPHA}'), '[^A-Z]', '', 'g')"
    )
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


_DM_VOWELS = "AEIOUY"


def _dm_slavo_germanic(s: str) -> bool:
    return any(x in s for x in ("W", "K", "CZ", "WITZ"))


def double_metaphone_py(name: str, maxlen: int = 8) -> tuple[str, str]:
    """Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000):
    returns (primary, secondary) keys; the secondary equals the primary
    unless an ambiguous rule fired (anglicized vs continental readings).
    ASCII letters only; non-letters are stripped first.

    The reference has no phonetic index — this is a north-rule key
    family; published test vectors in tests/test_textdist_phonetic.py."""
    import re as _re

    s = _re.sub(
        r"\s+",
        " ",
        "".join(
            ch for ch in name.upper() if "A" <= ch <= "Z" or ch.isspace()
        ),
    ).strip()
    n = len(s)
    if n == 0:
        return ("", "")
    sg = _dm_slavo_germanic(s)
    # trailing-space padding like the original C: out-of-bounds reads see
    # ' ', so boundary sets that include a space ("LRNMBHFVW ") treat
    # word-end as a boundary and sets without one ("EIY") reject it
    sp = s + "     "
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, a: str | None = None) -> None:
        pri.append(p)
        sec.append(p if a is None else a)

    def at(j: int) -> str:
        return sp[j] if 0 <= j < len(sp) else " "

    def vowel(j: int) -> bool:
        return at(j) in _DM_VOWELS

    def match(j: int, *opts: str) -> bool:
        return j >= 0 and any(sp[j : j + len(o)] == o for o in opts)

    i = 0
    # silent starters
    if match(0, "GN", "KN", "PN", "WR", "PS"):
        i = 1
    if at(0) == "X":
        add("S")
        i = 1
    while i < n and (len(pri) < maxlen or len(sec) < maxlen):
        ch = s[i]
        if ch in _DM_VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue
        if ch == "B":
            add("P")
            i += 2 if at(i + 1) == "B" else 1
            continue
        if ch == "C":
            # germanic -MACHER etc.
            if i > 1 and not vowel(i - 2) and match(i - 1, "ACH") and (
                at(i + 2) != "I" and (at(i + 2) != "E" or match(i - 2, "BACHER", "MACHER"))
            ):
                add("K")
                i += 2
                continue
            if i == 0 and match(i, "CAESAR"):
                add("S")
                i += 2
                continue
            if match(i, "CHIA"):
                add("K")
                i += 2
                continue
            if match(i, "CH"):
                if i > 0 and match(i, "CHAE"):
                    add("K", "X")
                    i += 2
                    continue
                # greek-style initial CH: CHARAC, CHYM, CHOR...
                if i == 0 and (
                    match(1, "HARAC", "HARIS")
                    or match(1, "HOR", "HYM", "HIA", "HEM")
                ) and not match(0, "CHORE"):
                    add("K")
                    i += 2
                    continue
                # germanic / '-ACH-' context
                if (
                    match(0, "VAN ", "VON ", "SCH")
                    or match(i - 2, "ORCHES", "ARCHIT", "ORCHID")
                    or at(i + 2) in ("T", "S")
                    or (
                        (at(i - 1) in "AOUE" or i == 0)
                        and at(i + 2) in "LRNMBHFVW "
                    )
                ):
                    add("K")
                else:
                    if i > 0:
                        if match(0, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            if match(i, "CZ") and not match(i - 2, "WICZ"):
                add("S", "X")
                i += 2
                continue
            if match(i + 1, "CIA"):
                add("X")
                i += 3
                continue
            if match(i, "CC") and not (i == 1 and at(0) == "M"):
                if at(i + 2) in "IEH" and not match(i + 2, "HU"):
                    # bellocchio / accident
                    if (i == 1 and at(0) == "A") or match(i - 1, "UCCEE", "UCCES"):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                    continue
                add("K")
                i += 2
                continue
            if match(i, "CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if match(i, "CI", "CE", "CY"):
                if match(i, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if match(i + 1, " C", " Q", " G"):
                i += 3
            elif at(i + 1) in "CKQ" and not match(i + 1, "CE", "CI"):
                i += 2
            else:
                i += 1
            continue
        if ch == "D":
            if match(i, "DG"):
                if at(i + 2) in "IEY":
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
                continue
            add("T")
            i += 2 if match(i, "DT", "DD") else 1
            continue
        if ch == "F":
            add("F")
            i += 2 if at(i + 1) == "F" else 1
            continue
        if ch == "G":
            if at(i + 1) == "H":
                if i > 0 and not vowel(i - 1):
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    if at(i + 2) == "I":
                        add("J")
                    else:
                        add("K")
                    i += 2
                    continue
                # silent GH (-ugh-, -augh-...)
                if (
                    (i > 1 and at(i - 2) in "BHD")
                    or (i > 2 and at(i - 3) in "BHD")
                    or (i > 3 and at(i - 4) in "BH")
                ):
                    i += 2
                    continue
                if i > 2 and at(i - 1) == "U" and at(i - 3) in "CGLRT":
                    add("F")  # laugh, cough
                elif i > 0 and at(i - 1) != "I":
                    add("K")
                i += 2
                continue
            if at(i + 1) == "N":
                if i == 1 and vowel(0) and not sg:
                    add("KN", "N")
                elif not match(i + 2, "EY") and at(i + 1) != "Y" and not sg:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if match(i + 1, "LI") and not sg:
                add("KL", "L")
                i += 2
                continue
            if i == 0 and (
                at(i + 1) == "Y"
                or match(i + 1, "ES", "EP", "EB", "EL", "EY", "IB", "IL",
                         "IN", "IE", "EI", "ER")
            ):
                add("K", "J")
                i += 2
                continue
            if (match(i + 1, "ER") or at(i + 1) == "Y") and not match(
                0, "DANGER", "RANGER", "MANGER"
            ) and at(i - 1) not in "EI" and not match(i - 1, "RGY", "OGY"):
                add("K", "J")
                i += 2
                continue
            if at(i + 1) in "EIY" or match(i - 1, "AGGI", "OGGI"):
                if match(0, "VAN ", "VON ", "SCH") or match(i + 1, "ET"):
                    add("K")
                elif match(i + 1, "IER "):
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if at(i + 1) == "G" else 1
            continue
        if ch == "H":
            if (i == 0 or vowel(i - 1)) and vowel(i + 1):
                add("H")
                i += 2
            else:
                i += 1
            continue
        if ch == "J":
            if match(i, "JOSE") or match(0, "SAN "):
                if (i == 0 and at(i + 4) == " ") or match(0, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0:
                add("J", "A")
            elif vowel(i - 1) and not sg and at(i + 1) in "AO":
                add("J", "H")
            elif i == n - 1:
                add("J", "")
            elif at(i + 1) not in "LTKSNMBZ" and at(i - 1) not in "SKL":
                add("J")
            i += 2 if at(i + 1) == "J" else 1
            continue
        if ch == "K":
            add("K")
            i += 2 if at(i + 1) == "K" else 1
            continue
        if ch == "L":
            if at(i + 1) == "L":
                # spanish-style -ILLO/-ILLA/-ALLE
                if (
                    i == n - 3 and match(i - 1, "ILLO", "ILLA", "ALLE")
                ) or (
                    (match(n - 2, "AS", "OS") or at(n - 1) in "AO")
                    and match(i - 1, "ALLE")
                ):
                    add("L", "")
                    i += 2
                    continue
                add("L")
                i += 2
                continue
            add("L")
            i += 1
            continue
        if ch == "M":
            add("M")
            if (match(i - 1, "UMB") and (i + 1 == n - 1 or match(i + 2, "ER"))) or at(
                i + 1
            ) == "M":
                i += 2
            else:
                i += 1
            continue
        if ch == "N":
            add("N")
            i += 2 if at(i + 1) == "N" else 1
            continue
        if ch == "P":
            if at(i + 1) == "H":
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if at(i + 1) in "PB" else 1
            continue
        if ch == "Q":
            add("K")
            i += 2 if at(i + 1) == "Q" else 1
            continue
        if ch == "R":
            # french -IER/-IERS endings: silent primary R
            if (
                i == n - 1
                and not sg
                and match(i - 2, "IER")
                and not match(i - 4, "ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            i += 2 if at(i + 1) == "R" else 1
            continue
        if ch == "S":
            if match(i - 1, "ISL", "YSL"):  # island, carlysle
                i += 1
                continue
            if i == 0 and match(i, "SUGAR"):
                add("X", "S")
                i += 1
                continue
            if match(i, "SH"):
                if match(i + 1, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                i += 2
                continue
            if match(i, "SIO", "SIA"):
                if not sg:
                    add("S", "X")
                else:
                    add("S")
                i += 3
                continue
            if (i == 0 and at(i + 1) in "MNLW") or at(i + 1) == "Z":
                add("S", "X")
                i += 2 if at(i + 1) == "Z" else 1
                continue
            if match(i, "SC"):
                if at(i + 2) == "H":
                    if match(i + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if match(i + 3, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and not vowel(3) and at(3) != "W":
                            add("X", "S")
                        else:
                            add("X")
                    i += 3
                    continue
                if at(i + 2) in "IEY":
                    add("S")
                else:
                    add("SK")
                i += 3
                continue
            if i == n - 1 and match(i - 2, "AIS", "OIS"):
                add("", "S")  # french louis / beaumarchais
            else:
                add("S")
            i += 2 if at(i + 1) in "SZ" else 1
            continue
        if ch == "T":
            if match(i, "TION", "TIA", "TCH"):
                add("X")
                i += 3
                continue
            if match(i, "TH") or match(i, "TTH"):
                if match(i + 2, "OM", "AM") or match(0, "VAN ", "VON ", "SCH"):
                    add("T")
                else:
                    add("0", "T")
                i += 2
                continue
            add("T")
            i += 2 if match(i, "TT", "TD") else 1
            continue
        if ch == "V":
            add("F")
            i += 2 if at(i + 1) == "V" else 1
            continue
        if ch == "W":
            if match(i, "WR"):
                add("R")
                i += 2
                continue
            if i == 0 and (vowel(i + 1) or match(i, "WH")):
                if vowel(i + 1):
                    add("A", "F")
                else:
                    add("A")
                i += 1
                continue
            if (
                (i == n - 1 and vowel(i - 1))
                or match(i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or match(0, "SCH")
            ):
                add("", "F")
                i += 1
                continue
            if match(i, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
                continue
            i += 1
            continue
        if ch == "X":
            if not (
                i == n - 1
                and (match(i - 3, "IAU", "EAU") or match(i - 2, "AU", "OU"))
            ):
                add("KS")
            i += 2 if at(i + 1) in "CX" else 1
            continue
        if ch == "Z":
            if at(i + 1) == "H":
                add("J")
                i += 2
                continue
            if match(i + 1, "ZO", "ZI", "ZA") or (sg and i > 0 and at(i - 1) != "T"):
                add("S", "TS")
            else:
                add("S")
            i += 2 if at(i + 1) == "Z" else 1
            continue
        i += 1
    p = "".join(pri)[:maxlen]
    a = "".join(sec)[:maxlen]
    return (p, a)


@F.pandas_udf(StringType())
def nysiis_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(nysiis_py)


@F.pandas_udf(StringType())
def metaphone_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(metaphone_py)


@F.pandas_udf(ArrayType(StringType()))
def double_metaphone_udf(s: pd.Series) -> pd.Series:
    """Distinct Double-Metaphone keys per name (1 or 2 entries): explode
    for blocking so a probe links through EITHER reading."""

    def keys(x: str) -> list[str]:
        p, a = double_metaphone_py(x)
        out = [k for k in (p, a) if k]
        return list(dict.fromkeys(out))

    return s.fillna("").map(keys)
