"""String utilities as native Catalyst column expressions.

Re-expresses the reference's String class (hamerkop/string.py:17-74) with
pyspark.sql.functions so the hot path stays inside whole-stage codegen.
Parity with the Python semantics is unit-tested (tests/test_strings.py).
"""

from __future__ import annotations

import string as _string

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII punctuation table (string.py:21-22).
ASCII_PUNCT = _string.punctuation

# Emoji ranges (string.py:26-34). Written as a Java regex character class;
# supplementary-plane literals are fine in Java regex.
EMOJI_CLASS = (
    "["
    "\U0001F170-\U0001F19A"  # buttons
    "\U0001F200-\U0001F235"  # japanese buttons
    "\U0001F300-\U0001F5FF"  # symbols & pictographs
    "\U0001F600-\U0001F64F"  # emoticons
    "\U0001F680-\U0001F6FF"  # transport & map
    "\U0001F1E0-\U0001F1FF"  # flags
    "\U0001F900-\U0001F9FF"  # faces unicode 8
    "]+"
)

# TextNormalizer smart-punct table (preprocessor.py:193).
SMART_PUNCT_FROM = "‘’“”—…"
SMART_PUNCT_TO = "''\"\"-."


def remove_punct(c: Column) -> Column:
    """Remove ASCII punctuation (string.py:36-39)."""
    return F.translate(c, ASCII_PUNCT, "")


def replace_punct(c: Column) -> Column:
    """ASCII punctuation -> space, then strip (string.py:41-44)."""
    return F.trim(F.translate(c, ASCII_PUNCT, " " * len(ASCII_PUNCT)))


def remove_unicode_punct(c: Column) -> Column:
    """Remove Unicode category-P chars (string.py:46-49)."""
    return F.regexp_replace(c, r"\p{P}", "")


def replace_unicode_punct(c: Column) -> Column:
    """Unicode punct -> space, then strip (string.py:51-54)."""
    return F.trim(F.regexp_replace(c, r"\p{P}", " "))


def remove_emojis(c: Column) -> Column:
    """Strip emoji ranges (string.py:56-59)."""
    return F.regexp_replace(c, EMOJI_CLASS, "")


def normalize_smart_punct(c: Column) -> Column:
    """Smart quotes/dash/ellipsis -> ASCII (preprocessor.py:186-199)."""
    return F.translate(c, SMART_PUNCT_FROM, SMART_PUNCT_TO)


def single_space(c: Column) -> Column:
    """Collapse whitespace runs to one space (string.py:61-64)."""
    return F.regexp_replace(c, r"\s+", " ")


def remove_double_letter(c: Column) -> Column:
    """([a-zA-Z])\\1+ -> \\1 (string.py:66-69)."""
    return F.regexp_replace(c, r"([a-zA-Z])\1+", "$1")


def char_ngrams(c: Column, n: int = 2) -> Column:
    """Sliding char n-grams as array<string> (string.py:71-74).

    Empty array when len(s) < n, matching the Python range() semantics.
    Pure Catalyst via n shifted char-array slices + arrays_zip — NOT
    `transform(sequence, i -> substr(c, i, n))`: expressions inside a
    transform lambda are re-evaluated per element, so any upstream
    normalization feeding `c` would rerun once per position. Here `c`
    is evaluated exactly once (for the split).
    """
    chars = F.split(c, "")
    m = F.size(chars) - (n - 1)
    sliced = [F.slice(chars, j + 1, m).alias(f"c{j}") for j in range(n)]
    zipped = F.arrays_zip(*sliced)
    grams = F.transform(
        zipped, lambda st: F.concat(*[st[f"c{j}"] for j in range(n)])
    )
    return F.when(F.length(c) < n, F.array().cast("array<string>")).otherwise(
        grams
    )


def format_ngram_name(c: Column) -> Column:
    """The ngram-index name formatter (kb.py:260-264):
    replace_unicode_punct -> lower -> spaces to '_' -> wrap with '_'."""
    s = F.lower(replace_unicode_punct(c))
    return F.concat(F.lit("_"), F.translate(s, " ", "_"), F.lit("_"))


def acronym_initials(c: Column) -> Column:
    """Uppercased first letter of each space-separated word
    (coref.py:330-335: ''.join(word[0].upper() for word in s.split()))."""
    return F.array_join(
        F.transform(
            F.filter(F.split(c, r"\s+"), lambda w: w != ""),
            lambda w: F.upper(F.substring(w, 1, 1)),
        ),
        "",
    )


def wikipedia_link(c: Column) -> Column:
    """Build http://en.wikipedia.org/wiki/<Name> like features.py:137-141:
    space->underscore, smart apostrophe->ASCII, percent-encode.

    Parity note: urllib.parse.quote's default safe chars are '/'; we
    replicate with url_encode (application/x-www-form-urlencoded encodes
    space as '+', so we pre-substitute) then restore unreserved parity.
    Implemented natively: url_encode then fix '+' (we never feed spaces)
    and '%2F' -> '/' to mirror quote(safe='/').
    """
    s = F.translate(c, " ’", "_'")
    enc = F.url_encode(s)
    # Align URLEncoder's escape set with quote(safe='/'): '/' and '~' are
    # literal under quote, '*' is encoded, '+' only arises from spaces
    # (none survive the translate above, but normalize for safety).
    enc = F.regexp_replace(enc, r"%2F", "/")
    enc = F.regexp_replace(enc, r"%7E", "~")
    enc = F.regexp_replace(enc, r"\*", "%2A")
    enc = F.regexp_replace(enc, r"\+", "%20")
    return F.concat(F.lit("http://en.wikipedia.org/wiki/"), enc)


def doc_type_from_id(c: Column) -> Column:
    """DocType.detect by doc-id substring (core.py:50-70); null if unknown."""
    return (
        F.when(c.contains("_SN_"), F.lit("twitter"))
        .when(c.contains("_WL_"), F.lit("blog"))
        .when(c.contains("_RF_"), F.lit("reference"))
        .when(c.contains("_DF_"), F.lit("discussion forum"))
        .when(c.contains("_NW_"), F.lit("newswire"))
        .otherwise(F.lit(None).cast("string"))
    )


def entity_origin(c: Column) -> Column:
    """EntityOrigin.create normalization (core.py:27-47); null if unknown."""
    return (
        F.when(
            c.isin("geonames", "cia world leaders", "cia world orgs", "augmentation"), c
        )
        .when(c == "GEO", F.lit("geonames"))
        .when(c == "WLL", F.lit("cia world leaders"))
        .when(c == "APB", F.lit("cia world orgs"))
        .when(c.startswith("AUG"), F.lit("augmentation"))
        .otherwise(F.lit(None).cast("string"))
    )


def token_count(c: Column) -> Column:
    """Whitespace token count; 0 for empty strings."""
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )
