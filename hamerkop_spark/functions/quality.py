"""Text-quality / training-data-pipeline scalar functions (all native).

Beyond the reference's operator set: the document-scoring toolkit a
100 TB web-text pipeline needs — length stats, punctuation/stopword
ratios, token counting (whitespace + BPE-ish regex), and content
fingerprinting. Every function is a pure Catalyst expression so filters
push down to the parquet scan and the DuckDB oracle can mirror it.
"""

from __future__ import annotations

import string as _string

from pyspark.sql import Column
from pyspark.sql import functions as F

from hamerkop_spark.functions.num import det_round

from hamerkop_spark.functions.strings import token_count  # noqa: F401

ENGLISH_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
    "on", "was", "with", "as", "at", "by", "an", "be", "this", "are",
]

# GPT2-ish pre-tokenizer shape: letter runs, digit runs, other-symbol runs.
BPE_TOKEN_REGEX = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"


def char_count(c: Column) -> Column:
    return F.length(c)


def punct_ratio(c: Column) -> Column:
    """ASCII-punctuation chars / total chars (0.0 for empty)."""
    total = F.length(c)
    punct = total - F.length(F.translate(c, _string.punctuation, ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / total.cast("double")
    )


def digit_ratio(c: Column) -> Column:
    total = F.length(c)
    # r6: regexp_count of a single-char class == the old
    # length - length(regexp_replace(...)) exactly, without allocating
    # the replaced string per row
    digits = F.regexp_count(c, F.lit(r"[0-9]"))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        digits.cast("double") / total.cast("double")
    )


def upper_ratio(c: Column) -> Column:
    total = F.length(c)
    uppers = F.regexp_count(c, F.lit(r"[A-Z]"))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        uppers.cast("double") / total.cast("double")
    )


def stopword_ratio(c: Column) -> Column:
    """Fraction of whitespace tokens that are English stopwords (CI)."""
    toks = F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")
    stops = F.filter(
        toks, lambda t: t.isin(*ENGLISH_STOPWORDS)
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.size(stops).cast("double") / F.size(toks).cast("double")
    )


def mean_token_length(c: Column) -> Column:
    toks = F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
        )
        / F.size(toks).cast("double")
    )


def bpe_token_count(c: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_REGEX), 0))


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length documents with
    sane punctuation/stopword profiles; penalizes digit/upper noise.
    Weights are fixed and documented so the score is reproducible."""
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    punct_pen = F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    digit_pen = F.least(digit_ratio(c) * 5.0, F.lit(1.0))
    score = (
        F.lit(0.35) * len_score
        + F.lit(0.35) * stop_score
        + F.lit(0.15) * (F.lit(1.0) - punct_pen)
        + F.lit(0.15) * (F.lit(1.0) - digit_pen)
    )
    return det_round(score, 6)


def normalize_for_fingerprint(c: Column) -> Column:
    """Canonical form for content fingerprinting: lowercase, strip ASCII
    punctuation, collapse whitespace, trim."""
    s = F.lower(c)
    s = F.translate(s, _string.punctuation, "")
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return s


def fingerprint(c: Column) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.
    md5 (not xxhash64) so the DuckDB oracle computes the identical value."""
    return F.md5(normalize_for_fingerprint(c))
