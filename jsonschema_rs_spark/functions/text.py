"""Text-analysis primitives for training-data pipelines.

All Column-native (whole-stage codegen, no Python in the hot path), chosen
to be expressible in ANSI SQL too so every operator gets a DuckDB oracle:

- token counting       : whitespace split + a BPE-ish wordpiece regex count
- quality scoring      : length / punctuation / stopword / word-length mix
- language ID          : stopword-hit heuristic over a small per-language set
- document fingerprint : md5 of the normalized text (md5 is portable across
                         engines, unlike murmur/xxhash builtins)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deliberately tiny, deterministic stopword sets (heuristic language ID —
# an n-gram model would live behind the same Column signature)
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"),
}

_WORDPIECE_RE = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^\sa-zA-Z0-9]"


def normalize(text: Column) -> Column:
    """lower + collapse whitespace (shared by fingerprint/dedup/shingles)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def wordpiece_count(text: Column) -> Column:
    """BPE-ish sub-token count: lowercase runs, capitalized runs, digit runs,
    single punctuation — a cheap, deterministic proxy for tokenizer load."""
    return F.size(F.regexp_extract_all(text, F.lit(_WORDPIECE_RE), 0))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\sa-zA-Z0-9]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_hits(text: Column, lang: str) -> Column:
    words = F.split(normalize(text), " ")
    sw = STOPWORDS[lang]
    return F.size(F.filter(words, lambda w: w.isin(*sw)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_hits(text, lang) / F.greatest(token_count(text), F.lit(1))


def mean_word_len(text: Column) -> Column:
    words = F.split(normalize(text), " ")
    return F.aggregate(
        words, F.lit(0).cast("double"), lambda acc, w: acc + F.length(w)
    ) / F.greatest(F.size(words), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize extreme length, high
    punctuation, missing stopwords, degenerate word lengths.  Weights are
    fixed constants so the score is reproducible in SQL."""
    n = token_count(text)
    len_ok = (n >= 5) & (n <= 100_000)
    p = punct_ratio(text)
    s = stopword_ratio(text, "en")
    mw = mean_word_len(text)
    return (
        len_ok.cast("double") * 0.4
        + (p < 0.3).cast("double") * 0.2
        + (s > 0.01).cast("double") * 0.2
        + ((mw >= 2.0) & (mw <= 12.0)).cast("double") * 0.2
    )


def lang_guess(text: Column) -> Column:
    """argmax over per-language stopword hits; 'und' (undetermined) on tie-0.

    CASE-expressible so the DuckDB oracle can replicate it exactly; tie-break
    order is fixed: en > de > fr."""
    en = stopword_hits(text, "en")
    de = stopword_hits(text, "de")
    fr = stopword_hits(text, "fr")
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (A rolling/polynomial hash would not be reproducible across engines;
    md5 is, and is just as usable as an exact-dup key.)"""
    return F.md5(normalize(text))
