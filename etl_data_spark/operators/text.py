"""Text-analysis operators for large-scale document pipelines.

All operators are pure Column expressions (JVM-side, codegen'd — no Python in
the row path), so they run at full scan speed over 100 TB of documents:
tokenization stats, quality scoring, language identification, and document
fingerprinting. Each has an exactly-equivalent ANSI-SQL formulation used by
the oracle checks (see queries.py), so semantics are pinned cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language heuristic.
# Counting uses the occurrence formula (len(s) - len(replace(s, m))) / len(m),
# which is portable to any SQL engine.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "und", "die", "nicht"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "que", "y"],
}


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(text: str | Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(_col(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def char_count(text: str | Column) -> Column:
    return F.length(_col(text))


def distinct_token_count(text: str | Column) -> Column:
    t = F.trim(_col(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.array_distinct(F.split(t, r"\s+")))
    )


def occurrences(text: str | Column, marker: str) -> Column:
    """Number of occurrences of ``marker`` as a whole word in text."""
    padded = F.concat(F.lit(" "), F.lower(_col(text)), F.lit(" "))
    needle = f" {marker} "
    # overlap-free count; whole-word padding means occurrences can't overlap
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def lang_scores(text: str | Column) -> dict[str, Column]:
    return {
        lang: sum(
            (occurrences(text, m) for m in markers), start=F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(text: str | Column) -> Column:
    """Stopword-marker language ID: argmax score, ties -> alphabetical lang,
    all-zero -> 'unknown'. Deterministic and SQL-portable."""
    scores = lang_scores(text)
    langs = sorted(scores)  # CASE chain in alphabetical order -> ties go to
    best = None  # the alphabetically-first language, like the SQL mirror
    for lang in langs:
        cond = scores[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("unknown")


def punct_ratio(text: str | Column) -> Column:
    """Fraction of characters that are not alphanumeric or whitespace."""
    t = _col(text)
    stripped = F.regexp_replace(t, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(t)
    )


def stopword_ratio(text: str | Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (default: English markers)."""
    sw = stopwords or LANG_MARKERS["en"]
    total = token_count(text)
    hits = sum((occurrences(text, m) for m in sw), start=F.lit(0).cast("long"))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / total.cast("double")
    )


def quality_score(text: str | Column) -> Column:
    """Composite document-quality heuristic in [0, 1]:
    rewards moderate length, lexical diversity, low punctuation noise."""
    n_tok = token_count(text)
    diversity = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        distinct_token_count(text).cast("double") / n_tok.cast("double")
    )
    length_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
    noise = punct_ratio(text)
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.4) * diversity + F.lit(0.2) * (1 - noise),
        6,
    )


def quality_bucket(text: str | Column) -> Column:
    q = quality_score(text)
    return (
        F.when(q >= 0.7, "high").when(q >= 0.4, "medium").otherwise("low")
    )


def fingerprint(text: str | Column, length: int = 16) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text, truncated. Used for exact-dup detection at scale where
    shipping full text through a shuffle is wasteful."""
    norm = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")
    return F.substring(F.md5(norm), 1, length)
