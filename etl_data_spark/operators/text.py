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


# BPE-ish pretokenizer: letter runs, single digits, punctuation runs — the
# class-only pattern behaves identically under Java regex (Spark) and RE2
# (DuckDB/others), unlike lookahead-based GPT-2 patterns.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_token_count(text: str | Column) -> Column:
    """Subword-style token count: a cheap proxy for BPE token budgets
    (letters split from digits and punctuation, digits one per token)."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(BPE_PATTERN), F.lit(0)))


# Rolling-hash fingerprinting (winnowing). Per-token base hash is md5-derived
# (portable); each k-token window hash is the polynomial Horner chain
# ((h_1*B + h_2)*B + ...) mod P (mod at every step keeps products < 2^39, no
# int64 overflow), then winnowing keeps each w-window's minimum so two
# documents sharing any token run of length >= k + w - 1 share a fingerprint
# regardless of alignment (Schleimer et al., "Winnowing: Local Algorithms
# for Document Fingerprinting", SIGMOD 2003).

ROLL_P = (1 << 31) - 1
ROLL_B = 131

TOKEN_HASH_SQL = (
    f"cast(conv(substr(md5(t), 1, 11), 16, 10) as bigint) % {ROLL_P}L"
)


def _horner_sql(k: int) -> str:
    acc = "0L"
    for j in range(k):
        acc = f"(({acc} * {ROLL_B}L + element_at(th, i + {j})) % {ROLL_P}L)"
    return acc


def with_winnow_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
):
    """(id, fp) rows: the winnowed fingerprint set of each document.

    The three stages (token hashes -> window hashes -> winnowed minima) are
    let-bound via the ``transform(array(x), v -> body)[1]`` idiom so each
    array is evaluated exactly once inside a single projection. Chained
    selects are NOT safe here: Catalyst collapses them and substitutes the
    md5 transform into every window reference, exploding the work to
    O(tokens^2) hashes per document. Output is exploded to rows — the
    at-scale layout, since fingerprint inverted indexes shuffle by fp.
    """
    th_expr = f"transform(split(trim({text_col}), '\\\\s+'), t -> {TOKEN_HASH_SQL})"
    rh_expr = (
        f"case when size(th) >= {k} "
        f"then transform(sequence(1, size(th) - {k - 1}), i -> {_horner_sql(k)}) "
        f"else cast(array() as array<bigint>) end"
    )
    fps_expr = (
        f"case when size(rh) >= {w} "
        f"then array_distinct(transform(sequence(1, size(rh) - {w - 1}), "
        f"i -> array_min(slice(rh, i, {w})))) "
        f"when size(rh) > 0 then array(array_min(rh)) "
        f"else cast(array() as array<bigint>) end"
    )
    fps = (
        f"element_at(transform(array({th_expr}), "
        f"th -> element_at(transform(array({rh_expr}), rh -> {fps_expr}), 1)), 1)"
    )
    return df.select(F.col(id_col), F.explode(F.expr(fps)).alias("fp"))
