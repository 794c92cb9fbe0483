"""Training-corpus curation operators: PII redaction, repetition filtering,
deterministic splits, sequence packing, and n-gram statistics.

These are the steps a large-scale LLM training-data pipeline runs after
ingest/cleanse and before tokenization. Reference analogue: the cleansing /
gating stages of Nikitpolin/etl-data (sql/init/01_init_all.sql:76-139 CASE
cleansing + silver gate) generalized to document corpora.

Scale design notes (100 TB):
- Everything here is a pure Column expression or a key-partitioned window —
  no Python in the row path, no driver-side collect, no global single
  partition. PII redaction / repetition stats / split assignment are
  embarrassingly parallel scans that whole-stage-codegen.
- Sequence packing partitions by a coarse key (``source``) so the running
  token offset is a per-group window, not a global sort; groups pack
  independently, which is exactly how multi-shard training data is laid out.
- All hashing is md5-derived (portable, bit-identical across engines) —
  the same idiom as operators/dedup.py.
- Regex patterns are class-only (no lookaround), chosen to behave
  identically under Java regex (Spark) and RE2 (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_data_spark.operators import text as TX


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --------------------------------------------------------------------------
# PII detection / redaction
# --------------------------------------------------------------------------

# Order matters: emails first (their domains contain dots an IP pattern
# could nibble at), then dashed phone numbers, then dotted IPv4.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Per-kind PII match counts (codegen'd regexp_count, no UDF)."""
    t = _col(text)
    return {
        kind: F.regexp_count(t, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: str | Column) -> Column:
    """Replace every PII match with its typed placeholder token.

    Patterns apply in PII_PATTERNS order so composite strings resolve
    deterministically (an email's host is consumed before the IP rule
    can see its dots).
    """
    out = _col(text)
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, F.lit(pat), F.lit(token))
    return out


# --------------------------------------------------------------------------
# Repetition statistics (Gopher-style quality rules)
# --------------------------------------------------------------------------


def _ngram_array(text: str | Column, n: int) -> Column:
    """All word n-grams of ``text`` in order (duplicates kept).

    The token array is let-bound via the ``transform(array(x), tk ->
    body)[1]`` idiom (same as text.py winnowing): referencing the split
    directly inside the gram lambda makes Catalyst substitute it into
    EVERY element_at — n splits per gram, O(tokens^2) per document
    (measured: the sf0.1 bigram explode dropped 5.8s -> ~1s after
    binding).
    """
    tk = F.split(F.trim(_col(text)), r"\s+")

    def _grams(tkb: Column) -> Column:
        # size(tkb) < n must yield []: sequence(1, 0) DESCENDS in Spark
        # ([1, 0]) and element_at(tk, 0) THROWS under ANSI mode — a doc
        # shorter than the gram width would crash the whole query
        # (found by the hypothesis property test; the DuckDB mirrors'
        # range(1, greatest(len-n+1,0)+1) is empty for short docs, so
        # this guard also aligns the engines)
        return F.when(
            F.size(tkb) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tkb) - (n - 1)),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.element_at(tkb, (i + j).cast("int"))
                        for j in range(n)
                    ],
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bound = F.element_at(F.transform(F.array(tk), _grams), 1)
    return F.when(
        F.length(F.trim(_col(text))) == 0, F.array().cast("array<string>")
    ).otherwise(bound)


def dup_ngram_fraction(text: str | Column, n: int) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier one:
    1 - distinct/total (0 when the document has no n-grams). The
    "duplicate n-gram fraction" repetition signal from Rae et al.,
    "Scaling Language Models: ... Gopher" (arXiv:2112.11446), §A1.1."""
    grams = _ngram_array(text, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(
            1 - F.size(F.array_distinct(grams)).cast("double") / total.cast("double"),
            6,
        )
    )


def repetition_flags(
    text: str | Column,
    max_dup_token_frac: float = 0.60,
    max_dup_trigram_frac: float = 0.30,
) -> dict[str, Column]:
    """Repetition signals + a keep/drop gate. Thresholds are the operator's
    parameters; defaults follow the Gopher-family heuristics (drop documents
    dominated by repeated tokens or repeated trigrams)."""
    d1 = dup_ngram_fraction(text, 1)
    d2 = dup_ngram_fraction(text, 2)
    d3 = dup_ngram_fraction(text, 3)
    keep = (d1 <= max_dup_token_frac) & (d3 <= max_dup_trigram_frac)
    return {
        "dup_token_frac": d1,
        "dup_bigram_frac": d2,
        "dup_trigram_frac": d3,
        "keep": keep,
    }


# --------------------------------------------------------------------------
# Deterministic train/val/test split
# --------------------------------------------------------------------------

SPLIT_BUCKETS = 1000
SPLIT_RANGES = [("train", 0, 900), ("val", 900, 950), ("test", 950, 1000)]


def hash_bucket(
    id_col: str | Column, salt: str = "", buckets: int = SPLIT_BUCKETS
) -> Column:
    """Stable bucket in [0, buckets): md5-prefix int of the salted id string.

    Hash-based assignment (not row_number % k) so membership is a pure
    function of the id — stable under re-partitioning, appends, and
    re-runs, which is what makes it reproducible at 100 TB. Distinct salts
    give mutually independent assignments (split vs sampling decisions
    never correlate).
    """
    s = _col(id_col).cast("string")
    if salt:
        s = F.concat(s, F.lit(salt))
    h = F.conv(F.substring(F.md5(s), 1, 11), 16, 10)
    return h.cast("bigint") % buckets


def split_bucket(id_col: str | Column) -> Column:
    return hash_bucket(id_col).alias("bucket")


def split_name(bucket: Column) -> Column:
    out = None
    for name, lo, hi in SPLIT_RANGES:
        cond = (bucket >= lo) & (bucket < hi)
        out = F.when(cond, name) if out is None else out.when(cond, name)
    return out


def with_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    b = split_bucket(id_col)
    return df.withColumn("bucket", b).withColumn("split", split_name(F.col("bucket")))


# --------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# --------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence.

    Concat-and-chunk semantics: within each ``group_col`` shard, documents
    are laid out in ``id_col`` order and the token stream is cut every
    ``budget`` tokens; a document belongs to the chunk containing its first
    token. This is the standard packing used for LLM pretraining shards.

    The running offset is a window partitioned by the shard key — each
    shard packs independently and in parallel; there is no global sort.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = TX.bpe_token_count(text_col)
    return (
        df.select(F.col(group_col), F.col(id_col), n_tok.alias("n_tokens"))
        .withColumn("offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            group_col,
            id_col,
            "n_tokens",
            F.floor(F.col("offset") / budget).alias("pack_id"),
            (F.col("offset") % budget).alias("pack_offset"),
        )
    )


# --------------------------------------------------------------------------
# Length deciles
# --------------------------------------------------------------------------


def decontaminate_ngram(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination by EXACT n-gram containment (the GPT-3
    appendix-C / PaLM-style pass): flag corpus documents sharing any word
    n-gram with an evaluation set. Complements ``split_leakage``'s
    near-duplicate (shingle-Jaccard) lens with the exact-substring lens a
    training pipeline runs against held-out benchmarks before training.

    Returns ``(id_col, n_contaminated_grams)`` for contaminated documents
    only (every contaminated-gram OCCURRENCE counts) — the drop list the
    curation pipeline anti-joins against.

    Scale shape: the EVAL side is bounded by construction (benchmarks are
    thousands of documents, not corpora), so its distinct n-gram set
    BROADCASTS; the corpus side is a narrow n-gram explode (let-bound
    token array, ``_ngram_array``) feeding a broadcast hash join — the
    corpus text is never shuffled. The one aggregation shuffles only
    (doc, count) partials for documents with >= 1 hit; at realistic
    13-gram hit rates that input is drop-list-sized, not corpus-sized.
    """
    grams = corpus.select(
        F.col(id_col),
        F.explode(_ngram_array(text_col, n)).alias("gram"),
    )
    eval_grams = eval_df.select(
        F.explode(_ngram_array(text_col, n)).alias("gram")
    ).distinct()
    return (
        grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )


def length_decile_stats(df: DataFrame, lang_col: str = "lang") -> DataFrame:
    """Per-language NTILE(10) over token length, aggregated to decile stats.

    Order key (n_tokens, doc_id) is unique, so tile membership is
    deterministic on both engines.
    """
    w = Window.partitionBy(lang_col).orderBy("n_tokens", "doc_id")
    per_doc = df.select(
        F.col(lang_col), F.col("doc_id"), TX.token_count("text").alias("n_tokens")
    ).withColumn("decile", F.ntile(10).over(w))
    return (
        per_doc.groupBy(lang_col, "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count("*"), 6
            ).alias("avg_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Quality-stratified sampling & domain mixing
# --------------------------------------------------------------------------

# Per-quality-bucket keep rates out of SPLIT_BUCKETS (high keeps everything,
# low is downsampled 10x) — the standard quality-weighted corpus mix.
QUALITY_SAMPLE_RATES = {"high": 1000, "medium": 500, "low": 100}
_SAMPLE_SALT = ":qs"


def quality_sample_flag(id_col: str | Column, text_col: str | Column) -> Column:
    """Deterministic quality-stratified keep decision: a doc survives when
    its salted hash bucket falls under its quality bucket's rate. The salt
    decorrelates sampling from train/val/test assignment."""
    b = hash_bucket(id_col, _SAMPLE_SALT)
    qb = TX.quality_bucket(text_col)
    out = None
    for name, rate in QUALITY_SAMPLE_RATES.items():
        cond = (qb == name) & (b < rate)
        out = F.when(cond, True) if out is None else out.when(cond, True)
    return out.otherwise(False)


def mixing_rates(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-domain sampling rates that equalize token budgets across domains.

    target = total_tokens / n_domains; rate = min(1, target / domain_tokens).
    The global totals are a window over the ALREADY-AGGREGATED per-domain
    rows (one per domain — a handful at any corpus size), so the corpus is
    scanned exactly once; the single-partition window exchange moves only
    those k rows, never document data.
    """
    per = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(TX.token_count(text_col)).alias("domain_tokens"),
    )
    w = Window.partitionBy()
    return per.select(
        group_col,
        "n_docs",
        "domain_tokens",
        F.round(
            F.least(
                F.lit(1.0),
                (F.sum("domain_tokens").over(w) / F.count("*").over(w))
                / F.col("domain_tokens"),
            ),
            6,
        ).alias("sample_rate"),
    )


def corpus_report(df: DataFrame) -> DataFrame:
    """Per (source, lang) corpus report card: volume, quality, and the
    fraction surviving the repetition gate. Quality sums go through
    DECIMAL so the aggregate is exact under any partitioning."""
    flags = repetition_flags("text")
    per_doc = df.select(
        "source",
        "lang",
        TX.token_count("text").alias("n_tok"),
        TX.quality_score("text").cast("decimal(10,6)").alias("q"),
        flags["keep"].alias("keep"),
    )
    return per_doc.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.sum("q").cast("double") / F.count("*"), 6).alias("avg_quality"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
    )


# --------------------------------------------------------------------------
# Corpus n-gram statistics
# --------------------------------------------------------------------------


def top_ngrams(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-wide top-k n-grams by occurrence count (ties -> lexicographic).

    Explode -> partial-aggregating groupBy -> TakeOrderedAndProject: the
    shuffle carries (ngram, partial count) pairs only, and top-k never
    materializes a full sort.
    """
    grams = df.select(F.explode(_ngram_array(text_col, n)).alias("ngram"))
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
    )
