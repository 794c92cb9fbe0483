"""LLM-training-data pipeline queries: dedup, similarity, text, temporal.

Registered into the same catalog as the relational queries. Oracle SQL
mirrors the md5-derived hashing / list arithmetic exactly (see operators/
dedup.py for why everything is md5-based: engine-portable bit-identical
hashing). Entries without a SQL-expressible mirror (approximate ANN,
simhash banding internals) are registered with oracle=None -> the driver
records a weaker rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_data_spark.operators import dedup as D
from etl_data_spark.operators import similarity as S
from etl_data_spark.operators import temporal as TP
from etl_data_spark.operators import text as TX
from etl_data_spark.queries import load_table, register

# SQL fragments reused across oracles ---------------------------------------

_SQL_SHINGLES = """
    list_distinct(list_transform(
        range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
        i -> concat(string_split(text, ' ')[i], ' ',
                    string_split(text, ' ')[i+1], ' ',
                    string_split(text, ' ')[i+2])))
"""

_SQL_PAIR_JACCARD = """
WITH sh AS (
  SELECT doc_id, {shingles} AS shingles FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
)
SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= {threshold}
"""


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@register(
    "text_stats",
    """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
           length(text) AS n_chars,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(list_distinct(string_split_regex(trim(text), '\\s+'))) END AS n_distinct_tokens
    FROM documents
    """,
    doc="Token counting + lexical stats (whitespace tokenizer), JVM-side only.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.char_count("text").alias("n_chars"),
        TX.distinct_token_count("text").alias("n_distinct_tokens"),
    )


def _sql_occurrences(marker: str) -> str:
    needle = f" {marker} "
    return (
        f"CAST((length(concat(' ', lower(text), ' ')) - "
        f"length(replace(concat(' ', lower(text), ' '), '{needle}', ''))) "
        f"/ {len(needle)} AS BIGINT)"
    )


def _sql_lang_score(lang: str) -> str:
    return " + ".join(_sql_occurrences(m) for m in TX.LANG_MARKERS[lang])


_LANGS = sorted(TX.LANG_MARKERS)
_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN s_{lang} > 0 AND "
        + " AND ".join(f"s_{lang} >= s_{o}" for o in _LANGS if o != lang)
        + f" THEN '{lang}'"
        for lang in _LANGS
    )
    + " ELSE 'unknown' END"
)


@register(
    "lang_id",
    f"""
    SELECT doc_id, {_LANG_CASE} AS lang_guess
    FROM (
      SELECT doc_id,
             {", ".join(f"{_sql_lang_score(lang)} AS s_{lang}" for lang in _LANGS)}
      FROM documents
    )
    """,
    doc="Stopword-marker language ID heuristic (argmax with alphabetical ties).",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.language_id("text").alias("lang_guess"))


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16) AS fp
    FROM documents
    """,
    doc="Normalized-md5 document fingerprint (rolling-hash stand-in, portable).",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fp"))


@register(
    "quality_scores",
    """
    SELECT doc_id,
           ROUND(0.4 * least(n_tok / 50.0, 1.0)
                 + 0.4 * (CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_dis AS DOUBLE) / n_tok END)
                 + 0.2 * (1 - noise), 6) AS quality
    FROM (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(list_distinct(string_split_regex(trim(text), '\\s+'))) END AS n_dis,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                       / length(text) END AS noise
      FROM documents
    )
    """,
    doc="Composite quality score: length, lexical diversity, punctuation noise.",
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.quality_score("text").alias("quality"))


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16)
    """,
    doc="Exact dedup via fingerprint hash-groupBy (shuffles digests, not bodies).",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.dedup_exact(d, "doc_id", "text")


@register(
    "dedup_ngram_jaccard",
    _SQL_PAIR_JACCARD.format(shingles=_SQL_SHINGLES, threshold=0.5),
    doc="Exact near-dup pairs (word-3-gram Jaccard >= 0.5) via inverted-index join.",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.5)


@register(
    "dedup_minhash_lsh",
    # Oracle is ground-truth all-pairs Jaccard: at threshold 0.8 the LSH
    # (H=64, b=16, r=4) has miss probability < 1e-14 per qualifying pair, so
    # candidate-generation + exact-verify must equal the exhaustive answer.
    _SQL_PAIR_JACCARD.format(shingles=_SQL_SHINGLES, threshold=0.8),
    doc="MinHash+LSH near-dup pairs, exact-Jaccard-verified; oracle = exhaustive truth.",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        d, "doc_id", "text", shingle_n=3, num_hashes=64, bands=16, threshold=0.8
    )


@register(
    "dedup_simhash",
    None,  # banding internals not SQL-expressible compactly; rows-only check
    doc="SimHash near-dup pairs (Hamming <= 6 over 48-bit signatures).",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(d, "doc_id", "text")


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

_SQL_COSINE = """
    ROUND(
      list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(range(1, len(q.embedding) + 1),
           i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))), 6)
"""


@register(
    "embedding_topk",
    f"""
    SELECT e.vec_id, {_SQL_COSINE} AS cosine_sim
    FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 10
    """,
    doc="Brute-force cosine top-k against a query vector (exact ANN baseline).",
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return S.brute_force_topk(e, list(qvec), k=10)


@register(
    "knn_join_sample",
    f"""
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT l.vec_id AS query_id, e.vec_id AS neighbor_id,
             {_SQL_COSINE.replace("q.embedding", "l.embedding")} AS cosine_sim,
             ROW_NUMBER() OVER (
               PARTITION BY l.vec_id
               ORDER BY {_SQL_COSINE.replace("q.embedding", "l.embedding")} DESC, e.vec_id
             ) AS rank
      FROM embeddings l JOIN embeddings e ON l.vec_id < 20 AND e.vec_id != l.vec_id
    ) WHERE rank <= 3
    """,
    doc="Exact k-NN join (top-3 neighbors for 20 query vectors) via window ranking.",
)
def q_knn_join_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    left = e.filter(F.col("vec_id") < 20)
    return S.knn_join(left, e, k=3)


@register(
    "ann_lsh_topk",
    None,  # approximate by design; recall checked in pytest, rows-only here
    doc="LSH-bucketed approximate top-k (random-hyperplane buckets, probe+verify).",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return S.ann_topk(e, list(qvec), k=10, num_planes=4)


_SQL_PAIR_COSINE = """
    ROUND(
      list_sum(list_transform(range(1, len(a.embedding) + 1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
           i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 6)
"""


@register(
    "embedding_near_dup",
    f"""
    SELECT id_a, id_b, cosine_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_SQL_PAIR_COSINE} AS cosine_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) WHERE cosine_sim >= 0.4
    """,
    doc="Embedding-cosine near-duplicate pairs (exact all-pairs baseline).",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return S.near_dup_pairs(e, threshold=0.4)


@register(
    "embedding_near_dup_lsh",
    None,  # approximate by design (bucket-pruned); recall checked in pytest
    doc="Embedding near-dup via random-hyperplane LSH buckets (scale path).",
)
def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    return S.near_dup_pairs_lsh(e, dim=dim, threshold=0.4, num_planes=4)


# --------------------------------------------------------------------------
# Temporal: as-of join, sessionization, tumbling windows
# --------------------------------------------------------------------------


@register(
    "streaming_sessionize",
    None,  # streaming + custom state: not SQL-expressible; equivalence with
    # the batch sessionizer is asserted in tests/test_streaming_stateful.py
    doc="applyInPandasWithState sessionization over a finite event stream.",
)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from etl_data_spark.streaming.stateful import streaming_sessionize

    # events.parquet carries ns timestamps -> read ts as long, convert to us
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.LongType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the file-stream source requires a directory; expose the single parquet
    # file through a temp dir symlink (a real deployment streams a directory
    # or kafka topic — the plan downstream is identical)
    import os
    import tempfile

    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(stream_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    out = streaming_sessionize(
        stream, gap_minutes=30, timeout=GroupStateTimeout.NoTimeout
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("q_streaming_sessions")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("q_streaming_sessions")


@register(
    "asof_join_purchase_click",
    """
    SELECT l.event_id, l.user_id, l.ts, r.event_id AS event_id_right
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    doc="As-of join: latest preceding click per purchase (union+window, one shuffle).",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    return TP.asof_join(
        purchases, clicks, on="ts", by="user_id", right_cols=["event_id"]
    )


@register(
    "session_stats",
    """
    WITH tagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM tagged
    )
    SELECT user_id,
           concat(CAST(user_id AS VARCHAR), '#', CAST(session_seq AS VARCHAR)) AS session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    doc="Sessionization (30-min gap) + per-session rollup; batch twin of session_window.",
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return TP.session_stats(e, ts_col="ts", key_col="user_id", gap_minutes=30)


@register(
    "window_agg_5min",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 5-minute window aggregation (batch form of the streaming query).",
)
def q_window_agg_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )
