"""Round-3 analytics + retrieval queries: TF-IDF/BM25 ranking, deterministic
sampling, funnels, cohorts, histograms, unigram LM scoring, event Markov
transitions, and mergeable moments.

Every query is Spark-first (native Column expressions, no Python in the hot
path) with an exact DuckDB oracle. Floating-point discipline, learned from
rounds 1-2: any value that crosses a SUM of doubles is either decimal-cast
before aggregation (exact, order-independent) or quantized per element
(round -> decimal) so distributed fold order can never flip the driver's
value hash.

Scale notes are inline per query; the common theme: token/term pipelines
explode to (doc, term) rows whose aggregations are partial-agg friendly
(map-side combine), scalar corpus stats (N, avgdl, total tokens) ride along
as broadcast one-row joins, and sampling is hash-deterministic so it needs
no coordination — every executor can decide membership locally at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_data_spark.operators import _sqlexpr as _sx
from etl_data_spark.queries import load_table, register

# --------------------------------------------------------------------------
# Retrieval: TF-IDF / BM25 / unigram LM
# --------------------------------------------------------------------------

# Tokenization convention shared with the dedup/text families: single-space
# split, empty tokens dropped. Keep both engines on the exact same rule.
_SQL_TOKS = """
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
"""


def _tokens(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")


@register(
    "tfidf_topk",
    f"""
    WITH toks AS ({_SQL_TOKS}),
    toks2 AS (SELECT * FROM toks WHERE term <> ''),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks2 GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
               AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
    doc="Top-3 TF-IDF terms per document (smoothed idf). Scale shape: one "
    "explode -> two partial-agg groupBys; corpus size N is a broadcast "
    "scalar; ranking is a per-doc window (small partitions, no skew). "
    "Ranking key is the 6dp-ROUNDED score so cross-engine 1-ulp ln() "
    "differences cannot reorder ties.",
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(d)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf")
    )


_BM25_TERMS = ("spark", "join", "hash")
_BM25_K1, _BM25_B = 1.2, 0.75


# The CTE chain through `scored` is shared verbatim by bm25_search and
# rrf_hybrid_search so the two oracles cannot drift.
_SQL_BM25_SCORED = f"""toks AS ({_SQL_TOKS}),
    toks2 AS (SELECT * FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks2 GROUP BY doc_id),
    stats AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT AVG(dl) FROM dl) AS avgdl
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks2
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             SUM(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_BM25_K1} + 1.0)
                 / (tf.tf + {_BM25_K1}
                    * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl)))
               AS score
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    )"""


@register(
    "bm25_search",
    f"""
    WITH {_SQL_BM25_SCORED}
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scored
    ORDER BY ROUND(score, 6) DESC, doc_id
    LIMIT 20
    """,
    doc="BM25 (k1=1.2, b=0.75) ranking of documents against a 3-term query. "
    "Per-term partials sum at most |query| doubles per doc (tiny, "
    "deterministic fold), corpus stats broadcast. Top-k is "
    "TakeOrderedAndProject — no global sort.",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        _bm25_scored(d)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


def _bm25_scored(d: DataFrame) -> DataFrame:
    """(doc_id, bm25 rounded 6dp) for every doc matching >=1 query term."""
    toks = _tokens(d)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = d.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = _BM25_K1, _BM25_B
    per_term = (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return per_term.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("bm25")
    )


@register(
    "unigram_logprob",
    f"""
    WITH toks AS ({_SQL_TOKS}),
    toks2 AS (SELECT * FROM toks WHERE term <> ''),
    freq AS (SELECT term, COUNT(*) AS tf FROM toks2 GROUP BY term),
    tot AS (SELECT SUM(tf) AS total FROM freq),
    tok_scored AS (
      SELECT t.doc_id,
             CAST(ROUND(-ln(f.tf / (1.0 * tt.total)), 6) AS DECIMAL(18,6))
               AS nll_q
      FROM toks2 t JOIN freq f USING (term) CROSS JOIN tot tt
    )
    SELECT doc_id,
           ROUND(CAST(SUM(nll_q) AS DOUBLE) / COUNT(*), 6) AS avg_nll,
           COUNT(*) AS n_tokens
    FROM tok_scored
    GROUP BY doc_id
    """,
    doc="Unigram language-model surprisal per document: avg -ln p(token) "
    "under corpus frequencies — the classic cheap quality/novelty signal. "
    "Per-token surprisal is quantized to 6dp DECIMAL before the sum, so "
    "the distributed aggregation is exact integer math — immune to float "
    "fold order at any partition count.",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(d)
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    tot = freq.agg(F.sum("tf").alias("total"))
    tok_scored = (
        toks.join(freq, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(-F.log(F.col("tf") / (1.0 * F.col("total"))), 6)
            .cast("decimal(18,6)")
            .alias("nll_q"),
        )
    )
    return tok_scored.groupBy("doc_id").agg(
        F.round(F.sum("nll_q").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_nll"
        ),
        F.count(F.lit(1)).alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# Deterministic sampling (coordination-free at any scale)
# --------------------------------------------------------------------------

# Portable uniform hash in [0, 2^32): first 8 md5 hex digits, positionally
# parsed (same device as the dedup/winnow mirrors — DuckDB's md5_number_*
# are little-endian and unusable for prefix semantics).
_SQL_MD5_32 = """
    CAST(list_sum(list_transform(range(1, 9),
        k -> (strpos('0123456789abcdef', substr(md5({key}), CAST(k AS INT), 1)) - 1)
             * CAST(power(16, 8 - k) AS BIGINT))) AS BIGINT)
"""


_SAMPLE_P = 0.1


@register(
    "hash_sample",
    f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE {_SQL_MD5_32.format(key="CAST(o_orderkey AS VARCHAR)")}
          < {int(_SAMPLE_P * (1 << 32))}
    """,
    doc="Deterministic 10% Bernoulli sample: keep rows whose md5(key) "
    "falls below p*2^32. Unlike rand()-based sampling this is stable "
    "across retries/partitionings and needs zero coordination — each task "
    "decides membership from the row alone; the filter pushes into the "
    "scan's codegen stage.",
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    h = F.expr(
        "cast(conv(substr(md5(cast(o_orderkey as string)), 1, 8), 16, 10) "
        "as bigint)"
    )
    return o.filter(h < int(_SAMPLE_P * (1 << 32))).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "stratified_sample",
    f"""
    SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 5
    """,
    doc="Deterministic stratified sample: 5 docs per language, chosen by "
    "md5 order (a reproducible shuffle). One window per stratum — "
    "partitions are strata, so parallelism = #strata; for huge strata the "
    "hash threshold (hash_sample) pattern pre-thins before ranking.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "lang", "rk")
    )


# --------------------------------------------------------------------------
# Behavioral analytics over events
# --------------------------------------------------------------------------


@register(
    "funnel_counts",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase
    """,
    doc="Ordered view->click->purchase funnel: users reaching each stage "
    "in sequence. Three key-partitioned aggregations + equi-joins on "
    "user_id — AQE reuses the user_id exchange; no window over the whole "
    "event stream, so no single-partition stage at any scale.",
)
def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


@register(
    "cohort_retention",
    """
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INT)
             AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN first_day f ON e.user_id = f.user_id
    WHERE datediff('day', f.cohort_day, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
    GROUP BY f.cohort_day, day_offset
    """,
    doc="Daily cohort retention (offsets 0..7): users active N days after "
    "their first event. first_day is a user-keyed aggregate joined back on "
    "user_id (same exchange), then one grouped distinct-count; cohorts "
    "bound the result to days x 8 rows regardless of event volume.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    joined = e.join(first_day, "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
    )
    return (
        joined.filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    doc="First-order Markov transition counts between consecutive event "
    "types per user (ties broken by event_id for determinism). One "
    "user-keyed window + one tiny (|types|^2-row) aggregation; per-user "
    "partitions keep the window skew-free at any event volume.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Distribution summaries
# --------------------------------------------------------------------------


@register(
    "value_histogram",
    """
    SELECT CAST(floor(o_totalprice / 25000.0) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_total,
           CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) AS min_total,
           CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS max_total
    FROM orders
    GROUP BY bucket
    """,
    doc="Fixed-width value histogram of order totals. The bucket key is "
    "computed in the scan's codegen stage; the aggregate is partial+final "
    "with ~20 groups — a pure map-side-combine plan. Sums accumulate in "
    "exact decimal (fold-order-independent) and every output column is "
    "CAST to a driver-hash-stable type (BIGINT/DOUBLE) on both sides.",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0)
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
            F.round(F.min("o_totalprice"), 2).cast("double").alias("min_total"),
            F.round(F.max("o_totalprice"), 2).cast("double").alias("max_total"),
        )
    )


@register(
    "moments_merge",
    """
    WITH partials AS (
      SELECT CAST(ts AS DATE) AS day,
             COUNT(value) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s1,
             SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               AS s2
      FROM events
      GROUP BY day
    ),
    merged AS (
      SELECT SUM(n) AS n, SUM(s1) AS s1, SUM(s2) AS s2 FROM partials
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(ROUND(CAST(s1 AS DOUBLE) / n, 6) AS DOUBLE) AS mean_value,
           CAST(ROUND((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1), 6) AS DOUBLE) AS var_value
    FROM merged
    """,
    doc="Mergeable moments: per-day (n, sum, sum-of-squares) partials in "
    "exact decimal, merged into global mean/variance — the incremental-"
    "warehouse pattern for keeping statistics up to date without "
    "rescanning history. Decimal partials make the merge associative AND "
    "bit-exact, so incremental == from-scratch.",
)
def q_moments_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,6)")
    partials = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("value").alias("n"),
        F.sum(vdec).alias("s1"),
        F.sum(vdec * vdec).alias("s2"),
    )
    merged = partials.agg(
        F.sum("n").alias("n"), F.sum("s1").alias("s1"), F.sum("s2").alias("s2")
    )
    return merged.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("s1").cast("double") / F.col("n"), 6)
        .cast("double")
        .alias("mean_value"),
        F.round(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1),
            6,
        )
        .cast("double")
        .alias("var_value"),
    )


# --------------------------------------------------------------------------
# Star-schema build at benchmark scale (registered after the verification
# window; exercised by bench.py so regressions in the scale-mode fact path
# are visible per-round)
# --------------------------------------------------------------------------


@register(
    "star_build",
    """
    WITH silver AS (
      SELECT o.o_orderkey AS id, c.c_name AS user_name,
             o.o_orderpriority AS product_category, n.n_name AS region,
             o.o_orderstatus AS customer_status,
             CAST(o.o_orderkey % 100 AS INT) AS transaction_count
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS fact_rows,
           CAST(COUNT(*) AS BIGINT) AS distinct_fact_ids,
           CAST(SUM(transaction_count) AS BIGINT) AS sum_txn,
           CAST(COUNT(DISTINCT user_name) AS BIGINT) AS fact_customers,
           CAST(COUNT(DISTINCT product_category) AS BIGINT) AS fact_products,
           CAST(COUNT(DISTINCT region) AS BIGINT) AS fact_regions,
           CAST(COUNT(DISTINCT customer_status) AS BIGINT) AS fact_statuses,
           CAST(COUNT(DISTINCT user_name) AS BIGINT) AS dim_customers,
           MIN(user_name) AS first_customer,
           MAX(user_name) AS last_customer,
           CAST(COUNT(DISTINCT product_category) AS BIGINT) AS dim_products,
           CAST(COUNT(DISTINCT region) AS BIGINT) AS dim_regions,
           CAST(COUNT(DISTINCT customer_status) AS BIGINT) AS dim_statuses
    FROM silver
    """,
    doc="Full star-schema build (4 dim upserts + broadcast fact load, "
    "scale-mode shuffle-free fact ids) over an orders-derived silver frame, "
    "summarised to one SQL-checkable row: fact count, fact_id uniqueness "
    "(distinct_fact_ids must equal fact_rows — the oracle emits COUNT(*) "
    "for both, so any monotonically_increasing_id collision mismatches), "
    "surrogate-key join resolution (fact_* distinct id counts must equal "
    "the base-table key cardinalities), and dim contents (cardinality + "
    "min/max natural key per the customer dim). Reference parity: "
    "init_database.py:272-347 fn_dm_data_load.",
)
def q_star_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_spark.star import build_star

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    silver = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("c_name").alias("user_name"),
            F.col("o_orderpriority").alias("product_category"),
            F.col("n_name").alias("region"),
            F.col("o_orderstatus").alias("customer_status"),
            (F.col("o_orderkey") % 60 + 20).cast("int").alias("age"),
            F.col("o_totalprice").cast("decimal(15,2)").alias("salary"),
            (F.col("o_totalprice") / 10)
            .cast("decimal(15,2)")
            .alias("purchase_amount"),
            (F.col("o_orderkey") % 100).cast("int").alias("transaction_count"),
            F.to_date("o_orderdate").alias("effective_from"),
            F.date_add(F.to_date("o_orderdate"), 30).alias("effective_to"),
            F.lit(True).alias("current_flag"),
        )
    )
    star = build_star(silver)
    fact_summary = star.fact.agg(
        F.count(F.lit(1)).cast("long").alias("fact_rows"),
        F.countDistinct("fact_id").cast("long").alias("distinct_fact_ids"),
        F.sum("transaction_count").cast("long").alias("sum_txn"),
        F.countDistinct("customer_id").cast("long").alias("fact_customers"),
        F.countDistinct("product_id").cast("long").alias("fact_products"),
        F.countDistinct("region_id").cast("long").alias("fact_regions"),
        F.countDistinct("status_id").cast("long").alias("fact_statuses"),
    )
    cust = star.dims["dim_customer"].agg(
        F.count(F.lit(1)).cast("long").alias("dim_customers"),
        F.min("customer_name").alias("first_customer"),
        F.max("customer_name").alias("last_customer"),
    )
    prod = star.dims["dim_product"].agg(
        F.count(F.lit(1)).cast("long").alias("dim_products")
    )
    reg = star.dims["dim_region"].agg(
        F.count(F.lit(1)).cast("long").alias("dim_regions")
    )
    stat = star.dims["dim_status"].agg(
        F.count(F.lit(1)).cast("long").alias("dim_statuses")
    )
    return (
        fact_summary.crossJoin(F.broadcast(cust))
        .crossJoin(F.broadcast(prod))
        .crossJoin(F.broadcast(reg))
        .crossJoin(F.broadcast(stat))
    )


_WEIGHTED_K = 50

# Efraimidis–Spirakis weighted sampling with a deterministic md5 uniform:
# priority = u^(1/w); the top-K priorities ARE a weighted sample without
# replacement. u derives from md5(doc_id) so membership is a pure function
# of the row — reproducible at any partition count, mergeable across
# shards (each shard keeps a local top-K; the global top-K of locals is
# exact — the same TakeOrderedAndProject shape Spark already plans).
_SQL_MD5_U = """
    (CAST(list_sum(list_transform(range(1, 9),
        k -> (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), CAST(k AS INT), 1)) - 1)
             * CAST(power(16, 8 - k) AS BIGINT))) AS BIGINT) + 1.0) / 4294967297.0
"""


@register(
    "weighted_sample",
    f"""
    SELECT doc_id, n_chars,
           ROUND(pow({_SQL_MD5_U}, 1.0 / n_chars), 6) AS priority
    FROM documents
    WHERE n_chars > 0
    ORDER BY ROUND(pow({_SQL_MD5_U}, 1.0 / n_chars), 6) DESC, doc_id
    LIMIT {_WEIGHTED_K}
    """,
    doc="Deterministic weighted sample without replacement (Efraimidis-"
    "Spirakis A-Res): priority = u^(1/weight) with an md5-derived uniform, "
    "weight = n_chars. Top-k by priority == weighted sample; plans as "
    "TakeOrderedAndProject (per-partition local top-k, k rows merged) — "
    "coordination-free and reproducible at any scale.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.expr(
            "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
        )
        + 1.0
    ) / 4294967297.0
    pr = F.round(F.pow(u, 1.0 / F.col("n_chars")), 6)
    return (
        d.filter(F.col("n_chars") > 0)
        .select("doc_id", "n_chars", pr.alias("priority"))
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(_WEIGHTED_K)
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion of lexical + semantic lists
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_POOL = 50  # candidates taken from each modality before fusion

# Same element-wise construction as queries_llm._SQL_COSINE (sequential
# left fold, 6dp round) — inlined rather than imported so this module's
# import cannot reorder registration of the llm family. Mirrors the
# NULL-on-degenerate contract of operators.similarity.cosine(): NULLIF
# maps a zero-norm denominator to NULL like Spark's try_divide, the isnan
# CASE maps NaN to NULL like nanvl (value-identical on clean corpora).
_SQL_COS_RRF_RAW = """
    (list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
      / NULLIF(sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(range(1, len(q.embedding) + 1),
           i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))), 0))
"""

_SQL_COS_RRF = f"""
    ROUND((CASE WHEN isnan({_SQL_COS_RRF_RAW}) THEN NULL
           ELSE {_SQL_COS_RRF_RAW} END), 6)
"""


@register(
    "rrf_hybrid_search",
    f"""
    WITH {_SQL_BM25_SCORED},
    lex_top AS (
      SELECT doc_id, ROUND(score, 6) AS s FROM scored
      ORDER BY ROUND(score, 6) DESC, doc_id LIMIT {_RRF_POOL}
    ),
    lexr AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
      FROM lex_top
    ),
    sem AS (
      SELECT e.vec_id AS doc_id, {_SQL_COS_RRF} AS s
      FROM embeddings e,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ),
    sem_top AS (
      SELECT doc_id, s FROM sem ORDER BY s DESC, doc_id LIMIT {_RRF_POOL}
    ),
    semr AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
      FROM sem_top
    )
    SELECT doc_id,
           ROUND(COALESCE(1.0 / ({_RRF_K} + l.r), 0.0)
                 + COALESCE(1.0 / ({_RRF_K} + sm.r), 0.0), 6) + 0.0 AS rrf
    FROM lexr l FULL JOIN semr sm USING (doc_id)
    ORDER BY rrf DESC, doc_id LIMIT 20
    """,
    doc="Hybrid retrieval: BM25 lexical ranks fused with embedding-cosine "
    "semantic ranks by reciprocal rank fusion (k=60). Each modality "
    "contributes its top-50 via TakeOrderedAndProject (per-partition "
    "heaps, no global sort of the corpus); the ROW_NUMBER windows then "
    "run on 50-row bounded frames — single-partition by construction of "
    "the pool size, not of the data. Fusion is a full outer join of two "
    "k-row frames. Ranks are taken on 6dp-ROUNDED scores with id "
    "tie-break so both engines order identically.",
)
def q_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_spark.operators.similarity import cosine

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")

    lex_top = (
        _bm25_scored(d)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_RRF_POOL)
    )
    lexr = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("lr"),
    )

    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    qarr = F.expr(_sx.dbl_array(qvec))
    sem_top = (
        e.select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), qarr), 6).alias("cs"),
        )
        .orderBy(F.desc("cs"), F.asc("doc_id"))
        .limit(_RRF_POOL)
    )
    semr = sem_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cs"), F.asc("doc_id")))
        .alias("sr"),
    )

    fused = lexr.join(semr, ["doc_id"], "full")
    rrf = (
        F.round(
            F.coalesce(F.lit(1.0) / (_RRF_K + F.col("lr")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("sr")), F.lit(0.0)),
            6,
        )
        + F.lit(0.0)
    )
    return (
        fused.select("doc_id", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Behavioral path analysis
# --------------------------------------------------------------------------

_PATH_LEN, _PATH_TOPK = 5, 10


@register(
    "session_paths",
    f"""
    WITH s AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:{_PATH_LEN}], '>')
               AS path
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM s GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT {_PATH_TOPK}
    """,
    doc="Top user journeys: each (user, day) session's first 5 events "
    "joined into a path string, ranked by frequency. Event order inside "
    "a session is pinned by (ts, event_id) — collect_list is "
    "partition-order-nondeterministic, so the Spark side array_sorts "
    "structs keyed the same way before slicing, making both engines "
    "deterministic. Two partial-agg reductions + TakeOrdered; per-key "
    "state is one bounded day of events.",
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    seq = (
        e.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.struct("ts", "event_id", "event_type").alias("s"),
        )
        .groupBy("user_id", "day")
        .agg(F.array_sort(F.collect_list("s")).alias("seq"))
    )
    path = F.array_join(
        F.transform(
            F.slice("seq", 1, _PATH_LEN), lambda x: x["event_type"]
        ),
        ">",
    )
    return (
        seq.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_PATH_TOPK)
    )


_NDCG_K = 10


@register(
    "ndcg_bm25",
    f"""
    WITH {_SQL_BM25_SCORED},
    rel AS (
      SELECT doc_id,
             CAST((CASE WHEN ' ' || text || ' ' LIKE '% spark %' THEN 1 ELSE 0 END)
                + (CASE WHEN ' ' || text || ' ' LIKE '% join %' THEN 1 ELSE 0 END)
                + (CASE WHEN ' ' || text || ' ' LIKE '% hash %' THEN 1 ELSE 0 END)
               AS BIGINT) AS rel
      FROM documents
    ),
    ranked AS (
      SELECT s.doc_id, r.rel,
             ROW_NUMBER() OVER (ORDER BY ROUND(s.score, 6) DESC, s.doc_id)
               AS pos
      FROM scored s JOIN rel r USING (doc_id)
      QUALIFY pos <= {_NDCG_K}
    ),
    ideal AS (
      SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS pos
      FROM rel QUALIFY pos <= {_NDCG_K}
    ),
    dcg_t AS (
      SELECT SUM((POWER(2.0e0, rel) - 1.0e0) / LN(pos + 1.0e0)) AS dcg
      FROM ranked
    ),
    idcg_t AS (
      SELECT SUM((POWER(2.0e0, rel) - 1.0e0) / LN(pos + 1.0e0)) AS idcg
      FROM ideal
    )
    SELECT ROUND(dcg, 6) + 0.0 AS dcg,
           ROUND(idcg, 6) + 0.0 AS idcg,
           ROUND(dcg / idcg, 6) + 0.0 AS ndcg_at_10
    FROM dcg_t CROSS JOIN idcg_t
    """,
    doc="NDCG@10 of the BM25 ranking against graded term-coverage "
    "relevance (rel = number of query terms present, 0-3): the "
    "standard retrieval-quality readout, self-contained because the "
    "ground truth derives from the same corpus. Gains use the "
    "exponential 2^rel - 1 form; the ln(pos+1) discount divides out "
    "of the ratio's base, so engines need only agree on LN of small "
    "integers (they do — IEEE). Both rankings are "
    "TakeOrderedAndProject top-10 frames; the whole computation after "
    "scoring touches 20 rows.",
)
def q_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    scored = _bm25_scored(d)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    rel_expr = sum(
        F.when(padded.like(f"% {t} %"), 1).otherwise(0)
        for t in _BM25_TERMS
    ).cast("long")
    rel = d.select("doc_id", rel_expr.alias("rel"))
    ranked = (
        scored.join(rel, "doc_id")
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_NDCG_K)
        .withColumn(
            "pos", F.row_number().over(W.orderBy(F.desc("bm25"), "doc_id"))
        )
    )
    ideal = (
        rel.orderBy(F.desc("rel"), "doc_id")
        .limit(_NDCG_K)
        .withColumn(
            "pos", F.row_number().over(W.orderBy(F.desc("rel"), "doc_id"))
        )
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log(
        F.col("pos") + 1.0
    )
    dcg = F.broadcast(ranked.agg(F.sum(gain).alias("dcg")))
    idcg = F.broadcast(ideal.agg(F.sum(gain).alias("idcg")))
    return dcg.crossJoin(idcg).select(
        (F.round(F.col("dcg"), 6) + F.lit(0.0)).alias("dcg"),
        (F.round(F.col("idcg"), 6) + F.lit(0.0)).alias("idcg"),
        (F.round(F.col("dcg") / F.col("idcg"), 6) + F.lit(0.0)).alias(
            "ndcg_at_10"
        ),
    )


_POSTING_TOPK = 50


@register(
    "posting_lists",
    f"""
    WITH toks AS ({_SQL_TOKS}),
    t2 AS (SELECT DISTINCT term, doc_id FROM toks WHERE term <> ''),
    top AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq
      FROM t2 GROUP BY term
      ORDER BY doc_freq DESC, term LIMIT {_POSTING_TOPK}
    )
    SELECT t.term, t.doc_freq,
           array_to_string(list(t2.doc_id ORDER BY t2.doc_id), ',')
             AS postings
    FROM top t JOIN t2 USING (term)
    GROUP BY t.term, t.doc_freq
    ORDER BY t.doc_freq DESC, t.term
    """,
    doc="Inverted-index build: per term, the sorted posting list of "
    "documents containing it (top-50 terms by document frequency) — "
    "the construction step behind every keyword-retrieval operator "
    "here (BM25, TF-IDF, hybrid search). Postings are emitted as the "
    "canonical comma-joined sorted string so the driver can hash them "
    "(the array_agg_ops lesson). Shape: explode -> distinct -> "
    "partial-agg; the per-term collect is bounded by the term's "
    "posting size, the object a real index shard stores anyway.",
)
def q_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t2 = _tokens(d).select("term", "doc_id").distinct()
    top = (
        t2.groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "term")
        .limit(_POSTING_TOPK)
    )
    return (
        top.join(t2, "term")
        .groupBy("term", "doc_freq")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings")
        )
        .orderBy(F.desc("doc_freq"), "term")
    )


_PRF_FEEDBACK_K, _PRF_TERMS = 10, 5


@register(
    "prf_expansion_terms",
    f"""
    WITH {_SQL_BM25_SCORED},
    fb AS (
      SELECT doc_id FROM scored
      ORDER BY ROUND(score, 6) DESC, doc_id LIMIT {_PRF_FEEDBACK_K}
    ),
    alltoks AS ({_SQL_TOKS}),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    cand AS (
      SELECT t.term,
             CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS r
      FROM alltoks t JOIN fb USING (doc_id)
      WHERE t.term <> ''
        AND t.term NOT IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      GROUP BY t.term
    ),
    dfreq AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM alltoks WHERE term <> '' GROUP BY term
    )
    SELECT c.term, c.r AS feedback_df, d.df AS corpus_df,
           ROUND(c.r * LN((nd.n - d.df + 0.5e0) / (d.df + 0.5e0)), 6)
             + 0.0 AS rsj_score
    FROM cand c JOIN dfreq d USING (term) CROSS JOIN nd
    ORDER BY rsj_score DESC, c.term LIMIT {_PRF_TERMS}
    """,
    doc="Pseudo-relevance-feedback query expansion: the top-5 terms "
    "from the BM25 top-10 feedback documents, scored by feedback "
    "document frequency times the Robertson-Sparck-Jones idf — the "
    "classic automatic query-expansion step between first-pass "
    "retrieval and re-ranking. Original query terms are excluded. "
    "Shape: the feedback set is a top-k frame; candidate terms reduce "
    "to the feedback vocabulary (tiny) and join the corpus df dim by "
    "term key.",
)
def q_prf_expansion_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fb = (
        _bm25_scored(d)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_PRF_FEEDBACK_K)
        .select("doc_id")
    )
    toks = _tokens(d).filter(
        (F.col("term") != "") & (~F.col("term").isin(*_BM25_TERMS))
    )
    nd = F.broadcast(d.agg(F.count(F.lit(1)).alias("n")))
    cand = (
        toks.join(F.broadcast(fb), "doc_id")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("r"))
    )
    dfreq = (
        _tokens(d)
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return (
        cand.join(dfreq, "term")
        .crossJoin(nd)
        .select(
            "term",
            F.col("r").alias("feedback_df"),
            F.col("df").alias("corpus_df"),
            (
                F.round(
                    F.col("r")
                    * F.log(
                        (F.col("n") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("rsj_score"),
        )
        .orderBy(F.desc("rsj_score"), "term")
        .limit(_PRF_TERMS)
    )
