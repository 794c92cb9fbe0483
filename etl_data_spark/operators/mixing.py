"""Data-mixing importance weights (DSIR), deterministic weighted
selection, and the interpolated-bigram perplexity gate — the stage
between dedup and packing that decides WHICH surviving documents enter
the training mix (and at what quality bar).

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS) scores each raw document by the
log-likelihood ratio of a TARGET corpus vs the RAW corpus under hashed
n-gram (unigram + bigram) bag models, then resamples raw documents with
probability proportional to the ratio. Everything here is pure Column
arithmetic over the repo's portable md5-prefix hash convention
(operators/dedup.py module docstring) so the whole pipeline has a
bit-identical DuckDB mirror:

- features: word unigrams + bigrams, hashed into ``n_buckets`` buckets
  (the hashing trick — no vocabulary pass, executors encode
  independently at any scale);
- bucket models: Laplace-smoothed counts ``p[b] = (c_t[b]+1)/(N_t+B)``
  for the target and ``q[b]`` for the raw corpus; the per-bucket log
  ratio is ONE log of a ratio of double products (each factor an exact
  integer < 2^53 — IEEE-identical in both engines, and int64-overflow
  free at 100 TB counts), rounded to 9 dp and carried as DECIMAL so
  the per-document fold is order-independent (float group-sums are not
  associative across partitionings);
- selection: Gumbel-top-k with HASH-DERIVED uniforms (the
  ``generate.py`` discipline — seeded by doc id, so both engines and
  any cluster layout replay the identical sample). Gumbel-top-k with
  key ``log w(d) + G(d)`` is exactly weighted sampling without
  replacement proportional to ``w`` (Efraimidis & Spirakis 2006).

Scale shape (100 TB): one token-stream explode -> map-side-combined
groupBy over ``n_buckets`` buckets (tiny) -> broadcast of the B-row
log-ratio table back onto the gram stream -> one doc-keyed shuffle for
the per-doc fold -> a TakeOrderedAndProject top-k. No all-pairs stage,
no vocabulary collect, no Python in the row path.

Reference analogue: none — the reference has no selection/weighting
surface; this is the beyond-reference curation stack (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LR_DECIMAL = "decimal(20,9)"


def _md5_32(col: F.Column) -> F.Column:
    """First 8 md5 hex digits as a non-negative bigint — the repo's
    engine-portable hash (see feature_hashing's oracle twin)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hashed_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """(doc_id, b): one row per word unigram AND bigram occurrence,
    hashed to its bucket. The DSIR feature stream."""
    # r13 optimization (guide §4.1): the bigram array was built by an
    # INTERPRETED transform() lambda per document before the explode;
    # indexing positions 1..2*size-1 through one codegen'd posexplode
    # (k <= size -> unigram k, k > size -> bigram k-size) emits the
    # identical gram stream (same rows, same per-doc order) with no
    # interpreted HOF in the corpus path. Map-only shape unchanged.
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    gram = F.when(
        F.col("_k") <= F.size("_ws"), F.element_at("_ws", F.col("_k"))
    ).otherwise(
        F.concat_ws(
            " ",
            F.element_at("_ws", F.col("_k") - F.size("_ws")),
            F.element_at("_ws", F.col("_k") - F.size("_ws") + 1),
        )
    )
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("doc_id"), ws.alias("_ws"))
        .select(
            "doc_id",
            F.col("_ws"),
            F.posexplode(
                F.sequence(F.lit(1), F.size("_ws") * 2 - 1)
            ).alias("_i", "_k"),
        )
        .select(
            "doc_id",
            (_md5_32(F.concat(F.lit("dsir:"), gram)) % n_buckets)
            .cast("int")
            .alias("b"),
        )
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """(b, log_ratio): per-bucket Laplace-smoothed target-vs-raw
    log-likelihood ratio — the fitted DSIR importance model, a
    ``n_buckets``-row frame. ``log_ratio`` is DECIMAL(20,9): one log of
    ((c_t+1)(N_r+B)) / ((c_r+1)(N_t+B)) with each factor cast to double
    first (exact below 2^53, overflow-free), rounded once, so
    downstream sums are order-independent."""
    rg = hashed_grams(raw, text_col, id_col, n_buckets)
    tg = hashed_grams(target, text_col, id_col, n_buckets)
    return _ratios_from(rg, tg, n_buckets)


def _ratios_from(rg: DataFrame, tg: DataFrame, n_buckets: int) -> DataFrame:
    """Ratio table from pre-hashed gram streams — lets a consumer that
    also folds the raw stream per-doc (:func:`dsir_importance`) hash the
    corpus ONCE instead of twice."""
    rc = rg.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tc = tg.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    totals = (
        rc.agg(F.sum("cr").alias("nr"))
        .crossJoin(tc.agg(F.sum("ct").alias("nt")))
    )
    return (
        rc.join(tc, "b", "full")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",  # USING-join key: already coalesced across both sides
            # each factor casts to double BEFORE multiplying: a bigint
            # product of two ~1e13 counts overflows int64 at 100 TB;
            # doubles are IEEE-identical across engines and each factor
            # is an exact integer < 2^53
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        * (F.col("nr") + n_buckets).cast("double")
                    )
                    / (
                        (F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double")
                        * (F.col("nt") + n_buckets).cast("double")
                    )
                ),
                9,
            )
            .cast(_LR_DECIMAL)
            .alias("log_ratio"),
        )
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    target_pred: "F.Column | None" = None,
) -> DataFrame:
    """(doc_id, log_weight): per-raw-document DSIR importance — the sum
    of its grams' bucket log ratios (the document's log-likelihood under
    the target model minus the raw model). DECIMAL end-to-end; cast at
    the consumer if a double is wanted.

    The raw gram stream feeds BOTH the ratio model and the per-doc fold
    — it is hashed once and pinned (md5-per-gram is the dominant cost;
    computing it twice measured ~2x on the bench row). When the target
    is a SLICE of the raw corpus, pass ``target_pred`` (a doc_id-level
    predicate) instead of a ``target`` frame: the target stream then
    filters the pinned raw stream — zero extra hashing."""
    from pyspark.storagelevel import StorageLevel

    from etl_data_spark.caching import pin

    if (target is None) == (target_pred is None):
        raise ValueError(
            "dsir_importance: pass exactly one of target / target_pred"
        )
    rg = pin(
        hashed_grams(raw, text_col, id_col, n_buckets),
        StorageLevel.MEMORY_AND_DISK,
    )
    tg = (
        rg.filter(target_pred)
        if target_pred is not None
        else hashed_grams(target, text_col, id_col, n_buckets)
    )
    lr = _ratios_from(rg, tg, n_buckets)
    return (
        rg.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.sum("log_ratio").alias("log_weight"))
    )


def dsir_select_topk(
    raw: DataFrame,
    target: DataFrame | None = None,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: str = "dsir-gumbel",
    target_pred: "F.Column | None" = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``k`` raw documents with
    probability proportional to their DSIR importance weight — via
    Gumbel-top-k: key(d) = log w(d) + Gumbel(hash-uniform(d)), take the
    k largest (Efraimidis & Spirakis 2006). The uniform derives from
    md5(seed, doc id), so the sample is deterministic across engines,
    retries, and cluster layouts — the property a resumable 100 TB
    selection job needs. Returns (doc_id, log_weight, gumbel_key),
    ``gumbel_key`` rounded to 6 dp (the sort key).

    Plan: the importance frame + one TakeOrderedAndProject — no global
    sort."""
    w = dsir_importance(
        raw, target, text_col, id_col, n_buckets, target_pred=target_pred
    )
    u = (
        _md5_32(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
        % F.lit(1000000000)
        + 0.5
    ) / 1000000000.0
    key = F.round(
        F.col("log_weight").cast("double") + (-F.log(-F.log(u))), 6
    )
    return (
        w.select(
            "doc_id",
            F.round(F.col("log_weight").cast("double"), 6).alias(
                "log_weight"
            ),
            key.alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
        .limit(k)
    )


def _word_bigrams(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, w1, w2): one row per adjacent word pair."""
    # r13 optimization (guide §4.1): posexplode(sequence) + element_at —
    # codegen'd — replaces the interpreted transform() struct build; the
    # emitted (doc_id, w1, w2) rows are identical. size >= 2 is gated by
    # the sequence bound (size*1 - 1 >= 1), matching the old F.when.
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.filter(
            (F.length(F.trim(F.col(text_col))) > 0) & (F.size(ws) >= 2)
        )
        .select(F.col(id_col).alias("doc_id"), ws.alias("_ws"))
        .select(
            "doc_id",
            F.col("_ws"),
            F.posexplode(
                F.sequence(F.lit(1), F.size("_ws") - 1)
            ).alias("_j", "_i"),
        )
        .select(
            "doc_id",
            F.element_at("_ws", F.col("_i")).alias("w1"),
            F.element_at("_ws", F.col("_i") + 1).alias("w2"),
        )
    )


def lm_perplexity(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document perplexity under an interpolated bigram LM fit on a
    TARGET corpus — the CCNet-style quality gate (Wenzek et al. 2020
    score with a KenLM model; here a Jelinek-Mercer-interpolated bigram
    model, the same gate shape with an exactly-replayable estimator):

        p(w2 | w1) = lam * c(w1 w2)/c(w1)  +  (1-lam) * (c(w2)+1)/(N+V)

    (target counts; the unigram term is Laplace-smoothed so unseen words
    score finitely). Output: (doc_id, n_bigrams, avg_nll, ppl) — low
    perplexity = target-like text; thresholding ``ppl`` is the gate.
    Docs with < 2 tokens emit no row (no bigram evidence).

    Cross-engine float discipline: per-bigram log-probs are one ``ln``
    of an identically-written double expression, rounded once to 9 dp
    and summed as DECIMAL (order-independent under any partitioning);
    the per-doc mean divides as doubles and rounds at the emit boundary.

    Scale shape: the model is two target-corpus count frames (unigrams,
    bigrams) joined onto the raw bigram stream + one doc-keyed fold. No
    vocabulary collect, no UDF, no driver loop. The TARGET corpus in
    this gate is a curated reference set (the CCNet deployment: a
    Wikipedia-sized sample, not the raw corpus), so the model frames are
    bounded by convention and broadcast by default; pass
    ``broadcast_model=False`` for an unbounded target and the planner
    demotes the model joins to shuffles."""
    tb = _word_bigrams(target, text_col, id_col)
    big = tb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni_first = tb.select(F.col("w1").alias("w"))
    # unigram counts over the target token stream (count every token:
    # each bigram contributes its first word, plus the final word of
    # each doc)
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = (
        target.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(ws).alias("w"))
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = uni.agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("v_types"),
    )
    rb = _word_bigrams(raw, text_col, id_col)
    maybe_bc = F.broadcast if broadcast_model else (lambda d: d)
    j = (
        rb.join(maybe_bc(big), ["w1", "w2"], "left")
        .join(
            maybe_bc(uni.select(F.col("w").alias("w1"),
                                F.col("c").alias("c1"))),
            "w1",
            "left",
        )
        .join(
            maybe_bc(uni.select(F.col("w").alias("w2"),
                                F.col("c").alias("c2"))),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    term1 = F.when(
        F.col("c12").isNotNull() & (F.coalesce("c1", F.lit(0)) > 0),
        F.lit(lam)
        * (F.col("c12").cast("double") / F.col("c1").cast("double")),
    ).otherwise(F.lit(0.0))
    term2 = F.lit(1.0 - lam) * (
        (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
        / (F.col("n_tokens") + F.col("v_types")).cast("double")
    )
    lp = F.round(F.log(term1 + term2), 9).cast(_LR_DECIMAL)
    agg = j.select("doc_id", lp.alias("lp")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp").alias("s"),
    )
    avg_nll = F.round(
        -(F.col("s").cast("double")) / F.col("n_bigrams"), 6
    )
    return agg.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        avg_nll.alias("avg_nll"),
        F.round(F.exp(avg_nll), 4).alias("ppl"),
    )
