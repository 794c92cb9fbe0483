"""Unigram-LM (SentencePiece) tokenization: Viterbi segmentation under a
piece-probability table, plus a deterministic Viterbi-EM trainer.

Kudo 2018 ("Subword Regularization", ACL; the SentencePiece unigram
model): a word's tokenization is the piece sequence maximizing the sum
of piece log-probabilities — found by Viterbi DP over the word's
character positions. This module is the engine's second tokenizer
family beside BPE (operators/bpe.py), built in the SAME vocab-frame
shape the r13 BPE rework established:

1. the corpus reduces once to its DISTINCT words;
2. every word explodes its candidate spans (substrings up to
   ``max_piece_len``) — one bounded explode over the vocab frame;
3. spans join the piece table for log-probs (broadcast for bounded
   vocabularies), then fold into ONE map column per word;
4. Viterbi DP runs as ``L`` narrow Column steps over the vocab frame
   (L = longest word, lineage-truncated every few steps — expression
   depth is bounded by the truncation stride, never by L);
5. backtracking is another L bounded steps;
6. ONE broadcast join of (word -> pieces) back to the position-exploded
   corpus (shared with the BPE apply side).

Determinism: log-probs are rounded to 9 dp at table construction and
accumulated in DP order (best[i] = best[j-1] + lp, the same addition
sequence in every engine), ties break to the SHORTEST last piece
(largest split point j) then nothing else is needed (j is unique per
candidate) — so a DuckDB oracle replays the full DP bit-for-bit.

Scale: everything data-sized is one distinct-words aggregation, one
span explode over the vocab frame (|vocab| x O(L * max_piece_len)
rows), and the final corpus join — no UDF, no driver loop over data,
no per-row Python. Reference analogue: none (the reference has no
tokenizer surface); beyond-reference curation stack, SURVEY §2.8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_spark.caching import truncate_lineage

_NEG_INF = -1.0e18


def word_spans(
    words: DataFrame,
    word_col: str = "w",
    max_piece_len: int = 8,
) -> DataFrame:
    """(w, j, i, sub): every candidate piece span of every word —
    1-based inclusive character positions, ``i - j + 1 <=
    max_piece_len``. One bounded explode over the vocab frame."""
    base = words.filter(F.length(word_col) > 0).select(
        F.col(word_col).alias("w")
    )
    # r13 optimization (guide §4.1): two chained codegen'd posexplodes
    # (end position i, then split point j) replace the doubly-nested
    # interpreted transform()+flatten build; the (w, j, i, sub) rows and
    # their per-word order (i ascending, then j ascending) are
    # identical. substring() is evaluated in WholeStageCodegen.
    return (
        base.select(
            "w",
            F.posexplode(
                F.sequence(F.lit(1), F.length("w"))
            ).alias("_a", "i"),
        )
        .select(
            "w",
            "i",
            F.posexplode(
                F.sequence(
                    F.greatest(F.lit(1), F.col("i") - (max_piece_len - 1)),
                    F.col("i"),
                )
            ).alias("_b", "j"),
        )
        .select(
            "w",
            "j",
            "i",
            F.expr("substring(w, j, i - j + 1)").alias("sub"),
        )
    )


def seed_pieces(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_count: int = 5,
) -> DataFrame:
    """(piece, logp): a deterministic seed piece table — all substrings
    of corpus words up to ``max_piece_len`` chars occurring at least
    ``min_count`` times (weighted by word occurrences), UNION all single
    characters (the fallback that keeps every word segmentable).
    ``logp = round(ln(cnt / total), 9)`` over the retained table —
    exactly replayable in SQL, the unigram analogue of the seeded PQ
    codebooks."""
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    words = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(ws).alias("w"))
        .filter(F.length("w") > 0)
    )
    spans = word_spans(words, "w", max_piece_len)
    counts = spans.groupBy(F.col("sub").alias("piece")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    kept = counts.filter(
        (F.col("cnt") >= min_count) | (F.length("piece") == 1)
    )
    total = kept.agg(F.sum("cnt").alias("tot"))
    return kept.crossJoin(F.broadcast(total)).select(
        "piece",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("tot").cast("double")),
            9,
        ).alias("logp"),
    )


def segment_words_viterbi(
    words: DataFrame,
    pieces: DataFrame,
    word_col: str = "w",
    out_col: str = "pieces",
    max_piece_len: int = 8,
    max_word_len: int = 16,
    truncate_every: int = 4,
    broadcast_pieces: bool = True,
) -> DataFrame:
    """Viterbi-segment a distinct-word frame under a (piece, logp)
    table. Returns (word_col, out_col: array<string>).

    DP: ``best[i] = max_j best[j-1] + logp(sub(j, i))`` over split
    points ``j`` within ``max_piece_len``; ties prefer the LARGEST j
    (shortest last piece). Spans absent from the piece table score
    -inf; any word is always segmentable when the table contains its
    single characters (``seed_pieces`` guarantees that for its own
    corpus). Words longer than ``max_word_len`` raise — the bound is
    what makes the DP a FIXED number of narrow Column steps (and the
    oracle a fixed CTE unroll); raise it explicitly for long-token
    corpora."""
    spark = words.sparkSession
    over = words.filter(F.length(word_col) > max_word_len).limit(1).collect()
    if over:
        raise ValueError(
            f"segment_words_viterbi: word {over[0][0]!r} exceeds "
            f"max_word_len={max_word_len} — raise the bound (the DP "
            "runs max_word_len bounded steps)."
        )
    spans = word_spans(
        words.select(F.col(word_col).alias("w")), "w", max_piece_len
    )
    p = pieces.select(F.col("piece").alias("sub"), "logp")
    if broadcast_pieces:
        p = F.broadcast(p)
    lp_map = (
        spans.join(p, "sub")
        .groupBy("w")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.concat_ws(",", F.col("j"), F.col("i")).alias("k"),
                        F.col("logp").cast("double").alias("v"),
                    )
                )
            ).alias("_lp")
        )
    )
    # vocab frame: (w, _lp, _best array<double>, _ptr array<int>)
    # _best[k] (0-based k = position i) carries best[i]; _ptr[k] the
    # argmax split point j at i (0 = unreachable)
    vf = words.select(F.col(word_col).alias("w")).join(lp_map, "w", "left")
    vf = vf.select(
        "w",
        F.coalesce(
            "_lp", F.map_from_entries(F.array().cast(
                "array<struct<k:string,v:double>>"))
        ).alias("_lp"),
    )
    # r13 optimization: the DP and backtrack loops used to run as
    # max_word_len narrow Projects EACH, lineage-truncated every
    # ``truncate_every`` steps (8 localCheckpoint jobs + ~32 py4j-built
    # projections at the default L=16). Both walks are ordered left
    # folds with loop-carried state, which is exactly what ONE
    # ``aggregate(sequence(1, L), state, step)`` expression computes —
    # same additions in the same order against the same _lp lookups, so
    # scores/pointers/pieces are bit-identical; the vocab-frame plan is
    # now a single Project and the checkpoints (and the Catalyst
    # expression-multiplication hazard they guarded) are gone entirely.
    # ``truncate_every`` is retained in the signature for call
    # compatibility; it no longer affects the plan.
    del truncate_every
    dp = f"""
    aggregate(
      sequence(1, {max_word_len}),
      named_struct('best', array(0.0D), 'ptr', array(0)),
      (st, i) -> IF(length(w) >= i,
        aggregate(
          filter(
            transform(sequence(greatest(1, i - {max_piece_len - 1}), i),
              j -> named_struct(
                'score',
                element_at(st.best, j)
                  + coalesce(element_at(_lp,
                      concat_ws(',', CAST(j AS STRING), CAST(i AS STRING))),
                      {_NEG_INF!r}D),
                'j', j)),
            c -> c.score > {_NEG_INF / 2!r}D),
          named_struct('score', {_NEG_INF!r}D, 'j', 0),
          (acc, c) -> IF(c.score >= acc.score, c, acc),
          b -> named_struct(
            'best', concat(st.best, array(b.score)),
            'ptr', concat(st.ptr, array(b.j)))),
        st))
    """
    vf = vf.select("w", F.expr(dp).alias("_dp"))
    bt = f"""
    aggregate(
      sequence(1, {max_word_len}),
      named_struct(
        'pos', length(w),
        'acc', CAST(array() AS ARRAY<STRING>)),
      (st, s) -> IF(st.pos > 0,
        IF(element_at(_dp.ptr, st.pos + 1) > 0,
          named_struct(
            'pos', element_at(_dp.ptr, st.pos + 1) - 1,
            'acc', concat(
              array(substring(w, element_at(_dp.ptr, st.pos + 1),
                              st.pos - element_at(_dp.ptr, st.pos + 1) + 1)),
              st.acc)),
          named_struct('pos', -1, 'acc', st.acc)),
        st))
    """
    # _pos lands at 0 (fully segmented) or -1 (unreachable somewhere:
    # emit empty — callers with char-complete tables never hit it)
    return vf.select(
        F.col("w"),
        F.expr(bt).alias("_bt"),
    ).select(
        F.col("w").alias(word_col),
        F.when(F.col("_bt.pos") == 0, F.col("_bt.acc"))
        .otherwise(F.array().cast("array<string>"))
        .alias(out_col),
    )


def unigram_segment_corpus(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    id_col: str | None = None,
    max_piece_len: int = 8,
    max_word_len: int = 16,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Tokenize a corpus under a unigram piece table: distinct words ->
    :func:`segment_words_viterbi` -> one broadcast join of (word ->
    pieces) back to the position-exploded corpus — the same
    corpus-constant plan shape as the BPE apply side
    (``bpe.segment_with_merges``), sharing its join/reassembly
    machinery."""
    from etl_data_spark.operators.bpe import join_word_tokens

    words_expr = F.split(F.trim(F.col(text_col)), r"\s+")
    vocab = (
        df.select(F.explode(words_expr).alias("_w"))
        .filter(F.length("_w") > 0)
        .distinct()
    )
    wtoks = segment_words_viterbi(
        vocab, pieces, word_col="_w", out_col="_toks",
        max_piece_len=max_piece_len, max_word_len=max_word_len,
    )
    return join_word_tokens(
        df, wtoks, text_col=text_col, out_col=out_col, id_col=id_col,
        broadcast_vocab=broadcast_vocab,
    )


def train_unigram(
    df: DataFrame,
    n_iters: int = 3,
    keep_fraction: float = 0.8,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_count: int = 5,
    max_word_len: int = 16,
) -> DataFrame:
    """Viterbi-EM unigram-LM training (the hard-EM variant of Kudo
    2018's trainer): seed with frequent substrings, then iterate

    1. E-step: Viterbi-segment the distinct-word vocabulary under the
       current piece table (:func:`segment_words_viterbi` — the same
       machinery inference uses, so training and serving can never
       disagree on segmentation semantics);
    2. M-step: re-estimate piece probabilities from usage counts
       weighted by word frequency (+1 Laplace so retained-but-unused
       pieces keep a finite log-prob);
    3. prune: keep the top ``keep_fraction`` of multi-character pieces
       by usage (ties: higher count, then lexicographic piece —
       deterministic); single characters are NEVER pruned, so every
       word stays segmentable.

    Fully deterministic (no RNG, no sampling, fixed tie rules): two
    runs on the same corpus produce byte-identical tables. Each
    iteration costs one vocab-frame Viterbi pass + one piece-keyed
    aggregation; lineage truncates per round (the ``train_bpe`` loop
    discipline). Returns (piece, logp)."""
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    words_n = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(ws).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    words_n = truncate_lineage(words_n)
    pieces = truncate_lineage(
        seed_pieces(df, text_col, max_piece_len, min_count)
    )
    for _ in range(n_iters):
        seg = segment_words_viterbi(
            words_n.select("w"), pieces, word_col="w", out_col="pieces",
            max_piece_len=max_piece_len, max_word_len=max_word_len,
        )
        usage = (
            seg.join(words_n, "w")
            .select(F.explode("pieces").alias("piece"), "n")
            .groupBy("piece")
            .agg(F.sum("n").alias("cnt"))
        )
        # retain: every current single-char piece (count 0 if unused),
        # plus the top keep_fraction of the CURRENT multi-char pieces by
        # usage (unused pieces count 0, so they prune first — but the
        # shrink is gradual, the SentencePiece schedule, never a
        # one-shot drop of everything Viterbi didn't pick this round)
        ranked = (
            pieces.select("piece")
            .join(usage, "piece", "left")
            .select("piece", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        )
        chars = ranked.filter(F.length("piece") == 1)
        multi = ranked.filter(F.length("piece") > 1).orderBy(
            F.desc("cnt"), F.asc("piece")
        )
        n_multi = multi.count()
        kept = chars.unionByName(
            multi.limit(max(0, int(n_multi * keep_fraction)))
        )
        total = kept.agg(F.sum(F.col("cnt") + 1).alias("tot"))
        pieces = truncate_lineage(
            kept.crossJoin(F.broadcast(total)).select(
                "piece",
                F.round(
                    F.log(
                        (F.col("cnt") + 1).cast("double")
                        / F.col("tot").cast("double")
                    ),
                    9,
                ).alias("logp"),
            )
        )
    return pieces
