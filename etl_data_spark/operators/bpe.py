"""Iterative BPE vocabulary training (Sennrich et al. 2016, ACL).

``queries_corpus.bpe_pair_merge_counts`` computes the FIRST merge's pair
counts; this module runs the actual tokenizer-training kernel — the
bounded merge loop (VERDICT r11 missing #4): count adjacent symbol
pairs weighted by word frequency, merge the argmax pair everywhere,
repeat. Same Pregel-loop shape as ``graph.pagerank``: a small
driver-side loop over a DISTRIBUTED frame, lineage truncated per
iteration with localCheckpoint.

Scale shape: the corpus reduces ONCE to its vocabulary (word, count) —
the only corpus-sized shuffle; every merge iteration then runs over the
vocab-sized frame (orders of magnitude smaller than the token stream —
exactly how production BPE trainers batch it), costing one vocab-sized
aggregation + one bounded (1-row) collect + one narrow map per merge.

Segmentation representation: a word's symbol sequence is a STRING with
``\\x1f\\x1f`` (double unit-separator) boundaries around every symbol —
``low`` -> ``␟␟l␟␟o␟␟w␟␟``. Merging pair (a, b) is then one built-in
``replace`` of ``␟a␟␟b␟`` with ``␟ab␟``: SQL replace is left-to-right
non-overlapping, which IS BPE's greedy re-segmentation, the inner
separator consumption prevents double-merging overlaps (``aaa`` with
merge (a,a) -> ``aa a``), and the boundary anchoring prevents matching
the TAIL of a longer symbol (symbols ``ba``,``b`` never match pair
(a, b)). No UDF anywhere, and DuckDB's ``replace`` has identical
semantics, so the oracle replays every iteration exactly (the
``geometric_median`` unrolled-trajectory trick).

Tie rule: equal-count pairs merge lowest (left, right) lexicographic
first — deterministic in both engines.

The APPLY side (:func:`segment_with_merges`) uses the same vocab-frame
loop: distinct words -> iterative merge application on the small frame
(lineage-truncated batches) -> ONE broadcast join of (word -> tokens)
back to the position-exploded corpus. The corpus-side plan is constant
in vocabulary size — a 32k-merge tokenizer never builds a 32k-deep
Catalyst expression tree over the token stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_spark.caching import truncate_lineage

_SEP = "\x1f"
_B = _SEP + _SEP  # symbol boundary


def initial_segmentation(word_col: str | F.Column) -> F.Column:
    """``␟␟c1␟␟c2␟␟…␟␟``: every character its own symbol.

    The char split filters empty elements explicitly: Spark >= 3.4 drops
    the trailing ``""`` that ``split(w, "")`` produces on older versions,
    and without the filter that phantom empty symbol would enter the pair
    counts ((last-char, "") can beat a real pair on the Sennrich corpus)
    — the filter makes the symbol array version-independent."""
    w = F.col(word_col) if isinstance(word_col, str) else word_col
    chars = F.filter(F.split(w, ""), lambda x: x != "")
    return F.concat(F.lit(_B), F.array_join(chars, _B), F.lit(_B))


def _symbols(seg_col: str) -> F.Column:
    """The symbol array of a segmentation string (drop the empty edge
    elements the boundary separators produce)."""
    parts = F.split(F.col(seg_col), _B)
    return F.slice(parts, 2, F.size(parts) - 2)


def adjacent_pair_counts(vocab: DataFrame, seg_col: str = "seg") -> DataFrame:
    """(left, right, n_occurrences) over the current segmentation,
    weighted by word count — the argmax row is the next merge."""
    syms = _symbols(seg_col)
    pairs = F.when(
        F.size(syms) >= 2,
        # sequence(1, 0) DESCENDS in Spark rather than being empty, so
        # single-symbol words are gated explicitly (same guard as
        # word_shingles)
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("left"),
                F.element_at(syms, i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (
        vocab.select(F.explode(pairs).alias("p"), "n")
        .select("p.left", "p.right", "n")
        .groupBy("left", "right")
        .agg(F.sum("n").alias("n_occurrences"))
    )


def merge_pair(vocab: DataFrame, left: str, right: str, seg_col: str = "seg") -> DataFrame:
    """Apply one merge everywhere: greedy left-to-right, one built-in
    ``replace`` (see module docstring for why this is exact)."""
    pat = f"{_SEP}{left}{_B}{right}{_SEP}"
    rep = f"{_SEP}{left}{right}{_SEP}"
    return vocab.withColumn(
        seg_col, F.replace(F.col(seg_col), F.lit(pat), F.lit(rep))
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Train ``n_merges`` BPE merges over a document corpus; returns the
    merge table (merge_rank, left, right, merged, n_occurrences) — the
    tokenizer artifact, ordered by rank.

    The corpus reduces once to (word, n) — the only corpus-sized stage —
    then the loop runs ``n_merges`` bounded iterations over the
    vocab-sized frame, truncating lineage per iteration (localCheckpoint,
    the ``pagerank`` discipline: without it each iteration's plan nests
    the last's and planning time explodes by merge ~20)."""
    spark = df.sparkSession
    vocab = (
        df.filter(F.length(F.trim(text_col)) > 0)
        .select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w", "n", initial_segmentation("w").alias("seg"))
    )
    vocab = truncate_lineage(vocab)

    merges = []
    for rank in range(1, n_merges + 1):
        best = (
            adjacent_pair_counts(vocab)
            .orderBy(F.desc("n_occurrences"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:  # every word fully merged — vocabulary exhausted
            break
        b = best[0]
        merges.append(
            (rank, b["left"], b["right"], b["left"] + b["right"],
             int(b["n_occurrences"]))
        )
        vocab = truncate_lineage(merge_pair(vocab, b["left"], b["right"]))
    return spark.createDataFrame(
        merges,
        "merge_rank int, left string, right string, merged string, "
        "n_occurrences bigint",
    ).orderBy("merge_rank")


def segment_vocabulary(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
    out_col: str = "toks",
    merge_batch_size: int = 64,
) -> DataFrame:
    """Segment a DISTINCT-word frame with a trained merge list: apply the
    merges in rank order as batched built-in ``replace`` chains over the
    vocab-sized frame, truncating lineage every ``merge_batch_size``
    merges (``train_bpe``'s own loop discipline). Expression depth per
    plan is bounded by the batch size, NOT by the vocabulary size — a
    32k-merge production tokenizer costs ~500 bounded iterations over
    the small frame, never a 32k-deep Catalyst tree.

    Returns (word_col, out_col: array<string>). Words absent from the
    training corpus segment correctly too: the merge loop is a pure
    function of the word's characters and the merge list."""
    vocab = words.select(
        F.col(word_col), initial_segmentation(word_col).alias("_seg")
    )
    for lo in range(0, len(merges), merge_batch_size):
        seg = F.col("_seg")
        for left, right in merges[lo : lo + merge_batch_size]:
            pat = f"{_SEP}{left}{_B}{right}{_SEP}"
            rep = f"{_SEP}{left}{right}{_SEP}"
            seg = F.replace(seg, F.lit(pat), F.lit(rep))
        vocab = truncate_lineage(vocab.withColumn("_seg", seg))
    return vocab.select(
        word_col,
        F.filter(F.split("_seg", _B), lambda x: x != "").alias(out_col),
    )


def segment_with_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    id_col: str | None = None,
    merge_batch_size: int = 64,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Tokenize a corpus with a trained merge list — the APPLY side of
    BPE, in the vocab-frame form that scales to production vocabularies:

    1. reduce the corpus to its DISTINCT words (the only corpus-sized
       aggregation);
    2. apply the merges iteratively on that vocab frame
       (:func:`segment_vocabulary` — lineage-truncated batches, so the
       corpus-side plan depth is constant in ``len(merges)``, unlike the
       one-replace-per-merge-over-the-corpus chain that dies in Catalyst
       analysis at a 32k-merge vocabulary);
    3. broadcast-join the (word -> token array) map back to the
       position-exploded corpus and reassemble each document's token
       array in (word position, within-word position) order.

    The corpus side is ONE broadcast join + one aggregation on the row
    key regardless of vocabulary size. ``id_col`` names a unique row key
    when the frame has one (e.g. ``doc_id``) — without it a
    ``monotonically_increasing_id`` is pinned via lineage truncation
    (materializes the frame once; pass ``id_col`` on big corpora).
    ``broadcast_vocab=False`` falls back to a shuffle join for
    vocabularies past the broadcast threshold."""
    words_expr = F.split(F.trim(F.col(text_col)), r"\s+")
    vocab = df.select(F.explode(words_expr).alias("_w")).distinct()
    wtoks = segment_vocabulary(
        vocab, merges, word_col="_w", out_col="_toks",
        merge_batch_size=merge_batch_size,
    )
    return join_word_tokens(
        df, wtoks, text_col=text_col, out_col=out_col, id_col=id_col,
        broadcast_vocab=broadcast_vocab,
    )


def join_word_tokens(
    df: DataFrame,
    wtoks: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
    id_col: str | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Reassemble per-document token arrays from a (word -> token array)
    vocab frame — the shared corpus side of every vocab-frame tokenizer
    (BPE apply, unigram Viterbi): position-explode the corpus words,
    ONE broadcast join on the word, regroup on the row key in (word
    position, within-word position) order. ``wtoks`` must have columns
    ``(_w, _toks)``. Corpus-side plan is constant in vocabulary size.

    ``id_col`` names a unique row key when the frame has one; without
    it a ``monotonically_increasing_id`` is pinned via lineage
    truncation (materializes the frame once — pass ``id_col`` on big
    corpora)."""
    words_expr = F.split(F.trim(F.col(text_col)), r"\s+")
    if id_col is None:
        key = "_jwt_rid"
        base = truncate_lineage(
            df.withColumn(key, F.monotonically_increasing_id())
        )
    else:
        key = id_col
        base = df
    if broadcast_vocab:
        wtoks = F.broadcast(wtoks)
    doc_toks = (
        base.select(F.col(key), F.posexplode(words_expr).alias("_p", "_w"))
        .join(wtoks, "_w", "left")
        .groupBy(key)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_p").alias("_p"),
                                F.coalesce(
                                    "_toks",
                                    F.array().cast("array<string>"),
                                ).alias("_t"),
                            )
                        )
                    ),
                    lambda s: s["_t"],
                )
            ).alias(out_col)
        )
    )
    out = base.join(doc_toks, key, "left")
    return out.drop("_jwt_rid") if id_col is None else out
