"""Semantic property tests for the corpus-curation operators
(etl_data_spark/operators/corpus.py) beyond the oracle-parity gate.

Oracle parity (test_queries_oracle.py) proves Spark == DuckDB; these tests
prove the semantics themselves: redaction completeness, split stability,
packing invariants, decile structure, repetition-gate behavior.
"""

import pytest
from pyspark.sql import functions as F

from etl_data_spark.operators import corpus as C
from etl_data_spark.queries import load_table
from etl_data_spark.queries_corpus import _with_pii_text

SF_DIR = "/root/testdata/sf0.001"


def test_redaction_is_complete(spark):
    """After redact_pii, no PII pattern matches anywhere in the corpus."""
    d = _with_pii_text(load_table(spark, SF_DIR, "documents"))
    red = d.select(C.redact_pii("t").alias("r"))
    for kind, pat, token in C.PII_PATTERNS:
        residue = red.filter(F.regexp_count("r", F.lit(pat)) > 0).count()
        assert residue == 0, f"{kind} pattern still matches after redaction"
    # and the placeholders actually appear (injection produced matches)
    hits = red.filter(F.col("r").contains("<EMAIL>")).count()
    assert hits > 0


def test_redaction_counts_match_injection_schedule(spark):
    """Injection is doc_id-driven, so counts are exactly predictable."""
    d = _with_pii_text(load_table(spark, SF_DIR, "documents"))
    counts = C.pii_counts("t")
    rows = d.select("doc_id", counts["email"], counts["phone"], counts["ip"]).collect()
    for r in rows:
        assert r["n_email"] == (1 if r["doc_id"] % 3 == 0 else 0)
        assert r["n_phone"] == (1 if r["doc_id"] % 5 == 0 else 0)
        assert r["n_ip"] == (1 if r["doc_id"] % 7 == 0 else 0)


def test_split_is_stable_and_well_formed(spark):
    d = load_table(spark, SF_DIR, "documents")
    s1 = {r["doc_id"]: (r["bucket"], r["split"]) for r in C.with_split(d).collect()}
    # stable under repartitioning: membership is a pure function of the id
    s2 = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in C.with_split(d.repartition(16)).collect()
    }
    assert s1 == s2
    buckets = [b for b, _ in s1.values()]
    assert all(0 <= b < C.SPLIT_BUCKETS for b in buckets)
    frac_train = sum(1 for _, s in s1.values() if s == "train") / len(s1)
    assert 0.83 <= frac_train <= 0.97  # 90% +- sampling noise at n=500
    assert {s for _, s in s1.values()} == {"train", "val", "test"}


def test_pack_sequences_invariants(spark):
    d = load_table(spark, SF_DIR, "documents")
    budget = 512
    rows = C.pack_sequences(d, "source", "doc_id", "text", budget=budget).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in docs:
            assert r["pack_id"] == offset // budget
            assert r["pack_offset"] == offset % budget
            offset += r["n_tokens"]
        # packing is dense: pack ids cover 0..max with no gaps
        ids = sorted({r["pack_id"] for r in docs})
        assert ids == list(range(ids[-1] + 1))


def test_length_deciles_structure(spark):
    d = load_table(spark, SF_DIR, "documents")
    rows = C.length_decile_stats(d, "lang").collect()
    total_docs = d.count()
    assert sum(r["n_docs"] for r in rows) == total_docs
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, tiles in by_lang.items():
        tiles.sort(key=lambda r: r["decile"])
        assert [t["decile"] for t in tiles] == list(range(1, len(tiles) + 1))
        # deciles are ordered by token length: min of tile k >= min of k-1
        mins = [t["min_tokens"] for t in tiles]
        assert mins == sorted(mins)
        for t in tiles:
            assert t["min_tokens"] <= t["avg_tokens"] <= t["max_tokens"]


def test_repetition_gate_flags_repeated_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "the quick brown fox jumps over one lazy sleeping dog"),
        ],
        "doc_id long, text string",
    )
    flags = C.repetition_flags("text")
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in flags.items()]
        ).collect()
    }
    assert rows[1]["dup_token_frac"] == pytest.approx(0.9)
    assert rows[1]["dup_trigram_frac"] > 0.5
    assert not rows[1]["keep"]
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[2]["keep"]


def test_dup_fraction_bounds(spark):
    d = load_table(spark, SF_DIR, "documents")
    stats = d.select(
        C.dup_ngram_fraction("text", 1).alias("d1"),
        C.dup_ngram_fraction("text", 3).alias("d3"),
    ).agg(
        F.min("d1"), F.max("d1"), F.min("d3"), F.max("d3")
    ).collect()[0]
    assert 0.0 <= stats["min(d1)"] and stats["max(d1)"] <= 1.0
    assert 0.0 <= stats["min(d3)"] and stats["max(d3)"] <= 1.0


def test_top_ngrams_ranked(spark):
    d = load_table(spark, SF_DIR, "documents")
    rows = C.top_ngrams(d, "text", n=2, k=20).collect()
    assert len(rows) == 20
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # tie-break: equal counts appear in lexicographic ngram order
    for a, b in zip(rows, rows[1:]):
        if a["n_occurrences"] == b["n_occurrences"]:
            assert a["ngram"] < b["ngram"]


def test_quality_sample_rates(spark):
    d = load_table(spark, SF_DIR, "documents")
    rows = d.select(
        "doc_id",
        F.col("doc_id").alias("id"),
        C.quality_sample_flag("doc_id", "text").alias("keep"),
    ).collect()
    # deterministic: recompute equals first run
    again = {
        r["doc_id"]: r["keep"]
        for r in d.repartition(16)
        .select("doc_id", C.quality_sample_flag("doc_id", "text").alias("keep"))
        .collect()
    }
    assert {r["doc_id"]: r["keep"] for r in rows} == again
    # sampling is independent of the split hash: the sample salt must change
    # the bucket for at least some ids
    b0 = C.hash_bucket("doc_id")
    b1 = C.hash_bucket("doc_id", ":qs")
    diff = d.filter(b0 != b1).count()
    assert diff > 0


def test_mixing_rates_invariants(spark):
    d = load_table(spark, SF_DIR, "documents")
    rows = C.mixing_rates(d, "source", "text").collect()
    total = sum(r["domain_tokens"] for r in rows)
    target = total / len(rows)
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0
        expected = min(1.0, target / r["domain_tokens"])
        assert r["sample_rate"] == pytest.approx(expected, abs=1e-6)
    # at least one under-represented domain keeps everything
    assert any(r["sample_rate"] == 1.0 for r in rows)


def test_corpus_report_totals(spark):
    d = load_table(spark, SF_DIR, "documents")
    rows = C.corpus_report(d).collect()
    assert sum(r["n_docs"] for r in rows) == d.count()
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert 0.0 <= r["avg_quality"] <= 1.0


def test_source_kl_nonnegative(spark):
    from etl_data_spark.catalog import REGISTRY

    rows = REGISTRY["source_kl_divergence"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "every source must appear"
    for r in rows:
        # KL >= 0 up to the 9dp per-term quantization
        assert r.kl_bits_nat >= -1e-6, r


def test_vocab_coverage_monotone(spark):
    from etl_data_spark.catalog import REGISTRY

    rows = REGISTRY["vocab_coverage"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    cov = [r.coverage for r in rows]
    assert cov == sorted(cov)
    assert all(0.0 <= c <= 1.0 for c in cov)
    # tiny synthetic vocab: the largest k must cover everything
    assert cov[-1] == 1.0


def test_packing_efficiency_closed_bins_at_least_full(spark):
    from etl_data_spark.catalog import REGISTRY

    for r in REGISTRY["packing_efficiency"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect():
        # closed bins carry budget + boundary spill-in: >= 1, modestly so
        assert 1.0 <= r.full_bin_utilization < 1.5, r
        assert r.n_bins >= 1 and r.total_tokens > 0


def test_keyness_g2_nonnegative_and_overused(spark):
    from etl_data_spark.catalog import REGISTRY
    from pyspark.sql import functions as F

    rows = REGISTRY["keyness_terms"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    langs = {r.lang for r in rows}
    assert len(langs) == 5  # every language slice gets key terms
    for r in rows:
        assert r.g2 >= 0.0  # G2 is a log-likelihood ratio
        assert r.tf_in_lang > 0


def test_bpe_train_known_answer(spark):
    """Classic Sennrich corpus: the first merges must be es(9), est(9),
    lo(7), low(7) — the textbook trajectory (ties lexicographic)."""
    from etl_data_spark.operators.bpe import train_bpe

    df = spark.createDataFrame(
        [("low " * 5,), ("lower " * 2,), ("newest " * 6,), ("widest " * 3,)],
        "text string",
    )
    got = [
        (r["merged"], r["n_occurrences"])
        for r in train_bpe(df, 4).collect()
    ]
    assert got == [("es", 9), ("est", 9), ("lo", 7), ("low", 7)]


def test_bpe_greedy_and_boundary_semantics(spark):
    """The replace-based re-segmentation must be exact greedy BPE:
    overlapping occurrences merge left-to-right non-overlapping, and a
    pair never matches the TAIL of a longer symbol."""
    from etl_data_spark.operators.bpe import (
        initial_segmentation,
        merge_pair,
        _symbols,
    )

    df = spark.createDataFrame([("aaa",), ("baab",)], "w string").select(
        "w", initial_segmentation("w").alias("seg")
    )
    merged = merge_pair(df, "a", "a").select(
        "w", _symbols("seg").alias("syms")
    )
    out = {r["w"]: list(r["syms"]) for r in merged.collect()}
    assert out["aaa"] == ["aa", "a"]  # greedy, not [a, aa] nor [aa, aa]
    assert out["baab"] == ["b", "aa", "b"]

    # boundary anchoring: after merging to symbol "ba", pair (a, b) must
    # NOT match the 'a' inside "ba"
    df2 = spark.createDataFrame([("bab",)], "w string").select(
        "w", initial_segmentation("w").alias("seg")
    )
    step1 = merge_pair(df2, "b", "a")
    step2 = merge_pair(step1, "a", "b").select(_symbols("seg").alias("syms"))
    assert list(step2.first()["syms"]) == ["ba", "b"]


def test_bpe_vocabulary_exhaustion_stops_early(spark):
    """A corpus whose words fully merge before n_merges must stop, not
    loop on an empty argmax."""
    from etl_data_spark.operators.bpe import train_bpe

    df = spark.createDataFrame([("ab ab ab",)], "text string")
    got = train_bpe(df, 10)
    assert got.count() == 1  # only (a, b) exists; then nothing is adjacent
    assert got.first()["merged"] == "ab"


def test_bpe_segment_with_merges_roundtrip(spark):
    """The APPLY side: tokenizing with the trained merges reproduces the
    training segmentation (concatenation of tokens == the word)."""
    from etl_data_spark.operators.bpe import segment_with_merges, train_bpe

    df = spark.createDataFrame(
        [("low lower newest",), ("widest low newest",)], "text string"
    )
    merges = [
        (r["left"], r["right"]) for r in train_bpe(df, 5).collect()
    ]
    seg = segment_with_merges(df, merges)
    for r in seg.collect():
        rebuilt = "".join(r["bpe_tokens"])
        assert rebuilt == r["text"].replace(" ", "")


def _ref_bpe_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Driver-side greedy reference: Python str.replace is left-to-right
    non-overlapping, the same semantics the Spark operator relies on."""
    sep, b = "\x1f", "\x1f\x1f"
    seg = b + b.join(word) + b if word else b + b
    for left, right in merges:
        seg = seg.replace(
            f"{sep}{left}{b}{right}{sep}", f"{sep}{left}{right}{sep}"
        )
    return [s for s in seg.split(b) if s != ""]


def test_bpe_segment_matches_reference(spark):
    """Byte-identity of the r13 vocab-frame apply path against a
    driver-side greedy reference, including words UNSEEN at train time
    (they route through the same vocab-frame merge loop)."""
    from etl_data_spark.operators.bpe import segment_with_merges, train_bpe

    train = spark.createDataFrame(
        [("low " * 5,), ("lower " * 2,), ("newest " * 6,), ("widest " * 3,)],
        "text string",
    )
    merges = [
        (r["left"], r["right"]) for r in train_bpe(train, 6).collect()
    ]
    apply_df = spark.createDataFrame(
        [
            (1, "low lowest newest"),
            (2, "slowest wide lowlow"),   # unseen words
            (3, "w"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in segment_with_merges(apply_df, merges, id_col="doc_id")
        .collect()
    }
    for doc_id, text in [(1, "low lowest newest"),
                         (2, "slowest wide lowlow"), (3, "w")]:
        want = [t for w in text.split() for t in _ref_bpe_segment(w, merges)]
        assert got[doc_id] == want, f"doc {doc_id}: {got[doc_id]} != {want}"


def test_bpe_segment_plan_constant_in_vocab_size(spark):
    """The r12 `weak` fix: the corpus-side plan must be ONE broadcast
    join + one aggregation REGARDLESS of merge-list length — no replace
    expression over the corpus, and the plan does not grow with the
    vocabulary (the old form chained one replace per merge and died in
    Catalyst analysis at a production 32k-merge vocabulary)."""
    from etl_data_spark.operators.bpe import segment_with_merges

    df = spark.createDataFrame(
        [(1, "low lower newest"), (2, "widest low")],
        "doc_id int, text string",
    )

    def corpus_plan(n_merges):
        merges = [(f"q{i}x", f"q{i}y") for i in range(n_merges)]
        out = segment_with_merges(df, merges, id_col="doc_id")
        return out._jdf.queryExecution().executedPlan().toString()

    p_small, p_big = corpus_plan(64), corpus_plan(1024)
    # the merge replaces live on the lineage-truncated vocab side only
    assert "replace" not in p_big.lower()
    assert "BroadcastHashJoin" in p_big
    # constant in vocab size: 16x the merges, same corpus-side plan
    assert len(p_big) < 1.5 * len(p_small), (
        f"corpus-side plan grew with the merge list: "
        f"{len(p_small)} -> {len(p_big)} chars"
    )


def test_duplicate_spans_known_answer(spark):
    """A 9-token run shared by two docs (different offsets) must surface
    as one coalesced span in EACH doc; a disjoint doc must not appear."""
    from etl_data_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog u1 u2 u3"),
            (2, "p1 p2 p3 the quick brown fox jumps over the lazy dog"),
            (3, "totally different content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in duplicate_spans(df, n=5).collect()
    }
    assert got == {(1, 1, 9, 9), (2, 4, 12, 9)}


def test_remove_duplicate_spans_keeps_canonical_content(spark):
    """The cut keeps every duplicated gram in its canonical (min-id)
    doc: content survives globally, non-canonical copies are excised,
    untouched docs pass through byte-identical."""
    from etl_data_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    boiler = "this license text is repeated verbatim in many documents"
    df = spark.createDataFrame(
        [
            (1, f"doc one starts here {boiler} and ends here"),
            (2, f"{boiler} second doc unique tail words go here"),
            (3, f"third doc head words {boiler}"),
            (4, "a completely unrelated document with original words only"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in remove_duplicate_spans(df, n=5).collect()
    }
    assert boiler in out[1]          # canonical keeps the span
    assert boiler not in out[2] and boiler not in out[3]
    assert "second doc unique tail words go here" in out[2]
    assert "third doc head words" in out[3]
    assert out[4] == "a completely unrelated document with original words only"
    # and after the cut, no cross-doc duplicate 5-gram run remains
    cleaned = spark.createDataFrame(
        [(k, v) for k, v in out.items()], "doc_id long, text string"
    )
    assert duplicate_spans(cleaned, n=5).count() == 0


def test_remove_duplicate_spans_composes_with_curation(spark):
    """Curation-chain composition: the substring cut runs between
    document-level dedup and packing — the rewritten corpus feeds the
    quality/packing stages with the same (doc_id, text) contract."""
    from etl_data_spark.operators.dedup import remove_duplicate_spans

    d = load_table(spark, SF_DIR, "documents").limit(200)
    cut = remove_duplicate_spans(d, n=5)
    assert cut.columns == d.columns + ["text_deduped"]
    # downstream stages consume the rewritten text transparently
    stats = cut.select(
        "doc_id",
        F.size(F.split(F.trim("text_deduped"), r"\s+")).alias("n_tokens"),
    )
    assert stats.filter(F.col("n_tokens") < 0).count() == 0
    assert cut.count() == d.count()  # row-preserving rewrite


def test_dsir_importance_prefers_target_like_docs(spark):
    """Docs written in the target slice's vocabulary must outscore docs
    written in the off-target vocabulary — the defining DSIR property."""
    from etl_data_spark.operators.mixing import dsir_importance

    target_text = "physics quantum energy field theory particle wave"
    other_text = "recipe flour butter sugar oven baking whisk dough"
    raw = spark.createDataFrame(
        [(1, target_text), (2, other_text),
         (3, "physics energy theory particle"), (4, "flour sugar oven")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, target_text), (101, "quantum field wave particle physics")],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: float(r["log_weight"])
        for r in dsir_importance(raw, target).collect()
    }
    assert w[1] > w[2] and w[3] > w[4]
    assert w[1] > 0 > w[2]  # target-like above the prior, off-target below


def test_dsir_select_topk_deterministic_and_weight_biased(spark):
    """The Gumbel-top-k sample is a pure function of (corpus, seed):
    re-running yields the identical set, and the selection leans toward
    high-weight docs (the resampling property)."""
    from etl_data_spark.operators.mixing import dsir_select_topk

    d = load_table(spark, SF_DIR, "documents")
    t = d.filter(F.col("doc_id") % 7 == 0)
    s1 = [(r["doc_id"], r["gumbel_key"])
          for r in dsir_select_topk(d, t, k=20).collect()]
    s2 = [(r["doc_id"], r["gumbel_key"])
          for r in dsir_select_topk(d, t, k=20).collect()]
    assert s1 == s2
    assert len(s1) == 20
    keys = [k for _, k in s1]
    assert keys == sorted(keys, reverse=True)  # ordered by the sort key


def test_dsir_selection_composes_between_dedup_and_packing(spark):
    """Curation-chain position: dedup survivors -> DSIR selection -> the
    selected frame carries the (doc_id, text) contract downstream."""
    from etl_data_spark.operators.dedup import dedup_exact
    from etl_data_spark.operators.mixing import dsir_select_topk

    d = load_table(spark, SF_DIR, "documents")
    keep = dedup_exact(d, id_col="doc_id", text_col="text").select(
        F.col("survivor_id").alias("doc_id")
    )
    surv = d.join(keep, "doc_id", "left_semi")
    t = surv.filter(F.col("doc_id") % 7 == 0)
    sel = dsir_select_topk(surv, t, k=10)
    chosen = surv.join(sel.select("doc_id"), "doc_id", "left_semi")
    assert chosen.count() == 10
    assert set(chosen.columns) == set(d.columns)


def test_lm_perplexity_prefers_target_like_docs(spark):
    """The quality gate's defining property: text drawn from the target
    distribution scores LOWER perplexity than off-distribution text,
    and unseen words still score finitely (Laplace unigram floor)."""
    from etl_data_spark.operators.mixing import lm_perplexity

    target = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "the quick brown fox sleeps under the green tree")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),        # in-distribution
         (2, "zzz qqq www eee rrr ttt"),          # fully unseen
         (3, "the lazy dog sleeps")],             # partial
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lm_perplexity(raw, target).collect()}
    assert got[1]["ppl"] < got[3]["ppl"] < got[2]["ppl"]
    assert all(got[i]["ppl"] > 0 for i in (1, 2, 3))
    assert got[1]["n_bigrams"] == 4


def test_unigram_viterbi_known_answer(spark):
    """Viterbi picks the max-logprob segmentation ('hello' as one piece
    beats 'he'+'llo' beats chars), unseen words fall back to single
    characters, and ties prefer the shortest last piece."""
    import math

    from etl_data_spark.operators.unigram import unigram_segment_corpus

    rows = [("hello", math.log(0.3)), ("he", math.log(0.1)),
            ("llo", math.log(0.1))]
    rows += [(c, math.log(0.01)) for c in "helowrd"]
    pieces = spark.createDataFrame(
        [(p, round(lp, 9)) for p, lp in rows], "piece string, logp double"
    )
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "he llo"), (3, "wow")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: list(r["unigram_tokens"])
        for r in unigram_segment_corpus(df, pieces, id_col="doc_id")
        .collect()
    }
    assert got[1] == ["hello", "w", "o", "r", "l", "d"]
    assert got[2] == ["he", "llo"]
    assert got[3] == ["w", "o", "w"]


def test_unigram_viterbi_matches_python_reference(spark):
    """Byte-identity of the distributed DP against a driver-side Viterbi
    on the seeded piece table over real corpus words."""
    from etl_data_spark.operators.unigram import (
        seed_pieces,
        segment_words_viterbi,
    )

    d = load_table(spark, SF_DIR, "documents")
    pieces = seed_pieces(d, max_piece_len=4, min_count=5)
    plist = {r["piece"]: r["logp"] for r in pieces.collect()}
    words = (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    got = {
        r["w"]: list(r["pieces"])
        for r in segment_words_viterbi(
            words, pieces, word_col="w", max_piece_len=4
        ).collect()
    }

    def ref(word):
        NEG = -1.0e18
        L = len(word)
        best, ptr = [0.0] + [NEG] * L, [0] * (L + 1)
        for i in range(1, L + 1):
            for j in range(max(1, i - 3), i + 1):  # ascending: ties -> largest j
                lp = plist.get(word[j - 1 : i])
                if lp is None or best[j - 1] <= NEG / 2:
                    continue
                s = best[j - 1] + lp
                if s >= best[i]:
                    best[i], ptr[i] = s, j
        out, pos = [], L
        while pos > 0 and ptr[pos] > 0:
            out.insert(0, word[ptr[pos] - 1 : pos])
            pos = ptr[pos] - 1
        return out if pos == 0 else []

    for w, toks in got.items():
        assert toks == ref(w), f"{w}: {toks} != {ref(w)}"
        assert "".join(toks) == w


def test_unigram_word_length_guard(spark):
    """Words beyond max_word_len raise loudly — the bound is what fixes
    the DP step count."""
    import pytest

    from etl_data_spark.operators.unigram import segment_words_viterbi

    words = spark.createDataFrame([("a" * 30,)], "w string")
    pieces = spark.createDataFrame([("a", -1.0)], "piece string, logp double")
    with pytest.raises(ValueError, match="max_word_len"):
        segment_words_viterbi(words, pieces, max_word_len=16)


def test_unigram_trainer_improves_likelihood_and_is_deterministic(spark):
    """Viterbi-EM: corpus log-likelihood under the trained table beats
    the seed table; vocabulary shrinks on schedule; single characters
    survive (every word stays segmentable); two runs are byte-equal."""
    from etl_data_spark.operators.unigram import (
        seed_pieces,
        segment_words_viterbi,
        train_unigram,
    )

    d = load_table(spark, SF_DIR, "documents")
    seed = seed_pieces(d, max_piece_len=4, min_count=5)
    t1 = train_unigram(d, n_iters=2)
    t2 = train_unigram(d, n_iters=2)
    rows1 = sorted((r["piece"], r["logp"]) for r in t1.collect())
    rows2 = sorted((r["piece"], r["logp"]) for r in t2.collect())
    assert rows1 == rows2  # deterministic
    assert len(rows1) < seed.count()  # pruned on schedule
    chars = {p for p, _ in rows1 if len(p) == 1}
    seed_chars = {
        r["piece"] for r in seed.collect() if len(r["piece"]) == 1
    }
    assert chars == seed_chars  # char fallback never pruned

    words_n = (
        d.filter(F.length(F.trim("text")) > 0)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def ll(pieces):
        pl = {r["piece"]: r["logp"] for r in pieces.collect()}
        seg = segment_words_viterbi(
            words_n.select("w"), pieces, max_piece_len=4
        )
        tot, empty = 0.0, 0
        for r in seg.join(words_n, "w").collect():
            if not r["pieces"]:
                empty += 1
            tot += r["n"] * sum(pl[p] for p in r["pieces"])
        return tot, empty

    ll_seed, _ = ll(seed)
    ll_trained, n_empty = ll(t1)
    assert n_empty == 0  # every word still segmentable
    assert ll_trained > ll_seed


def test_full_curation_chain_v2_composes(spark):
    """The r13 capstone: the complete curation pipeline with every r13
    stage in its production position —

      redact -> exact dedup -> MinHash near-dup survivors ->
      substring-level cut (ExactSubstr) -> LM perplexity gate ->
      DSIR selection -> token packing contract

    asserting the end-state invariants each stage owes the next: the
    cut leaves no cross-doc duplicate runs, the gate/selection only
    shrink the surviving set, and the selected frame still carries the
    (doc_id, text) contract packing consumes."""
    from etl_data_spark.operators.dedup import (
        dedup_exact,
        duplicate_spans,
        minhash_lsh_pairs,
        connected_components,
        dedup_survivors,
        remove_duplicate_spans,
    )
    from etl_data_spark.operators.mixing import (
        dsir_select_topk,
        lm_perplexity,
    )

    d = (
        _with_pii_text(load_table(spark, SF_DIR, "documents"))
        .select("doc_id", C.redact_pii("t").alias("text"))
    )
    # document-level dedup: exact survivors, then near-dup components
    keep = dedup_exact(d, id_col="doc_id", text_col="text").select(
        F.col("survivor_id").alias("doc_id")
    )
    surv = d.join(keep, "doc_id", "left_semi")
    pairs = minhash_lsh_pairs(
        surv, "doc_id", "text", shingle_n=3, num_hashes=64, bands=16,
        threshold=0.8,
    )
    surv = dedup_survivors(surv, connected_components(pairs), "doc_id")
    n_doc_level = surv.count()

    # substring-level cut
    cut = remove_duplicate_spans(surv, n=5).select(
        "doc_id", F.col("text_deduped").alias("text")
    )
    assert cut.count() == n_doc_level  # row-preserving rewrite
    leftover = duplicate_spans(cut, n=5).count()
    assert leftover == 0, f"{leftover} cross-doc dup runs survived the cut"

    # quality gate: drop the worst-perplexity decile under the target LM
    scored = lm_perplexity(cut, cut.filter(F.col("doc_id") % 7 == 0))
    cutoff = scored.approxQuantile("ppl", [0.9], 0.0)[0]
    gated = cut.join(
        scored.filter(F.col("ppl") <= cutoff).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    n_gated = gated.count()
    assert 0 < n_gated <= n_doc_level

    # DSIR selection between dedup and packing
    sel = dsir_select_topk(
        gated, k=min(50, n_gated), target_pred=F.col("doc_id") % 7 == 0
    )
    chosen = gated.join(sel.select("doc_id"), "doc_id", "left_semi")
    assert chosen.count() == min(50, n_gated)
    assert set(chosen.columns) == {"doc_id", "text"}
    # packing contract: positive token counts for every selected doc
    toks = chosen.select(
        F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    )
    assert toks.filter(F.col("n") <= 0).count() == 0


def test_gram_index_probe_prunes_and_appends(spark, tmp_path):
    """The at-rest gram index: the probe's stored-side scan carries a
    bucket PartitionFilter (never a full-index read), appended batches
    are visible to the NEXT probe (counts accumulate as rows), and the
    probe equals the global report restricted to the delta."""
    from etl_data_spark.operators.dedup import (
        append_gram_index,
        duplicate_spans,
        duplicate_spans_incremental_at_rest,
        write_gram_index,
    )

    d = load_table(spark, SF_DIR, "documents")
    corpus = d.filter(F.col("doc_id") < 300)
    delta = d.filter(F.col("doc_id") >= 300)
    path = str(tmp_path / "gram_idx")
    write_gram_index(corpus, path, n=5)

    probe = duplicate_spans_incremental_at_rest(delta, path)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in probe.collect()
    }
    want = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(d, n=5)
        .filter(F.col("doc_id") >= 300)
        .collect()
    }
    assert got == want

    # plan: the stored index scans behind a bucket PartitionFilter
    plan = duplicate_spans_incremental_at_rest(
        delta, path
    )._jdf.queryExecution().executedPlan().toString()
    # plan rendering truncates paths — identify the index scan by its
    # column signature (n_docs/bucket), the test_plan_quality precedent
    scans = [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "n_docs" in ln
    ]
    assert scans, "expected a stored gram-index scan"
    for ln in scans:
        assert "PartitionFilters: [" in ln
        assert "bucket" in ln.split("PartitionFilters")[1][:250], ln[:300]

    # append: a landed batch's grams count toward the NEXT batch's probe
    b1 = spark.createDataFrame(
        [(9000, "entirely novel boilerplate passage repeated later on")],
        "doc_id long, text string",
    )
    append_gram_index(b1, path)
    b2 = spark.createDataFrame(
        [(9001, "prefix entirely novel boilerplate passage repeated later on")],
        "doc_id long, text string",
    )
    got2 = duplicate_spans_incremental_at_rest(b2, path).collect()
    assert len(got2) == 1 and got2[0]["n_tokens"] >= 7
