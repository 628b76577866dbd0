"""Learned BPE (operators/bpe.py): the merge procedure is pinned on the
published example corpus from Sennrich et al. 2016 (hand-checkable word
frequencies), plus encoder/compression properties through the Spark
stage."""

from __future__ import annotations

import pytest

from hielo_spark.operators import bpe as B


def test_paper_style_corpus_merges():
    """Corpus in the spirit of the paper's {low, lower, newest, widest}
    example: 'es' (9+3*'est' contexts...) — hand-derivable merge order
    from the frequency table. We verify against a straight manual
    simulation of the algorithm on the known frequencies rather than
    hardcoding guesses."""
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    # manual first iterations on char vocab:
    #   pairs from low×5: l-o 5, o-w 5, w-</w> 5
    #   lower×2: l-o 2, o-w 2, w-e 2, e-r 2, r-</w> 2
    #   newest×6: n-e 6, e-w 6, w-e 6, e-s 6, s-t 6, t-</w> 6
    #   widest×3: w-i 3, i-d 3, d-e 3, e-s 3, s-t 3, t-</w> 3
    # top: e-s 9 / s-t 9 / t-</w> 9 → tie broken lexicographically:
    # ('e','s') first, then ('es','t'), then ('est','</w>')
    import hielo_spark.operators.bpe as bpe_mod

    orig = bpe_mod.word_frequencies
    bpe_mod.word_frequencies = lambda df, text_col, max_words: freqs
    try:
        merges = B.learn_bpe(None, n_merges=4)
    finally:
        bpe_mod.word_frequencies = orig
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    # 4th merge: remaining top pair is l-o (5+2=7)
    assert merges[3] == ("l", "o")


def test_encode_word_greedy_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B.encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert B.encode_word("low", ranks) == ["low", "</w>"]
    assert B.encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_learn_and_encode_through_spark(spark, sf_dir):
    from hielo_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(300)
    merges = B.learn_bpe(docs, n_merges=100)
    assert len(merges) == 100
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in merges)
    # determinism: same corpus → same merges
    assert B.learn_bpe(docs, n_merges=100) == merges

    stats = B.bpe_token_stats(docs, merges).collect()
    assert len(stats) == 300
    for r in stats:
        # each word is ≥1 token; merges compress below chars+words
        assert r.n_tokens >= r.n_words
        assert r.n_tokens <= r.n_chars + r.n_words  # ≤ char-level + END markers
    # learned merges must actually compress vs zero merges
    base = {r.doc_id: r.n_tokens for r in B.bpe_token_stats(docs, []).collect()}
    learned = {r.doc_id: r.n_tokens for r in stats}
    assert sum(learned.values()) < 0.8 * sum(base.values())


def test_empty_and_null_text_consistent(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in B.bpe_token_stats(docs, []).collect()}
    assert (rows[1].n_words, rows[1].n_tokens) == (2, 12)  # char-level + 2 END
    for i in (2, 3, 4):
        assert rows[i].n_words == 0 and rows[i].n_tokens == 0
