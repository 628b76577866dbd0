"""Learned byte-pair encoding over a document corpus (X4 extension —
the real tokenizer-training step of an LLM data pipeline, not just the
regex token count in operators/text.py).

Algorithm: the public BPE procedure (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units"):
start from characters, repeatedly merge the most frequent adjacent
symbol pair. Training needs only the word-frequency table, so the
distributed half is one explode→groupBy word count; the merge loop runs
driver-side over the top-``max_words`` rows (bounded collect — the same
shape every practical BPE trainer uses: frequencies in, merges out).
Encoding is an Arrow-batched pandas_udf applying the learned merge ranks
greedily per word — vectorized per batch, no driver involvement.

Determinism: pair-count ties break lexicographically, so the merge list
is a pure function of the word-frequency table (and therefore of the
corpus), making cross-run driver checks possible.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

END = "</w>"  # end-of-word marker, per the paper


def word_frequencies(
    df: DataFrame, text_col: str = "text", max_words: int = 50_000
) -> list[tuple[str, int]]:
    """Distributed word counting → the top-``max_words`` (word, count)
    rows, ordered by (count desc, word) for determinism. The collect is
    bounded by ``max_words`` — the training table, not the corpus."""
    rows = (
        df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), "w")
        .limit(max_words)
        .collect()
    )
    return [(r["w"], int(r["count"])) for r in rows]


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list (rank = position)."""
    freqs = word_frequencies(df, text_col, max_words)
    vocab = {tuple(w) + (END,): c for w, c in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # highest count, then lexicographically smallest pair → merges
        # are a pure function of the frequency table
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break  # nothing left that actually repeats
        merges.append((a, b))
        merged = a + b
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application to one word (the
    standard BPE encoder)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_token_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token counts under the learned BPE: (id, n_words,
    n_tokens, n_chars). Arrow-batched; the merge table ships once per
    executor in the closure (KBs).

    Iterator form + per-task word memo (r13, guide §4.5): word frequency
    is Zipfian, so most occurrences repeat a word the task has already
    encoded — the greedy merge loop runs once per DISTINCT word per task
    instead of once per occurrence (token count is a pure function of the
    word, so results are identical). Memo size is bounded by the task's
    distinct-word count, the same order as the training table."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("long")
    def count_tokens(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        memo: dict[str, int] = {}
        for texts in batches:
            out = []
            for t in texts:
                n = 0
                for w in str(t or "").lower().split():
                    c = memo.get(w)
                    if c is None:
                        c = memo[w] = len(encode_word(w, ranks))
                    n += c
                out.append(n)
            yield pd.Series(out, dtype="int64")

    t = F.coalesce(F.col(text_col), F.lit(""))
    # empty-token removal keeps n_words consistent with the tokenizer's
    # str.split(): '' / whitespace-only / NULL text → 0 words, 0 tokens
    words = F.array_remove(F.split(F.trim(t), r"\s+"), "")
    return df.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        count_tokens(t).alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )
