"""X4 — text analysis over a document table (SURVEY §2.8).

All hot-path expressions are built-in Spark SQL functions (JVM-side,
whole-stage codegen); no Python UDFs. Designed for the ``documents``
fixture schema (doc_id, text, lang, source, n_chars) but parameterized on
column names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# Tiny multilingual stopword sets for the n-gram/lexicon language-ID
# heuristic and the stopword-ratio quality signal. Public-knowledge lists.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "es", "que", "por"],
}


def words(text: Column | str = "text") -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    text = F.col(text) if isinstance(text, str) else text
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_count(text: Column | str = "text") -> Column:
    return F.size(words(text))


def token_count_bpe_ish(text: Column | str = "text") -> Column:
    """BPE-ish token estimate: count of letter-runs, digit-runs, and
    non-space punctuation singletons (a cheap deterministic stand-in for a
    real tokenizer at 100 TB scan speed)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def punct_ratio(text: Column | str = "text") -> Column:
    text = F.col(text) if isinstance(text, str) else text
    # regexp_count of the punctuation class, not length(regexp_replace
    # (negated class, "")): identical integer (each match is exactly one
    # character) without BUILDING the replaced string per row — measured
    # ~3x cheaper on a 1.5 KB/doc corpus (r14; 1.10 s -> 0.38 s for the
    # bare expression over 50k docs on 2 tasks).
    n_punct = F.regexp_count(text, F.lit(r"[\.,;:!\?]"))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str = "text", lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    ws = words(text)
    n = F.size(ws)
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(sw, F.lower(w))))
    return F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))


def quality_score(text: Column | str = "text") -> Column:
    """Heuristic quality in [0,1]: length band + word-length sanity +
    punctuation sanity. Deterministic, codegen-friendly."""
    text = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(text)
    n_words = word_count(text)
    avg_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    len_component = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_component = F.when((avg_word_len >= 3) & (avg_word_len <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_component = F.when(punct_ratio(text) <= 0.1, F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_component * 0.5 + word_component * 0.3 + punct_component * 0.2)


def _stopword_hits(ws: Column, stopwords: list[str]) -> Column:
    sw_arr = F.array(*[F.lit(x) for x in stopwords])
    # single-arg lambda: a default-arg closure would make PySpark pass the
    # element index as the second argument
    return F.size(F.filter(ws, lambda w: F.array_contains(sw_arr, F.lower(w))))


def language_id(text: Column | str = "text") -> Column:
    """Stopword-lexicon language ID: score each candidate language by
    stopword hits, take the argmax ('und' when no hits). A real system
    would use char n-gram profiles; the Spark plumbing is identical."""
    ws = words(text)
    scores = F.array(
        *[
            F.struct(
                _stopword_hits(ws, sw).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in STOPWORDS.items()
        ]
    )
    best = F.array_max(scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column | str = "text") -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Stable across engines (used for exact dedup X1)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stat set as columns (one narrow projection pass)."""
    return (
        df.withColumn("n_chars_computed", F.length(F.col(text_col)))
        .withColumn("n_words", word_count(text_col))
        .withColumn("n_tokens", token_count_bpe_ish(text_col))
        .withColumn("punct_ratio", punct_ratio(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )


def tfidf_scores(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, term, tfidf) where tfidf = total term occurrences in the
    group × ln(N / document-frequency), N = non-blank corpus size.

    The shape behind vocabulary pruning and per-language boilerplate
    ranking. Scale: two aggregations over the exploded token stream (both
    with map-side partial combine) joined on term — the token explode is
    the dominant cost and is linear in corpus tokens; N arrives as a
    broadcast scalar, never a driver round-trip."""
    nonblank = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    toks = nonblank.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("id"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("group", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(F.count_distinct("id").alias("df"))
    n = nonblank.agg(F.count("*").alias("n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "group",
            "term",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6).alias("tfidf"),
        )
    )


def word_bigrams(tokens: Column) -> Column:
    """Space-joined word 2-grams from a token array; arrays with < 2
    elements yield an empty array (guards the ``sequence(1, 0)``
    descending-sequence trap that would index position 0)."""
    return F.when(
        F.size(tokens) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - 1),
            lambda i: F.concat(
                F.element_at(tokens, i), F.lit(" "), F.element_at(tokens, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition metrics in the style of the public
    Gopher/MassiveText quality filters, re-based on tokens/2-grams
    (the corpus is single-line, so line-level variants are degenerate):

    - ``dup_token_frac``   — 1 − distinct/total tokens
    - ``dup_2gram_char_frac`` — chars inside 2-grams occurring ≥ 2×,
      over all 2-gram chars (all occurrences counted)
    - ``top_2gram_frac``   — share of 2-gram occurrences taken by the
      single most frequent 2-gram

    Scale: two explode→groupBy chains, both keyed by (id, group) with
    map-side partial aggregation; the final metric join sees both sides
    already hash-partitioned on (id, group), so no extra exchange. This
    deliberately trades one linear shuffle of the token stream for
    staying inside whole-stage codegen — the no-shuffle alternative
    (sorted-array neighbor comparison via higher-order functions) runs
    interpreted and measured slower in this repo (see SCALE.md on
    interpreted HOFs)."""
    nonblank = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    ws = words(F.lower(F.col(text_col)))
    base = nonblank.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp"), ws.alias("w")
    )

    tok_counts = (
        base.select("id", "grp", F.explode("w").alias("t"))
        .groupBy("id", "grp", "t")
        .agg(F.count("*").alias("cnt"))
    )
    tok_metrics = tok_counts.groupBy("id", "grp").agg(
        (1.0 - F.count("*") / F.sum("cnt")).alias("dup_token_frac")
    )

    big_counts = (
        base.select("id", "grp", F.explode(word_bigrams(F.col("w"))).alias("g"))
        .groupBy("id", "grp", "g")
        .agg(F.count("*").alias("cnt"))
    )
    gchars = F.length(F.col("g")) * F.col("cnt")
    big_metrics = big_counts.groupBy("id", "grp").agg(
        (
            F.sum(F.when(F.col("cnt") > 1, gchars).otherwise(0)) / F.sum(gchars)
        ).alias("dup_2gram_char_frac"),
        (F.max("cnt") / F.sum("cnt")).alias("top_2gram_frac"),
    )

    return (
        tok_metrics.join(big_metrics, ["id", "grp"], "left")
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            "dup_token_frac",
            F.coalesce("dup_2gram_char_frac", F.lit(0.0)).alias("dup_2gram_char_frac"),
            F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
        )
    )


# Conservative public-knowledge PII patterns, portable between Java regex
# (Spark) and RE2 (DuckDB): no lookaround, no backreferences.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d().-]{7,}\d",
}


def pii_counts(text_col: Column | str = "text") -> Column:
    """Struct of per-category PII match counts — all built-in
    ``regexp_extract_all`` (codegen), no Python."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.struct(
        *[
            F.size(F.regexp_extract_all(c, F.lit(p), F.lit(0))).alias(name)
            for name, p in PII_PATTERNS.items()
        ]
    )


def redact_pii(text_col: Column | str = "text") -> Column:
    """Replace each PII category with a ``[CATEGORY]`` placeholder;
    chained ``regexp_replace``, order = PII_PATTERNS order (email before
    phone so the ``+digits`` rule never eats an address's domain digits)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, p in PII_PATTERNS.items():
        c = F.regexp_replace(c, p, f"[{name.upper()}]")
    return c


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "lang",
    text_col: str = "text",
    broadcast_lm: bool = False,
) -> DataFrame:
    """Per-document mean token surprisal −ln P(w) under the corpus's own
    unigram LM — the shape of CCNet-style LM quality filtering (docs far
    from the corpus distribution score high). Returns
    (id, group, n_tokens, mean_surprisal).

    Self-scored, so every token is in-vocabulary by construction and no
    smoothing term is needed.

    Scale: the LM (term → count) is one aggregation over the exploded
    token stream; scoring re-joins that stream to the LM on term. Both
    sides hash-partition on term, so the join adds one token-stream
    shuffle — linear in corpus tokens, no skew beyond Zipf head terms
    (AQE splits those). ``broadcast_lm=True`` ships the LM to every
    executor instead, the right call only when the vocabulary is known to
    fit the broadcast limit. The corpus token total arrives as a
    broadcast 1-row frame, never a driver round-trip.
    """
    nonblank = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    toks = nonblank.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    lm = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    if broadcast_lm:
        lm = F.broadcast(lm)
    total = toks.agg(F.count("*").alias("total"))
    return (
        toks.join(lm, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("id", "grp")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(-F.log(F.col("cnt") / F.col("total"))).alias("mean_surprisal"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            "n_tokens",
            "mean_surprisal",
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 0,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into fixed-token-budget training chunks with
    optional overlap (tokenizer-stride convention): windows start every
    ``chunk_tokens − overlap`` tokens; a window whose start is past
    ``n − overlap`` would be wholly contained in its predecessor and is
    not emitted. Blank docs yield no chunks. Returns
    (id, *carry_cols, chunk_idx, chunk_n_tokens, chunk_text);
    ``carry_cols`` ride along so callers never re-join chunks back to
    the source table.

    Scale: pure narrow ops — tokenize, generate window starts with
    ``sequence``, ``posexplode``, ``slice`` — no shuffle at all; chunking
    100 TB is a single map stage that parallelizes by input split.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    w = words(F.col(text_col))
    n = F.size(w)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - F.lit(overlap)), F.lit(step)
    )
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("id"),
            *carry_cols,
            w.alias("_w"),
            F.posexplode(starts).alias("chunk_idx", "_start"),
        )
        .select(
            F.col("id").alias(id_col),
            *carry_cols,
            "chunk_idx",
            F.size(F.slice(F.col("_w"), F.col("_start"), chunk_tokens)).alias(
                "chunk_n_tokens"
            ),
            F.array_join(
                F.slice(F.col("_w"), F.col("_start"), chunk_tokens), " "
            ).alias("chunk_text"),
        )
    )


def bigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean bigram surprisal −ln P(wᵢ | wᵢ₋₁) under the
    corpus's own bigram LM, P = c(wᵢ₋₁ wᵢ) / c(wᵢ₋₁ ·) — the next step up
    from unigram_surprisal (token-order sensitivity: shuffled text scores
    high even when its unigram profile is normal). Docs with < 2 tokens
    have no bigrams and are excluded. Returns
    (id, group, n_bigrams, mean_surprisal).

    Scale: bigram construction is narrow (word_bigrams on the token
    array); the LM is one aggregation over the exploded bigram stream,
    context counts are a second aggregation over the same keys' prefix,
    and scoring joins the stream to both — all hash-partitioned on the
    bigram/context term, linear in corpus tokens.
    """
    nonblank = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    bigs = nonblank.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.explode(word_bigrams(words(F.lower(F.col(text_col))))).alias("g"),
    )
    lm = bigs.groupBy("g").agg(F.count("*").alias("cnt"))
    ctx = bigs.select(
        F.split(F.col("g"), " ", 2).getItem(0).alias("prev")
    ).groupBy("prev").agg(F.count("*").alias("ctx_cnt"))
    scored = (
        bigs.join(lm, "g")
        .withColumn("prev", F.split(F.col("g"), " ", 2).getItem(0))
        .join(ctx, "prev")
    )
    return (
        scored.groupBy("id", "grp")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(-F.log(F.col("cnt") / F.col("ctx_cnt"))).alias("mean_surprisal"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            "n_bigrams",
            "mean_surprisal",
        )
    )
