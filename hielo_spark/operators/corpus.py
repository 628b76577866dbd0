"""Corpus-level cleaning operators (SURVEY §2.8 X1/X4 extensions):
cross-document boilerplate-line removal and duplicated-n-gram span
coverage — the two RefinedWeb/C4-family cleanups that act on evidence
aggregated over the WHOLE corpus rather than per-document (cf. the
per-doc quality ops in operators/text.py and the doc-level dedup in
operators/dedup.py; designs from the public line-dedup discussion in
RefinedWeb/CCNet and the duplicated-substring analysis of "Deduplicating
Training Data Makes Language Models Better" — see PAPERS.md).

Scale design: both operators are explode → hash-keyed groupBy →
join-back chains. The corpus-frequency side (duplicated lines / grams)
is produced by a partial-aggregated groupBy on a fixed-width hash key
and consumed by semi/left joins — never collected, never broadcast by
hint (AQE size-gates it), so the plan shape survives a corpus that
doesn't fit any single machine. No Python UDFs anywhere — every
expression is built-in/codegen.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

# unit-separator: joins tokens into a gram key without ambiguity
_US = "\x1f"


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Remove lines that occur (trimmed-identical) in at least
    ``min_docs`` DISTINCT documents — shared boilerplate (headers,
    navigation, license banners) that per-document dedup can never see.
    Lines whose trimmed length is below ``min_chars`` never count as
    boilerplate and are always kept (blank separators aren't evidence).

    Returns the input frame with ``text_col`` rewritten to the kept
    lines (original order, re-joined with ``sep``) plus two counters:
    ``n_lines`` (before) and ``n_removed``. Documents whose every line
    is boilerplate come back with empty text, not dropped — dropping is
    the caller's policy decision.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (a line can't duplicate itself)")
    other = [c for c in docs.columns if c != text_col]

    lines = docs.select(
        *other,
        F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1)).alias(
            "_pos", "_line"
        ),
    ).withColumn("_key", F.trim(F.col("_line")))

    # corpus-frequency side: distinct-doc counts per trimmed line,
    # hash-keyed so the shuffle key is fixed-width at any corpus size
    boiler = (
        lines.filter(F.length("_key") >= min_chars)
        .groupBy(F.xxhash64("_key").alias("_h"))
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_h")
    )

    marked = lines.withColumn("_h", F.xxhash64("_key")).join(
        boiler.withColumn("_bp", F.lit(True)), "_h", "left"
    )
    drop = (F.col("_bp").isNotNull()) & (F.length("_key") >= min_chars)

    rebuilt = (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(drop, 1).otherwise(0)).cast("bigint").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~drop, F.struct("_pos", "_line"))
                        )
                    ),
                    lambda s: s["_line"],
                ),
                sep,
            ).alias("_clean"),
        )
        .withColumn("n_lines", F.col("n_lines").cast("bigint"))
    )
    return (
        docs.drop(text_col)
        .join(rebuilt, id_col)
        .withColumnRenamed("_clean", text_col)
    )


def line_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """The evidence view behind ``remove_boilerplate_lines``: one row
    per boilerplate line with its distinct-doc count and total
    occurrence count (what a curation run reports before committing to
    the removal)."""
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), _re.escape(sep), -1)).alias("_line"),
    ).select("_id", F.trim("_line").alias("line"))
    return (
        lines.filter(F.length("line") >= min_chars)
        .groupBy("line")
        .agg(
            F.count_distinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def _gram_frame(docs, text_col, id_col, n, token_sep):
    """(base, grams): tokenized base frame with token counts, and the
    per-doc (id, _start, _gram-hash) occurrence frame — the shared
    front half of coverage and removal."""
    toks = F.split(F.col(text_col), _re.escape(token_sep), -1)
    base = docs.select(F.col(id_col), toks.alias("_t")).withColumn(
        "_n_tokens", F.size("_t")
    )
    grams = base.filter(F.col("_n_tokens") >= n).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_n_tokens") - n),
                lambda i: F.xxhash64(F.concat_ws(_US, F.slice("_t", i + 1, n))),
            )
        ).alias("_start", "_gram"),
    )
    return base, grams


def dup_ngram_coverage(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    token_sep: str = " ",
) -> DataFrame:
    """Per-document duplicated-substring exposure: the fraction of token
    positions covered by at least one ``n``-gram that also appears in
    ``min_docs``-or-more distinct documents (the span-level statistic of
    Lee et al.'s substring-dedup analysis — a doc pair can share a long
    verbatim passage while their set-level Jaccard stays low, which is
    exactly what MinHash-style doc-level dedup misses).

    Returns ``(id_col, n_tokens, covered, coverage)`` for every input
    document; ``coverage`` is ``covered / n_tokens`` rounded to 6 dp,
    0.0 for documents shorter than ``n`` tokens.

    Plan shape: tokenize → per-doc gram hashes via ``transform`` over a
    ``sequence`` (no per-row Python) → posexplode → groupBy(gram-hash)
    distinct-doc counts → semi-join occurrences → explode the n covered
    offsets → per-doc distinct-position count. Three shuffles total
    (gram counts, semi-join, per-doc agg), each on fixed-width keys.
    """
    if n < 2:
        raise ValueError("n must be >= 2 (unigrams are vocabulary, not spans)")
    base, grams = _gram_frame(docs, text_col, id_col, n, token_sep)
    dup = (
        grams.groupBy("_gram")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_gram")
    )
    covered = (
        grams.join(dup, "_gram", "left_semi")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("_start"), F.col("_start") + (n - 1))
            ).alias("_p"),
        )
        .groupBy(id_col)
        .agg(F.count_distinct("_p").alias("covered"))
    )
    return (
        base.select(id_col, F.col("_n_tokens").cast("bigint").alias("n_tokens"))
        .join(covered, id_col, "left")
        .withColumn("covered", F.coalesce(F.col("covered"), F.lit(0)).cast("bigint"))
        .withColumn(
            "coverage",
            F.round(F.col("covered") / F.col("n_tokens"), 6),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    token_sep: str = " ",
) -> DataFrame:
    """Substring-level dedup (the removal half of Lee et al.'s analysis,
    completing ``dup_ngram_coverage``): for every ``n``-gram appearing
    in ``min_docs``-or-more distinct documents, the document with the
    LOWEST id keeps its copy (the canonical owner) and every other
    document loses the covered token positions. Returns the input frame
    with ``text_col`` rebuilt from the kept tokens plus ``n_tokens`` /
    ``n_removed`` counters.

    Same plan family as coverage — one extra join against the per-gram
    owner (min-id aggregate, computed in the same groupBy as the
    distinct-doc count) and a positional anti-join for the rebuild; all
    shuffle keys are fixed-width hashes or (id, pos) pairs."""
    if n < 2:
        raise ValueError("n must be >= 2")
    base, grams = _gram_frame(docs, text_col, id_col, n, token_sep)
    owners = (
        grams.groupBy("_gram")
        .agg(
            F.count_distinct(F.col(id_col)).alias("_nd"),
            F.min(F.col(id_col)).alias("_owner"),
        )
        .filter(F.col("_nd") >= min_docs)
        .select("_gram", "_owner")
    )
    owned_occ = grams.join(owners, "_gram")
    span = F.explode(
        F.sequence(F.col("_start"), F.col("_start") + (n - 1))
    ).alias("_p")
    # no .distinct() on either side: both frames feed anti-joins, whose
    # semantics tolerate duplicate keys — two fewer shuffles
    foreign_pos = (
        owned_occ.filter(F.col(id_col) != F.col("_owner"))
        .select(F.col(id_col), span)
    )
    # positions covered by a gram THIS doc owns are protected — without
    # this, an overlapping gram owned by a third doc could cut tokens
    # out of the canonical copy too, partially erasing the passage from
    # the whole corpus
    owned_pos = (
        owned_occ.filter(F.col(id_col) == F.col("_owner"))
        .select(F.col(id_col), span)
    )
    drop_pos = foreign_pos.join(owned_pos, [id_col, "_p"], "left_anti")
    tokens = base.select(
        F.col(id_col), "_n_tokens", F.posexplode("_t").alias("_p", "_tok")
    )
    kept = tokens.join(drop_pos, [id_col, "_p"], "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "_tok"))),
                    lambda s: s["_tok"],
                ),
                token_sep,
            ).alias("_clean"),
            F.count(F.lit(1)).alias("_nkept"),
        )
    )
    # docs whose EVERY token was removed disappear from `kept` — restore
    # them with empty text via a left join from the full corpus
    return (
        docs.drop(text_col)
        .join(
            base.select(id_col, F.col("_n_tokens").cast("bigint").alias("n_tokens")),
            id_col,
        )
        .join(rebuilt.select(
            id_col,
            F.col("_clean"),
            F.col("_nkept").cast("bigint").alias("_nkept"),
        ), id_col, "left")
        .withColumn("_clean", F.coalesce(F.col("_clean"), F.lit("")))
        .withColumn(
            "n_removed",
            (F.col("n_tokens") - F.coalesce(F.col("_nkept"), F.lit(0))).cast("bigint"),
        )
        .drop("_nkept")
        .withColumnRenamed("_clean", text_col)
    )
