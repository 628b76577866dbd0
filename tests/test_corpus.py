"""Corpus-level cleaning operators (operators/corpus.py): cross-document
boilerplate-line removal and duplicated-n-gram span coverage."""

from __future__ import annotations

import pytest

from hielo_spark.operators import corpus


@pytest.fixture()
def boiler_docs(spark):
    # "SITE HEADER" and "(c) footer" appear in 3 docs; "unique …" lines
    # appear once each; blank lines everywhere
    rows = [
        (1, "SITE HEADER\nunique alpha text\n\n(c) footer"),
        (2, "SITE HEADER\nunique beta text\n(c) footer"),
        (3, "SITE HEADER\nunique gamma text\n\n(c) footer"),
        (4, "standalone document\nwith its own lines"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_remove_boilerplate_lines(spark, boiler_docs):
    out = {
        r.doc_id: r
        for r in corpus.remove_boilerplate_lines(
            boiler_docs, min_docs=3
        ).collect()
    }
    assert out[1].text == "unique alpha text\n"
    assert out[2].text == "unique beta text"
    assert out[3].text == "unique gamma text\n"
    assert out[4].text == "standalone document\nwith its own lines"
    assert (out[1].n_lines, out[1].n_removed) == (4, 2)
    assert (out[4].n_lines, out[4].n_removed) == (2, 0)
    # min_docs=4 → nothing crosses the bar, texts untouched
    untouched = {
        r.doc_id: r.text
        for r in corpus.remove_boilerplate_lines(boiler_docs, min_docs=4).collect()
    }
    orig = {r.doc_id: r.text for r in boiler_docs.collect()}
    assert untouched == orig


def test_remove_boilerplate_trims_for_matching_keeps_original_line(spark):
    """Count matching is on trimmed lines, but kept lines come back
    verbatim; padded variants of boilerplate die too."""
    rows = [
        (1, "  SHARED  \nkeep me one"),
        (2, "SHARED\nkeep me two"),
        (3, "body only"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text for r in corpus.remove_boilerplate_lines(docs).collect()}
    assert out[1] == "keep me one"
    assert out[2] == "keep me two"
    assert out[3] == "body only"


def test_blank_lines_never_count_as_boilerplate(spark, boiler_docs):
    out = {
        r.doc_id: r.text
        for r in corpus.remove_boilerplate_lines(boiler_docs, min_docs=2).collect()
    }
    # blank lines survive in 1 and 3 even though blanks appear in 2 docs
    assert "\n" in out[1] and out[1].count("\n") == 1


def test_line_frequencies_evidence_view(spark, boiler_docs):
    freq = {
        r.line: (r.n_docs, r.n_occurrences)
        for r in corpus.line_frequencies(boiler_docs, min_docs=2).collect()
    }
    assert freq == {"SITE HEADER": (3, 3), "(c) footer": (3, 3)}


def test_remove_boilerplate_validation(spark, boiler_docs):
    with pytest.raises(ValueError, match="min_docs"):
        corpus.remove_boilerplate_lines(boiler_docs, min_docs=1)


def test_dup_ngram_coverage_hand_computed(spark):
    """Docs 1 and 2 share the verbatim run 'a b c d' (4 tokens); doc 3
    is disjoint. n=3, min_docs=2: duplicated grams are 'a b c' and
    'b c d' → covered positions in each sharer = {0,1,2,3} (doc 1) /
    {2,3,4,5} (doc 2) = 4 of 6."""
    rows = [
        (1, "a b c d x y"),
        (2, "p q a b c d"),
        (3, "m n o r s t"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.n_tokens, r.covered, r.coverage)
        for r in corpus.dup_ngram_coverage(docs, n=3).collect()
    }
    assert out[1] == (6, 4, pytest.approx(4 / 6))
    assert out[2] == (6, 4, pytest.approx(4 / 6))
    assert out[3] == (6, 0, 0.0)


def test_dup_ngram_coverage_short_docs_zero(spark):
    rows = [(1, "a b"), (2, "a b"), (3, "a b c d e f g h")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.coverage for r in corpus.dup_ngram_coverage(docs, n=8).collect()}
    # 2-token docs are below n — coverage 0, never errors
    assert out == {1: 0.0, 2: 0.0, 3: 0.0}


def test_dup_ngram_coverage_within_doc_repeat_not_duplicated(spark):
    """A gram repeated inside ONE doc is not cross-doc duplication
    (min_docs counts distinct docs)."""
    rows = [(1, "a b c a b c a b c"), (2, "x y z w v u")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.covered for r in corpus.dup_ngram_coverage(docs, n=3).collect()}
    assert out == {1: 0, 2: 0}


def test_remove_duplicated_spans_owner_keeps_copy(spark):
    """Docs 1/2 share 'a b c d'; doc 1 (lowest id) keeps it, doc 2
    loses the covered positions; disjoint doc 3 untouched."""
    rows = [
        (1, "a b c d x y"),
        (2, "p q a b c d"),
        (3, "m n o r s t"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.text, r.n_tokens, r.n_removed)
        for r in corpus.remove_duplicated_spans(docs, n=3).collect()
    }
    assert out[1] == ("a b c d x y", 6, 0)   # canonical owner untouched
    assert out[2] == ("p q", 6, 4)            # span cut
    assert out[3] == ("m n o r s t", 6, 0)


def test_remove_duplicated_spans_total_removal_yields_empty(spark):
    rows = [(1, "a b c"), (2, "a b c")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.text, r.n_removed)
           for r in corpus.remove_duplicated_spans(docs, n=3).collect()}
    assert out[1] == ("a b c", 0)
    assert out[2] == ("", 3)  # fully-duplicated doc empties, stays present


def test_remove_duplicated_spans_three_way(spark):
    """With three sharers the lowest id owns; both others are cut."""
    rows = [(5, "z z a b c"), (7, "a b c q"), (9, "w a b c")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.n_removed
           for r in corpus.remove_duplicated_spans(docs, n=3).collect()}
    assert out == {5: 0, 7: 3, 9: 3}


def test_remove_duplicated_spans_owner_protected_from_overlap(spark):
    """An overlapping gram owned by a THIRD doc must not cut tokens out
    of a passage's canonical copy: doc 2 owns 'b c d' vs doc 3, and its
    overlapping 'a b c' (owned by doc 1) may not carve holes in it."""
    rows = [
        (1, "a b c x y z"),        # owns 'a b c'
        (2, "a b c d q r"),        # owns 'b c d' (vs doc 3); loses only a-b-c? no:
                                    # positions of 'b c d' are self-owned → protected
        (3, "p b c d s t"),        # foreign copy of 'b c d' → cut
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.text, r.n_removed)
           for r in corpus.remove_duplicated_spans(docs, n=3).collect()}
    # doc 2: 'a' (pos 0) is foreign-covered only via 'a b c'; 'b','c'
    # are covered by its self-owned 'b c d' → protected; 'd' self-owned
    assert out[2] == ("b c d q r", 1)
    # doc 3 loses its copy of 'b c d'
    assert out[3] == ("p s t", 3)
    # doc 1 keeps everything (owns its only dup gram)
    assert out[1] == ("a b c x y z", 0)
