"""Hashed logistic-regression quality classifier (operators/classifier.py):
distributed full-batch GD converges on separable data, losses decrease,
scoring round-trips, and degenerate inputs are handled."""

from __future__ import annotations

import pytest

from hielo_spark.operators.classifier import (
    score_hashed_logreg,
    train_hashed_logreg,
)


@pytest.fixture()
def labeled_docs(spark):
    good = [
        "the quick brown fox jumps over the lazy dog",
        "a well written paragraph with varied vocabulary and structure",
        "science shows that careful methods produce reliable results",
        "the committee published a thorough report on water quality",
    ]
    bad = [
        "buy cheap buy cheap buy cheap click here click here",
        "zzz spam spam spam winner winner free free free",
        "click click click buy buy buy now now now",
        "free winner claim prize free winner claim prize",
    ]
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(bad)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_train_separates_and_losses_decrease(spark, labeled_docs):
    model = train_hashed_logreg(
        labeled_docs, "text", "label", dim=1 << 12, iters=30, lr=4.0
    )
    assert model["losses"][0] > model["losses"][-1]
    assert model["losses"][-1] < 0.3  # near-separable → low log-loss
    scored = {
        r.doc_id: r.quality_prob
        for r in score_hashed_logreg(labeled_docs, model, "text").collect()
    }
    # perfect ranking on the training set (separable vocabulary)
    assert all(scored[i] > 0.5 for i in (0, 1, 2, 3))
    assert all(scored[100 + i] < 0.5 for i in (0, 1, 2, 3))


def test_score_unseen_and_empty_docs(spark, labeled_docs):
    model = train_hashed_logreg(
        labeled_docs, "text", "label", dim=1 << 12, iters=30, lr=4.0
    )
    unseen = spark.createDataFrame(
        [
            (1, "careful thorough science report methods"),
            (2, "free free winner click buy now"),
            (3, "   "),  # whitespace-only → scores at the bias
        ],
        ["doc_id", "text"],
    )
    s = {r.doc_id: r.quality_prob for r in
         score_hashed_logreg(unseen, model, "text").collect()}
    assert s[1] > 0.5 > s[2]
    assert 0.0 < s[3] < 1.0  # bias fallback, not null/crash


def test_train_rejects_empty_corpus(spark):
    empty = spark.createDataFrame([(1, "   ", 1)], ["doc_id", "text", "label"])
    with pytest.raises(ValueError, match="no documents"):
        train_hashed_logreg(empty, "text", "label", dim=256, iters=1)
