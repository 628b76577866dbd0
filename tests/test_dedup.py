

def test_semantic_dedup_removes_planted_copies(spark, sf_dir):
    import pyspark.sql.functions as F

    from hielo_spark.io import load_table
    from hielo_spark.operators.dedup import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(200)
    copies = e.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = e.unionByName(copies)
    kept, removed = semantic_dedup(corpus, k=4, threshold=0.95)
    removed_ids = {r.vec_id for r in removed.collect()}
    # exactly one per planted pair, and the id tie-break keeps the source
    assert removed_ids == {10000 + i for i in range(10)}
    assert kept.count() == 200
    # distinct vectors all survive
    assert kept.filter(F.col("vec_id") < 10000).count() == 200


def test_semantic_dedup_no_pairs_is_identity(spark, sf_dir):
    from hielo_spark.io import load_table
    from hielo_spark.operators.dedup import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(100)
    kept, removed = semantic_dedup(e, k=4, threshold=0.95)
    assert removed.count() == 0
    assert kept.count() == 100


def test_minhash_duplicate_ids_fail_loudly(spark):
    """r14 (ADVICE r13): the single-join verify reassembly assumes
    unique ids; a duplicated id used to silently yield jaccard=1.0 for
    a dissimilar pair. The count guard must raise instead."""
    import pytest

    from hielo_spark.operators.dedup import minhash_neardup_pairs

    dup = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (1, "zz yy xx ww vv uu tt ss rr qq pp oo nn"),
            (2, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    with pytest.raises(Exception, match="duplicate ids|expected 2"):
        minhash_neardup_pairs(dup, threshold=0.1).collect()
