

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
