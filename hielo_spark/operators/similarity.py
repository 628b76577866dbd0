"""X3 — similarity search over an embedding column (SURVEY §2.8).

Exact path: brute-force cosine top-k with the query side broadcast — one
scan of the corpus, no shuffle of the big side, TakeOrderedAndProject for
the top-k. Scale path: random-hyperplane LSH bucketing (SimHash family) so
candidate generation is a bucket join instead of a cross join.

Vector math uses built-in higher-order functions (zip_with/aggregate) —
JVM-side, no Python. For very wide vectors a pandas_udf + numpy dot is the
alternative; at dim≈64-1024 the built-ins are competitive and avoid Arrow
transfer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs cast to double arrays for stable math."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    The query side is broadcast (queries ≪ corpus); the corpus is scanned
    once. Per-query top-k via window row_number — with a single query this
    lowers to TakeOrderedAndProject.
    """
    q = broadcast(queries.select(query_id, query_vec))
    sim = cosine(F.col(corpus_vec), F.col(query_vec)).alias("cosine_sim")
    scored = corpus.join(q, F.col(corpus_id) != F.col(query_id)).select(
        query_id, corpus_id, sim
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine_sim", F.col("rank").cast("bigint").alias("rank"))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG, no numpy RNG state) —
    same planes on every executor/run."""
    planes: list[list[float]] = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)  # in [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from random hyperplanes (SimHash for vectors).
    n_planes bits → up to 2^n buckets; neighbors collide with high prob."""
    v = vec.cast("array<double>")
    bits = [
        F.when(dot(v, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in planes
    ]
    acc = F.lit(0)
    for b in bits:
        acc = acc * 2 + b
    return acc


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane signs,
    join on bucket, rank within candidates. At 100 TB the bucket join
    replaces the cross join — candidates ≈ corpus / 2^n_planes per query.
    Recall is tunable via n_planes (fewer planes → bigger buckets)."""
    planes = random_hyperplanes(dim, n_planes)
    c = corpus.withColumn("bucket", lsh_bucket(F.col(corpus_vec), planes))
    q = broadcast(
        queries.select(query_id, query_vec).withColumn("bucket", lsh_bucket(F.col(query_vec), planes))
    )
    sim = cosine(F.col(corpus_vec), F.col(query_vec)).alias("cosine_sim")
    scored = c.join(q, "bucket").filter(F.col(corpus_id) != F.col(query_id)).select(
        query_id, corpus_id, sim
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine_sim", F.col("rank").cast("bigint").alias("rank"))
    )


def _top_cells(vec: Column, centroids: list[tuple[int, list[float]]], n: int, affinity) -> Column:
    """Top-``n`` ``struct(aff, cell)`` entries for one vector, computed
    INLINE in the row's projection (r13, guide §2.4). The r12 form
    broadcast-cross-joined the corpus with the centroid table (corpus×k
    rows, each carrying the full vector) and ranked with a
    ``Window.partitionBy(id)`` — a full shuffle of that exploded frame per
    pass, three passes per ``ivf_topk`` call. Here the k affinities are k
    expressions over centroid literals in one projection: no row
    blow-up, no Exchange.

    Exactness: ``affinity`` is the same zip_with/aggregate fold the join
    form evaluated, over the same doubles (createDataFrame and F.lit both
    carry the Python floats verbatim), so affinities — and therefore
    assignments, including the (aff desc, cell asc) tie order the
    comparator reproduces — are bit-identical to the r12 window. (NaN
    affinities would compare differently than the window's NaN-is-largest;
    cosine() never returns NaN — its zero-norm guard returns 0.0.)"""
    entries = F.array(
        *[
            F.struct(
                affinity(vec, F.array(*[F.lit(float(x)) for x in cvec])).alias("aff"),
                F.lit(int(cell)).alias("cell"),
            )
            for cell, cvec in centroids
        ]
    )
    ranked = F.array_sort(
        entries,
        lambda a, b: F.when(a["aff"] > b["aff"], F.lit(-1))
        .when(a["aff"] < b["aff"], F.lit(1))
        .otherwise(a["cell"] - b["cell"]),
    )
    return F.slice(ranked, 1, n)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    seed: int = 42,
    n_assign: int = 1,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into inverted lists by nearest
    centroid; each query probes only its ``n_probe`` closest lists.

    ``n_assign`` > 1 is MULTI-ASSIGNMENT (the IVF "spill" refinement):
    every corpus vector is indexed under its ``n_assign`` nearest
    centroids, so boundary vectors — the ones single-assignment recall
    loses — are reachable from either side of the cell boundary. Storage
    and candidate counts scale by n_assign; recall at a FIXED probe
    fraction rises (measured on the near-uniform synthetic fixture:
    n_probe=8/16 recall 0.74-0.76 single-assign → ≥0.9 with n_assign=2).
    Candidates are deduplicated before ranking, so results are identical
    in shape to single-assignment.

    Centroid selection is one Lloyd round over deterministic hash-sampled
    seeds (no RNG state, no sklearn): sample n_centroids vectors by
    xxhash64 order, assign every corpus vector to its nearest seed, take
    per-cell means as the final centroids — all DataFrame ops; the
    centroid table (tiny) is the only collect, and it's bounded by
    n_centroids × dim.

    Scale shape: corpus scanned twice (assign, then probe-join); the probe
    join is an equi-join on centroid id — candidates ≈ corpus × n_assign
    × (n_probe / n_centroids) per query, never a cross join.
    """
    from pyspark import StorageLevel

    v = F.col(corpus_vec).cast("array<double>")
    # The projected (id, v) corpus feeds THREE passes (seed sample,
    # centroid refinement, final inverted lists) — persist it once so
    # passes 2-3 read the cache instead of re-scanning storage (the same
    # reuse-across-iterations policy kmeans applies to its vector frame).
    # Cache note: the final pass is lazy, so the frame stays pinned for
    # the session (no unpersist-after-lazy-result hook exists);
    # long-lived callers should ``spark.catalog.clearCache()`` after
    # materializing the result, as bench.py does.
    base = corpus.select(F.col(corpus_id).alias("id"), v.alias("v")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # 1. deterministic seed sample → one Lloyd refinement round
    seeds = base.orderBy(F.xxhash64(F.col("id"), F.lit(seed))).limit(n_centroids)
    seed_rows = seeds.collect()  # n_centroids rows — bounded, deliberate
    seed_arr = [(i, list(r["v"])) for i, r in enumerate(seed_rows)]
    cells = base.select(
        "id", "v", _top_cells(F.col("v"), seed_arr, 1, dot)[0]["cell"].alias("cell")
    )
    centroids = (
        cells.groupBy("cell")
        .agg(F.array(*[F.avg(F.col("v")[i]) for i in range(len(seed_arr[0][1]))]).alias("centroid"))
    )
    centroid_rows = [(r["cell"], list(r["centroid"])) for r in centroids.collect()]
    # 2. final inverted lists under the refined centroids — each vector
    # lands in its n_assign nearest cells (multi-assignment)
    lists = base.select(
        "id", "v",
        F.explode(
            _top_cells(F.col("v"), centroid_rows, int(n_assign), cosine)
        ).alias("c"),
    ).select("id", "v", F.col("c.cell").alias("cell"))
    # 3. queries probe their n_probe nearest cells
    qv = F.col(query_vec).cast("array<double>")
    probes = F.broadcast(
        queries.select(F.col(query_id).alias("qid"), qv.alias("qv"))
        .select(
            "qid", "qv",
            F.explode(
                _top_cells(F.col("qv"), centroid_rows, int(n_probe), cosine)
            ).alias("c"),
        )
        .select("qid", "qv", F.col("c.cell").alias("cell"))
    )
    scored = lists.join(probes, "cell").filter(F.col("id") != F.col("qid"))
    if n_assign > 1:
        # a multi-assigned vector can reach one query via several cells —
        # dedup (qid, id) before scoring so ranks don't double-count
        scored = scored.dropDuplicates(["qid", "id"])
    scored = scored.select(
        F.col("qid").alias(query_id),
        F.col("id").alias(corpus_id),
        cosine(F.col("v"), F.col("qv")).alias("cosine_sim"),
    )
    wr = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine_sim", F.col("rank").cast("bigint").alias("rank"))
    )
