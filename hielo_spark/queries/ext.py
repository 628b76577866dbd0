"""[EXT] operator queries (SURVEY §2.8 X1-X4) over documents/embeddings.

Oracle-checkable where DuckDB can express the same math (text stats, md5
fingerprints, blocked Jaccard, brute-force cosine); hash-based LSH paths
(MinHash, SimHash) are rows-only checks by design — the driver records the
weaker check and the pytest suite pins their semantics instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from pyspark.sql.functions import broadcast

from ..io import fan_out, load_table
from ..operators import contamination, dedup, sampling, similarity, text as T

QUERIES = {}
ORACLE = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# X4 — per-language text stats (word counts via the same split semantics).
# --------------------------------------------------------------------------
@query(
    "doc_lang_stats",
    """
    SELECT lang,
           count(*) AS n_docs,
           CAST(round(avg(n_chars), 6) AS DOUBLE) AS avg_chars,
           CAST(round(avg(CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+')) END), 6) AS DOUBLE) AS avg_words,
           CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS total_words
    FROM documents GROUP BY lang
    """,
)
def doc_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out (r14): the single-file scan runs the split-heavy word_count
    # on 2 tasks at sf>=1 — fanning halves the query (1.02 -> 0.52 s at
    # sf1; the r13 "wash" verdict was measured at the sf0.1 noise floor).
    # Order-safe: every aggregate is exact at fixture scale (int sums,
    # count; avg of ints sums exactly in double far below 2^53). At real
    # scale the scan is parallel and fan_out no-ops.
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(T.word_count("text")), 6).alias("avg_words"),
        F.sum(T.word_count("text")).cast("bigint").alias("total_words"),
    )


# --------------------------------------------------------------------------
# X4 — token counting per source (whitespace tokens; the BPE-ish regex
# variant is covered by pytest since regex-class semantics differ between
# engines).
# --------------------------------------------------------------------------
@query(
    "doc_token_count",
    """
    SELECT source,
           CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS n_tokens,
           count(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: same shape and rationale as doc_lang_stats above.
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return d.groupBy("source").agg(
        F.sum(T.word_count("text")).cast("bigint").alias("n_tokens"),
        F.count("*").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# X1 — exact-dedup fingerprinting: distinct fingerprints + duplicate mass.
# --------------------------------------------------------------------------
@query(
    "doc_exact_dedup",
    """
    SELECT count(*) AS n_docs,
           count(DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS n_distinct,
           count(*) - count(DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS n_dupes
    FROM documents
    """,
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = T.fingerprint("text")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_distinct"),
        (F.count("*") - F.countDistinct(fp)).alias("n_dupes"),
    )


# --------------------------------------------------------------------------
# X1 — per-doc fingerprints (md5 of normalized text; engine-stable).
# --------------------------------------------------------------------------
@query(
    "doc_fingerprints",
    """
    SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint("text").alias("fp"))


# --------------------------------------------------------------------------
# X2 — blocked exact n-gram (word-set) Jaccard near-dup pairs.
# --------------------------------------------------------------------------
@query(
    "doc_neardup_jaccard",
    """
    SELECT a.lang AS block, a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(round(
             CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
             / len(list_distinct(list_concat(a.ws, b.ws))), 6) AS DOUBLE) AS jaccard
    FROM (SELECT lang, doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS ws FROM documents WHERE length(trim(text)) > 0) a
    JOIN (SELECT lang, doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS ws FROM documents WHERE length(trim(text)) > 0) b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
          / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.5
    """,
)
def doc_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.blocked_jaccard_pairs(d, "lang", "doc_id", "text", 0.5)


# --------------------------------------------------------------------------
# X2 — MinHash LSH near-dup (rows-only: hash family is engine-specific).
# --------------------------------------------------------------------------
@query("doc_neardup_minhash")
def doc_neardup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_neardup_pairs(d, "doc_id", "text", threshold=0.5)


# --------------------------------------------------------------------------
# X2 — MinHash LSH quality, oracle-checked: recall of the LSH candidate
# pairs against the EXACT 3-gram-shingle Jaccard truth (the metric the
# MinHash path estimates — word-set Jaccard is a different, uncorrelated
# metric on this corpus). DuckDB recomputes the truth side (shingle sets
# via list_transform over string_split) and pins per-block truth_pairs
# exactly; the recall floor rides along as a pinned boolean — if the hash
# family or banding regresses so that LSH misses truth pairs, the row goes
# red in the driver sweep. Floor 0.9: banding collision probability at
# Jaccard j is 1-(1-j^4)^16 (0.64 at the 0.5 boundary, >0.98 past 0.7);
# observed fixture near-dups sit near j≈1 where recall is deterministic 1.0.
# --------------------------------------------------------------------------
@query(
    "doc_minhash_recall",
    """
    WITH s AS (
      SELECT lang, doc_id,
             CASE WHEN len(ws) >= 3
                  THEN list_distinct(list_transform(range(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                  ELSE [array_to_string(ws, ' ')] END AS sh
      FROM (SELECT lang, doc_id,
                   string_split_regex(trim(text), '\\s+') AS ws
            FROM documents WHERE length(trim(text)) > 0)
    )
    SELECT a.lang AS block, CAST(count(*) AS BIGINT) AS truth_pairs,
           TRUE AS recall_ge_090
    FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    GROUP BY a.lang
    """,
)
def doc_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # postings strategy (r13): 3-gram shingles are selective, so the
    # co-occurrence form beats the all-pairs block join (dedup.py A/B);
    # persisted because the truth set feeds BOTH the semi-join and the
    # per-block denominator — unpersisted it computed twice per run.
    # Same per-query cache policy as minhash_neardup_pairs (bench.py
    # clearCache()s between runs).
    truth = (
        dedup.blocked_jaccard_pairs(
            d, "lang", "doc_id", "text", threshold=0.5, shingle_n=3,
            strategy="postings",
        )
        .select("block", "id_a", "id_b")
        .persist()
    )
    # lang lookup is a shuffle join keyed on doc id — never broadcast the
    # full-corpus (doc_id, lang) map (that's the r1 broadcast cliff again);
    # the candidate side is collision-bounded and small
    doc_lang = d.select(F.col("doc_id"), F.col("lang"))
    cands = (
        dedup.minhash_candidates(d, "doc_id", "text")
        .join(doc_lang.withColumnRenamed("doc_id", "id_a").withColumnRenamed("lang", "lang_a"), "id_a")
        .join(doc_lang.withColumnRenamed("doc_id", "id_b").withColumnRenamed("lang", "lang_b"), "id_b")
        .filter(F.col("lang_a") == F.col("lang_b"))
        .select("id_a", "id_b")
    )
    hits = truth.join(cands, ["id_a", "id_b"], "left_semi")
    per_block = truth.groupBy("block").agg(F.count("*").alias("truth_pairs"))
    hit_block = hits.groupBy("block").agg(F.count("*").alias("hit_pairs"))
    return (
        per_block.join(hit_block, "block", "left")
        .select(
            "block",
            F.col("truth_pairs").cast("bigint").alias("truth_pairs"),
            (
                F.coalesce(F.col("hit_pairs"), F.lit(0)) / F.col("truth_pairs") >= 0.9
            ).alias("recall_ge_090"),
        )
    )


# --------------------------------------------------------------------------
# X3 — brute-force cosine top-k from a query vector (vec_id = 0).
# --------------------------------------------------------------------------
@query(
    "emb_cosine_topk",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           CAST(round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS DOUBLE) AS cosine_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) DESC, e.vec_id
    LIMIT 15
    """,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    sim = F.round(similarity.cosine(F.col("embedding"), F.col("qv")), 6).alias("cosine_sim")
    return (
        e.filter(F.col("vec_id") != 0)
        .join(broadcast(q))
        .select("vec_id", sim)
        .orderBy(F.col("cosine_sim").desc(), "vec_id")
        .limit(15)
    )


# --------------------------------------------------------------------------
# X3 — LSH-bucketed ANN (rows-only: bucket family is engine-specific).
# --------------------------------------------------------------------------
@query("emb_lsh_ann")
def emb_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dim = e.selectExpr("size(embedding) AS d").first().d
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.lsh_topk(e, q, dim=dim, k=5, n_planes=6)


# --------------------------------------------------------------------------
# X4 — per-doc quality scoring + banding (heuristics; oracle reproduces the
# same arithmetic).
# --------------------------------------------------------------------------
@query(
    "doc_quality",
    """
    WITH s AS (
      SELECT doc_id,
             length(text) AS n_chars_t,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
             CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE)
               / nullif(length(text), 0) AS punct_r
      FROM documents
    )
    SELECT doc_id,
           CAST(round(
             least(n_chars_t / 500.0, 1.0) * 0.5
             + CASE WHEN n_words > 0 AND n_chars_t / CAST(n_words AS DOUBLE) BETWEEN 3 AND 12 THEN 1.0 ELSE 0.5 END * 0.3
             + CASE WHEN coalesce(punct_r, 0.0) <= 0.1 THEN 1.0 ELSE 0.5 END * 0.2
           , 6) AS DOUBLE) AS quality
    FROM s
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(T.quality_score("text"), 6).alias("quality"))


# --------------------------------------------------------------------------
# X2/X3 — embedding-cosine near-dup within label blocks.
# --------------------------------------------------------------------------
@query(
    "emb_neardup_cosine",
    """
    SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS DOUBLE) AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
    """,
)
def emb_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # 10 labels × 4 salts = 40 join partitions ≥ the 32 cores; more salts
    # would only add build-side replication (see SCALE.md sizing rule)
    return dedup.embedding_neardup_pairs(
        e, "vec_id", "embedding", "label", threshold=0.3, n_salts=4
    )


# --------------------------------------------------------------------------
# X5 — multimodal decode (rows-only; r3: REAL decode — valid P6 PPMs
# built from JVM expressions; r4: doc_id mod 3 routes payloads across
# the three real codecs — PPM, zlib-compressed PNG (cycling all five
# filter types), and baseline JPEG from the pure-numpy T.81 encoder —
# all Huffman-decoded/inflated/parsed in the same mapInPandas stage;
# no fake path involved).
# --------------------------------------------------------------------------
@query("multimodal_image_features")
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as MM

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    ppm = MM.attach_ppm_media(d.filter(F.col("doc_id") % 3 == 0))
    png = MM.attach_png_media(d.filter(F.col("doc_id") % 3 == 1))
    jpg = MM.attach_jpeg_media(d.filter(F.col("doc_id") % 3 == 2))
    return MM.decode_image_features(ppm.unionByName(png).unionByName(jpg), fake=False)


# --------------------------------------------------------------------------
# X5 — multimodal audio (rows-only): REAL RIFF/WAVE decode + DSP feature
# extraction in one mapInPandas stage; payloads are valid 16-bit PCM WAVs
# synthesized per doc_id (sine + harmonic), so the recovered spectral
# centroid pins the generator frequency analytically (see
# tests/test_multimodal.py). No SQL oracle: DuckDB cannot decode WAV.
# --------------------------------------------------------------------------
@query("multimodal_audio_features")
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as MM

    d = load_table(spark, sf_dir, "documents").select("doc_id").limit(500)
    # mixed PCM + IMA-ADPCM payloads: the decode stage routes per
    # format tag, the real-world shape of a heterogeneous media lake
    return MM.decode_audio_features(MM.attach_wav_media(d, codec="mixed"))


# --------------------------------------------------------------------------
# X5 — multimodal video (rows-only): REAL uncompressed-AVI frame
# extraction + per-frame features in one mapInPandas stage — the frame
# explode happens inside the Arrow batch so each payload ships to Python
# once per video, not per frame. Payloads are valid RIFF/AVI containers
# synthesized per doc_id. No SQL oracle: DuckDB cannot decode AVI;
# lossless round-trip and sampling semantics pinned in
# tests/test_multimodal.py.
# --------------------------------------------------------------------------
@query("multimodal_video_features")
def multimodal_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as MM

    d = load_table(spark, sf_dir, "documents").select("doc_id").limit(200)
    return MM.decode_video_frame_features(
        MM.attach_avi_media(d, n_frames=6), every_n=2
    )


# --------------------------------------------------------------------------
# X2/X3 — SemDedup-style semantic dedup (cluster-then-dedup): 25 exact
# duplicate vectors are planted under shifted ids; kmeans must route
# each copy to its source's cluster, the in-cluster Gram kernel must
# pair them (cosine 1 > 0.95, while the corpus's max natural cosine is
# ~0.51), and the keep-policy must drop exactly one per pair — so the
# output counts are a constant the oracle pins. The keep-one side is
# id-deterministic (exact copies tie on centroid distance → lower id,
# i.e. every planted id is the removed one), asserted as a boolean.
# --------------------------------------------------------------------------
@query(
    "emb_semdedup",
    """
    SELECT CAST(525 AS BIGINT) AS n_input,
           CAST(500 AS BIGINT) AS n_kept,
           CAST(25 AS BIGINT) AS n_removed,
           TRUE AS removed_are_planted
    """,
)
def emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import semantic_dedup

    # deterministic id-range selection (an unordered limit(500) could
    # pick rows missing vec_id < 25 under a different file split, which
    # would break the constant oracle)
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").filter(
        F.col("vec_id") < 500
    )
    copies = e.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = e.unionByName(copies)
    kept, removed = semantic_dedup(corpus, k=8, threshold=0.95)
    kept.persist()
    removed.persist()
    return spark.range(1).select(
        F.lit(corpus.count()).cast("bigint").alias("n_input"),
        F.lit(kept.count()).cast("bigint").alias("n_kept"),
        F.lit(removed.count()).cast("bigint").alias("n_removed"),
        F.lit(
            removed.filter(F.col("vec_id") < 10000).count() == 0
        ).alias("removed_are_planted"),
    )


# --------------------------------------------------------------------------
# X4 — learned BPE tokenizer (rows-only): merges trained on the corpus
# itself (distributed word count → driver merge loop over the bounded
# frequency table, the standard trainer shape), then Arrow-batched
# encoding. Deterministic (lexicographic tie-breaks), pinned against the
# published Sennrich et al. example in tests/test_bpe.py; no SQL oracle
# — DuckDB cannot run the merge procedure.
# --------------------------------------------------------------------------
@query("doc_bpe_tokens")
def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe as B

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(500)
    merges = B.learn_bpe(docs, n_merges=80)
    return B.bpe_token_stats(docs, merges)


# --------------------------------------------------------------------------
# X1/X2 — duplicate-group resolution: connected components over the
# near-dup pair graph (min reachable id = group representative). The
# oracle recomputes components with a recursive CTE — a fully independent
# algorithm (transitive closure) against our label propagation.
# --------------------------------------------------------------------------
@query(
    "doc_dedup_components",
    """
    WITH RECURSIVE
    sets AS (
      SELECT lang, doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS ws
      FROM documents WHERE length(trim(text)) > 0
    ),
    pairs AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib
      FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
            / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.5
    ),
    edges AS (SELECT ia AS src, ib AS dst FROM pairs UNION SELECT ib, ia FROM pairs),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS node, CAST(least(src, min(dst)) AS BIGINT) AS component
    FROM reach GROUP BY src
    """,
)
def doc_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.blocked_jaccard_pairs(d, "lang", "doc_id", "text", 0.5)
    return dedup.connected_components(pairs)


# --------------------------------------------------------------------------
# X1+X4 composed — a curation pipeline in one plan: quality-score every
# doc, drop low quality, dedup by normalized fingerprint (keep min id),
# report per-language survivor stats. The whole pipeline is one Catalyst
# plan: scan → project → filter → window dedup → aggregate.
# --------------------------------------------------------------------------
@query(
    "doc_curation_pipeline",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
             least(length(text) / 500.0, 1.0) * 0.5
             + CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END) > 0
                     AND length(text) / CAST((CASE WHEN length(trim(text)) = 0 THEN 1
                          ELSE len(string_split_regex(trim(text), '\\s+')) END) AS DOUBLE) BETWEEN 3 AND 12
                    THEN 1.0 ELSE 0.5 END * 0.3
             + CASE WHEN coalesce(CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE)
                          / nullif(length(text), 0), 0.0) <= 0.1 THEN 1.0 ELSE 0.5 END * 0.2
             AS quality
      FROM documents
    ),
    kept AS (
      SELECT * FROM scored
      WHERE quality >= 0.6
      QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    )
    SELECT lang,
           count(*) AS n_kept,
           CAST(round(avg(quality), 6) AS DOUBLE) AS avg_quality
    FROM kept GROUP BY lang
    """,
)
def doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Scoring (fingerprint md5 + quality regex/split heuristics) is BY
    # FAR the query's cost — the dedup machinery is ~3% at sf1 — so the
    # r14 shape makes sure it runs exactly ONCE per row, in parallel:
    #
    # * fan_out first: the single-file fixture scans as 2 tasks, so the
    #   scoring projection ran 2-wide on a 32-core session (guide §2.5
    #   under-parallel input). At real scale the scan is already
    #   parallel and fan_out is a no-op.
    # * the quality filter moved ABOVE the window. The r12/r13 forms
    #   filtered `quality >= 0.6` before the dedup; Catalyst's
    #   cost-blind pushdown inlines the whole quality expression into
    #   the Filter and pushes it to the scan — the most expensive
    #   expression in the query evaluated TWICE per row (Filter below
    #   the exchange + Project above it; measured: scored-frame 7.15 s
    #   vs 4.01 s bare projection at sf1). With the filter expressed
    #   over the window rank — order qualifying rows first, keep rn=1
    #   AND quality>=0.6 — pushdown cannot cross the Window (quality is
    #   not a partition key), so quality evaluates once, post-exchange,
    #   32-wide. Row equivalence: for an fp with >=1 qualifying row,
    #   rn=1 under (quality<0.6 ASC, doc_id ASC) is exactly the min
    #   doc_id among qualifying rows (false sorts first); an fp with
    #   none yields a non-qualifying rn=1 row that the >=0.6 filter
    #   drops — the fp disappears, as before. Oracle re-verified at
    #   3 SFs; the ~9% non-qualifying rows now cross the fp exchange
    #   (narrow rows) in exchange for halving the scoring CPU.
    #
    # Keep-first stays the window rn=1 form (r14 revert): min(struct)
    # and scalar min_by both have immutable struct/string aggregation
    # buffers and fall to SortAggregate; the window form gets map-side
    # WindowGroupLimit on both sides of the exchange (plans/r14/).
    scored = fan_out(d).select(
        "doc_id",
        "lang",
        T.fingerprint("text").alias("fp"),
        T.quality_score("text").alias("quality"),
    )
    w = Window.partitionBy("fp").orderBy(F.col("quality") < 0.6, F.col("doc_id"))
    kept = scored.withColumn("rn", F.row_number().over(w)).filter(
        (F.col("rn") == 1) & (F.col("quality") >= 0.6)
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


# --------------------------------------------------------------------------
# X3 — IVF ANN (rows-only: centroid assignment is engine-specific).
# --------------------------------------------------------------------------
@query("emb_ivf_ann")
def emb_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.ivf_topk(e, q, k=5, n_centroids=8, n_probe=3)


# --------------------------------------------------------------------------
# X3 — ANN quality, oracle-checked (same derived-evidence pattern as
# doc_minhash_recall): the exact brute-force top-10 per query is
# recomputed by DuckDB (pair count + mean exact cosine hash-matched); the
# IVF path's mean recall against that truth rides along as a pinned
# boolean. Pin ≥0.8 (r10, raised from 0.35): multi-assignment
# (n_assign=2 — every vector indexed in its 2 nearest cells, the IVF
# "spill" refinement) + multi-probe (8 of 16 lists) measures 0.92-0.98
# on the fixtures, which are near-uniform synthetic vectors — the WORST
# case for IVF (real embedding corpora cluster, and recall rises).
# Single-assignment at the same probe fraction measures 0.74-0.76, so
# the pin catches both probe-selection and assignment regressions.
# Ranking uses 6-dp-rounded cosine so double last-ulp noise can't flip
# top-k membership between engines.
# --------------------------------------------------------------------------
@query(
    "emb_ann_recall",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS sim
      FROM embeddings e, q WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
      FROM scored
    )
    SELECT CAST(count(*) AS BIGINT) AS exact_pairs,
           CAST(round(avg(sim), 6) AS DOUBLE) AS avg_exact_sim,
           TRUE AS recall_ge_080
    FROM ranked WHERE rn <= 10
    """,
)
def emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sim = F.round(similarity.cosine(F.col("embedding"), F.col("query_vec")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    exact = (
        e.join(broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
    )
    ann = similarity.ivf_topk(
        e, q, k=10, n_centroids=16, n_probe=8, n_assign=2
    ).select("query_id", "vec_id", F.lit(1).alias("hit"))
    return (
        exact.join(ann, ["query_id", "vec_id"], "left")
        .agg(
            F.count("*").cast("bigint").alias("exact_pairs"),
            F.round(F.avg("sim"), 6).alias("avg_exact_sim"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count("*") >= 0.8
            ).alias("recall_ge_080"),
        )
    )


# --------------------------------------------------------------------------
# X7 — deterministic stratified sampling (hash-gated, not RNG: identical
# across engines, re-runs, and repartitioning; operators/sampling.py).
# Downsample dominant langs, keep more of the rare ones.
# --------------------------------------------------------------------------
@query(
    "doc_sample_stratified",
    """
    SELECT doc_id, lang, source FROM documents
    WHERE ((((doc_id % 2147483647) * 48271) % 2147483647) * 48271) % 2147483647 % 1000 <
          CASE WHEN lang = 'en' THEN 100
               WHEN lang = 'zh' THEN 200
               ELSE 400 END
    """,
)
def doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return sampling.stratified_sample(
        d, "doc_id", "lang", {"en": 0.1, "zh": 0.2}, default=0.4
    ).select("doc_id", "lang", "source")


# --------------------------------------------------------------------------
# X7 — token-budget shard packing: greedy prefix-sum cut every 500 tokens
# per language (windows run per-lang in parallel; no global sort).
# --------------------------------------------------------------------------
@query(
    "doc_shard_packing",
    """
    WITH toks AS (
      SELECT lang, doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok
      FROM documents
    ), packed AS (
      SELECT lang, n_tok,
             COALESCE(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      FROM toks
    )
    SELECT lang, CAST(floor(prefix / 500) AS BIGINT) AS shard_id,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS shard_tokens
    FROM packed GROUP BY lang, shard_id
    """,
)
def doc_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    packed = sampling.pack_shards(
        d, "doc_id", T.word_count("text"), budget=500, partition_col="lang"
    )
    return packed.groupBy("lang", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(T.word_count("text")).cast("bigint").alias("shard_tokens"),
    )


# --------------------------------------------------------------------------
# X7 — deterministic global training shuffle: position = rank of the
# Lehmer hash (range-partitioned sort at scale; operators/sampling.py).
# --------------------------------------------------------------------------
@query(
    "doc_train_shuffle",
    """
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY ((((doc_id % 2147483647) * 48271) % 2147483647) * 48271) % 2147483647,
                      doc_id
           ) AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def doc_train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return sampling.train_shuffle(d, "doc_id").select("doc_id", "shuffle_pos")


# --------------------------------------------------------------------------
# X8 — train/eval contamination: word-8-gram collision join between the
# corpus and a benchmark slice (source 'src0'), postings-style — the
# decontamination step of an LLM data pipeline (operators/contamination.py).
# --------------------------------------------------------------------------
@query(
    "doc_contamination",
    """
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct([array_to_string(ws[i:i+7], ' ')
                            for i in range(1, greatest(len(ws) - 7, 0) + 1)]) AS grams
      FROM (SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS ws
            FROM documents WHERE length(trim(text)) > 0)
    ), posts AS (
      SELECT doc_id, source, len(grams) AS n_sh, unnest(grams) AS g
      FROM sh WHERE len(grams) > 0
    )
    SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
           count(*) AS n_shared,
           CAST(round(CAST(count(*) AS DOUBLE) / any_value(t.n_sh), 6) AS DOUBLE)
             AS contamination
    FROM posts t JOIN posts b ON t.g = b.g
    WHERE t.source != 'src0' AND b.source = 'src0'
    GROUP BY train_id, bench_id HAVING count(*) >= 2
    """,
)
def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return contamination.contamination_pairs(
        d.filter(F.col("source") != "src0"),
        d.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=8,
        min_shared=2,
    )


# --------------------------------------------------------------------------
# X4 — corpus-level n-gram frequency (top-k bigrams). The training-data
# shape behind vocabulary building and boilerplate detection. Scale: the
# bigram explode is Σ tokens rows, but partial aggregation collapses each
# partition's counts before the single shuffle, and the final top-k lowers
# to TakeOrderedAndProject — no global sort of the vocabulary.
# --------------------------------------------------------------------------
@query(
    "doc_top_ngrams",
    """
    WITH w AS (
      SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(lower(trim(text)), '\\s+') END AS w
      FROM documents
    ),
    b AS (
      SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS ngram
      FROM w
    )
    SELECT ngram, CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY ngram
    ORDER BY n DESC, ngram LIMIT 20
    """,
)
def doc_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ws = T.words(F.lower(F.col("text")))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda i: F.concat(F.element_at(ws, i), F.lit(" "), F.element_at(ws, i + 1)),
    )
    return (
        d.select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(20)
    )


# --------------------------------------------------------------------------
# X4 — TF-IDF: top discriminative terms per language. Built on
# operators.text.tfidf_scores; the top-5-per-group is a bounded window over
# the (lang, term) aggregate, not a global vocabulary sort.
# --------------------------------------------------------------------------
@query(
    "doc_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT lang, doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents WHERE length(trim(text)) > 0
    ),
    tf AS (SELECT lang, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents WHERE length(trim(text)) > 0),
    scored AS (
      SELECT lang, term,
             CAST(round(tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS DOUBLE) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT lang, term, tfidf,
             row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT lang, term, tfidf FROM ranked WHERE rk <= 5
    """,
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    scored = T.tfidf_scores(d, "lang", "doc_id", "text").withColumnRenamed("group", "lang")
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "term", "tfidf")
    )


# --------------------------------------------------------------------------
# X4 — Gopher-style repetition quality filters (token/2-gram based; the
# corpus is single-line so line-level variants are degenerate). Per-lang
# aggregate of operators.text.repetition_stats.
# --------------------------------------------------------------------------
@query(
    "doc_repetition_stats",
    """
    WITH d AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    tc AS (
      SELECT doc_id, lang, t, count(*) AS cnt
      FROM (SELECT doc_id, lang, unnest(w) AS t FROM d) GROUP BY 1, 2, 3
    ),
    tm AS (
      SELECT doc_id, lang, 1.0 - count(*) * 1.0 / sum(cnt) AS dup_token_frac
      FROM tc GROUP BY 1, 2
    ),
    bc AS (
      SELECT doc_id, lang, g, count(*) AS cnt
      FROM (SELECT doc_id, lang,
                   unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS g
            FROM d) GROUP BY 1, 2, 3
    ),
    bm AS (
      SELECT doc_id, lang,
             sum(CASE WHEN cnt > 1 THEN length(g) * cnt ELSE 0 END) * 1.0
               / sum(length(g) * cnt) AS dup2c,
             max(cnt) * 1.0 / sum(cnt) AS top2
      FROM bc GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(round(avg(tm.dup_token_frac), 6) AS DOUBLE) AS avg_dup_token_frac,
           CAST(round(avg(COALESCE(bm.dup2c, 0)), 6) AS DOUBLE) AS avg_dup_2gram_char_frac,
           CAST(round(avg(COALESCE(bm.top2, 0)), 6) AS DOUBLE) AS avg_top_2gram_frac,
           CAST(count(*) FILTER (COALESCE(bm.dup2c, 0) > 0.1) AS BIGINT) AS flagged_docs
    FROM tm LEFT JOIN bm USING (doc_id, lang)
    GROUP BY 1
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = T.repetition_stats(d, "doc_id", "lang", "text")
    return m.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.round(F.avg("dup_token_frac"), 6).alias("avg_dup_token_frac"),
        F.round(F.avg("dup_2gram_char_frac"), 6).alias("avg_dup_2gram_char_frac"),
        F.round(F.avg("top_2gram_frac"), 6).alias("avg_top_2gram_frac"),
        F.sum(F.when(F.col("dup_2gram_char_frac") > 0.1, 1).otherwise(0))
        .cast("bigint")
        .alias("flagged_docs"),
    )


# --------------------------------------------------------------------------
# X7 — domain-mixture rebalancing: deterministically downsample languages
# to a prescribed mixture (no upsampling). Oracle mirrors the in-plan
# n_out = min(count/share) and floor(·1000) Lehmer-bucket threshold.
# --------------------------------------------------------------------------
_MIX_SHARES = {"en": 0.30, "zh": 0.20, "es": 0.20, "de": 0.15, "fr": 0.15}

@query(
    "doc_mixture_rebalance",
    """
    WITH c AS (
      SELECT lang, count(*) AS n,
             CASE lang WHEN 'en' THEN 0.30 WHEN 'zh' THEN 0.20
                       WHEN 'es' THEN 0.20 WHEN 'de' THEN 0.15
                       WHEN 'fr' THEN 0.15 END AS share
      FROM documents WHERE lang IN ('en', 'zh', 'es', 'de', 'fr')
      GROUP BY 1
    ),
    m AS (SELECT min(n / share) AS n_out FROM c),
    k AS (
      SELECT lang, CAST(floor(LEAST(1.0, share * (SELECT n_out FROM m) / n) * 1000) AS BIGINT) AS thresh
      FROM c
    ),
    kept AS (
      SELECT d.lang, count(*) AS kept
      FROM documents d JOIN k USING (lang)
      WHERE ((((doc_id % 2147483647) * 48271) % 2147483647) * 48271) % 2147483647 % 1000 < k.thresh
      GROUP BY 1
    )
    SELECT lang, CAST(kept AS BIGINT) AS kept,
           CAST(round(kept * 1.0 / sum(kept) OVER (), 6) AS DOUBLE) AS achieved_share
    FROM kept
    """,
)
def doc_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    kept = sampling.mixture_rebalance(d, "doc_id", "lang", _MIX_SHARES)
    counts = kept.groupBy("lang").agg(F.count("*").alias("kept"))
    return counts.select(
        "lang",
        F.col("kept").cast("bigint").alias("kept"),
        F.round(
            F.col("kept") / F.sum("kept").over(Window.partitionBy()), 6
        ).alias("achieved_share"),
    )


# --------------------------------------------------------------------------
# X3 — int8 symmetric quantization of the embedding column: per-label
# average scale + RMS reconstruction error. floor(x+0.5) on both sides
# avoids round-half engine differences; all math in DOUBLE.
# --------------------------------------------------------------------------
@query(
    "emb_quantize_error",
    """
    WITH s AS (
      SELECT label,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
             embedding
      FROM embeddings
    ),
    e AS (
      SELECT label, scale,
             CASE WHEN scale > 0 THEN
               list_sum(list_transform(embedding,
                 x -> pow(CAST(x AS DOUBLE)
                          - floor(CAST(x AS DOUBLE) / scale * 127 + 0.5) * scale / 127, 2)))
                 / len(embedding)
             ELSE 0.0 END AS mse
      FROM s
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS vectors,
           CAST(round(avg(scale), 6) AS DOUBLE) AS avg_scale,
           CAST(round(sqrt(avg(mse)), 6) AS DOUBLE) AS rms_err
    FROM e GROUP BY 1
    """,
)
def emb_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(vec, F.abs))
    withs = e.select("label", vec.alias("v"), scale.alias("scale"))
    recon_sq = F.aggregate(
        F.col("v"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.pow(
            x - F.floor(x / F.col("scale") * 127 + 0.5) * F.col("scale") / 127, 2
        ),
    )
    mse = F.when(F.col("scale") > 0, recon_sq / F.size("v")).otherwise(F.lit(0.0))
    return (
        withs.withColumn("mse", mse)
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("vectors"),
            F.round(F.avg("scale"), 6).alias("avg_scale"),
            F.round(F.sqrt(F.avg("mse")), 6).alias("rms_err"),
        )
    )


# --------------------------------------------------------------------------
# X4 — PII scan: per-lang match counts for the conservative public email/
# IPv4/phone patterns + total redaction char delta. The synthetic corpus
# contains no PII (all-zero result is the correct answer, asserted by the
# oracle); operator semantics on PII-bearing text are pinned by pytest
# (tests/test_operators.py) instead.
# --------------------------------------------------------------------------
@query(
    "doc_pii_scan",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS BIGINT) AS emails,
           CAST(sum(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))) AS BIGINT) AS ipv4s,
           CAST(sum(len(regexp_extract_all(text, '\\+\\d[\\d().-]{7,}\\d'))) AS BIGINT) AS phones,
           CAST(sum(length(text) - length(
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IPV4]', 'g'),
               '\\+\\d[\\d().-]{7,}\\d', '[PHONE]', 'g'))) AS BIGINT) AS redaction_delta
    FROM documents GROUP BY 1
    """,
)
def doc_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pii = T.pii_counts("text")
    return (
        d.select(
            "lang",
            pii.alias("p"),
            (F.length("text") - F.length(T.redact_pii("text"))).alias("delta"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("docs"),
            F.sum("p.email").cast("bigint").alias("emails"),
            F.sum("p.ipv4").cast("bigint").alias("ipv4s"),
            F.sum("p.phone").cast("bigint").alias("phones"),
            F.sum("delta").cast("bigint").alias("redaction_delta"),
        )
    )


# --------------------------------------------------------------------------
# X4 — CCNet-style unigram-LM surprisal scoring: per-lang distribution of
# per-doc mean −ln P(token) under the corpus's own unigram model.
# --------------------------------------------------------------------------
@query(
    "doc_lm_surprisal",
    """
    WITH d AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    tok AS (SELECT doc_id, lang, unnest(w) AS term FROM d),
    lm AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT count(*) AS total FROM tok),
    ds AS (
      SELECT doc_id, lang, avg(-ln(cnt * 1.0 / total)) AS s
      FROM tok JOIN lm USING (term) CROSS JOIN tot
      GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(round(avg(s), 6) AS DOUBLE) AS avg_surprisal,
           CAST(round(min(s), 6) AS DOUBLE) AS min_surprisal,
           CAST(round(max(s), 6) AS DOUBLE) AS max_surprisal
    FROM ds GROUP BY 1
    """,
)
def doc_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scores = T.unigram_surprisal(d, "doc_id", "lang", "text")
    return scores.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("docs"),
        F.round(F.avg("mean_surprisal"), 6).alias("avg_surprisal"),
        F.round(F.min("mean_surprisal"), 6).alias("min_surprisal"),
        F.round(F.max("mean_surprisal"), 6).alias("max_surprisal"),
    )


# --------------------------------------------------------------------------
# X4 — fixed-token-budget chunking with overlap (tokenizer-stride
# convention) — the sequence-packing precursor. Aggregated per source.
# --------------------------------------------------------------------------
_CHUNK_TOKENS, _CHUNK_OVERLAP = 64, 16


@query(
    "doc_chunks",
    """
    WITH d AS (
      SELECT doc_id, source,
             string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    c AS (
      SELECT doc_id, source,
             len(list_slice(w, s, least(s + 63, len(w)))) AS ct
      FROM d, unnest(generate_series(1, greatest(1, len(w) - 16), 48)) AS u(s)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(round(avg(ct), 6) AS DOUBLE) AS avg_chunk_tokens,
           CAST(sum(ct) AS BIGINT) AS total_chunk_tokens,
           CAST(sum(CASE WHEN ct = 64 THEN 1 ELSE 0 END) AS BIGINT) AS full_chunks
    FROM c GROUP BY 1
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    chunks = T.chunk_documents(
        d,
        "doc_id",
        "text",
        chunk_tokens=_CHUNK_TOKENS,
        overlap=_CHUNK_OVERLAP,
        carry_cols=("source",),
    )
    return chunks.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.round(F.avg("chunk_n_tokens"), 6).alias("avg_chunk_tokens"),
        F.sum("chunk_n_tokens").cast("bigint").alias("total_chunk_tokens"),
        F.sum((F.col("chunk_n_tokens") == _CHUNK_TOKENS).cast("int"))
        .cast("bigint")
        .alias("full_chunks"),
    )


# --------------------------------------------------------------------------
# Data-quality profiling: per-column null/distinct/range stats in one
# aggregation pass (operators/profile.py). Oracle profiles the
# string/bigint columns (stringified min/max is engine-stable there);
# timestamp/double stringification is pinned by pytest instead.
# --------------------------------------------------------------------------
_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


@query(
    "orders_profile",
    """
    SELECT 'o_orderkey' AS "column", 'bigint' AS dtype,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           min(o_orderkey)::VARCHAR AS min_value, max(o_orderkey)::VARCHAR AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', 'bigint', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           min(o_custkey)::VARCHAR, max(o_custkey)::VARCHAR
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', 'string', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', 'string', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_table

    o = load_table(spark, sf_dir, "orders")
    return profile_table(o, columns=_PROFILE_COLS, exact=True)


# --------------------------------------------------------------------------
# X3 — full k-means (Lloyd to convergence) over the embedding corpus:
# per-cluster sizes + inertia. Iterative algorithm → rows-only driver
# check; semantics pinned by tests/test_operators.py on separable data.
# --------------------------------------------------------------------------
@query("emb_kmeans")
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans

    e = load_table(spark, sf_dir, "embeddings")
    assigned, _, _ = kmeans(e, k=8, max_iter=10)
    return assigned.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.round(F.sum("sq_dist"), 4).alias("inertia"),
    )


# --------------------------------------------------------------------------
# X3 — distributed PCA over the embedding corpus: explained-variance
# ratios of the top components (eigendecomposition of a one-pass
# sufficient-statistics covariance). Rows-only driver check (eigenvectors
# aren't SQL-expressible); semantics pinned by tests/test_operators.py.
# --------------------------------------------------------------------------
@query("emb_pca")
def emb_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import pca_fit

    e = load_table(spark, sf_dir, "embeddings")
    _, ratios, _ = pca_fit(e, "embedding", k=4)
    return spark.createDataFrame(
        [(i, float(round(r, 4))) for i, r in enumerate(ratios)],
        "component int, explained_variance_ratio double",
    )


# --------------------------------------------------------------------------
# X4 — bigram-LM surprisal: token-ORDER-sensitive quality scoring
# (shuffled text scores high even with a normal unigram profile).
# --------------------------------------------------------------------------
@query(
    "doc_bigram_surprisal",
    """
    WITH d AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ),
    b AS (
      SELECT doc_id, lang,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])) AS g
      FROM d WHERE len(w) >= 2
    ),
    lm AS (SELECT g, count(*) AS cnt FROM b GROUP BY 1),
    ctx AS (SELECT split_part(g, ' ', 1) AS prev, count(*) AS ctx_cnt
            FROM b GROUP BY 1),
    ds AS (
      SELECT doc_id, lang, avg(-ln(cnt * 1.0 / ctx_cnt)) AS s
      FROM b JOIN lm USING (g)
             JOIN ctx ON split_part(b.g, ' ', 1) = ctx.prev
      GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(round(avg(s), 6) AS DOUBLE) AS avg_surprisal,
           CAST(round(max(s), 6) AS DOUBLE) AS max_surprisal
    FROM ds GROUP BY 1
    """,
)
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scores = T.bigram_surprisal(d, "doc_id", "lang", "text")
    return scores.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("docs"),
        F.round(F.avg("mean_surprisal"), 6).alias("avg_surprisal"),
        F.round(F.max("mean_surprisal"), 6).alias("max_surprisal"),
    )


# --------------------------------------------------------------------------
# X2 — SimHash quality, oracle-checked (the precision twin of
# doc_minhash_recall): recall vs a set-similarity truth is the wrong
# axis for an order/frequency-sensitive sketch (measured ~0.01 — see
# COVERAGE), but PRECISION is pinnable: every same-language pair SimHash
# flags at hamming ≤ 8 is verified against exact word-set Jaccard, and
# ≥ 95% must clear J ≥ 0.3 (measured 1.0 at sf0.001 and sf0.01). The
# DuckDB-verifiable content is the eligible-doc count; the floor rides
# as the pinned boolean. Lang decoration is a shuffle join on id — never
# a corpus broadcast.
# --------------------------------------------------------------------------
@query(
    "doc_simhash_precision",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs, TRUE AS precision_ge_095
    FROM documents WHERE length(trim(text)) > 0
    """,
)
def doc_simhash_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_neardup_pairs(d, "doc_id", "text", max_hamming=8).select(
        "id_a", "id_b"
    )
    sets = d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.transform(T.words("text"), lambda w: F.xxhash64(w))
        ).alias("ws"),
    )
    a = sets.select(
        F.col("doc_id").alias("id_a"), F.col("lang").alias("la"), F.col("ws").alias("wsa")
    )
    b = sets.select(
        F.col("doc_id").alias("id_b"), F.col("lang").alias("lb"), F.col("ws").alias("wsb")
    )
    checked = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("la") == F.col("lb"))
        .select(dedup.jaccard(F.col("wsa"), F.col("wsb")).alias("j"))
    )
    prec = checked.agg(
        F.coalesce(
            F.sum(F.when(F.col("j") >= 0.3, 1).otherwise(0)) / F.count("*") >= 0.95,
            F.lit(True),  # vacuously true on an empty pair set
        ).alias("precision_ge_095")
    )
    n_docs = sets.agg(F.count("*").cast("bigint").alias("n_docs"))
    return n_docs.crossJoin(prec)


# --------------------------------------------------------------------------
# X1/X4 corpus-level cleanups (r4 session 3, operators/corpus.py).
# doc_dup_ngram_coverage — per-doc fraction of token positions covered
# by an 8-gram shared with >=2 distinct docs (the span-level dedup
# statistic MinHash doc-level dedup can't see). Internally the gram key
# is xxhash64 (fixed-width shuffle key); the oracle re-derives the same
# coverage from the literal gram strings, so a hash collision would
# show up as a mismatch.
# --------------------------------------------------------------------------
@query(
    "doc_dup_ngram_coverage",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    base AS (SELECT doc_id, t, len(t) AS n_tokens FROM toks),
    starts AS (SELECT doc_id, t, unnest(range(1, n_tokens - 6)) AS i
               FROM base WHERE n_tokens >= 8),
    grams AS (SELECT doc_id, i AS start,
                     array_to_string(t[i:i+7], chr(31)) AS gram
              FROM starts),
    dup AS (SELECT gram FROM grams GROUP BY gram
            HAVING count(DISTINCT doc_id) >= 2),
    occ AS (SELECT g.doc_id, g.start, unnest(range(0, 8)) AS o
            FROM grams g JOIN dup USING (gram)),
    cov AS (SELECT doc_id, count(DISTINCT start + o) AS covered
            FROM occ GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered,
           CAST(round(coalesce(cov.covered, 0) * 1.0 / b.n_tokens, 6) AS DOUBLE)
             AS coverage
    FROM base b LEFT JOIN cov USING (doc_id)
    """,
)
def doc_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import corpus

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return corpus.dup_ngram_coverage(d, n=8, min_docs=2)


# --------------------------------------------------------------------------
# X4 boilerplate-line removal (RefinedWeb-style): the fixture docs are
# single-line, so BOTH sides first re-segment deterministically into
# 10-token lines, then lines appearing in >=2 distinct docs are removed
# by the real operator; the oracle recomputes the removal arithmetic in
# SQL. Rebuilt-text ordering semantics are pinned by tests/test_corpus.py.
# --------------------------------------------------------------------------
@query(
    "doc_boilerplate_lines",
    """
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
    nl AS (SELECT doc_id, lang, t, CAST(ceil(len(t) / 10.0) AS BIGINT) AS nlines
           FROM toks),
    ls AS (SELECT doc_id, lang, nlines, unnest(range(1, nlines + 1)) AS i, t
           FROM nl),
    lx AS (SELECT doc_id, lang, nlines,
                  trim(array_to_string(t[(i-1)*10+1:(i-1)*10+10], ' ')) AS key
           FROM ls),
    bp AS (SELECT key FROM lx WHERE length(key) >= 1
           GROUP BY key HAVING count(DISTINCT doc_id) >= 2),
    per_doc AS (
      SELECT l.doc_id, any_value(l.lang) AS lang, any_value(l.nlines) AS n_lines,
             sum(CASE WHEN length(l.key) >= 1 AND bp.key IS NOT NULL
                      THEN 1 ELSE 0 END) AS n_removed
      FROM lx l LEFT JOIN bp ON l.key = bp.key
      GROUP BY l.doc_id)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_affected,
           CAST(sum(n_lines) AS BIGINT) AS total_lines,
           CAST(sum(n_removed) AS BIGINT) AS lines_removed
    FROM per_doc GROUP BY lang
    """,
)
def doc_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import corpus

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    t = F.split(F.col("text"), " ", -1)
    nl = F.ceil(F.size(t) / F.lit(10)).cast("int")
    reseg = d.select(
        "doc_id",
        "lang",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), nl - 1),
                lambda i: F.concat_ws(" ", F.slice(t, i * 10 + 1, 10)),
            ),
            "\n",
        ).alias("text"),
    )
    cleaned = corpus.remove_boilerplate_lines(reseg, min_docs=2)
    return cleaned.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_affected"),
        F.sum("n_lines").cast("bigint").alias("total_lines"),
        F.sum("n_removed").cast("bigint").alias("lines_removed"),
    )


# --------------------------------------------------------------------------
# §2.7-W time-series regularization (r4 session 3, operators/timeseries.py):
# hourly resample per event type with forward-filled gaps. Buckets as
# epoch seconds (timezone-free on both engines); the fill carries the
# rounded hourly average so partial-agg ordering can't flip the hash.
# --------------------------------------------------------------------------
@query(
    "events_resample_1h",
    """
    WITH e AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS b,
             value
      FROM events
    ),
    obs AS (SELECT event_type, b, count(*) AS n,
                   round(avg(value), 6) AS av
            FROM e GROUP BY event_type, b),
    bounds AS (SELECT event_type, min(b) AS lo, max(b) AS hi
               FROM obs GROUP BY event_type),
    grid AS (SELECT event_type, unnest(range(lo, hi + 1, 3600)) AS b
             FROM bounds),
    j AS (SELECT g.event_type, g.b, obs.n, obs.av
          FROM grid g LEFT JOIN obs ON g.event_type = obs.event_type
                                   AND g.b = obs.b)
    SELECT event_type,
           CAST(b AS BIGINT) AS bucket_s,
           CAST(coalesce(n, 0) AS BIGINT) AS n_events,
           CAST(last_value(av IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS DOUBLE) AS avg_value_filled,
           CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
    FROM j
    """,
)
def events_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import resample_ffill

    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    r = resample_ffill(
        e,
        ts_col="ts",
        key_cols=["event_type"],
        step_seconds=3600,
        aggs={"n_events": "count(*)", "av": "round(avg(value), 6)"},
        fill_cols=["av"],
    )
    return r.select(
        "event_type",
        "bucket_s",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.col("av_filled").cast("double").alias("avg_value_filled"),
        "is_gap",
    )


# --------------------------------------------------------------------------
# X4 quality classifier (r4 session 3, operators/classifier.py): train
# the hashing-trick logistic regression on a weak label (lang == 'en')
# and report per-label score mass. Rows-only by design — iterative
# gradient descent is not SQL-expressible; convergence/ranking semantics
# are pinned by tests/test_classifier.py.
# --------------------------------------------------------------------------
@query("doc_quality_classifier")
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import score_hashed_logreg, train_hashed_logreg

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("lang") == "en").cast("int").alias("label")
    )
    model = train_hashed_logreg(d, "text", "label", dim=1 << 14, iters=5, lr=2.0)
    scored = score_hashed_logreg(d, model, "text")
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("quality_prob"), 4).alias("avg_prob"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# X1 substring-level dedup (removal half): canonical owner (lowest
# doc_id) keeps each duplicated 8-gram, other docs lose the covered
# positions — except positions protected by a gram the doc itself owns
# (overlap rule). The oracle recomputes removal AND pins the rebuilt text by
# md5, so token order and separator handling are hash-checked, not just
# counts. Tail by choice (head at capacity); local harness checks it.
# --------------------------------------------------------------------------
@query(
    "doc_dedup_spans",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    base AS (SELECT doc_id, t, len(t) AS n_tokens FROM toks),
    starts AS (SELECT doc_id, t, unnest(range(1, n_tokens - 6)) AS i
               FROM base WHERE n_tokens >= 8),
    grams AS (SELECT doc_id, i AS start,
                     array_to_string(t[i:i+7], chr(31)) AS gram
              FROM starts),
    owners AS (SELECT gram, min(doc_id) AS owner
               FROM grams GROUP BY gram
               HAVING count(DISTINCT doc_id) >= 2),
    foreign_pos AS (SELECT DISTINCT g.doc_id, g.start + o.o AS p
                    FROM grams g JOIN owners USING (gram),
                         (SELECT unnest(range(0, 8)) AS o) o
                    WHERE g.doc_id <> owners.owner),
    owned_pos AS (SELECT DISTINCT g.doc_id, g.start + o.o AS p
                  FROM grams g JOIN owners USING (gram),
                       (SELECT unnest(range(0, 8)) AS o) o
                  WHERE g.doc_id = owners.owner),
    dropped AS (SELECT doc_id, p FROM foreign_pos
                EXCEPT SELECT doc_id, p FROM owned_pos),
    toklong AS (SELECT doc_id, unnest(t) AS tok,
                       generate_subscripts(t, 1) AS p
                FROM base),
    kept AS (SELECT tl.doc_id, tl.tok, tl.p
             FROM toklong tl LEFT JOIN dropped d
               ON tl.doc_id = d.doc_id AND tl.p = d.p
             WHERE d.doc_id IS NULL),
    rebuilt AS (SELECT doc_id,
                       count(*) AS nkept,
                       md5(string_agg(tok, ' ' ORDER BY p)) AS clean_md5
                FROM kept GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_tokens - coalesce(r.nkept, 0) AS BIGINT) AS n_removed,
           coalesce(r.clean_md5, md5('')) AS clean_md5
    FROM base b LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def doc_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import remove_duplicated_spans

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_duplicated_spans(d, n=8, min_docs=2)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5("text").alias("clean_md5"),
    )


# --------------------------------------------------------------------------
# X4 end-to-end tokenize→pack pipeline (r4 session 3): learn a BPE
# vocabulary from the corpus, count per-doc BPE tokens, pack docs into
# ~2048-token training shards per language, and report the shard
# manifest. Rows-only by design (BPE learning is iterative); the
# tokenizer's merge order and the packer's prefix-sum cut rule are
# pinned by tests/test_bpe.py and tests/test_sampling.py.
# --------------------------------------------------------------------------
@query("doc_tokenize_pack")
def doc_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_token_stats, learn_bpe
    from ..operators.sampling import pack_shards

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    merges = learn_bpe(d, n_merges=100)
    stats = bpe_token_stats(d, merges).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    packed = pack_shards(
        stats, "doc_id", F.col("n_tokens"), budget=2048, partition_col="lang"
    )
    return (
        packed.groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        )
        .orderBy("lang", "shard_id")
    )


# --------------------------------------------------------------------------
# §2.5/§2.7-W interval coalescing (r4 session 3, operators/relational.py
# ::interval_union): 5-minute activity intervals per user merged into
# islands (gaps-and-islands with running-max semantics — a contained
# interval must not split an island). Epochs in microseconds on both
# engines; tail by choice with the head at capacity.
# --------------------------------------------------------------------------
@query(
    "events_interval_union",
    """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
      FROM events
    ),
    f AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                  THEN 1 ELSE 0 END AS ni
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    g AS (
      SELECT user_id, s, e,
             sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS island
      FROM f
    ),
    isl AS (SELECT user_id, island, min(s) AS st, max(e) AS en,
                   count(*) AS n
            FROM g GROUP BY user_id, island)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(en - st) AS BIGINT) AS covered_us,
           CAST(max(en - st) AS BIGINT) AS longest_us,
           CAST(max(n) AS BIGINT) AS busiest_island_events
    FROM isl GROUP BY user_id
    """,
)
def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import interval_union

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
    ).withColumn("e", F.col("s") + 300_000_000)
    islands = interval_union(e, ["user_id"], "s", "e")
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start"))
        .cast("bigint")
        .alias("covered_us"),
        F.max(F.col("island_end") - F.col("island_start"))
        .cast("bigint")
        .alias("longest_us"),
        F.max("n_intervals").cast("bigint").alias("busiest_island_events"),
    )
