"""Embedding similarity search over the ``embeddings`` table.

  * brute-force cosine top-k — the correctness baseline: broadcast the query
    vector, JVM-side ``zip_with``/``aggregate`` dot products (no Python);
  * LSH (random-hyperplane) bucketing — the scale path: 16-bit signatures
    from deterministic pseudo-hyperplanes, candidates = same-bucket rows
    (probing neighbor buckets by Hamming-1 for recall).

At 10^10-row scale the brute-force path is a single map-side pass + top-k
(``TakeOrderedAndProject``), which is shuffle-free except for the final k
rows per partition; the LSH path turns repeated queries into a bucket-pruned
lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import load

__all__ = ["QUERIES", "ORACLES", "cosine_topk", "lsh_signature"]

QUERIES = {}
ORACLES = {}

N_PLANES = 16


def _register(name, sql=None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    dot = _dot(F.col("embedding"), q)
    norm_a = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    norm_q = float(sum(v * v for v in query_vec)) ** 0.5
    cos = dot / (norm_a * F.lit(norm_q))
    return (
        emb.select(id_col, F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_signature(df: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Add ``lsh_bucket``: sign bits against deterministic pseudo-random
    hyperplanes (plane p, dim d weight = ±1 from xxhash64(p, d)) — fully
    JVM-side, reproducible across runs/executors."""
    return df.withColumn(
        "lsh_bucket",
        F.expr(
            f"aggregate(sequence(0, {n_planes - 1}), cast(0 as bigint), (acc, p) ->"
            " acc + if(aggregate(sequence(0, size(embedding) - 1), cast(0.0 as double),"
            "   (s, d) -> s + cast(embedding[d] as double)"
            "     * if(((xxhash64(p, d) >> 7) & 1) = 1, 1.0, -1.0)) > 0,"
            "   shiftleft(cast(1 as bigint), p), cast(0 as bigint)))"
        ),
    )


@_register("emb_cosine_topk")
def emb_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 nearest neighbors (cosine) of vec_id=0, excluding itself.
    Rows-only oracle: cross-engine float summation order differs, so value
    parity is locked by tests/test_dedup_similarity.py against numpy."""
    emb = load(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    query = [float(x) for x in qrow["embedding"]]
    return cosine_topk(emb.filter(F.col("vec_id") != 0), query, k=10)


@_register("emb_lsh_bucket_sizes")
def emb_lsh_bucket_sizes(spark: SparkSession, sf: str) -> DataFrame:
    """LSH bucket histogram — the pruning structure for ANN at scale."""
    emb = lsh_signature(load(spark, sf, "embeddings"))
    return (
        emb.groupBy("lsh_bucket")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy(F.col("n_vectors").desc(), F.col("lsh_bucket").asc())
    )


@_register(
    "emb_norm_stats",
    """
    SELECT label, COUNT(*) AS n,
           ROUND(AVG(dim), 1) AS avg_dim
    FROM (SELECT label, len(embedding) AS dim FROM embeddings)
    GROUP BY label
    """,
)
def emb_norm_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-table profile: per-label counts and dimension check."""
    emb = load(spark, sf, "embeddings")
    return (
        emb.select("label", F.size("embedding").alias("dim"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("dim"), 1).alias("avg_dim"))
    )


@_register(
    "emb_cosine_topk_r3",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding, q.qe), 3) AS cos_sim_r3
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim_r3 DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def emb_cosine_topk_r3(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 with 3-dp rounding — value-checkable across
    engines (float32 inputs make 3 dp stable; ties break on vec_id)."""
    emb = load(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    query = [float(x) for x in qrow["embedding"]]
    q = F.array(*[F.lit(float(v)) for v in query])
    dot = _dot(F.col("embedding"), q)
    norm_a = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    norm_q = float(sum(v * v for v in query)) ** 0.5
    cos = dot / (norm_a * F.lit(norm_q))
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos, 3).alias("cos_sim_r3"))
        .orderBy(F.col("cos_sim_r3").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@_register(
    "emb_neardup_pairs",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.embedding, b.embedding), 3) AS cos_r3
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding, b.embedding), 3) >= 0.4
    """,
)
def emb_neardup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs at test scale;
    the LSH bucket path below is the 10^10-row pruning strategy).  The
    self-join condition ``vec_id < vec_id`` halves the pair space; AQE
    handles the join strategy."""
    emb = load(spark, sf, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    dot = _dot(F.col("ea"), F.col("eb"))
    na = F.sqrt(_dot(F.col("ea"), F.col("ea")))
    nb = F.sqrt(_dot(F.col("eb"), F.col("eb")))
    cos = F.round(dot / (na * nb), 3)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_r3"))
        .filter(F.col("cos_r3") >= 0.4)
    )


@_register("emb_lsh_ann_topk")
def emb_lsh_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """ANN top-10 for vec_id=0 via LSH pruning: candidates share the query's
    bucket or any Hamming-1 neighbor bucket, then exact cosine rerank.
    Rows-only check (bucket pruning is approximate by design); recall vs the
    brute-force baseline is asserted in tests/test_dedup_similarity.py."""
    emb = lsh_signature(load(spark, sf, "embeddings"))
    emb = emb.localCheckpoint(eager=True)  # signature computed once
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding", "lsh_bucket").head()
    query = [float(x) for x in qrow["embedding"]]
    qb = int(qrow["lsh_bucket"])
    buckets = [qb] + [qb ^ (1 << p) for p in range(N_PLANES)]
    cand = emb.filter(F.col("lsh_bucket").isin(buckets) & (F.col("vec_id") != 0))
    if cand.count() < 10:
        # probe expansion fallback: at low density (or tiny test SFs) the
        # 1-probe bucket set can be empty — degrade to brute force rather
        # than return a short/empty result (standard ANN practice)
        cand = emb.filter(F.col("vec_id") != 0)
    return cosine_topk(cand, query, k=10)
