"""Document deduplication for training-data pipelines.

Scale-first design notes:
  * shingling, per-seed min-hashing, and SimHash bit aggregation all run as
    JVM-side higher-order functions (``transform``/``aggregate`` over token
    arrays) — no Python UDFs, no shuffle until the band/bucket join;
  * LSH banding turns the O(N²) pair problem into a groupBy on
    (band_id, band_hash) — the only shuffle, keyed to spread uniformly;
  * exact Jaccard verification happens only on banded candidate pairs.

Registered queries (rows-only oracle: the driver records count+schema — the
pair-level semantics are locked by tests/test_dedup_similarity.py instead):
  * docs_minhash_pairs — MinHash-LSH near-dup candidate pairs w/ exact Jaccard
  * docs_simhash       — 64-bit SimHash per document
  * docs_ngram_jaccard_topk — exact token-3-gram Jaccard top pairs (SQL oracle)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import load

__all__ = ["QUERIES", "ORACLES", "minhash_signatures", "simhash", "shingle_tokens"]

QUERIES = {}
ORACLES = {}

NUM_PERM = 32
BANDS = 8
ROWS_PER_BAND = NUM_PERM // BANDS


def shingle_tokens(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Add ``shingles``: distinct word n-grams of the lowercased text (all
    JVM-side: split → transform(sequence) → array_distinct)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return df.withColumn("_toks", toks).withColumn(
        "shingles",
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, greatest(size(_toks) - {n}, 0)),"
                f" i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
            )
        ),
    ).drop("_toks")


def minhash_signatures(df: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """Add ``sig``: array<long> of per-seed minimum shingle hashes.  One pass,
    no explode: for each seed k, min over xxhash64(shingle, k)."""
    return df.withColumn(
        "sig",
        F.expr(
            f"transform(sequence(0, {num_perm - 1}),"
            " k -> array_min(transform(shingles, s -> xxhash64(s, k))))"
        ),
    )


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``simhash``: 64-bit signature; bit b is the sign of the sum of
    ±1 votes from each token's hash bit b."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    return df.withColumn("_toks", toks).withColumn(
        "simhash",
        F.expr(
            "aggregate(sequence(0, 63), cast(0 as bigint), (acc, b) -> acc + "
            " if(aggregate(_toks, 0, (s, t) ->"
            "      s + if(((xxhash64(t) >> b) & 1) = 1, 1, -1)) > 0,"
            "    shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"
        ),
    ).drop("_toks")


def _register(name, sql=None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


@_register("docs_minhash_pairs")
def docs_minhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → minhash → band →
    bucket-join → exact-Jaccard verify.  Returns (doc_a, doc_b,
    jaccard_pct) for banded pairs with Jaccard ≥ 0.2, plus self-free."""
    d = minhash_signatures(shingle_tokens(load(spark, sf, "documents")))
    d = d.select("doc_id", "shingles", "sig").localCheckpoint(eager=True)

    bands = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {BANDS - 1}),"
                f" b -> xxhash64(concat_ws(',', slice(sig, b * {ROWS_PER_BAND} + 1,"
                f" {ROWS_PER_BAND})), b))"
            )
        ).alias("band_id", "band_hash"),
    )
    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.collect_set("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard_pct",
            F.round(
                F.lit(100.0)
                * F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                1,
            ),
        )
        .filter(F.col("jaccard_pct") >= 20.0)
        .select("doc_a", "doc_b", "jaccard_pct")
    )
    return verified


@_register("docs_simhash")
def docs_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document 64-bit SimHash (near-dup fingerprint; bucketable by
    16-bit chunks for Hamming-distance banding at scale)."""
    return simhash(load(spark, sf, "documents")).select("doc_id", "simhash")


@_register(
    "docs_ngram_jaccard_topk",
    """
    WITH sh AS (
      SELECT doc_id, DISTINCT_SHINGLE AS shingle FROM (
        SELECT doc_id,
               unnest(list_distinct([
                 array_to_string(words[i:i+2], ' ')
                 FOR i IN generate_series(1, greatest(len(words) - 2, 1))
               ])) AS DISTINCT_SHINGLE
        FROM (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
          FROM documents WHERE doc_id < 100
        )
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_both
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY x.doc_id, y.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(100.0 * n_both / (sa.n + sb.n - n_both), 1) AS jaccard_pct
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    ORDER BY jaccard_pct DESC, doc_a ASC, doc_b ASC
    LIMIT 15
    """,
)
def docs_ngram_jaccard_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard, top-15 most similar pairs among doc_id<100
    (bounded for the oracle's O(N²); the MinHash path is the scale route)."""
    d = shingle_tokens(load(spark, sf, "documents").filter(F.col("doc_id") < 100))
    sh = d.select("doc_id", F.explode("shingles").alias("shingle")).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    y = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        x.join(y, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("both"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                100.0 * F.col("both") / (F.col("na") + F.col("nb") - F.col("both")), 1
            ).alias("jaccard_pct"),
        )
        .orderBy(F.col("jaccard_pct").desc(), F.col("doc_a").asc(), F.col("doc_b").asc())
        .limit(15)
    )
