"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_bruteforce``: the correctness baseline — broadcast the
  (small) query set, JVM-side dot products via zip_with/aggregate, and
  a per-query top-k window. One shuffle (the window); the scan side
  never re-partitions. At 10^12 rows this is the exact-scoring path you
  run *after* an index narrows candidates.
- ``cosine_topk_lsh``: the scale path — bit-sampling LSH for cosine
  (sign pattern of the first SIGN_BITS dimensions) buckets both sides;
  scoring happens only within a bucket (equi-join), so cost scales with
  bucket occupancy, not corpus size.

All arithmetic is float→double in array order, so the DuckDB oracle
(list_cosine_similarity / explicit sums) reproduces values bit-for-bit;
results round to 6 dp before comparison.
"""

from __future__ import annotations

__all__ = ["N_QUERIES", "TOP_K", "SIGN_BITS", "cosine_topk_bruteforce",
           "cosine_topk_lsh"]

N_QUERIES = 8
TOP_K = 5
SIGN_BITS = 4


def _cosine(F, a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                            lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0).cast("double"),
                            lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _load(spark, sf_dir):
    from pyspark.sql import functions as F

    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select(F.col("vec_id").cast("long").alias("vec_id"),
                    F.col("embedding").cast("array<double>").alias("emb")))


def cosine_topk_bruteforce(spark, sf_dir: str, n_queries: int = N_QUERIES,
                           k: int = TOP_K):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = _load(spark, sf_dir)
    queries = (emb.where(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("emb").alias("qemb")))
    scored = (emb.crossJoin(F.broadcast(queries))
              .where(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id",
                      F.round(_cosine(F, F.col("qemb"), F.col("emb")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cosine"))


def _bucket(F, emb_col):
    """Bit-sampling LSH bucket: sign bits of the first SIGN_BITS dims."""
    b = F.lit(0)
    for i in range(SIGN_BITS):
        b = b + F.when(F.element_at(emb_col, i + 1) >= 0,
                       F.lit(1 << i)).otherwise(F.lit(0))
    return b.cast("int")


def cosine_topk_lsh(spark, sf_dir: str, n_queries: int = N_QUERIES,
                    k: int = TOP_K):
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, exact cosine within the bucket."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = _load(spark, sf_dir).withColumn("bucket", _bucket(F, F.col("emb")))
    queries = (emb.where(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("emb").alias("qemb"),
                       F.col("bucket")))
    scored = (emb.join(F.broadcast(queries), "bucket")
              .where(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id",
                      F.round(_cosine(F, F.col("qemb"), F.col("emb")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cosine"))


def embedding_near_dups(spark, sf_dir: str, threshold: float = 0.9):
    """Embedding-cosine near-duplicate pairs, blocked by LSH bucket
    (both members of a high-cosine pair share sign bits with high
    probability; blocking bounds the pair count)."""
    from pyspark.sql import functions as F

    emb = _load(spark, sf_dir).withColumn("bucket", _bucket(F, F.col("emb")))
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"),
                   "bucket")
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"),
                   "bucket")
    return (a.join(b, "bucket")
            .where(F.col("vec_a") < F.col("vec_b"))
            .withColumn("cosine",
                        F.round(_cosine(F, F.col("ea"), F.col("eb")), 6))
            .where(F.col("cosine") >= threshold)
            .select("vec_a", "vec_b", "cosine"))
