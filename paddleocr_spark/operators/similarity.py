"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_bruteforce``: the correctness baseline — broadcast the
  (small) query set, JVM-side dot products via zip_with/aggregate, and
  a per-query top-k window. One shuffle (the window); the scan side
  never re-partitions. At 10^12 rows this is the exact-scoring path you
  run *after* an index narrows candidates.
- ``cosine_topk_lsh`` / ``embedding_near_dups``: the scale path —
  random-hyperplane LSH for cosine. SIGN_BANDS bands of SIGN_BITS
  hyperplanes each; a vector's bucket in a band is the sign bitmask of
  its dot products with that band's planes. Candidates must share a
  (band, bucket) key — an equi-join, so cost scales with bucket
  occupancy N/2^SIGN_BITS per band, not corpus size. Multiple bands
  play the multi-probe role: a near-dup pair (cosine c) collides in one
  band with prob (1 - acos(c)/pi)^SIGN_BITS, and in ≥1 of B bands with
  prob 1-(1-p)^B (c=0.9, 8 bits, 8 bands → ~0.92 recall). At larger N,
  raise SIGN_BITS (occupancy N/2^bits) and B together — the knobs are
  independent of the plan shape.

The hyperplane coefficients are seeded and rounded to 6 dp, and the
DuckDB oracle embeds them as literal arrays, so both engines bucket
identically. All arithmetic is float→double in array order; results
round to 6 dp before comparison.

The test corpus has no high-cosine pairs, so ``embedding_near_dups``
runs over the corpus augmented with deterministically perturbed copies
(x → x*1.01 + 0.001) of a vec_id prefix — mirrored in the oracle — so
the operator is observed producing output.
"""

from __future__ import annotations

import numpy as np

__all__ = ["N_QUERIES", "TOP_K", "SIGN_BANDS", "SIGN_BITS", "EMB_DIM",
           "PLANES", "PLANT_N", "PLANT_OFFSET",
           "cosine_topk_bruteforce", "cosine_topk_lsh",
           "embedding_near_dups"]

N_QUERIES = 8
TOP_K = 5
SIGN_BANDS = 8
SIGN_BITS = 8          # 2^8 = 256 buckets per band
EMB_DIM = 64
PLANT_N = 16
PLANT_OFFSET = 1_000_000

# seeded random hyperplanes, rounded so the DuckDB oracle can embed
# them as exact literals (PLANES[band*SIGN_BITS + bit][dim])
_rng = np.random.default_rng(777)
PLANES = [[float(v) for v in row]
          for row in _rng.standard_normal(
              (SIGN_BANDS * SIGN_BITS, EMB_DIM)).round(6)]
del _rng


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


def _augmented(spark, sf_dir):
    """embeddings ∪ planted near-copies (deterministic perturbation,
    mirrored in the oracle)."""
    from pyspark.sql import functions as F

    emb = _load(spark, sf_dir)
    planted = (emb.where(F.col("vec_id") < PLANT_N)
               .select((F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
                       F.transform(F.col("emb"),
                                   lambda x: x * F.lit(1.01) + F.lit(0.001))
                       .alias("emb")))
    return emb.unionByName(planted)


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


def _band_buckets(F, df, emb_col: str = "emb"):
    """vec rows → (…, band, bucket): one posexplode over the per-band
    sign-bitmask expressions (all JVM-side fold arithmetic)."""
    band_exprs = []
    for band in range(SIGN_BANDS):
        bucket = F.lit(0)
        for bit in range(SIGN_BITS):
            plane = PLANES[band * SIGN_BITS + bit]
            dot = F.aggregate(
                F.zip_with(F.col(emb_col), F.lit(plane),
                           lambda x, y: x * y),
                F.lit(0.0).cast("double"), lambda acc, v: acc + v)
            bucket = bucket + F.when(dot >= 0,
                                     F.lit(1 << bit)).otherwise(F.lit(0))
        band_exprs.append(bucket.cast("int"))
    return df.select("*", F.posexplode(F.array(*band_exprs))
                     .alias("band", "bucket"))


def cosine_topk_lsh(spark, sf_dir: str, n_queries: int = N_QUERIES,
                    k: int = TOP_K):
    """Approximate top-k: candidates = vectors sharing ≥1 (band,
    bucket) key with the query, exact cosine on candidates only."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = _load(spark, sf_dir)
    bands = _band_buckets(F, emb)
    qbands = (bands.where(F.col("vec_id") < n_queries)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("emb").alias("qemb"), "band", "bucket"))
    scored = (bands.join(F.broadcast(qbands), ["band", "bucket"])
              .where(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id",
                      F.round(_cosine(F, F.col("qemb"), F.col("emb")), 6)
                      .alias("cosine"))
              # a pair colliding in several bands scores identically in
              # each; dedup the small (id, id, score) rows, not the embs
              .dropDuplicates(["query_id", "vec_id"]))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cosine"))


def embedding_near_dups(spark, sf_dir: str, threshold: float = 0.9):
    """Embedding-cosine near-duplicate pairs over the planted-augmented
    corpus, blocked by (band, bucket): scoring touches only same-bucket
    pairs, so cost follows bucket occupancy (N/2^SIGN_BITS per band)."""
    from pyspark.sql import functions as F

    bands = _band_buckets(F, _augmented(spark, sf_dir))
    a = bands.select(F.col("vec_id").alias("vec_a"),
                     F.col("emb").alias("ea"), "band", "bucket")
    b = bands.select(F.col("vec_id").alias("vec_b"),
                     F.col("emb").alias("eb"), "band", "bucket")
    return (a.join(b, ["band", "bucket"])
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b",
                    F.round(_cosine(F, F.col("ea"), F.col("eb")), 6)
                    .alias("cosine"))
            .dropDuplicates(["vec_a", "vec_b"])
            .where(F.col("cosine") >= threshold))
