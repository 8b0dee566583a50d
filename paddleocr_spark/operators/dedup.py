"""Deduplication operators over a (doc_id, text) corpus.

Four families, all shuffle-conscious:

- exact:       hash-groupBy on normalized-content md5 (one shuffle,
               map-side partial agg).
- minhash+LSH: k=8 md5-derived min-hashes per doc → 2 bands of 4 →
               candidate pairs via equi-join on band hash (never the
               O(N²) cross join). Deterministic hashes (no seed state)
               so the DuckDB oracle reproduces them bit-for-bit.
- simhash:     32-bit sign-of-weighted-bit-sums fingerprint via an
               explode(words)×explode(bits) aggregation — pure SQL.
- n-gram Jaccard verify: exact word-set Jaccard on the (small) LSH
               candidate set only.

At 10^12 docs the LSH band join is the only super-linear step; its key
cardinality ~ docs × bands, and AQE skew-join splits hot bands (e.g.
boilerplate-only documents).
"""

from __future__ import annotations

__all__ = [
    "N_HASHES", "N_BANDS", "exact_dedup", "minhash_signatures",
    "lsh_candidate_pairs", "near_dup_pairs", "simhash32",
]

N_HASHES = 8
N_BANDS = 2  # 4 rows per band
SIM_BITS = 32


def _norm_tokens(F, col):
    return F.split(F.regexp_replace(F.trim(F.lower(col)), r"\s+", " "), " ")


def _word_hash(F, w, salt: int):
    """60-bit hash_salt(w) = int(md5(salt || ':' || w)[:15], 16).
    Mirrored exactly by the DuckDB oracle."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), w)), 1, 15), 16, 10
    ).cast("long")


def exact_dedup(spark, sf_dir: str):
    """Exact duplicate groups: normalized-md5 → (n_docs, keeper)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (df.select(F.md5(norm).alias("content_md5"),
                      F.col("doc_id").cast("long").alias("doc_id"))
            .groupBy("content_md5")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("doc_id").alias("keeper_doc_id")))


def minhash_signatures(spark, sf_dir: str):
    """Per-doc k=8 minhash over distinct word shingles.

    explode → per-(doc, salt) min → pivot back to columns; the explode
    keeps the agg map-side combinable (partial min per partition)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.array_distinct(_norm_tokens(F, F.col("text")))
    base = df.select(F.col("doc_id").cast("long").alias("doc_id"),
                     F.explode(toks).alias("w"))
    aggs = [F.min(_word_hash(F, F.col("w"), i)).alias(f"mh{i}")
            for i in range(N_HASHES)]
    return base.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(spark, sf_dir: str):
    """Banded LSH: band hash = md5 of 4 concatenated minhashes;
    candidates = docs sharing any band hash (a < b)."""
    from pyspark.sql import functions as F

    sig = minhash_signatures(spark, sf_dir)
    rows_per_band = N_HASHES // N_BANDS
    bands = []
    for b in range(N_BANDS):
        cols = [F.col(f"mh{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)]
        bands.append(
            sig.select("doc_id",
                       F.lit(b).alias("band"),
                       F.md5(F.concat_ws("_", *cols)).alias("band_hash")))
    allb = bands[0]
    for b in bands[1:]:
        allb = allb.unionByName(b)
    a = allb.alias("a")
    bb = allb.alias("b")
    return (a.join(bb, ["band", "band_hash"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def near_dup_pairs(spark, sf_dir: str, threshold: float = 0.7):
    """LSH candidates verified by exact word-set Jaccard (n-gram
    Jaccard with n=1 shingles — matches the minhash shingling)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = df.select(F.col("doc_id").cast("long").alias("doc_id"),
                     F.array_distinct(_norm_tokens(F, F.col("text")))
                     .alias("toks"))
    cand = lsh_candidate_pairs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    union = F.size(F.array_union("ta", "tb")).cast("double")
    return (cand.join(a, "doc_a").join(b, "doc_b")
            .withColumn("jaccard", F.round(inter / union, 6))
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def simhash32(spark, sf_dir: str):
    """32-bit SimHash in ONE groupBy over the token stream.

    Per bit b the signed sum over words is sum(±1) = 2*count(bit set)
    - n_words, so 32 conditional-count aggregates plus one count(*)
    replace the previous explode(words)×crossJoin(32 bits) plan (32×
    row amplification through a shuffle + two groupBys, ~9 s at sf0.1
    vs ~2 s for minhash on the same corpus). All aggregates are
    map-side combinable; at 10^12 docs this shuffles exactly one
    partial-agg row per (partition, doc)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = _norm_tokens(F, F.col("text"))  # multiset: repeated words weight more
    words = df.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.explode(toks).alias("w"))
    hashed = words.select("doc_id", _word_hash(F, F.col("w"), 99).alias("h"))
    bit_counts = [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"c{b}")
        for b in range(SIM_BITS)
    ]
    agg = hashed.groupBy("doc_id").agg(
        F.count("*").alias("n"), *bit_counts)
    sim = F.lit(0).cast("long")
    for b in range(SIM_BITS):
        # bit set iff the signed sum 2*c_b - n > 0 (same sign rule as
        # the per-bit groupBy formulation and the DuckDB oracle)
        sim = sim + F.when(2 * F.col(f"c{b}") - F.col("n") > 0,
                           F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return agg.select("doc_id", sim.cast("long").alias("simhash"))
