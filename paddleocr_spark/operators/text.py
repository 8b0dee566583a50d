"""Text-analysis operators over a (doc_id, text) corpus.

Training-data-pipeline staples (language-ID heuristic, quality scoring,
token counting, fingerprinting, boilerplate cleaning) expressed as pure
Catalyst expressions — JVM-side, whole-stage-codegen'd, no Python in
the hot path. Each has a matching ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` computing the identical values in
DuckDB; keep the formulas in sync.

The boilerplate cleaner is the same regex pair used by the extraction
pipeline's text branch (reference analogue: the don't-care ignore-tag
mechanism, ``toddleocr/transforms/custom/label_ops.py:39-42``).
"""

from __future__ import annotations

from paddleocr_spark.corpus import BOILERPLATE_RE

__all__ = [
    "STOPWORDS", "tokens_col", "clean_documents", "token_stats",
    "quality_scores", "fingerprints",
]

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "on"]


def tokens_col(col):
    from pyspark.sql import functions as F

    return F.split(F.trim(F.lower(col)), r"\s+")


def clean_documents(spark, sf_dir: str):
    """Boilerplate strip + whitespace collapse (the extract pipeline's
    text branch, applied to the documents table)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cleaned = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("text"), BOILERPLATE_RE, ""), r"\s+", " "))
    return (df.select(F.col("doc_id").cast("long").alias("doc_id"),
                      cleaned.alias("clean_text"))
            .withColumn("clean_len", F.length("clean_text").cast("long")))


def token_stats(spark, sf_dir: str):
    """Whitespace token count + distinct tokens + mean token length."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens_col(F.col("text"))
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("double"),
                        lambda acc, w: acc + F.length(w))
            / F.size(toks), 6).alias("avg_token_len"),
    )


def quality_scores(spark, sf_dir: str):
    """Composite quality score: stopword ratio + length saturation +
    alphabetic-character ratio, plus a stopword-based language guess
    (n-gram/stopword heuristic language-ID)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens_col(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    n_tok = F.size(toks)
    alpha_ratio = (F.length(F.regexp_replace(F.lower(F.col("text")),
                                             "[^a-z]", ""))
                   / F.length(F.col("text")))
    stop_ratio = n_stop.cast("double") / n_tok
    score = (0.4 * stop_ratio
             + 0.3 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
             + 0.3 * alpha_ratio)
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality"),
        F.when(stop_ratio >= 0.08, F.lit("en")).otherwise(F.lit("unk"))
        .alias("lang_guess"),
    )


ROLL_BASE = 31
ROLL_MOD = 2147483647  # 2^31-1: acc*31 + 255 stays < 2^36, overflow-free
                       # under BOTH Spark (wrapping) and DuckDB (erroring)


def fingerprints(spark, sf_dir: str):
    """Document fingerprints: md5 of the normalized text, the min
    word-hash (1-perm minhash), and a Karp–Rabin polynomial rolling
    hash over the characters — the exact-dedup / near-dedup / shingle
    keys. The rolling hash is a JVM-side left fold (F.aggregate), no
    Python."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    toks = F.split(norm, " ")
    # 60-bit salted word hash from md5 — same construction as
    # dedup._word_hash(salt=0) and the DuckDB oracle
    word_hash = lambda w: F.conv(
        F.substring(F.md5(F.concat(F.lit("0:"), w)), 1, 15), 16, 10
    ).cast("long")
    rolling = F.aggregate(
        F.split(norm, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * ROLL_BASE + F.ascii(ch)) % ROLL_MOD)
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(norm).alias("content_md5"),
        F.array_min(F.transform(toks, word_hash)).alias("min_word_hash"),
        rolling.alias("rolling_hash"),
    )
