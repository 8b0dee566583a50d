"""BM25 keyword search over the documents corpus.

The text-retrieval counterpart of ``operators/similarity.py``'s vector
top-k family: score documents against a fixed set of keyword queries
with BM25 (Robertson/Sparck-Jones idf in the Lucene always-positive
form) and return the top-k per query. A training-data pipeline uses
exactly this shape for targeted corpus slicing ("pull the documents
about X") and for quality-weighted retrieval baselines.

Plan shape (designed for 10^12 docs):
- ONE scan of documents computes per-doc length AND the query-term
  hits in the same projection (``F.filter`` on the token array before
  the explode, so the exploded row count is bounded by matches + one
  sentinel row per doc, never corpus tokens);
- corpus stats (N, avgdl) ride a SENTINEL term prepended to every
  doc's matched-token array: the sentinel rows flow through the very
  same explode -> groupBy as the term hits, and the grouped relation
  (one sentinel row per doc + the matched (doc, term) pairs — tiny
  next to the corpus) is materialized ONCE as a tracked cache that
  both the tf branch and the stats branch read. The naive "separate
  stats aggregate" form re-scans and re-tokenizes the whole corpus a
  second time (Catalyst pushes the grouping-key filters below the
  aggregate, so exchange reuse cannot unify the branches — measured).
  At production scale the grouped relation is its own table;
- tf = one map-side-combinable groupBy over the hits;
- df(term) comes from a window over the tiny tf relation partitioned
  by term — no second corpus scan;
- stats broadcast via crossJoin; query terms broadcast-join onto tf;
- top-k per query is a rank window over the scored rows (rows =
  matched docs, not corpus size).

Cross-engine float parity: per-(doc, term) contributions are rounded
to integer micro-units (x 1e6) BEFORE summation, so the per-doc score
is an exact BIGINT sum — immune to summation-order ulp drift between
Spark and the DuckDB oracle; ranking ties break on doc_id.
"""

from __future__ import annotations

__all__ = ["BM25_QUERIES", "BM25_K1", "BM25_B", "BM25_TOPK", "bm25_topk"]

# fixed query set over the synthetic corpus vocabulary: a rare term
# (df~25/500), mixed common terms, and a stopword-ish pair
BM25_QUERIES = {
    "rare_dup": ["dup", "join"],
    "scan_sort": ["scan", "sort", "fast"],
    "window_agg": ["window", "agg"],
    "stop_pair": ["the", "a"],
}
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# prepended to every doc's matched-token array so corpus stats flow
# through the same scan/exchange as the hits; never a real token
# (norm_content output is lowercase alnum + spaces)
_SENTINEL = "\x00doc"


def bm25_topk(spark, sf_dir: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from paddleocr_spark.operators.dedup import norm_content

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text"))
    toks = F.split(norm_content(F, F.col("text")), " ")
    all_terms = sorted({t for ts in BM25_QUERIES.values() for t in ts})
    term_arr = F.array(*[F.lit(t) for t in all_terms])

    # one scan: doc length + query-term hits + a sentinel row per doc,
    # all from the same token array
    hits = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        F.explode(F.concat(
            F.array(F.lit(_SENTINEL)),
            F.filter(toks, lambda w: F.array_contains(term_arr, w))))
        .alias("term"))
    from paddleocr_spark.operators._cache import eager_persist

    grouped = eager_persist(
        hits.groupBy("doc_id", "term", "dl")
        .agg(F.count("*").cast("long").alias("tf")))
    tf = grouped.where(F.col("term") != _SENTINEL)
    # df(term): window over the tf relation — one shuffle by term, no
    # second corpus scan ((doc, term) rows are distinct, so count == df)
    tf = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("long"))

    # sentinel rows: exactly one per doc, carrying dl -> (N, avgdl)
    stats = (grouped.where(F.col("term") == _SENTINEL)
             .agg(F.count("*").cast("double").alias("n_docs"),
                  F.avg("dl").alias("avgdl")))

    qrows = [(qid, t) for qid, ts in sorted(BM25_QUERIES.items())
             for t in ts]
    qdf = spark.createDataFrame(qrows, "query_id string, term string")

    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (BM25_K1 + 1)
               / (F.col("tf")
                  + BM25_K1 * (1 - BM25_B
                               + BM25_B * F.col("dl") / F.col("avgdl"))))
    contrib_micro = F.round(idf * tf_norm * 1e6, 0).cast("long")

    scored = (tf.join(F.broadcast(qdf), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy("query_id", "doc_id")
              .agg(F.sum(contrib_micro).alias("score_micro")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= BM25_TOPK)
            .select("query_id", "rank", "doc_id", "score_micro"))
