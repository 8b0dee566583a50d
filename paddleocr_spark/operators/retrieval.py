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

Cross-engine float parity (round-4 hardening after one unreproducible
driver hash mismatch): the score arithmetic is EXACT INTEGER except a
single ``ln`` whose argument is an exactly-representable rational of
bigints, identical in both engines:

- corpus stats are exact bigints (``n_docs``, ``sum_dl = sum(dl)``) —
  no float ``avg`` whose value could depend on summation order;
- ``tf_norm`` is the exact rational ``num10 / den10`` with
  ``num10 = 22*tf*sum_dl`` and
  ``den10 = 10*tf*sum_dl + 3*sum_dl + 9*dl*n_docs``
  (the BM25 k1=1.2, b=0.75 form multiplied through by ``10*sum_dl`` —
  all bigint products < 2^53, so the one IEEE division is bit-identical
  across engines);
- ``idf`` is quantized alone: ``idf_nano = round(ln((2N+2)/(2df+1))
  * 1e9)`` as bigint — the only transcendental, applied to the same
  double in both engines;
- per-(doc, term) ``contrib_micro = round(idf_nano * (num10/den10)
  / 1e3)`` as bigint, summed exactly; ranking ties break on doc_id;
- the final result carries an explicit total ``orderBy(query_id,
  rank)`` so output order can never affect an order-sensitive hash.
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

    # sentinel rows: exactly one per doc, carrying dl -> exact bigint
    # corpus stats (count + sum, never a float avg)
    stats = (grouped.where(F.col("term") == _SENTINEL)
             .agg(F.count("*").cast("long").alias("n_docs"),
                  F.sum("dl").cast("long").alias("sum_dl")))

    qrows = [(qid, t) for qid, ts in sorted(BM25_QUERIES.items())
             for t in ts]
    qdf = spark.createDataFrame(qrows, "query_id string, term string")

    # idf = ln(1 + (N - df + 0.5)/(df + 0.5)) = ln((2N+2)/(2df+1)):
    # the ln argument is one IEEE division of two exact integers
    idf_nano = F.round(
        F.log((2 * F.col("n_docs") + F.lit(2.0))
              / (2 * F.col("df") + F.lit(1.0))) * 1e9, 0).cast("long")
    # tf_norm = tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl), multiplied
    # through by 10*sum_dl: exact bigint numerator/denominator
    num10 = 22 * F.col("tf") * F.col("sum_dl")
    den10 = (10 * F.col("tf") * F.col("sum_dl") + 3 * F.col("sum_dl")
             + 9 * F.col("dl") * F.col("n_docs"))
    contrib_micro = F.round(
        idf_nano * (num10 / den10) / F.lit(1e3), 0).cast("long")

    scored = (tf.join(F.broadcast(qdf), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy("query_id", "doc_id")
              .agg(F.sum(contrib_micro).alias("score_micro")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= BM25_TOPK)
            .select("query_id", "rank", "doc_id", "score_micro")
            .orderBy("query_id", "rank"))
