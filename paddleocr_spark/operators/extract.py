"""The flagship pipeline: interleaved docs → ordered span sequence.

Spark-first re-creation of the reference's end-to-end OCR flow
(``toddleocr/engine.py:326-391`` + ``toddleocr/config.py:419-439``),
inverted from per-image loops into set-at-a-time DataFrame stages:

    docs(doc_id, spans[])
      → explode(spans)
      → text branch:  boilerplate strip via JVM-side regexp (no Python)
      → media branch: decode ONCE PER DISTINCT media_ref (the media
        store is already distinct) via one mapInPandas stage, then
        equi-join the small string fragments back to the spans
      → union → per-doc (offset, frag_idx) window → order
      → (doc_id, order, kind, text, media_ref, conf)

Scale design notes (the parts that matter at 10^12 docs):

- Compute is keyed by media_ref, not by span: a media item referenced
  by many docs (or 400× inside one media-heavy doc) is decoded once and
  fanned out by a join — the expensive tensor columns never shuffle.
- The spans↔fragments join shuffles only small strings; AQE skew-join
  splits hot media_refs. For media-heavy docs the explode itself
  distributes spans evenly — there is no per-doc hotspot until the
  final per-doc window, which touches only output-sized rows.
- The final ordering uses a window (all rows of a doc meet in one
  partition). Rows there are tiny (strings), so a 10^5-span doc is
  ~10 MB — safe. ``salt_buckets`` pre-shuffles by (doc_id, salt) ahead
  of the window to spread the *sort* spill of pathological docs; the
  window still re-partitions by doc_id (correctness is unaffected).
- Text cleaning is pure Catalyst (regexp_replace), codegen'd JVM-side.
"""

from __future__ import annotations

from paddleocr_spark.corpus import BOILERPLATE_RE
from paddleocr_spark.functions.udfs import (
    ERROR_KIND,
    decode_media,
    decode_media_store,
)

__all__ = ["explode_spans", "clean_text_col", "extract_spans"]


def clean_text_col(col):
    """JVM-side equivalent of extract_core.clean_text — MUST stay in
    sync with it and with the DuckDB oracle SQL."""
    from pyspark.sql import functions as F

    return F.trim(
        F.regexp_replace(F.regexp_replace(col, BOILERPLATE_RE, ""), r"\s+", " ")
    )


def explode_spans(docs_df):
    from pyspark.sql import functions as F

    return (docs_df
            .select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"))


def extract_spans(docs_df, media, decode_partitions: int | None = None,
                  salt_buckets: int = 0):
    """docs + media store → ordered span rows
    (doc_id, order, kind, text, media_ref, conf).

    ``media`` is either a DataFrame (generic path: tensors cross the
    JVM→Python Arrow boundary — fine for small stores) or a parquet
    store path (fast pointer-passing path: tasks read their split
    directly with pyarrow; see functions/udfs.py)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if isinstance(media, str):
        fragments = decode_media_store(docs_df.sparkSession, media)
    else:
        fragments = decode_media(media, repartition=decode_partitions)
    frags = fragments.select(
        F.col("media_ref").alias("join_key"),
        "frag_idx",
        F.col("out_kind").alias("f_kind"),
        F.col("out_text").alias("f_text"),
        F.col("conf").alias("f_conf"))

    # SINGLE scan + explode feeding both branches (a text/media union of
    # two filters would scan + nested-decode the spans column twice —
    # measured at ~330 JVM core-s per pass at 100k docs). Text rows get
    # a synthetic unique join key so the left join has no hot ''-key.
    spans = (explode_spans(docs_df)
             .withColumn("clean",
                         F.when(F.col("kind") == "text",
                                clean_text_col(F.col("text"))))
             .withColumn("join_key",
                         F.when(F.col("kind") == "media",
                                F.col("media_ref"))
                         .otherwise(F.concat(F.lit("t#"), F.col("doc_id"),
                                             F.lit("#"), F.col("offset")))))

    joined = spans.join(frags, "join_key", "left")
    unioned = (joined
               .where(((F.col("kind") == "text")
                       & (F.length("clean") > 0))
                      | ((F.col("kind") == "media")
                         & F.col("f_kind").isNotNull()
                         # quarantined decode failures never become
                         # spans (surfaced via decode_errors instead)
                         & (F.col("f_kind") != ERROR_KIND)))
               .select("doc_id", "offset",
                       F.coalesce("frag_idx", F.lit(0)).alias("frag_idx"),
                       F.when(F.col("kind") == "text", F.lit("text"))
                       .otherwise(F.col("f_kind")).alias("kind"),
                       F.when(F.col("kind") == "text", F.col("clean"))
                       .otherwise(F.col("f_text")).alias("text"),
                       F.when(F.col("kind") == "text", F.lit(""))
                       .otherwise(F.col("media_ref")).alias("media_ref"),
                       F.when(F.col("kind") == "text", F.lit(1.0))
                       .otherwise(F.col("f_conf")).alias("conf")))
    if salt_buckets:
        # pre-spread pathological docs before the per-doc sort
        unioned = unioned.repartition(
            F.col("doc_id"), F.pmod(F.hash("offset"), F.lit(salt_buckets)))

    w = Window.partitionBy("doc_id").orderBy("offset", "frag_idx")
    return (unioned
            .withColumn("order", (F.row_number().over(w) - 1).cast("int"))
            .select("doc_id", "order", "kind", "text", "media_ref", "conf"))
