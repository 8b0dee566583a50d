"""SER → RE key-information extraction as relational Spark stages.

The reference runs LayoutXLM token classification then decodes
(``toddleocr/postprocess/vqa.py``); here the token classifier is the
fixture world's deterministic stand-in — a token's BIO label id is a
salted md5 hash of the token (exactly like the corpus' other
model-free tensors) — and everything downstream is REAL and
Spark-first:

- ``ser_entities``: tokens of every text fragment → BIO id → fold I-X
  onto B-X → per-segment majority vote (groupBy + count + rank window,
  ties to the smallest id = np.bincount argmax semantics,
  ``vqa.py:139-141``) → entities (non-O segments) with QUESTION /
  ANSWER / HEADER labels. Pure Catalyst: one explode, one groupBy, one
  window.
- ``re_pairs``: the SER→RE entity join (``make_re_input``,
  ``transforms/functional.py:136``): QUESTION × ANSWER candidates per
  media (equi-join on media_ref), a salted-hash link predicate as the
  stand-in relation head, then the reference's first-head-per-tail
  dedup (``vqa.py:30-36``) as a rank-1 window per tail.
- ``kie_re_metric``: VQAReTokenMetric 'boundaries' mode
  (``toddleocr/metrics/vqa.py:59-``): pred pairs (one salt family) vs
  gt pairs (another salt family) → tp/fp/fn → precision/recall/hmean.

Every stage has a DuckDB oracle over the materialized golden
fragments, mirroring the same hashes — so the explode/groupBy/window/
join plumbing is value-checked end to end.
"""

from __future__ import annotations

from .dedup import _word_hash

__all__ = ["ser_entities", "re_pairs", "kie_re_metric",
           "N_BIO_IDS", "LABEL_SALT", "LINK_SALT", "GT_LABEL_SALT",
           "GT_LINK_SALT", "LINK_PCT"]

N_BIO_IDS = 7          # O + B/I x {QUESTION, ANSWER, HEADER}
LABEL_SALT = 7         # token -> BIO id hash salt (the "model")
LINK_SALT = 11         # (media, head, tail) -> link predicate salt
GT_LABEL_SALT = 13     # independent salts = the "ground truth" run
GT_LINK_SALT = 17
LINK_PCT = 40          # % of candidate pairs that link


def ser_entities(fragments_df, label_salt: int = LABEL_SALT):
    """text fragments → (media_ref, box_idx, label) entities."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = (fragments_df
            .where(F.col("out_kind") == "text_block")
            .select("media_ref", "box_idx",
                    F.explode(F.split("out_text", " ")).alias("tok")))
    lab = (_word_hash(F, F.col("tok"), label_salt) % N_BIO_IDS).cast("int")
    folded = (F.when(lab == 0, 0)
              .when(lab % 2 == 0, lab - 1)
              .otherwise(lab))
    counts = (toks.select("media_ref", "box_idx", folded.alias("fid"))
              .groupBy("media_ref", "box_idx", "fid")
              .agg(F.count("*").alias("n")))
    w = Window.partitionBy("media_ref", "box_idx").orderBy(
        F.desc("n"), F.asc("fid"))
    picked = (counts.withColumn("rk", F.row_number().over(w))
              .where((F.col("rk") == 1) & (F.col("fid") != 0)))
    label = (F.when(F.col("fid") == 1, "QUESTION")
             .when(F.col("fid") == 3, "ANSWER")
             .otherwise("HEADER"))
    return picked.select("media_ref", "box_idx", label.alias("label"))


def re_pairs(fragments_df, label_salt: int = LABEL_SALT,
             link_salt: int = LINK_SALT):
    """QUESTION→ANSWER relation pairs: candidate equi-join per media,
    hash link predicate, first-head-per-tail dedup."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ents = ser_entities(fragments_df, label_salt)
    q = (ents.where(F.col("label") == "QUESTION")
         .select("media_ref", F.col("box_idx").alias("head_box")))
    a = (ents.where(F.col("label") == "ANSWER")
         .select("media_ref", F.col("box_idx").alias("tail_box")))
    cand = q.join(a, "media_ref")
    key = F.concat(F.col("media_ref"), F.lit(":"),
                   F.col("head_box").cast("string"), F.lit(":"),
                   F.col("tail_box").cast("string"))
    linked = cand.where(_word_hash(F, key, link_salt) % 100 < LINK_PCT)
    w = Window.partitionBy("media_ref", "tail_box").orderBy(
        F.asc("head_box"))
    return (linked.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("media_ref", "head_box", "tail_box"))


def kie_re_metric(fragments_df):
    """re_score 'boundaries' mode over pred-vs-gt relation pairs —
    one full-outer join + one aggregation (no driver-side counts)."""
    from pyspark.sql import functions as F

    keys = ["media_ref", "head_box", "tail_box"]
    pred = (re_pairs(fragments_df, LABEL_SALT, LINK_SALT)
            .withColumn("in_pred", F.lit(1)))
    gt = (re_pairs(fragments_df, GT_LABEL_SALT, GT_LINK_SALT)
          .withColumn("in_gt", F.lit(1)))
    joined = pred.join(gt, keys, "full")
    totals = joined.agg(
        F.sum(F.col("in_pred") * F.col("in_gt")).alias("tp"),
        F.sum("in_pred").alias("n_pred"),
        F.sum("in_gt").alias("n_gt"))
    p = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")) \
        .otherwise(0.0)
    r = F.when(F.col("n_gt") > 0, F.col("tp") / F.col("n_gt")) \
        .otherwise(0.0)
    return totals.select(
        F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
        F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
        F.coalesce(F.col("n_gt"), F.lit(0)).cast("long").alias("n_gt"),
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0), 6)
        .alias("hmean"))
