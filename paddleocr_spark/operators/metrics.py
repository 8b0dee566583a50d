"""Metric aggregations — the reference's evaluator classes re-expressed
as partial/final ``groupBy().agg()`` (their accumulate/get_metric split
IS Spark's partial aggregation; SURVEY.md §2.4).

- ``rec_metric_pairs``: RecMetric semantics (``toddleocr/metrics/
  rec.py:10-59``) — exact-match accuracy + 1 - mean normalized edit
  distance, with the ``is_filter`` normalization (lowercase, strip
  non-alphanumeric; ``rec.py:20-24``). Edit distance is JVM-side
  ``F.levenshtein`` (the reference uses rapidfuzz's
  ``Levenshtein.normalized_distance``, ``rec.py:38``). Applied to
  consecutive-doc text pairs so a DuckDB oracle can verify it.
- ``corpus_rec_metric`` / ``corpus_det_metric``: the same aggregations
  over the synthetic extraction corpus, comparing the distributed
  pipeline's outputs against generator ground truth (DetMetric's
  per-image accumulate + combine_results finalize,
  ``toddleocr/metrics/det.py:6-53``).
"""

from __future__ import annotations

__all__ = ["training_stats", "rec_metric_pairs", "cls_cnt_metric_pairs", "corpus_rec_metric",
           "corpus_det_metric", "det_iou_metric", "table_structure_metric",
           "sr_metric", "can_metric", "e2e_metric", "ct_metric"]


LOG_WINDOW_SIZE = 20  # reference default: config.py:135 log_window_size


def training_stats(spark, sf_dir: str):
    """TrainingStats + AverageMeter as window aggregations
    (``toddleocr/utils/stats.py:9-45``, ``utils/utility.py:151-167``).

    The reference smooths each logged metric series with the MEDIAN of
    a trailing deque(maxlen=window_size) and tracks a cumulative
    weighted mean (AverageMeter). Re-expressed over the ``events``
    table: one series per event_type ordered by (ts, event_id); per
    row the trailing-20 median (``smoothed``, rounded 6 per
    TrainingStats.get) and the running mean (``avg_meter``).

    Spark disallows ``median()`` with a window FRAME, so the trailing
    median is ``array_sort(collect_list)`` over the ROWS frame + the
    two-middle-element interpolation — exact, JVM-side, O(window) per
    row, and frame-bounded so state never exceeds window_size rows
    regardless of series length (the deque semantics, distributed).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    frame = w.rowsBetween(-(LOG_WINDOW_SIZE - 1), 0)
    arr = F.array_sort(F.collect_list("value").over(frame))
    n = F.size(arr)
    lo = F.element_at(arr, (F.floor((n - 1) / 2) + 1).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    return (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select(
                "event_type",
                F.row_number().over(w).alias("step"),
                F.round((lo + hi) / 2, 6).alias("smoothed"),
                # exact-decimal running sum, ONE double division:
                # float summation order differs between engines (6/10k
                # last-ulp mismatches with a plain avg window), decimal
                # accumulation is exact and engine-independent
                F.round(
                    F.sum(F.col("value").cast("decimal(28,6)")).over(
                        w.rowsBetween(Window.unboundedPreceding, 0))
                    .cast("double") / F.row_number().over(w),
                    6).alias("avg_meter"))
            .orderBy("event_type", "step"))


def rec_metric_pairs(spark, sf_dir: str):
    """Pair doc i with doc i+1; metric row over all pairs."""
    from pyspark.sql import functions as F

    df = (spark.read.parquet(f"{sf_dir}/documents.parquet")
          .select(F.col("doc_id").cast("long").alias("doc_id"), "text"))
    norm = lambda c: F.regexp_replace(F.lower(c), "[^0-9a-z]", "")
    a = df.select("doc_id", norm(F.col("text")).alias("pred"))
    b = df.select((F.col("doc_id") - 1).alias("doc_id"),
                  norm(F.col("text")).alias("target"))
    pairs = a.join(b, "doc_id")
    # greatest(..., 1): rapidfuzz normalized_distance("", "") is 0.0,
    # not 0/0 (which would be NULL here and NaN in DuckDB)
    dist = (F.levenshtein("pred", "target").cast("double")
            / F.greatest(F.length("pred"), F.length("target"), F.lit(1)))
    return pairs.agg(
        F.sum((F.col("pred") == F.col("target")).cast("long"))
        .alias("correct_num"),
        F.count("*").cast("long").alias("all_num"),
        F.round(F.avg((F.col("pred") == F.col("target")).cast("double")), 6)
        .alias("acc"),
        F.round(1 - F.avg(dist), 6).alias("norm_edit_dis"),
    )


def cls_cnt_metric_pairs(spark, sf_dir: str):
    """ClsMetric / CNTMetric exact-match accuracy
    (``toddleocr/metrics/cls.py:4-29``, ``metrics/rec.py:62-87``): the
    same partial (correct, all) accumulate + final acc shape as
    RecMetric, without the edit-distance term. Applied to
    consecutive-doc label pairs so a DuckDB oracle verifies it."""
    from pyspark.sql import functions as F

    df = (spark.read.parquet(f"{sf_dir}/documents.parquet")
          .select(F.col("doc_id").cast("long").alias("doc_id"), "lang"))
    a = df.select("doc_id", F.col("lang").alias("pred"))
    b = df.select((F.col("doc_id") - 1).alias("doc_id"),
                  F.col("lang").alias("label"))
    pairs = a.join(b, "doc_id")
    match = (F.col("pred") == F.col("label")).cast("long")
    return pairs.agg(
        F.sum(match).alias("correct_num"),
        F.count("*").cast("long").alias("all_num"),
        F.round(F.avg(match.cast("double")), 6).alias("acc"),
    )


def _text_gt(media_df):
    """Ground-truth (media_ref, box_idx, gt_text) rows for boxes that
    live in text_block layout regions (the ones the pipeline emits as
    text fragments)."""
    from pyspark.sql import functions as F

    return (media_df
            .select("media_ref", "gt_texts",
                    F.explode("gt_text_idx").alias("box_idx"))
            .select("media_ref", "box_idx",
                    F.element_at("gt_texts", F.col("box_idx") + 1)
                    .alias("gt_text")))


def corpus_rec_metric(media_df, fragments_df):
    """Recognized text vs generator ground truth, joined on
    (media_ref, box_idx). acc should be 1.0 when the pipeline is
    bit-exact."""
    from pyspark.sql import functions as F

    gt = _text_gt(media_df)
    pred = (fragments_df
            .where(F.col("out_kind") == "text_block")
            .select("media_ref", "box_idx",
                    F.col("out_text").alias("pred_text")))
    joined = gt.join(pred, ["media_ref", "box_idx"], "left")
    match = (F.col("pred_text") == F.col("gt_text")).cast("long")
    # greatest(..., 1): see rec_metric_pairs — empty-vs-empty is
    # distance 0.0 (rapidfuzz), never 0/0
    dist = (F.levenshtein(F.coalesce("pred_text", F.lit("")), "gt_text")
            .cast("double")
            / F.greatest(F.length(F.coalesce("pred_text", F.lit(""))),
                         F.length("gt_text"), F.lit(1)))
    return joined.agg(
        F.sum(F.coalesce(match, F.lit(0))).alias("correct_num"),
        F.count("*").cast("long").alias("all_num"),
        F.round(F.avg(F.coalesce(match, F.lit(0)).cast("double")), 6)
        .alias("acc"),
        F.round(1 - F.avg(dist), 6).alias("norm_edit_dis"),
    )


def corpus_det_metric(media_df, fragments_df):
    """Detection precision/recall/hmean: per-media matched counts
    (exact text equality as the match test in fixture world), then the
    combine_results-style global finalize."""
    from pyspark.sql import functions as F

    gt = _text_gt(media_df)
    pred = (fragments_df
            .where(F.col("out_kind") == "text_block")
            .select("media_ref", "box_idx",
                    F.col("out_text").alias("pred_text")))
    per_media = (gt.join(pred, ["media_ref", "box_idx"], "full")
                 .groupBy("media_ref")
                 .agg(F.sum(F.col("gt_text").isNotNull().cast("long"))
                      .alias("gt_care"),
                      F.sum(F.col("pred_text").isNotNull().cast("long"))
                      .alias("det_care"),
                      F.sum(((F.col("pred_text") == F.col("gt_text"))
                             .cast("long"))).alias("matched")))
    totals = per_media.agg(F.sum("gt_care").alias("g"),
                           F.sum("det_care").alias("d"),
                           F.sum("matched").alias("m"))
    return totals.select(
        F.col("g").cast("long").alias("gt_total"),
        F.col("d").cast("long").alias("det_total"),
        F.col("m").cast("long").alias("matched_total"),
        F.round(F.when(F.col("d") > 0, F.col("m") / F.col("d"))
                .otherwise(0.0), 6).alias("precision"),
        F.round(F.when(F.col("g") > 0, F.col("m") / F.col("g"))
                .otherwise(0.0), 6).alias("recall"),
        F.round(F.when((F.col("d") + F.col("g")) > 0,
                       2 * F.col("m") / (F.col("d") + F.col("g")))
                .otherwise(0.0), 6).alias("hmean"),
    )


def det_iou_metric(media):
    """DetectionIoUEvaluator as a distributed job (the reference's
    valid() evaluation flow, ``toddleocr/utils/valid.py:10-82``):
    per-media greedy IoU matching in a mapInPandas stage emitting
    (matched, gt_care, det_care) partials, then a global agg +
    combine_results finalize — partial/final exactly as DetMetric
    (``toddleocr/metrics/det.py:6-53``).

    ``media``: DataFrame or media-store path (fast pointer-passing
    read, see functions/udfs.map_media_store)."""
    from pyspark.sql import functions as F

    def eval_batches(batches):
        import numpy as np
        import pandas as pd

        from paddleocr_spark.corpus import dequantize_map
        from paddleocr_spark.kernels.db import db_postprocess
        from paddleocr_spark.kernels.eval_det_iou import evaluate_image

        for pdf in batches:
            out = {"media_ref": [], "matched": [], "gt_care": [],
                   "det_care": []}
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                pm = dequantize_map(d["det_map"], int(d["det_h"]),
                                    int(d["det_w"]))
                pred = db_postprocess(pm, [float(x) for x in d["shape_list"]])
                gt = [{"points": np.asarray(b, dtype=np.float64).reshape(4, 2)}
                      for b in d["gt_boxes"]]
                m, g, dc = evaluate_image(
                    gt, [{"points": p} for p in pred])
                out["media_ref"].append(d["media_ref"])
                out["matched"].append(m)
                out["gt_care"].append(g)
                out["det_care"].append(dc)
            yield pd.DataFrame(out)

    eval_cols = ["media_ref", "det_map", "det_h", "det_w", "shape_list",
                 "gt_boxes"]
    eval_schema = ("media_ref string, matched long, gt_care long, "
                   "det_care long")
    partials = _map_media(media, eval_batches, eval_schema, eval_cols)
    totals = partials.agg(F.sum("matched").alias("m"),
                          F.sum("gt_care").alias("g"),
                          F.sum("det_care").alias("d"))
    return totals.select(
        F.col("m").cast("long").alias("matched_total"),
        F.col("g").cast("long").alias("gt_total"),
        F.col("d").cast("long").alias("det_total"),
        F.round(F.when(F.col("d") > 0, F.col("m") / F.col("d"))
                .otherwise(0.0), 6).alias("precision"),
        F.round(F.when(F.col("g") > 0, F.col("m") / F.col("g"))
                .otherwise(0.0), 6).alias("recall"),
        F.round(F.when((F.col("d") + F.col("g")) > 0,
                       2 * F.col("m") / (F.col("d") + F.col("g")))
                .otherwise(0.0), 6).alias("hmean"),
    )


def _map_media(media, batch_fn, schema, columns):
    """DataFrame-or-store-path dispatch shared by the mapInPandas
    metric jobs (same pattern as det_iou_metric)."""
    if isinstance(media, str):
        from pyspark.sql import SparkSession

        from paddleocr_spark.functions.udfs import map_media_store

        return map_media_store(SparkSession.active(), media, batch_fn,
                               schema, columns=columns)
    return media.select(*columns).mapInPandas(batch_fn, schema=schema)


def sr_metric(media):
    """SRMetric (``toddleocr/metrics/sr.py:87-150``): mean PSNR + SSIM
    between image pairs, as per-media partials + a global mean. The
    pair is the stored det map vs a deterministic 4-bit-requantized
    degradation of it (the fixture stand-in for SR input/output)."""
    from pyspark.sql import functions as F

    def eval_batches(batches):
        import numpy as np
        import pandas as pd

        from paddleocr_spark.corpus import dequantize_map
        from paddleocr_spark.kernels.sr import psnr, ssim

        for pdf in batches:
            out = {"media_ref": [], "psnr": [], "ssim": []}
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                img = dequantize_map(d["det_map"], int(d["det_h"]),
                                     int(d["det_w"]))
                degraded = (np.round(img * 15.0) / 15.0).astype(np.float32)
                out["media_ref"].append(d["media_ref"])
                out["psnr"].append(psnr(img, degraded))
                out["ssim"].append(ssim(img, degraded))
            yield pd.DataFrame(out)

    partials = _map_media(media, eval_batches,
                          "media_ref string, psnr double, ssim double",
                          ["media_ref", "det_map", "det_h", "det_w"])
    return partials.agg(
        F.count("*").cast("long").alias("n_media"),
        F.round(F.avg("psnr"), 6).alias("mean_psnr"),
        F.round(F.avg("ssim"), 6).alias("mean_ssim"))


def can_metric(media):
    """CANMetric (``toddleocr/metrics/rec.py:90-148``): difflib
    SequenceMatcher word scores + exact-match exp rate, accumulated as
    length-weighted partials. Pairs are (gt text, RAW un-rotated
    decode) per text-region box, so rotated boxes keep the metric away
    from the trivial 1.0."""
    from pyspark.sql import functions as F

    def eval_batches(batches):
        from difflib import SequenceMatcher

        import pandas as pd

        from paddleocr_spark.corpus import CHARSET, dequantize_logits
        from paddleocr_spark.kernels.ctc import ctc_decode

        for pdf in batches:
            out = {"media_ref": [], "word_right": [], "exp_right": [],
                   "n": []}
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                idxs = [int(i) for i in d["gt_text_idx"]]
                if not idxs:
                    continue
                scores = []
                for i in idxs:
                    gt = d["gt_texts"][i]
                    raw, _ = ctc_decode(
                        dequantize_logits(d["rec_logits"][i],
                                          int(d["rec_t"]),
                                          int(d["rec_c"])), CHARSET)
                    m = SequenceMatcher(None, gt, raw,
                                        autojunk=False).ratio()
                    scores.append(m * (len(gt) + len(raw)) / len(gt) / 2)
                n = len(scores)
                word_rate = sum(scores) / n
                exp_rate = sum(1 for s in scores if s == 1) / n
                out["media_ref"].append(d["media_ref"])
                out["word_right"].append(word_rate * n)
                out["exp_right"].append(exp_rate * n)
                out["n"].append(n)
            yield pd.DataFrame(out)

    partials = _map_media(
        media, eval_batches,
        "media_ref string, word_right double, exp_right double, n long",
        ["media_ref", "gt_texts", "gt_text_idx", "rec_logits",
         "rec_t", "rec_c"])
    return partials.agg(
        F.sum("n").cast("long").alias("n_words"),
        F.round(F.sum("word_right") / F.sum("n"), 6).alias("word_rate"),
        F.round(F.sum("exp_right") / F.sum("n"), 6).alias("exp_rate"))


def e2e_metric(media):
    """E2EMetric (``toddleocr/metrics/e2e.py:7-66`` +
    ``_det_eval.get_score_A``): end-to-end text spotting — a predicted
    box counts only if it IoU>0.5-matches a gt box AND its recognized
    text equals the gt text (normalized). Predictions use the RAW
    un-rotated decode, so rotated boxes miss — precision/recall/f sit
    strictly below the det-only metric. Greedy per-media matching +
    combine_results finalize."""
    from pyspark.sql import functions as F

    def eval_batches(batches):
        import numpy as np
        import pandas as pd

        from paddleocr_spark.corpus import CHARSET, dequantize_logits, \
            dequantize_map
        from paddleocr_spark.kernels.ctc import ctc_decode
        from paddleocr_spark.kernels.db import db_postprocess
        from paddleocr_spark.kernels.eval_det_iou import poly_iou
        from paddleocr_spark.kernels.reading_order import sorted_boxes

        def norm(t):
            return "".join(c for c in t.lower() if c.isalnum())

        for pdf in batches:
            out = {"media_ref": [], "matched": [], "gt_care": [],
                   "det_care": []}
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                pm = dequantize_map(d["det_map"], int(d["det_h"]),
                                    int(d["det_w"]))
                # rec_logits are stored in sorted_boxes order — sort
                # pred_boxes the same way or texts[pi] pairs with a
                # DIFFERENT box (same fix as golden.py's e2e twin)
                pred_boxes = sorted_boxes(db_postprocess(
                    pm, [float(x) for x in d["shape_list"]]))
                texts = []
                for lg in d["rec_logits"]:
                    t, _ = ctc_decode(
                        dequantize_logits(lg, int(d["rec_t"]),
                                          int(d["rec_c"])), CHARSET)
                    texts.append(t)
                gt = [(np.asarray(b, dtype=np.float64).reshape(4, 2),
                       norm(d["gt_texts"][i]))
                      for i, b in enumerate(d["gt_boxes"])]
                used = set()
                matched = 0
                for pi, pb in enumerate(pred_boxes):
                    for gi, (gb, gtext) in enumerate(gt):
                        if gi in used:
                            continue
                        if poly_iou(np.asarray(pb, dtype=np.float64),
                                    gb) > 0.5 \
                                and norm(texts[pi]) == gtext:
                            used.add(gi)
                            matched += 1
                            break
                out["media_ref"].append(d["media_ref"])
                out["matched"].append(matched)
                out["gt_care"].append(len(gt))
                out["det_care"].append(len(pred_boxes))
            yield pd.DataFrame(out)

    partials = _map_media(
        media, eval_batches,
        "media_ref string, matched long, gt_care long, det_care long",
        ["media_ref", "det_map", "det_h", "det_w", "shape_list",
         "gt_boxes", "gt_texts", "rec_logits", "rec_t", "rec_c"])
    totals = partials.agg(F.sum("matched").alias("m"),
                          F.sum("gt_care").alias("g"),
                          F.sum("det_care").alias("d"))
    return totals.select(
        F.col("m").cast("long").alias("matched_total"),
        F.col("g").cast("long").alias("gt_total"),
        F.col("d").cast("long").alias("det_total"),
        F.round(F.when(F.col("d") > 0, F.col("m") / F.col("d"))
                .otherwise(0.0), 6).alias("precision"),
        F.round(F.when(F.col("g") > 0, F.col("m") / F.col("g"))
                .otherwise(0.0), 6).alias("recall"),
        F.round(F.when((F.col("d") + F.col("g")) > 0,
                       2 * F.col("m") / (F.col("d") + F.col("g")))
                .otherwise(0.0), 6).alias("f_score_e2e"))


def ct_metric(media):
    """CTMetric (``toddleocr/metrics/ct.py:6-28``): DetEval-protocol
    scoring of detections — per-media sigma/tau coverage tables +
    one-to-one/one-to-many/many-to-one matching
    (``metrics/_det_eval.py:293-834``, rec_flag=False), distributed as
    mapInPandas partials (recall_accum, precision_accum, n_gt, n_det)
    + a global sum/ratio finalize. Unlike the greedy IoU metric, this
    credits split (one gt → many dets) and merged (many gts → one det)
    detections at the fsc_k=0.8 discount."""
    from pyspark.sql import functions as F

    def eval_batches(batches):
        import numpy as np
        import pandas as pd

        from paddleocr_spark.corpus import dequantize_map
        from paddleocr_spark.kernels.db import db_postprocess
        from paddleocr_spark.kernels.det_eval import (
            deteval_sample,
            sigma_tau_tables,
        )

        for pdf in batches:
            out = {"media_ref": [], "recall_accum": [],
                   "precision_accum": [], "n_gt": [], "n_det": []}
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                pm = dequantize_map(d["det_map"], int(d["det_h"]),
                                    int(d["det_w"]))
                pred = db_postprocess(pm, [float(x) for x in d["shape_list"]])
                gt_polys = [np.asarray(b, dtype=np.float64).reshape(4, 2)
                            for b in d["gt_boxes"]]
                sigma, tau = sigma_tau_tables(gt_polys, list(d["gt_texts"]),
                                              pred)
                r, p, ng, nd = deteval_sample(sigma, tau)
                out["media_ref"].append(d["media_ref"])
                out["recall_accum"].append(r)
                out["precision_accum"].append(p)
                out["n_gt"].append(ng)
                out["n_det"].append(nd)
            yield pd.DataFrame(out)

    partials = _map_media(
        media, eval_batches,
        "media_ref string, recall_accum double, precision_accum double, "
        "n_gt long, n_det long",
        ["media_ref", "det_map", "det_h", "det_w", "shape_list",
         "gt_boxes", "gt_texts"])
    totals = partials.agg(F.sum("recall_accum").alias("ra"),
                          F.sum("precision_accum").alias("pa"),
                          F.sum("n_gt").alias("g"),
                          F.sum("n_det").alias("d"))
    r = F.when(F.col("g") > 0, F.col("ra") / F.col("g")).otherwise(0.0)
    p = F.when(F.col("d") > 0, F.col("pa") / F.col("d")).otherwise(0.0)
    return totals.select(
        F.col("g").cast("long").alias("total_num_gt"),
        F.col("d").cast("long").alias("total_num_det"),
        F.round(r, 6).alias("recall"),
        F.round(p, 6).alias("precision"),
        F.round(F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(0.0),
                6).alias("f_score"))


def table_structure_metric(media_df, fragments_df):
    """TableStructureMetric (``toddleocr/metrics/table.py:6-56``):
    exact-match accuracy of the decoded structure-token string against
    ground truth, over table media."""
    from pyspark.sql import functions as F

    gt = (media_df.where(F.col("gt_structure") != "")
          .select("media_ref", "gt_structure"))
    pred = (fragments_df.where(F.col("out_kind") == "table")
            .select("media_ref", F.col("aux").alias("pred_structure")))
    joined = gt.join(pred, "media_ref", "left")
    match = (F.col("pred_structure") == F.col("gt_structure")).cast("long")
    return joined.agg(
        F.sum(F.coalesce(match, F.lit(0))).alias("correct_num"),
        F.count("*").cast("long").alias("all_num"),
        F.round(F.avg(F.coalesce(match, F.lit(0)).cast("double")), 6)
        .alias("acc"),
    )
