"""DetEval-protocol detection scoring — the CentripetalText metric's
engine (``CTMetric``, ``toddleocr/metrics/ct.py:6-28``, delegating to
``metrics/_det_eval.py``: ``get_score_C`` :293-405 builds per-sample
sigma/tau coverage tables; ``combine_results`` :407-834 runs the
one-to-one / one-to-many / many-to-one matching with tr=0.7, tp=0.6,
fsc_k=0.8, k=2 and finalizes precision/recall/f from GLOBAL
accumulators).

The split mirrors the reference exactly and is what makes the metric
distributable: the table build and the 3-pass matching are independent
per image (the matching never looks across samples), so each media row
reduces to four scalars (recall_accum, precision_accum, num_gt,
num_det) that a Spark agg sums; p = Σprec/Σdet, r = Σrec/Σgt.

Polygon areas/intersections use the repo's convex-polygon kernels
(``eval_det_iou``) in place of the reference's Polygon3 dependency —
valid here because every fixture/gt box is a convex quad.
"""

from __future__ import annotations

import numpy as np

from .eval_det_iou import poly_intersection_area
from .geometry import polygon_area

__all__ = ["sigma_tau_tables", "deteval_sample", "deteval_combine",
           "TR", "TP", "FSC_K", "K"]

TR = 0.7     # sigma (gt-coverage) qualification threshold
TP = 0.6     # tau (det-precision) qualification threshold
FSC_K = 0.8  # fragmentation penalty for split/merge matches
K = 2        # minimum overlap count to consider one-to-many/many-to-one


def _area(p: np.ndarray) -> float:
    return abs(polygon_area(np.asarray(p, dtype=np.float64)))


def sigma_tau_tables(gt_polys, gt_texts, pred_polys):
    """``get_score_C`` (:293-405): filter detections overlapping
    don't-care ("###") gt regions by inter/det_area > 0.5, drop the
    "###" gts, then sigma[g,d] = inter/gt_area, tau[g,d] =
    inter/det_area. Returns (sigma, tau) with shape (n_gt, n_det)."""
    dets = [np.asarray(p, dtype=np.float64) for p in pred_polys]
    gts = [(np.asarray(p, dtype=np.float64), t)
           for p, t in zip(gt_polys, gt_texts)]

    # detection_filtering (:318-341): DC regions eat overlapping dets
    for gp, txt in gts:
        if txt != "###" or len(gp) <= 1:
            continue
        kept = []
        for d in dets:
            da = _area(d)
            iou_d = poly_intersection_area(d, gp) / da if da > 0 else 0.0
            if not iou_d > 0.5:
                kept.append(d)
        dets = kept

    cares = [(gp, txt) for gp, txt in gts if txt != "###"]
    sigma = np.zeros((len(cares), len(dets)))
    tau = np.zeros((len(cares), len(dets)))
    for gi, (gp, _) in enumerate(cares):
        ga = _area(gp)
        for di, d in enumerate(dets):
            inter = poly_intersection_area(d, gp)
            da = _area(d)
            sigma[gi, di] = inter / ga if ga > 0 else 0.0
            tau[gi, di] = inter / da if da > 0 else 0.0
    return sigma, tau


def deteval_sample(sigma: np.ndarray, tau: np.ndarray):
    """The per-sample 3-pass matching of ``combine_results``
    (:452-701, rec_flag=False): returns (recall_accum, precision_accum,
    num_gt, num_det) — the sample's contribution to the global sums."""
    sigma = np.asarray(sigma, dtype=np.float64)
    tau = np.asarray(tau, dtype=np.float64)
    num_gt, num_det = sigma.shape
    gt_flag = np.zeros(num_gt)
    det_flag = np.zeros(num_det)
    rec = prec = 0.0

    # pass 1 — one_to_one (:452-502): exactly one qualified candidate
    # in both directions
    for g in range(num_gt):
        g_sig = np.where(sigma[g, :] > TR)[0]
        g_tau = np.where(tau[g, :] > TP)[0]
        d_sig = np.where(sigma[:, g_sig] > TR)[0]
        d_tau = np.where(tau[:, g_tau] > TP)[0]
        if (len(g_sig) == 1 and len(g_tau) == 1
                and len(d_sig) == 1 and len(d_tau) == 1):
            rec += 1.0
            prec += 1.0
            gt_flag[g] = 1
            det_flag[g_sig] = 1

    # pass 2 — one_to_many (:504-593): one gt split across >=K dets
    for g in range(num_gt):
        if gt_flag[g] > 0:
            continue
        if len(np.where(sigma[g, :] > 0)[0]) < K:
            continue
        q = np.where((tau[g, :] >= TP) & (det_flag == 0))[0]
        if len(q) == 1:
            if tau[g, q[0]] >= TP and sigma[g, q[0]] >= TR:
                rec += 1.0
                prec += 1.0
                gt_flag[g] = 1
                det_flag[q] = 1
        elif np.sum(sigma[g, q]) >= TR:
            gt_flag[g] = 1
            det_flag[q] = 1
            rec += FSC_K
            prec += len(q) * FSC_K

    # pass 3 — many_to_one (:595-701): >=K gts merged into one det
    for d in range(num_det):
        if det_flag[d] > 0:
            continue
        if len(np.where(tau[:, d] > 0)[0]) < K:
            continue
        q = np.where((sigma[:, d] >= TP) & (gt_flag == 0))[0]
        if len(q) == 1:
            if tau[q[0], d] >= TP and sigma[q[0], d] >= TR:
                rec += 1.0
                prec += 1.0
                gt_flag[q] = 1
                det_flag[d] = 1
        elif np.sum(tau[q, d]) >= TP:
            det_flag[d] = 1
            gt_flag[q] = 1
            rec += len(q) * FSC_K
            prec += FSC_K

    return rec, prec, num_gt, num_det


def deteval_combine(partials):
    """Finalize (:786-801): p/r/f from the summed accumulators."""
    rec = sum(p[0] for p in partials)
    prec = sum(p[1] for p in partials)
    n_gt = sum(p[2] for p in partials)
    n_det = sum(p[3] for p in partials)
    r = rec / n_gt if n_gt else 0
    p = prec / n_det if n_det else 0
    f = 2 * p * r / (p + r) if (p + r) else 0
    return {"recall": r, "precision": p, "f_score": f,
            "total_num_gt": n_gt, "total_num_det": n_det}
