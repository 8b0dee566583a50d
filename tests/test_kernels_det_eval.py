"""DetEval/CT-metric kernel (kernels/det_eval.py) vs hand-computed
expectations for each matching regime of the reference protocol
(toddleocr/metrics/_det_eval.py:293-834, rec_flag=False)."""

import numpy as np

from paddleocr_spark.kernels.det_eval import (
    FSC_K,
    deteval_combine,
    deteval_sample,
    sigma_tau_tables,
)


def rect(x1, y1, x2, y2):
    return np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], float)


def test_one_to_one_perfect():
    gts = [rect(0, 0, 10, 10), rect(20, 0, 30, 10)]
    sigma, tau = sigma_tau_tables(gts, ["a", "b"], [g.copy() for g in gts])
    assert np.allclose(np.diag(sigma), 1.0) and np.allclose(np.diag(tau), 1.0)
    r, p, ng, nd = deteval_sample(sigma, tau)
    assert (r, p, ng, nd) == (2.0, 2.0, 2, 2)
    out = deteval_combine([(r, p, ng, nd)])
    assert out["recall"] == out["precision"] == out["f_score"] == 1.0


def test_one_to_many_split_detection():
    # one gt split into two dets, each half entirely inside the gt:
    # tau = 1.0 each (>= tp), sigma = 0.5 each, sum = 1.0 >= tr
    gt = [rect(0, 0, 20, 10)]
    dets = [rect(0, 0, 10, 10), rect(10, 0, 20, 10)]
    sigma, tau = sigma_tau_tables(gt, ["x"], dets)
    r, p, ng, nd = deteval_sample(sigma, tau)
    assert r == FSC_K and p == 2 * FSC_K
    assert (ng, nd) == (1, 2)
    out = deteval_combine([(r, p, ng, nd)])
    assert out["recall"] == FSC_K and out["precision"] == FSC_K


def test_many_to_one_merged_detection():
    # two gts covered by one det: sigma = 1.0 each (>= tp),
    # tau = 0.5 each, sum = 1.0 >= tp
    gts = [rect(0, 0, 10, 10), rect(10, 0, 20, 10)]
    det = [rect(0, 0, 20, 10)]
    sigma, tau = sigma_tau_tables(gts, ["x", "y"], det)
    r, p, ng, nd = deteval_sample(sigma, tau)
    assert r == 2 * FSC_K and p == FSC_K
    assert (ng, nd) == (2, 1)


def test_dont_care_region_eats_overlapping_det():
    # det fully inside a "###" gt is filtered out; the care gt keeps
    # its own perfect detection
    gts = [rect(0, 0, 10, 10), rect(50, 50, 60, 60)]
    texts = ["###", "keep"]
    dets = [rect(1, 1, 9, 9), rect(50, 50, 60, 60)]
    sigma, tau = sigma_tau_tables(gts, texts, dets)
    assert sigma.shape == (1, 1)  # DC gt dropped, DC-covered det dropped
    r, p, ng, nd = deteval_sample(sigma, tau)
    assert (r, p, ng, nd) == (1.0, 1.0, 1, 1)


def test_no_overlap_scores_zero():
    sigma, tau = sigma_tau_tables([rect(0, 0, 5, 5)], ["x"],
                                  [rect(50, 50, 60, 60)])
    r, p, ng, nd = deteval_sample(sigma, tau)
    assert (r, p) == (0.0, 0.0)
    out = deteval_combine([(r, p, ng, nd)])
    assert out["f_score"] == 0


def test_combine_sums_across_samples():
    s1 = deteval_sample(*sigma_tau_tables(
        [rect(0, 0, 10, 10)], ["a"], [rect(0, 0, 10, 10)]))
    s2 = deteval_sample(*sigma_tau_tables(
        [rect(0, 0, 5, 5)], ["b"], [rect(50, 50, 60, 60)]))
    out = deteval_combine([s1, s2])
    assert out["total_num_gt"] == 2 and out["total_num_det"] == 2
    assert out["recall"] == 0.5 and out["precision"] == 0.5


def test_partial_overlap_below_thresholds_unmatched():
    # 60% overlap in one direction only: sigma = 0.6 < tr(0.7) and a
    # single candidate, so nothing matches in any pass
    gt = [rect(0, 0, 10, 10)]
    det = [rect(4, 0, 14, 10)]
    sigma, tau = sigma_tau_tables(gt, ["x"], det)
    assert np.isclose(sigma[0, 0], 0.6) and np.isclose(tau[0, 0], 0.6)
    r, p, _, _ = deteval_sample(sigma, tau)
    assert (r, p) == (0.0, 0.0)
