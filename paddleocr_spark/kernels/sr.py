"""Super-resolution quality metrics — pure-NumPy re-creation of the
reference's SSIM/PSNR (``toddleocr/metrics/sr.py:14-108``, itself the
FudanOCR text-gestalt implementation):

- gaussian 11x1.5 window, separable conv2d with zero padding (the
  reference's F.conv2d(padding=window_size//2)),
- ssim_map formula with C1=0.01², C2=0.03², mean-reduced,
- psnr = 20*log10(255/sqrt(mse)) on [0,1]-scaled inputs.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["gaussian_window", "ssim", "psnr"]


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array([math.exp(-((x - window_size // 2) ** 2)
                           / (2.0 * sigma ** 2))
                  for x in range(window_size)], dtype=np.float64)
    return g / g.sum()


def _conv_same_1d(img: np.ndarray, kernel: np.ndarray, axis: int) -> np.ndarray:
    """Zero-padded 'same' 1-D convolution along an axis (symmetric
    kernel, so convolution == correlation)."""
    pad = len(kernel) // 2
    if axis == 0:
        padded = np.pad(img, ((pad, pad), (0, 0)))
        out = np.zeros_like(img, dtype=np.float64)
        for k, w in enumerate(kernel):
            out += w * padded[k:k + img.shape[0], :]
        return out
    padded = np.pad(img, ((0, 0), (pad, pad)))
    out = np.zeros_like(img, dtype=np.float64)
    for k, w in enumerate(kernel):
        out += w * padded[:, k:k + img.shape[1]]
    return out


def _filter2d(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    return _conv_same_1d(_conv_same_1d(img.astype(np.float64),
                                       window, 0), window, 1)


def ssim(img1: np.ndarray, img2: np.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> float:
    """Mean SSIM of two (H, W) images in [0, 1] (``sr.py:37-67``)."""
    w = gaussian_window(window_size, sigma)
    mu1 = _filter2d(img1, w)
    mu2 = _filter2d(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, w) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, w) - mu2_sq
    sigma12 = _filter2d(img1 * img2, w) - mu1_mu2
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)
                / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return float(ssim_map.mean())


def psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """``calculate_psnr`` (``sr.py:103-107``): inputs in [0, 1]."""
    mse = float(((img1 * 255.0 - img2 * 255.0) ** 2).mean())
    if mse == 0:
        return float("inf")
    return 20.0 * math.log10(255.0 / math.sqrt(mse))
