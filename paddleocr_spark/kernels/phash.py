"""64-bit perceptual image hash (pHash) — DCT low-frequency signature.

The multimodal twin of the text fingerprints in ``operators/text.py``:
a training-data pipeline dedups IMAGE payloads by perceptual identity
(re-encoded, requantized, slightly-degraded copies of the same
picture), which exact byte hashing cannot see. Classic pHash
construction (Zauner, "Implementation and Benchmarking of Perceptual
Image Hash Functions", 2010 — the imagehash/pHash.org algorithm):

1. grayscale image -> 32x32 bilinear resample (pixel-center mapping,
   ``(dst+0.5)*src/32-0.5``, edge-clamped),
2. orthonormal 2D DCT-II (exact matrix form, no FFT),
3. keep the top-left 8x8 low-frequency block,
4. threshold each coefficient at the block median -> 64 bits,
   row-major, MSB first; returned as a SIGNED int64 (two's
   complement) so Spark BIGINT and DuckDB BIGINT carry it unchanged
   and ``bit_count(xor(a, b))`` is the hamming distance in BOTH
   engines (verified identical including negative values).

Determinism: pure float64 matrix arithmetic with fixed shapes — the
sequential golden path and the distributed decode share it bit-exact.
The reference has no image-dedup stage; this extends the engine the
way SURVEY §2's "beyond the reference" charter calls for.
"""

from __future__ import annotations

import numpy as np

__all__ = ["phash64", "hamming64", "PHASH_SIZE", "PHASH_DCT_KEEP"]

PHASH_SIZE = 32
PHASH_DCT_KEEP = 8


def _dct_matrix(n: int) -> np.ndarray:
    idx = np.arange(n)
    mat = np.sqrt(2.0 / n) * np.cos(
        np.pi * (2 * idx[None, :] + 1) * idx[:, None] / (2 * n))
    mat[0] *= 1.0 / np.sqrt(2.0)
    return mat


_D = _dct_matrix(PHASH_SIZE)


def _resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape
    ys = (np.arange(size) + 0.5) * h / size - 0.5
    xs = (np.arange(size) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def phash64(img: np.ndarray) -> int:
    """(H, W) grayscale array (any numeric dtype) -> signed-int64
    perceptual hash."""
    small = _resize_bilinear(np.asarray(img, dtype=np.float64),
                             PHASH_SIZE)
    freq = _D @ small @ _D.T
    block = freq[:PHASH_DCT_KEEP, :PHASH_DCT_KEEP].flatten()
    med = float(np.median(block))
    val = 0
    for coeff in block:
        val = (val << 1) | int(coeff > med)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
