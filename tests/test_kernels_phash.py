"""Perceptual image hash (kernels/phash.py) + the LSH completeness
invariant behind operators/multimodal.phash_near_dups."""

import numpy as np
import pytest

from paddleocr_spark.kernels.phash import (
    PHASH_DCT_KEEP,
    PHASH_SIZE,
    _resize_bilinear,
    hamming64,
    phash64,
)


def _img(seed, h=64, w=96):
    rng = np.random.default_rng(seed)
    base = rng.random((h // 8, w // 8))
    return np.kron(base, np.ones((8, 8)))  # blocky "content"


class TestPhash:
    def test_deterministic_and_signed_int64(self):
        img = _img(1)
        a, b = phash64(img), phash64(img)
        assert a == b
        assert -(1 << 63) <= a < (1 << 63)

    def test_invariant_to_mild_requantization(self):
        for s in range(8):
            img = _img(s)
            degraded = np.round(img * 15.0) / 15.0
            assert hamming64(phash64(img), phash64(degraded)) <= 6

    def test_distinct_content_far_apart(self):
        hs = [phash64(_img(s)) for s in range(12)]
        dists = [hamming64(a, b) for i, a in enumerate(hs)
                 for b in hs[i + 1:]]
        assert min(dists) > 8

    def test_scale_invariance(self):
        # the same content at 2x resolution hashes near-identically
        img = _img(4, 64, 96)
        big = np.kron(img, np.ones((2, 2)))
        assert hamming64(phash64(img), phash64(big)) <= 4

    def test_brightness_shift_invariance(self):
        # DCT AC coefficients ignore a constant offset entirely
        img = _img(7)
        assert phash64(img) == phash64(img + 0.2)

    def test_resize_constant_exact(self):
        out = _resize_bilinear(np.full((17, 23), 0.625), PHASH_SIZE)
        assert out.shape == (PHASH_SIZE, PHASH_SIZE)
        assert np.allclose(out, 0.625, atol=1e-12)

    def test_block_lsh_pigeonhole(self):
        # any pair with hamming <= 3 shares >= 1 of the 4 16-bit
        # blocks — the completeness invariant the near-dup join uses
        rng = np.random.default_rng(0)
        for _ in range(200):
            a = int(rng.integers(0, 1 << 63))
            flips = rng.choice(64, size=int(rng.integers(0, 4)),
                               replace=False)
            b = a
            for f in flips:
                b ^= 1 << int(f)
            blocks_a = [(a >> (16 * i)) & 0xFFFF for i in range(4)]
            blocks_b = [(b >> (16 * i)) & 0xFFFF for i in range(4)]
            assert any(x == y for x, y in zip(blocks_a, blocks_b))

    def test_median_split_balance(self):
        # by construction ~half the 64 bits are set (median threshold)
        n = PHASH_DCT_KEEP * PHASH_DCT_KEEP
        for s in range(5):
            bits = bin(phash64(_img(s)) & ((1 << 64) - 1)).count("1")
            assert n // 4 <= bits <= 3 * n // 4
