"""Eval-protocol metric tests (``soar_tpu/train/evaluate.py``).

The reference's test_step computes SSIM with skimage defaults
(``gaussian_surfel_mvdream.py:559``); scikit-image is not installed in this
environment, so ``skimage_ssim`` is pinned against an independent
brute-force windowed implementation of the same published formula (7x7
uniform window, sample covariance, border crop).
"""

import numpy as np

from soar_tpu.train.evaluate import skimage_ssim


def _brute_force_ssim(x, y, win=7):
    """Literal per-window double loop over VALID windows only (equivalent
    to filtering then cropping the pad ring)."""
    K1, K2 = 0.01, 0.03
    C1, C2 = K1**2, K2**2
    NP = win * win
    H, W, C = x.shape
    vals = []
    for c in range(C):
        maps = []
        for i in range(H - win + 1):
            for j in range(W - win + 1):
                wx = x[i : i + win, j : j + win, c].astype(np.float64)
                wy = y[i : i + win, j : j + win, c].astype(np.float64)
                ux, uy = wx.mean(), wy.mean()
                vx = ((wx - ux) ** 2).sum() / (NP - 1)
                vy = ((wy - uy) ** 2).sum() / (NP - 1)
                vxy = ((wx - ux) * (wy - uy)).sum() / (NP - 1)
                maps.append(
                    ((2 * ux * uy + C1) * (2 * vxy + C2))
                    / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
                )
        vals.append(np.mean(maps))
    return float(np.mean(vals))


def test_skimage_ssim_identity():
    rng = np.random.RandomState(0)
    img = rng.rand(24, 20, 3).astype(np.float32)
    assert abs(skimage_ssim(img, img) - 1.0) < 1e-9


def test_skimage_ssim_matches_bruteforce():
    rng = np.random.RandomState(1)
    x = rng.rand(20, 18, 3).astype(np.float32)
    y = np.clip(x + rng.randn(20, 18, 3).astype(np.float32) * 0.1, 0, 1)
    fast = skimage_ssim(x, y)
    slow = _brute_force_ssim(x, y)
    assert abs(fast - slow) < 1e-6, (fast, slow)
    assert 0.0 < fast < 1.0
