"""Deterministic scene shared by the golden-fixture generator and the
golden parity test. Changing ANYTHING here invalidates
tests/fixtures/golden_dense.npz — regenerate with gen_golden_fixture.py."""

import numpy as np
from scipy import ndimage

H, W = 80, 64
SCALE_MIN_SIZE = 32  # min dim 64 -> pyramid scales [0.5, 1.0]

# Horizontal-shift epipolar geometry (parallel projection stereopair).
F_HSHIFT = np.array([[0, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float64)


def golden_scene():
    """(img1, img2, disparity): SEM-like textured pair with a smooth
    planted horizontal disparity field (~2..10 px — wide enough that the
    BASELINE 1%-of-range depth budget is meaningful against the
    integer-quantized match grid)."""
    rng = np.random.RandomState(7)
    base = rng.uniform(0, 255, (H, W))
    base = ndimage.gaussian_filter(base, 1.2)
    base = (base - base.min()) / (base.max() - base.min()) * 255.0
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    disparity = 2.0 + 9.0 * (ys / H) ** 2 + 2.0 * np.sin(xs / W * 3.0)
    img2 = ndimage.map_coordinates(
        base, [ys, xs + disparity], order=3, mode="nearest"
    )
    img1 = np.round(base).astype(np.uint8)
    img2 = np.round(img2).astype(np.uint8)
    return img1, img2, disparity
