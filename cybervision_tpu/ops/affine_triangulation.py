"""Affine (parallel-projection) triangulation.

Reference (triangulation.rs:262-331): a single SEM stereopair's depth is
the disparity magnitude — point3d = (x, y, sqrt(dx^2 + dy^2)) for every
correlated pixel; the two cameras are identical parallel-projection
dummies. Vectorized here over the whole correlated-points grid.
"""

from __future__ import annotations

import numpy as np

from cybervision_tpu.ops.surface import MISSING, Surface, affine_camera


def triangulate_affine(correlated_points: np.ndarray) -> Surface:
    """correlated_points: (H, W, 3) int64 of (x2, y2, valid) per img1 pixel
    (the output of ops.correlation.correlate_images). Returns a Surface
    with one track per valid pixel."""
    h, w, _ = correlated_points.shape
    valid = correlated_points[:, :, 2] == 1
    ys, xs = np.nonzero(valid)
    x2 = correlated_points[:, :, 0][valid].astype(np.float64)
    y2 = correlated_points[:, :, 1][valid].astype(np.float64)

    dx = xs.astype(np.float64) - x2
    dy = ys.astype(np.float64) - y2
    dist = np.hypot(dx, dy)

    points3d = np.stack([xs.astype(np.float64), ys.astype(np.float64), dist], axis=1)
    tracks = np.full((len(xs), 2, 2), MISSING, dtype=np.int32)
    tracks[:, 0, 0] = xs
    tracks[:, 0, 1] = ys
    tracks[:, 1, 0] = x2.astype(np.int32)
    tracks[:, 1, 1] = y2.astype(np.int32)

    return Surface(
        points3d=points3d,
        tracks=tracks,
        cameras=[affine_camera(), affine_camera()],
        grid_shape=(h, w),
    )
