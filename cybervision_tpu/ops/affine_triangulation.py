"""Affine (parallel-projection) triangulation.

Reference (triangulation.rs:262-331): a single SEM stereopair's depth is
the disparity magnitude — point3d = (x, y, sqrt(dx^2 + dy^2)) for every
correlated pixel; the two cameras are identical parallel-projection
dummies. Vectorized here over the whole correlated-points grid.
"""

from __future__ import annotations

import numpy as np

from cybervision_tpu.ops.surface import MISSING, Surface, affine_camera


def triangulate_affine_word(
    word: np.ndarray, max_points: int | None = None, seed: int = 0
) -> Surface:
    """triangulate_affine straight from the compact (H, W) int32
    correlation word grid (x2 | y2 << 12 | valid << 24,
    ops.correlation._pack_state_compact), applying the --max-points
    subsample (reconstruction.rs:837-844's shuffle+truncate) BEFORE any
    per-point array is built. At hi-res (12 Mpix) this replaces the
    ~300 MB (H, W, 3) int64 unpack plus full-grid points/tracks
    materialization with arrays sized by max_points.

    Without subsampling the result equals
    triangulate_affine(unpack_correlated(word)) exactly; with it, the
    points match the old subsample-after path in distribution and count
    (both draw max_points row-major valid pixels via the same seeded
    choice; grid_shape is dropped the same way)."""
    h, w = word.shape
    ys, xs = np.nonzero((word >> 24) & 1)
    grid_shape: tuple | None = (h, w)
    if max_points is not None and len(xs) > max_points:
        keep = np.random.RandomState(seed).choice(
            len(xs), max_points, replace=False
        )
        ys, xs = ys[keep], xs[keep]
        grid_shape = None  # no longer a dense grid: generic Delaunay

    vals = word[ys, xs]
    x2 = (vals & 0xFFF).astype(np.float64)
    y2 = ((vals >> 12) & 0xFFF).astype(np.float64)
    xf = xs.astype(np.float64)
    yf = ys.astype(np.float64)
    dist = np.hypot(xf - x2, yf - y2)

    points3d = np.stack([xf, yf, dist], axis=1)
    tracks = np.empty((len(xs), 2, 2), dtype=np.int32)
    tracks[:, 0, 0] = xs
    tracks[:, 0, 1] = ys
    tracks[:, 1, 0] = x2.astype(np.int32)
    tracks[:, 1, 1] = y2.astype(np.int32)

    return Surface(
        points3d=points3d,
        tracks=tracks,
        cameras=[affine_camera(), affine_camera()],
        grid_shape=grid_shape,
    )


def triangulate_affine_word_sampled(
    idx: np.ndarray, words: np.ndarray, h: int, w: int
) -> Surface:
    """Surface from a device-side --max-points draw
    (ops.correlation.sample_word_grid): flat pixel indices + their
    correlation words, possibly padded with invalid entries when fewer
    valid pixels exist than requested. In that no-subsample case the
    entries are re-sorted row-major, making the result identical to
    triangulate_affine_word(word) with no max_points (dense grid kept,
    grid_shape intact); otherwise grid_shape drops to None exactly like
    the host subsample lane."""
    valid = ((words >> 24) & 1) == 1
    grid_shape: tuple | None = None
    if not valid.all():
        # Fewer valid pixels than max_points: this is the whole valid
        # set, i.e. no subsample happened — restore row-major order so
        # the surface is the dense grid the host lane would build.
        idx, words = idx[valid], words[valid]
        order = np.argsort(idx)
        idx, words = idx[order], words[order]
        grid_shape = (h, w)

    ys, xs = np.divmod(idx.astype(np.int64), w)
    x2 = (words & 0xFFF).astype(np.float64)
    y2 = ((words >> 12) & 0xFFF).astype(np.float64)
    xf = xs.astype(np.float64)
    yf = ys.astype(np.float64)

    points3d = np.stack([xf, yf, np.hypot(xf - x2, yf - y2)], axis=1)
    tracks = np.empty((len(idx), 2, 2), dtype=np.int32)
    tracks[:, 0, 0] = xs
    tracks[:, 0, 1] = ys
    tracks[:, 1, 0] = x2.astype(np.int32)
    tracks[:, 1, 1] = y2.astype(np.int32)

    return Surface(
        points3d=points3d,
        tracks=tracks,
        cameras=[affine_camera(), affine_camera()],
        grid_shape=grid_shape,
    )


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
