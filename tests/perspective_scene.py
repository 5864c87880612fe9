"""Synthetic perspective scene renderer shared by the e2e tests and the
multi-image SFM bench.

Texture on one consistent world depth surface seen by N cameras. The
surface is the height field depth1(u, v) over camera-1's grid (camera 1 =
identity pose). Every extra view renders by per-pixel fixed-point
inversion: for a target pixel's ray X(d), iterate
d <- d * depth1(proj1(X)) / X_z — converging to the ray-surface
intersection for smooth fields — then sample img1's texture at the
camera-1 projection. All views therefore observe exactly the same 3D
geometry (required for multi-image SFM track merging).
"""

import numpy as np
from scipy import ndimage

from cybervision_tpu.ops.surface import Camera

W, H = 320, 256
K = np.array([[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1]])


def render_views(rng, extra_cams):
    tex = rng.uniform(0, 255, (H, W))
    tex = ndimage.gaussian_filter(tex, 1.0)
    bumps = ndimage.gaussian_filter(rng.uniform(0, 255, (H, W)), 6.0)
    img1 = tex * 0.55 + bumps * 0.45
    img1 = (img1 - img1.min()) / (img1.max() - img1.min()) * 255.0

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    # A strongly 3D scene: weak parallax leaves the 7-point problem
    # under-constrained at the reference's inlier threshold (any epipole
    # fits within ~1.8 px), so depth modulation must be large.
    depth1 = (
        8.0
        + 3.5 * np.sin(xs / W * 5.0)
        + 2.5 * (ys / H) ** 2
        + 1.5 * np.cos(ys / H * 7.0 + xs / W * 2.0)
    )
    k_inv = np.linalg.inv(K)

    def sample_depth1(u, v):
        return ndimage.map_coordinates(depth1, [v, u], order=1, mode="nearest")

    views = [np.round(img1).astype(np.uint8)]
    h_grid = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    for cam in extra_cams:
        rays_c = h_grid @ k_inv.T  # unit-depth rays in the camera frame
        r = cam.r_matrix
        d = np.full((H, W), float(depth1.mean()))
        for _ in range(12):
            pts_w = (rays_c * d[:, :, None] - cam.t[None, None, :]) @ r
            z1 = np.maximum(pts_w[:, :, 2], 1e-6)
            u1 = K[0, 0] * pts_w[:, :, 0] / z1 + K[0, 2]
            v1 = K[1, 1] * pts_w[:, :, 1] / z1 + K[1, 2]
            d = d * np.clip(sample_depth1(u1, v1) / z1, 0.5, 2.0)
        img_k = ndimage.map_coordinates(img1, [v1, u1], order=3, mode="nearest")
        views.append(np.round(np.clip(img_k, 0, 255)).astype(np.uint8))
    return views


def pair_cam() -> Camera:
    return Camera(
        k=K, r=np.array([0.02, 0.12, -0.01]), t=np.array([1.2, 0.1, 0.2])
    )


def third_cam() -> Camera:
    return Camera(
        k=K, r=np.array([-0.015, -0.1, 0.012]), t=np.array([-1.1, -0.12, 0.15])
    )


def multi_cams(n_extra: int) -> list[Camera]:
    """The first n_extra of a fixed ring of extra cameras around the
    identity view — 5/6-view SFM scenes (reference driver: N-image
    all-pairs + incremental recovery, reconstruction.rs:261-277,627-666).
    The first two are the classic pair/third cams; the rest interleave
    baselines so neighboring views overlap strongly (every view links to
    several others, stressing track merging and BA at m>3)."""
    extras = [
        pair_cam(),
        third_cam(),
        Camera(
            k=K, r=np.array([0.028, 0.065, -0.018]),
            t=np.array([0.62, 0.28, -0.12]),
        ),
        Camera(
            k=K, r=np.array([-0.012, -0.055, 0.01]),
            t=np.array([-0.58, -0.3, 0.1]),
        ),
        Camera(
            k=K, r=np.array([0.018, 0.09, 0.02]),
            t=np.array([0.9, -0.35, 0.18]),
        ),
    ]
    if n_extra > len(extras):
        raise ValueError(f"only {len(extras)} extra cameras defined")
    return extras[:n_extra]
