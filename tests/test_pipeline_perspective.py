"""End-to-end perspective pipeline test: rendered two-view scene -> OBJ."""

import numpy as np
import pytest
from PIL import Image
from scipy import ndimage

from cybervision_tpu.config import (
    InterpolationMode,
    MeshMode,
    ProjectionMode,
    RansacConfig,
    ReconstructionConfig,
    TriangulationConfig,
)
from cybervision_tpu.ops.surface import Camera
from cybervision_tpu.reconstruction import reconstruct

W, H = 320, 256
K = np.array([[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1]])


def _render_pair(rng):
    """Texture on a smooth depth surface seen by two cameras.

    The surface is defined on camera-2's pixel grid (depth per img2 pixel);
    img2 pixels backproject to 3D and sample img1's texture through
    camera 1 — so img2 is an exact resampling of img1 with full-parallax
    geometry and no holes.
    """
    tex = rng.uniform(0, 255, (H, W))
    tex = ndimage.gaussian_filter(tex, 1.0)
    bumps = ndimage.gaussian_filter(rng.uniform(0, 255, (H, W)), 6.0)
    img1 = tex * 0.55 + bumps * 0.45
    img1 = (img1 - img1.min()) / (img1.max() - img1.min()) * 255.0

    # A strongly 3D scene: weak parallax leaves the 7-point problem
    # under-constrained at the reference's inlier threshold (any epipole
    # fits within ~1.8 px), so depth modulation must be large.
    cam2 = Camera(k=K, r=np.array([0.02, 0.12, -0.01]), t=np.array([1.2, 0.1, 0.2]))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    depth2 = (
        8.0
        + 3.5 * np.sin(xs / W * 5.0)
        + 2.5 * (ys / H) ** 2
        + 1.5 * np.cos(ys / H * 7.0 + xs / W * 2.0)
    )

    # Backproject img2 pixels to 3D 'world' (= camera-1) coordinates.
    h2 = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    rays = h2 @ np.linalg.inv(K).T
    pts_c2 = rays * depth2[:, :, None]
    r2 = cam2.r_matrix
    pts_w = (pts_c2 - cam2.t[None, None, :]) @ r2  # R' (X_c2 - t)

    proj1 = pts_w @ K.T
    uv1 = proj1[:, :, :2] / proj1[:, :, 2:3]
    img2 = ndimage.map_coordinates(
        img1, [uv1[:, :, 1], uv1[:, :, 0]], order=3, mode="nearest"
    )
    return (
        np.round(img1).astype(np.uint8),
        np.round(np.clip(img2, 0, 255)).astype(np.uint8),
    )


def test_perspective_end_to_end_obj(tmp_path):
    rng = np.random.RandomState(3)
    img1, img2 = _render_pair(rng)
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    Image.fromarray(img1).save(p1)
    Image.fromarray(img2).save(p2)

    cfg = ReconstructionConfig(
        projection=ProjectionMode.PERSPECTIVE,
        interpolation=InterpolationMode.NONE,
        mesh=MeshMode.PLAIN,
        focal_length=43,  # 400px focal on a 320x256 image ~ 43mm equiv
        ransac=RansacConfig(
            ransac_k_perspective=16384,
            check_interval=4096,
            ransac_d_perspective=60,
            ransac_d_early_exit_perspective=150,
        ),
        triangulation=TriangulationConfig(ransac_k=4000, check_interval=1000),
    )
    out = str(tmp_path / "out.obj")
    reconstruct([p1, p2], out, cfg, quiet=True)

    lines = open(out).read().splitlines()
    verts = np.array(
        [[float(v) for v in l.split()[1:4]] for l in lines if l.startswith("v ")]
    )
    assert len(verts) > 2000
    # Depth signal present: the reconstructed z varies smoothly and spans
    # a nontrivial range (scene has ~25% depth modulation).
    z = verts[:, 2]
    assert np.std(z) > 1e-3 * np.abs(np.median(z))
