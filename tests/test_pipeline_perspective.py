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


def _render_views(rng, extra_cams):
    """Texture on one consistent world depth surface seen by N cameras.

    The surface is the height field depth1(u, v) over camera-1's grid
    (camera 1 = identity pose). Every extra view renders by per-pixel
    fixed-point inversion: for a target pixel's ray X(d), iterate
    d <- d * depth1(proj1(X)) / X_z — converging to the ray-surface
    intersection for smooth fields — then sample img1's texture at the
    camera-1 projection. All views therefore observe exactly the same 3D
    geometry (required for multi-image SFM track merging).
    """
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


def _render_pair(rng):
    cam2 = Camera(
        k=K, r=np.array([0.02, 0.12, -0.01]), t=np.array([1.2, 0.1, 0.2])
    )
    return _render_views(rng, [cam2])


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


def test_perspective_three_image_merged_mesh(tmp_path):
    """BASELINE config #5: multi-image SFM (3 photos) -> merged Delaunay
    mesh through reconstruct() — exercises per-image merge_tracks and the
    multi-camera meshing/occlusion path (reconstruction.rs:627-666,
    output.rs:457-508)."""
    rng = np.random.RandomState(3)
    cam2 = Camera(
        k=K, r=np.array([0.02, 0.12, -0.01]), t=np.array([1.2, 0.1, 0.2])
    )
    cam3 = Camera(
        k=K, r=np.array([-0.015, -0.1, 0.012]), t=np.array([-1.1, -0.12, 0.15])
    )
    views = _render_views(rng, [cam2, cam3])
    paths = []
    for i, img in enumerate(views):
        p = str(tmp_path / f"v{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)

    cfg = ReconstructionConfig(
        projection=ProjectionMode.PERSPECTIVE,
        interpolation=InterpolationMode.DELAUNAY,
        mesh=MeshMode.VERTEX_COLORS,
        focal_length=43,
        ransac=RansacConfig(
            ransac_k_perspective=16384,
            check_interval=4096,
            ransac_d_perspective=60,
            ransac_d_early_exit_perspective=150,
        ),
        triangulation=TriangulationConfig(ransac_k=4000, check_interval=1000),
    )
    out = str(tmp_path / "merged.ply")
    reconstruct(paths, out, cfg, quiet=True)

    from tests.test_output import _parse_ply

    verts, cols, faces = _parse_ply(out)
    assert len(verts) > 2000
    assert cols is not None and len(cols) == len(verts)
    assert len(faces) > 1000
    assert faces.min() >= 0 and faces.max() < len(verts)
    z = verts[:, 2]
    assert np.std(z) > 1e-3 * np.abs(np.median(z))
