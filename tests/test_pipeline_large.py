"""BASELINE config #4 end-to-end: a large non-square pair with
--max-points and --mesh=texture-coordinates through the full pipeline
(reference behavior at scale: output.rs:938-969 texture path;
max-points truncation reconstruction.rs/triangulation.rs:837-844)."""

import os

import numpy as np
from PIL import Image
from scipy import ndimage

from cybervision_tpu.config import (
    CorrelationConfig,
    InterpolationMode,
    MeshMode,
    ProjectionMode,
    RansacConfig,
    ReconstructionConfig,
)
from cybervision_tpu.reconstruction import reconstruct

W, H = 2048, 1536


def _big_sem_pair(rng):
    base = rng.uniform(0, 255, (H, W))
    base = ndimage.gaussian_filter(base, 1.2)
    bumps = ndimage.gaussian_filter(rng.uniform(0, 255, (H, W)), 10.0)
    img1 = base * 0.6 + bumps * 0.4
    img1 = (img1 - img1.min()) / (img1.max() - img1.min()) * 255.0
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    disparity = 3.0 + 8.0 * (ys / H) ** 2 + 4.0 * np.sin(xs / W * 3.0)
    img2 = ndimage.map_coordinates(
        img1, [ys, xs + disparity], order=3, mode="nearest"
    )
    return np.round(img1).astype(np.uint8), np.round(img2).astype(np.uint8)


def test_large_pair_texture_mesh_with_max_points(tmp_path):
    rng = np.random.RandomState(11)
    img1, img2 = _big_sem_pair(rng)
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    Image.fromarray(img1).save(p1)
    Image.fromarray(img2).save(p2)

    max_points = 40_000
    cfg = ReconstructionConfig(
        projection=ProjectionMode.AFFINE,
        interpolation=InterpolationMode.DELAUNAY,
        mesh=MeshMode.TEXTURE_COORDINATES,
        max_points=max_points,
        ransac=RansacConfig(
            ransac_k_affine=32768,
            check_interval=8192,
            ransac_d_early_exit_affine=200,
        ),
        correlation=CorrelationConfig(),
    )
    out = str(tmp_path / "mesh.obj")
    reconstruct([p1, p2], out, cfg, quiet=True)

    lines = open(out).read().splitlines()
    n_v = sum(1 for l in lines if l.startswith("v "))
    n_vt = sum(1 for l in lines if l.startswith("vt "))
    n_f = sum(1 for l in lines if l.startswith("f "))
    # --max-points caps the vertex count (reference shuffles + truncates).
    assert 0 < n_v <= max_points
    # Texture mode writes one vt PER PROJECTION of each track
    # (output.rs:938-969); affine pair tracks carry both image points.
    assert n_vt == 2 * n_v
    assert n_f > 1000
    assert any(l.startswith("usemtl ") for l in lines)
    assert any(l.startswith("mtllib ") for l in lines)
    # Faces reference both v and vt indices within range.
    f0 = [l for l in lines if l.startswith("f ")][0].split()[1:]
    for tok in f0:
        v_i, vt_i = tok.split("/")[:2]
        assert 1 <= int(v_i) <= n_v
        assert 1 <= int(vt_i) <= n_vt
    # The .mtl and texture images landed next to the obj.
    stem = os.path.splitext(os.path.basename(out))[0]
    assert os.path.exists(str(tmp_path / f"{stem}.mtl"))
    assert os.path.exists(str(tmp_path / f"{stem}-0.png"))
