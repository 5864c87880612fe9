"""End-to-end pipeline tests: synthetic SEM stereopair -> depth map / mesh
(the minimum end-to-end slice, SURVEY.md §7 step 3)."""

import numpy as np
import pytest
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
from cybervision_tpu import cli
from cybervision_tpu.reconstruction import reconstruct


def _sem_pair(rng, h=160, w=160):
    """Synthetic SEM-like stereopair: textured surface with a smooth,
    nonlinear horizontal disparity field (parallel projection => epipolar
    lines are image rows)."""
    base = rng.uniform(0, 255, (h, w))
    base = ndimage.gaussian_filter(base, 1.2)
    bumps = ndimage.gaussian_filter(rng.uniform(0, 255, (h, w)), 8.0)
    img1 = base * 0.6 + bumps * 0.4
    img1 = (img1 - img1.min()) / (img1.max() - img1.min()) * 255.0

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    disparity = 2.0 + 3.0 * (ys / h) ** 2 + 1.5 * np.sin(xs / w * 3.0)
    # img2(x, y) = img1(x + d, y): the match of img1 pixel x sits at x - d.
    img2 = ndimage.map_coordinates(img1, [ys, xs + disparity], order=3, mode="nearest")
    return (
        np.round(img1).astype(np.uint8),
        np.round(img2).astype(np.uint8),
        disparity,
    )


def _fast_cfg(**kw):
    return ReconstructionConfig(
        projection=ProjectionMode.AFFINE,
        ransac=RansacConfig(
            ransac_k_affine=32768,
            check_interval=8192,
            ransac_d_early_exit_affine=200,
        ),
        correlation=CorrelationConfig(scale_min_size=64),
        **kw,
    )


@pytest.fixture(scope="module")
def sem_scene(tmp_path_factory):
    rng = np.random.RandomState(7)
    img1, img2, disparity = _sem_pair(rng)
    d = tmp_path_factory.mktemp("sem")
    p1, p2 = str(d / "a.png"), str(d / "b.png")
    Image.fromarray(img1).save(p1)
    Image.fromarray(img2).save(p2)
    return p1, p2, disparity


def test_affine_end_to_end_depth_map(sem_scene, tmp_path):
    p1, p2, disparity = sem_scene
    out = str(tmp_path / "depth.png")
    cfg = _fast_cfg(interpolation=InterpolationMode.NONE)
    reconstruct([p1, p2], out, cfg, quiet=True)
    img = np.asarray(Image.open(out))
    filled = img[:, :, 3] == 255
    assert filled.mean() > 0.3
    # Depth increases with y (disparity ramp): color bands change along y.
    rows = np.nonzero(filled.any(axis=1))[0]
    top = img[rows[5], filled[rows[5]]][:, :3].mean(axis=0)
    bottom = img[rows[-5], filled[rows[-5]]][:, :3].mean(axis=0)
    assert np.abs(top.astype(float) - bottom.astype(float)).max() > 20


def test_affine_end_to_end_odd_sizes(tmp_path):
    """Non-multiple-of-8/128 dimensions through the full pipeline:
    exercises the device-resize truncation, the sweep's tile padding, and
    the writers' valid-crop on shapes nothing else in the suite hits."""
    rng = np.random.RandomState(11)
    img1, img2, _ = _sem_pair(rng, h=149, w=131)
    p1, p2 = str(tmp_path / "o1.png"), str(tmp_path / "o2.png")
    Image.fromarray(img1).save(p1)
    Image.fromarray(img2).save(p2)
    out = str(tmp_path / "odd.png")
    cfg = _fast_cfg(interpolation=InterpolationMode.NONE)
    reconstruct([p1, p2], out, cfg, quiet=True)
    img = np.asarray(Image.open(out))
    assert (img[:, :, 3] == 255).mean() > 0.3


def test_affine_end_to_end_ply(sem_scene, tmp_path):
    p1, p2, disparity = sem_scene
    out = str(tmp_path / "mesh.ply")
    cfg = _fast_cfg(mesh=MeshMode.VERTEX_COLORS)
    reconstruct([p1, p2], out, cfg, quiet=True)
    data = open(out, "rb").read()
    head = data[:400].decode(errors="ignore")
    assert "binary_big_endian" in head
    nv = int(head.split("element vertex ")[1].split("\n")[0])
    nf = int(head.split("element face ")[1].split("\n")[0])
    assert nv > 3000
    assert nf > 3000

    # Depth accuracy: z values should track the planted disparity.
    body = data.partition(b"end_header\n")[2]
    rec = np.frombuffer(body[: nv * 27], dtype=[("xyz", ">f8", 3), ("rgb", "u1", 3)])
    xyz = rec["xyz"]
    xs = xyz[:, 0].astype(int)
    ys = (-xyz[:, 1]).astype(int)
    z = -xyz[:, 2]  # out_scale flips z by default (scale = -1)
    true_d = disparity[np.clip(ys, 0, 159), np.clip(xs, 0, 159)]
    err = np.abs(z - true_d)
    assert np.median(err) < 1.0
    # The 1% depth-accuracy budget vs the planted field (BASELINE.md).
    assert np.mean(err <= 1.5) > 0.9


def test_affine_ply_fused_lane_matches_generic(sem_scene, tmp_path, monkeypatch):
    """The fused word-grid PLY lane (native.ply_write_corr_grid) must be
    byte-identical to the triangulate_affine + writer chain."""
    pytest.importorskip("cybervision_tpu.native")
    from cybervision_tpu.reconstruction import Reconstruction

    p1, p2, _ = sem_scene
    cfg = _fast_cfg(mesh=MeshMode.VERTEX_COLORS)
    fused = str(tmp_path / "fused.ply")
    generic = str(tmp_path / "generic.ply")
    reconstruct([p1, p2], fused, cfg, quiet=True)
    monkeypatch.setattr(
        Reconstruction, "_affine_ply_lane", lambda self, lower: False
    )
    reconstruct([p1, p2], generic, cfg, quiet=True)
    assert open(fused, "rb").read() == open(generic, "rb").read()


def test_cli_parse_and_usage():
    cfg, src, out = cli.parse_args(
        [
            "--scale=2.5",
            "--mode=cpu",
            "--interpolation=none",
            "--projection=parallel",
            "--mesh=plain",
            "--max-points=100",
            "--no-bundle-adjustment",
            "a.png",
            "b.png",
            "out.ply",
        ]
    )
    assert cfg.scale == 2.5
    assert cfg.max_points == 100
    assert not cfg.bundle_adjustment
    assert cfg.projection == ProjectionMode.AFFINE
    assert src == ["a.png", "b.png"]
    assert out == "out.ply"

    with pytest.raises(SystemExit) as e:
        cli.parse_args(["--mode=quantum", "a", "b", "c"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        cli.parse_args(["a.png", "out.ply"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        cli.parse_args(["--help"])
    assert e.value.code == 0
