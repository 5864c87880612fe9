"""Perspective SFM tests on synthetic camera geometry
(triangulation.rs oracle behaviors)."""

import numpy as np
import pytest

from cybervision_tpu.config import ReconstructionConfig, TriangulationConfig, ProjectionMode
from cybervision_tpu.ops import ba, sfm
from cybervision_tpu.ops.surface import MISSING, Camera, rodrigues_matrix


K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])


def _scene(rng, n_points=200, n_cams=3):
    pts = np.stack(
        [
            rng.uniform(-3, 3, n_points),
            rng.uniform(-2, 2, n_points),
            rng.uniform(8, 16, n_points),
        ],
        axis=1,
    )
    cams = []
    for i in range(n_cams):
        r = np.array([0.01, 0.12, -0.02]) * i
        t = np.array([0.8, 0.05, 0.1]) * i
        cams.append(Camera(k=K, r=r, t=t))
    obs = np.zeros((n_points, n_cams, 2))
    for j, cam in enumerate(cams):
        p = cam.projection()
        h = np.concatenate([pts, np.ones((n_points, 1))], axis=1)
        q = h @ p.T
        obs[:, j] = q[:, :2] / q[:, 2:3]
    return pts, cams, obs


def _tracks_from_obs(obs):
    return np.round(obs).astype(np.int32)


def test_triangulate_tracks_exact(rng):
    pts, cams, obs = _scene(rng, 100, 3)
    tracks = _tracks_from_obs(obs)
    projections = [c.projection() for c in cams]
    out, ok = sfm.triangulate_tracks_np(tracks, projections)
    assert ok.all()
    err = np.linalg.norm(out - pts, axis=1)
    assert np.median(err) < 0.1  # integer-pixel rounding noise only

    # Tracks with fewer than 2 views are invalid.
    tracks2 = tracks.copy()
    tracks2[0, 1:, :] = MISSING
    out2, ok2 = sfm.triangulate_tracks_np(tracks2, projections)
    assert not ok2[0]
    assert ok2[1:].all()


def test_find_projection_matrix_cheirality(rng):
    pts, cams, obs = _scene(rng, 150, 2)
    # F from the two camera matrices.
    p1m, p2m = cams[0].projection(), cams[1].projection()
    c1 = np.append(-np.linalg.inv(p1m[:, :3]) @ p1m[:, 3], 1.0)
    e2 = p2m @ c1
    e2x = np.array([[0, -e2[2], e2[1]], [e2[2], 0, -e2[0]], [-e2[1], e2[0], 0]])
    f = e2x @ p2m @ np.linalg.pinv(p1m)

    pts_pair = np.round(np.stack([obs[:, 0], obs[:, 1]], axis=1)).astype(np.int64)
    res = sfm.find_projection_matrix(f, K, K, pts_pair)
    assert res is not None
    p2, count = res
    assert count > 140
    # Recovered pose matches ground truth up to translation scale.
    r_true = cams[1].r_matrix
    t_true = cams[1].t / np.linalg.norm(cams[1].t)
    np.testing.assert_allclose(p2[:, :3], r_true, atol=5e-3)
    t_rec = p2[:, 3] / np.linalg.norm(p2[:, 3])
    np.testing.assert_allclose(t_rec, t_true, atol=5e-3)


def test_solve_p3p_recovers_pose(rng):
    pts, cams, obs = _scene(rng, 3, 2)
    cam = cams[1]
    k_inv = np.linalg.inv(K)
    h = np.concatenate([obs[:, 1], np.ones((3, 1))], axis=1)
    rays = h @ k_inv.T
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)

    cands = sfm.solve_p3p(rays[None], pts[None])[0]  # (4, 12)
    found = False
    for c in cands:
        if not np.isfinite(c).all():
            continue
        r = c[:9].reshape(3, 3)
        t = c[9:]
        if np.abs(r - cam.r_matrix).max() < 1e-4 and np.abs(t - cam.t).max() < 1e-3:
            found = True
    assert found


def test_recover_pose_ransac(rng):
    pts, cams, obs = _scene(rng, 300, 2)
    cam = cams[1]
    pts2d = np.round(obs[:, 1])
    # 20% outliers.
    bad = rng.rand(300) < 0.2
    pts2d[bad] += rng.uniform(30, 80, (bad.sum(), 2))
    cfg = TriangulationConfig(ransac_k=4000, check_interval=500)
    rec = sfm.recover_pose_ransac(
        pts2d, pts, np.zeros(300), K, 640, cfg, np.random.RandomState(0)
    )
    assert rec is not None
    np.testing.assert_allclose(rec.r_matrix, cam.r_matrix, atol=1e-2)
    np.testing.assert_allclose(rec.t, cam.t, atol=5e-2)


def test_extend_tracks(rng):
    store = sfm.TrackStore(3)
    start = np.full((2, 3, 2), MISSING, np.int32)
    start[0, 0] = (10, 10)
    start[1, 0] = (30, 20)
    store.append(start)

    grid = np.zeros((40, 40, 3), np.int64)
    grid[11, 11] = (101, 102, 1)  # near track 0 -> extends it
    grid[35, 35] = (103, 104, 1)  # far from both -> new track
    sfm.extend_tracks(store, 0, 1, grid, search_radius=3)

    assert len(store) == 3
    assert tuple(store.pts[0, 1]) == (101, 102)
    assert store.pts[1, 1, 0] == MISSING  # nothing within radius
    assert tuple(store.pts[2, 0]) == (35, 35)
    assert tuple(store.pts[2, 1]) == (103, 104)


def test_merge_tracks(rng):
    cfg = TriangulationConfig()
    store = sfm.TrackStore(2)
    tracks = np.full((3, 2, 2), MISSING, np.int32)
    # Two tracks at the same image-0 pixel with nearby image-1 points.
    tracks[0] = [(5, 5), (100, 100)]
    tracks[1] = [(5, 5), (102, 104)]
    # A separate faraway track.
    tracks[2] = [(20, 20), (200, 200)]
    store.append(tracks)
    merged = sfm.merge_tracks(store, 0, (32, 32), cfg)
    assert len(merged) == 2
    by_p0 = {tuple(p[0]): tuple(p[1]) for p in merged.pts}
    assert by_p0[(5, 5)] == (101, 102)  # integer average
    assert by_p0[(20, 20)] == (200, 200)


def test_merge_tracks_conflict_dropped(rng):
    cfg = TriangulationConfig()
    store = sfm.TrackStore(2)
    tracks = np.full((2, 2, 2), MISSING, np.int32)
    # Same pixel, wildly different image-1 points -> cannot merge.
    tracks[0] = [(5, 5), (100, 100)]
    tracks[1] = [(5, 5), (300, 300)]
    store.append(tracks)
    merged = sfm.merge_tracks(store, 0, (32, 32), cfg)
    assert len(merged) == 0


def test_filter_outliers(rng):
    pts, cams, obs = _scene(rng, 50, 2)
    store = sfm.TrackStore(2)
    tracks = _tracks_from_obs(obs)
    store.append(tracks)
    store.points3d = pts.copy()
    store.has_point3d = np.ones(50, bool)
    # Put one point behind the cameras.
    store.points3d[7, 2] = -5.0
    sfm.filter_outliers(store, cams, TriangulationConfig())
    assert not store.has_point3d[7]
    # Points with sufficient parallax survive.
    assert store.has_point3d.sum() > 40


def test_bundle_adjust_reduces_error(rng):
    pts, cams, obs = _scene(rng, 120, 3)
    store = sfm.TrackStore(3)
    store.append(_tracks_from_obs(obs))
    # Perturb points and camera poses.
    store.points3d = pts + rng.normal(0, 0.05, pts.shape)
    store.has_point3d = np.ones(len(pts), bool)
    noisy_cams = [
        Camera(k=K, r=c.r + rng.normal(0, 0.002, 3), t=c.t + rng.normal(0, 0.01, 3))
        for c in cams
    ]

    def rms(cameras, points):
        total = []
        for j, cam in enumerate(cameras):
            p = cam.projection()
            h = np.concatenate([points, np.ones((len(points), 1))], axis=1)
            q = h @ p.T
            uv = q[:, :2] / q[:, 2:3]
            total.append(np.linalg.norm(uv - store.pts[:, j], axis=1))
        return float(np.mean(np.concatenate(total)))

    before = rms(noisy_cams, store.points3d)
    out_cams = ba.bundle_adjust(store, noisy_cams, TriangulationConfig())
    assert out_cams is not None
    after = rms(out_cams, store.points3d)
    assert after < before * 0.2
    assert after < 0.5  # down to integer-rounding noise


def test_bundle_adjust_jit_matches_numpy(rng):
    """The fused-jit path and the chunk-streaming numpy path implement the
    same LM math; they must agree to float-reassociation noise on an
    identical noisy scene (ba.bundle_adjust dispatch contract)."""
    pts, cams, obs = _scene(rng, 150, 3)
    noisy_pts = pts + rng.normal(0, 0.05, pts.shape)
    noisy_cams = [
        Camera(k=K, r=c.r + rng.normal(0, 0.002, 3), t=c.t + rng.normal(0, 0.01, 3))
        for c in cams
    ]

    def fresh_store():
        store = sfm.TrackStore(3)
        store.append(_tracks_from_obs(obs))
        store.points3d = noisy_pts.copy()
        store.has_point3d = np.ones(len(pts), bool)
        return store

    s_np = fresh_store()
    out_np = ba._bundle_adjust_numpy(s_np, list(noisy_cams), TriangulationConfig())
    s_jit = fresh_store()
    out_jit = ba._bundle_adjust_jit(s_jit, list(noisy_cams), TriangulationConfig())
    assert out_np is not None and out_jit is not None
    for c_np, c_jit in zip(out_np, out_jit):
        np.testing.assert_allclose(c_np.r, c_jit.r, rtol=0, atol=1e-6)
        np.testing.assert_allclose(c_np.t, c_jit.t, rtol=0, atol=1e-5)
    scale = np.abs(s_np.points3d).max()
    assert np.abs(s_np.points3d - s_jit.points3d).max() < 1e-6 * scale


def test_sfm_pipeline_two_view(rng):
    """Sparse bootstrap + dense extension through the SfmPipeline facade."""

    class FakeImage:
        def __init__(self):
            self.dimensions = (640, 480)

        def calibration_matrix(self, focal):
            return K

    pts, cams, obs = _scene(rng, 300, 2)
    p1m, p2m = cams[0].projection(), cams[1].projection()
    c1 = np.append(-np.linalg.inv(p1m[:, :3]) @ p1m[:, 3], 1.0)
    e2 = p2m @ c1
    e2x = np.array([[0, -e2[2], e2[1]], [e2[2], 0, -e2[0]], [-e2[1], e2[0], 0]])
    f = e2x @ p2m @ np.linalg.pinv(p1m)

    cfg = ReconstructionConfig(projection=ProjectionMode.PERSPECTIVE)
    pipe = sfm.SfmPipeline([FakeImage(), FakeImage()], cfg)
    inliers = np.round(
        np.concatenate([obs[:, 0], obs[:, 1]], axis=1)
    ).astype(np.int64)
    inliers = inliers[
        (inliers[:, :2].min(axis=1) >= 0)
        & (inliers[:, 0] < 640) & (inliers[:, 1] < 480)
    ]
    pipe.add_sparse_pair(0, 1, f, inliers)
    order = pipe.recover_camera_poses()
    assert order == [0, 1]

    # Dense phase: feed exact correspondences as a correlated grid.
    grid = np.zeros((480, 640, 3), np.int64)
    o0 = np.round(obs[:, 0]).astype(int)
    o1 = np.round(obs[:, 1]).astype(int)
    ok = (o0[:, 0] >= 0) & (o0[:, 0] < 640) & (o0[:, 1] >= 0) & (o0[:, 1] < 480)
    grid[o0[ok, 1], o0[ok, 0], 0] = o1[ok, 0]
    grid[o0[ok, 1], o0[ok, 0], 1] = o1[ok, 1]
    grid[o0[ok, 1], o0[ok, 0], 2] = 1
    pipe.add_dense_pair(0, 1, grid)
    pipe.merge_tracks(0)
    surface = pipe.complete(bundle_adjustment=True)

    assert surface.n_points > 200
    # Scene recovered up to similarity: check reprojection consistency.
    for j in range(2):
        proj = surface.project_points(j)
        vis = surface.track_visible(j)
        err = np.linalg.norm(proj[vis] - surface.tracks[vis, j], axis=1)
        assert np.median(err) < 1.0


def test_bundle_adjust_device_path(rng):
    """The TPU f32 while-loop LM + f64 host polish (CVTPU_BA_DEVICE path,
    here on the CPU backend) must converge to the same quality as the
    host-f64 path on a noisy scene."""
    pts, cams, obs = _scene(rng, 200, 3)
    store = sfm.TrackStore(3)
    store.append(_tracks_from_obs(obs))
    store.points3d = pts + rng.normal(0, 0.05, pts.shape)
    store.has_point3d = np.ones(len(pts), bool)
    noisy_cams = [
        Camera(k=K, r=c.r + rng.normal(0, 0.002, 3), t=c.t + rng.normal(0, 0.01, 3))
        for c in cams
    ]

    def rms(cameras, points):
        total = []
        for j, cam in enumerate(cameras):
            p = cam.projection()
            h = np.concatenate([points, np.ones((len(points), 1))], axis=1)
            q = h @ p.T
            uv = q[:, :2] / q[:, 2:3]
            total.append(np.linalg.norm(uv - store.pts[:, j], axis=1))
        return float(np.mean(np.concatenate(total)))

    before = rms(noisy_cams, store.points3d)
    out_cams = ba._bundle_adjust_device(store, list(noisy_cams), TriangulationConfig())
    assert out_cams is not None
    after = rms(out_cams, store.points3d)
    assert after < before * 0.2
    assert after < 0.5
