"""Device-batched SFM primitives vs numpy oracles."""

import numpy as np

from cybervision_tpu.ops import sfm_device


def test_dlt_nullspaces_matches_eigh(rng):
    # PSD matrices with a planted near-null direction.
    t = 64
    basis = rng.randn(t, 4, 4)
    ata = np.einsum("tij,tkj->tik", basis, basis)
    null = rng.randn(t, 4)
    null /= np.linalg.norm(null, axis=1, keepdims=True)
    # Project the null direction out to make lambda_min ~ 0.
    ata -= (
        np.einsum("tij,tj->ti", ata, null)[:, :, None] * null[:, None, :]
        + null[:, :, None] * np.einsum("tij,tj->ti", ata, null)[:, None, :]
        - null[:, :, None]
        * np.einsum("ti,tij,tj->t", null, ata, null)[:, None, None]
        * null[:, None, :]
    )
    ata = 0.5 * (ata + np.swapaxes(ata, 1, 2))

    h = sfm_device.dlt_nullspaces(ata)
    w, v = np.linalg.eigh(ata)
    ref = v[:, :, 0]
    # Compare up to sign.
    dots = np.abs(np.einsum("ti,ti->t", h, ref))
    np.testing.assert_allclose(dots, 1.0, atol=1e-6)


def test_p3p_score_matches_numpy_oracle(rng):
    t = 500
    b = 40
    pts3d = rng.randn(t, 3) * 2.0 + np.array([0, 0, 6.0])
    k = np.array([[800.0, 0, 512], [0, 800.0, 384], [0, 0, 1]])
    proj_true = k @ np.hstack([np.eye(3), np.zeros((3, 1))])
    h3 = np.concatenate([pts3d, np.ones((t, 1))], axis=1)
    pp = h3 @ proj_true.T
    pts2d = pp[:, :2] / pp[:, 2:3] + rng.randn(t, 2) * 0.5
    const_err = np.abs(rng.randn(t)) * 0.1

    # Candidates: the true projection + random perturbations + one NaN.
    projs = np.stack(
        [proj_true + rng.randn(3, 4) * (0.0 if i == 0 else 5.0) for i in range(b)]
    )
    projs[3] = np.nan
    sample = rng.randint(0, t, (b, 3))
    s2d = pts2d[sample]
    s3d = pts3d[sample]
    inlier_t, points_t = 50.0, 25.0

    count, err_max, ok = sfm_device.p3p_score(
        projs, s2d, s3d, pts3d, pts2d, const_err, inlier_t, points_t
    )

    # Numpy oracle.
    for i in range(b):
        with np.errstate(all="ignore"):
            sp = np.concatenate([s3d[i], np.ones((3, 1))], axis=1) @ projs[i].T
            sp2 = sp[:, :2] / sp[:, 2:3]
            serr = np.linalg.norm(sp2 - s2d[i], axis=1)
            ok_ref = bool(np.all(np.isfinite(serr) & (serr < inlier_t)))
            pp = h3 @ projs[i].T
            pp2 = pp[:, :2] / pp[:, 2:3]
            err = np.linalg.norm(pp2 - pts2d, axis=1)
            err = np.maximum(err, const_err)
            good = np.isfinite(err) & (err < points_t)
        assert bool(ok[i]) == ok_ref, i
        assert int(count[i]) == int(good.sum()), i
        if good.any():
            # max-inlier-error statistic (triangulation.rs:1304-1305)
            np.testing.assert_allclose(
                err_max[i], err[good].max(), rtol=1e-4
            )

    assert int(count[0]) > 0 and bool(ok[0])
    assert int(count[3]) == 0 and not bool(ok[3])


def test_device_dlt_in_triangulation_path(rng, monkeypatch):
    """Force the device DLT branch inside triangulate_tracks_np and check
    it reproduces the host result on an exact synthetic scene."""
    from cybervision_tpu.ops import sfm

    monkeypatch.setattr(sfm_device, "DEVICE_DLT_MIN_TRACKS", 1)

    t = 200
    pts3d = rng.randn(t, 3) * 1.5 + np.array([0, 0, 8.0])
    k = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
    r = np.eye(3)
    projections = []
    pts = np.full((t, 2, 2), -1, np.int32)
    for i, tv in enumerate([np.zeros(3), np.array([-1.0, 0.1, 0.0])]):
        p = k @ np.hstack([r, tv[:, None]])
        projections.append(p)
        pp = np.concatenate([pts3d, np.ones((t, 1))], axis=1) @ p.T
        pts[:, i] = np.round(pp[:, :2] / pp[:, 2:3]).astype(np.int32)

    out, valid = sfm.triangulate_tracks_np(pts, projections)
    assert valid.all()
    # Half-pixel quantization bounds the recovery error.
    err = np.linalg.norm(out - pts3d, axis=1)
    assert np.median(err) < 0.05
