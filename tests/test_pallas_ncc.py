"""Pallas sweep kernel vs the XLA scan formulation (interpret mode)."""

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from cybervision_tpu.ops import correlation as corr

F_HSHIFT = np.array([[0, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float64)


def _scene(rng, h, w, dx):
    base = rng.uniform(0, 255, (h, w + dx))
    base = ndimage.gaussian_filter(base, 1.5)
    base = np.round(
        (base - base.min()) / (base.max() - base.min()) * 255
    ).astype(np.uint8)
    return base[:, :w].copy(), base[:, dx : dx + w].copy()


def test_pallas_sweep_matches_scan(rng):
    h, w, dx = 48, 40, 2
    img1, img2 = _scene(rng, h, w, dx)
    hp, wp = h // 2, w // 2
    prev_pos = np.zeros((hp, wp, 2), np.int32)
    for qy in range(hp):
        for qx in range(wp):
            prev_pos[qy, qx] = (max(2 * qx - dx, 0), 2 * qy)
    prev = corr.CorrelationState(
        pos=jnp.asarray(prev_pos),
        corr=jnp.ones((hp, wp), jnp.float32),
        valid=jnp.ones((hp, wp), bool),
    )
    args = (
        jnp.asarray(img1), jnp.asarray(img2), prev,
        jnp.asarray(F_HSHIFT, jnp.float32), 1.0, 0.6, 1.0, 2.5, 1.0, 2,
    )
    ref = corr.refine_pass(*args, window=8)
    wtr, tmin = corr.split_trange(
        corr.warp_shift_range(F_HSHIFT, 1.0, h, w, h, w)
    )
    # Per-pixel-axis kernel (gather warps) and static-axis kernel
    # (shift/select warps) must both match the scan reference.
    for kw in (
        {},
        {"warp_trange": wtr, "warp_tmin": tmin},
    ):
        out = corr.refine_pass_pallas(*args, window=8, interpret=True, **kw)

        ov, rv = np.asarray(out.valid), np.asarray(ref.valid)
        # Summation-order ulp differences flip threshold-boundary pixels.
        assert (ov != rv).mean() < 0.005
        v = ov & rv
        np.testing.assert_allclose(
            np.asarray(out.corr)[v], np.asarray(ref.corr)[v], atol=1e-4
        )
        pos_eq = (
            np.asarray(out.pos)[v] == np.asarray(ref.pos)[v]
        ).all(axis=1)
        assert pos_eq.mean() > 0.995


def test_pallas_sweep_vertical_geometry(rng):
    """Transposed geometry exercises the vertical-corridor branch.

    A vertical-translation scene (x2 = x1, y2 = y1 - dy) has VERTICAL
    epipolar lines l = (1, 0, -x1), i.e. F = [[0,0,1],[0,0,0],[-1,0,0]]
    — epipolar_fields' vert is True (F_HSHIFT.T would give horizontal
    lines y2 = y1 and never reach the vert branches)."""
    h, w, dy = 40, 48, 2
    img1t, img2t = _scene(rng, w, h, dy)
    img1, img2 = img1t.T.copy(), img2t.T.copy()
    f_vshift = np.array(
        [[0, 0, 1], [0, 0, 0], [-1, 0, 0]], dtype=np.float64
    )
    hp, wp = h // 2, w // 2
    prev_pos = np.zeros((hp, wp, 2), np.int32)
    for qy in range(hp):
        for qx in range(wp):
            prev_pos[qy, qx] = (2 * qx, max(2 * qy - dy, 0))
    prev = corr.CorrelationState(
        pos=jnp.asarray(prev_pos),
        corr=jnp.ones((hp, wp), jnp.float32),
        valid=jnp.ones((hp, wp), bool),
    )
    args = (
        jnp.asarray(img1), jnp.asarray(img2), prev,
        jnp.asarray(f_vshift, jnp.float32), 1.0, 0.6, 1.0, 2.5, 1.0, 2,
    )
    ref = corr.refine_pass(*args, window=8)
    wtr, tmin = corr.split_trange(
        corr.warp_shift_range(f_vshift, 1.0, h, w, h, w)
    )
    assert wtr is not None and wtr[0] == "vert"
    for kw in (
        {},
        {"warp_trange": wtr, "warp_tmin": tmin},
    ):
        out = corr.refine_pass_pallas(*args, window=8, interpret=True, **kw)
        ov, rv = np.asarray(out.valid), np.asarray(ref.valid)
        assert (ov != rv).mean() < 0.005
        v = ov & rv
        pos_eq = (
            np.asarray(out.pos)[v] == np.asarray(ref.pos)[v]
        ).all(axis=1)
        assert pos_eq.mean() > 0.995
