"""Dense-correlation parity tests against the literal oracle
(correlation/mod.rs semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from cybervision_tpu.config import CorrelationConfig, ProjectionMode
from cybervision_tpu.ops import correlation as corr

from . import oracle_correlation as oc

# Horizontal-shift epipolar geometry: correspondences share the row, so
# lines are y2 = y1 and corridors are horizontal.
F_HSHIFT = np.array([[0, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float64)


def _texture(rng, h, w, blur=1.5):
    img = rng.uniform(0, 255, (h, w))
    img = ndimage.gaussian_filter(img, blur)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return np.round(img).astype(np.uint8)


def _shifted_pair(rng, h, w, dx, blur=1.5):
    base = _texture(rng, h, w + dx, blur)
    return base[:, :w].copy(), base[:, dx : dx + w].copy()


class _FakeSource:
    def __init__(self, img):
        self.img = img

    def resize(self, scale):
        from cybervision_tpu.images import resize_lanczos

        return resize_lanczos(self.img, scale)


def _state_to_fullres(state, scale, h0, w0):
    """Scatter a current-scale CorrelationState into the reference's
    full-resolution grid layout."""
    out = oc.empty_state(h0, w0)
    inv_s = int(round(1.0 / scale))
    pos = np.asarray(state.pos)
    cc = np.asarray(state.corr)
    vv = np.asarray(state.valid)
    h, w = vv.shape
    for y in range(h):
        for x in range(w):
            oy, ox = y * inv_s, x * inv_s
            out["valid"][oy, ox] = vv[y, x]
            if vv[y, x]:
                out["pos_x"][oy, ox] = pos[y, x, 0]
                out["pos_y"][oy, ox] = pos[y, x, 1]
                out["corr"][oy, ox] = cc[y, x]
    return out


def test_window_stats_matches_oracle(rng):
    img = _texture(rng, 24, 28)
    avg, std, ok = corr.window_stats(jnp.asarray(img))
    o_avg, o_std = oc.image_point_data(img)
    avg = np.asarray(avg)
    std = np.asarray(std)
    interior = ~np.isnan(o_avg)
    assert np.asarray(ok).sum() == interior.sum()
    np.testing.assert_allclose(avg[interior], o_avg[interior], atol=1e-2)
    np.testing.assert_allclose(std[interior], o_std[interior], atol=1e-2)


def test_epipolar_fields_match_oracle(rng):
    fmat = np.array(
        [[0.001, 0.002, 0.3], [-0.002, 0.0015, 1.0], [-0.25, -1.1, 12.0]]
    )
    scale = 0.5
    h, w = 16, 20
    ep = corr.epipolar_fields(jnp.asarray(fmat, jnp.float32), h, w, scale)
    for x, y in [(3, 4), (10, 2), (7, 13), (19, 15)]:
        coeff, add, _ = oc.epipolar_line(fmat, x, y, scale)
        vert = bool(ep["vert"][y, x])
        # vert <=> |fp.x| > |fp.y| <=> parametrized by y2 (coeff.y == 1).
        if vert:
            assert coeff[1] == 1.0
            np.testing.assert_allclose(float(ep["coeff"][y, x]), coeff[0], rtol=1e-4)
            np.testing.assert_allclose(float(ep["add"][y, x]), add[0], rtol=1e-4)
        else:
            assert coeff[0] == 1.0
            np.testing.assert_allclose(float(ep["coeff"][y, x]), coeff[1], rtol=1e-4)
            np.testing.assert_allclose(float(ep["add"][y, x]), add[1], rtol=1e-4)


def test_first_pass_candidate_tiling_equivalence(rng):
    """The candidate-axis tiling (bounds the (rows, P2) correlation
    intermediate for extreme aspect ratios) must reproduce the
    single-tile result exactly, including first-maximum tie-breaking.
    row_chunk=96 puts the whole image in one row chunk, which drives
    cand_chunk to its 4096 floor -> 3 candidate tiles; row_chunk=8 keeps
    a single candidate tile."""
    h = w = 96
    img1, img2 = _shifted_pair(rng, h, w, 3)
    f = jnp.asarray(F_HSHIFT, jnp.float32)
    one = corr.first_pass(
        jnp.asarray(img1), jnp.asarray(img2), f, 1.0, 0.6, 1.0, 2,
        row_chunk=8,
    )
    tiled = corr.first_pass(
        jnp.asarray(img1), jnp.asarray(img2), f, 1.0, 0.6, 1.0, 2,
        row_chunk=96,
    )
    np.testing.assert_array_equal(np.asarray(one.valid), np.asarray(tiled.valid))
    both = np.asarray(one.valid)
    np.testing.assert_array_equal(
        np.asarray(one.pos)[both], np.asarray(tiled.pos)[both]
    )
    np.testing.assert_allclose(
        np.asarray(one.corr)[both], np.asarray(tiled.corr)[both], atol=1e-6
    )


def test_first_pass_matches_oracle(rng):
    h, w, dx = 28, 32, 3
    img1, img2 = _shifted_pair(rng, h, w, dx)
    scale = 1.0

    state = corr.first_pass(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(F_HSHIFT, jnp.float32),
        scale, 0.6, 1.0, 2,
    )
    mine = _state_to_fullres(state, scale, h, w)

    o_state = oc.correlate_step(
        img1, img2, F_HSHIFT, scale, oc.empty_state(h, w), first_pass=True
    )

    assert o_state["valid"].sum() > 30  # sanity: the scene correlates
    # Valid masks agree everywhere except float-boundary cases.
    disagree = mine["valid"] != o_state["valid"]
    assert disagree.mean() < 0.02, disagree.sum()
    both = mine["valid"] & o_state["valid"]
    # f32 boundary effects (candidates at the sigma >= 1.0 cutoff, argmax
    # near-ties) flip a few winners; everything else is exact.
    corr_mismatch = np.abs(mine["corr"][both] - o_state["corr"][both]) > 5e-3
    assert corr_mismatch.mean() < 0.05
    pos_mismatch = (mine["pos_x"][both] != o_state["pos_x"][both]) | (
        mine["pos_y"][both] != o_state["pos_y"][both]
    )
    assert pos_mismatch.mean() < 0.05
    # And the recovered disparity is the planted one.
    ys, xs = np.nonzero(both)
    good = np.abs(o_state["pos_x"][both] - (xs - dx)) <= 1
    assert good.mean() > 0.9


def test_corridor_ranges_match_oracle(rng):
    """_corridor_ranges' 10x10-window identity vs the reference's
    full-resolution neighbor scan (mod.rs:468-540)."""
    scale = 1.0
    h, w = 40, 32
    hp, wp = 20, 16
    h2, w2 = 40, 32

    prev_valid = rng.rand(hp, wp) < 0.4
    prev_pos = np.zeros((hp, wp, 2), np.int32)
    # Previous-scale matches: roughly x - 3 with jitter, stored at full-res
    # (multiples of 1/s_prev = 2).
    for y in range(hp):
        for x in range(wp):
            if prev_valid[y, x]:
                prev_pos[y, x] = (
                    max(2 * x - 3 + rng.randint(-2, 3), 0),
                    2 * y + rng.randint(-1, 2),
                )
    prev = corr.CorrelationState(
        pos=jnp.asarray(prev_pos),
        corr=jnp.where(jnp.asarray(prev_valid), 0.9, -1.0).astype(jnp.float32),
        valid=jnp.asarray(prev_valid),
    )

    ep = corr.epipolar_fields(jnp.asarray(F_HSHIFT, jnp.float32), h, w, scale)
    _center, start, end, has = corr._corridor_ranges(
        ep, prev, h, w, h2, w2, scale, 2.5, 1.0
    )
    start = np.asarray(start)
    length = np.asarray(end) - start
    has = np.asarray(has)

    # Oracle state at full resolution (entries at multiples of 2).
    o_state = oc.empty_state(h, w)
    for y in range(hp):
        for x in range(wp):
            if prev_valid[y, x]:
                o_state["valid"][2 * y, 2 * x] = True
                o_state["pos_x"][2 * y, 2 * x] = prev_pos[y, x, 0]
                o_state["pos_y"][2 * y, 2 * x] = prev_pos[y, x, 1]

    checked = 0
    off_by_one = 0
    for y in range(corr.KS, h - corr.KS):
        for x in range(corr.KS, w - corr.KS):
            coeff, add, _ = oc.epipolar_line(F_HSHIFT, x, y, scale)
            rng_o = oc.estimate_search_range(
                o_state, x, y, scale, coeff, add, corr.KS, w2 - corr.KS, 10, 2.5, 1.0
            )
            if rng_o is None:
                assert not has[y, x], (x, y)
                continue
            assert has[y, x], (x, y)
            s_o, e_o = rng_o
            if abs(start[y, x] - s_o) <= 1 and abs(
                (start[y, x] + length[y, x]) - e_o
            ) <= 1:
                if start[y, x] != s_o or start[y, x] + length[y, x] != e_o:
                    off_by_one += 1
            else:
                raise AssertionError(
                    f"range mismatch at {(x, y)}: mine "
                    f"[{start[y, x]}, {start[y, x] + length[y, x]}) vs [{s_o}, {e_o})"
                )
            checked += 1
    assert checked > 100
    # f32 vs f64 variance rounding may shift the rounded bound by one.
    assert off_by_one / checked < 0.05


def test_refine_pass_close_to_oracle(rng):
    """Refine sweep vs the oracle's exact corridor walk, isolated from
    coarse-pass margin bias by planting an everywhere-valid previous-scale
    state with the true disparity."""
    h, w, dx = 40, 32, 2
    img1f, img2f = _shifted_pair(rng, h, w, dx, blur=2.0)
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

    mine = corr.refine_pass(
        jnp.asarray(img1f), jnp.asarray(img2f), prev,
        jnp.asarray(F_HSHIFT, jnp.float32), 1.0, 0.6, 1.0, 2.5, 1.0, 2,
        window=16,
    )

    o_prev = oc.empty_state(h, w)
    for qy in range(hp):
        for qx in range(wp):
            o_prev["valid"][2 * qy, 2 * qx] = True
            o_prev["pos_x"][2 * qy, 2 * qx] = prev_pos[qy, qx, 0]
            o_prev["pos_y"][2 * qy, 2 * qx] = prev_pos[qy, qx, 1]
    o_fine = oc.correlate_step(
        img1f, img2f, F_HSHIFT, 1.0, o_prev, first_pass=False
    )

    mv = np.asarray(mine.valid)
    ov = o_fine["valid"]
    both = mv & ov
    union = mv | ov
    assert both.sum() > 300
    assert both.sum() / union.sum() > 0.85  # mask IoU

    mx = np.asarray(mine.pos[:, :, 0])
    my = np.asarray(mine.pos[:, :, 1])
    agree = (np.abs(mx[both] - o_fine["pos_x"][both]) <= 1) & (
        np.abs(my[both] - o_fine["pos_y"][both]) <= 1
    )
    # The fronto-parallel warp approximation may move the argmax by a
    # pixel; gross disagreement means a bug.
    assert agree.mean() > 0.9

    # Both recover the planted disparity on confident pixels.
    ys, xs = np.nonzero(mv)
    err = np.abs(mx[mv] - (xs - dx))
    assert np.median(err) <= 1.0


def test_refine_pass_perspective_params_close_to_oracle(rng):
    """The perspective parameter set (corridor_size=4, threshold 0.5,
    min_range 0.75 / extend 0.5, correlation/mod.rs:20-30) on a
    perspective-like F (nonzero upper 2x2 block, so warp_shift_range
    rejects the static-axis fast path and the per-pixel-axis gather
    formulation runs) vs the oracle's exact corridor walk. Covers both
    the XLA scan and the Pallas kernel (interpret mode)."""
    h, w, dx = 40, 32, 2
    # An epsilon upper block keeps the true geometry (y2 = y1 shifted by
    # <= 1e-4*40*32 = 0.13 px) while exercising the perspective paths.
    f_persp = np.array(
        [[0, 1e-4, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float64
    )
    assert corr.warp_shift_range(f_persp, 1.0, h, w, h, w) is None

    img1f, img2f = _shifted_pair(rng, h, w, dx, blur=2.0)
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
        jnp.asarray(img1f), jnp.asarray(img2f), prev,
        jnp.asarray(f_persp, jnp.float32), 1.0, 0.5, 1.0, 0.75, 0.5, 4,
    )

    o_prev = oc.empty_state(h, w)
    for qy in range(hp):
        for qx in range(wp):
            o_prev["valid"][2 * qy, 2 * qx] = True
            o_prev["pos_x"][2 * qy, 2 * qx] = prev_pos[qy, qx, 0]
            o_prev["pos_y"][2 * qy, 2 * qx] = prev_pos[qy, qx, 1]
    o_fine = oc.correlate_step(
        img1f, img2f, f_persp, 1.0, o_prev, first_pass=False,
        threshold=0.5, corridor_size=4, min_range=0.75, extend_range=0.5,
    )
    ov = o_fine["valid"]

    for mine in (
        corr.refine_pass(*args, window=16),
        corr.refine_pass_pallas(*args, window=16, interpret=True),
    ):
        mv = np.asarray(mine.valid)
        both = mv & ov
        union = mv | ov
        assert both.sum() > 300
        assert both.sum() / union.sum() > 0.85  # mask IoU
        mx = np.asarray(mine.pos[:, :, 0])
        my = np.asarray(mine.pos[:, :, 1])
        agree = (np.abs(mx[both] - o_fine["pos_x"][both]) <= 1) & (
            np.abs(my[both] - o_fine["pos_y"][both]) <= 1
        )
        assert agree.mean() > 0.9
        ys, xs = np.nonzero(mv)
        err = np.abs(mx[mv] - (xs - dx))
        assert np.median(err) <= 1.0


def test_cross_check_matches_oracle(rng):
    scale = 0.5
    h, w = 16, 20
    hr, wr = 14, 18
    inv_s = 2

    def rand_state(hh, ww, other_h, other_w):
        valid = rng.rand(hh, ww) < 0.5
        pos = np.stack(
            [
                rng.randint(0, other_w, (hh, ww)) * inv_s,
                rng.randint(0, other_h, (hh, ww)) * inv_s,
            ],
            axis=-1,
        ).astype(np.int32)
        return valid, pos

    fv, fp = rand_state(h, w, hr, wr)
    rv, rp = rand_state(hr, wr, h, w)
    # Plant guaranteed mutual pairs.
    for x, y, x2, y2 in [(6, 7, 5, 6), (10, 3, 12, 4)]:
        fv[y, x] = True
        fp[y, x] = (x2 * inv_s, y2 * inv_s)
        rv[y2, x2] = True
        rp[y2, x2] = (x * inv_s, y * inv_s)

    state = corr.CorrelationState(
        pos=jnp.asarray(fp), corr=jnp.full((h, w), 0.9, jnp.float32),
        valid=jnp.asarray(fv),
    )
    reverse = corr.CorrelationState(
        pos=jnp.asarray(rp), corr=jnp.full((hr, wr), 0.9, jnp.float32),
        valid=jnp.asarray(rv),
    )
    mine = corr.cross_check_exact(state, reverse, scale)
    fast = corr.cross_check(state, reverse, scale)

    f_full = _state_to_fullres(state, scale, h * inv_s, w * inv_s)
    r_full = _state_to_fullres(reverse, scale, hr * inv_s, wr * inv_s)
    o = oc.cross_check(f_full, r_full, scale)

    mine_v = np.asarray(mine.valid)
    for y in range(h):
        for x in range(w):
            assert mine_v[y, x] == o["valid"][y * inv_s, x * inv_s], (x, y)
    assert bool(mine_v[7, 6]) and bool(mine_v[3, 10])
    # The fast interval-bound filter is a relaxation: it keeps everything
    # the exact filter keeps, and only a little more.
    fast_v = np.asarray(fast.valid)
    assert (fast_v | ~mine_v).all()  # superset
    extra = fast_v & ~mine_v
    assert extra.mean() < 0.25


def test_correlate_images_end_to_end(rng):
    h, w, dx = 96, 80, 3
    img1, img2 = _shifted_pair(rng, h, w, dx, blur=1.2)
    cfg = CorrelationConfig(scale_min_size=32)
    out = corr.correlate_images(
        _FakeSource(img1), _FakeSource(img2), F_HSHIFT,
        ProjectionMode.AFFINE, cfg,
    )
    assert out.shape == (h, w, 3)
    valid = out[:, :, 2] == 1
    interior = np.zeros((h, w), bool)
    interior[corr.KS : h - corr.KS, corr.KS : w - corr.KS] = True
    assert valid[interior].mean() > 0.5
    ys, xs = np.nonzero(valid)
    err = np.abs(out[:, :, 0][valid] - (xs - dx))
    assert np.median(err) <= 1.0
    err_y = np.abs(out[:, :, 1][valid] - ys)
    assert np.median(err_y) <= 1.0


def test_correlate_images_single_level_pyramid(rng):
    """A pair at/below scale_min_size has a ONE-level pyramid (steps=0;
    the reference handles this via optimal_scale_steps()=0,
    correlation/mod.rs:542-550). Regression: the fixed-window fused path
    once dropped the only level (coarse=levels[:-1] empty + a
    len(scales)>1 guard) and returned the 2x2 placeholder state
    (ADVICE r3 high)."""
    h, w, dx = 64, 64, 2
    img1, img2 = _shifted_pair(rng, h, w, dx, blur=1.2)
    cfg = CorrelationConfig()  # default scale_min_size=64 -> 1 level
    assert cfg.corridor_window_fixed is not None
    out = corr.correlate_images(
        _FakeSource(img1), _FakeSource(img2), F_HSHIFT,
        ProjectionMode.AFFINE, cfg,
    )
    assert out.shape == (h, w, 3)
    valid = out[:, :, 2] == 1
    assert valid.sum() > 100
    ys, xs = np.nonzero(valid)
    err = np.abs(out[:, :, 0][valid] - (xs - dx))
    assert np.median(err) <= 1.0


def test_fused_pyramid_matches_per_level_loop(rng):
    """correlate_images' single fused pyramid program (pyramid_program)
    must equal dispatching pyramid_level_step per level."""
    from cybervision_tpu.config import pyramid_scales

    h, w, dx = 96, 80, 3
    img1, img2 = _shifted_pair(rng, h, w, dx, blur=1.2)
    cfg = CorrelationConfig(scale_min_size=32)
    assert cfg.corridor_window_fixed is not None  # fused path active
    fused = corr.correlate_images(
        _FakeSource(img1), _FakeSource(img2), F_HSHIFT,
        ProjectionMode.AFFINE, cfg,
    )

    # Per-level loop with the same fixed windows (the pre-fusion driver).
    f = corr.normalize_f(F_HSHIFT)
    f_fwd = jnp.asarray(f, jnp.float32)
    f_rev = jnp.asarray(f.T, jnp.float32)
    full1, full2 = jnp.asarray(img1), jnp.asarray(img2)
    thr = cfg.threshold(ProjectionMode.AFFINE)
    stdev = cfg.min_stdev(ProjectionMode.AFFINE)
    cs = cfg.corridor_size(ProjectionMode.AFFINE)
    win = cfg.corridor_window_fixed
    state_f = state_r = corr.empty_state(2, 2)
    for si, scale in enumerate(pyramid_scales((w, h), cfg.scale_min_size)):
        im1 = corr._device_resize(full1, scale)
        im2 = corr._device_resize(full2, scale)
        lh1, lw1 = im1.shape
        lh2, lw2 = im2.shape
        wtr_f, tmin_f = corr.split_trange(
            corr.warp_shift_range(f, scale, lh1, lw1, lh2, lw2)
        )
        wtr_r, tmin_r = corr.split_trange(
            corr.warp_shift_range(f.T, scale, lh2, lw2, lh1, lw1)
        )
        state_f, state_r = corr.pyramid_level_step(
            im1, im2, state_f, state_r, f_fwd, f_rev, scale, thr, stdev,
            cfg.corridor_min_range(ProjectionMode.AFFINE),
            cfg.corridor_extend_range(ProjectionMode.AFFINE),
            cs, win, win, first=si == 0, use_pallas=False,
            warp_trange_f=wtr_f, warp_trange_r=wtr_r,
            warp_tmin_f=tmin_f, warp_tmin_r=tmin_r,
        )
    loop = np.asarray(corr._pack_state(state_f), np.int64)
    np.testing.assert_array_equal(fused, loop)


def test_fused_pyramid_compiles_once_across_pairs(rng):
    """Different image pairs (different F shifts, same dims) must share
    ONE compiled pyramid_program — split_trange moves tmin out of the
    static key, so multi-image runs don't recompile the dense pyramid
    per pair (~45 s each over the TPU tunnel)."""
    h, w, dx = 96, 80, 3
    cfg = CorrelationConfig(scale_min_size=32)
    img1, img2 = _shifted_pair(rng, h, w, dx, blur=1.2)
    # F_VOFF's epipolar lines sit one row below the true match (tmin=-1
    # at every level vs F_HSHIFT's 0, same split_trange bucket); the
    # +-corridor stripes still cover the match.
    f_voff = np.array(
        [[0, 0, 0], [0, 0, 1], [0, -1, 1]], dtype=np.float64
    )
    outs = []
    before = None
    for fmat in (F_HSHIFT, f_voff):
        assert corr.split_trange(
            corr.warp_shift_range(corr.normalize_f(fmat), 1.0, h, w, h, w)
        )[0] == ("horiz", 2, 8)
        outs.append(corr.correlate_images(
            _FakeSource(img1), _FakeSource(img2), fmat,
            ProjectionMode.AFFINE, cfg,
        ))
        if before is None:
            before = corr.pyramid_program._cache_size()
    assert corr.pyramid_program._cache_size() == before
    # And the shifted-F pair still correlates correctly (tmin really is
    # applied dynamically, not baked at first trace).
    valid = outs[1][:, :, 2] > 0
    ys, xs = np.nonzero(valid)
    assert valid.mean() > 0.2
    assert np.median(np.abs(outs[1][:, :, 0][valid] - (xs - dx))) <= 1.0
    assert np.median(np.abs(outs[1][:, :, 1][valid] - ys)) <= 1.0


def test_stripe_warps_fast_matches_gather(rng):
    """The shift/select warp fast path (warp_shift_range) must equal the
    gather path at every pixel whose candidate is in-bounds, for
    horizontal, rotated-affine, and vertical epipolar geometries."""
    h, w = 96, 80
    img1, img2 = _shifted_pair(rng, h, w, 3)
    f_rot = np.array(
        [[0, 0, 0.004], [0, 0, 1.0], [0.002, -1.0, 2.0]], np.float64
    )
    for fmat, name in [
        (F_HSHIFT, "horiz"),
        (f_rot, "rot"),
        (F_HSHIFT.T, "vert"),
    ]:
        fmat = corr.normalize_f(fmat)
        trange = corr.warp_shift_range(fmat, 1.0, h, w, h, w)
        assert trange is not None, name
        hp, wp = h // 2, w // 2
        prev_pos = np.zeros((hp, wp, 2), np.int32)
        for qy in range(hp):
            for qx in range(wp):
                if name == "vert":
                    prev_pos[qy, qx] = (2 * qx, max(2 * qy - 3, 0))
                else:
                    prev_pos[qy, qx] = (max(2 * qx - 3, 0), 2 * qy)
        prev = corr.CorrelationState(
            pos=jnp.asarray(prev_pos),
            corr=jnp.ones((hp, wp), jnp.float32),
            valid=jnp.ones((hp, wp), bool),
        )
        args = (
            jnp.asarray(img1), jnp.asarray(img2), prev,
            jnp.asarray(fmat, jnp.float32), 1.0, 0.6, 1.0, 2.5, 1.0, 2, 8,
        )
        st_gather = corr.refine_pass(*args, warp_trange=None)
        wtr, tmin = corr.split_trange(trange)
        st_fast = corr.refine_pass(*args, warp_trange=wtr, warp_tmin=tmin)
        np.testing.assert_array_equal(
            np.asarray(st_gather.valid), np.asarray(st_fast.valid), name
        )
        both = np.asarray(st_gather.valid)
        np.testing.assert_array_equal(
            np.asarray(st_gather.pos)[both], np.asarray(st_fast.pos)[both],
            name,
        )
        np.testing.assert_allclose(
            np.asarray(st_gather.corr)[both],
            np.asarray(st_fast.corr)[both],
            atol=1e-5, err_msg=name,
        )


def test_warp_shift_range_covers_asymmetric_pair():
    """The shift/select range must cover t = floor(coeff*center + add) -
    p_perp for every legitimate anchor (center = x + D with the disparity
    D bounded by BOTH images' extents: D = mean - src spans
    [-(w1-1), w2-1]). Regression: the margin used max(h2, w2) only, so a
    wider image 1 let t escape the select range and silently sample the
    tmin row."""
    h1, w1, h2, w2 = 64, 160, 64, 80
    fmat = corr.normalize_f(np.array(
        [[0, 0, -0.015], [0, 0, 1.0], [0.002, -1.0, 2.0]], np.float64
    ))
    tr = corr.warp_shift_range(fmat, 1.0, h1, w1, h2, w2)
    assert tr is not None
    axis, tmin, tmax = tr
    assert axis == "horiz"
    a, b = float(fmat[0, 2]), float(fmat[1, 2])
    coeff = -a / b
    for x in range(w1):
        for y in (0, h1 - 1):
            add = -(fmat[2, 0] * x + fmat[2, 1] * y + fmat[2, 2]) / b
            for d in (-(w1 - 1), 0, w2 - 1):
                # t_field (base_y - row) as _stripe_warps_fast builds it
                t = int(np.floor(coeff * (x + d) + add)) - y
                assert tmin <= t <= tmax, (x, y, d, t, tmin, tmax)


def test_warp_shift_range_rejects_perspective():
    f_persp = np.array(
        [[1e-4, 2e-4, 0.3], [-2e-4, 1.5e-4, 1.0], [-0.25, -1.1, 12.0]]
    )
    assert corr.warp_shift_range(f_persp, 1.0, 100, 100, 100, 100) is None


# ---------------------------------------------------------------------------
# Fixed-window truncation guard (VERDICT r2 missing #5)


def _wide_disparity_pair(rng, h=256, w=256, amp=24.0):
    """A pair whose disparity swings +-amp px WITHIN one 128-row anchor
    band: per-pixel corridors then reach far past the default fixed
    window (reference corridors grow unbounded with neighbor stdev,
    correlation/mod.rs:530-538)."""
    base = _texture(rng, h, w, blur=1.2)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dx = amp * np.sin(2 * np.pi * ys / 100.0)
    img2 = ndimage.map_coordinates(base, [ys, xs + dx], order=3, mode="nearest")
    return _FakeSource(base), _FakeSource(np.round(img2).astype(np.uint8))


def test_fixed_window_escalates_on_wide_disparity(rng):
    src1, src2 = _wide_disparity_pair(rng)

    # Data-driven bucket path: the reference-semantics result.
    cfg_bucket = CorrelationConfig(corridor_window_fixed=None)
    bucketed = corr.correlate_images(
        src1, src2, F_HSHIFT, ProjectionMode.AFFINE, cfg_bucket
    )

    # Fixed window with the guard OFF: silently truncates — measurably
    # fewer matches on this scene (this is the hole the guard closes).
    cfg_trunc = CorrelationConfig(corridor_window_escalate=False)
    truncated = corr.correlate_images(
        src1, src2, F_HSHIFT, ProjectionMode.AFFINE, cfg_trunc
    )
    n_bucket = int((np.asarray(bucketed)[:, :, 2] > 0).sum())
    n_trunc = int((np.asarray(truncated)[:, :, 2] > 0).sum())
    assert n_bucket > n_trunc * 1.1, (n_bucket, n_trunc)

    # Default config: the reach check detects the would-be truncation and
    # either widens the finest-level window (split path) or escalates to
    # the bucket path (coarse-level overreach) — result identical to the
    # data-driven run either way.
    out = corr.correlate_images(
        src1, src2, F_HSHIFT, ProjectionMode.AFFINE, CorrelationConfig()
    )
    plan = corr._LAST_PLAN
    widened = (
        plan.get("escalated_from_fixed") == 16
        or max(plan.get("windows_finest", (0, 0))) > 16
    )
    assert widened, plan
    np.testing.assert_array_equal(out, bucketed)


def test_fixed_window_no_escalation_on_narrow_disparity(rng):
    """A small-disparity pair must NOT escalate (the fused fast path
    stays), and its recorded reach stays within the fixed window."""
    img1, img2 = _shifted_pair(rng, 192, 192, 3)
    out = corr.correlate_images(
        _FakeSource(img1), _FakeSource(img2), F_HSHIFT,
        ProjectionMode.AFFINE, CorrelationConfig(),
    )
    plan = corr._LAST_PLAN
    assert "escalated_from_fixed" not in plan
    assert plan["windows_finest"] == (16, 16), plan
    assert max(plan["reaches"]) <= 16, plan
    assert int((np.asarray(out)[:, :, 2] > 0).sum()) > 1000


# ---------------------------------------------------------------------------
# Uniform-axis detection (static-kernel specialization for perspective F)


def test_uniform_epipolar_axis_matches_device_field(rng):
    """When the host proves a uniform axis, the device's per-pixel vert
    field must actually be constant at that value (the detection gates a
    STATIC kernel specialization — a wrong call would silently sweep the
    wrong epipolar direction)."""
    h, w = 96, 128
    for _ in range(60):
        f = rng.normal(0, 1, (3, 3))
        f = corr.normalize_f(f)
        ax = corr.uniform_epipolar_axis(f, 1.0, h, w)
        vert = np.asarray(
            corr.epipolar_fields(jnp.asarray(f, jnp.float32), h, w, 1.0)[
                "vert"
            ]
        )
        if ax == "vert":
            assert vert.all()
        elif ax == "horiz":
            assert not vert.any()
        # ax None: no claim (conservative)


def test_uniform_epipolar_axis_mixed_returns_none():
    # Epipole at the image origin: the dominant axis flips across the
    # diagonal, so no static specialization is allowed.
    f = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    assert corr.uniform_epipolar_axis(f, 1.0, 128, 128) is None


def test_refine_pass_pallas_forced_axis_matches_scan(rng):
    """A perspective F with a proven-uniform axis must give identical
    results through the static-axis kernel (force_axis) and the
    per-pixel scan reference."""
    h, w, dx = 48, 40, 2
    base = _texture(rng, h, w + dx, 1.5)
    img1, img2 = base[:, :w].copy(), base[:, dx : dx + w].copy()
    # Horizontal-ish epipolar geometry with small perspective terms:
    # still uniformly "horiz" over the image.
    f = corr.normalize_f(np.array(
        [[1e-6, 2e-6, 1e-4], [1.5e-6, -1e-6, 1.0], [2e-4, -1.0, 0.5]]
    ))
    ax = corr.uniform_epipolar_axis(f, 1.0, h, w)
    assert ax == "horiz"
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
        jnp.asarray(f, jnp.float32), 1.0, 0.5, 1.0, 0.75, 0.5, 4,
    )
    ref = corr.refine_pass(*args, window=8)
    out = corr.refine_pass_pallas(
        *args, window=8, interpret=True, force_axis=ax
    )
    ov, rv = np.asarray(out.valid), np.asarray(ref.valid)
    assert (ov != rv).mean() < 0.005
    v = ov & rv
    np.testing.assert_allclose(
        np.asarray(out.corr)[v], np.asarray(ref.corr)[v], atol=1e-4
    )
    pos_eq = (np.asarray(out.pos)[v] == np.asarray(ref.pos)[v]).all(axis=1)
    assert pos_eq.mean() > 0.995


def test_pack_state_delta_parity_and_overflow(rng):
    """_pack_state_delta: valid-masked parity with the compact word via
    unpack_delta_grid; overflow bit set iff any VALID delta leaves
    [-64, 63] (invalid garbage positions must not trip it)."""
    import jax

    h, w = 24, 32
    col = np.arange(w, dtype=np.int32)[None, :]
    row = np.arange(h, dtype=np.int32)[:, None]
    x2 = np.clip(col + rng.randint(-40, 41, (h, w)), 0, w - 1)
    y2 = np.clip(row + rng.randint(-40, 41, (h, w)), 0, h - 1)
    valid = rng.uniform(size=(h, w)) < 0.6
    # Garbage positions at some INVALID pixels, far out of delta range.
    x2 = np.where(~valid & (rng.uniform(size=(h, w)) < 0.5), 4000, x2)
    pos = jnp.asarray(np.stack([x2, y2], axis=-1).astype(np.int32))
    state = corr.CorrelationState(
        pos=pos, corr=jnp.zeros((h, w), jnp.float32),
        valid=jnp.asarray(valid),
    )
    d16, word = jax.jit(corr._pack_state_delta)(state)
    d16, word = np.asarray(d16), np.asarray(word)
    assert not (d16[0, 0] & 0x8000)
    np.testing.assert_array_equal((d16 >> 14) & 1, valid.astype(np.uint16))
    un = corr.unpack_delta_grid(d16)
    v = (word >> 24) & 1
    np.testing.assert_array_equal(un * v, word * v)

    # Valid pixels with >63-px deltas must set the broadcast flag.
    state2 = corr.CorrelationState(
        pos=jnp.asarray(np.stack([x2 + 300, y2], -1).astype(np.int32)),
        corr=jnp.zeros((h, w), jnp.float32),
        valid=jnp.asarray(valid),
    )
    d16b, _ = jax.jit(corr._pack_state_delta)(state2)
    d16b = np.asarray(d16b)
    assert d16b[0, 0] & 0x8000  # flag broadcast to every element
