"""Coarse-to-fine dense epipolar NCC correlation — the framework's core.

Reference behavior (correlation/mod.rs, the GPU kernels under
correlation/gpu/shaders/): for every pixel of img1, walk its epipolar line
in img2 (parametrized by the dominant axis, correlation/mod.rs:386-409)
with +-corridor_size lateral stripes, scoring 11x11 zero-mean normalized
cross-correlation (correlation/mod.rs:411-466); at the coarsest pyramid
scale the full corridor is searched, and every finer scale searches a
per-pixel window derived from the previous scale's matches in a 10px
neighborhood (mean corridor position +- (min_range + stdev*extend_range),
correlation/mod.rs:468-540); forward and reverse directions are mutually
cross-checked each scale (correlation/mod.rs:552-624).

TPU redesign (SURVEY.md §5/§7) — no per-pixel corridor walks:

* First (coarsest) pass: exact all-pairs patch correlation as an
  (P1, 121) x (121, P2) matmul on the MXU over zero-mean normalized
  patches, masked to each pixel's epipolar corridor band, chunked over
  img1 rows. Identical candidate set and NCC values to the reference's
  walk — the corridor test "x2 == floor(line(i)) + o for some |o| <= cs"
  is evaluated in closed form per (p, q) pair.

* Refine passes: hypothesis-sweep. Each hypothesis (r, o) = (offset along
  the corridor window, lateral stripe) warps img2 by the per-pixel
  candidate map and scores all pixels at once: one gather + elementwise
  product + separable 11x11 box filter + running argmax carry (the same
  blockwise-max structure as the reference's corridor segmentation,
  gpu/mod.rs:333-356). This evaluates NCC with a locally-constant
  disparity approximation inside the 11x11 window (fronto-parallel
  support, the standard plane-sweep formulation) — the reference instead
  re-gathers the window at every candidate. Validated against the exact
  oracle in tests.

* Search-range estimation: the reference's 10px neighbor scan over the
  full-resolution grid reduces exactly to a fixed 10x10 window in the
  previous scale's grid anchored at ceil(p/2)-5 (integer identity, see
  _neighbor_stats), turning the per-pixel scan into 100 shifted adds.

* Cross-check: the full-resolution +-4*(1/scale) mutual-consistency test
  reduces exactly to +-4 cells at the current scale (the grids only hold
  entries at multiples of 1/scale).

The per-pixel window length is bucketed to static sizes so XLA compiles a
fixed program per (shape, bucket); masked lanes cover the variation.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cybervision_tpu.config import (
    CorrelationConfig,
    ProjectionMode,
    pyramid_scales,
)

KS = 5  # kernel half-width (correlation/mod.rs:16)
KW = 2 * KS + 1
KPC = KW * KW


class CorrelationState(NamedTuple):
    """Per-direction match state at the current pyramid scale.

    pos: (H, W, 2) int32 full-resolution (x, y) of the match in the other
         image (the reference stores round(x2/scale), mod.rs:459-462).
    corr: (H, W) f32 best NCC value.
    valid: (H, W) bool.
    """

    pos: jnp.ndarray
    corr: jnp.ndarray
    valid: jnp.ndarray


# Host-side record of the last correlate_images dispatch plan — which
# pyramid levels took the Pallas kernel and whether a mesh was active.
# Written at trace/dispatch time (plain Python), read by tests asserting
# the multi-chip path really exercises the hot kernel.
_LAST_PLAN: dict | None = None


def empty_state(h: int, w: int) -> CorrelationState:
    return CorrelationState(
        pos=jnp.zeros((h, w, 2), jnp.int32),
        corr=jnp.full((h, w), -1.0, jnp.float32),
        valid=jnp.zeros((h, w), bool),
    )


# ---------------------------------------------------------------------------
# Window statistics


def _round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """Rust f64::round semantics: halves round AWAY from zero (2.5 -> 3,
    -2.5 -> -3). jnp.round is half-to-even and diverges on every exact
    half — which the corridor math hits systematically (mod.rs:530-538)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _box11(x: jnp.ndarray) -> jnp.ndarray:
    """11x11 window sum ('same' size; borders are partial and masked by
    callers). Two separable passes of 11 shifted adds."""
    s = x
    acc = jnp.zeros_like(x)
    for dx in range(-KS, KS + 1):
        acc = acc + jnp.roll(s, -dx, axis=-1)
    s, acc = acc, jnp.zeros_like(x)
    for dy in range(-KS, KS + 1):
        acc = acc + jnp.roll(s, -dy, axis=-2)
    return acc


def window_stats(img: jnp.ndarray):
    """Per-pixel 11x11 mean and stdev (population), like
    prepare_initialdata_correlation.comp.glsl:60-119 /
    correlation/mod.rs:657-694. Returns (avg, stdev, margin_valid)."""
    img = img.astype(jnp.float32)
    n = float(KPC)
    s1 = _box11(img)
    s2 = _box11(img * img)
    avg = s1 / n
    var = jnp.maximum(s2 / n - avg * avg, 0.0)
    stdev = jnp.sqrt(var)
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ok = (ys >= KS) & (ys < h - KS) & (xs >= KS) & (xs < w - KS)
    return avg, stdev, ok


# ---------------------------------------------------------------------------
# Epipolar geometry per pixel


def epipolar_fields(
    f: jnp.ndarray, h: int, w: int, scale: float,
    force_vert: bool | None = None,
):
    """Per-pixel corridor parametrization (correlation/mod.rs:386-409).

    force_vert pins the dominant axis globally instead of the per-pixel
    |a|>|b| test — used when a static-axis sweep (warp_shift_range's f64
    decision) must agree exactly with these f32 fields, including
    |a| == |b| ties that round differently in f32.

    Returns dict with:
      vert: (H, W) bool — corridor parametrized by y2 (the dominant-axis
            coefficient is 1, so corridor positions are plain coordinates)
      coeff: (H, W) f32 — off-axis slope (x2 = coeff*i + add for vert)
      add:  (H, W) f32
      finite: (H, W) bool
    """
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] / scale
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] / scale
    a = f[0, 0] * xs + f[0, 1] * ys + f[0, 2]
    b = f[1, 0] * xs + f[1, 1] * ys + f[1, 2]
    # scale*c folded exactly into pixel units (avoids the /scale round-trip
    # that costs an ulp on the f32 path; the sweep's floor() is sensitive
    # to row-level flicker near integer line positions — callers should
    # pass F normalized to unit max-entry, see normalize_f).
    sc = (
        f[2, 0] * jnp.arange(w, dtype=jnp.float32)[None, :]
        + f[2, 1] * jnp.arange(h, dtype=jnp.float32)[:, None]
        + scale * f[2, 2]
    )
    a = jnp.broadcast_to(a, (h, w))
    b = jnp.broadcast_to(b, (h, w))
    sc = jnp.broadcast_to(sc, (h, w))
    if force_vert is None:
        vert = jnp.abs(a) > jnp.abs(b)
    else:
        vert = jnp.full((h, w), force_vert)
    denom = jnp.where(vert, a, b)
    safe = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    coeff = jnp.where(vert, -b, -a) / safe
    add = -sc / safe
    finite = jnp.isfinite(coeff) & jnp.isfinite(add) & (jnp.abs(denom) > 0)
    return {"vert": vert, "coeff": coeff, "add": add, "finite": finite}


def uniform_epipolar_axis(
    f: np.ndarray, scale: float, h: int, w: int
) -> str | None:
    """Host-side proof that epipolar_fields' per-pixel dominant axis is
    CONSTANT over the whole (h, w) grid — "vert"/"horiz" — or None.

    vert(p) = |a(p)| > |b(p)| with a, b affine in the pixel coords, and
    |a| > |b| iff (a-b)(a+b) > 0. An affine function with one strict
    sign at all four rect corners has that sign everywhere inside, so
    checking a-b and a+b at the corners (f64, with a margin covering the
    device's f32 evaluation error) decides the whole field. A uniform
    axis lets the perspective sweep compile the static-axis Pallas
    kernel variant (~2.7x less roll work than the per-pixel dual form,
    pallas_ncc._sweep_kernel) — the per-pixel test only matters for F's
    whose epipolar-line direction actually crosses the +-45deg locus
    inside the image. Conservative by construction: ties or thin margins
    return None and keep the exact per-pixel variant.
    """
    f = np.asarray(f, np.float64)
    d_vals, s_vals, mags = [], [], []
    for x in (0.0, (w - 1) / scale):
        for y in (0.0, (h - 1) / scale):
            a = f[0, 0] * x + f[0, 1] * y + f[0, 2]
            b = f[1, 0] * x + f[1, 1] * y + f[1, 2]
            d_vals.append(a - b)
            s_vals.append(a + b)
            mags.append(
                abs(f[0, 0] * x) + abs(f[0, 1] * y) + abs(f[0, 2])
                + abs(f[1, 0] * x) + abs(f[1, 1] * y) + abs(f[1, 2])
            )
    margin = 1e-4 * max(max(mags), 1e-30)
    d = np.asarray(d_vals)
    s = np.asarray(s_vals)
    if (
        np.all(np.abs(d) > margin)
        and np.all(np.abs(s) > margin)
        and np.all(np.sign(d) == np.sign(d[0]))
        and np.all(np.sign(s) == np.sign(s[0]))
    ):
        return "vert" if np.sign(d[0]) * np.sign(s[0]) > 0 else "horiz"
    return None


def _resolved_axis(
    wtr: tuple[str, int, int] | None, forced: str | None
) -> str | None:
    """The static epipolar axis a sweep will compile with: the
    gather-free warp bucket's axis when present (affine F), else the
    host-proven uniform axis (perspective F), else None (per-pixel)."""
    return wtr[0] if wtr is not None else forced


# ---------------------------------------------------------------------------
# First (coarsest) pass: exact all-pairs patch matmul


@functools.partial(jax.jit, static_argnames=("corridor_size", "row_chunk"))
def first_pass(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    f: jnp.ndarray,
    scale: float,
    threshold: float,
    min_stdev: float,
    corridor_size: int,
    row_chunk: int = 8,
) -> CorrelationState:
    """Full-corridor exact NCC search at the coarsest scale.

    corr(p, q) = <d1(p)/(121*s1), d2(q)/s2> over 11x11 zero-mean patches,
    computed as a blocked matmul; candidates masked to q on p's corridor
    band with |lateral offset| <= corridor_size and corridor index within
    [KS, dim - KS) (correlate_point's first-pass range, mod.rs:346-360).
    """
    h1, w1 = img1.shape
    h2, w2 = img2.shape
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    avg1, sd1, ok1 = window_stats(img1)
    avg2, sd2, ok2 = window_stats(img2)
    ep = epipolar_fields(f, h1, w1, scale)

    def patches(img, avg, sd, inv_n):
        # (H*W, 121) zero-mean patches; rows at margin pixels are garbage
        # and masked via validity.
        cols = []
        for dy in range(-KS, KS + 1):
            for dx in range(-KS, KS + 1):
                cols.append(jnp.roll(img, (-dy, -dx), axis=(0, 1)))
        p = jnp.stack(cols, axis=-1) - avg[:, :, None]
        denom = jnp.maximum(sd, 1e-12)[:, :, None]
        if inv_n:
            p = p / (denom * KPC)
        else:
            p = p / denom
        return p.reshape(-1, KPC)

    a1 = patches(img1, avg1, sd1, inv_n=True)  # (P1, 121)
    a2 = patches(img2, avg2, sd2, inv_n=False)  # (P2, 121)

    q_ys = jnp.arange(h2, dtype=jnp.float32)[:, None]
    q_xs = jnp.arange(w2, dtype=jnp.float32)[None, :]
    q_y = jnp.broadcast_to(q_ys, (h2, w2)).reshape(-1)
    q_x = jnp.broadcast_to(q_xs, (h2, w2)).reshape(-1)
    q_ok = (ok2 & (sd2 >= min_stdev)).reshape(-1)

    p_valid = (ok1 & (sd1 >= min_stdev) & ep["finite"]).reshape(-1)
    vert = ep["vert"].reshape(-1)
    coeff = ep["coeff"].reshape(-1)
    add = ep["add"].reshape(-1)

    cs = float(corridor_size)
    pad_rows = (-h1) % row_chunk
    total_rows = h1 + pad_rows

    def pack(x, fill=0):
        x = x.reshape(h1, w1, -1)
        x = jnp.pad(x, ((0, pad_rows), (0, 0), (0, 0)), constant_values=fill)
        return x.reshape(total_rows // row_chunk, row_chunk * w1, -1)

    a1_c = pack(a1)
    pv_c = pack(p_valid)[..., 0]
    vert_c = pack(vert)[..., 0]
    coeff_c = pack(coeff)[..., 0]
    add_c = pack(add)[..., 0]

    # Tile the CANDIDATE axis so the (chunk_rows, P2) correlation matrix
    # stays bounded: extreme aspect ratios (e.g. 64 x 4096, where the
    # pyramid cannot coarsen below scale_min_size) would otherwise
    # materialize a tens-of-GB intermediate. Square coarsest levels
    # (P2 <= the tile) keep a single tile — identical program to before.
    p2 = a2.shape[0]
    rows_per_chunk = row_chunk * w1
    cand_chunk = max(4096, (1 << 25) // max(rows_per_chunk, 1))
    cand_chunk = min(cand_chunk, p2)
    cand_pad = (-p2) % cand_chunk
    n_tiles = (p2 + cand_pad) // cand_chunk
    a2_t = jnp.pad(a2, ((0, cand_pad), (0, 0))).reshape(
        n_tiles, cand_chunk, KPC
    )
    q_y_t = jnp.pad(q_y, (0, cand_pad)).reshape(n_tiles, cand_chunk)
    q_x_t = jnp.pad(q_x, (0, cand_pad)).reshape(n_tiles, cand_chunk)
    q_ok_t = jnp.pad(q_ok, (0, cand_pad)).reshape(n_tiles, cand_chunk)

    def one_chunk(args):
        a1_b, pv_b, vert_b, coeff_b, add_b = args

        def cand_tile(carry, tile):
            bv, brank, bxc, byc = carry
            a2_b, qy_b, qx_b, qok_b = tile
            corr = jax.lax.dot_general(
                a1_b,
                a2_b.T,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (chunk, cand_chunk)

            # Corridor membership: for vert, i = y2 and the walked x is
            # floor(coeff*i + add) + o for o in [-cs, cs]; q belongs iff
            # x2 - floor(coeff*y2 + add) in [-cs, cs], y2 in [KS, h2-KS).
            i_coord = jnp.where(vert_b[:, None], qy_b[None, :], qx_b[None, :])
            off_coord = jnp.where(vert_b[:, None], qx_b[None, :], qy_b[None, :])
            line = jnp.floor(coeff_b[:, None] * i_coord + add_b[:, None])
            on_band = jnp.abs(off_coord - line) <= cs
            end = jnp.where(vert_b, float(h2 - KS), float(w2 - KS))
            in_range = (i_coord >= float(KS)) & (i_coord < end[:, None])

            ok = on_band & in_range & qok_b[None, :] & pv_b[:, None]
            ok &= corr >= threshold
            corr = jnp.where(ok, corr, -jnp.inf)
            val = jnp.max(corr, axis=1)
            # Equal-NCC ties resolve in the reference's WALK order — the
            # corridor-offset loop is outer, corridor index inner
            # (mod.rs:372-381, 457-458 `corr > best_corr` keeps the first)
            # — so among tied candidates the smallest lateral offset wins,
            # then the smallest corridor index. Encode that as a rank and
            # keep the min rank among the tile's maxima.
            dom_max = float(max(h2, w2))
            key = jnp.where(
                ok & (corr == val[:, None]),
                ((off_coord - line) + cs) * dom_max + i_coord,
                jnp.inf,
            )
            rank = jnp.min(key, axis=1)
            best = jnp.argmin(key, axis=1)
            better = (val > bv) | ((val == bv) & (rank < brank))
            bv = jnp.where(better, val, bv)
            brank = jnp.where(better, rank, brank)
            bxc = jnp.where(better, qx_b.astype(jnp.int32)[best], bxc)
            byc = jnp.where(better, qy_b.astype(jnp.int32)[best], byc)
            return (bv, brank, bxc, byc), None

        n_rows = a1_b.shape[0]
        init = (
            jnp.full((n_rows,), -jnp.inf, jnp.float32),
            jnp.full((n_rows,), jnp.inf, jnp.float32),
            jnp.zeros((n_rows,), jnp.int32),
            jnp.zeros((n_rows,), jnp.int32),
        )
        (bv, _, bxc, byc), _ = jax.lax.scan(
            cand_tile, init, (a2_t, q_y_t, q_x_t, q_ok_t)
        )
        return bv, bxc, byc

    best_corr, bx, by = jax.lax.map(
        one_chunk, (a1_c, pv_c, vert_c, coeff_c, add_c)
    )
    best_corr = best_corr.reshape(-1)[: h1 * w1].reshape(h1, w1)
    bx = bx.reshape(-1)[: h1 * w1].reshape(h1, w1)
    by = by.reshape(-1)[: h1 * w1].reshape(h1, w1)

    inv_s = jnp.round(1.0 / scale).astype(jnp.int32)
    valid = jnp.isfinite(best_corr)
    pos = jnp.stack([bx * inv_s, by * inv_s], axis=-1)
    return CorrelationState(
        pos=jnp.where(valid[:, :, None], pos, 0),
        corr=jnp.where(valid, best_corr, -1.0),
        valid=valid,
    )


# ---------------------------------------------------------------------------
# Search-range estimation from the previous scale


def _upsample2_shift(prev: jnp.ndarray, j: int, n_cur: int) -> jnp.ndarray:
    """prev[(p+1)//2 + j - 5] along the given (last) axis, zero-padded."""
    idx = (jnp.arange(n_cur) + 1) // 2 + (j - 5)
    ok = (idx >= 0) & (idx < prev.shape[-1])
    idx = jnp.clip(idx, 0, prev.shape[-1] - 1)
    return jnp.take(prev, idx, axis=-1), ok


def _neighbor_stats(prev: CorrelationState, h: int, w: int, scale: float):
    """Mean/stdev/count of neighbor match positions, both axes.

    The reference scans the full-res grid over [floor((p-10)/s),
    ceil((p+10)/s)) (correlation/mod.rs:481-517); entries exist only at
    multiples of 2/s (written by the previous scale), so the scan is
    exactly the previous-scale cells q in [ceil(p/2)-5, ceil(p/2)+4] —
    a fixed 10x10 window. Positions enter in current-scale units
    (scale * full-res position).

    Returns (count, mean_x, mean_y, var_x, var_y, mean_src_x, mean_src_y)
    at (h, w); mean_src_* are the mean current-scale coordinates of the
    CONTRIBUTING previous-scale cells (cell q sits at 2q current pixels) —
    the baseline that turns mean_x/mean_y into an unbiased local disparity
    (the window [ceil(p/2)-5, ceil(p/2)+4] is off-center, so mean_x - p
    carries a parity-dependent -0.5/-1 bias that mean_x - mean_src_x
    cancels).
    """
    # All coordinate accumulation is QUERY-RELATIVE: a contributing cell
    # q at window offset d = j - 5 sits at src = 2*q0 + 2*d with
    # q0 = ceil(p/2), so px - 2*q0 = (px - src_x) + 2*d — a small local
    # disparity plus a known per-offset constant. Accumulating absolute
    # coordinates instead makes the E[x^2] - E[x]^2 variance catastrophic
    # in f32 at multi-kilopixel image sizes (the reference computes this
    # in f64 with centered deltas, mod.rs:505-533); the relative form
    # keeps every accumulator O(disparity + 10) and f32-exact.
    px = prev.pos[:, :, 0].astype(jnp.float32) * scale
    py = prev.pos[:, :, 1].astype(jnp.float32) * scale
    hp, wp = prev.valid.shape
    src_x = jnp.broadcast_to(
        2.0 * jnp.arange(wp, dtype=jnp.float32)[None, :], (hp, wp)
    )
    src_y = jnp.broadcast_to(
        2.0 * jnp.arange(hp, dtype=jnp.float32)[:, None], (hp, wp)
    )
    v = prev.valid.astype(jnp.float32)
    ux = (px - src_x) * v  # local disparity of each contributing cell
    uy = (py - src_y) * v

    def up_axis1(arr, j):
        out, ok = _upsample2_shift(arr, j, w)
        return out * ok

    def up_axis0(arr, j):
        out, ok = _upsample2_shift(
            jnp.swapaxes(arr, 0, 1), j, h
        )
        return jnp.swapaxes(out * ok, 0, 1)

    # Separable accumulation: first expand columns for all jx into row
    # accumulators (x offsets weighted in here), then expand rows for all
    # jy (y offsets weighted in there).
    row_cnt = jnp.zeros((hp, w), jnp.float32)
    row_wx = jnp.zeros_like(row_cnt)   # sum of (ux + 2*dx)
    row_wx2 = jnp.zeros_like(row_cnt)  # sum of (ux + 2*dx)^2
    row_uy = jnp.zeros_like(row_cnt)
    row_uy2 = jnp.zeros_like(row_cnt)
    row_dxn = jnp.zeros_like(row_cnt)  # sum of dx (for mean_src_x)
    for jx in range(10):
        dx = float(jx - 5)
        vv = up_axis1(v, jx)
        uxv = up_axis1(ux, jx)
        row_cnt += vv
        row_wx += uxv + (2.0 * dx) * vv
        row_wx2 += (
            up_axis1(ux * ux, jx) + (4.0 * dx) * uxv + (4.0 * dx * dx) * vv
        )
        row_uy += up_axis1(uy, jx)
        row_uy2 += up_axis1(uy * uy, jx)
        row_dxn += dx * vv

    cnt = jnp.zeros((h, w), jnp.float32)
    wx = jnp.zeros_like(cnt)
    wx2 = jnp.zeros_like(cnt)
    wy = jnp.zeros_like(cnt)
    wy2 = jnp.zeros_like(cnt)
    dxn = jnp.zeros_like(cnt)
    dyn = jnp.zeros_like(cnt)
    for jy in range(10):
        dy = float(jy - 5)
        rc = up_axis0(row_cnt, jy)
        ruy = up_axis0(row_uy, jy)
        cnt += rc
        wx += up_axis0(row_wx, jy)
        wx2 += up_axis0(row_wx2, jy)
        wy += ruy + (2.0 * dy) * rc
        wy2 += (
            up_axis0(row_uy2, jy) + (4.0 * dy) * ruy + (4.0 * dy * dy) * rc
        )
        dxn += up_axis0(row_dxn, jy)
        dyn += dy * rc

    # Query base coordinate 2*q0 = 2*ceil(p/2), exact in f32.
    bx = (2.0 * ((jnp.arange(w) + 1) // 2)).astype(jnp.float32)[None, :]
    by = (2.0 * ((jnp.arange(h) + 1) // 2)).astype(jnp.float32)[:, None]
    n = jnp.maximum(cnt, 1.0)
    mx_rel = wx / n
    my_rel = wy / n
    mean_x = bx + mx_rel
    mean_y = by + my_rel
    var_x = jnp.maximum(wx2 / n - mx_rel * mx_rel, 0.0)
    var_y = jnp.maximum(wy2 / n - my_rel * my_rel, 0.0)
    mean_src_x = bx + 2.0 * dxn / n
    mean_src_y = by + 2.0 * dyn / n
    return cnt, mean_x, mean_y, var_x, var_y, mean_src_x, mean_src_y


_ANCHOR_BAND = 128


def _band_size(n: int) -> int:
    """Anchor-band width along an axis of length n. Shared by _band_means
    and _stripe_warps_fast — they MUST agree (the fast warp's per-band
    dynamic slices assume `center - dom` is constant within each band
    exactly as _band_means laid it out). Axes shorter than two bands
    collapse to a single global band."""
    return _ANCHOR_BAND if n >= 2 * _ANCHOR_BAND else max(n, 1)


def _band_means(disp: jnp.ndarray, weight: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Weighted mean of disp per _ANCHOR_BAND-wide band along `axis`,
    broadcast back to full shape; empty bands fall back to the global
    weighted mean. Images shorter than two bands along the axis get the
    single global mean (no band edges to cut NCC patches)."""
    h, w = disp.shape
    n = disp.shape[axis]
    b = _band_size(n)
    nb = (n + b - 1) // b
    pad = nb * b - n
    if axis == 0:
        dw = jnp.pad(disp * weight, ((0, pad), (0, 0))).reshape(nb, b, w)
        ww = jnp.pad(weight, ((0, pad), (0, 0))).reshape(nb, b, w)
        num = dw.sum(axis=(1, 2))
        den = ww.sum(axis=(1, 2))
    else:
        dw = jnp.pad(disp * weight, ((0, 0), (0, pad))).reshape(h, nb, b)
        ww = jnp.pad(weight, ((0, 0), (0, pad))).reshape(h, nb, b)
        num = dw.sum(axis=(0, 2))
        den = ww.sum(axis=(0, 2))
    g = jnp.sum(num) / jnp.maximum(jnp.sum(den), 1.0)
    band = jnp.where(den > 0, num / jnp.maximum(den, 1.0), g)
    full = jnp.repeat(band, b)[:n]
    return full[:, None] if axis == 0 else full[None, :]


def _corridor_ranges(
    ep,
    prev: CorrelationState,
    h: int,
    w: int,
    h2: int,
    w2: int,
    scale: float,
    min_range: float,
    extend_range: float,
):
    """Per-pixel corridor [start, end) along the dominant axis
    (correlation/mod.rs:468-540). Returns (start, length, has_neighbors)."""
    cnt, mean_x, mean_y, var_x, var_y, src_x, src_y = _neighbor_stats(
        prev, h, w, scale
    )
    vert = ep["vert"]
    # Corridor position of a neighbor match = its dominant-axis coordinate
    # minus `add`, with the dominant-axis coefficient being 1
    # (mod.rs:508-511 with coeff.y == 1 for vertical corridors).
    # For vert, corridor_pos = (y2 - add.y)/coeff.y with add.y == 0 and
    # coeff.y == 1 -> plain y2; horizontal likewise -> plain x2
    # (mod.rs:508-511).
    mid = jnp.where(vert, mean_y, mean_x)
    stdev = jnp.sqrt(jnp.where(vert, var_y, var_x))

    # The sweep anchors hypotheses at `center` (a smooth field that tracks
    # the epipolar-projected pixel position), NOT at `start`: the box
    # filter's locally-constant-flow requirement q(p+k) ~ q(p)+k only
    # holds for center-anchored candidates (`start` = center - length is
    # jagged because `length` varies pixel-to-pixel and clips at borders).
    #
    # Crucially the anchor must have SLOPE EXACTLY 1 along the dominant
    # axis — center(p+u) == center(p)+u across the whole 11x11 NCC
    # patch — or box11 blends intensities of adjacent hypotheses and
    # corrupts the NCC (measured: ~40% of refine winners off by +-1 px
    # vs the reference walk). No per-pixel anchor can satisfy this on a
    # gradient disparity field: round(any smooth field) bends every
    # 1/|grad| pixels, and most patches straddle a bend. So the anchor
    # is GLOBALLY linear: p_dom + round(mean disparity) (one scalar per
    # dominant-axis class), which makes the shifted base warp the exact
    # candidate patch at every pixel. The per-pixel [start, end) masks
    # still enforce the reference's corridors exactly, and the
    # data-driven window buckets absorb the scene's disparity spread
    # (wider spread -> wider static window, reference semantics intact).
    # The anchor offset is constant per 64-wide band of the NON-dominant
    # axis (rows for horizontal corridors): still exactly slope-1 along
    # the dominant axis, but it tracks the disparity trend across the
    # image (SEM tilt varies depth along the perpendicular axis), so the
    # static window only has to cover the per-band spread, not the whole
    # scene's. Patches straddling a band edge (11/64 of them) see at
    # most the small inter-band step.
    ys_dom = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs_dom = jnp.arange(w, dtype=jnp.float32)[None, :]
    dom = jnp.where(vert, ys_dom, xs_dom)
    disp = jnp.where(vert, mean_y - src_y, mean_x - src_x)
    hasf = (cnt > 0).astype(jnp.float32)
    vf = vert.astype(jnp.float32) * hasf
    hf = (1.0 - vert.astype(jnp.float32)) * hasf
    d_vert = _band_means(disp, vf, axis=1)  # vert: bands of columns
    d_horiz = _band_means(disp, hf, axis=0)  # horizontal: bands of rows
    center = dom + jnp.round(jnp.where(vert, d_vert, d_horiz))

    # Range bounds keep the reference's round(mid) anchor exactly
    # (mod.rs:530-538); the sweep's per-hypothesis idx_eval test enforces
    # them regardless of where the anchor sits. Rust f64::round is
    # half-AWAY-FROM-ZERO, not jnp.round's half-to-even — the difference
    # is systematic, not rare: with locally-constant disparity the
    # neighbor stdev is exactly 0 and the affine corridor length is
    # round(min_range) = round(2.5), which must be 3 (half-even gives 2,
    # silently shrinking every such corridor by a cell per side).
    ref_center = _round_half_away(mid)
    length = _round_half_away(min_range + stdev * extend_range)
    end_lim = jnp.where(vert, float(h2 - KS), float(w2 - KS))
    start = jnp.clip(ref_center - length, float(KS), end_lim)
    end = jnp.clip(ref_center + length, start, end_lim)
    has = cnt > 0
    return (
        center.astype(jnp.int32),
        start.astype(jnp.int32),
        end.astype(jnp.int32),
        has,
    )


# ---------------------------------------------------------------------------
# Refine pass: rectified-base hypothesis sweep (gather-free inner loop)


def _shift(x, u, axis):
    """x shifted so out(p) = x(p + u e_axis), zero-filled at edges; u static."""
    if u == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if u > 0:
        pad[axis] = (0, u)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(u, None)
    else:
        pad[axis] = (-u, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, u)
    return jnp.pad(x, pad)[tuple(sl)]


def warp_shift_range(
    f: np.ndarray, scale: float, h: int, w: int, h2: int, w2: int
) -> tuple[str, int, int] | None:
    """Host-side test: can the stripe base warps be built from shifts +
    selects instead of 2D gathers?

    XLA:TPU gathers cost ~15ns/element — the five 1-Mpix stripe gathers
    were 84 ms of the 114 ms refine step at 1024^2, dwarfing the sweep
    itself. For an affine F (zero 2x2 upper block, fundamentalmatrix.rs:
    260-286) the epipolar fields are globally linear: the dominant axis
    is uniform, the along-axis base coordinate is p + D_band (a dynamic
    slice per anchor band), and the perpendicular offset
    t = floor(coeff*center + add) - p_perp is bounded by corner
    evaluation plus |coeff|*Dmax. Returns ("vert"|"horiz", tmin, tmax)
    when the bound is tight enough for a select stack, else None (gather
    fallback; perspective F stays on the gather path).
    """
    fa = np.abs(np.asarray(f, np.float64))
    if fa[:2, :2].max() > 1e-9 * max(fa.max(), 1e-30):
        return None
    a = float(f[0, 2])
    b = float(f[1, 2])
    if a == 0.0 and b == 0.0:
        return None
    vert = abs(a) > abs(b)
    denom = a if vert else b
    coeff = (-b if vert else -a) / denom
    vals = []
    for x in (0.0, float(w - 1)):
        for y in (0.0, float(h - 1)):
            sc = f[2, 0] * x + f[2, 1] * y + scale * f[2, 2]
            add = -sc / denom
            if vert:
                vals.append(coeff * y + add - x)
            else:
                vals.append(coeff * x + add - y)
    # t deviates from the corner hull by |coeff|*D where D is the anchor
    # disparity (center = dom + band-mean disp, _corridor_ranges). disp =
    # mean - src with mean in img2's frame and src in img1's, so |D| is
    # bounded by the larger of BOTH images' extents along the dominant
    # axis — max(h2, w2) alone under-covers when image 1 is larger and
    # would let t escape the select range (silently sampling the tmin row).
    dmax = float(max(h, w, h2, w2))
    lo = min(vals) - abs(coeff) * dmax
    hi = max(vals) + abs(coeff) * dmax
    if not (np.isfinite(lo) and np.isfinite(hi)):
        return None
    tmin = int(np.floor(lo))
    tmax = int(np.floor(hi))
    if tmax - tmin + 1 > 8:
        return None
    return ("vert" if vert else "horiz", tmin, tmax)


def split_trange(
    trange: tuple[str, int, int] | None,
) -> tuple[tuple[str, int, int] | None, int]:
    """Split warp_shift_range's exact (axis, tmin, tmax) into a static
    structural bucket (axis, k_n, t_pad) plus the dynamic shift tmin.

    tmin/tmax are derived from F, so baking them into the compiled
    program as statics would recompile the whole dense pyramid for every
    image pair (multi-image runs correlate N*(N-1)/2 pairs). Only the
    *structure* — select count k_n and padding reach t_pad, bucketed to
    powers of two — shapes the program; tmin rides along as a traced
    scalar into the dynamic-slice starts. Pairs sharing shape buckets
    then share one compiled pyramid.
    """
    if trange is None:
        return None, 0
    axis, tmin, tmax = trange
    kn = tmax - tmin + 1
    # Floor the select count at 2 and the padding at 8: real scenes
    # straddle k_n = 1 vs 2 and small tmin values pair to pair (RANSAC's
    # F moves a little every run), and each distinct bucket is a fresh
    # ~45 s pyramid compile over the TPU tunnel. The floors cost one
    # extra slice+select per band (k) and ~8 zero rows of padding (t) —
    # noise next to the sweep — and collapse typical scenes onto ONE
    # (axis, 2, 8) bucket.
    kb = 2
    while kb < kn:
        kb *= 2
    tp = 8
    while tp < max(-tmin, tmin + kb - 1):
        tp *= 2
    return (axis, kb, tp), tmin


def _kernel_row_len(
    axis: str | None, h1: int, w1: int, h2: int, w2: int
) -> int:
    """Row length the Pallas sweep kernel actually sees for one sweep
    direction with source dims (h1, w1) and target dims (h2, w2):
    horizontal corridors transpose the whole problem onto the sublane
    axis (refine_pass_pallas), so their rows are image HEIGHTS. `axis`
    is the RESOLVED static axis (_resolved_axis)."""
    if axis == "horiz":
        return max(h1, h2)
    return max(w1, w2)


def _kernel_row_count(axis: str | None, h1: int, w1: int) -> int:
    """Number of rows the Pallas sweep kernel iterates for one sweep
    direction — the axis ncc_sweep_sharded shards over a mesh.
    Horizontal corridors transpose the problem, so their row count is
    the source image WIDTH."""
    if axis == "horiz":
        return w1
    return h1


def _stripe_warps_fast(
    img2f: jnp.ndarray,
    center: jnp.ndarray,
    t_src: jnp.ndarray,
    corridor_size: int,
    tmin,
    k_n: int,
    t_pad: int,
    h1: int,
) -> list[jnp.ndarray]:
    """Gather-free stripe base warps, dominant axis = columns (horizontal
    corridors): W0_o(y, x) = img2[y + t(y, x) + o, x + D_band(y)].

    Per anchor band (the same _ANCHOR_BAND banding as _corridor_ranges,
    where center == x + x_band by construction) one dynamic slice applies
    the along-axis offset D; the perpendicular offset t spans k_n values
    from dynamic tmin (a traced scalar folded into the slice start, see
    split_trange) realised as static row shifts of the slice combined
    with equality selects (none at all when k_n == 1, e.g. a rectified
    horizontal-shift pair). The vert case runs this on transposed arrays.
    """
    cs = corridor_size
    h2, w2 = img2f.shape
    w1 = center.shape[1]
    # Row pad covers the t/stripe reach plus any img1/img2 height
    # mismatch so no dynamic_slice start ever clamps (clamping would
    # silently misalign rows instead of reading the zero margin).
    # t_pad >= max(-tmin, tmin + k_n - 1) by split_trange's contract.
    pr = t_pad + cs + 1 + abs(h1 - h2)
    xp = max(w1, w2)
    imgp = jnp.pad(img2f, ((pr, pr), (xp, xp)))

    b = _band_size(h1)
    nb = (h1 + b - 1) // b

    tmin = jnp.int32(tmin)
    rows_idx = jnp.arange(h1, dtype=jnp.int32)[:, None]
    t_field = t_src - rows_idx - tmin  # (h1, w1) int32, tmin-relative

    stripe_bands: list[list[jnp.ndarray]] = [
        [] for _ in range(2 * cs + 1)
    ]
    for i in range(nb):
        r0 = i * b
        rows = min(b, h1 - r0)
        # D_band == center - x (center = x + D by construction); clamp so
        # a garbage previous-scale state can't push the slice start out
        # of the padded range (those candidates are inb-masked anyway).
        d_i = jnp.clip(center[r0, 0], -xp, xp + w2 - w1)
        blk = jax.lax.dynamic_slice(
            imgp,
            (jnp.int32(r0 - cs + pr) + tmin, jnp.int32(xp) + d_i),
            (rows + k_n - 1 + 2 * cs, w1),
        )
        t_band = t_field[r0 : r0 + rows]
        for oi, o in enumerate(range(-cs, cs + 1)):
            acc = None
            for k in range(k_n):
                off = k + o + cs
                sl = jax.lax.slice(
                    blk, (off, 0), (off + rows, w1)
                )
                if k_n == 1:
                    acc = sl
                else:
                    acc = sl if acc is None else jnp.where(
                        t_band == k, sl, acc
                    )
            stripe_bands[oi].append(acc)
    return [
        parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        for parts in stripe_bands
    ]


def _stripe_warps(
    img2f: jnp.ndarray,
    vert: jnp.ndarray,
    center: jnp.ndarray,
    base_x: jnp.ndarray,
    base_y: jnp.ndarray,
    corridor_size: int,
    h2: int,
    w2: int,
    warp_trange: tuple[str, int, int] | None,
    warp_tmin=0,
) -> list[jnp.ndarray]:
    """Stripe base-warp stack W0_o (one image per lateral stripe o).
    warp_trange (the static bucket from split_trange) selects the
    shift/select fast path, warp_tmin carries its dynamic shift; None
    gathers (correct for any epipolar geometry)."""
    cs = corridor_size
    if warp_trange is not None:
        axis, k_n, t_pad = warp_trange
        if axis == "horiz":
            return _stripe_warps_fast(
                img2f, center, base_y, cs, warp_tmin, k_n, t_pad,
                center.shape[0],
            )
        w0s_t = _stripe_warps_fast(
            img2f.T,
            center.T,
            base_x.T,
            cs,
            warp_tmin,
            k_n,
            t_pad,
            center.shape[1],
        )
        return [w.T for w in w0s_t]
    out = []
    for o in range(-cs, cs + 1):
        qx = base_x + jnp.where(vert, o, 0)
        qy = base_y + jnp.where(vert, 0, o)
        out.append(
            img2f[jnp.clip(qy, 0, h2 - 1), jnp.clip(qx, 0, w2 - 1)]
        )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("corridor_size", "window", "warp_trange"),
)
def refine_pass(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    prev: CorrelationState,
    f: jnp.ndarray,
    scale: float,
    threshold: float,
    min_stdev: float,
    min_range: float,
    extend_range: float,
    corridor_size: int,
    window: int,
    warp_trange: tuple[str, int, int] | None = None,
    warp_tmin=0,
) -> CorrelationState:
    """One refine-scale sweep. `window` is the static corridor half-width
    bucket; per-pixel ranges beyond it are truncated (callers pick the
    bucket from the observed maximum). warp_trange is split_trange's
    static bucket, warp_tmin its traced shift.

    TPU structure (XLA:TPU gathers cost ~15ns/element, rolls are ~free):
    gather the *base* warp W0_o(p) = img2[candidate at center(p), stripe o]
    once per lateral stripe (2*cs+1 gathers total), then every corridor
    hypothesis u is a static shift of W0 along the dominant axis — because
    `center` tracks the epipolar-projected pixel position, center(p+u*e)
    ~= center(p)+u, so the shifted base IS the u-offset candidate (the
    recorded positions use the shifted exact candidate fields, so only the
    sampled intensities — not the geometry — carry the approximation).
    NCC normalizes against the warp's own box statistics (Cauchy-Schwarz
    bounds it by 1 even where the field bends); the reference's
    sigma2-at-q >= min_stdev test (mod.rs:439) becomes sigma_W >= min_stdev
    on the same samples.
    """
    h1, w1 = img1.shape
    h2, w2 = img2.shape
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    avg1, sd1, ok1 = window_stats(img1)
    ep = epipolar_fields(
        f, h1, w1, scale,
        force_vert=None if warp_trange is None else warp_trange[0] == "vert",
    )
    center, start, end, has = _corridor_ranges(
        ep, prev, h1, w1, h2, w2, scale, min_range, extend_range
    )

    p_ok = ok1 & (sd1 >= min_stdev) & ep["finite"] & has
    vert = ep["vert"]
    coeff = ep["coeff"]
    add = ep["add"]

    # Base candidate (corridor index = center) per pixel and stripe.
    c_f = center.astype(jnp.float32)
    off0 = jnp.floor(coeff * c_f + add).astype(jnp.int32)
    base_x = jnp.where(vert, off0, center)
    base_y = jnp.where(vert, center, off0)

    n_o = 2 * corridor_size + 1
    w0s = _stripe_warps(
        img2, vert, center, base_x, base_y, corridor_size, h2, w2,
        warp_trange, warp_tmin,
    )
    qxs, qys, inbs, avgqs, sdqs = [], [], [], [], []
    for oi, o in enumerate(range(-corridor_size, corridor_size + 1)):
        qx = base_x + jnp.where(vert, o, 0)
        qy = base_y + jnp.where(vert, 0, o)
        inb = (qx >= KS) & (qx < w2 - KS) & (qy >= KS) & (qy < h2 - KS)
        qxs.append(qx)
        qys.append(qy)
        inbs.append(inb)
        # Candidate-window stats from the warp's own box sums. Under the
        # globally-linear anchor the warp equals img2 around every
        # in-range candidate, so these ARE the reference's precomputed
        # avg/stdev at q (mod.rs:435-441) — verified equal to gathered
        # img2 stats on the golden scene.
        avg_o = _box11(w0s[oi]) / KPC
        avgqs.append(avg_o)
        sdqs.append(jnp.sqrt(jnp.maximum(
            _box11(w0s[oi] * w0s[oi]) / KPC - avg_o * avg_o, 0.0
        )))

    ys_idx = jnp.arange(h1, dtype=jnp.int32)[:, None]
    xs_idx = jnp.arange(w1, dtype=jnp.int32)[None, :]
    inv_sd1 = 1.0 / jnp.maximum(sd1, 1e-12)

    # The u sweep runs as a lax.scan with dynamic slices of window-padded
    # stacks (a compact program XLA compiles once; an unrolled sweep
    # produces multi-thousand-op graphs). Stripe-major, offset-minor — the
    # reference's walk order (mod.rs:372-381); strictly-greater updates
    # keep the first maximum.
    pad_w = window
    center_f32 = center.astype(jnp.float32)

    best = (
        jnp.full((h1, w1), -jnp.inf, jnp.float32),
        jnp.zeros((h1, w1), jnp.int32),
        jnp.zeros((h1, w1), jnp.int32),
    )
    us = jnp.arange(-window, window + 1, dtype=jnp.int32)

    vert_f32 = vert.astype(jnp.float32) if warp_trange is None else None

    for oi in range(n_o):
        planes = [
            w0s[oi],
            avgqs[oi],
            sdqs[oi],
            qxs[oi].astype(jnp.float32),
            qys[oi].astype(jnp.float32),
            inbs[oi].astype(jnp.float32),
            center_f32,
        ]
        if vert_f32 is not None:
            # Per-pixel-axis sweeps also carry the dominant-axis field so
            # hypotheses sourced from pixels whose axis differs from p's
            # (near the |f02| == |f12| locus of a perspective F) can be
            # rejected — their candidate lies on the WRONG epipolar line.
            planes.append(vert_f32)
        n_pl = len(planes)
        stacked = jnp.stack(planes)
        pstack = jnp.pad(
            stacked, ((0, 0), (pad_w, pad_w), (pad_w, pad_w))
        )

        def step(carry, u, pstack=pstack, n_pl=n_pl):
            best_corr, best_x, best_y = carry
            # out(p) = x(p + u e_axis): slice at row offset pad+u or col
            # offset pad+u, selected per pixel by the dominant axis —
            # statically when warp_trange pins the axis (affine F), which
            # halves the slice traffic and drops the select.
            zero = jnp.int32(0)
            pw = jnp.int32(pad_w)
            if warp_trange is not None:
                if warp_trange[0] == "vert":
                    sl = jax.lax.dynamic_slice(
                        pstack, (zero, pw + u, pw), (n_pl, h1, w1)
                    )
                else:
                    sl = jax.lax.dynamic_slice(
                        pstack, (zero, pw, pw + u), (n_pl, h1, w1)
                    )
            else:
                sl_y = jax.lax.dynamic_slice(
                    pstack, (zero, pw + u, pw), (n_pl, h1, w1)
                )
                sl_x = jax.lax.dynamic_slice(
                    pstack, (zero, pw, pw + u), (n_pl, h1, w1)
                )
                sl = jnp.where(vert[None], sl_y, sl_x)
            wr, avg_w, sd_w, qxf, qyf, inbr, idx_eval = (
                sl[0], sl[1], sl[2], sl[3], sl[4], sl[5], sl[6]
            )

            cross = _box11(img1 * wr)
            corr = (cross / KPC - avg1 * avg_w) * inv_sd1 / jnp.maximum(
                sd_w, 1e-12
            )

            # Source-shift validity is [KS, dim-KS), not [0, dim): the
            # warp's box statistics at shifted index p+u are exact only
            # where the 11x11 box stays inside the warp plane — outside
            # that band they would mix zero padding / wrapped rows
            # (documented deviation: the reference evaluates these
            # border-band candidates with exact img2-side stats; this
            # implementation drops them instead of mis-scoring them).
            if warp_trange is not None:
                src_ok = (
                    (ys_idx + u >= KS) & (ys_idx + u < h1 - KS)
                    if warp_trange[0] == "vert"
                    else (xs_idx + u >= KS) & (xs_idx + u < w1 - KS)
                )
            else:
                src_ok = jnp.where(
                    vert,
                    (ys_idx + u >= KS) & (ys_idx + u < h1 - KS),
                    (xs_idx + u >= KS) & (xs_idx + u < w1 - KS),
                )
            ok = (
                src_ok
                & (inbr > 0.5)
                & (idx_eval >= start)
                & (idx_eval < end)
                & p_ok
                & (sd_w >= min_stdev)
                & (corr >= threshold)
            )
            if warp_trange is None:
                # Reject hypotheses sourced from pixels whose dominant
                # axis differs from p's (see the planes comment above).
                ok &= jnp.abs(sl[7] - vert_f32) < 0.5
            corr = jnp.where(ok, corr, -jnp.inf)
            upd = corr > best_corr
            return (
                jnp.where(upd, corr, best_corr),
                jnp.where(upd, qxf.astype(jnp.int32), best_x),
                jnp.where(upd, qyf.astype(jnp.int32), best_y),
            ), None

        best, _ = jax.lax.scan(step, best, us)

    best_corr, best_x, best_y = best

    inv_s = jnp.round(1.0 / scale).astype(jnp.int32)
    valid = jnp.isfinite(best_corr)
    pos = jnp.stack([best_x * inv_s, best_y * inv_s], axis=-1)
    return CorrelationState(
        pos=jnp.where(valid[:, :, None], pos, 0),
        corr=jnp.where(valid, best_corr, -1.0),
        valid=valid,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "corridor_size", "window", "interpret", "threshold", "min_stdev",
        "warp_trange", "mesh", "force_axis",
    ),
)
def refine_pass_pallas(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    prev: CorrelationState,
    f: jnp.ndarray,
    scale: float,
    threshold: float,
    min_stdev: float,
    min_range: float,
    extend_range: float,
    corridor_size: int,
    window: int,
    interpret: bool = False,
    warp_trange: tuple[str, int, int] | None = None,
    warp_tmin=0,
    mesh=None,
    force_axis: str | None = None,
) -> CorrelationState:
    """refine_pass with the sweep running as the Pallas kernel
    (ops.pallas_ncc.ncc_sweep): same prologue (stats, epipolar fields,
    corridor ranges, per-stripe base-warp gathers), on-chip hypothesis
    loop. Math-identical to refine_pass (tested via interpret mode).

    With a mesh, the prologue runs under GSPMD (row-sharded by the
    caller's constraints) and the sweep itself runs as
    pallas_ncc.ncc_sweep_sharded — every device executes the kernel on
    its row shard with ppermute halo exchange, so multi-chip takes the
    SAME hot path as one chip."""
    from cybervision_tpu.ops import pallas_ncc

    axis = _resolved_axis(warp_trange, force_axis)
    if axis == "horiz":
        # Horizontal corridors sweep u along image columns — the lane
        # dimension, where TPU dynamic rotates cost a cross-lane shuffle
        # per step. Transpose the whole problem (F -> S F S with S the
        # x/y swap) so the kernel's u rolls ride the cheap sublane axis;
        # the stripe-warp prologue double-transposes back to row-major
        # internally, so only the kernel sees the transposed layout.
        # Covers both static-axis sources: the affine warp bucket and a
        # host-proven uniform perspective axis (uniform_epipolar_axis).
        swap = jnp.asarray(
            [[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
            f.dtype,
        )
        out = refine_pass_pallas(
            img1.T,
            img2.T,
            CorrelationState(
                pos=prev.pos.transpose(1, 0, 2)[:, :, ::-1],
                corr=prev.corr.T,
                valid=prev.valid.T,
            ),
            swap @ f @ swap,
            scale,
            threshold,
            min_stdev,
            min_range,
            extend_range,
            corridor_size,
            window,
            interpret=interpret,
            warp_trange=(
                None if warp_trange is None else ("vert",) + warp_trange[1:]
            ),
            warp_tmin=warp_tmin,
            mesh=mesh,
            force_axis=None if warp_trange is not None else "vert",
        )
        return CorrelationState(
            pos=out.pos.transpose(1, 0, 2)[:, :, ::-1],
            corr=out.corr.T,
            valid=out.valid.T,
        )

    h1, w1 = img1.shape
    h2, w2 = img2.shape
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    avg1, sd1, ok1 = window_stats(img1)
    ep = epipolar_fields(
        f, h1, w1, scale,
        force_vert=None if axis is None else axis == "vert",
    )
    center, start, end, has = _corridor_ranges(
        ep, prev, h1, w1, h2, w2, scale, min_range, extend_range
    )
    p_ok = ok1 & (sd1 >= min_stdev) & ep["finite"] & has
    vert = ep["vert"]

    c_f = center.astype(jnp.float32)
    off0 = jnp.floor(ep["coeff"] * c_f + ep["add"]).astype(jnp.int32)
    base_x = jnp.where(vert, off0, center)
    base_y = jnp.where(vert, center, off0)
    w0 = jnp.stack(_stripe_warps(
        img2, vert, center, base_x, base_y, corridor_size, h2, w2,
        warp_trange, warp_tmin,
    ))

    sweep_fn = (
        pallas_ncc.ncc_sweep
        if mesh is None
        else functools.partial(pallas_ncc.ncc_sweep_sharded, mesh)
    )
    best_corr, best_x, best_y = sweep_fn(
        img1,
        vert.astype(jnp.float32),
        c_f,
        ep["coeff"],
        ep["add"],
        avg1,
        1.0 / jnp.maximum(sd1, 1e-12),
        start.astype(jnp.float32),
        end.astype(jnp.float32),
        p_ok.astype(jnp.float32),
        w0,
        threshold=threshold,
        min_stdev=min_stdev,
        window=window,
        corridor_size=corridor_size,
        h2=h2,
        w2=w2,
        interpret=interpret,
        # A static axis (the affine warp bucket's, or a host-proven
        # uniform perspective axis) compiles only that axis's rolls —
        # ~2.7x less roll work than the per-pixel dual variant.
        axis=axis,
    )

    inv_s = jnp.round(1.0 / scale).astype(jnp.int32)
    valid = jnp.isfinite(best_corr)
    pos = jnp.stack([best_x * inv_s, best_y * inv_s], axis=-1)
    return CorrelationState(
        pos=jnp.where(valid[:, :, None], pos, 0),
        corr=jnp.where(valid, best_corr, -1.0),
        valid=valid,
    )


@functools.partial(
    jax.jit, static_argnames=("h", "w", "h2", "w2", "fv_f", "fv_r")
)
def max_corridor_halfwidth_pair(
    prev_f: CorrelationState,
    prev_r: CorrelationState,
    f_fwd: jnp.ndarray,
    f_rev: jnp.ndarray,
    scale: float,
    min_range: float,
    extend_range: float,
    *,
    h: int,
    w: int,
    h2: int,
    w2: int,
    fv_f: bool | None = None,
    fv_r: bool | None = None,
):
    """Both directions' window buckets in one dispatch (scalar fetches on
    the TPU tunnel cost ~30 ms each)."""
    a = max_corridor_halfwidth(
        prev_f, f_fwd, scale, min_range, extend_range, h=h, w=w, h2=h2,
        w2=w2, force_vert=fv_f,
    )
    b = max_corridor_halfwidth(
        prev_r, f_rev, scale, min_range, extend_range, h=h2, w=w2, h2=h,
        w2=w, force_vert=fv_r,
    )
    return jnp.stack([a, b])


@functools.partial(
    jax.jit, static_argnames=("h", "w", "h2", "w2", "force_vert")
)
def max_corridor_halfwidth(
    prev: CorrelationState,
    f: jnp.ndarray,
    scale: float,
    min_range: float,
    extend_range: float,
    *,
    h: int,
    w: int,
    h2: int,
    w2: int,
    force_vert: bool | None = None,
):
    """Maximum center-relative reach of any pixel's corridor — picks the
    static sweep window bucket.

    force_vert MUST match the axis the sweep will be forced onto
    (warp_trange): measuring reach on a different per-pixel axis field
    than the sweep uses could under-size the bucket near the
    |f02| == |f12| locus and silently truncate corridors."""
    ep = epipolar_fields(f, h, w, scale, force_vert=force_vert)
    center, start, end, has = _corridor_ranges(
        ep, prev, h, w, h2, w2, scale, min_range, extend_range
    )
    reach = jnp.maximum(center - start, end - 1 - center)
    return jnp.max(jnp.where(has, reach, 0))


# ---------------------------------------------------------------------------
# Cross-check filter


def _dilate9(x, reduce_fn, fill):
    """9x9 window reduce, separable static shifts (edge-filled)."""

    def pass_axis(v, axis):
        n = v.shape[axis]
        idx = jnp.arange(n)
        idx = idx[:, None] if axis == 0 else idx[None, :]
        out = v
        for d in range(-4, 5):
            if d == 0:
                continue
            s = _shift(v, d, axis)
            s = jnp.where((idx + d >= 0) & (idx + d < n), s, fill)
            out = reduce_fn(out, s)
        return out

    return pass_axis(pass_axis(x, 0), 1)


@jax.jit
def cross_check(
    state: CorrelationState, reverse: CorrelationState, scale: float
) -> CorrelationState:
    """Mutual-consistency filter (correlation/mod.rs:552-624), fast form.

    The reference keeps a forward match m at pixel p iff some reverse cell
    q within +-4*(1/scale) full-res units of m points back within the same
    radius of p; grids only hold entries at multiples of 1/scale, so the q
    window is exactly +-4 cells at the current scale.

    TPU form: precompute per reverse cell the min/max back-pointer bounds
    over its +-4 window (static-shift dilations), then test the interval
    overlap with one gather at m. This is a relaxation — the x and y
    bounds may come from different neighbors, so a few extra matches
    survive compared to cross_check_exact (used by the parity tests); the
    survivors are still mutually consistent per axis.
    """
    h, w = state.corr.shape
    hr, wr = reverse.corr.shape
    inv_s = jnp.round(1.0 / scale).astype(jnp.int32)
    sa = 4 * inv_s  # full-res units

    big = jnp.int32(2**30)
    rx = jnp.where(reverse.valid, reverse.pos[:, :, 0], big)
    ry = jnp.where(reverse.valid, reverse.pos[:, :, 1], big)
    lox = _dilate9(rx, jnp.minimum, big)
    loy = _dilate9(ry, jnp.minimum, big)
    rx = jnp.where(reverse.valid, reverse.pos[:, :, 0], -big)
    ry = jnp.where(reverse.valid, reverse.pos[:, :, 1], -big)
    hix = _dilate9(rx, jnp.maximum, -big)
    hiy = _dilate9(ry, jnp.maximum, -big)

    mx = jnp.clip(state.pos[:, :, 0] // inv_s, 0, wr - 1)
    my = jnp.clip(state.pos[:, :, 1] // inv_s, 0, hr - 1)
    g_lox = lox[my, mx]
    g_hix = hix[my, mx]
    g_loy = loy[my, mx]
    g_hiy = hiy[my, mx]

    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    p_fx = xs * inv_s
    p_fy = ys * inv_s
    found = (
        (g_lox < p_fx + sa + 1)
        & (g_hix >= p_fx - sa)
        & (g_loy < p_fy + sa + 1)
        & (g_hiy >= p_fy - sa)
    )

    keep = state.valid & found
    return CorrelationState(
        pos=jnp.where(keep[:, :, None], state.pos, 0),
        corr=jnp.where(keep, state.corr, -1.0),
        valid=keep,
    )


@jax.jit
def cross_check_exact(
    state: CorrelationState, reverse: CorrelationState, scale: float
) -> CorrelationState:
    """Reference-exact mutual-consistency filter (correlation/mod.rs:552-624).

    Packed single-gather form (VERDICT r4 next #5: the original 3-plane
    x 81-offset form cost 8.6 s at 1024^2 — 243 int64-index gathers
    under jax_enable_x64). Grid entries are full-res multiples of
    1/scale, so the +-sa box test is EXACTLY a +-4 test on back-pointer
    CELL coordinates: |back(q)//inv_s - p_cell| <= 4 per axis (for
    inv_s >= 1 integer grids, bx*inv_s < p_fx + 4*inv_s + 1 iff
    bx <= p_cell + 4). That packs (valid, bx, by) into ONE int32 plane
    (13+13+1 bits; cell coords < 8192 for any supported image), so the
    9x9 window costs 81 int32 gathers instead of 243 — and the per-
    offset bounds tests become one unpacked comparison each.
    """
    h, w = state.corr.shape
    hr, wr = reverse.corr.shape
    inv_s = jnp.round(1.0 / scale).astype(jnp.int32)

    # Packed reverse plane: valid | bx<<1 | by<<14 (cell units).
    bx = (reverse.pos[:, :, 0] // inv_s).astype(jnp.int32)
    by = (reverse.pos[:, :, 1] // inv_s).astype(jnp.int32)
    packed = jnp.where(
        reverse.valid,
        jnp.int32(1)
        + jnp.left_shift(bx, 1)
        + jnp.left_shift(by, 14),
        jnp.int32(0),
    )

    # 81 pre-SHIFTED planes + ONE multi-row slice gather: the gather is
    # index-rate-bound with free payload width (measured ~30 ms for 1M
    # indices whether fetching 2 or 88 rows), so fetching every window
    # offset's plane with one shared (my, mx) index beats 81 separate
    # gathers ~80x. Zero-padding the shift folds the in-bounds test
    # into the packed validity bit.
    # Shifts as rolls + edge masks (pad+slice planes relayout at
    # lane-unaligned offsets — ~200 ms of the pass); wrapped entries are
    # zeroed (invalid), folding the window's in-bounds test in.
    yi = jnp.arange(hr, dtype=jnp.int32)[:, None]
    xi = jnp.arange(wr, dtype=jnp.int32)[None, :]
    planes = []
    for dy in range(-4, 5):
        in_y = (yi + dy >= 0) & (yi + dy < hr)
        for dx in range(-4, 5):
            in_x = (xi + dx >= 0) & (xi + dx < wr)
            p = jnp.roll(packed, (-dy, -dx), (0, 1))
            planes.append(
                jnp.where(in_y & in_x, p, jnp.int32(0)).reshape(-1)
            )
    # concatenate + reshape, NOT jnp.stack: stacking via (1, hr*wr)
    # expansions handed XLA a transposed {0,1} layout whose 8x128 tiling
    # padded each plane 128x (512 MB apiece — a 41 GB program).
    tbl = jnp.concatenate(planes).reshape(len(planes), hr * wr)

    mx = jnp.clip(state.pos[:, :, 0] // inv_s, 0, wr - 1).astype(jnp.int32)
    my = jnp.clip(state.pos[:, :, 1] // inv_s, 0, hr - 1).astype(jnp.int32)
    flat = (my * wr + mx).reshape(-1)
    g = jnp.take(tbl, flat, axis=1)  # (81, h*w)

    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    xf = jnp.broadcast_to(xs, (h, w)).reshape(-1)
    yf = jnp.broadcast_to(ys, (h, w)).reshape(-1)
    # Row-at-a-time compare: a broadcast (81, h*w) comparison block made
    # XLA materialize tens of GB of intermediates; per-row the live set
    # is a few (h*w,) vectors.
    found = jnp.zeros((h * w,), bool)
    for d in range(len(planes)):
        pk = g[d]
        r_valid = jnp.bitwise_and(pk, 1) == 1
        gbx = jnp.bitwise_and(jnp.right_shift(pk, 1), 0x1FFF)
        gby = jnp.right_shift(pk, 14)
        found |= (
            r_valid
            & (gbx >= xf - 4)
            & (gbx <= xf + 4)
            & (gby >= yf - 4)
            & (gby <= yf + 4)
        )
    found = found.reshape(h, w)

    keep = state.valid & found
    return CorrelationState(
        pos=jnp.where(keep[:, :, None], state.pos, 0),
        corr=jnp.where(keep, state.corr, -1.0),
        valid=keep,
    )


# ---------------------------------------------------------------------------
# Host driver


def optimal_scale_steps(dimensions: tuple[int, int], cfg=CorrelationConfig()):
    from cybervision_tpu.config import optimal_scale_steps as oss

    return oss(dimensions, cfg.scale_min_size)


def _pyramid_level_body(
    im1,
    im2,
    state_f,
    state_r,
    f_fwd,
    f_rev,
    scale,
    threshold,
    min_stdev,
    min_range,
    extend_range,
    corridor_size: int,
    window_f: int,
    window_r: int,
    first: bool,
    use_pallas: bool = False,
    mesh=None,
    exact_cross_check: bool = False,
    warp_trange_f: tuple[str, int, int] | None = None,
    warp_trange_r: tuple[str, int, int] | None = None,
    warp_tmin_f=0,
    warp_tmin_r=0,
    pallas_interpret: bool = False,
    force_axis_f: str | None = None,
    force_axis_r: str | None = None,
):
    """One full pyramid level — forward + reverse sweeps and both
    cross-checks fused into a single program (each dispatch over the TPU
    tunnel costs 10-30 ms; a level is 6 logical steps).

    When a mesh is given, every per-level array is pinned row-sharded
    over its 'dev' axis: the Pallas sweep runs per-device with ppermute
    halo exchange (ncc_sweep_sharded); the scan-path sweeps' shifted
    windows and box filters get halo collective-permutes from GSPMD,
    and the cross-check's +-4-cell dilations likewise — the multi-chip
    spatial-parallel path.
    """
    if mesh is not None:
        from cybervision_tpu.parallel import constrain_rows

        im1, im2, state_f, state_r = constrain_rows(
            mesh, (im1, im2, state_f, state_r)
        )
    if first:
        state_f = first_pass(
            im1, im2, f_fwd, scale, threshold, min_stdev, corridor_size
        )
        state_r = first_pass(
            im2, im1, f_rev, scale, threshold, min_stdev, corridor_size
        )
    else:
        sweep = (
            functools.partial(
                refine_pass_pallas, mesh=mesh, interpret=pallas_interpret
            )
            if use_pallas
            else refine_pass
        )
        kw_f = {"force_axis": force_axis_f} if use_pallas else {}
        kw_r = {"force_axis": force_axis_r} if use_pallas else {}
        state_f = sweep(
            im1, im2, state_f, f_fwd, scale, threshold, min_stdev,
            min_range, extend_range, corridor_size, window_f,
            warp_trange=warp_trange_f, warp_tmin=warp_tmin_f, **kw_f,
        )
        state_r = sweep(
            im2, im1, state_r, f_rev, scale, threshold, min_stdev,
            min_range, extend_range, corridor_size, window_r,
            warp_trange=warp_trange_r, warp_tmin=warp_tmin_r, **kw_r,
        )
    check = cross_check_exact if exact_cross_check else cross_check
    state_f = check(state_f, state_r, scale)
    state_r = check(state_r, state_f, scale)
    if mesh is not None:
        from cybervision_tpu.parallel import constrain_rows

        state_f, state_r = constrain_rows(mesh, (state_f, state_r))
    return state_f, state_r


pyramid_level_step = functools.partial(
    jax.jit,
    static_argnames=(
        "corridor_size", "window_f", "window_r", "first", "use_pallas",
        "threshold", "min_stdev", "mesh", "exact_cross_check",
        "warp_trange_f", "warp_trange_r", "pallas_interpret",
        "force_axis_f", "force_axis_r",
    ),
)(_pyramid_level_body)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "corridor_size", "threshold", "min_stdev",
        "exact_cross_check", "mesh", "pallas_interpret", "next_level",
    ),
)
def pyramid_program(
    full1,
    full2,
    f_fwd,
    f_rev,
    tmins,
    levels,
    threshold,
    min_stdev,
    min_range,
    extend_range,
    corridor_size: int,
    exact_cross_check: bool,
    mesh=None,
    pallas_interpret: bool = False,
    next_level: tuple | None = None,
):
    """The coarse part of the pyramid as ONE program.

    With a fixed corridor window there are no host decisions between
    levels, so fusing them removes the per-level program-send latency of
    the TPU tunnel (~10-30 ms each; the reference instead fences every
    kernel dispatch, vulkan.rs:947-948). `levels` is a static tuple of
    (scale, use_pallas, window_f, window_r, warp_trange_f, warp_trange_r)
    coarse->fine, where the tranges are split_trange buckets — so the
    static key depends only on image dimensions, and every pair of a
    multi-image run reuses one compiled program. `tmins` is the
    (n_levels, 2) int32 array of dynamic warp shifts [fwd, rev]; device
    resizes happen inside.

    Returns (state_f, state_r, reaches): reaches is an int32 vector of
    the max per-pixel corridor half-width each refine level actually
    wanted (len(levels)-1 entries, max over both directions), plus — when
    `next_level` = (scale, fv_f, fv_r) names the level the CALLER will
    run next — a final (fwd, rev) PAIR of that level's required
    half-widths computed from the final states. The caller fetches this
    small vector once and picks the next level's exact window buckets, so
    the fixed window never silently truncates below the largest
    configured bucket (reference corridors grow unbounded with neighbor
    stdev, correlation/mod.rs:530-538; a reach beyond
    corridor_window_buckets[-1] clamps there — shared with the
    data-driven path — and sets plan['reach_capped']). The
    reach reductions reuse the sweeps' own corridor-range subgraphs (CSE
    within the one program).
    """
    state_f = state_r = empty_state(2, 2)
    reaches = []
    for si, (
        scale, lvl_pallas, win_f, win_r, wtr_f, wtr_r, ax_f, ax_r
    ) in enumerate(levels):
        im1 = _device_resize(full1, scale)
        im2 = _device_resize(full2, scale)
        rax_f = _resolved_axis(wtr_f, ax_f)
        rax_r = _resolved_axis(wtr_r, ax_r)
        if si > 0:
            halves = max_corridor_halfwidth_pair(
                state_f, state_r, f_fwd, f_rev, scale, min_range,
                extend_range,
                h=im1.shape[0], w=im1.shape[1],
                h2=im2.shape[0], w2=im2.shape[1],
                fv_f=None if rax_f is None else rax_f == "vert",
                fv_r=None if rax_r is None else rax_r == "vert",
            )
            reaches.append(jnp.max(halves).astype(jnp.int32))
        state_f, state_r = _pyramid_level_body(
            im1, im2, state_f, state_r, f_fwd, f_rev, scale, threshold,
            min_stdev, min_range, extend_range, corridor_size, win_f,
            win_r,
            first=si == 0,
            use_pallas=lvl_pallas,
            mesh=mesh,
            exact_cross_check=exact_cross_check,
            warp_trange_f=wtr_f,
            warp_trange_r=wtr_r,
            warp_tmin_f=tmins[si, 0],
            warp_tmin_r=tmins[si, 1],
            pallas_interpret=pallas_interpret,
            force_axis_f=ax_f,
            force_axis_r=ax_r,
        )
    if next_level is not None:
        nscale, fv_f, fv_r = next_level
        nh1, nw1 = _resized_shape(full1.shape, nscale)
        nh2, nw2 = _resized_shape(full2.shape, nscale)
        halves = max_corridor_halfwidth_pair(
            state_f, state_r, f_fwd, f_rev, nscale, min_range,
            extend_range, h=nh1, w=nw1, h2=nh2, w2=nw2,
            fv_f=fv_f, fv_r=fv_r,
        )
        reaches.extend([halves[0].astype(jnp.int32),
                        halves[1].astype(jnp.int32)])
    if reaches:
        return state_f, state_r, jnp.stack(reaches)
    return state_f, state_r, jnp.zeros((0,), jnp.int32)


class _BandProgress:
    """Rescales a nested stage's [0, 1] progress into [lo, hi] of the
    outer listener (the reference rescales per-level progress the same
    way, reconstruction.rs:866-893)."""

    def __init__(self, inner, lo: float, hi: float):
        self._inner = inner
        self._lo = lo
        self._span = hi - lo

    def report_status(self, pos: float) -> None:
        pos = min(max(pos, 0.0), 1.0)
        self._inner.report_status(self._lo + self._span * pos)


def normalize_f(f: np.ndarray) -> np.ndarray:
    """Scale F to unit maximum entry (f64). F is only defined up to scale;
    unit-normalizing keeps the f32 per-pixel line evaluation exact for
    clean geometries (e.g. SEM pairs whose F entries are equal-magnitude),
    where an arbitrary scale leaves ulp-level noise that flips floor() row
    assignments pixel to pixel."""
    f = np.asarray(f, np.float64)
    m = np.abs(f).max()
    return f / m if m > 0 else f


def correlate_images(
    src1,
    src2,
    f: np.ndarray,
    projection: ProjectionMode,
    cfg: CorrelationConfig = CorrelationConfig(),
    progress=None,
    device_out: bool = False,
) -> np.ndarray:
    """Full coarse-to-fine correlation of an image pair
    (reconstruction.rs:528-588 + correlation/mod.rs:217-245).

    src1, src2: SourceImage (or any object with .img uint8 and
    .resize(scale) -> uint8 array).
    Returns a full-resolution (H1, W1, 3) int64 array: (x2, y2, valid)
    per img1 pixel — the reference's correlated_points grid.
    """
    threshold = cfg.threshold(projection)
    min_stdev = cfg.min_stdev(projection)
    cs = cfg.corridor_size(projection)
    min_range = cfg.corridor_min_range(projection)
    extend_range = cfg.corridor_extend_range(projection)

    h1, w1 = src1.img.shape
    scales = pyramid_scales((w1, h1), cfg.scale_min_size)

    f = normalize_f(f)
    f_fwd = jnp.asarray(f, jnp.float32)
    f_rev = jnp.asarray(f.T, jnp.float32)

    # The Pallas sweep kernel runs on real TPUs; the XLA scan formulation
    # covers CPU (and doubles as the kernel's reference implementation).
    # CVTPU_NO_PALLAS=1 forces the scan path on TPU (debug/fallback);
    # CVTPU_INTERPRET_PALLAS=1 runs the Pallas path in interpret mode on
    # non-TPU backends (tests of the sharded kernel path).
    # active_platform (not jax.default_backend) so --mode=cpu's
    # jax.default_device(cpu) context on a TPU host takes the scan path.
    from cybervision_tpu.parallel import active_platform

    on_tpu = active_platform() == "tpu"
    use_pallas = (
        on_tpu or bool(os.environ.get("CVTPU_INTERPRET_PALLAS"))
    ) and not os.environ.get("CVTPU_NO_PALLAS")
    pallas_interpret = not on_tpu

    # Upload each image once; pyramid levels resize on device (the
    # reference Lanczos3-resizes on the host per scale,
    # reconstruction.rs:565-567 — host resize + per-scale uploads cost
    # more than the whole sweep on the TPU tunnel).
    full1 = jnp.asarray(src1.img)
    full2 = jnp.asarray(src2.img)

    # Multi-chip: shard image rows over the pipeline mesh; every level's
    # arrays are then pinned row-sharded inside pyramid_level_step.
    from cybervision_tpu.parallel import pipeline_mesh, shard_rows

    mesh = pipeline_mesh()
    if mesh is not None:
        full1, full2 = shard_rows(mesh, (full1, full2))
    n_dev = 1 if mesh is None else mesh.devices.size

    def _level_pallas(rax_f, rax_r, win_f, win_r, lh1, lw1, lh2, lw2):
        """Can this level run the Pallas sweep (both directions)? The
        VMEM gate sizes the kernel's row length; under a mesh each
        device's row shard must additionally be at least one halo deep
        (pallas_ncc.shardable_rows) — smaller (coarse) levels run the
        GSPMD scan path instead. rax_f/rax_r are the RESOLVED static
        axes (_resolved_axis)."""
        from cybervision_tpu.ops.pallas_ncc import pick_tile_h, shardable_rows

        ok = (
            pick_tile_h(
                _kernel_row_len(rax_f, lh1, lw1, lh2, lw2), win_f, cs
            ) is not None
            and pick_tile_h(
                _kernel_row_len(rax_r, lh2, lw2, lh1, lw1), win_r, cs
            ) is not None
        )
        if ok and mesh is not None:
            ok = shardable_rows(
                _kernel_row_count(rax_f, lh1, lw1), n_dev, win_f
            ) and shardable_rows(
                _kernel_row_count(rax_r, lh2, lw2), n_dev, win_r
            )
        return ok

    plan = {"mesh": mesh is not None, "pallas_levels": []}
    global _LAST_PLAN
    _LAST_PLAN = plan

    if cfg.corridor_window_fixed is not None:
        # Fixed windows -> no host decisions between levels. The COARSE
        # levels run as one fused program (pyramid_program) that also
        # reduces each level's actually-required corridor half-width and
        # the FINEST level's required (fwd, rev) pair; one small fetch
        # then picks the finest level's exact window buckets. The finest
        # level (which dominates the cost) therefore never truncates
        # below the largest window bucket and
        # runs exactly once; a coarse-level overreach (rare:
        # wide-disparity scenes) escalates to the fully data-driven
        # bucket path. Reference corridor semantics preserved
        # (correlation/mod.rs:530-538) at the cost of one ~30 ms tunnel
        # round-trip per pair.
        win = cfg.corridor_window_fixed
        levels = []
        tmins = []
        for si, scale in enumerate(scales):
            lh1, lw1 = _resized_shape(src1.img.shape, scale)
            lh2, lw2 = _resized_shape(src2.img.shape, scale)
            wtr_f, tmin_f = split_trange(
                warp_shift_range(f, scale, lh1, lw1, lh2, lw2)
            )
            wtr_r, tmin_r = split_trange(
                warp_shift_range(f.T, scale, lh2, lw2, lh1, lw1)
            )
            # Perspective F (no warp bucket): prove a uniform dominant
            # axis on the host when possible — the sweep then compiles
            # the static-axis kernel (~2.7x less roll work).
            ax_f = (
                None if wtr_f is not None
                else uniform_epipolar_axis(f, scale, lh1, lw1)
            )
            ax_r = (
                None if wtr_r is not None
                else uniform_epipolar_axis(f.T, scale, lh2, lw2)
            )
            levels.append((scale, False, win, win, wtr_f, wtr_r, ax_f, ax_r))
            tmins.append((tmin_f, tmin_r))
        tmins = np.array(tmins, np.int32).reshape(len(scales), 2)

        def _annotate_pallas(lv, win_f, win_r):
            scale, _, _, _, wtr_f, wtr_r, ax_f, ax_r = lv
            lh1, lw1 = _resized_shape(src1.img.shape, scale)
            lh2, lw2 = _resized_shape(src2.img.shape, scale)
            lp = use_pallas and _level_pallas(
                _resolved_axis(wtr_f, ax_f), _resolved_axis(wtr_r, ax_r),
                win_f, win_r, lh1, lw1, lh2, lw2,
            )
            return (scale, lp, win_f, win_r, wtr_f, wtr_r, ax_f, ax_r)

        coarse = [
            lv if si == 0 else _annotate_pallas(lv, win, win)
            for si, lv in enumerate(levels[:-1])
        ]
        split = len(scales) > 1 and cfg.corridor_window_escalate
        if split:
            fin = levels[-1]
            rax_ff = _resolved_axis(fin[4], fin[6])
            rax_fr = _resolved_axis(fin[5], fin[7])
            next_spec = (
                fin[0],
                None if rax_ff is None else rax_ff == "vert",
                None if rax_fr is None else rax_fr == "vert",
            )
        else:
            # escalation off (or single-level pyramid): one program for
            # everything, finest included, at the fixed window. The
            # finest level is appended UNCONDITIONALLY — with a
            # single-level pyramid (min dim <= scale_min_size, steps=0;
            # reference handles this via optimal_scale_steps=0,
            # correlation/mod.rs:542-550) the level is the si==0 first
            # pass and stays un-annotated like every first level.
            coarse = coarse + [
                levels[-1] if len(scales) == 1
                else _annotate_pallas(levels[-1], win, win)
            ]
            next_spec = None
        plan["pallas_levels"] = [lv[1] for lv in coarse]
        state_f, state_r, reaches = pyramid_program(
            full1, full2, f_fwd, f_rev,
            jnp.asarray(tmins[: len(coarse)]), tuple(coarse),
            threshold, min_stdev, min_range, extend_range, cs,
            cfg.exact_cross_check,
            mesh=mesh,
            pallas_interpret=pallas_interpret,
            next_level=next_spec,
        )
        if split:
            r = np.asarray(jax.device_get(reaches))
            plan["reaches"] = r.tolist()
            coarse_reach = int(r[:-2].max()) if len(r) > 2 else 0
            if coarse_reach > win:
                # a COARSE level already truncated: the cheap split can't
                # fix history — rerun fully data-driven. Tell the user
                # (the cost doubles) and rescale the nested run's
                # progress into the remaining [0.5, 1.0] band so the bar
                # never moves backwards (ADVICE r3).
                import dataclasses as _dc
                import sys as _sys

                print(
                    "Corridor reach exceeded the fixed window"
                    f" ({coarse_reach} > {win}); escalating to"
                    " data-driven windows (pyramid rerun)",
                    file=_sys.stderr,
                )
                nested_progress = progress
                if progress is not None:
                    progress.report_status(0.5)
                    nested_progress = _BandProgress(progress, 0.5, 1.0)
                out = correlate_images(
                    src1, src2, f, projection,
                    _dc.replace(cfg, corridor_window_fixed=None),
                    nested_progress, device_out,
                )
                _LAST_PLAN["escalated_from_fixed"] = win
                return out
            cap = cfg.corridor_window_buckets[-1]
            if int(r[-2]) > cap or int(r[-1]) > cap:
                # The finest level's required reach exceeds the largest
                # bucket: the window clamps there, so "never truncates"
                # weakens to "never truncates below the largest bucket"
                # (the data-driven path shares the same cap — parity
                # holds, but record it; ADVICE r3).
                plan["reach_capped"] = True
            win_f = max(win, _bucket(int(r[-2]), cfg))
            win_r = max(win, _bucket(int(r[-1]), cfg))
            plan["windows_finest"] = (win_f, win_r)
            scale, lp, _, _, wtr_f, wtr_r, ax_f, ax_r = _annotate_pallas(
                levels[-1], win_f, win_r
            )
            plan["pallas_levels"].append(lp)
            state_f, state_r = pyramid_level_step(
                _device_resize(full1, scale), _device_resize(full2, scale),
                state_f, state_r, f_fwd, f_rev, scale, threshold,
                min_stdev, min_range, extend_range, cs, win_f, win_r,
                first=False,
                use_pallas=lp,
                mesh=mesh,
                exact_cross_check=cfg.exact_cross_check,
                warp_trange_f=wtr_f,
                warp_trange_r=wtr_r,
                warp_tmin_f=tmins[-1, 0],
                warp_tmin_r=tmins[-1, 1],
                pallas_interpret=pallas_interpret,
                force_axis_f=ax_f,
                force_axis_r=ax_r,
            )
        if progress is not None:
            progress.report_status(1.0)
        return _finish_correlate(state_f, src1, src2, device_out)

    state_f = state_r = None
    total = sum(s * s for s in scales)
    done = 0.0
    for si, scale in enumerate(scales):
        im1 = _device_resize(full1, scale)
        im2 = _device_resize(full2, scale)
        lh1, lw1 = im1.shape
        lh2, lw2 = im2.shape
        wtr_f, tmin_f = split_trange(
            warp_shift_range(f, scale, lh1, lw1, lh2, lw2)
        )
        wtr_r, tmin_r = split_trange(
            warp_shift_range(f.T, scale, lh2, lw2, lh1, lw1)
        )
        ax_f = (
            None if wtr_f is not None
            else uniform_epipolar_axis(f, scale, lh1, lw1)
        )
        ax_r = (
            None if wtr_r is not None
            else uniform_epipolar_axis(f.T, scale, lh2, lw2)
        )
        rax_f = _resolved_axis(wtr_f, ax_f)
        rax_r = _resolved_axis(wtr_r, ax_r)
        win_f = win_r = cfg.corridor_window_fixed or 16
        if si > 0 and cfg.corridor_window_fixed is None:
            halves = np.asarray(
                max_corridor_halfwidth_pair(
                    state_f, state_r, f_fwd, f_rev, scale, min_range,
                    extend_range, h=lh1, w=lw1, h2=lh2, w2=lw2,
                    fv_f=None if rax_f is None else rax_f == "vert",
                    fv_r=None if rax_r is None else rax_r == "vert",
                )
            )
            win_f = _bucket(int(halves[0]), cfg)
            win_r = _bucket(int(halves[1]), cfg)
        if si == 0:
            state_f = state_r = empty_state(2, 2)  # placeholders (unused)
        level_pallas = (
            use_pallas
            and si > 0
            and _level_pallas(rax_f, rax_r, win_f, win_r, lh1, lw1, lh2, lw2)
        )
        plan["pallas_levels"].append(level_pallas)
        state_f, state_r = pyramid_level_step(
            im1, im2, state_f, state_r, f_fwd, f_rev, scale, threshold,
            min_stdev, min_range, extend_range, cs, win_f, win_r,
            first=si == 0,
            use_pallas=level_pallas,
            mesh=mesh,
            exact_cross_check=cfg.exact_cross_check,
            warp_trange_f=wtr_f,
            warp_trange_r=wtr_r,
            warp_tmin_f=tmin_f,
            warp_tmin_r=tmin_r,
            pallas_interpret=pallas_interpret,
            force_axis_f=ax_f,
            force_axis_r=ax_r,
        )
        done += scale * scale
        if progress is not None:
            progress.report_status(done / total)

    return _finish_correlate(state_f, src1, src2, device_out)


def _resized_shape(shape: tuple[int, int], scale: float) -> tuple[int, int]:
    """Output dims of _device_resize (truncated, reconstruction.rs:148-150)."""
    if scale == 1.0:
        return shape
    return int(shape[0] * scale), int(shape[1] * scale)


def _finish_correlate(state_f, src1, src2, device_out):
    if device_out:
        # Leave the packed state on device: the affine depth-map fast
        # lane consumes the (H, W, 3) planes there, skipping a 12 MB
        # device->host->device round trip over the TPU tunnel; the fused
        # PLY lane takes the compact (H, W) word (device_out="word",
        # coords < 4096) that native.ply_write_corr_grid streams from.
        if device_out == "word":
            return _pack_state_compact(state_f)
        if device_out == "delta":
            return _pack_state_delta(state_f)
        return _pack_state(state_f)
    h1f, w1f = src1.img.shape
    h2f, w2f = src2.img.shape
    if max(h1f, w1f, h2f, w2f) <= 4096:
        # Positions fit 12 bits each: fetch one (H, W) int32 word per
        # pixel (4 MB at 1024^2) instead of three planes (12 MB) — the
        # tunnel transfer is the tail of the dense phase.
        return unpack_correlated(np.asarray(_pack_state_compact(state_f)))
    packed = np.asarray(_pack_state(state_f), np.int64)
    return packed


@functools.partial(jax.jit, static_argnames=("k",))
def _sample_word_jit(word, k: int, seed):
    flat = word.reshape(-1)
    valid = (flat >> 24) & 1
    scores = jnp.where(
        valid == 1,
        jax.random.uniform(jax.random.PRNGKey(seed), flat.shape),
        -1.0,
    )
    idx = jnp.argsort(-scores)[:k]
    return idx.astype(jnp.int32), flat[idx]


def sample_word_grid(word_dev, k: int, seed: int):
    """--max-points subsample ON DEVICE: pick k uniformly-random valid
    pixels of a compact (H, W) int32 correlation word grid (seeded, via
    per-pixel PRNG keys + top-k) and fetch only their flat indices and
    words — ~4 MB at k=500e3 instead of the 49 MB full-grid fetch the
    hi-res path otherwise pushes through the slow TPU tunnel
    (reconstruction.rs:837-844 is the shuffle+truncate being replaced;
    the draw is uniform over valid pixels like the reference's, but a
    different — still deterministic — sample than the host lane's
    RandomState.choice). Entries beyond the valid count come back with
    the valid bit clear; callers drop them."""
    idx, words = _sample_word_jit(word_dev, k, seed)
    return np.asarray(idx), np.asarray(words)


def unpack_correlated(arr: np.ndarray) -> np.ndarray:
    """Host tail for a fetched device_out result: expand a compact
    (H, W) int32 word — or pass through (H, W, 3) planes — to the
    (H, W, 3) int64 (x2, y2, valid) grid correlate_images returns."""
    if arr.ndim == 3:
        return arr.astype(np.int64)
    packed = np.empty((*arr.shape, 3), np.int64)
    packed[:, :, 0] = arr & 0xFFF
    packed[:, :, 1] = (arr >> 12) & 0xFFF
    packed[:, :, 2] = (arr >> 24) & 1
    return packed


def _bucket(max_len: int, cfg: CorrelationConfig) -> int:
    """Smallest static window bucket covering the observed maximum."""
    for b in cfg.corridor_window_buckets:
        if b >= max_len:
            return b
    return cfg.corridor_window_buckets[-1]


@functools.partial(jax.jit, static_argnames=())
def _pack_state(state: CorrelationState):
    """(H, W, 3) int32 = (x2, y2, valid): one device->host fetch."""
    return jnp.concatenate(
        [state.pos, state.valid[:, :, None].astype(jnp.int32)], axis=2
    )


@jax.jit
def _pack_state_compact(state: CorrelationState):
    """(H, W) int32 = x2 | y2 << 12 | valid << 24 (coords < 4096)."""
    return (
        (state.pos[:, :, 0] & 0xFFF)
        | ((state.pos[:, :, 1] & 0xFFF) << 12)
        | (state.valid.astype(jnp.int32) << 24)
    )


@jax.jit
def _pack_state_delta(state: CorrelationState):
    """Delta-compressed fetch payload: (H, W) uint16 + int32 word plane.

    The u16 plane packs per-pixel POSITION DELTAS instead of absolute
    12-bit positions: dx = x2 - x, dy = y2 - y, each biased into 7 bits
    ([-64, 63]), plus the valid bit at bit 14 — half the bytes of the
    compact word over the ~26 ms-latency / ~35 MB/s TPU tunnel, which
    bounds the headline PLY lane's readback (VERDICT r4 next #3). Bit 15
    of EVERY element broadcasts the overflow flag: set iff any VALID
    pixel's delta falls outside [-64, 63], in which case the host reads
    one element, sees the flag, and falls back to fetching the exact
    int32 word plane (returned alongside; it costs nothing unless
    fetched). Invalid pixels may wrap — every consumer checks the valid
    bit first (same contract as the word plane's garbage positions)."""
    word = _pack_state_compact(state)
    col = jnp.arange(state.pos.shape[1], dtype=jnp.int32)[None, :]
    row = jnp.arange(state.pos.shape[0], dtype=jnp.int32)[:, None]
    dx = state.pos[:, :, 0] - col
    dy = state.pos[:, :, 1] - row
    over = jnp.any(
        state.valid
        & ((dx < -64) | (dx > 63) | (dy < -64) | (dy > 63))
    )
    d16 = (
        ((dx + 64) & 0x7F)
        | (((dy + 64) & 0x7F) << 7)
        | (state.valid.astype(jnp.int32) << 14)
        | (over.astype(jnp.int32) << 15)
    ).astype(jnp.uint16)
    return d16, word


def unpack_delta_grid(d16: np.ndarray) -> np.ndarray:
    """Host inverse of _pack_state_delta's u16 plane -> compact int32
    word (x2 | y2<<12 | valid<<24). Only meaningful when the overflow
    flag (bit 15) is clear; invalid pixels reconstruct to in-range but
    arbitrary positions (their deltas may have wrapped)."""
    p = d16.astype(np.int32)
    dx = (p & 0x7F) - 64
    dy = ((p >> 7) & 0x7F) - 64
    v = (p >> 14) & 1
    col = np.arange(d16.shape[1], dtype=np.int32)[None, :]
    row = np.arange(d16.shape[0], dtype=np.int32)[:, None]
    return ((col + dx) & 0xFFF) | (((row + dy) & 0xFFF) << 12) | (v << 24)


@functools.partial(jax.jit, static_argnames=("scale",))
def _device_resize(img: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Lanczos3 pyramid resize on device, matching the reference's
    truncated output dims ((w*scale) as u32, reconstruction.rs:148-150)
    and u8 quantization."""
    if scale == 1.0:
        return img
    h, w = img.shape
    nh, nw = int(h * scale), int(w * scale)
    out = jax.image.resize(
        img.astype(jnp.float32), (nh, nw), method="lanczos3"
    )
    return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
