"""Pallas TPU kernel for the dense-correlation hypothesis sweep.

This is the framework's hottest loop — the TPU equivalent of the
reference's cross_correlate compute shader (cross_correlate.comp.glsl:
72-167 / correlation/mod.rs:411-466). The XLA scan formulation in
ops.correlation.refine_pass round-trips every hypothesis's warp, box sums
and running best through HBM; this kernel keeps a row tile of every input
resident in VMEM and runs the whole (stripe x corridor-offset) hypothesis
loop on-chip, writing only the final best (corr, x, y) per pixel.

Structure notes:
  * single program, internal while-loop over row tiles with manual
    HBM<->VMEM DMA — the axon remote TPU compiler used here crashes on
    any gridded pallas_call, and grid-less kernels with explicit DMA are
    the supported subset (bisected empirically; a standard deployment
    would use a 1-D grid with the same body);
  * every scalar index stays int32: under jax_enable_x64, int64 values
    reach Mosaic's convert lowering and recurse.

Math identical to refine_pass's scan body (verified in tests via
interpret mode): per hypothesis u in [-window, window], the candidate is
the center-anchored corridor position evaluated at p + u*e(p) (dominant
axis selected per pixel), the warp is the corresponding shift of the
stripe's base warp W0_o, NCC self-normalizes with the warp's 11x11 box
statistics, and a strictly-greater carry keeps the first maximum in
stripe-major / offset-minor order (the reference's walk order,
mod.rs:372-381).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KS = 5
KW = 2 * KS + 1
KPC = KW * KW

# v5e has 128 MB of VMEM; Mosaic's default scoped budget is 16 MB. The
# kernel's working set (scratch + compiler stack temporaries, observed
# ~2.7x the declared scratch) scales with tile_h * row width, so wide
# images get a raised limit and a narrower tile instead of an OOM.
VMEM_LIMIT_BYTES = 96 * 1024 * 1024
_TEMP_FACTOR = 2.7


def _ru(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scratch_bytes(tile_h: int, w: int, wd: int, n_o: int) -> int:
    """Declared VMEM scratch for one tile (mirrors ncc_sweep's shapes)."""
    hk = KS + wd
    wq = _ru(w, 128)
    total = _ru(tile_h + 2 * KS, 8) * _ru(w + 2 * KS, 128)
    # cen/coe/add + the dynamic-axis vert slab (sized for the worst case).
    total += 4 * _ru(tile_h + 2 * wd, 8) * _ru(w + 2 * wd, 128)
    total += 8 * tile_h * wq
    # n_o warp slabs + the two hoisted box-sum slabs (s_sw, s_sww)
    total += (n_o + 2) * _ru(tile_h + 2 * hk, 8) * _ru(w + 2 * hk, 128)
    return 4 * total


def pick_tile_h(w: int, window: int, corridor_size: int) -> int | None:
    """Largest tile height (multiple of 8, <=64) whose estimated VMEM
    working set fits the budget; None if even tile_h=8 does not fit (the
    caller falls back to the XLA scan formulation)."""
    n_o = 2 * corridor_size + 1
    for tile_h in range(64, 7, -8):
        if _TEMP_FACTOR * _scratch_bytes(tile_h, w, window, n_o) <= VMEM_LIMIT_BYTES:
            return tile_h
    return None


def _box11(x: jnp.ndarray, rows_out: int, cols_out: int) -> jnp.ndarray:
    """11x11 window sum of a (rows_out + 2*KS, cols_out + 2*KS) slab,
    valid output (rows_out, cols_out), via static slices."""
    acc = None
    for d in range(KW):
        part = jax.lax.slice(x, (0, d), (x.shape[0], d + cols_out))
        acc = part if acc is None else acc + part
    acc2 = None
    for d in range(KW):
        part = jax.lax.slice(acc, (d, 0), (d + rows_out, cols_out))
        acc2 = part if acc2 is None else acc2 + part
    return acc2


def _sweep_kernel(
    img1_hbm,  # (HP + 2KS, W + 2KS)
    vert_hbm,  # same
    cen_hbm,  # (HP + 2wd, W + 2wd)
    coe_hbm,
    add_hbm,
    avg1_hbm,  # (HP, W)
    isd1_hbm,
    start_hbm,
    end_hbm,
    pok_hbm,
    w0_hbm,  # (n_o, HP + 2hk, W + 2hk)
    rowg_smem,  # (1, 1) int32: global row offset of this shard (0 unsharded)
    corr_hbm,  # outputs (HP, W)
    x_hbm,
    y_hbm,
    s_img,
    s_vert,
    s_cen,
    s_coe,
    s_add,
    s_avg1,
    s_isd1,
    s_start,
    s_end,
    s_pok,
    s_w0,
    s_sw,
    s_sww,
    o_corr,
    o_x,
    o_y,
    sems,
    *,
    window: int,
    n_o: int,
    corridor_size: int,
    threshold: float,
    min_stdev: float,
    tile_h: int,
    n_tiles: int,
    w: int,
    h: int,
    h2: int,
    w2: int,
    axis: str | None,
):
    """axis: the epipolar dominant axis when it is globally static
    ("vert"/"horiz" — affine F, known from warp_shift_range) or None
    (perspective F: per-pixel `vert` field). A static axis compiles only
    the needed roll direction and drops every per-pixel vert select —
    the dual-variant path does ~2x the roll work per u step.

    Sharded multi-chip runs (ncc_sweep_sharded) hand each device a row
    shard whose field slabs carry real neighbor halos; `h` is then the
    GLOBAL image height and rowg_smem the shard's global row offset, so
    the src_ok bounds test global geometry exactly as one device would.
    """
    wd = window
    f32 = jnp.float32
    row_g = rowg_smem[0, 0]

    def ru(x, m):
        return ((x + m - 1) // m) * m

    # DMA slice shapes must align to the (8, 128) tiling; spans are
    # rounded up and the extra rows/columns masked by the math.
    r_img = ru(tile_h + 2 * KS, 8)
    r_f = ru(tile_h + 2 * wd, 8)
    r_w0 = ru(tile_h + 2 * (KS + wd), 8)

    def tile_body(carry):
        t, tok = carry
        row0 = t * jnp.int32(tile_h)

        # Single-buffered DMA by measurement, not oversight: the per-tile
        # working set is ~3 MB against ~1.7 ms of u-loop compute, so the
        # copy wait is <10% of the tile — the profiled bottleneck of the
        # refine step was the XLA stripe-warp gathers feeding this kernel
        # (84 ms vs 27 ms of sweep at 1024^2), eliminated in
        # correlation._stripe_warps. Double-buffering these copies would
        # recover at most that <10%.
        copies = [
            pltpu.make_async_copy(
                img1_hbm.at[pl.ds(row0, r_img), :], s_img, sems.at[jnp.int32(0)]
            ),
        ]
        if axis is None:
            # vert rides the cen layout (wd margins): the u-loop needs the
            # dominant-axis field at shifted positions, not just KS halos.
            copies.append(pltpu.make_async_copy(
                vert_hbm.at[pl.ds(row0, r_f), :], s_vert, sems.at[jnp.int32(1)]
            ))
        copies += [
            pltpu.make_async_copy(
                cen_hbm.at[pl.ds(row0, r_f), :], s_cen, sems.at[jnp.int32(2)]
            ),
            pltpu.make_async_copy(
                coe_hbm.at[pl.ds(row0, r_f), :], s_coe, sems.at[jnp.int32(3)]
            ),
            pltpu.make_async_copy(
                add_hbm.at[pl.ds(row0, r_f), :], s_add, sems.at[jnp.int32(4)]
            ),
            pltpu.make_async_copy(
                avg1_hbm.at[pl.ds(row0, tile_h), :], s_avg1, sems.at[jnp.int32(5)]
            ),
            pltpu.make_async_copy(
                isd1_hbm.at[pl.ds(row0, tile_h), :], s_isd1, sems.at[jnp.int32(6)]
            ),
            pltpu.make_async_copy(
                start_hbm.at[pl.ds(row0, tile_h), :], s_start, sems.at[jnp.int32(7)]
            ),
            pltpu.make_async_copy(
                end_hbm.at[pl.ds(row0, tile_h), :], s_end, sems.at[jnp.int32(8)]
            ),
            pltpu.make_async_copy(
                pok_hbm.at[pl.ds(row0, tile_h), :], s_pok, sems.at[jnp.int32(9)]
            ),
            pltpu.make_async_copy(
                w0_hbm.at[pl.ds(jnp.int32(0), n_o), pl.ds(row0, r_w0), :],
                s_w0,
                sems.at[jnp.int32(10)],
            ),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        if axis is None:
            vert_cf = s_vert[pl.ds(wd, tile_h), pl.ds(wd, w)]
            vert_c = vert_cf > f32(0.5)
        avg1 = s_avg1[:, 0:w]
        isd1 = s_isd1[:, 0:w]
        start = s_start[:, 0:w]
        end = s_end[:, 0:w]
        pok = s_pok[:, 0:w] > f32(0.5)
        img_slab = s_img[0 : tile_h + 2 * KS, 0 : w + 2 * KS]
        if axis is None:
            vert_slab = (
                s_vert[
                    wd - KS : wd + KS + tile_h, wd - KS : wd + KS + w
                ] > f32(0.5)
            )
            vert_full = s_vert[:]

        row_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0)
            + row0
            + row_g
        )
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 1)

        o_corr[:] = jnp.full(o_corr.shape, -jnp.inf, f32)
        o_x[:] = jnp.zeros(o_x.shape, f32)
        o_y[:] = jnp.zeros(o_y.shape, f32)

        # Hoisted once per tile: the corridor-offset field. off_u(p) =
        # floor(coeff*center + add)(p + u e) + o — floor commutes with the
        # pure-translation roll, so the per-u work is one roll instead of
        # three rolls + the f32 affine evaluation (matches the scan path,
        # correlation.refine_pass:722-726).
        off0_full = jnp.floor(s_coe[:] * s_cen[:] + s_add[:])
        cen_full = s_cen[:]

        f_rows = s_cen.shape[0]
        f_cols = s_cen.shape[1]
        w_rows = s_w0.shape[1]
        w_cols = s_w0.shape[2]
        b_rows = s_sw.shape[0]
        b_cols = s_sw.shape[1]

        def finish_hyp(u, qx, qy, cen_u, warp, s_w_, s_ww, extra_ok):
            """Shared per-hypothesis tail: NCC from the shifted windows,
            validity masks, and the strictly-greater best carry."""
            inb = (
                (qx >= f32(KS))
                & (qx < f32(w2 - KS))
                & (qy >= f32(KS))
                & (qy < f32(h2 - KS))
            )
            cross = _box11(img_slab * warp, tile_h, w)
            inv_kpc = f32(1.0 / KPC)
            avg_w = s_w_ * inv_kpc
            var_w = jnp.maximum(s_ww * inv_kpc - avg_w * avg_w, f32(0.0))
            sd_w = jnp.sqrt(var_w)
            corr = (
                (cross * inv_kpc - avg1 * avg_w)
                * isd1
                / jnp.maximum(sd_w, f32(1e-12))
            )

            # where() on i1 vectors hits an unsupported truncation
            # in Mosaic; select float masks instead.
            # Bounds are [KS, dim-KS): warp box stats at shifted
            # index p+u are exact only where the 11x11 box stays
            # inside the warp plane (matches refine_pass's src_ok).
            if axis == "vert":
                src_ok = (row_ids + u >= KS) & (row_ids + u < h - KS)
            elif axis == "horiz":
                src_ok = (col_ids + u >= KS) & (col_ids + u < w - KS)
            else:
                maskr = (
                    (row_ids + u >= KS) & (row_ids + u < h - KS)
                ).astype(f32)
                maskc = (
                    (col_ids + u >= KS) & (col_ids + u < w - KS)
                ).astype(f32)
                src_ok = jnp.where(vert_c, maskr, maskc) > f32(0.5)
            ok = (
                src_ok
                & inb
                & (cen_u >= start)
                & (cen_u < end)
                & pok
                & (sd_w >= f32(min_stdev))
                & (corr >= f32(threshold))
            )
            if extra_ok is not None:
                ok &= extra_ok
            corr = jnp.where(ok, corr, -jnp.inf)
            prev_c = o_corr[0:tile_h, 0:w]
            upd = corr > prev_c
            o_corr[0:tile_h, 0:w] = jnp.where(upd, corr, prev_c)
            o_x[0:tile_h, 0:w] = jnp.where(upd, qx, o_x[0:tile_h, 0:w])
            o_y[0:tile_h, 0:w] = jnp.where(upd, qy, o_y[0:tile_h, 0:w])

        for oi in range(n_o):
            o_val = f32(oi - corridor_size)

            # Hoisted once per stripe: the warp's 11x11 box sums. Box
            # filtering commutes with the roll (box11(roll(x, u)) =
            # roll(box11(x), u)), so the candidate-window stats for every
            # u are rolls of these two slabs — the same select-at-center
            # semantics as the scan path's precomputed avgqs/sdqs
            # (correlation.refine_pass:741-750), replacing two of the
            # three per-u box filters (44 of ~66 adds/pixel).
            w0_full = s_w0[oi]
            sw_rows = s_sw.shape[0] - 2 * KS
            sw_cols = s_sw.shape[1] - 2 * KS
            s_sw[0:sw_rows, 0:sw_cols] = _box11(w0_full, sw_rows, sw_cols)
            s_sww[0:sw_rows, 0:sw_cols] = _box11(
                w0_full * w0_full, sw_rows, sw_cols
            )

            if axis is not None:
                # Incremental constant-shift rolls (docs/PERF.md round-5
                # roofline): u advances by 1 per iteration, so the five
                # rolled windows ride the loop carry and advance with a
                # STATIC shift-by-1 instead of being re-rolled from base
                # with a per-u dynamic shift — the dynamic rotates were
                # the dominant issue cost of the u-loop. The fixed-axis
                # shift component applies once here; the carry starts at
                # u = -wd, where the varying shift is the identity.
                # Bitwise-exact: rolls are permutations, and k unit
                # rolls compose to one k-roll.
                var_ax = 0 if axis == "vert" else 1

                def pre_roll(x, rows, cols):
                    # jnp.int32 shifts: a python-int shift reaches
                    # tpu.dynamic_rotate as i64 under jax_enable_x64.
                    if axis == "vert":
                        return pltpu.roll(x, jnp.int32(cols - wd), 1)
                    return pltpu.roll(x, jnp.int32(rows - wd), 0)

                def rot1(x):
                    return pltpu.roll(
                        x, jnp.int32(x.shape[var_ax] - 1), var_ax
                    )

                def u_body_inc(c, o_val=o_val):
                    ui, cen_s, off_s, warp_s, sw_s, sww_s = c
                    u = ui - jnp.int32(wd)
                    cen_u = jax.lax.slice(cen_s, (0, 0), (tile_h, w))
                    off = jax.lax.slice(off_s, (0, 0), (tile_h, w)) + o_val
                    if axis == "vert":
                        qx, qy = off, cen_u
                    else:
                        qx, qy = cen_u, off
                    warp = jax.lax.slice(
                        warp_s, (0, 0), (tile_h + 2 * KS, w + 2 * KS)
                    )
                    s_w_ = jax.lax.slice(sw_s, (0, 0), (tile_h, w))
                    s_ww = jax.lax.slice(sww_s, (0, 0), (tile_h, w))
                    finish_hyp(u, qx, qy, cen_u, warp, s_w_, s_ww, None)
                    return (
                        ui + jnp.int32(1),
                        rot1(cen_s),
                        rot1(off_s),
                        rot1(warp_s),
                        rot1(sw_s),
                        rot1(sww_s),
                    )

                jax.lax.while_loop(
                    lambda c: c[0] < jnp.int32(2 * wd + 1),
                    u_body_inc,
                    (
                        jnp.int32(0),
                        pre_roll(cen_full, f_rows, f_cols),
                        pre_roll(off0_full, f_rows, f_cols),
                        pre_roll(w0_full, w_rows, w_cols),
                        pre_roll(s_sw[:], b_rows, b_cols),
                        pre_roll(s_sww[:], b_rows, b_cols),
                    ),
                )
                continue

            def u_body(c, oi=oi, o_val=o_val):
                ui, utok = c
                u = ui - jnp.int32(wd)

                # Arbitrary row offsets can't be dynamic VMEM slices
                # (sublane alignment); dynamic rotates + static slices
                # read the same windows. Shifts are normalized positive
                # (rot(x, n - s)[j] = x[j + s]).
                def rolled(ref, rows, cols, ru, cu, span_r, span_c):
                    x = pltpu.roll(ref, rows - ru, 0)
                    x = pltpu.roll(x, cols - cu, 1)
                    return jax.lax.slice(x, (0, 0), (span_r, span_c))

                wdu = jnp.int32(wd) + u
                wds = jnp.int32(wd)

                def fshift(buf, rows, cols):
                    r = rolled(buf, rows, cols, wdu, wds, tile_h, w)
                    cc = rolled(buf, rows, cols, wds, wdu, tile_h, w)
                    return jnp.where(vert_c, r, cc)

                cen_u = fshift(cen_full, f_rows, f_cols)
                off = fshift(off0_full, f_rows, f_cols) + o_val
                qx = jnp.where(vert_c, off, cen_u)
                qy = jnp.where(vert_c, cen_u, off)

                w0_buf = s_w0[oi]
                wr = rolled(
                    w0_buf, w_rows, w_cols, wdu, wds,
                    tile_h + 2 * KS, w + 2 * KS,
                )
                wc = rolled(
                    w0_buf, w_rows, w_cols, wds, wdu,
                    tile_h + 2 * KS, w + 2 * KS,
                )
                warp = jnp.where(vert_slab, wr, wc)

                s_w_ = fshift(s_sw[:], b_rows, b_cols)
                s_ww = fshift(s_sww[:], b_rows, b_cols)
                # Reject hypotheses sourced from pixels whose
                # dominant axis differs from p's — their candidate
                # lies on the wrong epipolar line (matches
                # refine_pass's vert-plane gate).
                vu_f = fshift(vert_full, f_rows, f_cols)
                extra_ok = jnp.abs(vu_f - vert_cf) < f32(0.5)
                finish_hyp(u, qx, qy, cen_u, warp, s_w_, s_ww, extra_ok)
                return (ui + jnp.int32(1), utok)

            jax.lax.while_loop(
                lambda c: c[0] < jnp.int32(2 * wd + 1),
                u_body,
                (jnp.int32(0), jnp.int32(0)),
            )

        outs = [
            pltpu.make_async_copy(
                o_corr, corr_hbm.at[pl.ds(row0, tile_h), :], sems.at[jnp.int32(11)]
            ),
            pltpu.make_async_copy(
                o_x, x_hbm.at[pl.ds(row0, tile_h), :], sems.at[jnp.int32(12)]
            ),
            pltpu.make_async_copy(
                o_y, y_hbm.at[pl.ds(row0, tile_h), :], sems.at[jnp.int32(13)]
            ),
        ]
        for c in outs:
            c.start()
        for c in outs:
            c.wait()

        return (t + jnp.int32(1), tok)

    jax.lax.while_loop(
        lambda c: c[0] < jnp.int32(n_tiles),
        tile_body,
        (jnp.int32(0), jnp.int32(0)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "corridor_size", "tile_h", "interpret", "h2", "w2",
        "threshold", "min_stdev", "axis", "row_halo", "h_total",
    ),
)
def ncc_sweep(
    img1,
    vert,
    center,
    coeff,
    add,
    avg1,
    isd1,
    start,
    end,
    p_ok,
    w0,
    *,
    threshold: float,
    min_stdev: float,
    window: int,
    corridor_size: int,
    h2: int,
    w2: int,
    tile_h: int | None = None,
    interpret: bool = False,
    axis: str | None = None,
    row_halo: bool = False,
    row0_g=None,
    h_total: int | None = None,
):
    """Sweep over row tiles. All field inputs are (H, W) f32 (vert/p_ok as
    0/1); w0 is (n_o, H, W) f32 base warps. axis statically fixes the
    epipolar dominant axis ("vert"/"horiz", see _sweep_kernel) — the
    `vert` input is then ignored.

    row_halo=True is the multi-chip form (ncc_sweep_sharded): the rolled
    fields arrive with their margin rows attached as REAL neighbor-shard
    halos (img1: KS rows, vert/center/coeff/add: `window` rows, w0:
    KS+window rows along axis 1) instead of the zero padding this driver
    would add, `row0_g` is the shard's global row offset and `h_total`
    the global image height for the kernel's src_ok bounds. H below is
    then the shard-local row count (taken from avg1, never haloed).

    Returns (best_corr f32, best_x i32, best_y i32) at (H, W)."""
    h, w = avg1.shape
    n_o = w0.shape[0]
    wd = window
    hk = KS + wd
    if tile_h is None:
        tile_h = pick_tile_h(w, window, corridor_size)
        if tile_h is None:
            raise ValueError(
                f"ncc_sweep working set exceeds VMEM for w={w},"
                f" window={window}; use the scan path"
            )
    pad_h = (-h) % tile_h
    hp = h + pad_h
    n_tiles = hp // tile_h

    def ru(x, m):
        return ((x + m - 1) // m) * m

    # HBM layouts sized so every DMA slice shape is (8, 128)-aligned:
    # columns rounded up to 128 (left halo exact, slack on the right),
    # rows given 8 extra tail rows for the rounded-up slice spans.
    # Layout invariant either way: image row i sits at index i + m, so
    # the bottom halo (row_halo) occupies exactly the indices the
    # unsharded layout zero-fills.
    def pad(x, m):
        cols = ru(w + 2 * m, 128)
        if row_halo:
            return jnp.pad(
                x.astype(jnp.float32),
                ((0, pad_h + 8), (m, cols - w - m)),
            )
        return jnp.pad(
            x.astype(jnp.float32),
            ((m, pad_h + m + 8), (m, cols - w - m)),
        )

    img1_p = pad(img1, KS)
    # A static axis never reads the vert field (see _sweep_kernel): pass
    # a minimal dummy instead of padding + transferring a full-image
    # plane per refine level. The dynamic-axis kernel reads vert at
    # u-shifted positions (the cross-axis hypothesis gate), so it gets
    # the cen layout (wd margins, wd >= KS by the window buckets).
    assert wd >= KS, f"window {wd} below the NCC half-width {KS}"
    vert_p = (
        jnp.zeros((8, 128), jnp.float32) if axis is not None else pad(vert, wd)
    )
    cen_p = pad(center, wd)
    coe_p = pad(coeff, wd)
    add_p = pad(add, wd)

    wq = ru(w, 128)

    def pad0(x):
        return jnp.pad(
            x.astype(jnp.float32), ((0, pad_h + 8), (0, wq - w))
        )

    w0_cols = ru(w + 2 * hk, 128)
    if row_halo:
        w0_p = jnp.pad(
            w0.astype(jnp.float32),
            ((0, 0), (0, pad_h + 8), (hk, w0_cols - w - hk)),
        )
    else:
        w0_p = jnp.pad(
            w0.astype(jnp.float32),
            ((0, 0), (hk, pad_h + hk + 8), (hk, w0_cols - w - hk)),
        )

    rowg = jnp.reshape(
        jnp.asarray(0 if row0_g is None else row0_g, jnp.int32), (1, 1)
    )

    kernel = functools.partial(
        _sweep_kernel,
        window=wd,
        n_o=n_o,
        corridor_size=corridor_size,
        threshold=float(threshold),
        min_stdev=float(min_stdev),
        tile_h=tile_h,
        n_tiles=n_tiles,
        w=w,
        h=h if h_total is None else h_total,
        h2=h2,
        w2=w2,
        axis=axis,
    )

    out_shape = [
        jax.ShapeDtypeStruct((hp, wq), jnp.float32),
        jax.ShapeDtypeStruct((hp, wq), jnp.float32),
        jax.ShapeDtypeStruct((hp, wq), jnp.float32),
    ]
    corr, bx, by = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 11
        + [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ru(tile_h + 2 * KS, 8), ru(w + 2 * KS, 128)), jnp.float32),
            pltpu.VMEM(
                (8, 128)
                if axis is not None
                else (ru(tile_h + 2 * wd, 8), ru(w + 2 * wd, 128)),
                jnp.float32,
            ),
            pltpu.VMEM((ru(tile_h + 2 * wd, 8), ru(w + 2 * wd, 128)), jnp.float32),
            pltpu.VMEM((ru(tile_h + 2 * wd, 8), ru(w + 2 * wd, 128)), jnp.float32),
            pltpu.VMEM((ru(tile_h + 2 * wd, 8), ru(w + 2 * wd, 128)), jnp.float32),
            pltpu.VMEM((tile_h, wq), jnp.float32),
            pltpu.VMEM((tile_h, wq), jnp.float32),
            pltpu.VMEM((tile_h, wq), jnp.float32),
            pltpu.VMEM((tile_h, wq), jnp.float32),
            pltpu.VMEM((tile_h, wq), jnp.float32),
            pltpu.VMEM(
                (n_o, ru(tile_h + 2 * hk, 8), ru(w + 2 * hk, 128)),
                jnp.float32,
            ),
            pltpu.VMEM(
                (ru(tile_h + 2 * hk, 8), ru(w + 2 * hk, 128)), jnp.float32
            ),
            pltpu.VMEM(
                (ru(tile_h + 2 * hk, 8), ru(w + 2 * hk, 128)), jnp.float32
            ),
            pltpu.VMEM((tile_h, wq), jnp.float32),
            pltpu.VMEM((tile_h, wq), jnp.float32),
            pltpu.VMEM((tile_h, wq), jnp.float32),
            pltpu.SemaphoreType.DMA((14,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(
        img1_p, vert_p, cen_p, coe_p, add_p, pad0(avg1), pad0(isd1),
        pad0(start), pad0(end), pad0(p_ok), w0_p, rowg,
    )
    return (
        corr[:h, :w],
        bx[:h, :w].astype(jnp.int32),
        by[:h, :w].astype(jnp.int32),
    )


def shardable_rows(rows: int, n_dev: int, window: int) -> bool:
    """True when an image with `rows` kernel rows can run the sharded
    sweep on n_dev devices: each shard must be at least one halo deep
    (KS + window rows), since the halo exchange is single-hop ppermute.
    Levels below this run the GSPMD scan path instead (they are the
    cheap coarse levels)."""
    return -(-rows // n_dev) >= KS + window


def ncc_sweep_sharded(
    mesh,
    img1,
    vert,
    center,
    coeff,
    add,
    avg1,
    isd1,
    start,
    end,
    p_ok,
    w0,
    *,
    threshold: float,
    min_stdev: float,
    window: int,
    corridor_size: int,
    h2: int,
    w2: int,
    interpret: bool = False,
    axis: str | None = None,
):
    """ncc_sweep over a device mesh: image rows shard over the mesh's
    first axis, each device runs the SAME Pallas kernel on its shard, and
    the only communication is a single-hop ppermute halo exchange over
    ICI (the multi-chip analog of the reference's row-partitioned rayon
    iteration, data.rs:164-340, and of its corridor segmentation
    discipline, gpu/mod.rs:31-35).

    Halos per field mirror the kernel's row margins: img1 KS rows (box
    filter), the rolled fields (vert/center/coeff/add) `window` rows
    (u-roll reach), w0 KS+window rows (roll + box). ppermute leaves
    non-receiving edge devices zero-filled — exactly the zero padding the
    unsharded driver applies at the true image boundary — and the kernel
    masks with GLOBAL row ids (row0_g) and the global height, so the
    sharded result is bit-identical to the single-device sweep.
    """
    ax = mesh.axis_names[0]
    n = mesh.devices.size
    h, w = avg1.shape
    hs = -(-h // n)
    hp = hs * n
    rpad = hp - h
    if rpad:
        def padr(x):
            return jnp.pad(x, ((0, rpad), (0, 0)))

        img1, vert, center, coeff, add, avg1, isd1, start, end, p_ok = (
            padr(x)
            for x in (
                img1, vert, center, coeff, add, avg1, isd1, start, end,
                p_ok,
            )
        )
        w0 = jnp.pad(w0, ((0, 0), (0, rpad), (0, 0)))

    wd = window
    hk = KS + wd
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]

    def halo(x, m, raxis=0):
        """Attach m rows of the previous/next shard along raxis;
        ppermute zero-fills the global top/bottom edges."""
        lo = jax.lax.slice_in_dim(x, x.shape[raxis] - m, x.shape[raxis], axis=raxis)
        hi = jax.lax.slice_in_dim(x, 0, m, axis=raxis)
        top = jax.lax.ppermute(lo, ax, fwd)
        bot = jax.lax.ppermute(hi, ax, bwd)
        return jnp.concatenate([top, x, bot], axis=raxis)

    import functools as _ft

    from jax.sharding import PartitionSpec as P

    row = P(ax, *([None] * 1))

    @_ft.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(row,) * 10 + (P(None, ax, None),),
        out_specs=(row, row, row),
        # pallas_call's out ShapeDtypeStructs carry no vma annotation;
        # varying-across-mesh checking can't see through the kernel.
        check_vma=False,
    )
    def run(img1_l, vert_l, cen_l, coe_l, add_l, avg1_l, isd1_l, start_l,
            end_l, pok_l, w0_l):
        row0_g = jax.lax.axis_index(ax).astype(jnp.int32) * jnp.int32(hs)
        return ncc_sweep(
            halo(img1_l, KS),
            halo(vert_l, wd) if axis is None else vert_l,
            halo(cen_l, wd),
            halo(coe_l, wd),
            halo(add_l, wd),
            avg1_l,
            isd1_l,
            start_l,
            end_l,
            pok_l,
            halo(w0_l, hk, raxis=1),
            threshold=threshold,
            min_stdev=min_stdev,
            window=window,
            corridor_size=corridor_size,
            h2=h2,
            w2=w2,
            interpret=interpret,
            axis=axis,
            row_halo=True,
            row0_g=row0_g,
            h_total=h,
        )

    corr, bx, by = run(
        img1, vert, center, coeff, add, avg1, isd1, start, end, p_ok, w0
    )
    if rpad:
        corr, bx, by = corr[:h], bx[:h], by[:h]
    return corr, bx, by
