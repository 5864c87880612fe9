"""Pallas TPU kernel: batched RANSAC hypothesis scoring.

Scores C fundamental-matrix candidates against M matches with the
Sampson residual (fundamentalmatrix.rs:452-471) and reduces to
per-candidate (inlier count, inlier error sum) — the hot pass of every
50k-hypothesis RANSAC round (fundamentalmatrix.rs:117-133).

Why a kernel: the XLA form (ops.epipolar._ransac_batch_core's chunked
lax.map) materializes (chunk, M) line-field intermediates in HBM
(~450 MB per 8k chunk) instead of fusing; measured 17.5 ms per 50k
perspective round against ~4 ms for this kernel
(tools/bench_ransac_scan_stages3.py — and the stage bench's round-4
"scoring 17.5 ms" attribution turned out to hide 13 ms of solver
VALIDITY work that XLA dead-code-eliminated from the cumulative-stage
baselines). Here every tile stays VMEM-resident: candidates ride
sublane tiles (TC rows), matches ride lane slabs (MS columns), and the
only HBM traffic is the (C, 16) candidate table in and the (C, 8)
count/err-sum columns out (~10 MB/round against ~8.6 G VPU ops —
compute-bound at ~28 ops per (candidate, match) element).

Structure notes (same constraints as ops.pallas_ncc): the axon remote
TPU compiler crashes on any gridded pallas_call, so this is a single
program with an internal while-loop over candidate tiles and manual
HBM<->VMEM DMA; every scalar index stays int32; the match-slab loop is
a lax.fori_loop so its (TC, MS) temporaries are reused, not unrolled
(an unrolled slab loop at a 32k-match bucket allocated 228 MB of
scoped VMEM).

Numerics: the five linear forms per (candidate, match) —

    la, lb = (F p1h)_x, _y     (epipolar line in image 2)
    ra, rb = (F^T p2h)_x, _y   (epipolar line in image 1)
    bil    = x2*la + y2*lb + lw = p2h^T F p1h

— are the exact fma chains of ops.epipolar.sampson_error, so per-
element errors (and the counts) match the XLA form bitwise; only the
err-sum reduction order (MS-slab-major) differs, to f32 reduction
tolerance (tests/test_epipolar.py::test_pallas_score_matches_xla).
Both paths share the drivers, so fused/multi-pair/sequential parity is
unaffected (each backend uses one path consistently).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TC = 1024  # candidates per tile (lane axis)
MS = 256  # match slab (sublane axis)


def _score_kernel(
    t_smem,  # (1, 1) f32 threshold
    fft_hbm,  # (16, CP) f32: rows 0..8 = flattened F, rest zero
    pts_hbm,  # (M, 8) f32: cols x1 y1 x2 y2 mask 0 0 0
    count_hbm,  # out (8, CP) f32 (row 0 live)
    esum_hbm,  # out (8, CP) f32 (row 0 live)
    s_ff,  # VMEM (16, TC)
    s_pts,  # VMEM (M, 8) — padded to (M, 128) tiles, 0.5 KB/match
    o_cnt,  # VMEM (8, TC)
    o_esum,  # VMEM (8, TC)
    sems,
    *,
    n_tiles: int,
    m: int,
):
    f32 = jnp.float32
    load = pltpu.make_async_copy(pts_hbm, s_pts, sems.at[jnp.int32(0)])
    load.start()
    load.wait()
    t = t_smem[0, 0]

    def tile_body(carry):
        i, tok = carry
        col0 = i * jnp.int32(TC)
        cin = pltpu.make_async_copy(
            fft_hbm.at[:, pl.ds(col0, TC)], s_ff, sems.at[jnp.int32(1)]
        )
        cin.start()
        cin.wait()

        def c(k):  # (1, TC) candidate row, broadcasts over MS sublanes
            return s_ff[k : k + 1, :]

        def slab_body(si, acc):
            cnt, esum = acc
            s0 = si * jnp.int32(MS)

            def p(kcol):  # (MS, 1) match column, broadcasts over TC lanes
                return s_pts[pl.ds(s0, MS), kcol : kcol + 1]

            x1, y1, x2, y2, mask = p(0), p(1), p(2), p(3), p(4)
            la = c(0) * x1 + c(1) * y1 + c(2)
            lb = c(3) * x1 + c(4) * y1 + c(5)
            lw = c(6) * x1 + c(7) * y1 + c(8)
            ra = c(0) * x2 + c(3) * y2 + c(6)
            rb = c(1) * x2 + c(4) * y2 + c(7)
            num = (x2 * la + y2 * lb + lw) ** 2
            den = la * la + lb * lb + ra * ra + rb * rb
            err = num / den
            # err <= t is False for NaN (0/0) and +inf — the XLA form's
            # isfinite guard is implied by the comparison.
            fits = (err <= t) & (mask > f32(0.5))
            cnt = cnt + jnp.sum(
                fits.astype(f32), axis=0, keepdims=True, dtype=f32
            )
            esum = esum + jnp.sum(
                jnp.where(fits, err, f32(0.0)),
                axis=0,
                keepdims=True,
                dtype=f32,
            )
            return (cnt, esum)

        cnt, esum = jax.lax.fori_loop(
            jnp.int32(0),
            jnp.int32(m // MS),
            slab_body,
            (jnp.zeros((1, TC), f32), jnp.zeros((1, TC), f32)),
        )
        # Full-height stores: HBM DMA slices must be 8-sublane aligned,
        # so the live row rides an (8, TC) buffer (rows 1-7 are dead
        # freight, ~10 MB/round of write traffic).
        o_cnt[...] = jnp.broadcast_to(cnt, (8, TC))
        o_esum[...] = jnp.broadcast_to(esum, (8, TC))
        co1 = pltpu.make_async_copy(
            o_cnt, count_hbm.at[:, pl.ds(col0, TC)], sems.at[jnp.int32(2)]
        )
        co2 = pltpu.make_async_copy(
            o_esum, esum_hbm.at[:, pl.ds(col0, TC)], sems.at[jnp.int32(3)]
        )
        co1.start()
        co2.start()
        co1.wait()
        co2.wait()
        return (i + jnp.int32(1), tok)

    jax.lax.while_loop(
        lambda carry: carry[0] < jnp.int32(n_tiles),
        tile_body,
        (jnp.int32(0), jnp.int32(0)),
    )


def score_candidates(ff, p1, p2, m_valid, threshold, interpret=False):
    """(count (C,) int32, err_sum (C,) f32) for candidates ff (C, 3, 3)
    against matches p1, p2 ((M, 2) f32) with validity mask m_valid (M,).

    Candidate rows pad to the TC tile with zero F (den = 0 -> err NaN ->
    no fits); the match axis must be an MS multiple (the drivers' pow2
    buckets are). Counts accumulate as f32 — exact for integer values
    < 2^24, and M <= 2^24 always (under jax_enable_x64 an int sum would
    promote to int64, which Mosaic does not lower)."""
    c_total = ff.shape[0]
    m = p1.shape[0]
    assert m % MS == 0, m
    ffl = ff.reshape(c_total, 9).astype(jnp.float32)
    cpad = (-c_total) % TC
    cp = c_total + cpad
    fft = jnp.zeros((16, cp), jnp.float32)
    fft = fft.at[0:9, 0:c_total].set(ffl.T)
    pts = jnp.zeros((m, 8), jnp.float32)
    pts = pts.at[:, 0:2].set(p1.astype(jnp.float32))
    pts = pts.at[:, 2:4].set(p2.astype(jnp.float32))
    pts = pts.at[:, 4].set(m_valid.astype(jnp.float32))
    t_arr = jnp.full((1, 1), threshold, jnp.float32)

    kernel = functools.partial(_score_kernel, n_tiles=cp // TC, m=m)
    count, esum = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, cp), jnp.float32),
            jax.ShapeDtypeStruct((8, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, TC), jnp.float32),
            pltpu.VMEM((m, 8), jnp.float32),
            pltpu.VMEM((8, TC), jnp.float32),
            pltpu.VMEM((8, TC), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(t_arr, fft, pts)
    return (
        count[0, :c_total].astype(jnp.int32),
        esum[0, :c_total],
    )


def score_candidates_xla(ff, p1, p2, m_valid, threshold):
    """The chunked-XLA reference form (for parity tests / CPU): same
    contract as score_candidates."""
    from cybervision_tpu.ops.epipolar import sampson_error

    chunk = 8192
    total = ff.shape[0]
    pad = (-total) % chunk
    ff_p = jnp.pad(ff, ((0, pad), (0, 0), (0, 0)))

    def score_chunk(f_c):
        err = sampson_error(f_c, p1, p2)
        fits = jnp.isfinite(err) & (err <= threshold) & m_valid[None, :]
        return (
            jnp.sum(fits, axis=1),
            jnp.sum(jnp.where(fits, err, 0.0), axis=1),
        )

    n_chunks = (total + pad) // chunk
    count, err_sum = jax.lax.map(
        score_chunk, ff_p.reshape(n_chunks, chunk, 3, 3)
    )
    return count.reshape(-1)[:total], err_sum.reshape(-1)[:total]
