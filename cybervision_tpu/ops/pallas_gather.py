"""Pallas TPU kernel: packed coordinate-table gather for RANSAC sampling.

The sampling stage gathers ~4.55M random rows (13 redraw rounds x 7
slots x 50k hypotheses) from a tiny (2, M) packed coordinate table
(ops.epipolar.pack_coord_table) every round. XLA's gather is
index-rate-bound at ~0.42 G indices/s regardless of payload width or
index dtype (tools A/B: slice-gather (2,M) 10.8 ms/round, row-gather
(M,2) 11.2, (M,8) 11.1 — 1-column gather is 3x WORSE), which made the
gather the largest stage of the optimized round.

This kernel keeps the whole table in VMEM and resolves each index with
a segmented lane gather: for each 128-entry table segment, one
`take_along_axis` (Mosaic tpu.dynamic_gather — gathers along lanes per
sublane row) plus an in-segment select. Cost per index element is
~(M/128) x 4 VPU ops — ~0.5 ms for the 4.55M-index round at the
2048-match bucket vs 10.8 ms for XLA's gather. The op count scales
linearly with M, so callers gate it to M <= MAX_TABLE (XLA's gather
wins beyond that; the perspective SFM buckets are 2048/8192).

Grid-less with explicit DMA, like ops.pallas_ncc / ops.pallas_score
(the axon remote TPU compiler rejects gridded pallas_call).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TS = 512  # index sublane rows per tile (TS x 128 indices resolved/tile)
SEG = 128  # table segment width (one lane tile)
MAX_TABLE = 8192  # beyond this the segmented sweep loses to XLA's gather


def _lane_gather(src, idx):
    """out[i, j] = src[i, idx[i, j]] — the tpu.dynamic_gather pattern,
    built directly on lax.gather with int32 indices. jnp.take_along_axis
    produces the same dnums but converts indices to int64 for
    negative-index normalization under jax_enable_x64, which Mosaic
    cannot lower (pallas_ncc docstring's recursion note)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        src,
        idx[..., None],
        dnums,
        (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _gather_kernel(
    tbl_hbm,  # (8, M) int32 — rows 0..1 live (packed12 / packed34)
    idx_hbm,  # (KP/128, 128) int32 flat indices
    o12_hbm,  # out (KP/128, 128) int32
    o34_hbm,  # out (KP/128, 128) int32
    s_tbl,  # VMEM (8, M)
    s_idx,  # VMEM (TS, 128)
    s_o12,  # VMEM (TS, 128)
    s_o34,  # VMEM (TS, 128)
    sems,
    *,
    n_tiles: int,
    m: int,
):
    i32 = jnp.int32
    load = pltpu.make_async_copy(tbl_hbm, s_tbl, sems.at[jnp.int32(0)])
    load.start()
    load.wait()

    def tile_body(carry):
        ti, tok = carry
        row0 = ti * jnp.int32(TS)
        cin = pltpu.make_async_copy(
            idx_hbm.at[pl.ds(row0, TS), :], s_idx, sems.at[jnp.int32(1)]
        )
        cin.start()
        cin.wait()
        idx = s_idx[...]  # (TS, 128)
        out12 = jnp.zeros((TS, 128), i32)
        out34 = jnp.zeros((TS, 128), i32)
        zero_tile = jnp.zeros((TS, SEG), i32)
        for s in range(m // SEG):  # static unroll: m is compile-time
            local = idx - jnp.int32(s * SEG)
            inseg = (local >= 0) & (local < SEG)
            # min/max with i32 constants, NOT jnp.clip: clip's python-int
            # bounds become i64 converts under jax_enable_x64 and recurse
            # in Mosaic's convert lowering.
            lc = jnp.minimum(
                jnp.maximum(local, jnp.int32(0)), jnp.int32(SEG - 1)
            )
            # add-zeros materialization, NOT jnp.broadcast_to: Mosaic's
            # gather rejects a sublane-broadcast source layout.
            seg12 = s_tbl[0:1, s * SEG : (s + 1) * SEG] + zero_tile
            seg34 = s_tbl[1:2, s * SEG : (s + 1) * SEG] + zero_tile
            out12 = jnp.where(inseg, _lane_gather(seg12, lc), out12)
            out34 = jnp.where(inseg, _lane_gather(seg34, lc), out34)
        s_o12[...] = out12
        s_o34[...] = out34
        co1 = pltpu.make_async_copy(
            s_o12, o12_hbm.at[pl.ds(row0, TS), :], sems.at[jnp.int32(2)]
        )
        co2 = pltpu.make_async_copy(
            s_o34, o34_hbm.at[pl.ds(row0, TS), :], sems.at[jnp.int32(3)]
        )
        co1.start()
        co2.start()
        co1.wait()
        co2.wait()
        return (ti + jnp.int32(1), tok)

    jax.lax.while_loop(
        lambda carry: carry[0] < jnp.int32(n_tiles),
        tile_body,
        (jnp.int32(0), jnp.int32(0)),
    )


def gather_packed(packed_t, idx, interpret=False):
    """jnp.take(packed_t, idx, axis=1) for a (2, M) int32 packed table
    and int32 indices of any shape — VMEM-resident segmented gather.

    M must be a 128-multiple <= MAX_TABLE (the drivers' pow2 buckets
    are; callers fall back to jnp.take beyond). Index values must be in
    [0, M). Returns (2,) + idx.shape int32, exactly jnp.take's values.
    """
    m = packed_t.shape[1]
    assert m % SEG == 0 and m <= MAX_TABLE, m
    shape = idx.shape
    k = 1
    for d in shape:
        k *= d
    lanes = TS * 128
    kp = k + (-k) % lanes
    idx_flat = jnp.zeros((kp,), jnp.int32)
    idx_flat = idx_flat.at[0:k].set(idx.reshape(-1).astype(jnp.int32))
    idx2 = idx_flat.reshape(kp // 128, 128)
    tbl8 = jnp.zeros((8, m), jnp.int32)
    tbl8 = tbl8.at[0:2, :].set(packed_t.astype(jnp.int32))

    kernel = functools.partial(
        _gather_kernel, n_tiles=kp // lanes, m=m
    )
    o12, o34 = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((kp // 128, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, m), jnp.int32),
            pltpu.VMEM((TS, 128), jnp.int32),
            pltpu.VMEM((TS, 128), jnp.int32),
            pltpu.VMEM((TS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(tbl8, idx2)
    return jnp.stack(
        [o12.reshape(-1)[0:k].reshape(shape), o34.reshape(-1)[0:k].reshape(shape)]
    )
