"""Brute-force BRIEF descriptor matching on the MXU.

Reference (pointmatching.rs:43-77): for every keypoint in image 1, find the
image-2 keypoint with minimal Hamming distance over 256-bit descriptors
(XOR + popcount over 8 u32 words), keep it if the distance is within the
projection-mode threshold (32 affine / 48 perspective), and sort the
surviving matches by ascending distance.

TPU redesign: descriptors unpack to ±1 int8 vectors so that
    hamming(x, y) = (256 - <a, b>) / 2,
turning the O(N1*N2) XOR/popcount loop into an (N1,256)x(256,N2) int8
matmul on the systolic array, followed by a masked argmin. Row-chunking
bounds the live (chunk, N2) distance tile so N1*N2 never materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cybervision_tpu.utils.buckets import pow2_bucket, step_bucket

_BITS = 256
_WORDS = 8


def _unpack_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) int8 in {-1, +1} (bit i of word w ->
    column w*32+i, the packing order of ops.features.brief_descriptors)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (desc[:, :, None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], _BITS)
    return (bits.astype(jnp.int8) * 2 - 1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("chunk", "use_f32"))
def match_descriptors(
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    threshold: int,
    chunk: int = 4096,
    use_f32: bool = False,
):
    """Best match in set 2 for each descriptor in set 1.

    Returns (best_idx (N1,) int32, best_dist (N1,) int32, matched (N1,) bool).
    Ties resolve to the lowest index, like the reference's min_by over the
    iteration order (pointmatching.rs:61-71).

    use_f32 runs the distance matmul in f32 — EXACT for +-1 vectors (every
    product is +-1 and |sum| <= 256, far inside f32's 2^24 integer range)
    and ~3x faster on XLA:CPU, whose int8 dot path is a scalar loop while
    f32 hits the threaded SGEMM. The MXU wants the int8 form.
    """
    n1 = desc1.shape[0]
    a = _unpack_pm1(desc1)
    b = _unpack_pm1(desc2)
    if use_f32:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    # Invalid rows of set 2 get +inf-like distance via masking after matmul.
    bad2 = ~valid2

    # Never pad ABOVE n1: the common 1024/2048 descriptor buckets would
    # otherwise run the matmul on 3x-4x dead rows just to fill one chunk.
    # n1 is static at trace time, so the per-shape program is unchanged.
    chunk = min(chunk, max(n1, 1))
    pad = (-n1) % chunk
    a_p = jnp.pad(a, ((0, pad), (0, 0)))

    def one_chunk(a_c):
        dot = jax.lax.dot_general(
            a_c,
            b.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32 if use_f32 else jnp.int32,
        )
        dot = dot.astype(jnp.int32) if use_f32 else dot
        dist = (_BITS - dot) // 2  # exact Hamming distance
        dist = jnp.where(bad2[None, :], _BITS + 1, dist)
        best = jnp.argmin(dist, axis=1).astype(jnp.int32)
        best_d = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
        return best, best_d

    n_chunks = (n1 + pad) // chunk
    a_chunks = a_p.reshape(n_chunks, chunk, _BITS)
    best_idx, best_dist = jax.lax.map(one_chunk, a_chunks)
    best_idx = best_idx.reshape(-1)[:n1]
    best_dist = best_dist.reshape(-1)[:n1]

    matched = valid1 & (best_dist <= threshold)
    return best_idx, best_dist, matched


def match_descriptors_sharded(
    mesh,
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    threshold: int,
    chunk: int = 4096,
    use_f32: bool = False,
):
    """match_descriptors with the image-2 table sharded over the mesh.

    Tensor-parallel contraction: each device holds an N2/n_dev slice of
    the +-1 descriptor table, computes its (N1, N2/n_dev) distance tile
    and a local argmin, then a tiny (n_dev, N1) combine picks the global
    best. Ties resolve to the lowest global index (shards are ordered, and
    jnp.argmin keeps the first minimum) — same contract as the reference's
    min_by iteration order (pointmatching.rs:61-71).
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n2 = desc2.shape[0]
    pad2 = (-n2) % n_dev
    d2p = jnp.pad(desc2, ((0, pad2), (0, 0)))
    v2p = jnp.pad(valid2, (0, pad2))
    per = (n2 + pad2) // n_dev

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    def run(d1, v1, d2, v2):
        idx, dist, _ = match_descriptors(
            d1, v1, d2, v2, threshold, chunk=chunk, use_f32=use_f32
        )
        gidx = idx + jax.lax.axis_index(axis) * per
        return gidx[None], dist[None]

    gidx, dist = run(desc1, valid1, d2p, v2p)  # (n_dev, N1)
    return _combine_shard_mins(gidx, dist, valid1, threshold)


@jax.jit
def _combine_shard_mins(gidx, dist, valid1, threshold):
    best_dev = jnp.argmin(dist, axis=0)
    cols = jnp.arange(dist.shape[1])
    best_dist = dist[best_dev, cols]
    best_idx = gidx[best_dev, cols]
    matched = valid1 & (best_dist <= threshold)
    return best_idx, best_dist, matched


def _pad_rows(arr: np.ndarray, rows: int) -> np.ndarray:
    if len(arr) == rows:
        return arr
    out = np.zeros((rows,) + arr.shape[1:], dtype=arr.dtype)
    out[: len(arr)] = arr
    return out


@jax.jit
def _pack_match_result(idx, dist, ok):
    return jnp.stack(
        [idx.astype(jnp.int32), dist.astype(jnp.int32), ok.astype(jnp.int32)],
        axis=1,
    )


@jax.jit
def _match_packed_device(packed1: jnp.ndarray, packed2: jnp.ndarray, threshold):
    """Device body of match_keypoints_packed: consumes the ORB (K, 11)
    int32 packed rows (x, y, desc[8 bitcast], valid) directly — no
    descriptor fetch/re-upload. Invalid slots are masked instead of
    compacted; compaction preserves row order, so the argmin's
    lowest-index tie rule picks the same keypoint either way
    (pointmatching.rs:61-71), and masked rows can never win (distance
    257 > the 256-bit maximum).

    Returns (K1 + 1, 6) int32: rows (x1, y1, x2, y2, dist, ok) followed
    by one trailer row carrying (n_valid1, n_valid2, 0, 0, 0, 0) so the
    per-image feature counts ride the same single fetch."""
    pts1 = packed1[:, 0:2]
    pts2 = packed2[:, 0:2]
    d1 = jax.lax.bitcast_convert_type(packed1[:, 2:10], jnp.uint32)
    d2 = jax.lax.bitcast_convert_type(packed2[:, 2:10], jnp.uint32)
    v1 = packed1[:, 10] == 1
    v2 = packed2[:, 10] == 1
    from cybervision_tpu.parallel import active_platform

    idx, dist, ok = match_descriptors(
        d1, v1, d2, v2, threshold, use_f32=active_platform() == "cpu"
    )
    rows = jnp.concatenate(
        [
            pts1,
            pts2[idx],
            dist[:, None].astype(jnp.int32),
            ok[:, None].astype(jnp.int32),
        ],
        axis=1,
    )
    trailer = jnp.stack(
        [
            v1.sum(dtype=jnp.int32),
            v2.sum(dtype=jnp.int32),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
        ]
    )[None, :]
    return jnp.concatenate([rows, trailer], axis=0)


def match_keypoints_packed(
    packed1: jnp.ndarray, packed2: jnp.ndarray, threshold: int
) -> tuple[np.ndarray, int, int]:
    """Device-resident variant of match_keypoints for ORB packed arrays
    (features.extract_keypoints_pyramid_packed): one small fetch of the
    match rows replaces the descriptor fetch + re-upload round trip.

    Returns (matches (M, 4) int64 sorted by ascending Hamming distance,
    n_features1, n_features2)."""
    arr = np.asarray(_match_packed_device(packed1, packed2, threshold))
    n1, n2 = int(arr[-1, 0]), int(arr[-1, 1])
    rows = arr[:-1]
    ok = rows[:, 5] == 1
    sel = rows[ok]
    order = np.argsort(sel[:, 4], kind="stable")
    return sel[order, 0:4].astype(np.int64), n1, n2


def match_keypoints(
    pts1: np.ndarray,
    desc1: np.ndarray,
    pts2: np.ndarray,
    desc2: np.ndarray,
    threshold: int,
) -> np.ndarray:
    """Host-level wrapper: returns matches as an (M, 4) int64 array of
    (x1, y1, x2, y2) sorted by ascending Hamming distance
    (pointmatching.rs:74), ready for RANSAC top-inlier sampling."""
    if len(pts1) == 0 or len(pts2) == 0:
        return np.zeros((0, 4), dtype=np.int64)
    from cybervision_tpu.parallel import active_platform

    on_cpu = active_platform() == "cpu"
    # Descriptor counts are data-dependent (pyramid corners under the
    # response cap); pad each set to a power-of-two bucket with masked
    # tail rows so the (N1, N2) matmul program comes out of the compile
    # cache for any input pair instead of recompiling per exact count
    # (~45 s/program through the TPU tunnel). On CPU, compiles are local
    # and cheap — a finer 1024-step grid trims up to 4x of padded matmul
    # work (both sides pad, so pow2's worst case squares).
    bucket = step_bucket if on_cpu else pow2_bucket
    b1 = bucket(len(desc1))
    b2 = bucket(len(desc2))
    d1 = jnp.asarray(_pad_rows(desc1, b1))
    d2 = jnp.asarray(_pad_rows(desc2, b2))
    v1 = jnp.asarray(np.arange(b1) < len(desc1))
    v2 = jnp.asarray(np.arange(b2) < len(desc2))

    from cybervision_tpu.parallel import pipeline_mesh

    mesh = pipeline_mesh()
    if mesh is not None:
        idx, dist, ok = match_descriptors_sharded(
            mesh, d1, v1, d2, v2, threshold, use_f32=on_cpu
        )
    else:
        idx, dist, ok = match_descriptors(d1, v1, d2, v2, threshold, use_f32=on_cpu)
    # One packed fetch (three separate np.asarray's pay three ~30 ms
    # tunnel round trips).
    packed = np.asarray(_pack_match_result(idx, dist, ok))[: len(pts1)]
    idx = packed[:, 0]
    dist = packed[:, 1]
    ok = packed[:, 2] == 1

    p1 = pts1[ok]
    p2 = pts2[idx[ok]]
    d = dist[ok]
    order = np.argsort(d, kind="stable")
    return np.concatenate([p1[order], p2[order]], axis=1).astype(np.int64)
