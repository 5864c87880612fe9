"""Device-batched SFM primitives: P3P candidate scoring + DLT nullspaces.

SURVEY §7 maps the reference's P3P RANSAC (triangulation.rs:1033-1144)
and multi-view DLT (triangulation.rs:866-903) to vmapped device batches
like F-RANSAC. The split here:

  * P3P solving stays a vectorized host f64 closed form (tiny math, TPUs
    have no f64 — ops.sfm.solve_p3p);
  * candidate SCORING — the O(candidates x tracks) reprojection sweep
    that dominates — runs on device in f32, chunked over the hypothesis
    axis so only a (chunk, T) error tile is live, and sharded over the
    pipeline mesh when more than one chip is visible;
  * the DLT normal matrices (built on host in f64, 32 mul-adds per
    track-view) solve as ONE batched f32 eigh on device, then a single
    f64 inverse-iteration polish on the host restores reference-grade
    precision (the smallest eigenvalue is ~0 by construction, so one
    solve against ata + eps*I amplifies the nullspace component to
    machine accuracy).

Track/hypothesis axes are padded to power-of-two buckets so XLA compiles
a handful of programs per run instead of one per track count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cybervision_tpu.utils.buckets import pow2_bucket

# Below this many tracks the host eigh wins (device dispatch over the TPU
# tunnel costs ~30 ms; numpy eigh on 32k 4x4s is ~60 ms). Tests lower it
# to exercise the device path on small inputs.
DEVICE_DLT_MIN_TRACKS = 32_768


# ---------------------------------------------------------------------------
# P3P candidate scoring


@functools.partial(jax.jit, static_argnames=("chunk",))
def _p3p_score_jit(
    proj, s2d, s3d, pts3d, pts2d, const_err, inlier_t, points_t, chunk: int
):
    """proj (B, 3, 4) f32 candidate K[R|t]; s2d/s3d (B, 3, 2|3) the
    sampled observations/points; pts3d (T, 3), pts2d (T, 2), const_err
    (T,) (+inf on padded tracks). Returns (count, err_max, sample_ok)
    per candidate."""
    t = pts3d.shape[0]
    h3 = jnp.concatenate([pts3d, jnp.ones((t, 1), jnp.float32)], axis=1)
    # Candidate error statistic = MAX inlier error (the reference folds
    # error.max(match_error), triangulation.rs:1304-1305; the caller
    # divides by count to mirror error/(count as f64), rs:1128).

    def one(args):
        proj_c, s2d_c, s3d_c = args
        # Sample-consistency gate (triangulation.rs:1110-1117).
        sh = jnp.concatenate(
            [s3d_c, jnp.ones((*s3d_c.shape[:2], 1), jnp.float32)], axis=2
        )
        sp = jnp.einsum("bik,bnk->bni", proj_c, sh)
        sp2 = sp[..., :2] / sp[..., 2:3]
        serr = jnp.linalg.norm(sp2 - s2d_c, axis=2)
        sample_ok = jnp.all(jnp.isfinite(serr) & (serr < inlier_t), axis=1)
        # Score against every linked track (triangulation.rs:1119-1135).
        pp = jnp.einsum("bik,tk->bti", proj_c, h3)
        pp2 = pp[..., :2] / pp[..., 2:3]
        err = jnp.linalg.norm(pp2 - pts2d[None], axis=2)
        err = jnp.maximum(err, const_err[None])
        good = jnp.isfinite(err) & (err < points_t)
        count = jnp.sum(good, axis=1)
        err_max = jnp.max(jnp.where(good, err, 0.0), axis=1)
        return count, err_max, sample_ok

    nc = proj.shape[0] // chunk
    count, err_max, ok = jax.lax.map(
        one,
        (
            proj.reshape(nc, chunk, 3, 4),
            s2d.reshape(nc, chunk, 3, 2),
            s3d.reshape(nc, chunk, 3, 3),
        ),
    )
    return count.reshape(-1), err_max.reshape(-1), ok.reshape(-1)


def p3p_score(
    proj: np.ndarray,
    s2d: np.ndarray,
    s3d: np.ndarray,
    pts3d: np.ndarray,
    pts2d: np.ndarray,
    const_err: np.ndarray,
    inlier_t: float,
    points_t: float,
    chunk: int = 256,
):
    """Host wrapper: pads the track axis to a power-of-two bucket (padded
    const_err = +inf so padding never counts) and the candidate axis to a
    chunk multiple (NaN projections never fit); shards the candidate axis
    over the pipeline mesh when present. Returns numpy
    (count (B,), err_max (B,), sample_ok (B,))."""
    from cybervision_tpu.parallel import pipeline_mesh

    b = len(proj)
    t = len(pts3d)
    tb = pow2_bucket(max(t, 1))
    pts3d_p = np.zeros((tb, 3), np.float32)
    pts3d_p[:t] = pts3d
    pts2d_p = np.zeros((tb, 2), np.float32)
    pts2d_p[:t] = pts2d
    cerr_p = np.full((tb,), np.inf, np.float32)
    cerr_p[:t] = const_err

    mesh = pipeline_mesh()
    n_dev = mesh.devices.size if mesh is not None else 1
    step = chunk * n_dev
    pad = (-b) % step
    proj_p = np.full((b + pad, 3, 4), np.nan, np.float32)
    proj_p[:b] = proj
    s2d_p = np.zeros((b + pad, 3, 2), np.float32)
    s2d_p[:b] = s2d
    s3d_p = np.zeros((b + pad, 3, 3), np.float32)
    s3d_p[:b] = s3d

    args = (
        jnp.asarray(proj_p),
        jnp.asarray(s2d_p),
        jnp.asarray(s3d_p),
        jnp.asarray(pts3d_p),
        jnp.asarray(pts2d_p),
        jnp.asarray(cerr_p),
        jnp.float32(inlier_t),
        jnp.float32(points_t),
    )
    if mesh is None:
        count, err_max, ok = _p3p_score_jit(*args, chunk=chunk)
    else:
        count, err_max, ok = _p3p_score_sharded(mesh, *args, chunk=chunk)
    return (
        np.asarray(count)[:b],
        np.asarray(err_max)[:b],
        np.asarray(ok)[:b],
    )


def _p3p_score_sharded(
    mesh, proj, s2d, s3d, pts3d, pts2d, const_err, inlier_t, points_t,
    chunk: int,
):
    """Candidate axis sharded over 'dev' (the same data-parallel axis as
    F-RANSAC hypotheses)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    def run(proj_s, s2d_s, s3d_s):
        return _p3p_score_jit(
            proj_s, s2d_s, s3d_s, pts3d, pts2d, const_err,
            inlier_t, points_t, chunk,
        )

    return run(proj, s2d, s3d)


# ---------------------------------------------------------------------------
# DLT nullspaces


@jax.jit
def _eigvec_min_jit(ata):
    """(T, 4, 4) f32 -> (T, 4) eigenvector of the smallest eigenvalue."""
    _, v = jnp.linalg.eigh(ata)
    return v[:, :, 0]


def dlt_nullspaces(ata: np.ndarray) -> np.ndarray:
    """Batched smallest-eigenvector solve for DLT normal matrices.

    ata: (T, 4, 4) f64 PSD (rows normalized, eigenvalues in [0, O(1)]).
    Device f32 eigh + one host f64 inverse-iteration step: solving
    (ata + eps I) h = h32 amplifies the near-null component by
    ~1/(lambda_min + eps), so the polished vector is accurate to f64
    machine precision wherever the two smallest eigenvalues separate.
    """
    t = len(ata)
    tb = pow2_bucket(max(t, 1))
    pad = np.broadcast_to(np.eye(4), (tb - t, 4, 4))
    ata_p = np.concatenate([ata, pad]) if tb > t else ata
    h32 = np.asarray(
        _eigvec_min_jit(jnp.asarray(ata_p, jnp.float32)), np.float64
    )[:t]
    reg = ata + 1e-9 * np.eye(4)[None]
    try:
        h = np.linalg.solve(reg, h32[:, :, None])[:, :, 0]
    except np.linalg.LinAlgError:
        return h32
    norm = np.linalg.norm(h, axis=1, keepdims=True)
    good = np.isfinite(h).all(axis=1, keepdims=True) & (norm > 0)
    return np.where(good, h / np.maximum(norm, 1e-300), h32)
