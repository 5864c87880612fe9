"""Fundamental-matrix estimation: device-batched RANSAC.

Reference (fundamentalmatrix.rs): up to 1M RANSAC iterations in 50k
batches with early exit; affine model from 4 mean-centered correspondences
via SVD nullspace (fundamentalmatrix.rs:260-286); perspective 7-point from
the two smallest right singular vectors + det-constraint cubic + rank and
epipolar-sign checks (fundamentalmatrix.rs:289-389); Sampson-style
residual scoring over all matches (fundamentalmatrix.rs:452-471);
Levenberg-Marquardt refinement over a 7-parameter det(F)=0 parametrization
(fundamentalmatrix.rs:391-449,515-621).

TPU redesign (SURVEY.md §7): hypotheses are a leading device batch axis —
sampling with jax.random, nullspaces via batched eigh of A^T A (friendlier
to XLA than tiny SVDs), closed-form cubic roots, and chunked scoring with
running (count, error) reductions so the B x M error matrix never
materializes. Deviation from the reference: the per-iteration 7-point LM
inside perspective validation (fundamentalmatrix.rs:201-205) is replaced
by LM refinement of the best hypothesis over its full inlier set — the
same accuracy contract without a serial inner loop in the batched sweep.

Coordinates are Hartley-normalized for the perspective solve (f32 on the
MXU needs the conditioning; the reference gets away with raw pixels only
because it computes in f64).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from cybervision_tpu.config import ProjectionMode, RansacConfig
from cybervision_tpu.errors import RansacError
from cybervision_tpu.utils.buckets import pow2_bucket

# ---------------------------------------------------------------------------
# Residual


def sampson_error(f: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """First-order epipolar residual (fundamentalmatrix.rs:461-471):
    (p2' F p1)^2 / (|F p1|_xy^2 + |F' p2|_xy^2).

    f: (..., 3, 3); p1, p2: (M, 2). Returns (..., M).

    Written as broadcast arithmetic over (..., M), NOT einsums: the
    dot_general form materializes two (..., M, 3) line fields (~1.2 GB of
    memory traffic per (2048, 8192) scoring tile) where this form fuses
    into a single output-sized pass. The RANSAC sweep is bandwidth-bound
    on every backend — this is the difference between 1.7 s and ~0.1 s
    per tile on XLA:CPU, and it skips two HBM round trips on TPU.
    """
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    fe = f.reshape(f.shape[:-2] + (9,))

    def c(i):
        return fe[..., i, None]  # (..., 1), broadcasts against (M,)

    l_a = c(0) * x1 + c(1) * y1 + c(2)  # (F p1)_x
    l_b = c(3) * x1 + c(4) * y1 + c(5)  # (F p1)_y
    l_w = c(6) * x1 + c(7) * y1 + c(8)  # (F p1)_z
    r_a = c(0) * x2 + c(3) * y2 + c(6)  # (F' p2)_x
    r_b = c(1) * x2 + c(4) * y2 + c(7)  # (F' p2)_y
    num = (x2 * l_a + y2 * l_b + l_w) ** 2
    den = l_a * l_a + l_b * l_b + r_a * r_a + r_b * r_b
    return num / den


# ---------------------------------------------------------------------------
# Normalization


def _hartley_np(pts: np.ndarray) -> np.ndarray:
    """Host-side hartley_normalization (same math, numpy f64)."""
    pts = pts.astype(np.float64)
    c = pts.mean(axis=0)
    d = np.sqrt(((pts - c) ** 2).sum(axis=1))
    s = np.sqrt(2.0) / max(d.mean(), 1e-12)
    return np.array(
        [[s, 0.0, -s * c[0]], [0.0, s, -s * c[1]], [0.0, 0.0, 1.0]]
    )


def hartley_normalization(pts: jnp.ndarray) -> jnp.ndarray:
    """Similarity T mapping pts to zero centroid / sqrt(2) RMS radius.
    pts: (M, 2) -> (3, 3)."""
    c = jnp.mean(pts, axis=0)
    d = jnp.sqrt(jnp.sum((pts - c) ** 2, axis=1))
    s = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d), 1e-12)
    return jnp.array(
        [[s, 0.0, -s * c[0]], [0.0, s, -s * c[1]], [0.0, 0.0, 1.0]], pts.dtype
    )


# ---------------------------------------------------------------------------
# Model solvers (batched over hypotheses)


def solve_affine_batch(s1: jnp.ndarray, s2: jnp.ndarray, rank_eps: float):
    """Affine fundamental matrices from 4-point samples.

    s1, s2: (B, 4, 2) image-1/image-2 points (pixel units).
    Returns (f (B, 3, 3), valid (B,)).

    Nullspace of the mean-centered (B,4,4) system [x2 y2 x1 y1];
    F = [[0,0,v0],[0,0,v1],[v2,v3,-v.mean]] (fundamentalmatrix.rs:260-286).

    Everything is closed form (a batched 4x4 eigh burned 135 ms per 50k
    hypotheses on a v5e; this is ~1 ms): the centered A has rank <= 3
    (columns sum to zero), so its nullvector is the 4D cross product of
    three sample rows (cofactor determinants), and A^T A's spectrum is
    exactly {0} union the roots of its characteristic CUBIC — solved
    with the same batched cubic_roots as the 7-point path. The
    degeneracy test matches the reference's second-LARGEST singular
    value >= eps (nalgebra sorts descending, fundamentalmatrix.rs:273):
    sigma_1^2 is the median root. Deviation: rank-2 samples (a 2D
    nullspace, where the reference emits an arbitrary basis vector) are
    rejected via a near-zero cross product — such hypotheses never score.
    """
    a = jnp.concatenate([s2, s1], axis=2)  # (B, 4, 4) columns x2 y2 x1 y1
    mean = jnp.mean(a, axis=1, keepdims=True)
    a = a - mean
    # Normalize per batch so f32 determinant cancellation stays bounded.
    norm = jnp.maximum(jnp.max(jnp.abs(a), axis=(1, 2), keepdims=True), 1e-12)
    an = a / norm

    # 4D cross product of sample rows 0..2: v_i = (-1)^i det(minor_i).
    r = an[:, :3, :]  # (B, 3, 4)

    def det3(j, k, l):
        c0, c1, c2 = r[:, :, j], r[:, :, k], r[:, :, l]
        return (
            c0[:, 0] * (c1[:, 1] * c2[:, 2] - c1[:, 2] * c2[:, 1])
            - c1[:, 0] * (c0[:, 1] * c2[:, 2] - c0[:, 2] * c2[:, 1])
            + c2[:, 0] * (c0[:, 1] * c1[:, 2] - c0[:, 2] * c1[:, 1])
        )

    v = jnp.stack(
        [det3(1, 2, 3), -det3(0, 2, 3), det3(0, 1, 3), -det3(0, 1, 2)],
        axis=1,
    )
    vn = jnp.sqrt(jnp.sum(v * v, axis=1))
    v = v / jnp.maximum(vn, 1e-30)[:, None]

    # sigma_1 (second largest) via the characteristic cubic of A^T A.
    m = jnp.einsum("bij,bik->bjk", an, an)
    t1 = jnp.einsum("bii->b", m)
    t2 = jnp.sum(m * m, axis=(1, 2))  # tr(M^2), M symmetric
    t3 = jnp.einsum("bij,bjk,bki->b", m, m, m)
    c2 = 0.5 * (t1 * t1 - t2)
    c1 = (t1 ** 3 - 3.0 * t1 * t2 + 2.0 * t3) / 6.0
    ones = jnp.ones_like(t1)
    roots, roots_ok = cubic_roots(ones, -t1, c2, -c1)
    roots = jnp.where(roots_ok, jnp.maximum(roots, 0.0), 0.0)
    # median of the three roots == second largest eigenvalue (the fourth
    # eigenvalue is the structural zero).
    med = jnp.sum(roots, axis=1) - jnp.max(roots, axis=1) - jnp.min(
        roots, axis=1
    )
    s1_sv = jnp.sqrt(jnp.maximum(med, 0.0)) * norm[:, 0, 0]
    valid = (s1_sv >= rank_eps) & (vn > 1e-12) & jnp.all(
        jnp.isfinite(v), axis=1
    )

    e = jnp.einsum("bi,bi->b", v, mean[:, 0, :])
    zeros = jnp.zeros_like(e)
    f = jnp.stack(
        [
            jnp.stack([zeros, zeros, v[:, 0]], axis=1),
            jnp.stack([zeros, zeros, v[:, 1]], axis=1),
            jnp.stack([v[:, 2], v[:, 3], -e], axis=1),
        ],
        axis=1,
    )
    # Unlike the reference (fundamentalmatrix.rs:285) F is NOT normalized
    # by F[2,2]: for ideal SEM geometry (all sampled dy == 0) that entry
    # is exactly zero and the divide rejects perfect hypotheses. Sampson
    # scoring is scale-invariant, so the normalization is cosmetic.
    return f, valid


def cubic_roots(c3, c2, c1, c0, axis: int = -1):
    """Real roots of c3 x^3 + c2 x^2 + c1 x + c0, batched.

    Returns (roots, valid) with the 3 root slots stacked on `axis`
    (default -1: shapes (..., 3)); invalid slots are masked. Falls back
    to the quadratic/linear cases when leading coefficients vanish (the
    reference delegates to roots::find_roots_cubic). axis=0 keeps a
    lane-major batch on the minor axis — used by the perspective
    validity chain, where a (..., 3)-minor layout wastes 42/128 of
    every VPU tile.
    """
    dt = c3.dtype
    tiny = jnp.asarray(1e-20, dt)

    if axis == 0:
        def ex(x):  # root-slot axis leading
            return x[None]

        def stk(parts):
            return jnp.stack(parts, axis=0)

        k3 = jnp.arange(3, dtype=dt).reshape((3,) + (1,) * c3.ndim)
    else:
        assert axis == -1

        def ex(x):
            return x[..., None]

        def stk(parts):
            return jnp.stack(parts, axis=-1)

        k3 = jnp.arange(3, dtype=dt)

    # --- cubic branch (depressed cubic + trigonometric/Cardano method)
    a = jnp.where(jnp.abs(c3) > tiny, c3, 1.0)
    b, c, d = c2 / a, c1 / a, c0 / a
    p = c - b * b / 3.0
    q = 2.0 * b**3 / 27.0 - b * c / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    shift = -b / 3.0

    # disc > 0: one real root (Cardano)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    root_single = u + v + shift

    # disc <= 0: three real roots (trigonometric)
    pm = jnp.minimum(p, -tiny)  # p < 0 in this branch
    m = 2.0 * jnp.sqrt(-pm / 3.0)
    arg = jnp.clip(3.0 * q / (pm * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    root_triple = ex(m) * jnp.cos(ex(theta) - 2.0 * jnp.pi * k3 / 3.0) + ex(
        shift
    )

    three = disc <= 0
    cubic_r = jnp.where(
        ex(three),
        root_triple,
        stk([root_single, root_single, root_single]),
    )
    cubic_ok = stk([jnp.ones_like(three), three, three])

    # --- quadratic branch c2 x^2 + c1 x + c0
    qa = jnp.where(jnp.abs(c2) > tiny, c2, 1.0)
    qd = c1 * c1 - 4.0 * c2 * c0
    qs = jnp.sqrt(jnp.maximum(qd, 0.0))
    quad_r = stk(
        [(-c1 + qs) / (2.0 * qa), (-c1 - qs) / (2.0 * qa), jnp.zeros_like(qa)]
    )
    quad_ok = stk([qd >= 0, qd >= 0, jnp.zeros_like(qd, dtype=bool)])

    # --- linear branch c1 x + c0
    lin_r = stk([-c0 / jnp.where(jnp.abs(c1) > tiny, c1, 1.0)] * 3)
    lin_ok = stk(
        [jnp.abs(c1) > tiny, jnp.zeros_like(c1, bool), jnp.zeros_like(c1, bool)]
    )

    is_cubic = jnp.abs(c3) > tiny
    is_quad = ~is_cubic & (jnp.abs(c2) > tiny)
    roots = jnp.where(
        ex(is_cubic), cubic_r, jnp.where(ex(is_quad), quad_r, lin_r)
    )
    ok = jnp.where(
        ex(is_cubic), cubic_ok, jnp.where(ex(is_quad), quad_ok, lin_ok)
    )
    return roots, ok


def _nullspace2_batch(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Orthonormal basis (two 9-vectors) of null(a) for a (B, 7, 9) batch.

    Batched Householder triangularization of V = a^T: 7 unit reflectors
    v_k zero the subdiagonal of V in sequence; the full Q's columns 7
    and 8 — an exact orthonormal nullspace basis — are H1...H7 e_j,
    built by applying the reflectors in reverse to the unit vectors.
    Every step is batched elementwise/reduction work (no per-batch
    loops, nothing below the leading axis), which is why it beats the
    general-purpose blocked QR by ~4x (see solve_perspective_batch).
    """
    v_t = a.transpose(0, 2, 1).astype(jnp.float32)  # (B, 9, 7)
    cols = jnp.arange(9)
    vs = []
    r = v_t
    for k in range(7):
        x = r[:, :, k]  # (B, 9)
        xk = jnp.where((cols >= k)[None, :], x, 0.0)
        alpha = jnp.sqrt(jnp.sum(xk * xk, axis=1))
        sign = jnp.where(xk[:, k] >= 0, 1.0, -1.0)
        e_k = (cols == k).astype(jnp.float32)[None, :]
        v = xk + (sign * alpha)[:, None] * e_k
        v = v / jnp.maximum(
            jnp.sqrt(jnp.sum(v * v, axis=1)), 1e-30
        )[:, None]
        vs.append(v)
        proj = jnp.einsum("bi,bik->bk", v, r)
        r = r - 2.0 * v[:, :, None] * proj[:, None, :]

    def q_col(j):
        q = jnp.broadcast_to(
            (cols == j).astype(jnp.float32)[None, :], v_t.shape[:1] + (9,)
        )
        for k in range(6, -1, -1):
            q = q - 2.0 * vs[k] * jnp.sum(vs[k] * q, axis=1, keepdims=True)
        return q

    return q_col(7), q_col(8)


def solve_perspective_batch(
    s1: jnp.ndarray, s2: jnp.ndarray, rank_eps: float
):
    """Perspective 7-point solver on (already normalized) coordinates.

    s1, s2: (B, 7, 2). Returns (f (B, 3, 3, 3), valid (B, 3)) — up to three
    real det-constraint roots per sample (fundamentalmatrix.rs:289-389).
    """
    b = s1.shape[0]
    ones = jnp.ones((b, 7, 1), s1.dtype)
    x1 = jnp.concatenate([s1, ones], axis=2)  # (B, 7, 3)
    x2 = jnp.concatenate([s2, ones], axis=2)
    # Epipolar constraint rows: kron(p2, p1) ordering x2*x1, x2*y1, x2, ...
    a = jnp.einsum("bni,bnj->bnij", x2, x1).reshape(b, 7, 9)

    # Two-dimensional null subspace of the 7x9 system. Only the SPAN
    # matters — the det-constraint lambda sweep below covers any
    # orthonormal basis of it. Hand-rolled batched Householder (7
    # reflectors over A^T, then apply them in reverse to e7/e8) instead
    # of jnp.linalg.qr(mode="complete"): the generic QR materializes all
    # 9 Q columns through XLA's blocked algorithm, this form computes
    # exactly the two nullspace columns with pure batched VPU arithmetic
    # — 8.5 ms vs 35.3 ms per 50k on a v5e at equal (slightly better)
    # |A v| residuals. Both beat the 9x9 eigh of A^T A (669.6 ms and
    # ~1e4x worse f32 accuracy from squaring the condition number).
    q7, q8 = _nullspace2_batch(a)
    f1 = q7.reshape(b, 3, 3)
    f2 = q8.reshape(b, 3, 3)

    # det(lam*F1 + (1-lam)*F2) = 0 via the mixed-column determinant tensor
    # (vgg_singF_from_FF; fundamentalmatrix.rs:327-349).
    fs = jnp.stack([f1, f2], axis=1)  # (B, 2, 3, 3)

    def det_ijk(i, j, k):
        c0 = fs[:, i, :, 0]
        c1 = fs[:, j, :, 1]
        c2 = fs[:, k, :, 2]
        return (
            c0[:, 0] * (c1[:, 1] * c2[:, 2] - c1[:, 2] * c2[:, 1])
            - c1[:, 0] * (c0[:, 1] * c2[:, 2] - c0[:, 2] * c2[:, 1])
            + c2[:, 0] * (c0[:, 1] * c1[:, 2] - c0[:, 2] * c1[:, 1])
        )

    d = {}
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                d[(i, j, k)] = det_ijk(i, j, k)

    c3 = (
        -d[(1, 0, 0)] + d[(0, 1, 1)] + d[(0, 0, 0)] + d[(1, 1, 0)]
        + d[(1, 0, 1)] - d[(0, 1, 0)] - d[(0, 0, 1)] - d[(1, 1, 1)]
    )
    c2 = (
        d[(0, 0, 1)] - 2.0 * d[(0, 1, 1)] - 2.0 * d[(1, 0, 1)] + d[(1, 0, 0)]
        - 2.0 * d[(1, 1, 0)] + d[(0, 1, 0)] + 3.0 * d[(1, 1, 1)]
    )
    c1 = d[(1, 1, 0)] + d[(0, 1, 1)] + d[(1, 0, 1)] - 3.0 * d[(1, 1, 1)]
    c0 = d[(1, 1, 1)]

    lam, lam_ok = cubic_roots(c3, c2, c1, c0)  # (B, 3)

    f = (
        lam[:, :, None, None] * f1[:, None]
        + (1.0 - lam[:, :, None, None]) * f2[:, None]
    )  # (B, 3roots, 3, 3)

    # --- validity, lane-major -------------------------------------------
    # Everything below runs on (3roots, B) / (3roots, n, B) component
    # arrays — candidates stay on the VPU's 128-lane minor axis. The
    # former einsum/argmax/take_along_axis forms over (..., 3, 3)-minor
    # tensors cost 13.0 ms of a 41 ms 50k round (hidden from the round-4
    # stage table because cumulative-stage baselines let XLA dead-code-
    # eliminate `valid`; tools/bench_ransac_scan_stages3.py probes); the
    # closed-form component arithmetic here is ~1 ms. Per-element values
    # are the same formulas in the same precision — only XLA's reduction
    # /layout scheduling differs.
    lam_t = lam.T  # (3roots, B)
    om_t = 1.0 - lam_t
    fk = [
        lam_t * q7[:, k][None, :] + om_t * q8[:, k][None, :]
        for k in range(9)
    ]  # 9 x (3roots, B), bitwise the entries of f above

    # Rank-2 check on singular values (fundamentalmatrix.rs:365-371):
    # sigma_1 >= eps (rank >= 2) and sigma_2 <= eps (rank <= 2).
    # Closed form: a 3x3 symmetric spectrum is the characteristic cubic
    # (a batched 150k 3x3 eigh cost ~540 ms on a v5e). T = F^T F's six
    # unique entries are 3-term dots of F's columns; the power sums
    # p_k = tr(T^k) come from Newton's identities (p3 = tr(T^3) in the
    # symmetric closed form), and the spectrum solves
    # x^3 - p1 x^2 + e2 x - e3 = 0.
    def tdot(j, k):
        return fk[j] * fk[k] + fk[3 + j] * fk[3 + k] + fk[6 + j] * fk[6 + k]

    t00, t11, t22 = tdot(0, 0), tdot(1, 1), tdot(2, 2)
    t01, t02, t12 = tdot(0, 1), tdot(0, 2), tdot(1, 2)
    p1_ = t00 + t11 + t22
    p2_ = (
        t00 * t00 + t11 * t11 + t22 * t22
        + 2.0 * (t01 * t01 + t02 * t02 + t12 * t12)
    )
    p3_ = (
        t00 ** 3 + t11 ** 3 + t22 ** 3
        + 3.0 * (
            t00 * (t01 * t01 + t02 * t02)
            + t11 * (t01 * t01 + t12 * t12)
            + t22 * (t02 * t02 + t12 * t12)
        )
        + 6.0 * t01 * t02 * t12
    )
    e2_ = 0.5 * (p1_ * p1_ - p2_)
    e3_ = (p1_ ** 3 - 3.0 * p1_ * p2_ + 2.0 * p3_) / 6.0
    ev, ev_ok = cubic_roots(
        jnp.ones_like(p1_), -p1_, e2_, -e3_, axis=0
    )  # (3ev, 3roots, B)
    ev = jnp.where(ev_ok, jnp.maximum(ev, 0.0), 0.0)
    r0, r1, r2 = ev[0], ev[1], ev[2]
    ev_min = jnp.minimum(jnp.minimum(r0, r1), r2)
    ev_max = jnp.maximum(jnp.maximum(r0, r1), r2)
    ev_mid = (r0 + r1 + r2) - ev_min - ev_max
    sv_max = jnp.sqrt(jnp.maximum(ev_max, 0.0))
    sv1 = jnp.sqrt(jnp.maximum(ev_mid, 0.0))
    # sigma_0 via |det F| / (sigma_max * sigma_1), NOT the cubic's
    # smallest root: the characteristic constant e3 = (p1^3 - 3 p1 p2 +
    # 2 p3)/6 cancels catastrophically in f32 (p1^3 ~ 1e14 against a
    # true e3 ~ 1e5 at typical normalized conditioning), so the small
    # root is rounding noise and the rank<=2 gate fired on that noise —
    # in BOTH directions (real rank-2 candidates rejected, rank-3
    # candidates accepted; latent pre-round-5, surfaced by
    # tests/test_cross_oracle.py). det(F) is a direct 3x3 cofactor
    # expansion with no large-power cancellation, and the two large
    # singular values from the cubic are well-conditioned.
    det_f = (
        fk[0] * (fk[4] * fk[8] - fk[5] * fk[7])
        - fk[1] * (fk[3] * fk[8] - fk[5] * fk[6])
        + fk[2] * (fk[3] * fk[7] - fk[4] * fk[6])
    )
    sv0 = jnp.abs(det_f) / jnp.maximum(sv_max * sv1, 1e-30)
    rank_ok_t = (sv1 >= rank_eps) & (sv0 <= rank_eps)  # (3roots, B)

    # Sign-consistency (fundamentalmatrix.rs:376-383): with e1 the null
    # vector of F^T (left epipole), all points must satisfy
    # sign((F x2)_i . ([e1]x x1)_i) consistent. For a rank-2 F the left
    # null vector is orthogonal to F's columns: the largest pairwise
    # cross product of the columns (closed form; the sign test is
    # sign-invariant so the arbitrary orientation is fine). The
    # argmax/take_along_axis pick becomes a nested where with the same
    # first-of-equal-maxima tie-break.
    col = [(fk[j], fk[3 + j], fk[6 + j]) for j in range(3)]  # F's columns

    def vcross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    c01 = vcross(col[0], col[1])
    c02 = vcross(col[0], col[2])
    c12 = vcross(col[1], col[2])

    def n2(v):
        return v[0] * v[0] + v[1] * v[1] + v[2] * v[2]

    n01, n02, n12 = n2(c01), n2(c02), n2(c12)
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = ~use01 & (n02 >= n12)
    e1 = tuple(
        jnp.where(use01, c01[i], jnp.where(use02, c02[i], c12[i]))
        for i in range(3)
    )  # epipole components, (3roots, B)

    # s_n = (F x2h_n) . (e1 x x1h_n) over the 7 sampled points, as
    # (3roots, n, B) broadcasts; s1/s2 are the solver's (normalized)
    # input coordinates — the same x1/x2 the einsum form used.
    n1x = s1[:, :, 0].T[None]  # (1, n, B)
    n1y = s1[:, :, 1].T[None]
    n2x = s2[:, :, 0].T[None]
    n2y = s2[:, :, 1].T[None]

    def r3(v):  # (3roots, B) -> (3roots, 1, B)
        return v[:, None, :]

    fx2_0 = r3(fk[0]) * n2x + r3(fk[1]) * n2y + r3(fk[2])
    fx2_1 = r3(fk[3]) * n2x + r3(fk[4]) * n2y + r3(fk[5])
    fx2_2 = r3(fk[6]) * n2x + r3(fk[7]) * n2y + r3(fk[8])
    # l1 = e1 x x1h with x1h = (n1x, n1y, 1)
    l1_0 = r3(e1[1]) - r3(e1[2]) * n1y
    l1_1 = r3(e1[2]) * n1x - r3(e1[0])
    l1_2 = r3(e1[0]) * n1y - r3(e1[1]) * n1x
    s = fx2_0 * l1_0 + fx2_1 * l1_1 + fx2_2 * l1_2  # (3roots, n, B)
    sign_ok_t = jnp.all(s > 0, axis=1) | jnp.all(s < 0, axis=1)

    # Normalize by the last element (fundamentalmatrix.rs:374); fk[8]
    # is bitwise f[..., 2, 2].
    denom_t = fk[8]
    denom_ok_t = jnp.abs(denom_t) > 1e-12
    den_safe = jnp.where(denom_ok_t, denom_t, 1.0)
    fin_t = jnp.ones_like(denom_ok_t)
    for k in range(9):
        fin_t &= jnp.isfinite(fk[k] / den_safe)

    denom = f[..., 2, 2]
    denom_ok = jnp.abs(denom) > 1e-12
    f = f / jnp.where(denom_ok, denom, 1.0)[..., None, None]

    valid = (
        lam_ok
        & jnp.isfinite(lam)
        & (rank_ok_t & sign_ok_t & denom_ok_t & fin_t).T
    )
    return f, valid


# ---------------------------------------------------------------------------
# Batched RANSAC sweep


# True while tracing the vmapped multi-pair driver (ransac_batch_pairs):
# jax.vmap of a pallas_call adds a grid dimension, and the axon remote
# TPU compiler rejects gridded pallas_call (ops.pallas_ncc docstring) —
# the vmapped driver must keep the XLA forms.
_IN_VMAP_DRIVER = False


def _use_pallas_score() -> bool:
    """Pallas scoring/gather kernels run only on real TPU and outside
    the vmapped pair driver (the CPU backend keeps the chunked XLA
    forms — same convention as ops.correlation's CVTPU_NO_PALLAS
    gate)."""
    import os

    if _IN_VMAP_DRIVER or os.environ.get("CVTPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def pack_coord_table(table: np.ndarray) -> np.ndarray | None:
    """(M, 4) match table -> (2, M) int32 with (x, y) packed 16/16 per
    image, or None when the coordinates are not exactly representable
    (non-integral or >= 2^15 — keypoint pixel coordinates always are).
    Feeds _ransac_batch_core's half-element sampling gather."""
    if table.size == 0:
        return None
    if not np.all((table >= 0) & (table < 32768)):
        return None
    if not np.all(table == np.floor(table)):
        return None
    xi = table.astype(np.int64)
    packed = np.stack(
        [xi[:, 0] * 65536 + xi[:, 1], xi[:, 2] * 65536 + xi[:, 3]]
    )
    return packed.astype(np.int32)


def _lex_topk_iter(count, err, k: int):
    """Top-k indices by (count desc, err asc, index asc) — the head of
    _lex_topk_indices's order — via k argmax passes (O(kN) reductions
    instead of an N-lane three-key sort). Non-finite errors rank last
    within their count class, like the sort (NaN/inf sort after all
    finite keys in lax.sort)."""
    c = count.astype(jnp.int32)
    picks = []
    for _ in range(k):
        cmax = jnp.max(c)
        em = jnp.where((c == cmax) & jnp.isfinite(err), err, jnp.inf)
        emin = jnp.min(em)
        hit = (c == cmax) & ((em == emin) | (emin == jnp.inf))
        i = jnp.argmax(hit).astype(jnp.int32)
        picks.append(i)
        c = c.at[i].set(-1)
    return jnp.stack(picks)


def _ransac_batch_core(
    key,
    p1,
    p2,
    m_valid,
    top_limit,
    threshold,
    min_inlier_distance,
    min_count,
    n_samples: int,
    batch: int,
    projection_affine: bool,
    rank_eps: float,
    t1=None,
    t2=None,
    top_k: int = 1,
    packed_t=None,
):
    """One device batch of RANSAC hypotheses.

    p1, p2: (M, 2) f32 matches (pixel units), m_valid: (M,) mask.
    top_limit: sample indices uniformly from [0, top_limit) — the
    best-distance prefix, like fundamentalmatrix.rs:159-162.
    t1, t2: optional (3,3) Hartley transforms used for the perspective
    solve; scoring is always in pixel space.
    packed_t: optional (2, M) int32 16/16-packed coordinate table (see
    pack_coord_table) — halves the sampling gather's element count with
    bitwise-identical results for integral match tables.

    Returns the batch's top_k hypotheses, score-descending:
    (f (K, 3, 3), count (K,), mean_error (K,)). K > 1 feeds the top-K LM
    refinement pass that restores the reference's refine-before-counting
    fidelity (fundamentalmatrix.rs:201-205) without a serial LM inside
    the device sweep.
    """
    # Minimum-separation sampling (fundamentalmatrix.rs:155-175): any
    # coordinate axis closer than min_inlier_distance between two sampled
    # matches disqualifies the pair. Like the reference, conflicting
    # points are REDRAWN (slot-wise, against earlier slots) — one-shot
    # tuple rejection passes ~1e-4 of 7-point samples on small images.
    # All 13 rounds' draws and their coordinate gathers are HOISTED out
    # of the loop into ONE randint and one row gather: the in-loop
    # random-access gathers were the single largest device cost of a 50k
    # batch (~26 ms of 66 ms), and the 13 separate per-round threefry
    # kernels another 6 ms (one fused (13, n, B) draw is ~1.5 ms — the
    # bits differ from 13 split draws, which only permutes which uniform
    # sample each slot sees).
    # The whole phase runs LANE-MAJOR: indices draw as (13, n, B), the
    # coordinate gather reads a transposed table so its output is BORN
    # with the hypothesis axis on the VPU's 128-lane minor dimension,
    # and the redraw loop's conflict tensors (4, n, n, B) keep it there.
    # The natural (B, n, n, 4) forms put 7- and 4-wide axes minor — ~3%
    # tile utilization — and a post-gather transpose of the candidate
    # array costs more than the loop; gathering INTO the lane-major
    # layout avoids both (measured: the 12-round loop drops
    # 8.6 -> 1.9 ms per 50k batch). Only the final selected coordinates
    # (5.6 MB) transpose back for the solver.
    #
    # When the match table is integral (pixel keypoint coordinates —
    # always true in the pipeline), callers pass packed_t: a (2, M)
    # int32 table with (x, y) packed 16/16 per image. The gather then
    # moves HALF the elements (9.1M vs 18.2M — the gather is
    # element-rate-bound, not byte-bound) and each round unpacks only
    # its live (2, n, B) slice, so the unpacked (4, 13, n, B) candidate
    # array never materializes. Unpacking reproduces the exact f32
    # coordinate values (ints < 2^15), so the sampled points — and the
    # round's winner — are BITWISE identical to the float-table path
    # (tests/test_epipolar.py::test_packed_table_matches_float).
    # dtype pinned: the package enables jax_enable_x64 (host f64 LM/BA),
    # under which randint defaults to int64 — 64-bit draws AND a 64-bit
    # index gather, both emulated on TPU (measured: the draw alone at
    # 8.0 ms/round vs 1.5 ms in int32).
    all_idx = jax.random.randint(
        key, (13, n_samples, batch), 0, top_limit, dtype=jnp.int32
    )  # (13, n, B)
    tril = jnp.tril(jnp.ones((n_samples, n_samples), bool), k=-1)

    if packed_t is None:
        p_all_t = jnp.concatenate([p1, p2], axis=1).T  # (4, M)
        all_coords = jnp.take(p_all_t, all_idx, axis=1)  # (4, 13, n, B)

        def round_coords(i):
            return all_coords[:, i]

    else:
        if _use_pallas_score() and packed_t.shape[1] <= 8192:
            # VMEM-resident segmented gather: XLA's gather is index-
            # rate-bound (~0.42 G idx/s -> ~10 ms/round); this is ~1 ms
            # for the SFM buckets (ops.pallas_gather docstring).
            from cybervision_tpu.ops.pallas_gather import gather_packed

            all_packed = gather_packed(packed_t, all_idx)
        else:
            all_packed = jnp.take(packed_t, all_idx, axis=1)  # (2,13,n,B)

        def round_coords(i):
            pk = all_packed[:, i]  # (2, n, B) int32
            hi = jnp.right_shift(pk, 16).astype(jnp.float32)
            lo = jnp.bitwise_and(pk, 0xFFFF).astype(jnp.float32)
            return jnp.stack([hi[0], lo[0], hi[1], lo[1]])  # (4, n, B)

    def redraw(i, coords):
        # coords: (4, n, B)
        diff = jnp.abs(coords[:, :, None, :] - coords[:, None, :, :])
        close = jnp.any(diff < min_inlier_distance, axis=0)  # (n, n, B)
        conflict = jnp.any(
            close & tril[:, :, None], axis=1
        )  # (n, B): later slot redraws against earlier slots
        return jnp.where(conflict[None], round_coords(i + 1), coords)

    coords = jax.lax.fori_loop(0, 12, redraw, round_coords(0))
    diff = jnp.abs(coords[:, :, None, :] - coords[:, None, :, :])
    close = jnp.any(diff < min_inlier_distance, axis=0)
    iu = jnp.triu_indices(n_samples, k=1)
    sample_ok = ~jnp.any(close[iu[0], iu[1]], axis=0)  # (B,)
    s1 = jnp.transpose(coords[0:2], (2, 1, 0))  # (B, n, 2)
    s2 = jnp.transpose(coords[2:4], (2, 1, 0))

    if projection_affine:
        f, valid = solve_affine_batch(s1, s2, rank_eps)  # (B,3,3), (B,)
        f = f[:, None]  # one candidate per sample
        valid = valid[:, None]
    else:
        n1 = jnp.einsum("ij,bnj->bni", t1[:2, :2], s1) + t1[:2, 2]
        n2 = jnp.einsum("ij,bnj->bni", t2[:2, :2], s2) + t2[:2, 2]
        f, valid = solve_perspective_batch(n1, n2, rank_eps)
        # Denormalize to pixel space: F_px = T2^T F' T1.
        f = jnp.einsum("ji,brjk,kl->bril", t2, f, t1)
        denom = f[..., 2, 2]
        dok = jnp.abs(denom) > 1e-20
        f = f / jnp.where(dok, denom, 1.0)[..., None, None]
        valid &= dok

    valid &= sample_ok[:, None]

    nc = f.shape[1]
    ff = f.reshape(-1, 3, 3)  # (B*nc, 3, 3)
    vv = valid.reshape(-1)

    # The sampled points themselves must fit
    # (fundamentalmatrix.rs:206-209). Evaluated DIRECTLY on the sampled
    # coordinates (same f32 inputs and elementwise formula as the match
    # table — bitwise-identical to the former gather from the scoring
    # tile, which forced the (B*nc, M) error matrix to materialize).
    own = jax.vmap(sampson_error)(f, s1, s2)  # (B, nc, n)
    own_ok = jnp.all(
        jnp.isfinite(own) & (own <= threshold), axis=2
    ).reshape(-1)

    total = ff.shape[0]
    if _use_pallas_score():
        # VMEM-resident Pallas scoring: the 5 per-(candidate, match)
        # linear forms ride the MXU and nothing (chunk, M)-sized ever
        # touches HBM — 17.5 ms -> ~3 ms per 50k round (ops.pallas_score
        # docstring has the roofline).
        from cybervision_tpu.ops.pallas_score import score_candidates

        count, err_sum = score_candidates(ff, p1, p2, m_valid, threshold)
    else:
        # Chunked XLA scoring (CPU backend / CVTPU_NO_PALLAS): only a
        # (chunk, M) error tile is ever live, with running
        # (count, error-sum) reductions — the TPU analog of the
        # reference's corridor segmentation discipline (gpu/mod.rs:31-35).
        # Chunk choice is pure performance (per-candidate reductions are
        # chunking-invariant): 8192 cuts the lax.map's sequential step
        # count 4x — the per-step dispatch overhead, not the arithmetic,
        # dominated the scoring stage at 2048.
        chunk = 8192
        pad = (-total) % chunk
        ff_p = jnp.pad(ff, ((0, pad), (0, 0), (0, 0)))

        def score_chunk(f_c):
            err = sampson_error(f_c, p1, p2)  # (chunk, M)
            fits = jnp.isfinite(err) & (err <= threshold) & m_valid[None, :]
            count = jnp.sum(fits, axis=1)
            err_sum = jnp.sum(jnp.where(fits, err, 0.0), axis=1)
            return count, err_sum

        n_chunks = (total + pad) // chunk
        count, err_sum = jax.lax.map(
            score_chunk, ff_p.reshape(n_chunks, chunk, 3, 3)
        )
        count = count.reshape(-1)[:total]
        err_sum = err_sum.reshape(-1)[:total]

    good = vv & own_ok & (count >= min_count)
    count = jnp.where(good, count, 0)
    mean_err = err_sum / jnp.maximum(count, 1)

    # Order: most matches, then lowest mean inlier error
    # (fundamentalmatrix.rs:623-649) — an exact lexicographic two-key
    # selection. A single combined float score (count - err/threshold)
    # loses the error tiebreak to rounding: at count ~5000 an f32
    # fraction has only ~2^-11 of resolution, so near-equal errors
    # collapse and top_k can drop the lower-error hypothesis at the K
    # boundary. K argmax passes instead of a full sort: the 150k-lane
    # three-key sort cost 3.9 ms of a 41 ms round; this is < 0.5 ms and
    # selects the same indices in the same order.
    top_i = _lex_topk_iter(count, mean_err, min(top_k, total))
    return ff[top_i], count[top_i], mean_err[top_i]


ransac_batch = functools.partial(
    jax.jit,
    static_argnames=(
        "n_samples", "batch", "projection_affine", "rank_eps", "top_k"
    ),
)(_ransac_batch_core)


def _ransac_rounds_core(
    round_keys,
    p1,
    p2,
    m_valid,
    top_limit,
    threshold,
    min_inlier_distance,
    min_count,
    n_samples: int,
    batch: int,
    projection_affine: bool,
    rank_eps: float,
    t1=None,
    t2=None,
    top_k: int = 1,
    packed_t=None,
):
    """EVERY early-exit round fused into one program via lax.scan with a
    running top-K carry — one dispatch and one fetch for the whole
    (typically 1M-iteration) budget.

    Only valid when the early exit PROVABLY cannot fire: the reference
    checks `best > d_early` between 50k-batches (fundamentalmatrix.rs:
    112-142), and best <= match count, so a pair with m <= d_early can
    never exit — every batch runs regardless, and fusing them changes
    nothing but the dispatch count. (Perspective's d_early is 50 000
    inliers, far above any real match table; affine CAN exit early and
    keeps the round-by-round driver.)

    round_keys: (n_rounds,) key array — the same per-round subkeys the
    host loop would split. The running merge is the absorb loop's
    (count desc, err asc, round order) selection, so the final pool is
    identical to absorbing round by round
    (tests/test_epipolar.py::test_fused_rounds_match_round_by_round).
    Returns the packed (top_k, 11) candidates (count 0 = empty slot).
    """
    init = (
        jnp.zeros((top_k, 3, 3), jnp.float32),
        jnp.zeros((top_k,), jnp.int32),
        jnp.full((top_k,), jnp.inf, jnp.float32),
    )

    def body(carry, rk):
        fs, cs, es = carry
        f, c, e = _ransac_batch_core(
            rk, p1, p2, m_valid, top_limit, threshold,
            min_inlier_distance, min_count,
            n_samples=n_samples, batch=batch,
            projection_affine=projection_affine, rank_eps=rank_eps,
            t1=t1, t2=t2, top_k=top_k, packed_t=packed_t,
        )
        fs2 = jnp.concatenate([fs, f.astype(jnp.float32)])
        cs2 = jnp.concatenate([cs, c.astype(jnp.int32)])
        es2 = jnp.concatenate([es, e.astype(jnp.float32)])
        # Pool entries come first in the concat, so the index tiebreak
        # keeps the earlier round on equal (count, err) — the host
        # absorb loop's stable-sort order.
        i = _lex_topk_indices(cs2, es2)[:top_k]
        return (fs2[i], cs2[i], es2[i]), None

    (fs, cs, es), _ = jax.lax.scan(body, init, round_keys)
    return _pack_candidates_core(fs, cs, es)


ransac_rounds_packed = functools.partial(
    jax.jit,
    static_argnames=(
        "n_samples", "batch", "projection_affine", "rank_eps", "top_k"
    ),
)(_ransac_rounds_core)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_samples", "batch", "projection_affine", "rank_eps", "top_k"
    ),
)
def ransac_batch_pairs(
    key,
    p1,
    p2,
    m_valid,
    top_limit,
    threshold,
    min_inlier_distance,
    min_count,
    n_samples: int,
    batch: int,
    projection_affine: bool,
    rank_eps: float,
    t1=None,
    t2=None,
    top_k: int = 1,
    packed_t=None,
):
    """ransac_batch vmapped over a leading image-pair axis.

    The all-pairs sparse phase (reconstruction.rs:261-277) runs each
    pair's hypothesis search independently; pairs are fully independent,
    so one device program sweeps one 50k-hypothesis batch for EVERY
    active pair at once — P x 50k hypotheses per dispatch instead of the
    sequential driver's 50k (VERDICT r3 weak #1: ~2 s/pair x pairs is
    the wrong scaling law for a batch machine).

    Per-pair winner parity with ransac_batch is exact by construction:
    the PRNG key is shared (in_axes=None) and jax.random draws are a
    deterministic function of (key, shape, maxval), so each lane sees
    the same sample indices the sequential driver would draw for that
    pair (tests/test_epipolar.py pins this).

    p1, p2: (P, M, 2); m_valid: (P, M); top_limit, threshold: (P,);
    t1, t2: (P, 3, 3) or None (affine). Returns the per-pair top-K
    candidates PACKED (P, K, 11) — one fused program, one fetch.
    """
    kwargs = dict(
        n_samples=n_samples,
        batch=batch,
        projection_affine=projection_affine,
        rank_eps=rank_eps,
        top_k=top_k,
    )
    global _IN_VMAP_DRIVER
    _IN_VMAP_DRIVER = True
    try:
        return _ransac_batch_pairs_body(
            key, p1, p2, m_valid, top_limit, threshold,
            min_inlier_distance, min_count, kwargs, packed_t,
            projection_affine, t1, t2,
        )
    finally:
        _IN_VMAP_DRIVER = False


def _ransac_batch_pairs_body(
    key, p1, p2, m_valid, top_limit, threshold, min_inlier_distance,
    min_count, kwargs, packed_t, projection_affine, t1, t2,
):
    pk_axis = None if packed_t is None else 0
    if projection_affine:
        return jax.vmap(
            lambda p1_, p2_, mv_, tl_, t_, pk_: _pack_candidates_core(
                *_ransac_batch_core(
                    key, p1_, p2_, mv_, tl_, t_, min_inlier_distance,
                    min_count, packed_t=pk_, **kwargs
                )
            ),
            in_axes=(0, 0, 0, 0, 0, pk_axis),
        )(p1, p2, m_valid, top_limit, threshold, packed_t)
    return jax.vmap(
        lambda p1_, p2_, mv_, tl_, t_, t1_, t2_, pk_: _pack_candidates_core(
            *_ransac_batch_core(
                key, p1_, p2_, mv_, tl_, t_, min_inlier_distance,
                min_count, t1=t1_, t2=t2_, packed_t=pk_, **kwargs
            )
        ),
        in_axes=(0, 0, 0, 0, 0, 0, 0, pk_axis),
    )(p1, p2, m_valid, top_limit, threshold, t1, t2, packed_t)


# ---------------------------------------------------------------------------
# Multi-chip hypothesis sharding


def ransac_batch_sharded(
    mesh,
    key,
    p1,
    p2,
    m_valid,
    top_limit,
    threshold,
    min_inlier_distance,
    min_count,
    *,
    n_samples: int,
    batch: int,
    projection_affine: bool,
    rank_eps: float,
    t1=None,
    t2=None,
    top_k: int = 1,
    packed_t=None,
):
    """ransac_batch with the hypothesis batch sharded over the mesh.

    Data-parallel RANSAC (SURVEY.md §2: "RANSAC hypothesis batches —
    embarrassingly parallel"): each device runs an independent
    batch/n_dev slice with its own PRNG fold, then a tiny cross-device
    reduce merges the per-device top-K by the reference's
    (count, -mean error) ordering (fundamentalmatrix.rs:623-649). Same
    signature and return contract as ransac_batch.
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    per = max(1, batch // n_dev)
    keys = jax.random.split(key, n_dev)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    def run(keys_shard):
        f, c, e = ransac_batch(
            keys_shard[0],
            p1,
            p2,
            m_valid,
            top_limit,
            threshold,
            min_inlier_distance,
            min_count,
            n_samples=n_samples,
            batch=per,
            projection_affine=projection_affine,
            rank_eps=rank_eps,
            t1=t1,
            t2=t2,
            top_k=top_k,
            packed_t=packed_t,
        )
        return f[None], c[None], e[None]

    fs, cs, es = run(keys)  # (n_dev, K, ...)
    return _merge_topk(
        fs.reshape(-1, 3, 3), cs.reshape(-1), es.reshape(-1), threshold, top_k
    )


def _pack_candidates_core(f_b, count_b, err_b):
    """(K, 11) f32: flattened F (9) + count + err — a single-fetch
    payload (counts are < 2^24, exact in f32)."""
    k = f_b.shape[0]
    return jnp.concatenate(
        [
            f_b.reshape(k, 9).astype(jnp.float32),
            count_b.reshape(k, 1).astype(jnp.float32),
            err_b.reshape(k, 1).astype(jnp.float32),
        ],
        axis=1,
    )


_pack_candidates = jax.jit(_pack_candidates_core)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_samples", "batch", "projection_affine", "rank_eps", "top_k"
    ),
)
def ransac_batch_packed(
    key,
    p1,
    p2,
    m_valid,
    top_limit,
    threshold,
    min_inlier_distance,
    min_count,
    n_samples: int,
    batch: int,
    projection_affine: bool,
    rank_eps: float,
    t1=None,
    t2=None,
    top_k: int = 1,
    packed_t=None,
):
    """ransac_batch with the (K, 11) candidate packing fused into the
    same program — one dispatch per early-exit round instead of two."""
    f, c, e = _ransac_batch_core(
        key, p1, p2, m_valid, top_limit, threshold, min_inlier_distance,
        min_count, n_samples=n_samples, batch=batch,
        projection_affine=projection_affine, rank_eps=rank_eps,
        t1=t1, t2=t2, top_k=top_k, packed_t=packed_t,
    )
    return _pack_candidates_core(f, c, e)


def _lex_topk_indices(count, err):
    """Indices sorted by (count descending, error ascending) — the
    reference's Ord (fundamentalmatrix.rs:623-649) — via an exact
    two-key lexicographic sort (no combined float score, no f64)."""
    idx = jnp.arange(count.shape[0], dtype=jnp.int32)
    _, _, order = jax.lax.sort(
        (-count.astype(jnp.int32), err.astype(jnp.float32), idx), num_keys=2
    )
    return order


@functools.partial(jax.jit, static_argnames=("top_k",))
def _merge_topk(fs, cs, es, threshold, top_k: int):
    """Cross-device top-K merge by the same score rule as ransac_batch."""
    i = _lex_topk_indices(cs, es)
    i = i[: min(top_k, i.shape[0])]
    return fs[i], cs[i], es[i]


# ---------------------------------------------------------------------------
# LM refinement (f64, CPU backend)


def _f_from_params7(p):
    """det(F)=0 parametrization with F[2,2]=1 (fundamentalmatrix.rs:442-449)."""
    x = -(-p[0] * p[4] + p[6] * p[2] * p[4] + p[3] * p[1] - p[6] * p[1] * p[5]) / (
        -p[3] * p[2] + p[0] * p[5]
    )
    return jnp.array(
        [[p[0], p[1], p[2]], [p[3], p[4], p[5]], [p[6], x, 1.0]], p.dtype
    )


@jax.jit
def _lm_residuals(params, q1, q2, mask):
    """Masked Sampson residuals — padded rows (real duplicated points,
    mask 0) contribute exactly 0 to r, J, and every norm."""
    return jnp.where(mask, sampson_error(_f_from_params7(params), q1, q2), 0.0)


def _lm_res_b(params, q1, q2, masks):
    """(K, nb) residuals for K parameter lanes with PER-LANE match
    tables (q1, q2: (K, nb, 2)) and masks — lanes from different image
    pairs batch into one program."""
    return jax.vmap(_lm_residuals, in_axes=(0, 0, 0, 0))(
        params, q1, q2, masks
    )


def _lm_jac_b(params, q1, q2, masks):
    """(K, nb, 7) jacobians via jacfwd per lane (instead of the
    reference's hand-derived symbolic formula)."""
    return jax.vmap(
        lambda p, q1_, q2_, mk: jax.jacfwd(_lm_residuals)(p, q1_, q2_, mk),
        in_axes=(0, 0, 0, 0),
    )(params, q1, q2, masks)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def _lm_refine_batch_jit(params0, q1, q2, masks, valid, max_iters: int):
    """All top-K LM refinements as ONE compiled while_loop with per-lane
    damping state — each of the reference's serial LM runs
    (fundamentalmatrix.rs:391-426,515-621) becomes a vector lane, so the
    wall-clock is the max (not the sum) of the lanes' iteration counts
    and the per-iteration Python/dispatch overhead of the former
    one-jit-call-per-step host loop disappears.

    Per-lane logic is the LM DESCENT loop: delta = (J'J + mu I)^-1 J'r,
    params - delta (documented deviation: the reference applies
    params + delta, fundamentalmatrix.rs:583 — an ascent step, so its
    refinement returns the input F essentially unchanged; this
    implementation minimizes for real). Lanes terminate found on the
    gradient / step-size / residual-norm criteria; a singular solve
    (non-finite delta) marks the lane failed — callers fall back to the
    unrefined hypothesis, the reference's Err contract. The jacobian is
    recomputed only on iterations where some lane accepted a step
    (rejected lanes' params are unchanged, so the recompute is a no-op
    for them).
    """
    eye7 = jnp.eye(7, dtype=params0.dtype)

    r0 = _lm_res_b(params0, q1, q2, masks)
    j0 = _lm_jac_b(params0, q1, q2, masks)
    g0 = jnp.einsum("kni,kn->ki", j0, r0)
    mu0 = 1e-3 * jnp.einsum("kni,kni->ki", j0, j0).max(axis=1)
    found0 = valid & (jnp.abs(g0).max(axis=1) <= 1e-12)
    done0 = found0 | ~valid
    nu0 = jnp.full(params0.shape[:1], 2.0, params0.dtype)

    def cond(state):
        it, done = state[0], state[7]
        return (it < max_iters) & ~done.all()

    def body(state):
        it, params, r, j, g, mu, nu, done, found = state
        jtj = jnp.einsum("kni,knj->kij", j, j) + mu[:, None, None] * eye7
        delta = jnp.linalg.solve(jtj, g[..., None])[..., 0]
        bad = ~done & ~jnp.isfinite(delta).all(axis=1)
        dn = jnp.linalg.norm(delta, axis=1)
        pn = jnp.linalg.norm(params, axis=1)
        conv_small = ~done & ~bad & (dn <= 1e-12 * (pn + 1e-12))
        new_params = params - delta
        new_r = _lm_res_b(new_params, q1, q2, masks)
        rr = (r * r).sum(axis=1)
        nn = (new_r * new_r).sum(axis=1)
        rho_den = (delta * (mu[:, None] * delta + g)).sum(axis=1)
        rho = jnp.where(rho_den != 0.0, (rr - nn) / rho_den, -1.0)
        live = ~done & ~bad & ~conv_small
        accept = live & (rho > 0.0)
        # Relative residual-reduction convergence on accepted steps. The
        # reference's RESIDUAL_REDUCTION_EPSILON is 0.0
        # (fundamentalmatrix.rs:538,592-594): `sqrt(rr) - sqrt(nn) < 0`
        # never fires for a true descent step, so converged lanes keep
        # burning budget on sub-noise-floor steps until the 1e-12
        # gradient/step epsilons (measured: ~150 while-loop iterations and
        # ~0.7 s/pair of wall-clock in the batched loop). 1e-4 cuts that
        # 4x; it is safe HERE because the refined F only feeds the
        # discrete (inlier count, mean error) hypothesis selection —
        # measured inlier sets are identical and the mean inlier Sampson
        # error moves < 0.02% relative vs eps = 1e-9 (bench SFM scene).
        # The final-geometry LM (bundle adjustment) keeps a 1e-9 epsilon:
        # ops.ba.RESIDUAL_REDUCTION_EPSILON.
        red_conv = accept & (
            jnp.sqrt(rr) - jnp.sqrt(nn) < 1e-4 * jnp.sqrt(rr)
        )
        params2 = jnp.where(accept[:, None], new_params, params)
        r2 = jnp.where(accept[:, None], new_r, r)
        j2 = jax.lax.cond(
            accept.any(),
            lambda: _lm_jac_b(params2, q1, q2, masks),
            lambda: j,
        )
        g2 = jnp.einsum("kni,kn->ki", j2, r2)
        grad_conv = accept & (jnp.abs(g2).max(axis=1) <= 1e-12)
        res_conv = live & (jnp.sqrt(jnp.where(accept, nn, rr)) <= 1e-12)
        mu2 = jnp.where(
            accept,
            mu * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            jnp.where(live, mu * nu, mu),
        )
        nu2 = jnp.where(accept, 2.0, jnp.where(live, nu * 2.0, nu))
        newly_found = conv_small | grad_conv | res_conv | red_conv
        done2 = done | bad | newly_found
        found2 = found | newly_found
        return (it + 1, params2, r2, j2, g2, mu2, nu2, done2, found2)

    state = (0, params0, r0, j0, g0, mu0, nu0, done0, found0)
    state = jax.lax.while_loop(cond, body, state)
    return state[1], state[8]


def _lm_refine_lanes(
    lanes: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
    k_lanes: int,
    max_iters: int = 1000,
) -> list[np.ndarray | None]:
    """Dispatch wrapper: in the axon TPU process, XLA:CPU runs ~15x
    degraded (utils.cpu_worker docstring), so the refinement executes in
    the clean-CPU worker subprocess — same code, bit-identical results;
    inline everywhere else (tests, --mode=cpu) or if the worker fails."""
    from cybervision_tpu.utils import cpu_worker

    if cpu_worker.needs_clean_cpu():
        try:
            return cpu_worker.call(
                "cybervision_tpu.ops.epipolar._lm_refine_lanes_impl",
                lanes, k_lanes, max_iters,
            )
        except cpu_worker.WorkerUnavailable:
            pass
    return _lm_refine_lanes_impl(lanes, k_lanes, max_iters)


def _lm_refine_lanes_impl(
    lanes: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
    k_lanes: int,
    max_iters: int = 1000,
) -> list[np.ndarray | None]:
    """Refine hypothesis lanes — each (f0, fits, pts1, pts2), possibly
    from DIFFERENT image pairs — in one batched program. Runs in f64 on
    the CPU backend (TPUs have no native f64). Every lane carries its
    own match table padded to a shared pow2 bucket plus its inlier mask
    (padding repeats row 0 with mask 0, so no degenerate math and zero
    contribution); the lane axis pads to the static k_lanes with
    valid=False — one compile per (bucket, k_lanes), persistently
    cached. Returns the refined F (or None where LM failed / diverged /
    lost rank) per input lane."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        nb = max(pow2_bucket(len(p1), floor=256) for _, _, p1, _ in lanes)
        q1 = np.zeros((k_lanes, nb, 2), np.float64)
        q2 = np.zeros((k_lanes, nb, 2), np.float64)
        params = np.zeros((k_lanes, 7), np.float64)
        masks = np.zeros((k_lanes, nb), bool)
        valid = np.zeros(k_lanes, bool)
        for i, (f0, fits, pts1, pts2) in enumerate(lanes):
            m = len(pts1)
            q1[i, :m] = pts1
            q1[i, m:] = pts1[0]
            q2[i, :m] = pts2
            q2[i, m:] = pts2[0]
            params[i] = (
                f0[0, 0], f0[0, 1], f0[0, 2],
                f0[1, 0], f0[1, 1], f0[1, 2], f0[2, 0],
            )
            masks[i, :m] = fits
            valid[i] = True
        params_out_d, found_d = _lm_refine_batch_jit(
            jnp.asarray(params, jnp.float64),
            jnp.asarray(q1, jnp.float64),
            jnp.asarray(q2, jnp.float64),
            jnp.asarray(masks),
            jnp.asarray(valid),
            max_iters,
        )
        params_out = np.asarray(params_out_d)
        found = np.asarray(found_d)

    out: list[np.ndarray | None] = []
    for i in range(len(lanes)):
        if not found[i]:
            out.append(None)
            continue
        f = np.asarray(
            _f_from_params7(jnp.asarray(params_out[i])), dtype=np.float64
        )
        # Post-refinement rank sanity (fundamentalmatrix.rs:418-424).
        sv = np.linalg.svd(f.T, compute_uv=False)
        out.append(None if (sv[1] < 1e-3 or sv[2] > 1e-3) else f)
    return out


def _lm_refine_topk(
    f0s: list[np.ndarray],
    fits_list: list[np.ndarray],
    pts1: np.ndarray,
    pts2: np.ndarray,
    k_lanes: int,
    max_iters: int = 1000,
) -> list[np.ndarray | None]:
    """One pair's pooled hypotheses as lanes of _lm_refine_lanes."""
    return _lm_refine_lanes(
        [(f0, fits, pts1, pts2) for f0, fits in zip(f0s, fits_list)],
        k_lanes, max_iters,
    )


# ---------------------------------------------------------------------------
# Host orchestration

# Test hook: force the round-by-round dispatch loop even when the fused
# all-rounds program applies (parity tests compare the two).
_FORCE_ROUND_LOOP = False


@dataclasses.dataclass
class FundamentalMatrixResult:
    f: np.ndarray  # (3, 3) float64
    inliers: np.ndarray  # (K, 4) int64 rows (x1, y1, x2, y2)
    matches_count: int


def _sampson_np(f: np.ndarray, p1: np.ndarray, p2: np.ndarray) -> np.ndarray:
    """sampson_error in plain f64 numpy — the match pools are small
    (<= ~10k rows), so a host evaluation beats a device round trip on
    the TPU tunnel (~30 ms/fetch)."""
    ones = np.ones((p1.shape[0], 1), np.float64)
    h1 = np.concatenate([p1, ones], axis=1)
    h2 = np.concatenate([p2, ones], axis=1)
    f_p1 = h1 @ f.T
    ft_p2 = h2 @ f
    num = np.einsum("mi,mi->m", f_p1, h2) ** 2
    den = f_p1[:, 0] ** 2 + f_p1[:, 1] ** 2 + ft_p2[:, 0] ** 2 + ft_p2[:, 1] ** 2
    return num / den


def _score_inliers(f, p1, p2, threshold):
    err = _sampson_np(np.asarray(f, np.float64), p1, p2)
    return np.isfinite(err) & (err <= threshold)


def find_fundamental_matrix(
    matches: np.ndarray,
    projection: ProjectionMode,
    max_dimension: float,
    cfg: RansacConfig = RansacConfig(),
    progress=None,
) -> FundamentalMatrixResult:
    """Full RANSAC driver (fundamentalmatrix.rs:103-147).

    matches: (M, 4) rows (x1, y1, x2, y2), sorted by ascending descriptor
    distance (matching.match_keypoints does this) so the top_inliers
    prefix is the best-distance pool.
    """
    ransac_k, n, t, d, d_early = cfg.params(projection)
    if projection == ProjectionMode.PERSPECTIVE:
        t = t * max_dimension
    m = len(matches)
    if m < d + n:
        raise RansacError("Not enough matches")

    # The match count is data-dependent; pad to a bucket with a validity
    # mask so the sweep program comes out of the compile cache for any
    # input (m_valid gates scoring; sampling draws from the
    # [0, top_limit) prefix, which is always real rows since matches are
    # sorted and the padding is appended). Buckets step 4x from 2048 —
    # scoring padded zeros is vectorized noise, while each extra bucket
    # is a fresh multi-program RANSAC compile (~1-3 min over the TPU
    # tunnel), so scenes whose match counts wobble pair to pair must
    # land on ONE bucket.
    mb = pow2_bucket(m, floor=2048, factor=4)
    mpad = np.zeros((mb, 4), matches.dtype)
    mpad[:m] = matches
    p1 = jnp.asarray(mpad[:, 0:2], jnp.float32)
    p2 = jnp.asarray(mpad[:, 2:4], jnp.float32)
    m_valid = jnp.asarray(np.arange(mb) < m)
    top_limit = min(m, cfg.top_inliers)
    packed_np = pack_coord_table(mpad)
    packed = None if packed_np is None else jnp.asarray(packed_np)

    t1 = t2 = None
    if projection == ProjectionMode.PERSPECTIVE:
        # Normalization statistics over the real rows only (the padded
        # zeros would drag the centroid).
        t1 = jnp.asarray(_hartley_np(matches[:, 0:2]), jnp.float32)
        t2 = jnp.asarray(_hartley_np(matches[:, 2:4]), jnp.float32)

    from cybervision_tpu.parallel import pipeline_mesh

    mesh = pipeline_mesh()
    if mesh is None:
        def sweep(*args, **kw):  # fused pack: one dispatch per round
            return ransac_batch_packed(*args, **kw)
    else:
        def sweep(*args, **kw):
            return _pack_candidates(
                *ransac_batch_sharded(mesh, *args, **kw)
            )

    # Perspective keeps a top-K candidate pool for post-sweep LM
    # refinement (config.RansacConfig.top_k_refine — the documented
    # replacement for the reference's LM inside every RANSAC validation,
    # fundamentalmatrix.rs:201-205); affine has no in-loop LM to restore.
    want_k = (
        cfg.top_k_refine if projection == ProjectionMode.PERSPECTIVE else 1
    )

    key = jax.random.PRNGKey(cfg.seed)
    batch = cfg.check_interval
    pool: list[tuple[np.ndarray, int, float]] = []  # (f, count, err)
    n_batches = max(1, ransac_k // batch)

    def absorb(packed_b: np.ndarray) -> int:
        """Fold one fetched batch into the top-K pool; returns best count."""
        fs = packed_b[:, 0:9].astype(np.float64).reshape(-1, 3, 3)
        counts = packed_b[:, 9].astype(np.int64)
        errs = packed_b[:, 10].astype(np.float64)
        for j in range(len(counts)):
            if counts[j] > 0:
                pool.append((fs[j], int(counts[j]), float(errs[j])))
        pool.sort(key=lambda e: (-e[1], e[2]))
        del pool[want_k:]
        return pool[0][1] if pool else 0

    # When the early exit PROVABLY cannot fire (best count <= m <=
    # d_early), all rounds fuse into ONE program with a running top-K
    # scan carry (ransac_rounds_packed): per-round dispatch/fetch
    # overhead — which dominates a 50k batch on the TPU tunnel —
    # disappears, and the pool is identical to absorbing round by round.
    if (
        mesh is None
        and not _FORCE_ROUND_LOOP
        and n_batches > 1
        and m <= d_early
    ):
        subs = []
        for _ in range(n_batches):
            key, sub = jax.random.split(key)
            subs.append(sub)
        packed_out = ransac_rounds_packed(
            jnp.stack(subs), p1, p2, m_valid, top_limit, t,
            float(cfg.min_inlier_distance), d + n,
            n_samples=n, batch=batch,
            projection_affine=projection == ProjectionMode.AFFINE,
            rank_eps=cfg.rank_epsilon, t1=t1, t2=t2, top_k=want_k,
            packed_t=packed,
        )
        best_count = absorb(np.asarray(packed_out))
        if progress is not None:
            progress.report_status(1.0)
            if hasattr(progress, "report_matches"):
                progress.report_matches(best_count)
        if not pool:
            raise RansacError("No reliable matches found")
        return _finalize_pair(matches, pool, t, projection, cfg)

    # Batches are software-pipelined one deep: batch i+1 is DISPATCHED
    # (async device work) before batch i's packed result is fetched, so
    # the ~30 ms tunnel fetch overlaps the next sweep's device compute.
    # Early exit drops the in-flight batch unfetched — the serial form
    # never processed it either, so the pool (and the winner) is
    # identical to dispatch-then-fetch batch by batch.
    pending = None  # device (K, 11) of the previous batch
    for i in range(n_batches):
        key, sub = jax.random.split(key)
        # One fetch per batch: the sweep packs (f, count, err) into a
        # single (K, 11) device array in the same program (three
        # separate np.asarray's pay three ~30 ms tunnel round trips;
        # a separate pack program pays an extra dispatch).
        packed_dev = sweep(
            sub,
            p1,
            p2,
            m_valid,
            top_limit,
            t,
            float(cfg.min_inlier_distance),
            d + n,
            n_samples=n,
            batch=batch,
            projection_affine=projection == ProjectionMode.AFFINE,
            rank_eps=cfg.rank_epsilon,
            t1=t1,
            t2=t2,
            top_k=want_k,
            packed_t=packed,
        )
        stop = False
        if pending is not None:
            best_count = absorb(np.asarray(pending))
            if progress is not None:
                progress.report_status(i / n_batches)
                if hasattr(progress, "report_matches"):
                    progress.report_matches(best_count)
            stop = best_count > d_early
        pending = packed_dev
        if stop:
            pending = None  # drop the in-flight batch
            break
    if pending is not None:
        best_count = absorb(np.asarray(pending))
        if progress is not None:
            progress.report_status(1.0)
            if hasattr(progress, "report_matches"):
                progress.report_matches(best_count)

    if not pool:
        raise RansacError("No reliable matches found")

    return _finalize_pair(matches, pool, t, projection, cfg)


def _finalize_pair(
    matches: np.ndarray,
    pool: list[tuple[np.ndarray, int, float]],
    t: float,
    projection: ProjectionMode,
    cfg: RansacConfig,
) -> FundamentalMatrixResult:
    """Post-sweep finalization of one pair's hypothesis pool: LM-refine
    every pooled hypothesis on its own inlier set (perspective), rescore
    against all matches, and keep the overall (count, -err) winner — raw
    candidates stay in the running in case LM diverges."""
    pts1 = matches[:, 0:2].astype(np.float64)
    pts2 = matches[:, 2:4].astype(np.float64)

    refined_list: list[np.ndarray] = []
    if projection == ProjectionMode.PERSPECTIVE:
        refinable = _refinable_lanes(matches, pool, t)
        if refinable:
            refined_list = [
                r
                for r in _lm_refine_topk(
                    [f0 for f0, _ in refinable],
                    [fits0 for _, fits0 in refinable],
                    pts1, pts2,
                    k_lanes=max(cfg.top_k_refine, len(refinable)),
                )
                if r is not None
            ]
    return _pick_winner(matches, pool, refined_list, t, projection)


def _refinable_lanes(matches, pool, t):
    """(f0, inlier-mask) per pooled hypothesis with >= 7 inliers."""
    pts1 = matches[:, 0:2].astype(np.float64)
    pts2 = matches[:, 2:4].astype(np.float64)
    out = []
    for f0, _, _ in pool:
        fits0 = _score_inliers(f0, pts1, pts2, t)
        if fits0.sum() >= 7:
            out.append((f0, fits0))
    return out


def _pick_winner(
    matches, pool, refined_list, t, projection
) -> FundamentalMatrixResult:
    """Rescore refined hypotheses against all matches and keep the
    overall (count, -err) winner; raw pool candidates stay in the
    running in case LM diverged."""
    pts1 = matches[:, 0:2].astype(np.float64)
    pts2 = matches[:, 2:4].astype(np.float64)
    f = pool[0][0]
    if projection == ProjectionMode.PERSPECTIVE:
        candidates = list(pool)
        for refined in refined_list:
            err = _sampson_np(refined, pts1, pts2)
            fits_r = np.isfinite(err) & (err <= t)
            c_r = int(fits_r.sum())
            if c_r:
                candidates.append((refined, c_r, float(err[fits_r].mean())))
        candidates.sort(key=lambda e: (-e[1], e[2]))
        f = candidates[0][0]

    fits = _score_inliers(f, pts1, pts2, t)
    inliers = matches[fits]
    return FundamentalMatrixResult(
        f=f, inliers=inliers, matches_count=int(fits.sum())
    )




def _ransac_debug_logger():
    """Opt-in stderr stage logging for the fused multi-pair driver
    (CVTPU_RANSAC_DEBUG=1): returns a timestamped log callable, or None
    when disabled — keeps the dispatch loop free of inline
    instrumentation (ADVICE r4)."""
    import os
    import sys
    import time

    if not os.environ.get("CVTPU_RANSAC_DEBUG"):
        return None
    t0 = time.time()

    def log(msg: str) -> None:
        print(f"[ransac-dbg] {msg} @ {time.time()-t0:.3f}s", file=sys.stderr)

    return log


def find_fundamental_matrix_multi(
    matches_list: list[np.ndarray],
    projection: ProjectionMode,
    max_dimensions: list[float],
    cfg: RansacConfig = RansacConfig(),
    progress=None,
) -> list:
    """RANSAC for MANY image pairs in one device sweep.

    The reference's all-pairs sparse phase runs each pair's (up to) 1M
    hypothesis search to completion before starting the next
    (reconstruction.rs:261-277 -> fundamentalmatrix.rs:103-147). Pairs
    are fully independent, so this driver gives the hypothesis sweep a
    pair axis (ransac_batch_pairs): every 50k-hypothesis early-exit
    round covers ALL still-active pairs in one program dispatch.

    Per-pair results are IDENTICAL to find_fundamental_matrix run
    sequentially on each pair, in both modes: the fused all-rounds mode
    dispatches the single-pair driver's own compiled program per pair
    (pipelined one deep), and the round-by-round mode's vmapped lanes
    are pinned bitwise by
    tests/test_epipolar.py::test_multi_pair_matches_sequential /
    test_fused_rounds_match_round_by_round, including a mixed-bucket
    scene (one >2048-match pair forcing the shared 8192 bucket,
    test_multi_pair_mixed_buckets_matches_sequential — ADVICE r4).
    Guarantees:
    * the PRNG round keys are split from PRNGKey(cfg.seed) exactly like
      the sequential driver and shared across the pair axis, and each
      lane's draws are a deterministic function of (key, shape, maxval);
    * the shared match-count bucket only adds masked padding rows
      (m_valid gates scoring; sampling draws from [0, top_limit));
    * early exit is tracked per pair with the sequential driver's
      absorb-then-drop-in-flight bookkeeping: a pair that exits after
      absorbing round k never absorbs round k+1 (its lane in the
      already-dispatched round is ignored), matching the sequential
      break that drops the pending batch.

    Active pairs are compacted between rounds: finished pairs leave the
    lane set, and the lane axis pads to a pow2 bucket so shrinking
    re-uses cached compiles.

    Returns a list aligned with matches_list: FundamentalMatrixResult
    per linked pair, or the RansacError that pair would have raised.
    """
    ransac_k, n, t_base, d, d_early = cfg.params(projection)
    n_pairs = len(matches_list)
    results: list = [None] * n_pairs

    prep: dict[int, dict] = {}
    for pi, matches in enumerate(matches_list):
        m = len(matches)
        if m < d + n:
            results[pi] = RansacError("Not enough matches")
            continue
        t = (
            t_base * max_dimensions[pi]
            if projection == ProjectionMode.PERSPECTIVE
            else t_base
        )
        entry = {
            "matches": matches,
            "m": m,
            "t": float(t),
            "top_limit": min(m, cfg.top_inliers),
        }
        if projection == ProjectionMode.PERSPECTIVE:
            entry["t1"] = _hartley_np(matches[:, 0:2])
            entry["t2"] = _hartley_np(matches[:, 2:4])
        prep[pi] = entry
    if not prep:
        return results

    # One shared match bucket: the scoring mask makes padding free, and
    # a single (P_bucket, mb) shape keeps every round in one compiled
    # program (compiles ride the ~45 s TPU tunnel).
    mb = max(
        pow2_bucket(e["m"], floor=2048, factor=4) for e in prep.values()
    )
    want_k = (
        cfg.top_k_refine if projection == ProjectionMode.PERSPECTIVE else 1
    )
    affine = projection == ProjectionMode.AFFINE
    batch = cfg.check_interval
    n_batches = max(1, ransac_k // batch)

    pools: dict[int, list] = {pi: [] for pi in prep}
    done: dict[int, bool] = {pi: False for pi in prep}

    def build(lanes: list[int]):
        p_bucket = pow2_bucket(len(lanes), floor=1, factor=2)
        padded = lanes + [lanes[0]] * (p_bucket - len(lanes))
        p1 = np.zeros((p_bucket, mb, 2), np.float32)
        p2 = np.zeros((p_bucket, mb, 2), np.float32)
        mv = np.zeros((p_bucket, mb), bool)
        tl = np.zeros((p_bucket,), np.int32)
        th = np.zeros((p_bucket,), np.float32)
        t1s = np.zeros((p_bucket, 3, 3), np.float32)
        t2s = np.zeros((p_bucket, 3, 3), np.float32)
        pks = np.zeros((p_bucket, 2, mb), np.int32)
        all_packed = True
        for li, pi in enumerate(padded):
            e = prep[pi]
            p1[li, : e["m"]] = e["matches"][:, 0:2]
            p2[li, : e["m"]] = e["matches"][:, 2:4]
            mv[li, : e["m"]] = True
            tl[li] = e["top_limit"]
            th[li] = e["t"]
            if not affine:
                t1s[li] = e["t1"]
                t2s[li] = e["t2"]
            if all_packed:
                mpad_li = np.concatenate([p1[li], p2[li]], axis=1)
                pk = pack_coord_table(mpad_li)
                if pk is None:
                    all_packed = False  # uniform path for every lane
                else:
                    pks[li] = pk
        return (
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(mv),
            jnp.asarray(tl), jnp.asarray(th),
            None if affine else jnp.asarray(t1s),
            None if affine else jnp.asarray(t2s),
            jnp.asarray(pks) if all_packed else None,
        )

    def absorb(lanes: list[int], packed: np.ndarray) -> None:
        """Fold one fetched round into per-pair pools; flags early exit.
        Lanes of pairs already done are the sequential driver's dropped
        in-flight batch — ignored."""
        for li, pi in enumerate(lanes):
            if done[pi]:
                continue
            pool = pools[pi]
            fs = packed[li, :, 0:9].astype(np.float64).reshape(-1, 3, 3)
            counts = packed[li, :, 9].astype(np.int64)
            errs = packed[li, :, 10].astype(np.float64)
            for j in range(len(counts)):
                if counts[j] > 0:
                    pool.append((fs[j], int(counts[j]), float(errs[j])))
            pool.sort(key=lambda e: (-e[1], e[2]))
            del pool[want_k:]
            if pool and pool[0][1] > d_early:
                done[pi] = True

    key = jax.random.PRNGKey(cfg.seed)

    # Fused full-budget sweep: when NO pair can early-exit (every
    # m <= d_early — always true for perspective scenes, whose d_early
    # is 50k inliers), each pair's whole n_rounds x 50k search is ONE
    # program dispatch with a running top-K scan (ransac_rounds_packed —
    # the SAME compiled program the single-pair driver uses, so per-pair
    # winners are bitwise-identical to it), and pairs are pipelined one
    # deep so every pair's fetch overlaps the next pair's device sweep.
    # This beats a vmapped pair axis here: the pow2 lane padding would
    # burn real compute (the sweep is arithmetic-bound, not
    # dispatch-bound, at full budget), and the unvmapped program keeps
    # exact numerical parity.
    if (
        not _FORCE_ROUND_LOOP
        and n_batches > 1
        and all(e["m"] <= d_early for e in prep.values())
    ):
        subs = []
        for _ in range(n_batches):
            key, sub = jax.random.split(key)
            subs.append(sub)
        subs = jnp.stack(subs)

        def absorb_one(pi: int, packed: np.ndarray) -> None:
            pool = pools[pi]
            fs = packed[:, 0:9].astype(np.float64).reshape(-1, 3, 3)
            counts = packed[:, 9].astype(np.int64)
            errs = packed[:, 10].astype(np.float64)
            for j in range(len(counts)):
                if counts[j] > 0:
                    pool.append((fs[j], int(counts[j]), float(errs[j])))
            pool.sort(key=lambda e: (-e[1], e[2]))
            del pool[want_k:]

        _dbg = _ransac_debug_logger()
        pending: tuple[int, object] | None = None
        lanes = list(prep)
        for li, pi in enumerate(lanes):
            e = prep[pi]
            # Per-pair bucket, NOT the shared mb: per-pair dispatches
            # don't stack lanes, so each pair pads only to its own pow2
            # bucket — one oversized pair must not quadruple every other
            # pair's scoring (observed: a 6-view scene with one >2048-
            # match pair pushed ALL pairs to the 8192 bucket). This also
            # keeps each pair's program identical to the single-pair
            # driver's (bitwise winner parity).
            mb_i = pow2_bucket(e["m"], floor=2048, factor=4)
            mpad = np.zeros((mb_i, 4), e["matches"].dtype)
            mpad[: e["m"]] = e["matches"]
            p1 = jnp.asarray(mpad[:, 0:2], jnp.float32)
            p2 = jnp.asarray(mpad[:, 2:4], jnp.float32)
            mv = jnp.asarray(np.arange(mb_i) < e["m"])
            t1 = None if affine else jnp.asarray(e["t1"], jnp.float32)
            t2 = None if affine else jnp.asarray(e["t2"], jnp.float32)
            pk_np = pack_coord_table(mpad)
            pk = None if pk_np is None else jnp.asarray(pk_np)
            packed_dev = ransac_rounds_packed(
                subs, p1, p2, mv, e["top_limit"], e["t"],
                float(cfg.min_inlier_distance), d + n,
                n_samples=n, batch=batch, projection_affine=affine,
                rank_eps=cfg.rank_epsilon, t1=t1, t2=t2, top_k=want_k,
                packed_t=pk,
            )
            if _dbg:
                _dbg(f"pair {pi} dispatched (m={e['m']}, mb={mb_i})")
            if pending is not None:
                absorb_one(pending[0], np.asarray(pending[1]))
                # Finalize (LM refinement on the CPU backend) runs
                # INLINE while the NEXT pair's fused sweep occupies the
                # TPU — per-pair LM (~0.2-0.6 s) hides under the ~0.9 s
                # device sweep. A batched cross-pair LM was measured
                # SLOWER (6.1 s for 9 pairs at 80 lanes): the
                # while_loop's per-iteration cost scales with lanes, its
                # iteration count is the max over pairs, and on the CPU
                # backend there is no dispatch overhead to amortize.
                _complete_pair(
                    prep, pools, results, pending[0], projection, cfg
                )
                if _dbg:
                    _dbg(f"pair {pending[0]} absorbed+finalized")
            pending = (pi, packed_dev)
            if progress is not None:
                progress.report_status(li / len(lanes))
        if pending is not None:
            absorb_one(pending[0], np.asarray(pending[1]))
            _complete_pair(prep, pools, results, pending[0], projection, cfg)
            if _dbg:
                _dbg("last pair absorbed+finalized")
        if progress is not None:
            progress.report_status(1.0)
        return results

    cached_lanes: list[int] | None = None
    cached_arrays = None
    pending: tuple[list[int], object] | None = None
    for i in range(n_batches):
        lanes = [pi for pi in prep if not done[pi]]
        if not lanes:
            break
        key, sub = jax.random.split(key)
        if lanes != cached_lanes:
            cached_lanes = list(lanes)
            cached_arrays = build(lanes)
        p1, p2, mv, tl, th, t1s, t2s, pks = cached_arrays
        packed_dev = ransac_batch_pairs(
            sub, p1, p2, mv, tl, th,
            float(cfg.min_inlier_distance), d + n,
            n_samples=n, batch=batch, projection_affine=affine,
            rank_eps=cfg.rank_epsilon, t1=t1s, t2=t2s, top_k=want_k,
            packed_t=pks,
        )
        if pending is not None:
            absorb(pending[0], np.asarray(pending[1]))
            if progress is not None:
                progress.report_status(i / n_batches)
        pending = (lanes, packed_dev)
    if pending is not None:
        absorb(pending[0], np.asarray(pending[1]))
        if progress is not None:
            progress.report_status(1.0)

    return _finalize_multi(prep, pools, results, projection, cfg)


def _finalize_multi(prep, pools, results, projection, cfg):
    """Finalize every pair's pool (round-by-round mode). Per-pair LM —
    measured faster than one batched cross-pair lane program on the CPU
    backend (lane cost scales per iteration, iterations are the max
    over pairs), and bitwise-identical to the sequential driver."""
    for pi in prep:
        _complete_pair(prep, pools, results, pi, projection, cfg)
    return results


def _complete_pair(prep, pools, results, pi, projection, cfg) -> None:
    """Finalize one pair's pool into results[pi] (result or error)."""
    if not pools[pi]:
        results[pi] = RansacError("No reliable matches found")
    else:
        results[pi] = _finalize_pair(
            prep[pi]["matches"], pools[pi], prep[pi]["t"], projection, cfg
        )
