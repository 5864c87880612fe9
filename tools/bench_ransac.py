"""Microbenchmark: where does a 50k-hypothesis perspective RANSAC batch
spend its time on the real TPU?

Times the full ransac_batch and its component stages (sampling redraw
loop, 7-point solver, chunked Sampson scoring, lexicographic top-K) as
separately-jitted programs, best-of-N with a value fetch per run (the
tunnel's block_until_ready is unreliable — CLAUDE.md).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_ransac.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cybervision_tpu.config import ProjectionMode, RansacConfig
from cybervision_tpu.ops import epipolar as ep

BATCH = 50_000
MB = 2048
M_REAL = 1800
N = 7
TOP_LIMIT = M_REAL
DIM = 320.0


def _once(fn):
    t0 = time.time()
    out = fn()
    # fetch one small value to force completion
    np.asarray(jax.device_get(jnp.ravel(out)[0]))
    return time.time() - t0


def timed(fn, n=5):
    _once(fn)  # warm / compile
    return min(_once(fn) for _ in range(n))


def main():
    rng = np.random.RandomState(0)
    m = np.zeros((MB, 4), np.float32)
    m[:M_REAL] = rng.uniform(0, DIM, (M_REAL, 4))
    p1 = jnp.asarray(m[:, 0:2])
    p2 = jnp.asarray(m[:, 2:4])
    m_valid = jnp.asarray(np.arange(MB) < M_REAL)
    t1 = jnp.asarray(ep._hartley_np(m[:M_REAL, 0:2]), jnp.float32)
    t2 = jnp.asarray(ep._hartley_np(m[:M_REAL, 2:4]), jnp.float32)
    cfg = RansacConfig()
    t = cfg.ransac_t_perspective * DIM
    key = jax.random.PRNGKey(0)

    # --- full batch
    def full():
        f, c, e = ep.ransac_batch(
            key, p1, p2, m_valid, TOP_LIMIT, t,
            float(cfg.min_inlier_distance), 207,
            n_samples=N, batch=BATCH, projection_affine=False,
            rank_eps=cfg.rank_epsilon, t1=t1, t2=t2, top_k=8,
        )
        return ep._pack_candidates(f, c, e)

    print(f"full ransac_batch (50k):      {timed(full)*1e3:8.1f} ms")

    # --- fused packed batch (one dispatch)
    def full_packed():
        return ep.ransac_batch_packed(
            key, p1, p2, m_valid, TOP_LIMIT, t,
            float(cfg.min_inlier_distance), 207,
            n_samples=N, batch=BATCH, projection_affine=False,
            rank_eps=cfg.rank_epsilon, t1=t1, t2=t2, top_k=8,
        )

    print(f"fused packed batch (50k):     {timed(full_packed)*1e3:8.1f} ms")

    # --- multi-pair rounds
    for P in (4, 8, 16):
        p1s = jnp.broadcast_to(p1, (P, MB, 2))
        p2s = jnp.broadcast_to(p2, (P, MB, 2))
        mvs = jnp.broadcast_to(m_valid, (P, MB))
        tls = jnp.full((P,), TOP_LIMIT, jnp.int32)
        ths = jnp.full((P,), t, jnp.float32)
        t1s = jnp.broadcast_to(t1, (P, 3, 3))
        t2s = jnp.broadcast_to(t2, (P, 3, 3))

        def pairs_round():
            return ep.ransac_batch_pairs(
                key, p1s, p2s, mvs, tls, ths,
                float(cfg.min_inlier_distance), 207,
                n_samples=N, batch=BATCH, projection_affine=False,
                rank_eps=cfg.rank_epsilon, t1=t1s, t2=t2s, top_k=8,
            )

        ms = timed(pairs_round) * 1e3
        print(f"pairs round P={P:2d} (x50k):     {ms:8.1f} ms"
              f"  ({ms/P:6.1f} ms/pair)")

    # --- sampling only
    @jax.jit
    def sampling():
        keys = jax.random.split(key, 2)
        idx = jax.random.randint(keys[0], (BATCH, N), 0, TOP_LIMIT)
        tril = jnp.tril(jnp.ones((N, N), bool), k=-1)
        p_all = jnp.concatenate([p1, p2], axis=1)

        def redraw(i, state):
            idx, coords = state
            diff = jnp.abs(coords[:, :, None, :] - coords[:, None, :, :])
            close = jnp.any(diff < cfg.min_inlier_distance, axis=3)
            conflict = jnp.any(close & tril[None], axis=2)
            fresh = jax.random.randint(
                jax.random.fold_in(keys[1], i), (BATCH, N), 0, TOP_LIMIT
            )
            return (
                jnp.where(conflict, fresh, idx),
                jnp.where(conflict[:, :, None], p_all[fresh], coords),
            )

        idx, coords = jax.lax.fori_loop(0, 12, redraw, (idx, p_all[idx]))
        return coords.sum()

    print(f"  sampling redraw loop:       {timed(sampling)*1e3:8.1f} ms")

    # --- solver only (on fixed coords)
    coords = jnp.asarray(
        rng.uniform(0, DIM, (BATCH, N, 4)).astype(np.float32)
    )

    @jax.jit
    def solver():
        s1 = coords[:, :, 0:2]
        s2 = coords[:, :, 2:4]
        n1 = jnp.einsum("ij,bnj->bni", t1[:2, :2], s1) + t1[:2, 2]
        n2 = jnp.einsum("ij,bnj->bni", t2[:2, :2], s2) + t2[:2, 2]
        f, valid = ep.solve_perspective_batch(n1, n2, cfg.rank_epsilon)
        f = jnp.einsum("ji,brjk,kl->bril", t2, f, t1)
        return f.sum()

    print(f"  7-point solver:             {timed(solver)*1e3:8.1f} ms")

    # --- scoring only (fixed F batch, 150k candidates)
    total3 = BATCH * 3 + ((-BATCH * 3) % 2048)
    ff = jnp.asarray(rng.normal(size=(total3, 3, 3)).astype(np.float32))
    idx_rep = jnp.asarray(
        rng.randint(0, M_REAL, (total3, N)).astype(np.int32)
    )

    @jax.jit
    def scoring():
        chunk = 2048
        total = ff.shape[0]

        def score_chunk(args):
            f_c, i_c = args
            err = ep.sampson_error(f_c, p1, p2)
            fits = jnp.isfinite(err) & (err <= t) & m_valid[None, :]
            count = jnp.sum(fits, axis=1)
            err_sum = jnp.sum(jnp.where(fits, err, 0.0), axis=1)
            own = jnp.take_along_axis(err, i_c, axis=1)
            own_ok = jnp.all(jnp.isfinite(own) & (own <= t), axis=1)
            return count, err_sum, own_ok

        n_chunks = total // chunk
        count, err_sum, own_ok = jax.lax.map(
            score_chunk,
            (
                ff.reshape(n_chunks, chunk, 3, 3),
                idx_rep.reshape(n_chunks, chunk, -1),
            ),
        )
        return count.sum() + err_sum.reshape(-1)[0]

    print(f"  chunked scoring (150k x 2k):{timed(scoring)*1e3:8.1f} ms")

    # --- scoring, single fused pass (no lax.map)
    @jax.jit
    def scoring_fused():
        err = ep.sampson_error(ff, p1, p2)  # (150k, 2048)
        fits = jnp.isfinite(err) & (err <= t) & m_valid[None, :]
        count = jnp.sum(fits, axis=1)
        err_sum = jnp.sum(jnp.where(fits, err, 0.0), axis=1)
        return count.sum() + err_sum[0]

    print(f"  scoring single pass, no own:{timed(scoring_fused)*1e3:8.1f} ms")

    # --- sort only
    cc = jnp.asarray(rng.randint(0, 2000, total3).astype(np.int32))
    ee = jnp.asarray(rng.uniform(0, 1, total3).astype(np.float32))

    @jax.jit
    def lexsort():
        return ep._lex_topk_indices(cc, ee)[:8]

    print(f"  lex top-k sort (150k):      {timed(lexsort)*1e3:8.1f} ms")

    # --- dispatch floor: trivial program round-trip
    @jax.jit
    def trivial():
        return p1.sum()

    print(f"  trivial program round trip: {timed(trivial)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
