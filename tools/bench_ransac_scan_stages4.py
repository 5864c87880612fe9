"""Scan-based stage decomposition of the ROUND-5 production RANSAC
round (single fused draw, packed gather, lane-major validity, Pallas
scoring, K-argmax top-K) — cumulative sub-pipelines over 20 scanned
rounds. Reducers keep `valid` LIVE from the solve stage on, so XLA
cannot dead-code-eliminate the validity chain out of the baselines
(the round-4 stage table's misattribution).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_ransac_scan_stages4.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cybervision_tpu.config import RansacConfig
from cybervision_tpu.ops import epipolar as ep

if __name__ == "__main__":
    B, N, MB, M_REAL, R = 50_000, 7, 2048, 1800, 20
    rng = np.random.RandomState(0)
    m = np.zeros((MB, 4), np.float32)
    m[:M_REAL] = rng.randint(0, 320, (M_REAL, 4)).astype(np.float32)
    p1, p2 = jnp.asarray(m[:, :2]), jnp.asarray(m[:, 2:])
    mv = jnp.asarray(np.arange(MB) < M_REAL)
    t1 = jnp.asarray(ep._hartley_np(m[:M_REAL, :2]), jnp.float32)
    t2 = jnp.asarray(ep._hartley_np(m[:M_REAL, 2:]), jnp.float32)
    packed_t = jnp.asarray(ep.pack_coord_table(m))
    cfg = RansacConfig()
    t = cfg.ransac_t_perspective * 320.0
    key = jax.random.PRNGKey(0)
    subs = []
    for _ in range(R):
        key, sub = jax.random.split(key)
        subs.append(sub)
    subs = jnp.stack(subs)
    min_d = 10.0
    tril = jnp.tril(jnp.ones((N, N), bool), k=-1)

    def draw_stage(rk):
        return jax.random.randint(rk, (13, N, B), 0, M_REAL)

    def gather_stage(rk):
        all_idx = draw_stage(rk)
        return jnp.take(packed_t, all_idx, axis=1)  # (2, 13, N, B)

    def sample_stage(rk):
        all_packed = gather_stage(rk)

        def round_coords(i):
            pk = all_packed[:, i]
            hi = jnp.right_shift(pk, 16).astype(jnp.float32)
            lo = jnp.bitwise_and(pk, 0xFFFF).astype(jnp.float32)
            return jnp.stack([hi[0], lo[0], hi[1], lo[1]])

        def redraw(i, coords):
            diff = jnp.abs(coords[:, :, None, :] - coords[:, None, :, :])
            close = jnp.any(diff < min_d, axis=0)
            conflict = jnp.any(close & tril[:, :, None], axis=1)
            return jnp.where(conflict[None], round_coords(i + 1), coords)

        coords = jax.lax.fori_loop(0, 12, redraw, round_coords(0))
        diff = jnp.abs(coords[:, :, None, :] - coords[:, None, :, :])
        close = jnp.any(diff < min_d, axis=0)
        iu = jnp.triu_indices(N, k=1)
        sample_ok = ~jnp.any(close[iu[0], iu[1]], axis=0)
        s1 = jnp.transpose(coords[0:2], (2, 1, 0))
        s2 = jnp.transpose(coords[2:4], (2, 1, 0))
        return s1, s2, sample_ok

    def solve_stage(rk):
        s1, s2, ok = sample_stage(rk)
        n1 = jnp.einsum("ij,bnj->bni", t1[:2, :2], s1) + t1[:2, 2]
        n2 = jnp.einsum("ij,bnj->bni", t2[:2, :2], s2) + t2[:2, 2]
        f, valid = ep.solve_perspective_batch(n1, n2, cfg.rank_epsilon)
        f = jnp.einsum("ji,brjk,kl->bril", t2, f, t1)
        denom = f[..., 2, 2]
        dok = jnp.abs(denom) > 1e-20
        f = f / jnp.where(dok, denom, 1.0)[..., None, None]
        return f, valid & dok & ok[:, None], s1, s2

    def own_stage(rk):
        f, valid, s1, s2 = solve_stage(rk)
        own = jax.vmap(ep.sampson_error)(f, s1, s2)
        own_ok = jnp.all(jnp.isfinite(own) & (own <= t), axis=2).reshape(-1)
        return f, valid, own_ok

    def score_stage(rk):
        from cybervision_tpu.ops import pallas_score

        f, valid, own_ok = own_stage(rk)
        ff = f.reshape(-1, 3, 3)
        count, err_sum = pallas_score.score_candidates(ff, p1, p2, mv, t)
        good = valid.reshape(-1) & own_ok & (count >= 207)
        count = jnp.where(good, count, 0)
        return ff, count, err_sum / jnp.maximum(count, 1)

    def full_stage(rk):
        ff, count, mean_err = score_stage(rk)
        i = ep._lex_topk_iter(count, mean_err, 8)
        return ep._pack_candidates_core(ff[i], count[i], mean_err[i])

    def scanner(stage, reduce_fn):
        def run():
            def body(c, rk):
                out = reduce_fn(stage(rk))
                return c + out, None

            s, _ = jax.lax.scan(body, jnp.float32(0), subs)
            return s

        return jax.jit(run)

    def once(fn):
        t0 = time.time()
        o = fn()
        np.asarray(jax.device_get(jnp.ravel(o)[0]))
        return time.time() - t0

    def timed(fn, n=3):
        once(fn)
        return min(once(fn) for _ in range(n))

    fv = lambda o: o[0].sum() + jnp.sum(o[1].astype(jnp.float32))
    stages = [
        ("draw", scanner(draw_stage, lambda o: o.sum().astype(jnp.float32))),
        ("+gather", scanner(gather_stage, lambda o: o.sum().astype(jnp.float32))),
        ("+redraw", scanner(sample_stage, lambda o: o[0].sum())),
        ("+solve+valid", scanner(solve_stage, fv)),
        ("+own", scanner(own_stage, lambda o: fv(o) + jnp.sum(o[2].astype(jnp.float32)))),
        ("+score", scanner(score_stage, lambda o: jnp.sum(o[1].astype(jnp.float32)))),
        ("+sort+pack", scanner(full_stage, lambda o: o.sum())),
    ]
    prev = 0.0
    for name, fn in stages:
        dt = timed(fn)
        print(
            f"{name:14s} {dt/R*1e3:7.1f} ms/round  (delta {(dt-prev)/R*1e3:+6.1f})",
            flush=True,
        )
        prev = dt
