"""Staged decomposition of the CURRENT perspective ransac batch on TPU:
cumulative sub-programs (sampling; +solve; +score; full) — differences
give per-stage device cost over the ~25 ms tunnel floor."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cybervision_tpu.config import RansacConfig
from cybervision_tpu.ops import epipolar as ep

BATCH = 50_000
MB = 2048
M_REAL = 1800
N = 7
DIM = 320.0


def _once(fn):
    t0 = time.time()
    out = fn()
    np.asarray(jax.device_get(jnp.ravel(out)[0]))
    return time.time() - t0


def timed(fn, n=5):
    _once(fn)
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
    min_d = float(cfg.min_inlier_distance)

    def sample_stage():
        keys = jax.random.split(key, 2)
        idx0 = jax.random.randint(keys[0], (BATCH, N), 0, M_REAL)
        fresh = jnp.stack([
            jax.random.randint(
                jax.random.fold_in(keys[1], i), (BATCH, N), 0, M_REAL
            ) for i in range(12)
        ])
        tril = jnp.tril(jnp.ones((N, N), bool), k=-1)
        p_all = jnp.concatenate([p1, p2], axis=1)
        all_coords = p_all[jnp.concatenate([idx0[None], fresh], axis=0)]

        def redraw(i, state):
            idx, coords = state
            diff = jnp.abs(coords[:, :, None, :] - coords[:, None, :, :])
            close = jnp.any(diff < min_d, axis=3)
            conflict = jnp.any(close & tril[None], axis=2)
            return (
                jnp.where(conflict, fresh[i], idx),
                jnp.where(conflict[:, :, None], all_coords[i + 1], coords),
            )

        idx, coords = jax.lax.fori_loop(0, 12, redraw, (idx0, all_coords[0]))
        diff = jnp.abs(coords[:, :, None, :] - coords[:, None, :, :])
        close = jnp.any(diff < min_d, axis=3)
        iu = jnp.triu_indices(N, k=1)
        sample_ok = ~jnp.any(close[:, iu[0], iu[1]], axis=1)
        return idx, coords, sample_ok

    def solve_stage():
        idx, coords, sample_ok = sample_stage()
        s1 = coords[:, :, 0:2]
        s2 = coords[:, :, 2:4]
        n1 = jnp.einsum("ij,bnj->bni", t1[:2, :2], s1) + t1[:2, 2]
        n2 = jnp.einsum("ij,bnj->bni", t2[:2, :2], s2) + t2[:2, 2]
        f, valid = ep.solve_perspective_batch(n1, n2, cfg.rank_epsilon)
        f = jnp.einsum("ji,brjk,kl->bril", t2, f, t1)
        denom = f[..., 2, 2]
        dok = jnp.abs(denom) > 1e-20
        f = f / jnp.where(dok, denom, 1.0)[..., None, None]
        valid &= dok & sample_ok[:, None]
        return f, valid, s1, s2

    def score_stage():
        f, valid, s1, s2 = solve_stage()
        ff = f.reshape(-1, 3, 3)
        own = jax.vmap(ep.sampson_error)(f, s1, s2)
        own_ok = jnp.all(jnp.isfinite(own) & (own <= t), axis=2).reshape(-1)
        chunk = 2048
        total = ff.shape[0]
        pad = (-total) % chunk
        ff_p = jnp.pad(ff, ((0, pad), (0, 0), (0, 0)))

        def score_chunk(f_c):
            err = ep.sampson_error(f_c, p1, p2)
            fits = jnp.isfinite(err) & (err <= t) & m_valid[None, :]
            return jnp.sum(fits, axis=1), jnp.sum(
                jnp.where(fits, err, 0.0), axis=1
            )

        n_chunks = (total + pad) // chunk
        count, err_sum = jax.lax.map(
            score_chunk, ff_p.reshape(n_chunks, chunk, 3, 3)
        )
        count = count.reshape(-1)[:total]
        err_sum = err_sum.reshape(-1)[:total]
        good = valid.reshape(-1) & own_ok & (count >= 207)
        count = jnp.where(good, count, 0)
        return ff, count, err_sum / jnp.maximum(count, 1)

    def full_stage():
        ff, count, mean_err = score_stage()
        top_i = ep._lex_topk_indices(count, mean_err)[:8]
        return ep._pack_candidates_core(
            ff[top_i], count[top_i], mean_err[top_i]
        )

    for name, fn in [
        ("sampling", jax.jit(lambda: sample_stage()[1])),
        ("+solve", jax.jit(lambda: solve_stage()[0])),
        ("+score", jax.jit(lambda: score_stage()[1])),
        ("full+sort+pack", jax.jit(full_stage)),
    ]:
        print(f"{name:16s} {timed(fn)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
