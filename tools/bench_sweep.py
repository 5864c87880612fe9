"""Microbench: refine-sweep kernel vs XLA scan at 1024^2, warm.

Usage (TPU): PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_sweep.py
Prints per-call ms for refine_pass_pallas and refine_pass on the same
inputs (horizontal epipolar geometry, the SEM/bench case).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from cybervision_tpu.utils.cache import machine_cache_dir

jax.config.update(
    "jax_compilation_cache_dir", machine_cache_dir("/root/repo/.jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import synth_sem_pair
from cybervision_tpu.ops import correlation as corr


def timed(fn, n=5):
    out = fn()
    np.asarray(jax.device_get(out.corr[0, 0]))  # sync
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        out = fn()
        np.asarray(jax.device_get(out.corr[0, 0]))
        best = min(best, time.time() - t0)
    return best, out


def main():
    h = w = 1024
    img1, img2 = synth_sem_pair(h, w)
    f = corr.normalize_f(
        np.array([[0, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
    )
    # previous-scale state: a half-res grid pointing near the truth
    hp, wp = h // 2, w // 2
    ys, xs = np.mgrid[0:hp, 0:wp]
    pos = np.stack([np.maximum(2 * xs - 4, 0), 2 * ys], axis=-1)
    prev = corr.CorrelationState(
        pos=jnp.asarray(pos, jnp.int32),
        corr=jnp.ones((hp, wp), jnp.float32),
        valid=jnp.ones((hp, wp), bool),
    )
    im1 = jnp.asarray(img1)
    im2 = jnp.asarray(img2)
    fj = jnp.asarray(f, jnp.float32)
    trange = corr.warp_shift_range(f, 1.0, h, w, h, w)
    wtr, tmin = corr.split_trange(trange)
    args = (im1, im2, prev, fj, 1.0, 0.6, 1.0, 2.5, 1.0, 2, 16)

    t_scan, o_scan = timed(
        lambda: corr.refine_pass(*args, warp_trange=wtr, warp_tmin=tmin)
    )
    print(f"scan:         {t_scan * 1e3:8.1f} ms")
    if jax.default_backend() == "tpu":
        t_pal, o_pal = timed(
            lambda: corr.refine_pass_pallas(
                *args, warp_trange=wtr, warp_tmin=tmin
            )
        )
        print(f"pallas horiz: {t_pal * 1e3:8.1f} ms")
        a, b = np.asarray(o_scan.valid), np.asarray(o_pal.valid)
        print(f"valid agree: {(a == b).mean():.4f}  (scan {a.mean():.3f})")

        # Native-vert variant on the same data volume: the transposed
        # scene with the true vertical-shift F. No transpose wrapper
        # runs (axis already 'vert'), isolating the kernel cost.
        f_v = corr.normalize_f(
            np.array([[0, 0, 1], [0, 0, 0], [-1, 0, 0]], np.float64)
        )
        prev_v = corr.CorrelationState(
            pos=jnp.asarray(pos[:, :, ::-1].transpose(1, 0, 2)),
            corr=jnp.ones((wp, hp), jnp.float32),
            valid=jnp.ones((wp, hp), bool),
        )
        tr_v = corr.warp_shift_range(f_v, 1.0, w, h, w, h)
        wtr_v, tmin_v = corr.split_trange(tr_v)
        args_v = (
            im1.T, im2.T, prev_v, jnp.asarray(f_v, jnp.float32),
            1.0, 0.6, 1.0, 2.5, 1.0, 2, 16,
        )
        t_v, o_v = timed(
            lambda: corr.refine_pass_pallas(
                *args_v, warp_trange=wtr_v, warp_tmin=tmin_v
            )
        )
        print(f"pallas vert:  {t_v * 1e3:8.1f} ms")

        # Per-pixel-axis variant (perspective F: no static trange, the
        # kernel compiles both roll directions + selects). Same scene so
        # the u-loop volume matches; corridor_size stays 2 for
        # comparability with the rows above.
        t_pp, o_pp = timed(
            lambda: corr.refine_pass_pallas(*args)
        )
        print(f"pallas per-pixel axis: {t_pp * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
