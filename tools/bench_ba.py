"""A/B the bundle-adjustment paths on real hardware (VERDICT r2 #6).

Measures, on synthetic noisy scenes shaped like the SFM bench
(320x256-scale observations; T tracks x m cameras):

  * host   — the default fused-jit XLA:CPU f64 LM (ops.ba._bundle_adjust_jit)
  * device — the f32 whole-loop lax.while_loop LM on the default backend
             (TPU when available) + f64 host polish
             (ops.ba._bundle_adjust_device)

Prints per-config best-of-N wall-clock and final reprojection RMS, so the
ba.py docstring's "TPUs are the wrong tool for f64 BA" claim is a
measurement, not an argument.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_ba.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def scene(rng, t, m, w=320, h=256):
    from cybervision_tpu.ops import sfm
    from cybervision_tpu.ops.surface import MISSING, Camera

    k = np.array([[400.0, 0, w / 2], [0, 400.0, h / 2], [0, 0, 1]])
    pts = np.stack(
        [
            rng.uniform(-2, 2, t),
            rng.uniform(-1.6, 1.6, t),
            rng.uniform(6, 12, t),
        ],
        axis=1,
    )
    cams = [
        Camera(
            k=k,
            r=rng.normal(0, 0.05, 3),
            t=np.array([1.0 * j - (m - 1) / 2, 0.1 * j, 0.05 * j]),
        )
        for j in range(m)
    ]
    obs = np.full((t, m, 2), float(MISSING))
    for j, cam in enumerate(cams):
        p = cam.projection()
        hom = np.concatenate([pts, np.ones((t, 1))], axis=1)
        q = hom @ p.T
        uv = q[:, :2] / q[:, 2:3]
        vis = (
            (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
        )
        # drop ~15% at random: realistic partial observations
        vis &= rng.uniform(size=t) > 0.15
        obs[vis, j] = np.round(uv[vis])
    store = sfm.TrackStore(m)
    store.append(obs.astype(np.int64))
    store.points3d = pts + rng.normal(0, 0.05, pts.shape)
    store.has_point3d = np.ones(t, bool)
    noisy = [
        Camera(
            k=k,
            r=c.r + rng.normal(0, 0.002, 3),
            t=c.t + rng.normal(0, 0.01, 3),
        )
        for c in cams
    ]
    return store, noisy


def rms(store, cameras):
    from cybervision_tpu.ops.surface import MISSING

    total = []
    for j, cam in enumerate(cameras):
        p = cam.projection()
        pts = store.points3d
        hom = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
        q = hom @ p.T
        uv = q[:, :2] / q[:, 2:3]
        msk = store.pts[:, j, 0] != MISSING
        total.append(
            np.linalg.norm(uv[msk] - store.pts[msk, j], axis=1)
        )
    return float(np.mean(np.concatenate(total)))


def main():
    import copy

    import jax

    from cybervision_tpu.utils.cache import machine_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/root/repo/.jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cybervision_tpu.config import TriangulationConfig
    from cybervision_tpu.ops import ba

    print(f"backend: {jax.default_backend()}")
    cfg = TriangulationConfig()
    for t, m in [(26_000, 3), (50_000, 5)]:
        rng = np.random.RandomState(7)
        store0, noisy0 = scene(rng, t, m)
        for name, fn in [
            ("host_f64", ba._bundle_adjust_jit),
            ("device_f32+polish", ba._bundle_adjust_device),
        ]:
            times, final = [], None
            for rep in range(4):
                store = copy.deepcopy(store0)
                cams = list(noisy0)
                t0 = time.time()
                out = fn(store, cams, cfg)
                dt = time.time() - t0
                if rep > 0:  # rep 0 = compile warm-up
                    times.append(dt)
                if out is not None:
                    final = rms(store, out)
            print(
                f"T={t} m={m} {name}: best {min(times):.3f}s "
                f"(reps {['%.3f' % x for x in times]}) rms={final:.4f}"
            )


if __name__ == "__main__":
    main()
