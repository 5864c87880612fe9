"""Headline benchmark: 1024x1024 SEM stereopair, end-to-end reconstruction.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

The headline metric is the BASELINE.json north star: wall-clock seconds
for the full pipeline to a PLY mesh (ORB features -> Hamming matching ->
affine RANSAC -> coarse-to-fine dense NCC correlation -> affine
triangulation -> Delaunay meshing -> binary PLY with vertex colors) on a
synthetic 1024^2 SEM-like pair, JIT caches warm. vs_baseline = target /
measured against the 2.0 s target (>1 is better than target; the
reference publishes no numbers, BASELINE.md).

extra carries the other BASELINE.md metrics:
  * depth_map_seconds — e2e to a PNG depth map (interpolation=none, the
    device fast lane; BASELINE config #1),
  * dense_correlation_mpix_per_s_per_chip — processed pixels (both sweep
    directions, every pyramid level) / dense-correlation wall-clock,
    for the affine and (separately) perspective parameter sets,
  * phases_ply_seconds — per-phase breakdown of the best headline run
    (sparse/ransac/dense/triangulation/output), the structured form of
    the reference's wall-clock prints (reconstruction.rs:316-318),
  * sfm_{3,5}view_320x256_to_merged_ply_seconds — multi-image
    perspective SFM to a merged mesh (BASELINE config #5) at the
    reference's FULL default RANSAC budgets, with per-run pair-failure
    counts and phase breakdowns,
  * hires_4032x3024_texture_obj_seconds — BASELINE config #4, on by
    default (CVTPU_BENCH_HIRES=0 skips).
"""

import json
import os
import sys
import time

import numpy as np
from scipy import ndimage


def synth_sem_pair(h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.uniform(0, 255, (h, w))
    base = ndimage.gaussian_filter(base, 1.2)
    bumps = ndimage.gaussian_filter(rng.uniform(0, 255, (h, w)), 8.0)
    img1 = base * 0.6 + bumps * 0.4
    img1 = (img1 - img1.min()) / (img1.max() - img1.min()) * 255.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    disparity = 2.0 + 6.0 * (ys / h) ** 2 + 3.0 * np.sin(xs / w * 3.0)
    img2 = ndimage.map_coordinates(img1, [ys, xs + disparity], order=3, mode="nearest")
    return np.round(img1).astype(np.uint8), np.round(img2).astype(np.uint8)


def save_pair(d, h, w):
    from PIL import Image

    img1, img2 = synth_sem_pair(h, w)
    p1 = os.path.join(d, "bench_a.png")
    p2 = os.path.join(d, "bench_b.png")
    Image.fromarray(img1).save(p1)
    Image.fromarray(img2).save(p2)
    return p1, p2


def run(paths, out_path, cfg):
    rec, dt, _ = run_full(paths, out_path, cfg)
    return dt


# Stable snake-case keys for the bench's per-phase breakdown (item:
# regressions in non-dense phases must be driver-visible, not only in
# ad-hoc PERF.md notes). Keys map the reference's phase prints
# (reconstruction.rs:316-318 and per-phase prints).
_PHASE_KEYS = {
    "Loaded images": "image_load",
    "Extracted feature points": "sparse_features",
    "Matched keypoints": "sparse_matching",
    "Completed RANSAC fitting": "ransac",
    "Completed dense correlation": "dense_correlation",
    "Fetched correlation grid": "device_fetch",
    "Added dense image pair": "track_extend",
    "Completed triangulation post-processing": "triangulation",
    # Sub-phases of "triangulation" (SfmPipeline.complete) — informative
    # split, not additive with their parent.
    "Finalize DLT": "triangulation_dlt",
    "Finalize outlier filter": "triangulation_filter",
    "Finalize bundle adjustment": "triangulation_ba",
    "Saved result": "output",
    "Completed reconstruction": "total",
}


def run_full(paths, out_path, cfg):
    """One pipeline run -> (Reconstruction, seconds, phase breakdown)."""
    from cybervision_tpu.reconstruction import Reconstruction
    from cybervision_tpu.utils.progress import collect_phases

    rec = Reconstruction(list(paths), out_path, cfg, quiet=True)
    acc = collect_phases()
    t0 = time.time()
    rec.run()
    dt = time.time() - t0
    phases = {}
    for phrase, secs in acc.items():
        key = _PHASE_KEYS.get(phrase)
        if key is None:  # per-image merge timers etc.
            key = "track_merge" if phrase.startswith("Merged tracks") else phrase
        phases[key] = round(phases.get(key, 0.0) + secs, 3)
    return rec, dt, phases


def correlation_throughput(p1, p2, n_runs=3, projection=None):
    """Dense-correlation Mpix/s per chip: processed pixels (both
    directions x every pyramid level) / sweep wall-clock.

    projection selects the parameter set: AFFINE (corridor_size 2, the
    north-star config) or PERSPECTIVE (corridor_size 4, wider per-pixel
    windows — the heavier path, correlation/mod.rs:24-25)."""
    import jax

    from cybervision_tpu.config import (
        CorrelationConfig,
        ProjectionMode,
        pyramid_scales,
    )
    from cybervision_tpu.images import SourceImage
    from cybervision_tpu.ops import correlation

    if projection is None:
        projection = ProjectionMode.AFFINE
    src1 = SourceImage.load(p1)
    src2 = SourceImage.load(p2)
    f = np.array([[0, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
    cfg = CorrelationConfig()

    h, w = src1.img.shape
    pixels = 0
    for s in pyramid_scales((w, h), cfg.scale_min_size):
        pixels += 2 * int(h * s) * int(w * s)  # forward + reverse sweeps

    def once():
        t0 = time.time()
        packed = correlation.correlate_images(
            src1, src2, f, projection, cfg, device_out=True
        )
        # The tunnel's block_until_ready is unreliable; fetch a value.
        np.asarray(jax.device_get(packed[0, 0]))
        return time.time() - t0

    once()  # warm
    dt = min(once() for _ in range(n_runs))
    return pixels / dt / 1e6, dt


def sfm_views_seconds(td, n_views=3, n_runs=3):
    """Multi-image perspective SFM e2e: n rendered 320x256 views of one
    world surface -> pose recovery (device P3P RANSAC) -> dense
    correlation of every linked pair (software-pipelined) -> track
    merge -> DLT -> bundle adjustment -> merged vertex-colored PLY.

    RANSAC budgets are the DEFAULTS — the reference's full budgets
    (ransac_k=1,000,000 with 50k-inlier early exit,
    fundamentalmatrix.rs:18-28; P3P ransac_k=100,000,
    triangulation.rs:22) — because device-batched RANSAC makes the full
    search cheap; no moderation (VERDICT r2 missing #2).

    Returns (best_seconds, pair_failures_per_run, phases_of_best)."""
    import numpy as np
    from PIL import Image

    from cybervision_tpu.config import (
        InterpolationMode,
        MeshMode,
        ProjectionMode,
        ReconstructionConfig,
    )
    from tests.perspective_scene import multi_cams, render_views

    rng = np.random.RandomState(3)
    views = render_views(rng, multi_cams(n_views - 1))
    paths = []
    for i, img in enumerate(views):
        p = os.path.join(td, f"sfm{n_views}_{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    cfg = ReconstructionConfig(
        projection=ProjectionMode.PERSPECTIVE,
        interpolation=InterpolationMode.DELAUNAY,
        mesh=MeshMode.VERTEX_COLORS,
        focal_length=43,
    )
    run(paths, os.path.join(td, f"sfm{n_views}_warm.ply"), cfg)
    results = [
        run_full(paths, os.path.join(td, f"sfm{n_views}_{i}.ply"), cfg)
        for i in range(n_runs)
    ]
    rec, dt, phases = min(results, key=lambda r: r[1])
    failures = [r[0].ransac_failures + r[0].dense_failures for r in results]
    return dt, failures, phases


def perspective_pair_exif_obj_seconds(td, n_runs=3):
    """BASELINE config #3: a perspective photo pair whose K comes from
    the images' own EXIF FocalLengthIn35mmFilm tag (no --focal-length
    flag), bundle adjustment ON, to a vertex-colored OBJ — the
    reference's --projection=perspective photo path
    (/root/reference/src/main.rs:73-76, src/reconstruction.rs:164-185).
    The last BASELINE config without a driver-captured timing
    (VERDICT r3 missing #2). Returns (best_seconds, phases_of_best)."""
    from PIL import Image

    from cybervision_tpu.config import (
        InterpolationMode,
        MeshMode,
        ProjectionMode,
        ReconstructionConfig,
    )
    from tests.perspective_scene import pair_cam, render_views

    rng = np.random.RandomState(3)
    views = render_views(rng, [pair_cam()])
    exif = Image.Exif()
    exif[41989] = 43  # FocalLengthIn35mmFilm — 400 px on 320x256 ~ 43 mm
    paths = []
    for i, v in enumerate(views):
        p = os.path.join(td, f"persp_exif{i}.png")
        Image.fromarray(v).save(p, exif=exif)
        paths.append(p)
    cfg = ReconstructionConfig(
        projection=ProjectionMode.PERSPECTIVE,
        interpolation=InterpolationMode.DELAUNAY,
        mesh=MeshMode.VERTEX_COLORS,
        # focal_length=None: K must come from EXIF; BA on by default.
    )
    run(paths, os.path.join(td, "persp_exif_warm.obj"), cfg)
    results = [
        run_full(paths, os.path.join(td, f"persp_exif{i}.obj"), cfg)
        for i in range(n_runs)
    ]
    _, dt, phases = min(results, key=lambda r: r[1])
    return dt, phases


def hires_texture_obj_seconds(td, n_runs=2):
    """BASELINE config #4: a 4032x3024 pair (the reference's max
    practical size, README.md:83) with --max-points and a
    texture-coordinates OBJ through the full pipeline. On by default
    (VERDICT r2 missing #4 — the driver record must carry this number);
    CVTPU_BENCH_HIRES=0 skips it when iterating locally."""
    from cybervision_tpu.config import (
        InterpolationMode,
        MeshMode,
        ProjectionMode,
        ReconstructionConfig,
    )

    p1, p2 = save_pair(td, 3024, 4032)
    cfg = ReconstructionConfig(
        projection=ProjectionMode.AFFINE,
        interpolation=InterpolationMode.DELAUNAY,
        mesh=MeshMode.TEXTURE_COORDINATES,
        max_points=500_000,
    )
    run([p1, p2], os.path.join(td, "hires_warm.obj"), cfg)
    return min(
        run([p1, p2], os.path.join(td, f"hires{i}.obj"), cfg)
        for i in range(n_runs)
    )


def sharded_kernel_on_silicon(td):
    """VERDICT r3 next #3: lower the SHARDED Pallas program (shard_map +
    ppermute halo exchange + pallas_call, ops/pallas_ncc.py
    ncc_sweep_sharded) onto the real TPU via a 1-device mesh and assert
    bit-identity with the unsharded kernel. Interpret-mode CPU tests
    can't catch a lowering/VMA mistake (check_vma=False); this is the
    only hardware validation a one-chip environment permits.

    Returns {"ran": bool, "pallas_under_mesh": bool, "bit_identical":
    bool} for the driver record."""
    from cybervision_tpu.config import CorrelationConfig, ProjectionMode
    from cybervision_tpu.images import SourceImage
    from cybervision_tpu.ops import correlation

    p1, p2 = save_pair(td, 256, 320)
    src1 = SourceImage.load(p1)
    src2 = SourceImage.load(p2)
    f = np.array([[0, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
    cfg = CorrelationConfig()
    os.environ["CVTPU_SHARD_1DEV"] = "1"
    try:
        sharded = correlation.correlate_images(
            src1, src2, f, ProjectionMode.AFFINE, cfg
        )
        plan = dict(correlation._LAST_PLAN)
    finally:
        del os.environ["CVTPU_SHARD_1DEV"]
    single = correlation.correlate_images(
        src1, src2, f, ProjectionMode.AFFINE, cfg
    )
    return {
        "ran": True,
        "pallas_under_mesh": bool(
            plan.get("mesh") and any(plan.get("pallas_levels", []))
        ),
        "bit_identical": bool(np.array_equal(sharded, single)),
    }


def _tpu_alive(timeout_s: int = 150) -> bool:
    """Bounded probe: remote-TPU plugins can HANG device discovery when
    the tunnel is down, so the check runs in a killable subprocess."""
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _maybe_fallback_to_cpu() -> bool:
    """If the remote-TPU plugin is configured but dead, re-exec once on
    the CPU backend so the bench records a (degraded, so-labeled) number
    instead of hanging. Returns True when running in fallback mode."""
    if os.environ.get("CVTPU_BENCH_CPU") == "1":
        return True
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False  # no remote plugin: whatever backend is local works
    if _tpu_alive():
        return False
    print("TPU unreachable; rerunning bench on the CPU backend", file=sys.stderr)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["CVTPU_BENCH_CPU"] = "1"
    os.execve(sys.executable, [sys.executable, *sys.argv], env)
    raise AssertionError("unreachable")


def main():
    import tempfile

    cpu_fallback = _maybe_fallback_to_cpu()

    import jax

    # Persist compiled executables across bench runs — first-run compiles
    # go through the remote TPU compile service (~45 s/program).
    from cybervision_tpu.utils.cache import machine_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/root/repo/.jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cybervision_tpu.config import (
        InterpolationMode,
        MeshMode,
        ProjectionMode,
        ReconstructionConfig,
    )

    cfg_depth = ReconstructionConfig(
        projection=ProjectionMode.AFFINE,
        interpolation=InterpolationMode.NONE,
    )
    cfg_ply = ReconstructionConfig(
        projection=ProjectionMode.AFFINE,
        interpolation=InterpolationMode.DELAUNAY,
        mesh=MeshMode.VERTEX_COLORS,
    )

    if cpu_fallback:
        # Liveness record, not the headline: a 512^2 PLY run on the CPU
        # backend, honestly labeled. One warm-up run first — without it
        # a cold compile cache puts minutes of XLA:CPU compile time into
        # the recorded number whenever kernel code changed since the
        # last run. The TPU metric is unmeasurable with the tunnel down.
        with tempfile.TemporaryDirectory() as td:
            p1, p2 = save_pair(td, 512, 512)
            warm_s = run([p1, p2], os.path.join(td, "warm.ply"), cfg_ply)
            ply_s = run([p1, p2], os.path.join(td, "out.ply"), cfg_ply)
        print(json.dumps({
            "metric": "e2e_512x512_sem_pair_to_ply_mesh_seconds_CPU_FALLBACK",
            "value": round(ply_s, 3),
            "unit": "s",
            "vs_baseline": 0.0,
            "extra": {
                "backend": "cpu-fallback (TPU tunnel unreachable)",
                "cold_seconds": round(warm_s, 3),
            },
        }))
        return 0

    with tempfile.TemporaryDirectory() as td:
        p1, p2 = save_pair(td, 1024, 1024)
        # Warm-up both configs at full size: compiles every
        # (shape, bucket) program once.
        run([p1, p2], os.path.join(td, "warm.png"), cfg_depth)
        run([p1, p2], os.path.join(td, "warm.ply"), cfg_ply)
        # Best of 3: the host vCPU is heavily bursty (20x variance on
        # identical numpy work), so a single sample is meaningless.
        depth_s = min(
            run([p1, p2], os.path.join(td, f"out{i}.png"), cfg_depth)
            for i in range(3)
        )
        # The PLY config carries ~1 s of host-side work (mesh/writer/IO)
        # exposed to the bursty host vCPU (20x swings) — more reps for a
        # stable minimum. The per-phase breakdown of the best run rides
        # along so non-dense regressions are driver-visible.
        ply_runs = [
            run_full([p1, p2], os.path.join(td, f"out{i}.ply"), cfg_ply)
            for i in range(8)
        ]
        _, ply_s, ply_phases = min(ply_runs, key=lambda r: r[1])
        mpix_s, corr_s = correlation_throughput(p1, p2)
        persp_mpix_s, persp_corr_s = correlation_throughput(
            p1, p2, projection=ProjectionMode.PERSPECTIVE
        )
        sfm_s, sfm_failures, sfm_phases = sfm_views_seconds(td, n_views=3)
        sfm5_s, sfm5_failures, sfm5_phases = sfm_views_seconds(
            td, n_views=5, n_runs=2
        )
        # One scaling point beyond 5 views (VERDICT r3 next #10): does
        # anything superlinear hide in recovery order, merge, BA, or
        # occlusion culling?
        sfm6_s, sfm6_failures, sfm6_phases = sfm_views_seconds(
            td, n_views=6, n_runs=1
        )
        persp_pair_s, persp_pair_phases = perspective_pair_exif_obj_seconds(td)
        hires_s = (
            hires_texture_obj_seconds(td)
            if os.environ.get("CVTPU_BENCH_HIRES", "1") != "0"
            else None
        )
        sharded_silicon = sharded_kernel_on_silicon(td)

    result = {
        "metric": "e2e_1024x1024_sem_pair_to_ply_mesh_seconds",
        "value": round(ply_s, 3),
        "unit": "s",
        "vs_baseline": round(2.0 / ply_s, 3),
        "extra": {
            "depth_map_seconds": round(depth_s, 3),
            "dense_correlation_seconds": round(corr_s, 3),
            "dense_correlation_mpix_per_s_per_chip": round(mpix_s, 1),
            "perspective_dense_correlation_seconds": round(persp_corr_s, 3),
            "perspective_dense_correlation_mpix_per_s_per_chip": round(
                persp_mpix_s, 1
            ),
            "phases_ply_seconds": ply_phases,
            "sfm_3view_320x256_to_merged_ply_seconds": round(sfm_s, 3),
            "sfm_3view_pair_failures_per_run": sfm_failures,
            "sfm_3view_phases_seconds": sfm_phases,
            "sfm_5view_320x256_to_merged_ply_seconds": round(sfm5_s, 3),
            "sfm_5view_pair_failures_per_run": sfm5_failures,
            "sfm_5view_phases_seconds": sfm5_phases,
            "sfm_6view_320x256_to_merged_ply_seconds": round(sfm6_s, 3),
            "sfm_6view_pair_failures_per_run": sfm6_failures,
            "sfm_6view_phases_seconds": sfm6_phases,
            "perspective_pair_exif_ba_obj_seconds": round(persp_pair_s, 3),
            "perspective_pair_exif_ba_obj_phases_seconds": persp_pair_phases,
            "ransac_budget": "reference defaults (k=1e6, P3P k=1e5)",
            "sharded_pallas_on_silicon": sharded_silicon,
        },
    }
    if hires_s is not None:
        result["extra"]["hires_4032x3024_texture_obj_seconds"] = round(
            hires_s, 3
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
