"""A/B the BRIEF sampling pattern (VERDICT r4 next #6): seeded-Gaussian
vs OpenCV's learned bit_pattern_31_ on the bench SFM scenes.

Reports per-pair match counts and full-budget RANSAC inlier counts for
the 6-view scene (whose runs drop one pair per round at the 207-match
floor) plus the perspective pair.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_brief_ab.py
"""
import dataclasses
import sys

import numpy as np

if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cybervision_tpu.config import OrbConfig, ProjectionMode, RansacConfig
    from cybervision_tpu.errors import RansacError
    from cybervision_tpu.ops import epipolar, features, matching
    from tests.perspective_scene import multi_cams, render_views

    rng = np.random.RandomState(3)
    views = render_views(rng, multi_cams(5))  # the 6-view bench scene
    n = len(views)
    rcfg = RansacConfig()

    for pattern in ("gaussian", "opencv"):
        ocfg = OrbConfig(pattern=pattern)
        kps = features.extract_keypoints_pyramid_multi(list(views), ocfg)
        matches_list = []
        pair_ids = []
        for i in range(n):
            for j in range(i + 1, n):
                m = matching.match_keypoints(
                    kps[i][0], kps[i][1], kps[j][0], kps[j][1], 48
                )
                matches_list.append(m)
                pair_ids.append((i, j))
        dims = [320.0] * len(matches_list)
        results = epipolar.find_fundamental_matrix_multi(
            matches_list, ProjectionMode.PERSPECTIVE, dims, rcfg
        )
        rows = []
        fails = 0
        for (i, j), m, r in zip(pair_ids, matches_list, results):
            if isinstance(r, Exception):
                rows.append(f"{i}{j}:m={len(m)},FAIL")
                fails += 1
            else:
                rows.append(f"{i}{j}:m={len(m)},in={r.matches_count}")
        total_m = sum(len(m) for m in matches_list)
        total_in = sum(
            r.matches_count for r in results if not isinstance(r, Exception)
        )
        print(
            f"{pattern:9s} pairs_failed={fails} total_matches={total_m} "
            f"total_inliers={total_in}",
            flush=True,
        )
        print("   ", " ".join(rows), flush=True)
