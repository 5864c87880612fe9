"""Phase-level profile of the headline 1024^2 PLY run on the live backend.

Runs the bench scene through Reconstruction with phase prints ON (quiet
off), warm caches, best-of-N per phase, so the next optimization target
is visible. Usage:

    PYTHONPATH=/root/repo python tools/profile_e2e.py [N] [--depth]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2
    depth = "--depth" in sys.argv

    import jax

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
    from cybervision_tpu.reconstruction import Reconstruction

    if depth:
        cfg = ReconstructionConfig(
            projection=ProjectionMode.AFFINE,
            interpolation=InterpolationMode.NONE,
        )
        ext = "png"
    else:
        cfg = ReconstructionConfig(
            projection=ProjectionMode.AFFINE,
            interpolation=InterpolationMode.DELAUNAY,
            mesh=MeshMode.VERTEX_COLORS,
        )
        ext = "ply"

    with tempfile.TemporaryDirectory() as td:
        p1, p2 = bench.save_pair(td, 1024, 1024)
        # warm
        rec = Reconstruction([p1, p2], os.path.join(td, f"warm.{ext}"), cfg, quiet=True)
        rec.run()
        for i in range(n):
            print(f"=== run {i} ===", flush=True)
            rec = Reconstruction(
                [p1, p2], os.path.join(td, f"out{i}.{ext}"), cfg, quiet=False
            )
            t0 = time.time()
            rec.run()
            print(f"TOTAL {time.time() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
