"""Measure the multi-view SFM finalize split (DLT / outlier filter / BA)
on the bench's rendered scenes — the 6-view triangulation phase went
superlinear (0.965 s @5v -> 2.986 s @6v, BENCH_r04.json) and this
pins which sub-phase grew.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_sfm_finalize.py [n_views ...]
"""
import json
import os
import sys
import tempfile

if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    import bench

    views = [int(a) for a in sys.argv[1:]] or [5, 6]
    out = {}
    with tempfile.TemporaryDirectory() as td:
        for n in views:
            dt, failures, phases = bench.sfm_views_seconds(td, n_views=n, n_runs=2)
            out[f"sfm_{n}view"] = {"total": dt, "phases": phases}
            print(f"sfm_{n}view: {dt:.3f}s {json.dumps(phases)}", flush=True)
    print(json.dumps(out))
