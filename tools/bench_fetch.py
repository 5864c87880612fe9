"""Measure the headline device->host word-grid fetch over the TPU tunnel.

VERDICT r4 next #3: the 1024^2 headline spends 0.258 s (33% of e2e) in
one np.asarray of the 4 MB compact correlation word grid
(reconstruction.py `Fetched correlation grid`). This tool separates the
three candidate costs:
  1. residual DEVICE COMPUTE still running when the fetch is issued
     (the dense timer only covers the async dispatch),
  2. tunnel LATENCY (fixed per-fetch round-trip),
  3. tunnel BANDWIDTH (per-byte),
by timing a 1-element fetch (completion + latency), then fetches of
1/2/4 MB payloads derived from the same grid (slope = bandwidth,
intercept = latency), then chunked row-block fetches (does splitting
pay its extra latencies?).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_fetch.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cybervision_tpu.config import CorrelationConfig, ProjectionMode
    from cybervision_tpu.images import SourceImage
    from cybervision_tpu.ops import correlation
    from cybervision_tpu.utils.cache import machine_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/root/repo/.jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
    from bench import save_pair

    td = tempfile.mkdtemp()
    p1, p2 = save_pair(td, 1024, 1024)
    src1 = SourceImage.load(p1)
    src2 = SourceImage.load(p2)
    f = np.array([[0, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
    cfg = CorrelationConfig()

    def correlate():
        return correlation.correlate_images(
            src1, src2, f, ProjectionMode.AFFINE, cfg, device_out="word"
        )

    # Warm every program + the first-fetch path (first fetch in a
    # process can take minutes on the tunnel).
    w = correlate()
    np.asarray(w)

    out = {}

    def best(fn, n=5):
        return min(fn() for _ in range(n))

    # --- 1. residual device compute: dispatch, then time a 1-element
    # fetch (device completion + one latency).
    def completion():
        word = correlate()
        t0 = time.time()
        np.asarray(jax.device_get(word[:1, :1]))
        return time.time() - t0

    out["dispatch_to_completion_plus_latency_s"] = round(best(completion), 4)

    # --- 2. pure latency: 1-element fetch of an ALREADY-COMPLETE array.
    word = correlate()
    np.asarray(jax.device_get(word[:1, :1]))  # force completion

    def tiny():
        t0 = time.time()
        np.asarray(jax.device_get(word[:1, :1]))
        return time.time() - t0

    out["latency_1elem_s"] = round(best(tiny, 10), 4)

    # --- 3. bandwidth curve: 1/2/4 MB payloads from the complete grid.
    # jax.Array caches its host copy after the first np.asarray, so each
    # timed fetch must be a FRESH device array: a trivial jit (x + i)
    # produces one per rep (its device cost is ~0; completion is forced
    # by a 1-element fetch before the clock starts... which would cache
    # a scalar only, not the full array).
    mk8 = jax.jit(lambda x, i: ((x + i) & 0xFF).astype(jnp.uint8))
    mk16 = jax.jit(lambda x, i: ((x + i) & 0xFFFF).astype(jnp.uint16))
    mk32 = jax.jit(lambda x, i: x + i)
    for name, mk in [("1MB_u8", mk8), ("2MB_u16", mk16), ("4MB_i32", mk32)]:
        def fetch(mk=mk, _i=[0]):
            _i[0] += 1
            arr = mk(word, _i[0])
            np.asarray(jax.device_get(arr[:1, :1]))  # force completion
            t0 = time.time()
            np.asarray(arr)
            return time.time() - t0

        fetch()  # warm the mk program
        out[f"fetch_{name}_s"] = round(best(fetch), 4)

    b1 = out["fetch_1MB_u8_s"]
    b4 = out["fetch_4MB_i32_s"]
    if b4 > b1:
        out["bandwidth_MB_per_s"] = round(3.0 / (b4 - b1), 1)
        out["implied_latency_s"] = round(b1 - 1.0 / (3.0 / (b4 - b1)), 4)

    # --- 4. chunked fetch of the full 4 MB: k row blocks, all copies
    # STARTED async before any is collected (overlap across chunks?).
    split = jax.jit(
        lambda x, i: [x[j::4] + i for j in range(4)]
    )
    for k in (2, 4, 8):
        mkk = jax.jit(
            lambda x, i, k=k: [x[j::k] + i for j in range(k)]
        )

        def fetch_chunks(mkk=mkk, _i=[0]):
            _i[0] += 1
            cs = mkk(word, _i[0])
            np.asarray(jax.device_get(cs[0][:1, :1]))
            t0 = time.time()
            for c in cs:
                c.copy_to_host_async()
            got = [np.asarray(c) for c in cs]
            assert got[0] is not None
            return time.time() - t0

        fetch_chunks()
        out[f"fetch_4MB_in_{k}_chunks_s"] = round(best(fetch_chunks), 4)

    # --- 5. async copy: does copy_to_host_async return before the
    # transfer finishes (usable for fetch/compute overlap)?
    def fetch_async(_i=[0]):
        _i[0] += 1
        arr = mk32(word, _i[0])
        np.asarray(jax.device_get(arr[:1, :1]))
        t0 = time.time()
        arr.copy_to_host_async()
        t_issue = time.time() - t0
        np.asarray(arr)
        return time.time() - t0, t_issue

    fetch_async()
    tot, iss = min(fetch_async() for _ in range(5))
    out["fetch_async_total_s"] = round(tot, 4)
    out["fetch_async_issue_s"] = round(iss, 4)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
