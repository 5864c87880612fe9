"""A/B end-to-end fetch strategies for the headline word-grid readback.

Variants (all timed dispatch -> host bytes ready, best of 5 warm):
  A. current: correlate(device_out="word") -> np.asarray
  B. same + copy_to_host_async issued first
  C. 8 row-interleaved chunks, all copies started async, then collected
  D. packed u16 delta plane (dx,dy vs pixel position, 7 bits each +
     valid) = 2 MB instead of 4, async chunked, host unpack to the word
  E. D but 4 chunks

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_fetch2.py
"""

import json
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

    h = 1024

    @jax.jit
    def pack_delta(word):
        # word: (H, W) int32 = x2 | y2<<12 | valid<<24.
        x2 = word & 0xFFF
        y2 = (word >> 12) & 0xFFF
        v = (word >> 24) & 1
        col = jnp.arange(word.shape[1], dtype=jnp.int32)[None, :]
        row = jnp.arange(word.shape[0], dtype=jnp.int32)[:, None]
        dx = x2 - col
        dy = y2 - row
        ok = jnp.all(
            (v == 0) | ((jnp.abs(dx) <= 63) & (jnp.abs(dy) <= 63))
        )
        packed = (
            ((dx + 64) & 0x7F) | (((dy + 64) & 0x7F) << 7) | (v << 14)
        ).astype(jnp.uint16)
        return packed, ok

    def unpack_delta(packed):
        p = packed.astype(np.int32)
        dx = (p & 0x7F) - 64
        dy = ((p >> 7) & 0x7F) - 64
        v = (p >> 14) & 1
        col = np.arange(p.shape[1], dtype=np.int32)[None, :]
        row = np.arange(p.shape[0], dtype=np.int32)[:, None]
        return ((col + dx) & 0xFFF) | (((row + dy) & 0xFFF) << 12) | (v << 24)

    def chunked(arr, k):
        return jax.jit(lambda x, k=k: [x[j::k] for j in range(k)])(arr)

    def collect(chunks, dtype, w=1024):
        k = len(chunks)
        for c in chunks:
            c.copy_to_host_async()
        out = np.empty((h, w), dtype)
        for j, c in enumerate(chunks):
            out[j::k] = np.asarray(c)
        return out

    variants = {}

    def va():
        word = correlate()
        t0 = time.time()
        r = np.asarray(word)
        return time.time() - t0, r

    def vb():
        word = correlate()
        t0 = time.time()
        word.copy_to_host_async()
        r = np.asarray(word)
        return time.time() - t0, r

    def vc():
        word = correlate()
        t0 = time.time()
        r = collect(chunked(word, 8), np.int32)
        return time.time() - t0, r

    def vd(k=8):
        word = correlate()
        t0 = time.time()
        packed, ok = pack_delta(word)
        pr = collect(chunked(packed, k), np.uint16)
        assert bool(ok)
        r = unpack_delta(pr)
        return time.time() - t0, r

    def ve():
        return vd(4)

    ref = None
    for name, fn in [("A_asarray", va), ("B_async", vb),
                     ("C_chunk8", vc), ("D_delta_u16_chunk8", vd),
                     ("E_delta_u16_chunk4", ve)]:
        fn()  # warm
        best, r = min((fn() for _ in range(5)), key=lambda t: t[0])
        if ref is None:
            ref = r
        else:
            # Invalid pixels carry garbage positions that 7-bit deltas
            # wrap; every consumer checks the valid bit first, so
            # compare valid-masked words only.
            v = (ref >> 24) & 1
            assert np.array_equal(ref * v, r * ((r >> 24) & 1)), name
            assert np.array_equal(v, (r >> 24) & 1), name
        variants[name] = round(best, 4)

    print(json.dumps(variants, indent=2))


if __name__ == "__main__":
    main()
