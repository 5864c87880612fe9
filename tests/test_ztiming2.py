import time
import jax
import jax.numpy as jnp
import numpy as np

def test_timing2():
    rng = np.random.RandomState(0)
    d1 = rng.randint(0, 2**32, (37, 8), dtype=np.uint64).astype(np.uint32)
    d2 = rng.randint(0, 2**32, (53, 8), dtype=np.uint64).astype(np.uint32)
    t0 = time.time()
    from cybervision_tpu.ops import matching
    print(f"import {time.time()-t0:.2f}", flush=True)
    t0 = time.time()
    r = matching.match_descriptors(jnp.asarray(d1), jnp.ones(37, bool), jnp.asarray(d2), jnp.ones(53, bool), 300, chunk=16)
    jax.block_until_ready(r)
    print(f"call1 {time.time()-t0:.2f}", flush=True)
    t0 = time.time()
    x = d1[:, None, :] ^ d2[None, :, :]
    h = np.unpackbits(x.view(np.uint8), axis=-1).sum(axis=-1)
    print(f"oracle {time.time()-t0:.2f} {h.shape}", flush=True)
    t0 = time.time()
    np.testing.assert_array_equal(np.asarray(r[1]), h.min(axis=1))
    print(f"assert {time.time()-t0:.2f}", flush=True)
