"""Regenerate tests/fixtures/golden_dense.npz: the literal-oracle
(reference-semantics, correlation/mod.rs:217-624) dense-correlation result
for the golden scene. Run from the repo root:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -m tests.gen_golden_fixture

Takes a few minutes (the oracle is per-pixel Python). The fixture is
committed so CI never pays this cost.
"""

import os
import time

import numpy as np

from cybervision_tpu.config import pyramid_scales
from cybervision_tpu.images import resize_lanczos

from . import oracle_correlation as oc
from .golden_scene import F_HSHIFT, SCALE_MIN_SIZE, golden_scene


def main():
    img1, img2, _ = golden_scene()
    h, w = img1.shape
    scales = pyramid_scales((w, h), SCALE_MIN_SIZE)
    print(f"oracle run at {w}x{h}, scales {scales} ...")
    t0 = time.time()
    state = oc.correlate_images_oracle(
        img1, img2, F_HSHIFT, scales, resize_lanczos
    )
    print(f"done in {time.time() - t0:.1f}s; {state['valid'].sum()} matches")
    out = os.path.join(os.path.dirname(__file__), "fixtures", "golden_dense.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        pos_x=state["pos_x"].astype(np.int32),
        pos_y=state["pos_y"].astype(np.int32),
        valid=state["valid"],
        corr=state["corr"],
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
