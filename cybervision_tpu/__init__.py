"""cybervision-tpu: a TPU-native photogrammetry framework.

A brand-new JAX / XLA / Pallas implementation of the capabilities of
zlogic/cybervision (reference: /root/reference, v0.20.3): 3D surface
reconstruction from SEM stereopairs (parallel projection) and multi-photo
perspective structure-from-motion.

Pipeline (reference: src/reconstruction.rs:198-321):
    load images + EXIF -> ORB sparse features -> Hamming matching ->
    RANSAC fundamental matrix -> (perspective: camera pose recovery) ->
    coarse-to-fine dense epipolar NCC correlation -> track building ->
    multi-view triangulation -> outlier filtering -> bundle adjustment ->
    Delaunay meshing -> OBJ / PLY / PNG depth-map output.

TPU-first design decisions (not a port):
  * images are device-resident jnp arrays; per-pixel loops become
    vectorized array ops / Pallas kernels
  * the dense correlator runs as hypothesis-sweep NCC (warp + blocked
    box-filter + running argmax) instead of per-thread corridor walks
  * RANSAC runs thousands of hypotheses as a device batch axis
  * multi-chip scaling shards hypothesis/tile batches over a
    jax.sharding.Mesh (see cybervision_tpu.parallel)
"""

import jax as _jax

# Geometry solvers (pose recovery, bundle adjustment) use float64 on the CPU
# backend; TPU arrays are explicitly float32/bfloat16 throughout.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from cybervision_tpu.config import (  # noqa: E402
    CorrelationConfig,
    HardwareMode,
    InterpolationMode,
    MeshMode,
    OrbConfig,
    ProjectionMode,
    RansacConfig,
    ReconstructionConfig,
)

__all__ = [
    "CorrelationConfig",
    "HardwareMode",
    "InterpolationMode",
    "MeshMode",
    "OrbConfig",
    "ProjectionMode",
    "RansacConfig",
    "ReconstructionConfig",
    "__version__",
]
