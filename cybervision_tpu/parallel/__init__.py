from cybervision_tpu.parallel.mesh import make_mesh
from cybervision_tpu.parallel.sharding import (
    sharded_hamming_matmul,
    sharded_ransac_batch,
    sharded_refine_pass,
)

__all__ = [
    "make_mesh",
    "sharded_hamming_matmul",
    "sharded_ransac_batch",
    "sharded_refine_pass",
]
