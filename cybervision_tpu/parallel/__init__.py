from cybervision_tpu.parallel.mesh import make_mesh, pipeline_mesh
from cybervision_tpu.parallel.sharding import (
    assert_spans_mesh,
    constrain_rows,
    row_sharding,
    shard_rows,
)

__all__ = [
    "make_mesh",
    "pipeline_mesh",
    "assert_spans_mesh",
    "constrain_rows",
    "row_sharding",
    "shard_rows",
]
