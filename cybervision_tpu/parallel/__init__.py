from cybervision_tpu.parallel.mesh import active_platform, pipeline_mesh
from cybervision_tpu.parallel.sharding import (
    assert_spans_mesh,
    constrain_rows,
    row_sharding,
    shard_rows,
)

__all__ = [
    "pipeline_mesh",
    "active_platform",
    "assert_spans_mesh",
    "constrain_rows",
    "row_sharding",
    "shard_rows",
]
