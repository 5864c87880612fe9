"""Sharded wrappers of the hot pipeline stages.

Strategy (see parallel.mesh): annotate input shardings and jit — XLA
inserts the ICI collectives (halo permutes for the sweep's shifted
windows, all-reduces for argmin/argmax winners). These wrappers are used
by the multi-chip dry run and by the pipeline when more than one device
is visible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cybervision_tpu.ops import correlation, epipolar, matching


def sharded_refine_pass(mesh: Mesh, img1, img2, prev, f, scale, cfg_args):
    """Dense refine sweep with image rows sharded over the 'tile' axis.

    The box filters / dynamic shifts need halo rows; jit materializes them
    as collective permutes along 'tile'.
    """
    row_shard = NamedSharding(mesh, P("tile", None))
    img1 = jax.device_put(img1, row_shard)
    img2 = jax.device_put(img2, row_shard)
    prev = jax.tree.map(lambda x: jax.device_put(x, row_shard_for(mesh, x)), prev)
    return correlation.refine_pass(img1, img2, prev, f, scale, *cfg_args)


def row_shard_for(mesh: Mesh, x) -> NamedSharding:
    spec = ["tile"] + [None] * (x.ndim - 1)
    return NamedSharding(mesh, P(*spec))


def sharded_ransac_batch(mesh: Mesh, key, p1, p2, m_valid, **kw):
    """RANSAC with the hypothesis batch sharded over every mesh device.

    Each device samples and scores its slice; the final argmax reduces
    across devices (a tiny all-reduce of (f, count, error)).
    """
    rep = NamedSharding(mesh, P())
    p1 = jax.device_put(p1, rep)
    p2 = jax.device_put(p2, rep)
    m_valid = jax.device_put(m_valid, rep)
    return epipolar.ransac_batch(key, p1, p2, m_valid, **kw)


def sharded_hamming_matmul(mesh: Mesh, desc1, valid1, desc2, valid2, threshold):
    """Descriptor matching with the image-2 table sharded over 'hyp'
    (tensor-parallel contraction) and image-1 rows over 'tile'."""
    d1 = jax.device_put(desc1, NamedSharding(mesh, P("tile", None)))
    d2 = jax.device_put(desc2, NamedSharding(mesh, P("hyp", None)))
    v1 = jax.device_put(valid1, NamedSharding(mesh, P("tile")))
    v2 = jax.device_put(valid2, NamedSharding(mesh, P("hyp")))
    return matching.match_descriptors(d1, v1, d2, v2, threshold, chunk=d1.shape[0])
