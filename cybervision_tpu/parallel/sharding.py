"""Generic sharding utilities used by the pipeline's hot stages.

The reference is single-process/single-device; multi-chip scaling is this
framework's own axis (SURVEY.md §2 "Distributed backend"). The recipe is
the standard XLA one: annotate shardings on a named mesh and let GSPMD
insert the ICI collectives. Consumers:

  * ops.epipolar.find_fundamental_matrix — shard_map's the RANSAC
    hypothesis batch over 'dev' (data parallel; tiny cross-device winner
    reduce), via ransac shards built with these helpers.
  * ops.correlation.correlate_images — device_put's the image pyramid
    row-sharded and constrains every pyramid-level array with
    constrain_rows; the sweep's shifted windows make GSPMD materialize
    halo collective-permutes along 'dev'.
  * ops.matching.match_descriptors_sharded — shards the image-2
    descriptor table over 'dev' (tensor-parallel contraction) and
    combines per-device argmins.

This module is ops-free on purpose: the pipeline modules own their
sharded variants and call these primitives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def row_sharding(mesh: Mesh, ndim: int, axis: str = "dev") -> NamedSharding:
    """NamedSharding splitting the leading axis over the mesh axis."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_rows(mesh: Mesh, tree, axis: str = "dev"):
    """device_put every array leaf with its leading axis sharded."""
    return jax.tree.map(
        lambda x: jax.device_put(x, row_sharding(mesh, x.ndim, axis)), tree
    )


def constrain_rows(mesh: Mesh, tree, axis: str = "dev"):
    """with_sharding_constraint (inside jit) pinning leading-axis sharding
    on every leaf; identity outside a mesh (mesh is None)."""
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, row_sharding(mesh, x.ndim, axis)
        ),
        tree,
    )


def assert_spans_mesh(x, mesh: Mesh) -> None:
    """Raise unless x's committed sharding covers every mesh device —
    the guard the multi-chip tests and dryrun use so the pipeline can't
    silently fall back to one device."""
    sharding = getattr(x, "sharding", None)  # numpy arrays have none —
    # the most common silent-fallback product must hit the clear message.
    devs = getattr(sharding, "device_set", None)
    want = set(mesh.devices.flat)
    if devs is None or not want.issubset(devs):
        raise AssertionError(
            f"array sharding {sharding} does not span the {mesh} mesh"
        )
