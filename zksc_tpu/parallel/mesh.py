"""Device-mesh sharding for the prover (the distribution layer the reference
lacks — SURVEY.md §2.6: MSM data parallelism across chips, batch-parallel
proof streams).

Design: the MSM/ladder kernels in ops.ec are pure jnp programs over arrays
whose last axis is the point-lane axis. Sharding that axis over a 1-D mesh
and calling the same jitted kernels makes XLA GSPMD insert the collectives
(the roll-based tree reduction becomes collective-permutes over ICI); no
kernel changes are needed. This module provides the mesh + placement helpers.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ec import JacPoint

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def lane_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [L, N] limb arrays: shard the lane (last) axis."""
    return NamedSharding(mesh, P(None, SHARD_AXIS))


def bits_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [n_bits, N] scalar-bit arrays."""
    return NamedSharding(mesh, P(None, SHARD_AXIS))


def shard_jac(pt: JacPoint, mesh: Mesh) -> JacPoint:
    """Place a JacPoint batch with its lane axis sharded over the mesh."""
    sh = lane_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), pt)


def shard_bits(bits, mesh: Mesh):
    return jax.device_put(bits, bits_sharding(mesh))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
