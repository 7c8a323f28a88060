"""Parallelism: device meshes and sharding rules.

The reference has no distributed runtime at all (one ``tf.Session`` on one
device; SURVEY §2.2). Here scaling is mesh-native: a ``jax.sharding.Mesh``
with a ``data`` axis (batch parallelism — replaces the reference's
sequential gradient-accumulation memory workaround) and a ``model`` axis
(tensor parallelism over the hidden dimension). Shardings are declared on
the state/batch pytrees and GSPMD inserts the collectives (psum of grads
over ``data``, activation collectives over ``model``) on ICI.
"""

from tfkaldi_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_state,
    state_shardings,
)
from tfkaldi_tpu.parallel.multihost import global_batch_from_local, initialize

__all__ = [
    "make_mesh",
    "batch_sharding",
    "state_shardings",
    "shard_batch",
    "shard_state",
    "global_batch_from_local",
    "initialize",
]
