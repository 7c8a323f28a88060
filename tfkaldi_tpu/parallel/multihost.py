"""Multi-host (multi-slice / pod) runtime helpers.

The reference is a single Python process (SURVEY §2.2); here each host of
a pod runs the same program: `initialize()` brings up jax.distributed,
each host reads its scp shard (data.sharding), and
`global_batch_from_local()` assembles the host-local padded batch into one
global jax.Array whose batch dim is sharded over the mesh's 'data' axis —
GSPMD then runs the train step SPMD with gradient psums over ICI/DCN.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tfkaldi_tpu.data.batching import PaddedBatch


def initialize(coordinator_address: str | None = None) -> None:
    """Bring up the jax.distributed runtime if running multi-process.

    No-op single-process or when already initialized. On TPU pods the
    coordinator/process env comes from the TPU metadata, so bare
    ``initialize()`` is enough; explicit args are for manual clusters.
    """
    if jax.process_count() > 1:
        return  # already initialized
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num = os.environ.get("JAX_NUM_PROCESSES")
    if coord and num:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(num),
            process_id=int(os.environ.get("JAX_PROCESS_ID", 0)),
        )
    # else: single host, or TPU pod auto-config via jax.distributed.initialize()
    # at program start — nothing to do here.


def global_batch_from_local(batch: PaddedBatch, mesh: Mesh) -> PaddedBatch:
    """Host-local ``PaddedBatch`` → global batch sharded over 'data'.

    Every host contributes its local utterances; the global batch size is
    ``local_b × process_count``. All hosts must use the same padded
    lengths — callers pin ``DeviceBatcher(fixed_input_length=...)`` (or a
    shared bucket schedule) so shapes agree without communication.
    """
    sharding = NamedSharding(mesh, P("data"))

    def to_global(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return PaddedBatch(
        to_global(batch.inputs),
        to_global(batch.targets),
        to_global(batch.input_lengths),
        to_global(batch.target_lengths),
    )
