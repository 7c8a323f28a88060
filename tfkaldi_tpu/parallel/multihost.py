"""Multi-host (multi-slice / pod) runtime helpers.

The reference is a single Python process (SURVEY §2.2); here each host of
a pod runs the same program: `initialize()` brings up jax.distributed,
each host reads its scp shard (data.sharding), and
`global_batch_from_local()` assembles the host-local padded batch into one
global jax.Array whose batch dim is sharded over the mesh's 'data' axis —
GSPMD then runs the train step SPMD with gradient psums over ICI/DCN.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tfkaldi_tpu.data.batching import PaddedBatch

log = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None) -> None:
    """Bring up the jax.distributed runtime for a manual multi-process
    cluster (TPU pods auto-configure; there this is a no-op).

    MUST be called before any other JAX API — touching the backend first
    (even ``jax.process_count()``) makes ``jax.distributed.initialize``
    raise. Reads ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` when args are not given; without them it does
    nothing (single host).
    """
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num = os.environ.get("JAX_NUM_PROCESSES")
    if not (coord and num):
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(num),
            process_id=int(os.environ.get("JAX_PROCESS_ID", 0)),
        )
    except RuntimeError as e:
        # backend already initialized (or double-call): surface, don't die
        log.warning("jax.distributed.initialize skipped: %s", e)


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
