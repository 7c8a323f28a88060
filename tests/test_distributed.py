"""REAL multi-process distributed training: two OS processes, each with 2
simulated CPU devices, form one 4-device global mesh via jax.distributed;
each process feeds its own host-local data through
``global_batch_from_local`` and runs the same SPMD train step. Both must
report the identical global loss — the closest validation to a multi-host
TPU pod this sandbox allows."""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, "@REPO@")
    import numpy as np
    from tfkaldi_tpu.parallel import initialize

    pid = int(sys.argv[1])
    os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:@PORT@"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    initialize()
    import jax
    assert jax.process_count() == 2, jax.process_count()

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import DNN, DNNConfig
    from tfkaldi_tpu.parallel import make_mesh, shard_batch, shard_state
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    mesh = make_mesh(data=4, model=1)  # 2 procs x 2 local devices
    rng = np.random.default_rng(100 + pid)  # DIFFERENT data per host
    local_b, t, f = 4, 16, 8
    x = rng.standard_normal((local_b, t, f)).astype(np.float32)
    y = rng.integers(0, 5, (local_b, t)).astype(np.int32)
    batch = shard_batch(
        PaddedBatch(x, y, np.full(local_b, t, np.int32), np.full(local_b, t, np.int32)),
        mesh,
    )
    assert batch.inputs.shape[0] == 8, batch.inputs.shape  # global = 2 x local

    model = DNN(DNNConfig(input_dim=f, num_labels=5, num_hidden_layers=1, num_hidden_units=16))
    tr = Trainer(model, TrainerConfig(init_learning_rate=0.01, num_steps=10))
    st = shard_state(tr.init_state(jax.random.PRNGKey(0)), mesh)
    for i in range(3):
        st, loss = tr.update(st, batch, jax.random.PRNGKey(i))
    print(f"LOSS {float(loss):.8f}", flush=True)
    """
)


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only subprocess test")
def test_two_process_distributed_training(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = 12400 + os.getpid() % 1000
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.replace("@REPO@", repo).replace("@PORT@", str(port)))

    # a clean env: no axon sitecustomize (it would initialize the backend
    # before jax.distributed can), no inherited JAX_* overrides
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_")) and k != "PYTHONPATH"
    }
    env["PYTHONPATH"] = repo
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    losses = [line for out in outs for line in out.splitlines() if line.startswith("LOSS")]
    assert len(losses) == 2
    assert losses[0] == losses[1], losses  # identical global loss on both hosts
