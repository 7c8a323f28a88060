"""End-to-end data-parallel training through the Nnet facade on the
8-device CPU mesh (conftest): the production path the reference never had
(SURVEY §2.2 — no distributed runtime), exercised exactly as a multi-chip
TPU host would run it."""

import os
from configparser import ConfigParser

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.synthetic import make_featdir
from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
from tfkaldi_tpu.data.target_normalizers import identity_normalizer
from tfkaldi_tpu.io import ArkReader, ArkWriter
from tfkaldi_tpu.nnet import Nnet


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device mesh")
def test_nnet_trains_on_mesh_and_decodes(tmp_path):
    featdir, alifile, info = make_featdir(
        tmp_path, num_speakers=2, utts_per_speaker=12
    )
    cfg = ConfigParser()
    cfg["directories"] = {"expdir": str(tmp_path / "exp")}
    cfg["nnet"] = {
        "name": "meshnet",
        "context_width": "1",
        "num_hidden_units": "32",
        "num_hidden_layers": "2",
        "add_layer_period": "0",
        "starting_step": "0",
        "nonlin": "relu",
        "l2_norm": "False",
        "dropout": "1",
        "batch_norm": "True",
        "num_epochs": "2",
        "initial_learning_rate": "0.01",
        "learning_rate_decay": "1",
        "batch_size": "8",  # divisible by the 8 mesh devices
        "numutterances_per_minibatch": "-1",
        "valid_batches": "1",
        "valid_frequency": "100",
        "valid_adapt": "False",
        "valid_retries": "0",
        "check_freq": "100",
        "visualise": "False",
    }
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, 8, alifile)
    net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=info["num_labels"])
    state = net.train(disp)
    assert int(state.step) > 0
    # params actually live on the mesh
    w0 = state.params["hidden"][0]["w"]
    assert len(w0.sharding.device_set) == 8

    reader2 = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    with ArkWriter(str(tmp_path / "out.scp"), str(tmp_path / "out.ark")) as w:
        n = net.decode(reader2, w)
    assert n == 24
    r = ArkReader(str(tmp_path / "out.scp"))
    mat = r.read_utt(r.utt_ids[0])
    assert mat.shape[1] == info["num_labels"] and np.isfinite(mat).all()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device mesh")
def test_layerwise_growth_on_mesh():
    """add_layer (depth selector advance + output re-zero incl. Adam slots)
    preserves shardings and trains on the mesh."""
    import numpy as np

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import DNN, DNNConfig
    from tfkaldi_tpu.parallel import make_mesh, shard_batch, shard_state
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    mesh = make_mesh(data=4, model=2)
    model = DNN(
        DNNConfig(
            input_dim=8, num_labels=6, num_hidden_layers=3, num_hidden_units=16,
            layerwise_init=True,
        )
    )
    trainer = Trainer(model, TrainerConfig(init_learning_rate=0.01, num_steps=10))
    state = shard_state(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    rng = np.random.default_rng(0)
    b, t = 8, 12
    batch = shard_batch(
        PaddedBatch(
            rng.standard_normal((b, t, 8)).astype(np.float32),
            rng.integers(0, 6, (b, t)).astype(np.int32),
            np.full(b, t, np.int32),
            np.full(b, t, np.int32),
        ),
        mesh,
    )
    state, l0 = trainer.update(state, batch, jax.random.PRNGKey(1))
    state = trainer.add_layer(state)
    assert int(state.model_state["depth"]) == 1
    # output layer re-zeroed, sharding preserved
    assert float(jnp.sum(jnp.abs(state.params["out"]["w"]))) == 0.0
    assert len(state.params["out"]["w"].sharding.device_set) == 8
    state, l1 = trainer.update(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1))
