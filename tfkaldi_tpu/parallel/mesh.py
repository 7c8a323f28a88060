"""Mesh construction and sharding rules for DNN training.

Layout:

- ``data`` axis: batch dimension of inputs/targets/lengths; gradients are
  psum-reduced across it by GSPMD (the TPU-native replacement for the
  reference's microbatch accumulation loop, trainer.py:310-332).
- ``model`` axis: hidden dimension of the MLP stack. Hidden weights
  ``[in, H]`` are column-sharded ``P(None, 'model')``, biases/BN state
  ``P('model')``, the output layer ``[H, O]`` row-sharded
  ``P('model', None)`` so its matmul reduces over the sharded hidden dim
  with one psum per step.

Replicated scalars (step, lr_fact) use ``P()``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tfkaldi_tpu.train.trainer import TrainState


def make_mesh(devices=None, data: int | None = None, model: int = 1) -> Mesh:
    """Build a ``(data, model)`` mesh over ``devices``.

    Defaults: all devices on the data axis. ``data=None`` infers
    ``len(devices)//model``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(f"{data}x{model} mesh != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs/targets/lengths: batch dim over ``data``."""
    return NamedSharding(mesh, P("data"))


def _param_shardings(params: Any, mesh: Mesh) -> Any:
    def ns(spec):
        return NamedSharding(mesh, spec)

    if "blocks" in params:
        # transformer/conformer: Megatron-style split — attention heads
        # (qkv columns / output rows) and the FFN up/down projections
        # shard over 'model'; LN, conv module and biases-of-row-sharded
        # matmuls replicate
        def block_sh(blk):
            sh = jax.tree.map(lambda _: ns(P()), blk)
            for f in ("ffn", "ffn1"):
                if f in blk:
                    sh[f] = {
                        "w1": ns(P(None, "model")), "b1": ns(P("model")),
                        "w2": ns(P("model", None)), "b2": ns(P()),
                    }
            sh["attn"] = {
                "wq": ns(P(None, "model")), "bq": ns(P("model")),
                "wk": ns(P(None, "model")), "bk": ns(P("model")),
                "wv": ns(P(None, "model")), "bv": ns(P("model")),
                "wo": ns(P("model", None)), "bo": ns(P()),
            }
            return sh

        return {
            "in_proj": jax.tree.map(lambda _: ns(P()), params["in_proj"]),
            "blocks": [block_sh(blk) for blk in params["blocks"]],
            "ln_final": jax.tree.map(lambda _: ns(P()), params["ln_final"]),
            "out": {"w": ns(P()), "b": ns(P())},
        }

    if "hidden" not in params:
        # non-DNN models (e.g. the LSTM, whose 4H gate blocks interleave
        # i/f/g/o): replicate params — they train data-parallel, grads
        # psum over 'data'
        return jax.tree.map(lambda _: ns(P()), params)

    hidden = []
    for _ in params["hidden"]:
        layer = {"w": ns(P(None, "model")), "b": ns(P("model"))}
        if "beta" in params["hidden"][0]:
            layer["beta"] = ns(P("model"))
        hidden.append(layer)
    sh = {
        "hidden": hidden,
        "out": {"w": ns(P("model", None)), "b": ns(P())},
    }
    if not params["hidden"]:
        # dense-stack-free CNN: out reads the conv features directly
        sh["out"] = {"w": ns(P()), "b": ns(P())}
    if "conv" in params:
        # CNN frontend: small filter tensors replicate (channel counts
        # rarely divide the model axis); the dense stack shards as above
        sh["conv"] = jax.tree.map(lambda _: ns(P()), params["conv"])
    return sh


def state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """A TrainState-shaped pytree of NamedShardings."""

    def ns(spec):
        return NamedSharding(mesh, spec)

    params_sh = _param_shardings(state.params, mesh)

    def model_state_shardings(ms):
        out = {}
        for key, val in ms.items():
            if isinstance(val, dict):
                # nested sub-state (e.g. the transducer's {"enc": ...})
                out[key] = model_state_shardings(val)
            elif key == "depth":
                out[key] = ns(P())
            elif key.startswith("bn_conv"):
                # per-conv-layer channel stats: replicate (see conv params)
                out[key] = jax.tree.map(lambda _: ns(P()), val)
            else:  # bn_mean / bn_var: [L, H] over model
                out[key] = ns(P(None, "model"))
        return out

    model_state_sh = model_state_shardings(state.model_state)
    return TrainState(
        step=ns(P()),
        lr_fact=ns(P()),
        params=params_sh,
        model_state=model_state_sh,
        adam_m=params_sh,
        adam_v=params_sh,
        adam_t=ns(P()),
        rng=ns(P()),
    )


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState onto the mesh with the standard shardings."""
    shardings = state_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, shardings)


def shard_batch(batch, mesh: Mesh):
    """Place a PaddedBatch onto the mesh, batch dim over ``data``.

    Multi-process: each host's batch is its *local* shard, so assembly
    goes through ``jax.make_array_from_process_local_data`` (device_put of
    differing per-host arrays onto a global sharding would silently build
    an inconsistent global batch). Single-process: plain device_put.
    """
    if jax.process_count() > 1:
        from tfkaldi_tpu.parallel.multihost import global_batch_from_local

        return global_batch_from_local(batch, mesh)
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), batch)
