"""Time-Delay Neural Network acoustic model (beyond the reference).

Kaldi's production hybrid acoustic models are nnet3 TDNNs — stacked
layers that each see a small set of time offsets of the layer below
(Peddinti et al., 2015; Kaldi egs wsj/s5 tdnn recipes). The reference
repo predates them (its only model is the 6×2048 MLP over input splicing,
classifiers/dnn.py), so a user migrating from the reference to Kaldi-era
recipes needs this family; it slots into the same ``Classifier`` seam
(`model = tdnn` in ``[nnet]``) and trains/decodes through the unchanged
trainer/controller/decoder.

TPU-first design: a TDNN layer is
``relu(maskedBN(concat_{o in offsets} shift(h, o) @ W + b))`` where the
shifts are STATIC pad+slice ops (no gather, no scan) and the concat+matmul
is one ``[B·T, n_off·H] × [n_off·H, H]`` MXU contraction — the whole
network is dense matmul work with static shapes, so it runs at DNN-class
throughput on sequence inputs (unlike the LSTM's latency-bound
recurrence). Sub-sampling (strided offsets like Kaldi's ``{-3,0,3}``) is
expressed directly in the per-layer offset lists.

Edge handling: shifts fill with ZEROS beyond the utterance edges — the
same convention as this framework's input splicing
(feature_reader.py:117-156 zero-pads context at utterance boundaries), so
every utterance in a padded batch sees identical edge semantics
regardless of its padded length. Activations are re-masked between layers
so clamped/padded frames stay inert; padding frames never reach BN
statistics (masked moments) or the loss (masked CE).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.models.dnn import _masked_batchnorm, _nonlin

Params = Any


def parse_context(spec: str, num_layers: int) -> tuple[tuple[int, ...], ...]:
    """Parse a per-layer offset spec like ``"-2,-1,0,1,2;-1,0,1;-3,0,3;0"``.

    Layers beyond the spec reuse its last entry; a single entry applies to
    every layer (Kaldi xconfig-style shorthand)."""
    groups = [g for g in spec.replace(" ", "").split(";") if g]
    if not groups:
        raise ValueError("empty tdnn context spec")
    offsets = []
    for g in groups:
        offs = tuple(int(tok) for tok in g.split(","))
        if not offs:
            raise ValueError(f"empty offset group in {spec!r}")
        offsets.append(offs)
    while len(offsets) < num_layers:
        offsets.append(offsets[-1])
    return tuple(offsets[:num_layers])


@dataclasses.dataclass(frozen=True)
class TDNNConfig:
    input_dim: int
    num_labels: int
    num_hidden_layers: int = 5
    num_hidden_units: int = 512
    # per-layer time offsets; the default mirrors Kaldi's classic wsj
    # tdnn recipe shape (growing receptive field with sub-sampled splices)
    context: str = "-2,-1,0,1,2;-1,0,1;-1,0,1;-3,0,3;-3,0,3"
    nonlin: str = "relu"
    batch_norm: bool = True
    dropout: float = 1.0  # keep probability (reference dropout semantics)
    compute_dtype: Any = jnp.float32
    bn_eps: float = 1e-3
    bn_decay: float = 0.999

    @classmethod
    def from_config(cls, conf: dict, input_dim: int, num_labels: int) -> "TDNNConfig":
        return cls(
            input_dim=input_dim,
            num_labels=num_labels,
            num_hidden_layers=int(conf.get("num_hidden_layers", 5)),
            num_hidden_units=int(conf.get("num_hidden_units", 512)),
            context=conf.get("tdnn_context", cls.context),
            nonlin=conf.get("nonlin", "relu"),
            batch_norm=str(conf.get("batch_norm", "True")) == "True",
            dropout=float(conf.get("dropout", 1)),
            compute_dtype=jnp.dtype(conf.get("compute_dtype", "float32")),
        )

    @property
    def offsets(self) -> tuple[tuple[int, ...], ...]:
        return parse_context(self.context, self.num_hidden_layers)


def _shift(x: jnp.ndarray, offset: int) -> jnp.ndarray:
    """``y[:, t] = x[:, t + offset]`` with zero fill at the edges, [B, T, F]
    (a static pad+slice — no gather)."""
    if offset == 0:
        return x
    if offset > 0:
        return jnp.pad(x[:, offset:], ((0, 0), (0, offset), (0, 0)))
    return jnp.pad(x[:, :offset], ((0, 0), (-offset, 0), (0, 0)))


class TDNN:
    """Stateless model object: owns the config, provides init/apply
    (the shared Classifier contract — models/__init__.py)."""

    def __init__(self, config: TDNNConfig):
        self.config = config

    @property
    def left_receptive(self) -> int:
        """Input frames BEFORE t that output t depends on (the summed
        negative context reach). Used by the windowed streaming emitter
        (decode/online.py::OnlineWindowedDecoder)."""
        return sum(max(0, -min(layer)) for layer in self.config.offsets)

    @property
    def right_receptive(self) -> int:
        """Input frames AFTER t that output t depends on."""
        return sum(max(0, max(layer)) for layer in self.config.offsets)

    # ------------------------------------------------------------------

    def init(self, rng: jax.Array) -> tuple[Params, Params]:
        cfg = self.config
        offsets = cfg.offsets
        keys = jax.random.split(rng, cfg.num_hidden_layers)
        layers = []
        fan_in = cfg.input_dim
        for l in range(cfg.num_hidden_layers):
            in_dim = fan_in * len(offsets[l])
            std = 1.0 / np.sqrt(in_dim)
            layer = {
                "w": (jax.random.normal(keys[l], (in_dim, cfg.num_hidden_units)) * std).astype(
                    jnp.float32
                ),
                "b": jnp.zeros((cfg.num_hidden_units,), jnp.float32),
            }
            if cfg.batch_norm:
                layer["beta"] = jnp.zeros((cfg.num_hidden_units,), jnp.float32)
            layers.append(layer)
            fan_in = cfg.num_hidden_units
        params = {
            "hidden": layers,
            # zero-init output layer (reference dnn.py:67-68 semantics)
            "out": {
                "w": jnp.zeros((cfg.num_hidden_units, cfg.num_labels), jnp.float32),
                "b": jnp.zeros((cfg.num_labels,), jnp.float32),
            },
        }
        state: dict[str, Any] = {"depth": jnp.asarray(0, jnp.int32)}
        if cfg.batch_norm:
            state["bn_mean"] = jnp.zeros((cfg.num_hidden_layers, cfg.num_hidden_units), jnp.float32)
            state["bn_var"] = jnp.ones((cfg.num_hidden_layers, cfg.num_hidden_units), jnp.float32)
        return params, state

    def reinit_output_layer(self, params: Params) -> Params:
        out = {
            "w": jnp.zeros_like(params["out"]["w"]),
            "b": jnp.zeros_like(params["out"]["b"]),
        }
        return {**params, "out": out}

    # ------------------------------------------------------------------

    def apply(
        self,
        params: Params,
        state: Params,
        inputs: jnp.ndarray,  # [B, T, F] float32
        seq_lengths: jnp.ndarray,  # [B] int32
        *,
        train: bool,
        dropout_rng: jax.Array | None = None,
    ) -> tuple[jnp.ndarray, Params]:
        cfg = self.config
        b, t, _ = inputs.shape
        mask_bt = (jnp.arange(t)[None, :] < seq_lengths[:, None]).astype(jnp.float32)
        mask = mask_bt.reshape(b * t, 1)

        new_state = dict(state)
        # zero the padding rows BEFORE the first splice: the first layer's
        # positive shifts read input rows beyond each row's length, and
        # unmasked those leak padding CONTENT into the last
        # right_receptive valid frames (found by the streaming-equality
        # harness; the CNN already masks its input the same way)
        h = (inputs * mask_bt[:, :, None]).astype(cfg.compute_dtype)
        for l, layer in enumerate(params["hidden"]):
            offs = cfg.offsets[l]
            # static splice over time offsets, then ONE MXU contraction
            spliced = (
                jnp.concatenate([_shift(h, o) for o in offs], axis=-1)
                if len(offs) > 1 or offs[0] != 0
                else h
            )
            z = jax.lax.dot_general(
                spliced.reshape(b * t, -1),
                layer["w"].astype(cfg.compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            z = (z + layer["b"].astype(jnp.float32)).astype(cfg.compute_dtype)
            if cfg.batch_norm:
                z, new_mean, new_var = _masked_batchnorm(
                    z, mask, layer["beta"], state["bn_mean"][l], state["bn_var"][l],
                    train=train, eps=cfg.bn_eps, decay=cfg.bn_decay,
                )
                if train:
                    new_state["bn_mean"] = new_state["bn_mean"].at[l].set(new_mean)
                    new_state["bn_var"] = new_state["bn_var"].at[l].set(new_var)
            z = _nonlin(z, cfg.nonlin)
            if train and cfg.dropout < 1:
                if dropout_rng is None:
                    raise ValueError("dropout requires dropout_rng in training mode")
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, l), cfg.dropout, z.shape
                )
                z = jnp.where(keep, z / cfg.dropout, 0.0)
            # zero padding frames between layers so edge-clamped shifts of
            # the NEXT layer never read stale values from beyond the
            # utterance (the clamp repeats real frames only within T; the
            # masked region must stay inert for padding-invariance)
            z = z.reshape(b, t, -1) * mask_bt[:, :, None].astype(z.dtype)
            h = z

        logits = jax.lax.dot_general(
            h.reshape(b * t, -1).astype(cfg.compute_dtype),
            params["out"]["w"].astype(cfg.compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = (logits + params["out"]["b"]).astype(jnp.float32)
        return logits.reshape(b, t, cfg.num_labels), new_state
