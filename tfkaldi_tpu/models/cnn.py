"""Convolutional acoustic model (beyond the reference).

The 2D-conv-over-(time, freq) frontend + dense stack is the other classic
Kaldi-era hybrid family (Sainath et al., 2013 "Deep convolutional neural
networks for LVCSR"; Kaldi's wsj/swbd cnn recipes). The reference repo
predates it (its only model is the spliced MLP, classifiers/dnn.py), so
it slots into the same ``Classifier`` seam (`model = cnn` in ``[nnet]``)
and trains/decodes through the unchanged trainer/controller/decoder.

TPU-first design:

- Convolutions are ``lax.conv_general_dilated`` NHWC×HWIO with N=batch,
  H=time, W=mel-frequency, C=channels — XLA lowers these straight onto
  the MXU as implicit-GEMM; every shape is static.
- The input splicing the pipeline already does (feature_reader.py
  zero-padded context copies) is reshaped into the conv input's CHANNEL
  axis: ``[B, T, S·F] → [B, T(H), F(W), S(C)]`` where S = 2·context+1
  copies. Offset copies of the same mel band are exactly what a conv
  channel is; no data moves, just a view change. With
  ``context_width = 0`` the input is single-channel.
- Time padding is SAME with zero fill — identical edge semantics to the
  splicing/TDNN shift convention (zeros beyond utterance edges), so a
  padded batch is invariant to its padded length. Frequency padding is
  SAME (band edges see zeros, standard for speech CNNs).
- Frequency-only max-pooling (``lax.reduce_window``, VALID) between conv
  layers — the speech-standard pooling that never mixes time frames, so
  frame alignment with the targets is preserved 1:1.
- Per-channel masked batchnorm: moments over (batch, time, freq) with
  padding frames excluded — the same center-only BN semantics
  (eps 1e-3, decay .999) as the other families, reusing
  ``models/dnn.py::_masked_batchnorm`` over a ``[B·T·W, C]`` view.

After the conv stack the (freq × channels) axes flatten into one feature
dim feeding the usual dense hidden layers and the zero-init output layer
(reference dnn.py:67-68 semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.models.dnn import _masked_batchnorm, _nonlin

Params = Any


def _parse_int_list(spec: str, name: str) -> tuple[int, ...]:
    vals = tuple(int(tok) for tok in spec.replace(" ", "").split(",") if tok)
    if not vals:
        raise ValueError(f"empty {name} spec: {spec!r}")
    return vals


def _parse_kernels(spec: str, n_layers: int) -> tuple[tuple[int, int], ...]:
    """``"9x3;3x3"`` → ((9, 3), (3, 3)); short specs repeat the last entry."""
    groups = [g for g in spec.replace(" ", "").split(";") if g]
    if not groups:
        raise ValueError(f"empty cnn kernel spec: {spec!r}")
    kernels = []
    for g in groups:
        parts = g.split("x")
        if len(parts) != 2:
            raise ValueError(f"kernel {g!r} must be TIMExFREQ, e.g. 9x3")
        kernels.append((int(parts[0]), int(parts[1])))
    while len(kernels) < n_layers:
        kernels.append(kernels[-1])
    return tuple(kernels[:n_layers])


@dataclasses.dataclass(frozen=True)
class CNNConfig:
    input_dim: int  # spliced dim = num_channels * freq_dim
    num_labels: int
    # conv frontend; the defaults mirror the classic 2-conv speech shape
    # (big time×freq first kernel, freq pooling after the first layer)
    filters: str = "64,128"  # out-channels per conv layer
    kernels: str = "9x3;3x3"  # TIMExFREQ per conv layer
    pool: str = "3,1"  # freq-only max-pool window (=stride) per conv layer
    num_channels: int = 1  # input channels (2*context_width+1 splice copies)
    # dense stack on top (same keys as the DNN family)
    num_hidden_layers: int = 4
    num_hidden_units: int = 1024
    nonlin: str = "relu"
    batch_norm: bool = True
    dropout: float = 1.0  # keep probability (reference dropout semantics)
    compute_dtype: Any = jnp.float32
    bn_eps: float = 1e-3
    bn_decay: float = 0.999

    @classmethod
    def from_config(
        cls, conf: dict, input_dim: int, num_labels: int, num_channels: int = 1
    ) -> "CNNConfig":
        return cls(
            input_dim=input_dim,
            num_labels=num_labels,
            filters=conf.get("cnn_filters", cls.filters),
            kernels=conf.get("cnn_kernels", cls.kernels),
            pool=conf.get("cnn_pool", cls.pool),
            num_channels=num_channels,
            num_hidden_layers=int(conf.get("num_hidden_layers", 4)),
            num_hidden_units=int(conf.get("num_hidden_units", 1024)),
            nonlin=conf.get("nonlin", "relu"),
            batch_norm=str(conf.get("batch_norm", "True")) == "True",
            dropout=float(conf.get("dropout", 1)),
            compute_dtype=jnp.dtype(conf.get("compute_dtype", "float32")),
        )

    @property
    def conv_filters(self) -> tuple[int, ...]:
        return _parse_int_list(self.filters, "cnn filters")

    @property
    def conv_kernels(self) -> tuple[tuple[int, int], ...]:
        return _parse_kernels(self.kernels, len(self.conv_filters))

    @property
    def conv_pools(self) -> tuple[int, ...]:
        pools = _parse_int_list(self.pool, "cnn pool")
        n = len(self.conv_filters)
        return (pools + (pools[-1],) * n)[:n]

    @property
    def freq_dim(self) -> int:
        if self.input_dim % self.num_channels:
            raise ValueError(
                f"input dim {self.input_dim} not divisible by "
                f"{self.num_channels} splice channels"
            )
        return self.input_dim // self.num_channels

    def conv_output_dim(self) -> int:
        """Flattened (freq × channels) dim after the conv stack."""
        w = self.freq_dim
        for p in self.conv_pools:
            if p > 1:
                w = (w - p) // p + 1
            if w < 1:
                raise ValueError(
                    f"freq dim pooled away: freq_dim={self.freq_dim}, "
                    f"pool={self.pool}"
                )
        return w * self.conv_filters[-1]


class CNN:
    """Stateless model object: owns the config, provides init/apply
    (the shared Classifier contract — models/__init__.py)."""

    def __init__(self, config: CNNConfig):
        self.config = config

    @property
    def left_receptive(self) -> int:
        """Input frames BEFORE t that output t depends on: XLA SAME
        padding puts ``(k-1)//2`` zeros low / ``k//2`` high per time
        kernel, so the per-layer reach sums. Used by the windowed
        streaming emitter (decode/online.py::OnlineWindowedDecoder)."""
        return sum((kt - 1) // 2 for kt, _ in self.config.conv_kernels)

    @property
    def right_receptive(self) -> int:
        """Input frames AFTER t that output t depends on."""
        return sum(kt // 2 for kt, _ in self.config.conv_kernels)

    # ------------------------------------------------------------------

    def init(self, rng: jax.Array) -> tuple[Params, Params]:
        cfg = self.config
        filters = cfg.conv_filters
        kernels = cfg.conv_kernels
        n_conv = len(filters)
        keys = jax.random.split(rng, n_conv + cfg.num_hidden_layers)

        convs = []
        c_in = cfg.num_channels
        for l in range(n_conv):
            kt, kf = kernels[l]
            fan_in = kt * kf * c_in
            std = 1.0 / np.sqrt(fan_in)
            conv = {
                "w": (
                    jax.random.normal(keys[l], (kt, kf, c_in, filters[l])) * std
                ).astype(jnp.float32),
                "b": jnp.zeros((filters[l],), jnp.float32),
            }
            if cfg.batch_norm:
                conv["beta"] = jnp.zeros((filters[l],), jnp.float32)
            convs.append(conv)
            c_in = filters[l]

        dense = []
        fan_in = cfg.conv_output_dim()
        for l in range(cfg.num_hidden_layers):
            std = 1.0 / np.sqrt(fan_in)
            layer = {
                "w": (
                    jax.random.normal(keys[n_conv + l], (fan_in, cfg.num_hidden_units))
                    * std
                ).astype(jnp.float32),
                "b": jnp.zeros((cfg.num_hidden_units,), jnp.float32),
            }
            if cfg.batch_norm:
                layer["beta"] = jnp.zeros((cfg.num_hidden_units,), jnp.float32)
            dense.append(layer)
            fan_in = cfg.num_hidden_units
        out_in = fan_in if cfg.num_hidden_layers > 0 else cfg.conv_output_dim()
        params = {
            "conv": convs,
            "hidden": dense,
            # zero-init output layer (reference dnn.py:67-68 semantics)
            "out": {
                "w": jnp.zeros((out_in, cfg.num_labels), jnp.float32),
                "b": jnp.zeros((cfg.num_labels,), jnp.float32),
            },
        }
        state: dict[str, Any] = {"depth": jnp.asarray(0, jnp.int32)}
        if cfg.batch_norm:
            state["bn_conv_mean"] = [jnp.zeros((f,), jnp.float32) for f in filters]
            state["bn_conv_var"] = [jnp.ones((f,), jnp.float32) for f in filters]
            state["bn_mean"] = jnp.zeros(
                (cfg.num_hidden_layers, cfg.num_hidden_units), jnp.float32
            )
            state["bn_var"] = jnp.ones(
                (cfg.num_hidden_layers, cfg.num_hidden_units), jnp.float32
            )
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
        inputs: jnp.ndarray,  # [B, T, S*F] float32 (S splice copies)
        seq_lengths: jnp.ndarray,  # [B] int32
        *,
        train: bool,
        dropout_rng: jax.Array | None = None,
    ) -> tuple[jnp.ndarray, Params]:
        cfg = self.config
        b, t, _ = inputs.shape
        mask_bt = (jnp.arange(t)[None, :] < seq_lengths[:, None]).astype(jnp.float32)

        new_state = dict(state)
        # splice copies → channel axis: [B, T, S, F] → NHWC [B, T, F, S]
        h = (
            inputs.reshape(b, t, cfg.num_channels, cfg.freq_dim)
            .transpose(0, 1, 3, 2)
            .astype(cfg.compute_dtype)
        )
        # padding frames enter the stack as zeros and are re-zeroed after
        # every layer, so SAME-padded time kernels read the same values a
        # shorter padded batch would — padded-length invariance
        h = h * mask_bt[:, :, None, None].astype(h.dtype)

        for l, conv in enumerate(params["conv"]):
            # output dtype = compute dtype (the MXU accumulates f32
            # internally either way; preferred_element_type=f32 would make
            # the VJP's weight-grad conv mix bf16 input with f32 cotangent,
            # which lax.conv rejects) — same bf16-activation-storage policy
            # as the dense stack
            z = jax.lax.conv_general_dilated(
                h,
                conv["w"].astype(cfg.compute_dtype),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            z = z.astype(jnp.float32) + conv["b"]
            if cfg.batch_norm:
                w_now = z.shape[2]
                zc = z.reshape(b * t * w_now, -1)
                m = jnp.broadcast_to(
                    mask_bt[:, :, None, None], (b, t, w_now, 1)
                ).reshape(b * t * w_now, 1)
                zc, new_mean, new_var = _masked_batchnorm(
                    zc, m, conv["beta"],
                    state["bn_conv_mean"][l], state["bn_conv_var"][l],
                    train=train, eps=cfg.bn_eps, decay=cfg.bn_decay,
                )
                if train:
                    new_state["bn_conv_mean"] = [
                        new_mean if i == l else s
                        for i, s in enumerate(new_state["bn_conv_mean"])
                    ]
                    new_state["bn_conv_var"] = [
                        new_var if i == l else s
                        for i, s in enumerate(new_state["bn_conv_var"])
                    ]
                z = zc.reshape(z.shape)
            z = _nonlin(z.astype(cfg.compute_dtype), cfg.nonlin)
            p = cfg.conv_pools[l]
            if p > 1:
                # freq-only max-pool (stride == window, VALID): a reshape
                # + max over non-overlapping bands; never mixes time frames
                w_now = z.shape[2]
                w_out = (w_now - p) // p + 1
                z = z[:, :, : w_out * p, :].reshape(
                    b, t, w_out, p, z.shape[-1]
                ).max(axis=3)
            if train and cfg.dropout < 1:
                if dropout_rng is None:
                    raise ValueError("dropout requires dropout_rng in training mode")
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, 1000 + l), cfg.dropout, z.shape
                )
                z = jnp.where(keep, z / cfg.dropout, 0.0).astype(z.dtype)
            h = z * mask_bt[:, :, None, None].astype(z.dtype)

        # flatten (freq, channels) → dense stack
        h = h.reshape(b * t, -1)
        mask = mask_bt.reshape(b * t, 1)
        for l, layer in enumerate(params["hidden"]):
            z = jax.lax.dot_general(
                h.astype(cfg.compute_dtype),
                layer["w"].astype(cfg.compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            z = z + layer["b"].astype(jnp.float32)
            if cfg.batch_norm:
                z, new_mean, new_var = _masked_batchnorm(
                    z, mask, layer["beta"], state["bn_mean"][l], state["bn_var"][l],
                    train=train, eps=cfg.bn_eps, decay=cfg.bn_decay,
                )
                if train:
                    new_state["bn_mean"] = new_state["bn_mean"].at[l].set(new_mean)
                    new_state["bn_var"] = new_state["bn_var"].at[l].set(new_var)
            z = _nonlin(z.astype(cfg.compute_dtype), cfg.nonlin)
            if train and cfg.dropout < 1:
                if dropout_rng is None:
                    raise ValueError("dropout requires dropout_rng in training mode")
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, l), cfg.dropout, z.shape
                )
                z = jnp.where(keep, z / cfg.dropout, 0.0).astype(z.dtype)
            h = z * mask.astype(z.dtype)

        logits = jax.lax.dot_general(
            h.astype(cfg.compute_dtype),
            params["out"]["w"].astype(cfg.compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = (logits + params["out"]["b"]).astype(jnp.float32)
        return logits.reshape(b, t, cfg.num_labels), new_state
