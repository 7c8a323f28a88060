"""Fully-connected DNN acoustic model.

Functional re-design of the reference DNN classifier
(neuralNetworks/classifiers/dnn.py, layer.py, activation.py):

- per-layer affine → activation chain in the reference's fixed order
  batchnorm → nonlinearity → l2-norm → dropout (nnet.py:42-72)
- frame masking replaces the seq2nonseq/nonseq2seq gather sandwich
  (seq_convertors.py): compute runs over the padded ``[B·T, F]`` block and
  losses/statistics mask padding frames — static shapes for XLA
- batchnorm uses *masked* moments so padding frames don't pollute the
  statistics (the reference's BN only ever saw real frames because of the
  gather; tf.contrib.layers.batch_norm defaults: center, no scale,
  eps=1e-3, decay=0.999)
- layerwise initialisation (dnn.py:81-122): all layers always exist; a
  ``depth`` counter selects which hidden activation feeds the zero-init
  output layer, `add` increments it, `init` re-zeroes the output layer
- weights ~ N(0, 1/sqrt(fan_in)), zero biases (layer.py:39-48); output
  layer weights zero-init (dnn.py:67-68)

Matmuls run in a configurable ``compute_dtype`` (bfloat16 on the MXU for
speed; float32 master params) with f32 accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # nested dict pytree


@dataclasses.dataclass(frozen=True)
class DNNConfig:
    input_dim: int
    num_labels: int
    num_hidden_layers: int = 6
    num_hidden_units: int = 2048
    nonlin: str = "relu"  # relu | sigmoid | tanh | linear
    batch_norm: bool = False
    l2_norm: bool = False
    dropout: float = 1.0  # keep probability, reference semantics (nnet.py:70)
    layerwise_init: bool = False
    compute_dtype: Any = jnp.float32
    bn_eps: float = 1e-3
    bn_decay: float = 0.999
    # inference-mode hidden layers through the fused Pallas kernel
    # (ops/fused_mlp.py): matmul + bias + BN affine + relu in one VMEM pass.
    # Training mode always stays in XLA (batch moments need all-N reductions).
    use_pallas_ffn: bool = False
    # training-mode BN layers through the fused-backward custom VJP
    # (ops/bn_fused_bwd.py): the BN input cotangent is computed inside the
    # Pallas dgrad prologue instead of a separate materializing pass.
    # Forward numerics are bit-identical; backward matches autodiff to
    # accumulation-order noise. Only engages for relu+BN layers without
    # l2norm/dropout at supported shapes.
    fused_bn_bwd: bool = False

    @classmethod
    def from_config(cls, conf: dict, input_dim: int, num_labels: int) -> "DNNConfig":
        """Build from a reference-style ``[nnet]`` section dict
        (config_AURORA4.cfg:102-153). Extra keys beyond the reference:
        ``compute_dtype`` (bfloat16|float32; bfloat16 runs the MXU at full
        rate with f32 accumulation/statistics) and ``use_pallas_ffn``."""
        return cls(
            input_dim=input_dim,
            num_labels=num_labels,
            num_hidden_layers=int(conf.get("num_hidden_layers", 6)),
            num_hidden_units=int(conf.get("num_hidden_units", 2048)),
            nonlin=conf.get("nonlin", "relu"),
            batch_norm=str(conf.get("batch_norm", "False")) == "True",
            l2_norm=str(conf.get("l2_norm", "False")) == "True",
            dropout=float(conf.get("dropout", 1)),
            layerwise_init=int(conf.get("add_layer_period", 0)) > 0,
            compute_dtype=jnp.dtype(conf.get("compute_dtype", "float32")),
            use_pallas_ffn=str(conf.get("use_pallas_ffn", "False")) == "True",
            fused_bn_bwd=str(conf.get("fused_bn_bwd", "False")) == "True",
        )


class DNN:
    """Stateless model object: owns the config, provides init/apply."""

    def __init__(self, config: DNNConfig):
        self.config = config

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------

    def init(self, rng: jax.Array) -> tuple[Params, Params]:
        """Returns ``(params, state)``.

        ``params`` are trainable; ``state`` holds batchnorm moving stats and
        the layerwise ``depth`` counter.
        """
        cfg = self.config
        keys = jax.random.split(rng, cfg.num_hidden_layers)
        layers = []
        fan_in = cfg.input_dim
        for l in range(cfg.num_hidden_layers):
            std = 1.0 / np.sqrt(fan_in)
            layer = {
                "w": (jax.random.normal(keys[l], (fan_in, cfg.num_hidden_units)) * std).astype(
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
        """The layerwise `init` control op (dnn.py:112-122): re-zero the
        output layer (its init is all-zeros, so re-init == zeroing)."""
        out = {
            "w": jnp.zeros_like(params["out"]["w"]),
            "b": jnp.zeros_like(params["out"]["b"]),
        }
        return {**params, "out": out}

    # ------------------------------------------------------------------
    # forward
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
        """Returns ``(logits [B, T, num_labels] float32, new_state)``."""
        cfg = self.config
        b, t, f = inputs.shape
        x = inputs.reshape(b * t, f)
        mask = (jnp.arange(t)[None, :] < seq_lengths[:, None]).reshape(b * t, 1)
        mask = mask.astype(jnp.float32)

        new_state = dict(state)
        activations = []
        h = x

        # fused inference path: relu((h @ w + b) · scale + shift) per layer
        # in one Pallas kernel. Only when the elementwise chain matches the
        # kernel epilogue (no l2norm; eval-mode BN affine; relu/linear).
        def _tileable(k: int) -> bool:
            # kernel constraint: k % min(512, k) == 0
            return k <= 512 or k % 512 == 0

        use_fused = (
            cfg.use_pallas_ffn
            and not train
            and not cfg.l2_norm
            and cfg.nonlin in ("relu", "linear")
            and x.shape[0] % 512 == 0
            and cfg.num_hidden_units % 512 == 0
            and _tileable(x.shape[1])
        )
        if use_fused:
            from tfkaldi_tpu.ops import fused_ffn_block

            for l, layer in enumerate(params["hidden"]):
                if cfg.batch_norm:
                    scale = jax.lax.rsqrt(state["bn_var"][l] + cfg.bn_eps)
                    shift = layer["beta"] - state["bn_mean"][l] * scale
                else:
                    scale = shift = None
                h = fused_ffn_block(
                    h.astype(cfg.compute_dtype),
                    layer["w"].astype(cfg.compute_dtype),
                    layer["b"],
                    scale,
                    shift,
                    relu=cfg.nonlin == "relu",
                )
                activations.append(h)
            if cfg.layerwise_init:
                stacked = jnp.stack(activations)
                depth = jnp.clip(state["depth"], 0, cfg.num_hidden_layers - 1)
                h = jnp.take(stacked, depth, axis=0)
            logits = _affine(h, params["out"]["w"], params["out"]["b"], cfg.compute_dtype)
            logits = logits.astype(jnp.float32).reshape(b, t, cfg.num_labels)
            return logits, new_state

        # fused-backward BN layers (training): same forward ops, but the
        # backward computes dz inside the Pallas dgrad prologue
        # (ops/bn_fused_bwd.py) instead of a separate materializing pass
        fuse_bn = (
            cfg.fused_bn_bwd
            and train
            and cfg.batch_norm
            and cfg.nonlin == "relu"
            and not cfg.l2_norm
            and not cfg.dropout < 1
            # the kernel has no GSPMD partitioning rules yet: engage only
            # single-chip on TPU (CPU interpret mode is test-only)
            and (jax.device_count() == 1 or jax.default_backend() != "tpu")
        )
        if fuse_bn:
            from tfkaldi_tpu.ops import bn_fused_bwd

            interpret = jax.default_backend() != "tpu"

        for l, layer in enumerate(params["hidden"]):
            if fuse_bn and bn_fused_bwd.supported(
                h.shape[0], h.shape[1], cfg.num_hidden_units
            ):
                z, mean_b, var_b = bn_fused_bwd.bn_relu_layer(
                    h.astype(cfg.compute_dtype),
                    layer["w"],
                    layer["b"],
                    layer["beta"],
                    mask,
                    cfg.bn_eps,
                    interpret,
                )
                new_state["bn_mean"] = new_state["bn_mean"].at[l].set(
                    state["bn_mean"][l] * cfg.bn_decay + mean_b * (1.0 - cfg.bn_decay)
                )
                new_state["bn_var"] = new_state["bn_var"].at[l].set(
                    state["bn_var"][l] * cfg.bn_decay + var_b * (1.0 - cfg.bn_decay)
                )
                activations.append(z)
                h = z
                continue
            z = _affine(h, layer["w"], layer["b"], cfg.compute_dtype)
            if cfg.batch_norm:
                z, new_mean, new_var = _masked_batchnorm(
                    z,
                    mask,
                    layer["beta"],
                    state["bn_mean"][l],
                    state["bn_var"][l],
                    train=train,
                    eps=cfg.bn_eps,
                    decay=cfg.bn_decay,
                )
                if train:
                    new_state["bn_mean"] = new_state["bn_mean"].at[l].set(new_mean)
                    new_state["bn_var"] = new_state["bn_var"].at[l].set(new_var)
            z = _nonlin(z, cfg.nonlin)
            if cfg.l2_norm:
                z = _l2_norm(z)
            if train and cfg.dropout < 1:
                if dropout_rng is None:
                    raise ValueError("dropout requires dropout_rng in training mode")
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, l), cfg.dropout, z.shape
                )
                z = jnp.where(keep, z / cfg.dropout, 0.0)
            activations.append(z)
            h = z

        if cfg.layerwise_init:
            stacked = jnp.stack(activations)  # [L, N, H]
            depth = jnp.clip(state["depth"], 0, cfg.num_hidden_layers - 1)
            h = jnp.take(stacked, depth, axis=0)

        logits = _affine(h, params["out"]["w"], params["out"]["b"], cfg.compute_dtype)
        logits = logits.astype(jnp.float32).reshape(b, t, cfg.num_labels)
        return logits, new_state


def _affine(x, w, b, compute_dtype):
    """Matmul on the MXU in ``compute_dtype`` with f32 accumulation; the
    result is stored back in ``compute_dtype`` so the elementwise chain
    (bn/nonlin/l2norm/dropout) rides HBM at half width when bf16."""
    y = jax.lax.dot_general(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(compute_dtype)


def _nonlin(z, kind: str):
    if kind == "relu":
        return jax.nn.relu(z)
    if kind == "sigmoid":
        return jax.nn.sigmoid(z)
    if kind == "tanh":
        return jnp.tanh(z)
    if kind == "linear":
        return z
    raise ValueError(f"unknown nonlinearity {kind!r}")


def _l2_norm(z):
    """Divide by the per-frame mean-square where it exceeds 1
    (activation.py:87-111 — note: mean square, not RMS)."""
    sig = jnp.mean(jnp.square(z.astype(jnp.float32)), axis=1, keepdims=True)
    return jnp.where(sig > 1, z / sig.astype(z.dtype), z)


def _masked_batchnorm(z, mask, beta, moving_mean, moving_var, *, train, eps, decay):
    """Center-only batchnorm over real (unmasked) frames.

    Training uses batch moments of the masked frames and returns updated
    moving averages ``moving·decay + batch·(1-decay)``; eval uses the
    moving stats (tf.contrib.layers.batch_norm semantics, activation.py:145-161).
    """
    zf = z.astype(jnp.float32)  # f32 statistics even for bf16 activations
    if train:
        count = jnp.maximum(jnp.sum(mask), 1.0)
        mean = jnp.sum(zf * mask, axis=0) / count
        var = jnp.sum(jnp.square(zf) * mask, axis=0) / count - jnp.square(mean)
        new_mean = moving_mean * decay + mean * (1.0 - decay)
        new_var = moving_var * decay + var * (1.0 - decay)
    else:
        mean, var = moving_mean, moving_var
        new_mean, new_var = moving_mean, moving_var
    out = ((zf - mean) * jax.lax.rsqrt(var + eps) + beta).astype(z.dtype)
    return out, new_mean, new_var
