"""Transformer / Conformer acoustic model (beyond the reference).

Self-attention encoders are the modern ASR acoustic model (Vaswani et
al., 2017; Gulati et al., 2020 "Conformer"). The reference repo predates
them (its only model is the spliced MLP, classifiers/dnn.py), so this
family completes the migration path for users moving past the Kaldi-era
recipes; it slots into the same ``Classifier`` seam
(`model = transformer` in ``[nnet]``, `conformer = True` for the
Conformer variant) and trains/decodes through the unchanged
trainer/controller/decoder with 1:1 frame↔target alignment (no
sub-sampling, as the hybrid pipeline's targets are frame-level pdf
alignments).

TPU-first design:

- Every matmul — the qkv/output projections, the attention score and
  context contractions, the FFN pair — is a static-shape MXU
  contraction in ``compute_dtype`` (bf16 on TPU) with f32 accumulation
  (``preferred_element_type``); the softmax runs in f32 on the VPU. At
  the pipeline's sequence lengths (bucketed ≤ a few hundred frames) the
  [B·h, T, T] score tensor is small, and XLA's fusion of
  scale→mask→softmax→context beats hand-written attention kernels — no
  dynamic shapes, no gathers.
- Pre-LN residual blocks: LN is per-frame (padding never pollutes
  statistics, unlike BN), and pre-LN trains without warmup schedules the
  controller doesn't have.
- Padding is handled by construction, not gathers: padded KEYS are
  masked out of every attention row (additive -inf before the f32
  softmax), the Conformer convolution's input is zero-masked so the
  depthwise kernel never reads padding (the same zero-beyond-the-edge
  convention as the TDNN shifts and the input splicing,
  feature_reader.py:117-156), and the hidden state is re-masked between
  blocks — a padded batch is invariant to both the amount and the
  content of its padding (tests/test_transformer.py pins this).
- Conformer conv module: pointwise(2D)→GLU→depthwise(k)→masked BN→
  swish→pointwise, with the depthwise conv as a
  ``feature_group_count=D`` NHC conv (a VPU-friendly band op, no im2col)
  and the same masked center-only BN semantics as the other families.
- Sinusoidal absolute positions added after the input projection
  (static per compiled T — computed at trace time, zero runtime cost).
- Under a ``(data, model)`` mesh the attention projections shard by head
  groups and the FFN column/row-shards over the model axis
  (parallel/mesh.py), the same Megatron-style split as the DNN stack;
  everything else replicates and grads psum over ``data``.

Shared family conventions: zero-init output layer + ``reinit_output_layer``
(reference dnn.py:67-68), dropout as KEEP probability (reference
semantics), per-step rng stream via ``dropout_rng`` fold-ins.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.models.dnn import _masked_batchnorm

Params = Any


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    input_dim: int
    num_labels: int
    num_blocks: int = 6
    d_model: int = 256
    num_heads: int = 4
    ffn_dim: int = 1024
    conformer: bool = False  # macaron FFN pair + depthwise conv module
    conv_kernel: int = 15  # conformer depthwise kernel (odd)
    dropout: float = 1.0  # KEEP probability (reference dropout semantics)
    compute_dtype: Any = jnp.float32
    ln_eps: float = 1e-6
    bn_eps: float = 1e-3
    bn_decay: float = 0.999

    def __post_init__(self):
        if self.d_model % self.num_heads:
            raise ValueError(
                f"d_model {self.d_model} not divisible by num_heads {self.num_heads}"
            )
        if self.conformer and self.conv_kernel % 2 == 0:
            raise ValueError("conv_kernel must be odd (SAME-centered depthwise)")

    @classmethod
    def from_config(
        cls, conf: dict, input_dim: int, num_labels: int
    ) -> "TransformerConfig":
        return cls(
            input_dim=input_dim,
            num_labels=num_labels,
            num_blocks=int(conf.get("num_blocks", 6)),
            d_model=int(conf.get("d_model", 256)),
            num_heads=int(conf.get("num_heads", 4)),
            ffn_dim=int(conf.get("ffn_dim", 1024)),
            conformer=str(conf.get("conformer", "False")) == "True",
            conv_kernel=int(conf.get("conv_kernel", 15)),
            dropout=float(conf.get("dropout", 1)),
            compute_dtype=jnp.dtype(conf.get("compute_dtype", "float32")),
        )


def sinusoidal_positions(t: int, d: int) -> np.ndarray:
    """Standard fixed sin/cos positional table ``[t, d]`` (f32)."""
    pos = np.arange(t)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d, 2).astype(np.float64) * (-np.log(10000.0) / d))
    pe = np.zeros((t, d), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: pe[:, 1::2].shape[1]])
    return pe.astype(np.float32)


def _layernorm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, eps: float):
    """Per-frame LN in f32 (padding cannot pollute cross-frame stats)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _dense(x, w, b, dtype):
    y = jax.lax.dot_general(
        x.astype(dtype),
        w.astype(dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(dtype)


def _dropout(x, keep: float, rng, site: int, train: bool):
    if not train or keep >= 1:
        return x
    mask = jax.random.bernoulli(jax.random.fold_in(rng, site), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


class Transformer:
    """Stateless model object: owns the config, provides init/apply
    (the shared Classifier contract — models/__init__.py)."""

    def __init__(self, config: TransformerConfig):
        self.config = config

    # ------------------------------------------------------------------

    def _init_block(self, rng: jax.Array) -> Params:
        cfg = self.config
        d, f = cfg.d_model, cfg.ffn_dim
        ks = jax.random.split(rng, 12)

        def lin(key, fan_in, fan_out):
            std = 1.0 / np.sqrt(fan_in)
            return {
                "w": (jax.random.normal(key, (fan_in, fan_out)) * std).astype(
                    jnp.float32
                ),
                "b": jnp.zeros((fan_out,), jnp.float32),
            }

        def ln():
            return {
                "g": jnp.ones((d,), jnp.float32),
                "b": jnp.zeros((d,), jnp.float32),
            }

        def ffn(k1, k2):
            return {
                "w1": lin(k1, d, f)["w"], "b1": jnp.zeros((f,), jnp.float32),
                "w2": lin(k2, f, d)["w"], "b2": jnp.zeros((d,), jnp.float32),
            }

        blk: dict[str, Any] = {
            "ln_attn": ln(),
            "attn": {
                "wq": lin(ks[0], d, d)["w"], "bq": jnp.zeros((d,), jnp.float32),
                "wk": lin(ks[1], d, d)["w"], "bk": jnp.zeros((d,), jnp.float32),
                "wv": lin(ks[2], d, d)["w"], "bv": jnp.zeros((d,), jnp.float32),
                "wo": lin(ks[3], d, d)["w"], "bo": jnp.zeros((d,), jnp.float32),
            },
            "ln_ffn": ln(),
            "ffn": ffn(ks[4], ks[5]),
        }
        if cfg.conformer:
            blk["ln_ffn1"] = ln()
            blk["ffn1"] = ffn(ks[6], ks[7])
            blk["ln_conv"] = ln()
            blk["conv"] = {
                # pointwise in: D -> 2D (GLU halves it back)
                "w_in": lin(ks[8], d, 2 * d)["w"],
                "b_in": jnp.zeros((2 * d,), jnp.float32),
                # depthwise [k, 1, D]
                "w_dw": (
                    jax.random.normal(ks[9], (cfg.conv_kernel, 1, d))
                    * (1.0 / np.sqrt(cfg.conv_kernel))
                ).astype(jnp.float32),
                "bn_beta": jnp.zeros((d,), jnp.float32),
                # pointwise out: D -> D
                "w_out": lin(ks[10], d, d)["w"],
                "b_out": jnp.zeros((d,), jnp.float32),
            }
            blk["ln_out"] = ln()
        return blk

    def init(self, rng: jax.Array) -> tuple[Params, Params]:
        cfg = self.config
        keys = jax.random.split(rng, cfg.num_blocks + 1)
        std = 1.0 / np.sqrt(cfg.input_dim)
        params: dict[str, Any] = {
            "in_proj": {
                "w": (
                    jax.random.normal(keys[0], (cfg.input_dim, cfg.d_model)) * std
                ).astype(jnp.float32),
                "b": jnp.zeros((cfg.d_model,), jnp.float32),
            },
            "blocks": [self._init_block(k) for k in keys[1:]],
            "ln_final": {
                "g": jnp.ones((cfg.d_model,), jnp.float32),
                "b": jnp.zeros((cfg.d_model,), jnp.float32),
            },
            # zero-init output layer (reference dnn.py:67-68 semantics)
            "out": {
                "w": jnp.zeros((cfg.d_model, cfg.num_labels), jnp.float32),
                "b": jnp.zeros((cfg.num_labels,), jnp.float32),
            },
        }
        state: dict[str, Any] = {"depth": jnp.asarray(0, jnp.int32)}
        if cfg.conformer:
            state["bn_conv_mean"] = jnp.zeros(
                (cfg.num_blocks, cfg.d_model), jnp.float32
            )
            state["bn_conv_var"] = jnp.ones(
                (cfg.num_blocks, cfg.d_model), jnp.float32
            )
        return params, state

    def reinit_output_layer(self, params: Params) -> Params:
        out = {
            "w": jnp.zeros_like(params["out"]["w"]),
            "b": jnp.zeros_like(params["out"]["b"]),
        }
        return {**params, "out": out}

    # ------------------------------------------------------------------

    def _attention(self, h, blk, key_mask, dtype):
        cfg = self.config
        b, t, d = h.shape
        nh, dh = cfg.num_heads, d // cfg.num_heads
        a = blk["attn"]
        q = _dense(h, a["wq"], a["bq"], dtype).reshape(b, t, nh, dh)
        k = _dense(h, a["wk"], a["bk"], dtype).reshape(b, t, nh, dh)
        v = _dense(h, a["wv"], a["bv"], dtype).reshape(b, t, nh, dh)
        # [B, h, Tq, Tk] scores, f32 accumulation + f32 softmax
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / np.sqrt(dh))
        scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
        ).astype(dtype)
        return _dense(ctx.reshape(b, t, d), a["wo"], a["bo"], dtype)

    def _ffn(self, h, p, dtype):
        z = _dense(h, p["w1"], p["b1"], dtype)
        z = jax.nn.swish(z.astype(jnp.float32)).astype(dtype)
        return _dense(z, p["w2"], p["b2"], dtype)

    def _conv_module(
        self, h, blk, l, mask_btf, state, new_state, train, dtype
    ):
        cfg = self.config
        b, t, d = h.shape
        p = blk["conv"]
        z = _dense(h, p["w_in"], p["b_in"], dtype)
        zf = z.astype(jnp.float32)
        z = (zf[..., :d] * jax.nn.sigmoid(zf[..., d:])).astype(dtype)  # GLU
        # zero padding so the depthwise kernel never reads beyond the
        # utterance (same edge convention as tdnn._shift / input splicing)
        z = z * mask_btf.astype(z.dtype)
        # depthwise conv in f32: a k-tap band op (VPU-bound, no MXU win
        # from bf16) — and conv's VJP rejects mixed bf16-operand/f32-
        # accumulator setups, so full f32 is both safer and free here
        z = jax.lax.conv_general_dilated(
            z.astype(jnp.float32),
            p["w_dw"],
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=d,
        )
        zbn, new_mean, new_var = _masked_batchnorm(
            z.reshape(b * t, d),
            mask_btf.reshape(b * t, 1).astype(jnp.float32),
            p["bn_beta"],
            state["bn_conv_mean"][l],
            state["bn_conv_var"][l],
            train=train,
            eps=cfg.bn_eps,
            decay=cfg.bn_decay,
        )
        if train:
            new_state["bn_conv_mean"] = (
                new_state["bn_conv_mean"].at[l].set(new_mean)
            )
            new_state["bn_conv_var"] = new_state["bn_conv_var"].at[l].set(new_var)
        z = jax.nn.swish(zbn.astype(jnp.float32)).astype(dtype).reshape(b, t, d)
        return _dense(z, p["w_out"], p["b_out"], dtype)

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
        dtype = cfg.compute_dtype
        b, t, _ = inputs.shape
        if train and cfg.dropout < 1 and dropout_rng is None:
            raise ValueError("dropout requires dropout_rng in training mode")
        rng = dropout_rng if dropout_rng is not None else jax.random.PRNGKey(0)
        key_mask = jnp.arange(t)[None, :] < seq_lengths[:, None]  # [B, T] bool
        mask_btf = key_mask[:, :, None]
        eps = cfg.ln_eps

        h = _dense(inputs, params["in_proj"]["w"], params["in_proj"]["b"], dtype)
        h = h + jnp.asarray(sinusoidal_positions(t, cfg.d_model), dtype)
        h = h * mask_btf.astype(h.dtype)

        new_state = dict(state)
        for l, blk in enumerate(params["blocks"]):
            site = 10 * l
            if cfg.conformer:
                z = _layernorm(h, blk["ln_ffn1"]["g"], blk["ln_ffn1"]["b"], eps)
                h = h + 0.5 * _dropout(
                    self._ffn(z, blk["ffn1"], dtype), cfg.dropout, rng, site, train
                )
            z = _layernorm(h, blk["ln_attn"]["g"], blk["ln_attn"]["b"], eps)
            h = h + _dropout(
                self._attention(z, blk, key_mask, dtype),
                cfg.dropout, rng, site + 1, train,
            )
            if cfg.conformer:
                z = _layernorm(h, blk["ln_conv"]["g"], blk["ln_conv"]["b"], eps)
                h = h + _dropout(
                    self._conv_module(
                        z, blk, l, mask_btf, state, new_state, train, dtype
                    ),
                    cfg.dropout, rng, site + 2, train,
                )
            z = _layernorm(h, blk["ln_ffn"]["g"], blk["ln_ffn"]["b"], eps)
            ffn_out = self._ffn(z, blk["ffn"], dtype)
            if cfg.conformer:
                h = h + 0.5 * _dropout(ffn_out, cfg.dropout, rng, site + 3, train)
                h = _layernorm(h, blk["ln_out"]["g"], blk["ln_out"]["b"], eps)
            else:
                h = h + _dropout(ffn_out, cfg.dropout, rng, site + 3, train)
            # keep padded frames inert for the next block's conv/attention
            h = h * mask_btf.astype(h.dtype)

        h = _layernorm(h, params["ln_final"]["g"], params["ln_final"]["b"], eps)
        logits = jax.lax.dot_general(
            h.reshape(b * t, cfg.d_model).astype(dtype),
            params["out"]["w"].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = (logits + params["out"]["b"]).astype(jnp.float32)
        return logits.reshape(b, t, cfg.num_labels), new_state
