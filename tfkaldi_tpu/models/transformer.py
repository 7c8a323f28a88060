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
    # time-restricted self-attention (Povey et al. 2018-style): each query
    # attends keys in [t - left_context, t + right_context]; -1 = unlimited.
    # left_context >= 0 with right_context = 0 (+ causal_conv for the
    # conformer) makes the model exactly streamable (apply_stream).
    left_context: int = -1
    right_context: int = -1
    causal_conv: bool = False  # depthwise conv sees [t-k+1, t] not [t±k/2]
    # frame-rate reduction by stacking `subsample` consecutive frames into
    # one position before the input projection (the production
    # conformer-CTC recipe; attention/FFN cost drops ~subsample-fold).
    # CTC only: frame-level CE targets need the 1:1 alignment.
    subsample: int = 1
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
        if self.conformer and not self.causal_conv and self.conv_kernel % 2 == 0:
            raise ValueError("conv_kernel must be odd (SAME-centered depthwise)")
        if self.left_context < -1 or self.right_context < -1:
            raise ValueError("attention contexts must be >= 0 or -1 (unlimited)")
        if self.subsample < 1:
            raise ValueError("subsample must be >= 1")

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
            left_context=int(conf.get("attention_left_context", -1)),
            right_context=int(conf.get("attention_right_context", -1)),
            causal_conv=str(conf.get("causal_conv", "False")) == "True",
            subsample=int(conf.get("subsample", 1)),
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


def _sinusoidal_at(positions: jnp.ndarray, d: int) -> jnp.ndarray:
    """``sinusoidal_positions`` at arbitrary (traced) frame indices:
    ``[...,]`` int32 → ``[..., d]`` f32. Used by both the offline forward
    (indices ``0..T-1``) and the streaming forward (per-row global
    indices), so the two paths add bit-identical position terms.

    The (sin, cos) pairs are interleaved with a stack+reshape relayout —
    element 2i = sin_i, 2i+1 = cos_i, the same layout as the strided
    0::2/1::2 scatters it replaces, but scatters build the table one
    stride at a time at RUN time and measured as a multi-ms prologue on
    small decode grids; the relayout is a free fusion."""
    pos = positions.astype(jnp.float32)[..., None]
    div = jnp.exp(
        jnp.arange(0, d, 2, dtype=jnp.float32) * (-np.log(10000.0) / d)
    )
    sin = jnp.sin(pos * div)
    cos = jnp.cos(pos * div[: d // 2])
    if d % 2 == 0:
        return jnp.stack([sin, cos], axis=-1).reshape(positions.shape + (d,))
    # odd d (no (sin, cos) pairing for the last lane): strided scatters
    out = jnp.zeros(positions.shape + (d,), jnp.float32)
    out = out.at[..., 0::2].set(sin)
    return out.at[..., 1::2].set(cos)


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
        in_dim = cfg.input_dim * cfg.subsample
        std = 1.0 / np.sqrt(in_dim)
        params: dict[str, Any] = {
            "in_proj": {
                "w": (
                    jax.random.normal(keys[0], (in_dim, cfg.d_model)) * std
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

    def _rel_mask(self, rel: jnp.ndarray) -> jnp.ndarray:
        """``rel[i, p] = q_global(i) - k_global(p)`` → band-mask bool
        (True = attendable) per the configured time restriction."""
        cfg = self.config
        if cfg.right_context == -1:
            ok = jnp.ones_like(rel, bool)
        else:
            ok = rel >= -cfg.right_context
        if cfg.left_context != -1:
            ok = ok & (rel <= cfg.left_context)
        return ok

    def _attention(self, hq, hkv, blk, key_valid, rel_mask, dtype):
        """``hq [B,Tq,D]`` queries over ``hkv [B,Tk,D]`` keys/values;
        ``key_valid [B,Tk]`` per-row real-frame mask, ``rel_mask [Tq,Tk]``
        the (row-independent) time-restriction band."""
        cfg = self.config
        b, tq, d = hq.shape
        tk = hkv.shape[1]
        nh, dh = cfg.num_heads, d // cfg.num_heads
        a = blk["attn"]
        q = _dense(hq, a["wq"], a["bq"], dtype).reshape(b, tq, nh, dh)
        k = _dense(hkv, a["wk"], a["bk"], dtype).reshape(b, tk, nh, dh)
        v = _dense(hkv, a["wv"], a["bv"], dtype).reshape(b, tk, nh, dh)
        # [B, h, Tq, Tk] scores, f32 accumulation + f32 softmax
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / np.sqrt(dh))
        mask = key_valid[:, None, None, :] & rel_mask[None, None, :, :]
        scores = jnp.where(mask, scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
        ).astype(dtype)
        return _dense(ctx.reshape(b, tq, d), a["wo"], a["bo"], dtype)

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
            # causal: frame t sees [t-k+1, t] (streamable); else centered
            padding=[(cfg.conv_kernel - 1, 0)] if cfg.causal_conv else "SAME",
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
        if cfg.subsample > 1:
            # stack `subsample` consecutive frames into one position
            # (decimation front-end). Zero frames beyond each row's
            # length first: the boundary group may straddle the
            # utterance end, and padding CONTENT must not leak into it
            # (the invariance the other families get from masked shifts)
            frame_ok = jnp.arange(t)[None, :] < seq_lengths[:, None]
            inputs = inputs * frame_ok[:, :, None].astype(inputs.dtype)
            pad = -t % cfg.subsample
            if pad:
                inputs = jnp.pad(inputs, ((0, 0), (0, pad), (0, 0)))
            t = (t + pad) // cfg.subsample
            inputs = inputs.reshape(b, t, -1)
            seq_lengths = self.output_lengths(seq_lengths)
        key_mask = jnp.arange(t)[None, :] < seq_lengths[:, None]  # [B, T] bool
        mask_btf = key_mask[:, :, None]
        eps = cfg.ln_eps

        h = _dense(inputs, params["in_proj"]["w"], params["in_proj"]["b"], dtype)
        h = h + _sinusoidal_at(jnp.arange(t), cfg.d_model).astype(dtype)
        h = h * mask_btf.astype(h.dtype)

        # row-independent time-restriction band: rel[i, j] = i - j
        rel_mask = self._rel_mask(jnp.arange(t)[:, None] - jnp.arange(t)[None, :])

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
                self._attention(z, z, blk, key_mask, rel_mask, dtype),
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

    def output_lengths(self, seq_lengths):
        """Valid output frames for given input frame counts (``ceil(n/s)``
        under the stacking front-end; identity without it). The CTC
        trainer and decoder consult this instead of assuming 1:1."""
        s = self.config.subsample
        if s == 1:
            return seq_lengths
        return (seq_lengths + (s - 1)) // s

    @property
    def subsample_factor(self) -> int:
        return self.config.subsample

    # ------------------------------------------------------------------
    # streaming (decode/online.py seam, eval mode)
    # ------------------------------------------------------------------

    def validate_streamable(self) -> None:
        cfg = self.config
        if cfg.left_context < 0 or cfg.right_context != 0:
            raise ValueError(
                "streaming a transformer requires time-restricted, "
                "strictly-causal attention: attention_left_context >= 0 "
                "and attention_right_context = 0 (a full/right-context "
                "model is the attention analog of a bidirectional RNN)"
            )
        if cfg.conformer and not cfg.causal_conv:
            raise ValueError(
                "streaming a conformer requires causal_conv = True (the "
                "centered depthwise conv has (k-1)/2 frames of lookahead)"
            )

    def init_stream_carry(self, batch_size: int):
        """Per-stream state: global frame counters plus, per block, the
        last ``left_context`` attention-sublayer inputs and (conformer)
        the last ``k-1`` pre-depthwise activations. Zeros in unfilled
        slots reproduce the offline edge padding exactly. Under the
        stacking front-end (``subsample = s``), also a right-aligned
        buffer of the up-to-``s-1`` raw input frames awaiting a complete
        group."""
        self.validate_streamable()
        cfg = self.config
        nb, d, L = cfg.num_blocks, cfg.d_model, cfg.left_context
        carry = {
            "pos": jnp.zeros((batch_size,), jnp.int32),
            "h_cache": jnp.zeros((nb, batch_size, L, d), jnp.float32),
        }
        if cfg.conformer:
            carry["conv_cache"] = jnp.zeros(
                (nb, batch_size, cfg.conv_kernel - 1, d), jnp.float32
            )
        if cfg.subsample > 1:
            carry["in_buf"] = jnp.zeros(
                (batch_size, cfg.subsample - 1, cfg.input_dim), jnp.float32
            )
            carry["in_fill"] = jnp.zeros((batch_size,), jnp.int32)
        return carry

    def merge_stream_carry(self, take_mask, new, old):
        """Row-wise select over stream carries: rows where ``take_mask``
        (bool ``[B]``) is True take ``new``, others keep ``old``. The
        attention/conv caches are ``[num_blocks, B, ...]`` (batch dim 1);
        everything else is batch-major. Used by multi-stream serving to
        finish/reset one slot without disturbing the rest."""
        mask = jnp.asarray(take_mask)
        out = {}
        for key in old:
            a, b = new[key], old[key]
            bdim = 1 if key in ("h_cache", "conv_cache") else 0
            shape = [1] * a.ndim
            shape[bdim] = -1
            out[key] = jnp.where(mask.reshape(shape), a, b)
        return out

    def _stream_stack(self, chunk, v, carry):
        """Stacking front-end for streaming: buffer raw frames until
        complete ``s``-groups exist, emit the stacked groups.

        ``chunk [B, Tc, F]`` (``v`` valid per row) + the carried
        right-aligned ``s-1``-slot buffer → ``(stacked
        [B, ceil(Tc/s), s·F], n_out [B], carry')`` where
        ``n_out = (fill + v) // s`` complete groups leave and the
        ``(fill + v) % s`` leftover frames re-buffer. Rows never share
        group boundaries (per-row fill), so everything is gathers over
        ``[buffer ++ chunk]`` — the same roll identity the attention
        caches use."""
        cfg = self.config
        s = cfg.subsample
        b, tc, f = chunk.shape
        fill = carry["in_fill"]  # [B]
        combined = jnp.concatenate(
            [carry["in_buf"], chunk.astype(jnp.float32)], axis=1
        )  # [B, s-1+Tc, F]; row's stream starts at (s-1) - fill
        start = (s - 1) - fill
        total = fill + v
        n_out = total // s
        new_fill = total - n_out * s
        cap = (tc + s - 1) // s  # max emitted groups this chunk

        idx = start[:, None] + jnp.arange(cap * s)[None, :]
        frames = jnp.take_along_axis(
            combined, jnp.clip(idx, 0, s - 1 + tc - 1)[:, :, None], axis=1
        )
        # frames beyond the emitted groups are garbage; zero them so the
        # stacked content past n_out is inert (masked downstream anyway)
        frames = frames * (
            jnp.arange(cap * s)[None, :] < n_out[:, None] * s
        )[:, :, None]
        stacked = frames.reshape(b, cap, s * f)

        # re-buffer the leftover tail, right-aligned, zeros elsewhere
        # (flush zero-pads FROM this buffer, so empty slots must be 0)
        j = jnp.arange(s - 1)[None, :]
        buf_idx = start[:, None] + n_out[:, None] * s + j - (
            (s - 1) - new_fill
        )[:, None]
        buf_ok = j >= ((s - 1) - new_fill)[:, None]
        new_buf = jnp.take_along_axis(
            combined, jnp.clip(buf_idx, 0, s - 1 + tc - 1)[:, :, None], axis=1
        ) * buf_ok[:, :, None]
        carry = {**carry, "in_buf": new_buf, "in_fill": new_fill}
        return stacked, n_out, carry

    def _stream_flush_group(self, carry):
        """The final zero-padded partial group (offline ``apply`` pads the
        tail group with zeros and emits ``ceil(n/s)`` positions — this is
        that last position, emitted for rows with leftover frames)."""
        cfg = self.config
        s = cfg.subsample
        buf, fill = carry["in_buf"], carry["in_fill"]
        b, _, f = buf.shape
        i = jnp.arange(s)[None, :]
        idx = ((s - 1) - fill)[:, None] + i
        frames = jnp.take_along_axis(
            buf, jnp.clip(idx, 0, s - 2)[:, :, None], axis=1
        ) * (i < fill[:, None])[:, :, None]
        group = frames.reshape(b, 1, s * f)
        n = (fill > 0).astype(jnp.int32)
        carry = {
            **carry,
            "in_buf": jnp.zeros_like(buf),
            "in_fill": jnp.zeros_like(fill),
        }
        return group, n, carry

    def apply_stream(self, params, state, chunk, seq_lengths, carry):
        """One eval-mode chunk: ``[B, Tc, F]`` (``seq_lengths`` valid
        frames per row) → ``([B, Tc', O] logits, new_carry)``. Valid-frame
        logits equal the offline ``apply`` on the concatenated stream.
        With the stacking front-end, ``Tc' = ceil(Tc/s)`` positions of
        which ``stream_output_lengths`` are valid per row, and the final
        partial group is emitted by :meth:`apply_stream_flush`.

        Cache index identity: with a cache of length C holding global
        frames ``pos-C .. pos-1`` right-aligned and a chunk of ``v`` valid
        frames, slot ``m`` of the updated cache holds global frame
        ``(pos+v) - C + m`` = concat index ``v + m`` of
        ``[cache ++ chunk]`` — one ``take_along_axis``, no per-row
        Python."""
        v = jnp.asarray(seq_lengths, jnp.int32)  # [B] valid frames in chunk
        if self.config.subsample > 1:
            chunk, v, carry = self._stream_stack(chunk, v, carry)
        return self._stream_core(params, state, chunk, v, carry)

    def stream_output_lengths(self, carry, seq_lengths):
        """Positions ``apply_stream`` will emit for a chunk of
        ``seq_lengths`` valid frames given the CURRENT carry (before the
        call): identity without the front-end, ``(fill + v) // s`` with
        it."""
        v = jnp.asarray(seq_lengths, jnp.int32)
        if self.config.subsample == 1:
            return v
        return (carry["in_fill"] + v) // self.config.subsample

    def apply_stream_flush(self, params, state, carry):
        """End-of-utterance: emit the zero-padded final partial group
        (``[B, 1, O]`` logits, per-row count ∈ {0, 1}, new carry). A
        no-op (count 0) without the stacking front-end or when the row's
        stream length was a multiple of ``s``."""
        cfg = self.config
        b = carry["pos"].shape[0]
        if cfg.subsample == 1:
            return (
                jnp.zeros((b, 1, cfg.num_labels), jnp.float32),
                jnp.zeros((b,), jnp.int32),
                carry,
            )
        group, n, carry = self._stream_flush_group(carry)
        logits, carry = self._stream_core(params, state, group, n, carry)
        return logits, n, carry

    def _stream_core(self, params, state, chunk, v, carry):
        """The streaming block pipeline over an (already stacked, if
        subsampling) chunk with ``v`` valid positions per row."""
        cfg = self.config
        dtype = cfg.compute_dtype
        eps = cfg.ln_eps
        L = cfg.left_context
        b, tc, _ = chunk.shape
        pos = carry["pos"]
        n_cached = jnp.minimum(pos, L)  # filled cache slots per row

        valid_q = jnp.arange(tc)[None, :] < v[:, None]  # [B, Tc]
        mask_btf = valid_q[:, :, None]

        def roll(cache, new_rows):
            full = jnp.concatenate([cache, new_rows], axis=1)
            c = cache.shape[1]
            idx = v[:, None] + jnp.arange(c)[None, :]  # [B, C]
            return jnp.take_along_axis(full, idx[:, :, None], axis=1)

        # input projection + positions at the rows' global indices
        positions = pos[:, None] + jnp.arange(tc)[None, :]  # [B, Tc]
        h = _dense(chunk.astype(jnp.float32), params["in_proj"]["w"],
                   params["in_proj"]["b"], dtype)
        h = h + _sinusoidal_at(positions, cfg.d_model).astype(dtype)
        h = h * mask_btf.astype(h.dtype)

        # attention geometry over [cache ++ chunk] (concat index p has
        # global frame pos - L + p, query i has global pos + i):
        # rel[i, p] = (L + i) - p; key validity: cache slot filled /
        # chunk frame within the row's length
        rel = (L + jnp.arange(tc))[:, None] - jnp.arange(L + tc)[None, :]
        rel_mask = self._rel_mask(rel)
        p_idx = jnp.arange(L + tc)[None, :]
        key_valid = jnp.where(
            p_idx < L,
            p_idx >= (L - n_cached)[:, None],
            (p_idx - L) < v[:, None],
        )

        new_carry = {**carry, "pos": pos + v, "h_cache": []}
        if cfg.conformer:
            new_carry["conv_cache"] = []

        for l, blk in enumerate(params["blocks"]):
            if cfg.conformer:
                z = _layernorm(h, blk["ln_ffn1"]["g"], blk["ln_ffn1"]["b"], eps)
                h = h + 0.5 * self._ffn(z, blk["ffn1"], dtype)
                h = h * mask_btf.astype(h.dtype)
            # cache the attention-sublayer input stream
            h_f32 = h.astype(jnp.float32)
            full = jnp.concatenate(
                [carry["h_cache"][l], h_f32], axis=1
            )  # [B, L+Tc, D]
            new_carry["h_cache"].append(roll(carry["h_cache"][l], h_f32))
            z_full = _layernorm(
                full.astype(dtype), blk["ln_attn"]["g"], blk["ln_attn"]["b"], eps
            )
            h = h + self._attention(
                z_full[:, L:], z_full, blk, key_valid, rel_mask, dtype
            )
            if cfg.conformer:
                h = self._stream_conv(
                    h, blk, l, mask_btf, state, carry, new_carry, dtype, eps
                )
            z = _layernorm(h, blk["ln_ffn"]["g"], blk["ln_ffn"]["b"], eps)
            ffn_out = self._ffn(z, blk["ffn"], dtype)
            if cfg.conformer:
                h = h + 0.5 * ffn_out
                h = _layernorm(h, blk["ln_out"]["g"], blk["ln_out"]["b"], eps)
            else:
                h = h + ffn_out
            h = h * mask_btf.astype(h.dtype)

        new_carry["h_cache"] = jnp.stack(new_carry["h_cache"])
        if cfg.conformer:
            new_carry["conv_cache"] = jnp.stack(new_carry["conv_cache"])
        h = _layernorm(h, params["ln_final"]["g"], params["ln_final"]["b"], eps)
        logits = jax.lax.dot_general(
            h.reshape(b * tc, cfg.d_model).astype(dtype),
            params["out"]["w"].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = (logits + params["out"]["b"]).astype(jnp.float32)
        return logits.reshape(b, tc, cfg.num_labels), new_carry

    def _stream_conv(
        self, h, blk, l, mask_btf, state, carry, new_carry, dtype, eps
    ):
        """Conformer conv module over [conv_cache ++ chunk] with VALID
        padding — identical to the offline causal conv (its left zero pad
        is exactly the zeros in unfilled cache slots)."""
        cfg = self.config
        b, tc, d = h.shape
        p = blk["conv"]
        z = _layernorm(h, blk["ln_conv"]["g"], blk["ln_conv"]["b"], eps)
        zin = _dense(z, p["w_in"], p["b_in"], dtype)
        zf = zin.astype(jnp.float32)
        glu = (zf[..., :d] * jax.nn.sigmoid(zf[..., d:]))
        glu = glu * mask_btf.astype(glu.dtype)

        def roll(cache, new_rows):
            full = jnp.concatenate([cache, new_rows], axis=1)
            idx = (
                jnp.sum(mask_btf[:, :, 0].astype(jnp.int32), axis=1)[:, None]
                + jnp.arange(cache.shape[1])[None, :]
            )
            return jnp.take_along_axis(full, idx[:, :, None], axis=1)

        fullc = jnp.concatenate([carry["conv_cache"][l], glu], axis=1)
        new_carry["conv_cache"].append(roll(carry["conv_cache"][l], glu))
        conv = jax.lax.conv_general_dilated(
            fullc,
            p["w_dw"],
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=d,
        )  # [B, Tc, D]
        zbn, _, _ = _masked_batchnorm(
            conv.reshape(b * tc, d),
            mask_btf.reshape(b * tc, 1).astype(jnp.float32),
            p["bn_beta"],
            state["bn_conv_mean"][l],
            state["bn_conv_var"][l],
            train=False,
            eps=cfg.bn_eps,
            decay=cfg.bn_decay,
        )
        zc = jax.nn.swish(zbn.astype(jnp.float32)).astype(dtype).reshape(b, tc, d)
        out = _dense(zc, p["w_out"], p["b_out"], dtype)
        return (h + out) * mask_btf.astype(h.dtype)
