"""Attention encoder-decoder (LAS-style) — the fourth ASR paradigm.

The reference ships exactly one paradigm (hybrid frame-CE DNN,
reference neuralNetworks/nnet.py + trainer.py); this framework already
adds CTC and the RNN-T transducer, and this module completes the set with
the attention-based encoder-decoder: an acoustic encoder (any of the
framework's sequence encoders — LSTM/GRU stacks or
transformer/conformer, reusing their Pallas kernels, masking, TP
sharding, and subsampling front-end) and an autoregressive transformer
decoder with causal self-attention and cross-attention over the encoder
memory, trained by label-smoothed cross-entropy over teacher-forced
targets (``model = seq2seq`` + ``loss = attention``).

TPU design:

- every contraction is a static-shape bf16-capable MXU matmul with f32
  accumulation (the helpers shared with models/transformer.py); softmax
  and layernorm in f32;
- teacher forcing is ONE forward over the whole ``[B, U+1]`` shifted
  token grid — the causal mask replaces any sequential loop, so training
  has no step-wise recursion at all (the decode-time recursion lives in
  decode/seq2seq.py);
- padding invariance by construction: encoder memory keys are masked by
  valid frame, decoder self-attention keys by valid token position, and
  the loss by target length — content past the lengths cannot leak
  (pinned by tests/test_seq2seq.py);
- start/end share one token id (= ``num_labels``, the same "extra final
  class" convention the CTC blank uses): SOS can never be *predicted*
  (it is only ever fed) and EOS never *fed* (prediction stops), so one
  vocabulary slot serves both without ambiguity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.models.rnn import GRU, LSTM, RNNConfig
from tfkaldi_tpu.models.transformer import (
    _dense,
    _dropout,
    _layernorm,
    sinusoidal_positions,
)

Params = Any


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    input_dim: int
    num_labels: int  # real labels; sos/eos = num_labels (vocab = +1)
    enc_type: str = "conformer"  # lstm | gru | transformer | conformer
    # RNN-encoder knobs (enc_type = lstm | gru)
    enc_layers: int = 2
    enc_units: int = 512
    enc_bidirectional: bool = True  # offline attention models default bidi
    # self-attention-encoder knobs, passed to TransformerConfig.from_config
    enc_extra: tuple = ()
    # decoder stack
    dec_blocks: int = 2
    d_model: int = 256
    num_heads: int = 4
    ffn_dim: int = 1024
    embed_dim: int = 0  # 0 = d_model (tied decoder width)
    label_smoothing: float = 0.1
    # joint CTC-attention multitask (Watanabe et al. 2017; the
    # wenet/espnet production recipe): ctc_weight·CTC(encoder memory) +
    # (1-ctc_weight)·attention CE. 0 = pure attention. The CTC head
    # shares the id space: blank = num_labels (the same extra final
    # class the SOS/EOS uses — a blank is never a decoder token and
    # SOS/EOS never a CTC label, so one slot serves both).
    ctc_weight: float = 0.0
    dropout: float = 1.0  # keep probability (reference semantics)
    compute_dtype: Any = jnp.float32
    ln_eps: float = 1e-6
    scan_unroll: int = 8
    scan_impl: str = "auto"

    def __post_init__(self):
        if self.d_model % self.num_heads:
            raise ValueError(
                f"d_model {self.d_model} not divisible by num_heads "
                f"{self.num_heads}"
            )
        if not 0.0 <= self.label_smoothing < 1.0:
            raise ValueError("label_smoothing must be in [0, 1)")

    @classmethod
    def from_config(cls, conf: dict, input_dim: int, num_labels: int) -> "Seq2SeqConfig":
        return cls(
            input_dim=input_dim,
            num_labels=num_labels,
            enc_type=str(conf.get("enc_type", "conformer")),
            enc_layers=int(conf.get("num_hidden_layers", 2)),
            enc_units=int(conf.get("num_hidden_units", 512)),
            enc_bidirectional=str(conf.get("bidirectional", "True")) == "True",
            enc_extra=tuple(
                (k, str(conf[k]))
                for k in (
                    "num_blocks", "d_model", "num_heads", "ffn_dim",
                    "conv_kernel", "subsample", "attention_left_context",
                    "attention_right_context", "causal_conv",
                )
                if k in conf
            ),
            dec_blocks=int(conf.get("dec_blocks", 2)),
            d_model=int(conf.get("d_model", 256)),
            num_heads=int(conf.get("num_heads", 4)),
            ffn_dim=int(conf.get("ffn_dim", 1024)),
            embed_dim=int(conf.get("embed_dim", 0)),
            label_smoothing=float(conf.get("label_smoothing", 0.1)),
            ctc_weight=float(conf.get("ctc_weight", 0.0)),
            dropout=float(conf.get("dropout", 1)),
            compute_dtype=jnp.dtype(conf.get("compute_dtype", "float32")),
            scan_unroll=int(conf.get("scan_unroll", 8)),
            scan_impl=str(conf.get("scan_impl", "auto")),
        )


class AttentionSeq2Seq:
    """Stateless attention model: init + teacher-forced forward. Decoded
    autoregressively by :class:`tfkaldi_tpu.decode.seq2seq.Seq2SeqBeamDecoder`."""

    def __init__(self, config: Seq2SeqConfig):
        self.config = config
        if config.enc_type in ("transformer", "conformer"):
            from tfkaldi_tpu.models.transformer import (
                Transformer,
                TransformerConfig,
            )

            tconf = dict(config.enc_extra)
            tconf["conformer"] = (
                "True" if config.enc_type == "conformer" else "False"
            )
            # the encoder's output projection IS the memory projection:
            # its width must be the decoder's d_model
            tconf["d_model"] = tconf.get("d_model", str(config.d_model))
            tcfg = TransformerConfig.from_config(
                tconf, config.input_dim, config.d_model
            )
            tcfg = dataclasses.replace(
                tcfg, dropout=config.dropout, compute_dtype=config.compute_dtype
            )
            self.encoder = Transformer(tcfg)
        elif config.enc_type in ("lstm", "gru"):
            cell = {"lstm": LSTM, "gru": GRU}[config.enc_type]
            self.encoder = cell(
                RNNConfig(
                    input_dim=config.input_dim,
                    num_labels=config.d_model,  # memory projection
                    num_layers=config.enc_layers,
                    hidden_units=config.enc_units,
                    bidirectional=config.enc_bidirectional,
                    dropout=config.dropout,
                    compute_dtype=config.compute_dtype,
                    scan_unroll=config.scan_unroll,
                    scan_impl=config.scan_impl,
                )
            )
        else:
            raise ValueError(f"unknown enc_type {config.enc_type!r}")

    @property
    def sos_eos_id(self) -> int:
        return self.config.num_labels

    @property
    def vocab_size(self) -> int:
        return self.config.num_labels + 1

    @property
    def embed_dim(self) -> int:
        return self.config.embed_dim or self.config.d_model

    def output_lengths(self, input_lengths):
        fn = getattr(self.encoder, "output_lengths", None)
        return input_lengths if fn is None else fn(input_lengths)

    # ------------------------------------------------------------------

    def _init_dec_block(self, rng: jax.Array) -> Params:
        cfg = self.config
        d, f = cfg.d_model, cfg.ffn_dim
        ks = jax.random.split(rng, 10)

        def lin(key, fan_in, fan_out):
            std = 1.0 / np.sqrt(fan_in)
            return (jax.random.normal(key, (fan_in, fan_out)) * std).astype(
                jnp.float32
            )

        def ln():
            return {"g": jnp.ones((d,), jnp.float32),
                    "b": jnp.zeros((d,), jnp.float32)}

        def attn(k0, k1, k2, k3):
            return {
                "wq": lin(k0, d, d), "bq": jnp.zeros((d,), jnp.float32),
                "wk": lin(k1, d, d), "bk": jnp.zeros((d,), jnp.float32),
                "wv": lin(k2, d, d), "bv": jnp.zeros((d,), jnp.float32),
                "wo": lin(k3, d, d), "bo": jnp.zeros((d,), jnp.float32),
            }

        return {
            "ln_self": ln(),
            "self": attn(*ks[0:4]),
            "ln_cross": ln(),
            "cross": attn(*ks[4:8]),
            "ln_ffn": ln(),
            "ffn": {
                "w1": lin(ks[8], d, f), "b1": jnp.zeros((f,), jnp.float32),
                "w2": lin(ks[9], f, d), "b2": jnp.zeros((d,), jnp.float32),
            },
        }

    def init(self, rng: jax.Array) -> tuple[Params, Params]:
        cfg = self.config
        ke, kd, kemb, kin = jax.random.split(rng, 4)
        enc, enc_state = self.encoder.init(ke)
        # the encoder 'out' layer is zero-init by the frame-classifier
        # convention; as the memory projection it must break symmetry
        # (same re-init the transducer applies to its joint halves)
        w = enc["out"]["w"]
        enc["out"] = {
            "w": (jax.random.normal(kin, w.shape) / np.sqrt(w.shape[0])).astype(
                jnp.float32
            ),
            "b": jnp.zeros_like(enc["out"]["b"]),
        }
        e = self.embed_dim
        params = {
            "enc": enc,
            "embed": (
                jax.random.normal(kemb, (self.vocab_size, e)) / np.sqrt(e)
            ).astype(jnp.float32),
            "dec_blocks": [
                self._init_dec_block(k)
                for k in jax.random.split(kd, cfg.dec_blocks)
            ],
            "ln_final": {"g": jnp.ones((cfg.d_model,), jnp.float32),
                         "b": jnp.zeros((cfg.d_model,), jnp.float32)},
            # zero-init output (reference dnn.py:67-68 semantics): the
            # first step predicts uniform, which is exactly right
            "out": {"w": jnp.zeros((cfg.d_model, self.vocab_size), jnp.float32),
                    "b": jnp.zeros((self.vocab_size,), jnp.float32)},
        }
        if e != cfg.d_model:
            params["embed_proj"] = (
                jax.random.normal(rng, (e, cfg.d_model)) / np.sqrt(e)
            ).astype(jnp.float32)
        if cfg.ctc_weight > 0.0:
            # CTC head over the encoder memory (zero-init like every
            # output layer; width = labels + blank, blank = num_labels)
            params["ctc_head"] = {
                "w": jnp.zeros((cfg.d_model, self.vocab_size), jnp.float32),
                "b": jnp.zeros((self.vocab_size,), jnp.float32),
            }
        return params, {"enc": enc_state}

    # ------------------------------------------------------------------

    def encode(self, params, state, inputs, input_lengths, *, train,
               dropout_rng=None):
        """``[B, T, F]`` features → ``([B, T', D]`` memory, new state)."""
        mem, new_enc_state = self.encoder.apply(
            params["enc"], state.get("enc", {}), inputs, input_lengths,
            train=train,
            dropout_rng=None if dropout_rng is None
            else jax.random.fold_in(dropout_rng, 0),
        )
        return mem, {**state, "enc": new_enc_state}

    def _mha(self, hq, hkv, p, key_valid, causal, dtype):
        """Multi-head attention; ``key_valid [B, Tk]``; ``causal`` adds
        the lower-triangular self-attention band (Tq == Tk)."""
        cfg = self.config
        b, tq, d = hq.shape
        tk = hkv.shape[1]
        nh, dh = cfg.num_heads, d // cfg.num_heads
        q = _dense(hq, p["wq"], p["bq"], dtype).reshape(b, tq, nh, dh)
        k = _dense(hkv, p["wk"], p["bk"], dtype).reshape(b, tk, nh, dh)
        v = _dense(hkv, p["wv"], p["bv"], dtype).reshape(b, tk, nh, dh)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / np.sqrt(dh))
        mask = key_valid[:, None, None, :]
        if causal:
            tri = jnp.arange(tq)[:, None] >= jnp.arange(tk)[None, :]
            mask = mask & tri[None, None, :, :]
        scores = jnp.where(mask, scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
        ).astype(dtype)
        return _dense(ctx.reshape(b, tq, d), p["wo"], p["bo"], dtype)

    def decode_step_logits(self, params, tokens, token_valid, memory,
                           mem_valid, *, train=False, dropout_rng=None):
        """Causal decoder forward: ``tokens [B, U]`` (SOS-shifted) →
        ``[B, U, V]`` next-token logits. ``token_valid [B, U]`` masks
        padded positions out of the self-attention keys; ``mem_valid
        [B, T']`` masks padded memory frames. Used both for teacher
        forcing (whole grid at once) and, re-run over the growing prefix,
        by the autoregressive beam decoder."""
        cfg = self.config
        dtype = cfg.compute_dtype
        eps = cfg.ln_eps
        b, u = tokens.shape
        h = params["embed"][tokens] * np.sqrt(float(self.embed_dim))
        if "embed_proj" in params:
            h = h @ params["embed_proj"]
        # decoder positions are always 0..U-1 (no streaming offset), so the
        # position term is a host-precomputed compile-time constant; the
        # traced-index variant (_sinusoidal_at) builds its table with
        # strided scatters at RUN time and measured as the dominant cost of
        # the whole decode grid
        h = h + jnp.asarray(sinusoidal_positions(u, cfg.d_model))[None]
        h = (h * token_valid[:, :, None]).astype(dtype)
        for site, blk in enumerate(params["dec_blocks"]):
            z = _layernorm(h, blk["ln_self"]["g"], blk["ln_self"]["b"], eps)
            z = self._mha(z, z, blk["self"], token_valid, True, dtype)
            h = h + _dropout(z, cfg.dropout, dropout_rng, 3 * site, train)
            z = _layernorm(h, blk["ln_cross"]["g"], blk["ln_cross"]["b"], eps)
            z = self._mha(z, memory.astype(dtype), blk["cross"], mem_valid,
                          False, dtype)
            h = h + _dropout(z, cfg.dropout, dropout_rng, 3 * site + 1, train)
            z = _layernorm(h, blk["ln_ffn"]["g"], blk["ln_ffn"]["b"], eps)
            z = _dense(z, blk["ffn"]["w1"], blk["ffn"]["b1"], dtype)
            z = jax.nn.swish(z.astype(jnp.float32)).astype(dtype)
            z = _dense(z, blk["ffn"]["w2"], blk["ffn"]["b2"], dtype)
            h = h + _dropout(z, cfg.dropout, dropout_rng, 3 * site + 2, train)
        h = _layernorm(h, params["ln_final"]["g"], params["ln_final"]["b"], eps)
        logits = jax.lax.dot_general(
            h.reshape(b * u, cfg.d_model).astype(dtype),
            params["out"]["w"].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + params["out"]["b"]
        return logits.reshape(b, u, self.vocab_size).astype(jnp.float32)

    def ctc_logits(self, params, memory):
        """``[B, T', D]`` encoder memory → ``[B, T', V]`` CTC logits
        (joint CTC-attention head; requires ``ctc_weight > 0``)."""
        cfg = self.config
        dtype = cfg.compute_dtype
        return _dense(
            memory.astype(dtype), params["ctc_head"]["w"],
            params["ctc_head"]["b"], dtype,
        ).astype(jnp.float32)

    def apply_joint(
        self, params, state, inputs, input_lengths, labels, label_lengths,
        *, train, dropout_rng=None,
    ):
        """One encoder pass feeding both heads: ``(attention logits
        [B, U+1, V], ctc logits [B, T', V], new state)``."""
        memory, new_state = self.encode(
            params, state, inputs, input_lengths, train=train,
            dropout_rng=dropout_rng,
        )
        b, u = labels.shape
        sos = jnp.full((b, 1), self.sos_eos_id, labels.dtype)
        tokens = jnp.concatenate([sos, labels], axis=1)
        token_valid = jnp.arange(u + 1)[None, :] <= label_lengths[:, None]
        mem_valid = (
            jnp.arange(memory.shape[1])[None, :]
            < self.output_lengths(input_lengths)[:, None]
        )
        dec_rng = (
            None if dropout_rng is None else jax.random.fold_in(dropout_rng, 1)
        )
        att = self.decode_step_logits(
            params, tokens, token_valid, memory, mem_valid,
            train=train, dropout_rng=dec_rng,
        )
        return att, self.ctc_logits(params, memory), new_state

    # -- KV-cached autoregressive step (decode/seq2seq.py) ---------------
    #
    # The teacher-forced grid above recomputes every prefix position; the
    # beam search instead advances one position per step, so it carries
    # per-block self-attention K/V caches and precomputed cross-attention
    # K/V of the memory — each step is O(L) attention reads instead of an
    # O(L²) grid re-run. Equivalence with the grid forward is pinned by
    # tests/test_seq2seq.py::test_cached_step_matches_grid.

    def init_decode_cache(self, n: int, max_len: int):
        """Zeroed self-attention K/V caches: ``[blocks, N, max_len+1, D]``
        each (position p holds the K/V of the token fed at step p)."""
        cfg = self.config
        shape = (cfg.dec_blocks, n, max_len + 1, cfg.d_model)
        return {"k": jnp.zeros(shape, jnp.float32),
                "v": jnp.zeros(shape, jnp.float32)}

    def cross_kv(self, params, memory):
        """Precompute every block's cross-attention K/V of the encoder
        memory (``[blocks, N, T', D]`` each) — once per utterance."""
        cfg = self.config
        dtype = cfg.compute_dtype
        ks, vs = [], []
        for blk in params["dec_blocks"]:
            p = blk["cross"]
            ks.append(_dense(memory.astype(dtype), p["wk"], p["bk"], dtype))
            vs.append(_dense(memory.astype(dtype), p["wv"], p["bv"], dtype))
        return jnp.stack(ks).astype(jnp.float32), jnp.stack(vs).astype(
            jnp.float32
        )

    def _mha_one(self, q, keys, values, p, key_valid, dtype):
        """One-query attention: ``q [N, D]`` over ``keys/values [N, Tk, D]``
        (already projected); ``key_valid [N, Tk]``."""
        cfg = self.config
        n, d = q.shape
        tk = keys.shape[1]
        nh, dh = cfg.num_heads, d // cfg.num_heads
        qh = q.reshape(n, nh, dh)
        kh = keys.astype(dtype).reshape(n, tk, nh, dh)
        vh = values.astype(dtype).reshape(n, tk, nh, dh)
        scores = jnp.einsum(
            "nhd,nkhd->nhk", qh, kh, preferred_element_type=jnp.float32
        ) * (1.0 / np.sqrt(dh))
        scores = jnp.where(key_valid[:, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
        ctx = jnp.einsum(
            "nhk,nkhd->nhd", attn, vh, preferred_element_type=jnp.float32
        ).astype(dtype)
        return _dense(ctx.reshape(n, d), p["wo"], p["bo"], dtype)

    def decode_step_cached(self, params, tok, step, cache, cross_k, cross_v,
                           mem_valid):
        """Advance one position: ``tok [N]`` is the token at sequence
        position ``step`` (traced scalar; SOS at 0, else the previously
        emitted label). Returns ``([N, V] logits, updated cache)``.
        Rows whose hypothesis is finished produce unused logits — their
        cache slots hold garbage past their length, which no live query
        ever attends (queries at position p read slots <= p, and a
        finished row's logits are never consumed)."""
        cfg = self.config
        dtype = cfg.compute_dtype
        eps = cfg.ln_eps
        n = tok.shape[0]
        cache_len = cache["k"].shape[2]
        h = params["embed"][tok] * np.sqrt(float(self.embed_dim))
        if "embed_proj" in params:
            h = h @ params["embed_proj"]
        pos_table = jnp.asarray(
            sinusoidal_positions(cache_len, cfg.d_model)
        )
        h = (h + pos_table[step]).astype(dtype)
        slot_valid = jnp.arange(cache_len)[None, :] <= step  # [1, L+1]
        slot_valid = jnp.broadcast_to(slot_valid, (n, cache_len))
        new_k, new_v = cache["k"], cache["v"]
        for l, blk in enumerate(params["dec_blocks"]):
            z = _layernorm(h, blk["ln_self"]["g"], blk["ln_self"]["b"], eps)
            p = blk["self"]
            q = _dense(z, p["wq"], p["bq"], dtype)
            k = _dense(z, p["wk"], p["bk"], dtype)
            v = _dense(z, p["wv"], p["bv"], dtype)
            # scalar `step` on one axis → dynamic-update-slice, not scatter
            new_k = new_k.at[l, :, step, :].set(k.astype(jnp.float32))
            new_v = new_v.at[l, :, step, :].set(v.astype(jnp.float32))
            h = h + self._mha_one(q, new_k[l], new_v[l], p, slot_valid, dtype)
            z = _layernorm(h, blk["ln_cross"]["g"], blk["ln_cross"]["b"], eps)
            p = blk["cross"]
            q = _dense(z, p["wq"], p["bq"], dtype)
            h = h + self._mha_one(q, cross_k[l], cross_v[l], p, mem_valid,
                                  dtype)
            z = _layernorm(h, blk["ln_ffn"]["g"], blk["ln_ffn"]["b"], eps)
            z = _dense(z, blk["ffn"]["w1"], blk["ffn"]["b1"], dtype)
            z = jax.nn.swish(z.astype(jnp.float32)).astype(dtype)
            h = h + _dense(z, blk["ffn"]["w2"], blk["ffn"]["b2"], dtype)
        h = _layernorm(h, params["ln_final"]["g"], params["ln_final"]["b"],
                       eps)
        logits = jax.lax.dot_general(
            h.astype(dtype),
            params["out"]["w"].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + params["out"]["b"]
        return logits.astype(jnp.float32), {"k": new_k, "v": new_v}

    def apply_seq2seq(
        self,
        params: Params,
        state: Params,
        inputs: jnp.ndarray,  # [B, T, F]
        input_lengths: jnp.ndarray,  # [B]
        labels: jnp.ndarray,  # [B, U]
        label_lengths: jnp.ndarray,  # [B]
        *,
        train: bool,
        dropout_rng: jax.Array | None = None,
    ) -> tuple[jnp.ndarray, Params]:
        """Teacher-forced forward → ``[B, U+1, V]`` logits: position u
        predicts ``labels[:, u]`` for u < length and EOS at u = length."""
        memory, new_state = self.encode(
            params, state, inputs, input_lengths, train=train,
            dropout_rng=dropout_rng,
        )
        b, u = labels.shape
        sos = jnp.full((b, 1), self.sos_eos_id, labels.dtype)
        tokens = jnp.concatenate([sos, labels], axis=1)  # [B, U+1]
        token_valid = (
            jnp.arange(u + 1)[None, :] <= label_lengths[:, None]
        )
        mem_valid = (
            jnp.arange(memory.shape[1])[None, :]
            < self.output_lengths(input_lengths)[:, None]
        )
        dec_rng = (
            None if dropout_rng is None else jax.random.fold_in(dropout_rng, 1)
        )
        logits = self.decode_step_logits(
            params, tokens, token_valid, memory, mem_valid,
            train=train, dropout_rng=dec_rng,
        )
        return logits, new_state
