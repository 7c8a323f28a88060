"""Recurrent (LSTM) acoustic model.

The reference defines a Classifier interface (classifiers/classifier.py:6-37)
but ships only the feed-forward DNN; its CTC trainer — intended for
sequence models — was never finished (trainer.py:533-570). This LSTM is the
sequence-model counterpart, built on the same functional contract as
:class:`tfkaldi_tpu.models.dnn.DNN` (``init``/``apply`` with
``(logits, new_state)``), so the Trainer, controller, decoders and mesh
sharding work unchanged.

TPU design:

- time recurrence via ``lax.scan`` over ``[T, B, ...]`` (static shapes,
  one compiled step reused across time)
- the input projections of every gate for the whole sequence are ONE
  batched matmul ``[B·T, in] @ [in, 4H]`` outside the scan (MXU-friendly);
  only the recurrent matmul ``[B, H] @ [H, 4H]`` lives in the scan body
- per-step masking freezes the carry at each utterance's end, so logits at
  valid frames are invariant to padding length
- matmuls run in ``compute_dtype`` (bf16 on the MXU) with f32 accumulation;
  the carry stays f32 for stable long-sequence recurrence
- the recurrence runs through :func:`tfkaldi_tpu.ops.lstm_scan.lstm_scan`,
  a custom-VJP scan whose hand-written backward is ~1.9x faster than
  autodiff-of-scan on v5e (minimal residuals, weight gradient hoisted out
  of the loop); gradients match autodiff to float32 rounding noise
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.ops import pallas_lstm
from tfkaldi_tpu.ops.gru_scan import gru_scan
from tfkaldi_tpu.ops.lstm_scan import lstm_scan
from tfkaldi_tpu.ops.pallas_gru import gru_scan_bidi
from tfkaldi_tpu.ops.pallas_lstm import lstm_scan_bidi

Params = Any


@dataclasses.dataclass(frozen=True)
class RNNConfig:
    input_dim: int
    num_labels: int
    num_layers: int = 2
    hidden_units: int = 512
    bidirectional: bool = False
    dropout: float = 1.0  # keep probability, reference semantics (nnet.py:70)
    compute_dtype: Any = jnp.float32
    # lax.scan unroll factor: amortizes per-step loop overhead of the small
    # recurrent matmul (measured on v5e: 315k -> 374k frames/s at 8)
    scan_unroll: int = 8
    # recurrence implementation: 'auto' uses the interleaved-direction
    # Pallas kernel (ops/pallas_lstm.py, 1.4x the XLA scans on v5e) for
    # bidirectional layers on TPU when shapes allow (batch-partitioned
    # across a mesh via custom_partitioning), and
    # the custom-VJP XLA scan otherwise; 'xla' / 'pallas' force one
    scan_impl: str = "auto"
    # how many ways the BATCH axis is sharded at apply time (the mesh's
    # data-axis size; 1 = unsharded). 0 = unknown: 'auto' then assumes the
    # worst case (sharded over every device) and may conservatively fall
    # back to the XLA scan. The driver pins this from its mesh (nnet.py).
    batch_shards: int = 0

    @classmethod
    def from_config(cls, conf: dict, input_dim: int, num_labels: int) -> "RNNConfig":
        return cls(
            input_dim=input_dim,
            num_labels=num_labels,
            num_layers=int(conf.get("num_hidden_layers", 2)),
            hidden_units=int(conf.get("num_hidden_units", 512)),
            bidirectional=str(conf.get("bidirectional", "False")) == "True",
            dropout=float(conf.get("dropout", 1)),
            compute_dtype=jnp.dtype(conf.get("compute_dtype", "float32")),
            scan_unroll=int(conf.get("scan_unroll", 8)),
            scan_impl=str(conf.get("scan_impl", "auto")),
        )


class LSTM:
    """Stateless model object: owns the config, provides init/apply."""

    # gate blocks per cell (4 = i,f,g,o); the GRU subclass narrows to 3
    GATES = 4

    def __init__(self, config: RNNConfig):
        self.config = config

    def _init_bias(self, h: int) -> jnp.ndarray:
        # forget-gate bias 1.0 (standard LSTM practice)
        return jnp.zeros((4 * h,), jnp.float32).at[h : 2 * h].set(1.0)

    # ------------------------------------------------------------------

    def init(self, rng: jax.Array) -> tuple[Params, Params]:
        cfg = self.config
        directions = 2 if cfg.bidirectional else 1
        layers = []
        fan_in = cfg.input_dim
        keys = jax.random.split(rng, cfg.num_layers * directions * 2)
        k = iter(keys)
        for _ in range(cfg.num_layers):
            dirs = []
            for _ in range(directions):
                h = cfg.hidden_units
                dirs.append(
                    {
                        # gate order: i, f, g, o (GRU: r, z, n)
                        "wx": (
                            jax.random.normal(next(k), (fan_in, self.GATES * h))
                            / np.sqrt(fan_in)
                        ).astype(jnp.float32),
                        "wh": (
                            jax.random.normal(next(k), (h, self.GATES * h)) / np.sqrt(h)
                        ).astype(jnp.float32),
                        "b": self._init_bias(h),
                    }
                )
            layers.append(dirs)
            fan_in = cfg.hidden_units * directions
        params = {
            "layers": layers,
            "out": {
                "w": jnp.zeros((fan_in, cfg.num_labels), jnp.float32),
                "b": jnp.zeros((cfg.num_labels,), jnp.float32),
            },
        }
        return params, {}

    def reinit_output_layer(self, params: Params) -> Params:
        out = {
            "w": jnp.zeros_like(params["out"]["w"]),
            "b": jnp.zeros_like(params["out"]["b"]),
        }
        return {**params, "out": out}

    # ------------------------------------------------------------------

    def _run_layer(self, dirs, x, mask):
        """One (bi)directional LSTM layer over ``x [T, B, F]`` with
        ``mask [T, B, 1]``; returns ``[T, B, H·directions]``.

        Each direction's whole-sequence input projection is one MXU matmul
        ``[T·B, F] @ [F, 4H]`` (kept separate per direction: a combined
        matmul would be re-sliced per scan, and the materialized slice
        copies measure slower than the second matmul dispatch). The
        recurrences run through :func:`lstm_scan`, natively reversed for
        the backward direction — no flip copies. The mask freezes the
        carry past each utterance's end so padding cannot leak into valid
        frames or final states; padded outputs are zeroed.
        """
        cfg = self.config
        h_units = cfg.hidden_units
        t, b, f = x.shape
        x_flat = x.reshape(t * b, f).astype(cfg.compute_dtype)

        def gates(d):
            return jax.lax.dot_general(
                x_flat,
                d["wx"].astype(cfg.compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(t, b, self.GATES * h_units) + d["b"].astype(jnp.float32)

        if len(dirs) == 2 and self._use_pallas(t, b, h_units):
            ysf, ysb = self._scan_bidi(
                gates(dirs[0]), gates(dirs[1]), dirs[0]["wh"], dirs[1]["wh"],
                mask,
            )
            return jnp.concatenate([ysf, ysb], axis=-1)

        outs = [
            self._scan(gates(d), d["wh"], mask, reverse=k == 1)
            for k, d in enumerate(dirs)
        ]
        return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]

    def _scan(self, gx, wh, mask, *, reverse):
        cfg = self.config
        return lstm_scan(gx, wh, mask, cfg.compute_dtype, cfg.scan_unroll,
                         reverse=reverse)

    def _scan_bidi(self, gxf, gxb, whf, whb, mask):
        return lstm_scan_bidi(gxf, gxb, whf, whb, mask, self.config.compute_dtype)

    # -- streaming (online) inference --------------------------------------
    #
    # The reference has no serving story (a batch-1 graph rebuilt per
    # decode run, decoder.py:8-47); this adds low-latency STREAMING
    # inference: process feature chunks as they arrive, carrying the
    # recurrent state across calls, with valid-frame outputs identical to
    # the offline whole-utterance forward (same per-step op order as
    # lstm_scan/gru_scan). Unidirectional models only — the backward
    # direction would need the whole future.

    _CARRIES = 2  # (h, c); the GRU narrows to 1

    def init_stream_carry(self, batch_size: int):
        """Zero recurrent state: one tuple per layer."""
        cfg = self.config
        if cfg.bidirectional:
            raise ValueError(
                "streaming requires a unidirectional model (bidirectional "
                "= False): the backward direction needs the whole future"
            )
        zeros = jnp.zeros((batch_size, cfg.hidden_units), jnp.float32)
        return [tuple(zeros for _ in range(self._CARRIES))
                for _ in range(cfg.num_layers)]

    def merge_stream_carry(self, take_mask, new, old):
        """Row-wise select over stream carries: rows where ``take_mask``
        (bool ``[B]``) is True take ``new``, others keep ``old``. Every
        RNN carry leaf is batch-major ``[B, H]``. Used by multi-stream
        serving to finish/reset one slot without disturbing the rest
        (the reference serves one utterance per rebuilt batch-1 graph,
        decoder.py:8-47 — no such concept exists there)."""
        mask = jnp.asarray(take_mask)

        def sel(a, b):
            return jnp.where(mask.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)

        return jax.tree.map(sel, new, old)

    def _stream_step(self, cd, whc):
        return _lstm_stream_step(cd, whc)

    def apply_stream(
        self,
        params: Params,
        state: Params,
        chunk: jnp.ndarray,  # [B, Tc, F]
        seq_lengths: jnp.ndarray,  # [B] valid frames in THIS chunk
        carry,
    ) -> tuple[jnp.ndarray, Any]:
        """One streaming step: ``[B, Tc, F]`` chunk → ``([B, Tc, O]``
        logits, updated carry). Eval mode only (no dropout). Frames past
        ``seq_lengths`` leave the carry untouched, so a ragged final
        chunk behaves like the offline mask freeze."""
        cfg = self.config
        if cfg.bidirectional:
            raise ValueError("streaming requires bidirectional = False")
        b, t, _ = chunk.shape
        x = jnp.transpose(chunk, (1, 0, 2)).astype(jnp.float32)  # [T, B, F]
        mask = (jnp.arange(t)[:, None] < seq_lengths[None, :])[:, :, None].astype(
            jnp.float32
        )

        new_carry = []
        for l, dirs in enumerate(params["layers"]):
            d = dirs[0]
            tt, bb, f = x.shape
            gx = jax.lax.dot_general(
                x.reshape(tt * bb, f).astype(cfg.compute_dtype),
                d["wx"].astype(cfg.compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(tt, bb, -1) + d["b"].astype(jnp.float32)
            step = self._stream_step(cfg.compute_dtype,
                                     d["wh"].astype(cfg.compute_dtype))
            layer_carry, x = jax.lax.scan(
                step, tuple(carry[l]), (gx, mask), unroll=cfg.scan_unroll
            )
            new_carry.append(layer_carry)

        logits = jax.lax.dot_general(
            x.reshape(t * b, x.shape[-1]).astype(cfg.compute_dtype),
            params["out"]["w"].astype(cfg.compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + params["out"]["b"]
        logits = logits.reshape(t, b, cfg.num_labels).transpose(1, 0, 2)
        return logits.astype(jnp.float32), new_carry

    def _use_pallas(self, t: int, b: int, h_units: int) -> bool:
        impl = self.config.scan_impl
        if impl == "xla":
            return False
        ok = pallas_lstm.supported(t, b, h_units)
        if impl == "pallas":
            if not ok:
                raise ValueError(
                    f"scan_impl='pallas' needs T%{pallas_lstm.CHUNK}==0, "
                    f"B%8==0, H%128==0; got T={t} B={b} H={h_units}"
                )
            return True
        # 'auto' under multiple devices: the custom_partitioning rule shards
        # the BATCH axis, so each device runs the kernel on its local shard —
        # the shape gate must hold for the local batch. `batch_shards` (the
        # mesh's data-axis size, pinned by the driver) gives the exact shard
        # count; when unknown (0), assume the worst case of sharding over
        # every device (any real mesh's data axis divides n_dev, so its
        # local batch is a multiple of b/n_dev). Falls back to the XLA scan
        # when the local shard could violate B%8==0 (explicit
        # scan_impl='pallas' bypasses this — the caller pins the mesh and
        # takes responsibility).
        shards = self.config.batch_shards or jax.device_count()
        if shards > 1:
            ok = ok and b % shards == 0 and pallas_lstm.supported(t, b // shards, h_units)
        return ok and pallas_lstm.available()

    def apply(
        self,
        params: Params,
        state: Params,
        inputs: jnp.ndarray,  # [B, T, F]
        seq_lengths: jnp.ndarray,  # [B]
        *,
        train: bool,
        dropout_rng: jax.Array | None = None,
    ) -> tuple[jnp.ndarray, Params]:
        cfg = self.config
        b, t, _ = inputs.shape
        x = jnp.transpose(inputs, (1, 0, 2)).astype(jnp.float32)  # [T, B, F]
        mask = (jnp.arange(t)[:, None] < seq_lengths[None, :])[:, :, None].astype(
            jnp.float32
        )

        for l, dirs in enumerate(params["layers"]):
            x = self._run_layer(dirs, x, mask)
            if train and cfg.dropout < 1:
                if dropout_rng is None:
                    raise ValueError("dropout requires dropout_rng in training mode")
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, l), cfg.dropout, x.shape
                )
                x = jnp.where(keep, x / cfg.dropout, 0.0)

        logits = jax.lax.dot_general(
            x.reshape(t * b, x.shape[-1]).astype(cfg.compute_dtype),
            params["out"]["w"].astype(cfg.compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + params["out"]["b"]
        logits = logits.reshape(t, b, cfg.num_labels).transpose(1, 0, 2)
        return logits.astype(jnp.float32), state


class GRU(LSTM):
    """GRU acoustic model (``model = gru``): same Classifier contract,
    config keys, masking, bidirectionality, ``scan_impl`` selector and
    trainer/decoder integration as the LSTM — only the cell differs
    (fused/CuDNN GRU formulation, ops/gru_scan.py: one ``[B,H]@[H,3H]``
    recurrent matmul per step, custom-VJP backward; bidirectional layers
    ride the interleaved-direction Pallas kernel, ops/pallas_gru.py).
    ~3/4 of the LSTM's gate FLOPs and no cell state, so it trades a
    little capacity for step speed.
    """

    GATES = 3
    _CARRIES = 1  # (h,)

    def _init_bias(self, h: int) -> jnp.ndarray:
        return jnp.zeros((3 * h,), jnp.float32)

    def _scan(self, gx, wh, mask, *, reverse):
        cfg = self.config
        return gru_scan(gx, wh, mask, cfg.compute_dtype, cfg.scan_unroll,
                        reverse=reverse)

    def _scan_bidi(self, gxf, gxb, whf, whb, mask):
        return gru_scan_bidi(gxf, gxb, whf, whb, mask, self.config.compute_dtype)

    def _stream_step(self, cd, whc):
        return _gru_stream_step(cd, whc)


# ---------------------------------------------------------------------------
# streaming (online) inference for the recurrent families
# ---------------------------------------------------------------------------
#
# The reference has no serving story at all (a batch-1 graph rebuilt per
# decode run, decoder.py:8-47); tfkaldi_tpu.serve adds batch serving, and
# this adds LOW-LATENCY streaming: process feature chunks as they arrive,
# carrying the recurrent state across calls, with outputs bit-identical
# to the offline whole-utterance forward (eval mode, same op order as
# lstm_scan/gru_scan). Unidirectional models only — a backward direction
# would need the future.


def _lstm_stream_step(cd, whc):
    def step(carry, xs):
        h, c = carry
        gxt, m = xs
        gates = gxt + jax.lax.dot_general(
            h.astype(cd), whc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hdim = h.shape[1]
        i = jax.nn.sigmoid(gates[:, :hdim])
        f = jax.nn.sigmoid(gates[:, hdim: 2 * hdim])
        g = jnp.tanh(gates[:, 2 * hdim: 3 * hdim])
        o = jax.nn.sigmoid(gates[:, 3 * hdim:])
        c_cand = f * c + i * g
        h_cand = o * jnp.tanh(c_cand)
        h_new = jnp.where(m, h_cand, h)
        c_new = jnp.where(m, c_cand, c)
        return (h_new, c_new), h_new * m

    return step


def _gru_stream_step(cd, whc):
    def step(carry, xs):
        (h,) = carry
        gxt, m = xs
        gh = jax.lax.dot_general(
            h.astype(cd), whc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hdim = h.shape[1]
        r = jax.nn.sigmoid(gxt[:, :hdim] + gh[:, :hdim])
        z = jax.nn.sigmoid(gxt[:, hdim: 2 * hdim] + gh[:, hdim: 2 * hdim])
        n = jnp.tanh(gxt[:, 2 * hdim:] + r * gh[:, 2 * hdim:])
        h_new = jnp.where(m, (1.0 - z) * n + z * h, h)
        return (h_new,), h_new * m

    return step


