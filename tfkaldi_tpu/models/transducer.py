"""RNN-T (transducer) model: encoder + prediction network + joint.

The reference has no sequence-transduction model at all (its Classifier
seam ships one DNN and an unfinished CTC trainer, reference
trainer.py:533-570); the transducer is the modern streaming-ASR family —
an acoustic encoder, an autoregressive label predictor, and a joint
network scored by the RNN-T lattice loss (ops/rnnt_loss.py). Selected via
``model = transducer`` + ``loss = rnnt`` in ``[nnet]``.

TPU design — everything is composition over machinery this framework
already optimized:

- the **encoder** is a stock LSTM/GRU stack (models/rnn.py) whose output
  projection doubles as the encoder half of the joint: its Pallas
  bidirectional kernels, custom-VJP scans, masking and mesh partitioning
  all apply unchanged. Unidirectional encoders stream exactly via the
  existing ``apply_stream`` carry path.
- the **prediction network** is the same LSTM machinery over embedded
  label sequences (lengths = label_lengths + 1 after the start token), so
  padding freeze and custom-VJP backward come for free.
- the **joint** is a broadcast add + tanh + one ``[B·T·(U+1), J] @ [J, V]``
  MXU matmul. The ``[B, T, U+1, J]`` activation is the transducer's
  notorious memory hog, so the joint is wrapped in ``jax.checkpoint`` —
  the backward pass rematerializes the tanh instead of storing it,
  trading one cheap VPU pass for the dominant HBM cost.

Blank/start-token convention matches the CTC path: the blank is the extra
final class ``num_labels`` (nnet.py facade), and the prediction network
consumes the blank id as the start-of-sequence token.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.models.rnn import GRU, LSTM, RNNConfig

Params = Any


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    input_dim: int
    num_labels: int  # real labels; blank = num_labels (vocab = num_labels+1)
    enc_type: str = "lstm"  # lstm | gru | transformer | conformer
    enc_layers: int = 2
    enc_units: int = 512
    enc_bidirectional: bool = False  # True = offline-only encoder
    pred_layers: int = 1
    pred_units: int = 320
    embed_dim: int = 128
    joint_units: int = 320
    dropout: float = 1.0  # keep probability (reference semantics, nnet.py:70)
    compute_dtype: Any = jnp.float32
    scan_unroll: int = 8
    scan_impl: str = "auto"
    batch_shards: int = 0
    # fused-loss T-chunk: the [chunk, B, U+1, V] joint block the score path
    # materializes at a time (see lattice_scores); 0 = whole-T in one block
    joint_chunk_t: int = 32
    # pruned (banded) lattice loss: evaluate the joint only on a band of
    # prune_s label positions per frame (k2-style; ops/rnnt_loss.py). 0 =
    # dense. Band placement: "guided" (two-stage, occupancy-centered from a
    # cheap rank-1 proxy) or "diagonal" (linear, zero extra compute).
    prune_s: int = 0
    prune_band: str = "guided"
    # time stride of the guided band's stage-1 proxy lattice: the occupancy
    # scans run at 1/k frame resolution (band placement only needs to track
    # the alignment to within the band width S; the scans are latency-bound
    # on their T sequential steps, so stage 1 shrinks ~k×). 1 = frame rate.
    prune_proxy_stride: int = 4
    # self-attention encoder knobs, passed through verbatim to
    # TransformerConfig.from_config when enc_type is transformer/conformer
    # (num_blocks, d_model, num_heads, ffn_dim, conv_kernel, subsample,
    # attention_left_context, attention_right_context, causal_conv)
    enc_extra: tuple = ()

    @classmethod
    def from_config(cls, conf: dict, input_dim: int, num_labels: int) -> "TransducerConfig":
        return cls(
            input_dim=input_dim,
            num_labels=num_labels,
            enc_type=str(conf.get("enc_type", "lstm")),
            enc_layers=int(conf.get("num_hidden_layers", 2)),
            enc_units=int(conf.get("num_hidden_units", 512)),
            enc_bidirectional=str(conf.get("bidirectional", "False")) == "True",
            pred_layers=int(conf.get("pred_layers", 1)),
            pred_units=int(conf.get("pred_units", 320)),
            embed_dim=int(conf.get("embed_dim", 128)),
            joint_units=int(conf.get("joint_units", 320)),
            dropout=float(conf.get("dropout", 1)),
            compute_dtype=jnp.dtype(conf.get("compute_dtype", "float32")),
            scan_unroll=int(conf.get("scan_unroll", 8)),
            scan_impl=str(conf.get("scan_impl", "auto")),
            joint_chunk_t=int(conf.get("joint_chunk_t", 32)),
            prune_s=int(conf.get("rnnt_prune_s", 0)),
            prune_band=str(conf.get("rnnt_prune_band", "guided")),
            prune_proxy_stride=int(conf.get("rnnt_prune_stride", 4)),
            enc_extra=tuple(
                (k, str(conf[k]))
                for k in (
                    "num_blocks", "d_model", "num_heads", "ffn_dim",
                    "conv_kernel", "subsample", "attention_left_context",
                    "attention_right_context", "causal_conv",
                )
                if k in conf
            ),
        )


class Transducer:
    """Stateless transducer: owns the config, provides init + lattice/greedy
    forwards. Not a frame-classifier — trained with ``loss = rnnt`` and
    decoded by :class:`tfkaldi_tpu.decode.transducer.TransducerDecoder`."""

    def __init__(self, config: TransducerConfig):
        self.config = config
        if config.enc_type in ("transformer", "conformer"):
            # self-attention encoder (models/transformer.py) — the modern
            # conformer-transducer recipe; its `num_labels` output
            # projection doubles as the encoder half of the joint, and its
            # stacking front-end (subsample) shortens the lattice T axis
            from tfkaldi_tpu.models.transformer import (
                Transformer,
                TransformerConfig,
            )

            tconf = dict(config.enc_extra)
            tconf["conformer"] = (
                "True" if config.enc_type == "conformer" else "False"
            )
            tcfg = TransformerConfig.from_config(
                tconf, config.input_dim, config.joint_units
            )
            tcfg = dataclasses.replace(
                tcfg,
                dropout=config.dropout,
                compute_dtype=config.compute_dtype,
            )
            self.encoder = Transformer(tcfg)
        else:
            cell = {"lstm": LSTM, "gru": GRU}.get(config.enc_type)
            if cell is None:
                raise ValueError(f"unknown enc_type {config.enc_type!r}")
            self.encoder = cell(
                RNNConfig(
                    input_dim=config.input_dim,
                    num_labels=config.joint_units,  # encoder half of the joint
                    num_layers=config.enc_layers,
                    hidden_units=config.enc_units,
                    bidirectional=config.enc_bidirectional,
                    dropout=config.dropout,
                    compute_dtype=config.compute_dtype,
                    scan_unroll=config.scan_unroll,
                    scan_impl=config.scan_impl,
                    batch_shards=config.batch_shards,
                )
            )
        self.predictor = LSTM(
            RNNConfig(
                input_dim=config.embed_dim,
                num_labels=config.joint_units,  # the prediction half of the joint
                num_layers=config.pred_layers,
                hidden_units=config.pred_units,
                bidirectional=False,
                dropout=config.dropout,
                compute_dtype=config.compute_dtype,
                scan_unroll=config.scan_unroll,
                scan_impl="xla",  # tiny [B, U] shapes — kernel not worth it
            )
        )

    @property
    def blank_id(self) -> int:
        return self.config.num_labels

    @property
    def vocab_size(self) -> int:
        return self.config.num_labels + 1

    # ------------------------------------------------------------------

    def init(self, rng: jax.Array) -> tuple[Params, Params]:
        cfg = self.config
        ke, kp, k1, k2, k3, k4 = jax.random.split(rng, 6)
        enc, enc_state = self.encoder.init(ke)
        pred, _ = self.predictor.init(kp)
        # the RNN 'out' layers are zero-init (frame-classifier convention);
        # as joint projections they must break symmetry, so re-init them
        # N(0, 1/sqrt(fan_in)) like every other dense layer here
        for p, key in ((enc, k1), (pred, k2)):
            w = p["out"]["w"]
            p["out"] = {
                "w": (jax.random.normal(key, w.shape) / np.sqrt(w.shape[0])).astype(
                    jnp.float32
                ),
                "b": jnp.zeros_like(p["out"]["b"]),
            }
        params = {
            "enc": enc,
            "pred": pred,
            "embed": (
                jax.random.normal(k3, (self.vocab_size, cfg.embed_dim))
                / np.sqrt(cfg.embed_dim)
            ).astype(jnp.float32),
            "joint": {
                "w": (
                    jax.random.normal(k4, (cfg.joint_units, self.vocab_size))
                    / np.sqrt(cfg.joint_units)
                ).astype(jnp.float32),
                "b": jnp.zeros((self.vocab_size,), jnp.float32),
            },
        }
        return params, {"enc": enc_state}

    # ------------------------------------------------------------------

    def output_lengths(self, input_lengths):
        """Valid encoder frames per row — shorter than the input under a
        subsampling encoder front-end (conformer ``subsample``); identity
        for the RNN encoders."""
        fn = getattr(self.encoder, "output_lengths", None)
        return input_lengths if fn is None else fn(input_lengths)

    @property
    def subsample_factor(self) -> int:
        return getattr(self.encoder, "subsample_factor", 1)

    def validate_streamable(self) -> None:
        """Raise unless the encoder supports exact streaming (online
        decode): unidirectional RNNs, or causal time-restricted
        transformers/conformers (their own validate_streamable)."""
        fn = getattr(self.encoder, "validate_streamable", None)
        if fn is not None:
            fn()
            return
        if self.encoder.config.bidirectional:
            raise ValueError(
                "online decoding requires a unidirectional encoder "
                "(bidirectional = False)"
            )

    def encode_stream(self, params, state, chunk, lengths, carry):
        """One streaming encoder chunk → ``(enc [B, Tc', J], n_out [B],
        new carry)``. ``n_out`` is the per-row count of emitted encoder
        frames — ``lengths`` for RNN encoders, ``(fill + v) // s`` under
        a subsampling attention front-end."""
        fn = getattr(self.encoder, "stream_output_lengths", None)
        n_out = lengths if fn is None else fn(carry, lengths)
        enc, carry = self.encoder.apply_stream(
            params["enc"], state.get("enc", {}), chunk, lengths, carry
        )
        return enc, n_out, carry

    def encode_stream_flush(self, params, state, carry):
        """End-of-utterance encoder flush: the final zero-padded partial
        group under a subsampling front-end (``(enc [B, 1, J], n ∈
        {0,1}, carry)``); a count-0 no-op for RNN encoders."""
        fn = getattr(self.encoder, "apply_stream_flush", None)
        if fn is None:
            b = jax.tree.leaves(carry)[0].shape[0]
            return (
                jnp.zeros((b, 1, self.config.joint_units), jnp.float32),
                jnp.zeros((b,), jnp.int32),
                carry,
            )
        return fn(params["enc"], state.get("enc", {}), carry)

    def encode(self, params, state, inputs, input_lengths, *, train,
               dropout_rng=None):
        """``[B, T, F]`` features → ``([B, T', J]`` encoder
        joint-projections, new state). ``T' = output_lengths`` axis under
        a subsampling encoder; ``state`` carries the encoder's running
        statistics (conformer BN) under ``"enc"``."""
        enc, new_enc_state = self.encoder.apply(
            params["enc"], state.get("enc", {}), inputs, input_lengths,
            train=train,
            dropout_rng=None if dropout_rng is None else jax.random.fold_in(dropout_rng, 0),
        )
        return enc, {**state, "enc": new_enc_state}

    def predict(self, params, labels, label_lengths, *, train, dropout_rng=None):
        """``[B, U]`` labels → ``[B, U+1, J]`` prediction joint-projections
        (position u conditions on the first u labels; position 0 is the
        start token = blank)."""
        b = labels.shape[0]
        sos = jnp.full((b, 1), self.blank_id, labels.dtype)
        tokens = jnp.concatenate([sos, labels], axis=1)  # [B, U+1]
        emb = params["embed"][tokens]  # [B, U+1, E]
        pred, _ = self.predictor.apply(
            params["pred"], {}, emb, label_lengths + 1, train=train,
            dropout_rng=None if dropout_rng is None else jax.random.fold_in(dropout_rng, 1),
        )
        return pred

    @staticmethod
    def _joint(joint_params, enc, pred, compute_dtype):
        """``[B, T, J] × [B, U+1, J]`` → ``[B, T, U+1, V]`` logits."""
        h = jnp.tanh(enc[:, :, None, :] + pred[:, None, :, :]).astype(compute_dtype)
        logits = jax.lax.dot_general(
            h,
            joint_params["w"].astype(compute_dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + joint_params["b"]
        return logits.astype(jnp.float32)

    def apply_transducer(
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
        """Full lattice forward → ``[B, T', U+1, V]`` joint logits."""
        enc, new_state = self.encode(
            params, state, inputs, input_lengths, train=train,
            dropout_rng=dropout_rng,
        )
        pred = self.predict(params, labels, label_lengths, train=train, dropout_rng=dropout_rng)
        # remat: the [B, T, U+1, J] tanh is the transducer's HBM hog —
        # recompute it in the backward pass instead of storing it
        joint = jax.checkpoint(
            lambda jp, e, p: self._joint(jp, e, p, self.config.compute_dtype)
        )
        return joint(params["joint"], enc, pred), new_state

    def lattice_scores(
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
    ) -> tuple[jnp.ndarray, jnp.ndarray, Params]:
        """Fused joint→scores: ``(lp_blank [B,T,U+1], lp_label [B,T,U])``
        for :func:`tfkaldi_tpu.ops.rnnt_loss.rnnt_alpha_loss`, computed
        WITHOUT ever holding the full ``[B, T, U+1, V]`` joint-logit tensor.

        The lattice loss only consumes two slivers of the joint
        distribution — the blank column and each row's one target label —
        so normalizing the full vocabulary tensor (and storing it for the
        backward pass) is pure HBM waste: at the bench shape
        (32×256×65×321) the logits alone are 683 MB, and the
        ``log_softmax``+gather formulation streams that tensor through HBM
        several times per step. Here T is processed in
        ``config.joint_chunk_t``-frame blocks under a ``lax.scan`` (one
        `jax.checkpoint` per block, so the backward rematerializes one
        block at a time): per block the joint logits exist only as a
        scan-local intermediate feeding a ``logsumexp`` over V, the blank
        column, and a ``bcuj,buj->bcu`` einsum against the pre-gathered
        target-label columns of the joint weight — the per-T-step outputs
        are O(B·U), not O(B·U·V).
        """
        cfg = self.config
        enc, new_state = self.encode(
            params, state, inputs, input_lengths, train=train,
            dropout_rng=dropout_rng,
        )  # [B, T', J]
        pred = self.predict(params, labels, label_lengths, train=train,
                            dropout_rng=dropout_rng)  # [B, U+1, J]
        b, t_max, j = enc.shape
        u_max = labels.shape[1]
        w = params["joint"]["w"]  # [J, V]
        bias = params["joint"]["b"]  # [V]
        # target-label columns of the joint projection, gathered once:
        # w_sel[b, u, :] = w[:, labels[b, u]]
        w_sel = jnp.take(w, labels, axis=1)  # [J, B, U]
        w_sel = jnp.transpose(w_sel, (1, 2, 0)).astype(cfg.compute_dtype)
        b_sel = bias[labels]  # [B, U]

        chunk = cfg.joint_chunk_t if cfg.joint_chunk_t > 0 else t_max
        chunk = min(chunk, t_max)
        n_chunks = -(-t_max // chunk)
        t_pad = n_chunks * chunk
        if t_pad != t_max:
            # zero-padding: tanh(0 + pred) is finite; the alpha core ignores
            # frames past input_lengths, and we slice back to T below anyway
            enc = jnp.pad(enc, ((0, 0), (0, t_pad - t_max), (0, 0)))
        enc_blocks = jnp.transpose(
            enc.reshape(b, n_chunks, chunk, j), (1, 0, 2, 3)
        )  # [n, B, c, J]

        def block(enc_c):
            # [B, c, U+1, J] activation — the only big intermediate, local
            # to this block (and rematerialized, not stored, for backward)
            h = jnp.tanh(enc_c[:, :, None, :] + pred[:, None, :, :]).astype(
                cfg.compute_dtype
            )
            logits = jax.lax.dot_general(
                h,
                w.astype(cfg.compute_dtype),
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias  # [B, c, U+1, V] f32, block-local
            lse = jax.nn.logsumexp(logits, axis=-1)  # [B, c, U+1]
            lp_blank_c = logits[..., self.blank_id] - lse
            lab = jnp.einsum(
                "bcuj,buj->bcu",
                h[:, :, :u_max, :],
                w_sel,
                preferred_element_type=jnp.float32,
            ) + b_sel[:, None, :]
            lp_label_c = lab - lse[..., :u_max]
            return lp_blank_c, lp_label_c

        def step(carry, enc_c):
            del carry
            return (), jax.checkpoint(block)(enc_c)

        _, (lp_blank, lp_label) = jax.lax.scan(step, (), enc_blocks)
        # [n, B, c, U+1] → [B, T, U+1]
        lp_blank = jnp.transpose(lp_blank, (1, 0, 2, 3)).reshape(
            b, t_pad, u_max + 1
        )[:, :t_max]
        lp_label = jnp.transpose(lp_label, (1, 0, 2, 3)).reshape(
            b, t_pad, u_max
        )[:, :t_max]
        return lp_blank, lp_label, new_state

    def lattice_scores_pruned(
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
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Params]:
        """Pruned fused scores: ``(lp_blank_band [B,T',S], lp_label_band
        [B,T',S], band_starts [B,T'], new_state)`` for
        :func:`tfkaldi_tpu.ops.rnnt_loss.rnnt_alpha_loss_banded`.

        The banded twin of :meth:`lattice_scores`: the joint network is
        evaluated only on ``prune_s`` label positions per encoder frame —
        the T-chunked block materializes a ``[B, c, S, J]`` activation
        instead of ``[B, c, U+1, J]``, cutting the joint matmul FLOPs and
        the rematerialized HBM traffic by ``(U+1)/S``. Band placement per
        ``config.prune_band``: "guided" runs the k2-style stage-1 — a
        rank-1 proxy lattice from separately-normalized encoder/prediction
        projections through the SAME joint weights (no U×V tensor ever),
        forward-backward occupancies, argmax centering (no gradients) —
        while "diagonal" costs nothing and assumes a near-uniform
        alignment. Exactness: whenever the band covers the posterior mass
        the loss and its gradients match the dense path (pinned by
        tests/test_rnnt_pruned.py); the diagonal band guarantees entry and
        exit coverage, the guided band additionally tracks nonuniform
        speaking rate.
        """
        from tfkaldi_tpu.ops.rnnt_loss import (
            diagonal_band_starts,
            guided_band_starts,
            mask_band_label_scores,
        )

        cfg = self.config
        s_range = cfg.prune_s
        enc, new_state = self.encode(
            params, state, inputs, input_lengths, train=train,
            dropout_rng=dropout_rng,
        )  # [B, T', J]
        pred = self.predict(params, labels, label_lengths, train=train,
                            dropout_rng=dropout_rng)  # [B, U+1, J]
        b, t_max, j = enc.shape
        u_max = labels.shape[1]
        enc_lengths = self.output_lengths(input_lengths)
        w = params["joint"]["w"]  # [J, V]
        bias = params["joint"]["b"]  # [V]

        # ---- stage 1: band starts (no gradients) -----------------------
        if cfg.prune_band == "diagonal":
            starts = diagonal_band_starts(
                enc_lengths, label_lengths, t_max, u_max, s_range
            )
        elif cfg.prune_band == "guided":
            enc_sg = jax.lax.stop_gradient(enc)
            pred_sg = jax.lax.stop_gradient(pred)
            w_sg = jax.lax.stop_gradient(w)
            b_sg = jax.lax.stop_gradient(bias)
            # separately-normalized halves of the joint: am[t] + lm[u] is a
            # rank-1 stand-in for the tanh joint — O(BTV + BUV), never BTUV
            am = jax.nn.log_softmax(enc_sg @ w_sg + b_sg, axis=-1)  # [B,T,V]
            lm = jax.nn.log_softmax(pred_sg @ w_sg + b_sg, axis=-1)  # [B,U+1,V]
            proxy_blank = (
                am[..., self.blank_id][:, :, None]
                + lm[..., self.blank_id][:, None, :]
            )  # [B, T, U+1]
            am_sel = jnp.take_along_axis(
                am, labels[:, None, :], axis=2
            )  # [B, T, U]
            lm_sel = jnp.take_along_axis(
                lm[:, :u_max, :], labels[:, :, None], axis=2
            )[..., 0]  # [B, U]
            proxy_label = am_sel + lm_sel[:, None, :]
            starts = guided_band_starts(
                proxy_blank, proxy_label, enc_lengths, label_lengths, s_range,
                proxy_stride=cfg.prune_proxy_stride,
            )
        else:
            raise ValueError(f"unknown prune_band {cfg.prune_band!r}")
        starts = jax.lax.stop_gradient(starts)

        # ---- stage 2: exact banded scores -------------------------------
        # target-label columns of the joint projection (as in the dense
        # fused path), gathered once: w_sel[b, u, :] = w[:, labels[b, u]]
        w_sel = jnp.take(w, labels, axis=1)  # [J, B, U]
        w_sel = jnp.transpose(w_sel, (1, 2, 0)).astype(cfg.compute_dtype)
        b_sel = bias[labels]  # [B, U]

        chunk = cfg.joint_chunk_t if cfg.joint_chunk_t > 0 else t_max
        chunk = min(chunk, t_max)
        n_chunks = -(-t_max // chunk)
        t_pad = n_chunks * chunk
        if t_pad != t_max:
            enc = jnp.pad(enc, ((0, 0), (0, t_pad - t_max), (0, 0)))
            starts_p = jnp.pad(starts, ((0, 0), (0, t_pad - t_max)), mode="edge")
        else:
            starts_p = starts
        enc_blocks = jnp.transpose(
            enc.reshape(b, n_chunks, chunk, j), (1, 0, 2, 3)
        )  # [n, B, c, J]
        start_blocks = jnp.transpose(
            starts_p.reshape(b, n_chunks, chunk), (1, 0, 2)
        )  # [n, B, c]

        s_off = jnp.arange(s_range)

        def block(enc_c, p_c):
            # global label-position indices of the block's bands
            gidx = p_c[:, :, None] + s_off[None, None, :]  # [B, c, S]
            # Band extraction as ONE-HOT MATMULS, not take_along_axis: a
            # generic [B,c,S,J] gather lowers to a slow TPU gather forward
            # and a scatter-add backward, which measured 2.5x SLOWER than
            # the dense path it was meant to beat. A one-hot [B,c,S,U+1]
            # (bf16, tiny) contracted against pred/w_sel rides the MXU in
            # both passes: 2·B·c·S·(U+1)·J FLOPs ≪ the (U+1−S)·J·V joint
            # FLOPs + h-tensor traffic the band saves.
            oh = jax.nn.one_hot(
                jnp.clip(gidx, 0, u_max), u_max + 1, dtype=cfg.compute_dtype
            )  # [B, c, S, U+1]
            pred_band = jnp.einsum(
                "bcsu,buj->bcsj", oh, pred.astype(cfg.compute_dtype)
            )  # [B, c, S, J]
            h = jnp.tanh(
                enc_c.astype(cfg.compute_dtype)[:, :, None, :] + pred_band
            )
            logits = jax.lax.dot_general(
                h,
                w.astype(cfg.compute_dtype),
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias  # [B, c, S, V] f32, block-local
            lse = jax.nn.logsumexp(logits, axis=-1)  # [B, c, S]
            lp_blank_c = logits[..., self.blank_id] - lse
            # label transition at band slot s targets label index p+s
            # (defined for p+s < U; masked afterwards where p+s >= U_b)
            oh_lab = oh[..., :u_max]  # one_hot(gidx, U) ≡ oh minus col U
            w_band = jnp.einsum(
                "bcsu,buj->bcsj", oh_lab, w_sel
            )  # [B, c, S, J]
            b_band = jnp.einsum(
                "bcsu,bu->bcs", oh_lab, b_sel.astype(cfg.compute_dtype)
            ).astype(jnp.float32)
            lab = jnp.einsum(
                "bcsj,bcsj->bcs", h, w_band,
                preferred_element_type=jnp.float32,
            ) + b_band
            lp_label_c = lab - lse
            return lp_blank_c, lp_label_c

        def step(carry, xs):
            del carry
            enc_c, p_c = xs
            return (), jax.checkpoint(block)(enc_c, p_c)

        _, (lp_blank, lp_label) = jax.lax.scan(
            step, (), (enc_blocks, start_blocks)
        )
        lp_blank = jnp.transpose(lp_blank, (1, 0, 2, 3)).reshape(
            b, t_pad, s_range
        )[:, :t_max]
        lp_label = jnp.transpose(lp_label, (1, 0, 2, 3)).reshape(
            b, t_pad, s_range
        )[:, :t_max]
        lp_label = mask_band_label_scores(lp_label, starts, label_lengths)
        return lp_blank, lp_label, starts, new_state

    # -- decode-time pieces (used by decode/transducer.py) ----------------

    def joint_step(self, params, enc_frames, pred_proj):
        """``[B, J] × [B, J]`` → ``[B, V]`` logits for one lattice node."""
        cfg = self.config
        h = jnp.tanh(enc_frames + pred_proj).astype(cfg.compute_dtype)
        return (
            jax.lax.dot_general(
                h,
                params["joint"]["w"].astype(cfg.compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + params["joint"]["b"]
        ).astype(jnp.float32)

    def predict_step(self, params, tokens, advance, carry):
        """One prediction-network step for greedy/beam decode.

        ``tokens [B]`` are the labels to feed; rows with ``advance`` False
        keep their carry and must keep their previous projection (the
        returned row is only valid where ``advance``). Returns
        ``([B, J] projection, new carry)``."""
        emb = params["embed"][tokens][:, None, :]  # [B, 1, E]
        lengths = advance.astype(jnp.int32)  # 0 freezes the carry row
        proj, new_carry = self.predictor.apply_stream(
            params["pred"], {}, emb, lengths, carry
        )
        return proj[:, 0, :], new_carry

    def init_pred_carry(self, batch_size: int):
        return self.predictor.init_stream_carry(batch_size)
