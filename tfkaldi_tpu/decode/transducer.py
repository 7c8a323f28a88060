"""Transducer (RNN-T) greedy decoding — batched offline and streaming.

The reference has no sequence decoder at all (its decode path emits
per-frame likelihoods for Kaldi, nnet.py:246-289); this is the decode side
of the ``model = transducer`` family (models/transducer.py).

TPU design: the entire batched greedy search is ONE jitted program — a
``lax.scan`` over encoder frames whose body runs a bounded
``max_symbols_per_frame`` emission loop (``lax.fori_loop``). Each
iteration evaluates the joint for the whole batch, argmaxes, scatters the
emitted labels into a per-row token buffer (out-of-bounds drop for
non-emitting rows), and advances the prediction network only for rows
that emitted (the carry freeze rides the streaming mask of
``LSTM.apply_stream``). No host round-trips inside an utterance — the
host reads back one ``(tokens, counts)`` pair per batch.

The streaming decoder reuses the same frame scan per chunk, carrying
(encoder state, prediction state, last projection) across calls: greedy
transducer search is strictly causal, so the chunked decode equals the
offline decode at any chunking (pinned by tests/test_transducer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.data.feature_reader import FeatureReader
from tfkaldi_tpu.models.transducer import Transducer


def _scan_frames(model: Transducer, max_symbols: int, params, enc, frame_valid,
                 proj, carry):
    """Greedy-emit over ``enc [B, T, J]`` frames (``frame_valid [B, T]``),
    starting from prediction projection ``proj [B, J]`` and carry.
    Returns ``(tokens [B, T*max_symbols], frames [B, T*max_symbols],
    confs [B, T*max_symbols], counts [B], proj, carry)`` — ``frames[i,
    k]`` is the chunk-relative encoder frame that emitted token ``k``
    (the alignment the transducer lattice gives for free; timestamps
    ride it) and ``confs[i, k]`` that token's softmax posterior at its
    joint step (the greedy path's per-label confidence)."""
    b, t, _ = enc.shape
    buf_len = t * max_symbols
    buf = jnp.zeros((b, buf_len), jnp.int32)
    frame_buf = jnp.zeros((b, buf_len), jnp.int32)
    conf_buf = jnp.zeros((b, buf_len), jnp.float32)
    counts = jnp.zeros((b,), jnp.int32)

    def frame(state, xs):
        proj, carry, buf, frame_buf, conf_buf, counts = state
        enc_t, valid_t, t_idx = xs  # [B, J], [B], scalar

        def sym(_, st):
            proj, carry, buf, frame_buf, conf_buf, counts, active = st
            logits = model.joint_step(params, enc_t, proj)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # argmax token's posterior == exp(max log-softmax)
            tok_conf = jnp.exp(
                jnp.max(jax.nn.log_softmax(logits.astype(jnp.float32), -1), -1)
            )
            emit = active & (tok != model.blank_id) & valid_t
            # write each row's next slot with a masked broadcast-compare,
            # NOT a scatter (a computed-index .at[].set lowers to a
            # serialized per-row scatter on TPU, ~0.4 ms per iteration);
            # non-emitting rows point past the buffer so no slot matches
            pos = jnp.where(emit, counts, buf_len)
            slot = jnp.arange(buf_len)[None, :] == pos[:, None]
            buf = jnp.where(slot, tok[:, None], buf)
            frame_buf = jnp.where(slot, t_idx, frame_buf)
            conf_buf = jnp.where(slot, tok_conf[:, None], conf_buf)
            counts = counts + emit.astype(jnp.int32)
            new_proj, carry = model.predict_step(params, tok, emit, carry)
            proj = jnp.where(emit[:, None], new_proj, proj)
            return proj, carry, buf, frame_buf, conf_buf, counts, emit

        # fori, deliberately NOT an early-exit while_loop: iterations after
        # every row goes blank ARE no-ops, but an in-process forced-readback
        # A/B (v5e, 16×512) put the while variant at 1.22× SLOWER with dense
        # emissions and only parity (0.97×) at zero emission density — the
        # per-iteration `any(active)` cond costs as much as the tiny bodies
        # it could skip
        proj, carry, buf, frame_buf, conf_buf, counts, _ = jax.lax.fori_loop(
            0, max_symbols, sym,
            (proj, carry, buf, frame_buf, conf_buf, counts, jnp.ones((b,), bool)),
        )
        return (proj, carry, buf, frame_buf, conf_buf, counts), None

    (proj, carry, buf, frame_buf, conf_buf, counts), _ = jax.lax.scan(
        frame,
        (proj, carry, buf, frame_buf, conf_buf, counts),
        (jnp.transpose(enc, (1, 0, 2)), jnp.transpose(frame_valid),
         jnp.arange(t, dtype=jnp.int32)),
    )
    return buf, frame_buf, conf_buf, counts, proj, carry


class TransducerDecoder:
    """Batched greedy transducer decoder emitting text transcriptions.

    ``max_symbols_per_frame`` bounds label emissions per encoder frame
    (the standard guard against degenerate loops; 4 covers real speech)."""

    def __init__(
        self,
        model: Transducer,
        params,
        model_state,
        coder,
        *,
        max_symbols_per_frame: int = 4,
    ):
        self.model = model
        self.params = params
        self.model_state = model_state
        self.coder = coder
        self.max_symbols = int(max_symbols_per_frame)
        # per-row encoder-frame index of each label the last decode_batch
        # emitted (the transducer alignment), aligned with its return —
        # and each label's joint-step softmax posterior (confidence)
        self.last_label_frames = None
        self.last_label_confs = None
        self._fn = jax.jit(self._greedy)

    def _greedy(self, params, inputs, lengths):
        model = self.model
        enc, _ = model.encode(
            params, self.model_state, inputs, lengths, train=False
        )  # [B, T', J]
        b, t, _ = enc.shape
        sos = jnp.full((b,), model.blank_id, jnp.int32)
        proj, carry = model.predict_step(
            params, sos, jnp.ones((b,), bool), model.init_pred_carry(b)
        )
        enc_lengths = model.output_lengths(lengths)
        frame_valid = jnp.arange(t)[None, :] < enc_lengths[:, None]
        buf, frame_buf, conf_buf, counts, _, _ = _scan_frames(
            model, self.max_symbols, params, enc, frame_valid, proj, carry
        )
        return buf, frame_buf, conf_buf, counts

    def decode_batch(self, inputs, lengths) -> list[np.ndarray]:
        """``[B, T, F]`` padded features → list of label-id arrays.

        Side effects: ``self.last_label_frames`` holds the per-row ENCODER
        frame index of each emitted label (the transducer alignment),
        aligned with the returned ids — multiply by ``winstep *
        model.subsample_factor`` for seconds; ``self.last_label_confs``
        each label's joint-step softmax posterior."""
        buf, frame_buf, conf_buf, counts = self._fn(
            self.params, jnp.asarray(inputs), jnp.asarray(lengths, jnp.int32)
        )
        buf, counts = np.asarray(buf), np.asarray(counts)
        frame_buf, conf_buf = np.asarray(frame_buf), np.asarray(conf_buf)
        self.last_label_frames = [
            frame_buf[i, : int(counts[i])].astype(np.int64)
            for i in range(buf.shape[0])
        ]
        self.last_label_confs = [
            conf_buf[i, : int(counts[i])].astype(np.float64)
            for i in range(buf.shape[0])
        ]
        return [buf[i, : int(counts[i])].astype(np.int32) for i in range(buf.shape[0])]

    def decode_to_file(
        self,
        reader: FeatureReader,
        outfile: str,
        *,
        batch_size: int = 16,
        bucket_multiple: int = 128,
    ) -> int:
        """Stream the test set and write a Kaldi-style ``text`` file
        (``utt_id transcription`` per line). Returns #utterances."""
        from tfkaldi_tpu.decode.streaming import pick_stream

        count = 0
        with open(outfile, "w") as fid:
            for utt_ids, inputs, lengths in pick_stream(reader)(
                reader, batch_size=batch_size, bucket_multiple=bucket_multiple
            ):
                for utt_id, ids in zip(utt_ids, self.decode_batch(inputs, lengths)):
                    fid.write(f"{utt_id} {self.coder.decode(ids)}\n")
                    count += 1
        return count


class OnlineTransducerDecoder:
    """Streaming greedy transducer decoding for unidirectional encoders.

    Each ``step`` consumes a feature chunk, advances the carried encoder +
    prediction-network state, and returns the label ids newly emitted by
    that chunk. Greedy transducer search is strictly causal, so the
    accumulated stream equals :class:`TransducerDecoder` on the whole
    utterance at ANY chunking — and unlike streaming CTC there is no
    cross-chunk repeat-merge bookkeeping: the lattice emits each label
    exactly once.

    Usage::

        dec = OnlineTransducerDecoder(model, params, state)
        dec.reset(batch_size)
        for chunk, lengths in feature_chunks:    # [B, Tc, F], [B]
            for row, ids in enumerate(dec.step(chunk, lengths)):
                transcript[row].extend(ids)      # partial results
    """

    def __init__(self, model: Transducer, params, model_state,
                 *, max_symbols_per_frame: int = 4):
        model.validate_streamable()
        self.model = model
        self.params = params
        self.model_state = model_state
        self.max_symbols = int(max_symbols_per_frame)
        self._state = None

        def compute(params, chunk, lengths, enc_carry, proj, pred_carry):
            enc, n_out, enc_carry = model.encode_stream(
                params, model_state, chunk, lengths, enc_carry
            )
            valid = jnp.arange(enc.shape[1])[None, :] < n_out[:, None]
            buf, frames, confs, counts, proj, pred_carry = _scan_frames(
                model, self.max_symbols, params, enc, valid, proj, pred_carry
            )
            return buf, frames, confs, counts, n_out, enc_carry, proj, pred_carry

        def flush(params, enc_carry, proj, pred_carry):
            enc, n, enc_carry = model.encode_stream_flush(
                params, model_state, enc_carry
            )
            valid = jnp.arange(enc.shape[1])[None, :] < n[:, None]
            buf, frames, confs, counts, proj, pred_carry = _scan_frames(
                model, self.max_symbols, params, enc, valid, proj, pred_carry
            )
            return buf, frames, confs, counts, n, enc_carry, proj, pred_carry

        self._fn = jax.jit(compute)
        self._flush_fn = jax.jit(flush)
        self._init_fn = jax.jit(
            lambda params, sos, adv, carry: model.predict_step(params, sos, adv, carry)
        )

    def reset(self, batch_size: int) -> None:
        """Start new utterances: zero encoder state, re-prime the
        prediction network with the start token."""
        proj, pred_carry = self._init_fn(
            self.params,
            jnp.full((batch_size,), self.model.blank_id, jnp.int32),
            jnp.ones((batch_size,), bool),
            self.model.init_pred_carry(batch_size),
        )
        self._state = (
            self.model.encoder.init_stream_carry(batch_size),
            proj,
            pred_carry,
        )
        # global encoder-frame counter per row: the base for the per-label
        # frame indices in ``last_label_frames``
        self._frame_base = np.zeros((batch_size,), np.int64)
        self.last_label_frames = None
        self.last_label_confs = None

    def _unpack(self, buf, frames, confs, counts, n_out):
        """Host-side: slice per-row emissions, globalize frame indices,
        advance the per-row frame base by the chunk's valid frames."""
        buf, counts = np.asarray(buf), np.asarray(counts)
        frames, confs = np.asarray(frames), np.asarray(confs)
        n_out = np.asarray(n_out)
        self.last_label_frames = [
            (frames[i, : int(counts[i])] + self._frame_base[i]).astype(np.int64)
            for i in range(buf.shape[0])
        ]
        self.last_label_confs = [
            confs[i, : int(counts[i])].astype(np.float64)
            for i in range(buf.shape[0])
        ]
        self._frame_base += n_out.astype(np.int64)
        return [
            buf[i, : int(counts[i])].astype(np.int32) for i in range(buf.shape[0])
        ]

    def step(self, chunk, lengths) -> list[np.ndarray]:
        """``[B, Tc, F]`` feature chunk (``lengths`` valid frames per row)
        → per-row arrays of NEWLY emitted label ids. Side effect:
        ``last_label_frames`` holds each new label's global encoder-frame
        index (frames since reset), aligned with the return."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before step()")
        # no np.asarray on the chunk: a device array (the fused frontend's
        # output) flows into the jitted step without a host round-trip
        if chunk.shape[1] == 0:
            b = chunk.shape[0]
            self.last_label_frames = [np.zeros((0,), np.int64) for _ in range(b)]
            self.last_label_confs = [np.zeros((0,), np.float64) for _ in range(b)]
            return [np.zeros((0,), np.int32) for _ in range(b)]
        enc_carry, proj, pred_carry = self._state
        buf, frames, confs, counts, n_out, enc_carry, proj, pred_carry = self._fn(
            self.params,
            jnp.asarray(chunk, jnp.float32),
            jnp.asarray(lengths, jnp.int32),
            enc_carry,
            proj,
            pred_carry,
        )
        self._state = (enc_carry, proj, pred_carry)
        return self._unpack(buf, frames, confs, counts, n_out)

    def finish(self) -> list[np.ndarray]:
        """End the utterances: under a subsampling encoder front-end this
        decodes the final zero-padded partial group (the position the
        offline encoder's ``ceil`` length includes); a no-op for RNN
        encoders. Returns the newly emitted label ids per row."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before finish()")
        enc_carry, proj, pred_carry = self._state
        buf, frames, confs, counts, n_out, enc_carry, proj, pred_carry = (
            self._flush_fn(self.params, enc_carry, proj, pred_carry)
        )
        self._state = (enc_carry, proj, pred_carry)
        return self._unpack(buf, frames, confs, counts, n_out)

    # -- per-slot lifecycle (multi-stream serving) ----------------------

    def _merge_state(self, take_mask, new_state, old_state):
        """Row-wise select over the (encoder carry, projection, prediction
        carry) triple — rows where ``take_mask`` take ``new_state``."""
        mask = jnp.asarray(take_mask)
        enc_n, proj_n, pred_n = new_state
        enc_o, proj_o, pred_o = old_state
        return (
            self.model.encoder.merge_stream_carry(mask, enc_n, enc_o),
            jnp.where(mask[:, None], proj_n, proj_o),
            self.model.predictor.merge_stream_carry(mask, pred_n, pred_o),
        )

    def finish_rows(self, rows) -> list[np.ndarray]:
        """``finish()`` for a subset of rows: decode THEIR final partial
        group; other rows' encoder/prediction state is untouched (the
        flush runs batched, then unselected rows' state is restored
        row-wise). Returns the full per-row list — entries outside
        ``rows`` are empty."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before finish_rows()")
        enc_carry, proj, pred_carry = self._state
        b = proj.shape[0]
        sel = np.zeros((b,), bool)
        sel[np.asarray(list(rows), np.int64)] = True
        buf, frames, confs, counts, n_out, enc2, proj2, pred2 = self._flush_fn(
            self.params, enc_carry, proj, pred_carry
        )
        self._state = self._merge_state(
            sel, (enc2, proj2, pred2), (enc_carry, proj, pred_carry)
        )
        # unselected rows emit nothing and their frame clock stands still
        counts = np.where(sel, np.asarray(counts), 0)
        n_out = np.where(sel, np.asarray(n_out), 0)
        return self._unpack(buf, frames, confs, counts, n_out)

    def reset_rows(self, rows) -> None:
        """Re-arm a subset of rows for new utterances: zero their encoder
        state and re-prime their prediction network with the start token;
        other rows keep streaming."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before reset_rows()")
        b = self._state[1].shape[0]
        sel = np.zeros((b,), bool)
        sel[np.asarray(list(rows), np.int64)] = True
        proj0, pred0 = self._init_fn(
            self.params,
            jnp.full((b,), self.model.blank_id, jnp.int32),
            jnp.ones((b,), bool),
            self.model.init_pred_carry(b),
        )
        fresh = (self.model.encoder.init_stream_carry(b), proj0, pred0)
        self._state = self._merge_state(sel, fresh, self._state)
        self._frame_base[sel] = 0


class StreamingTransducerTranscriber:
    """Raw audio chunks → incremental transducer transcripts, end to end.

    The transducer counterpart of ``decode.online.StreamingTranscriber``:
    ``frontend.online.OnlineFeatureExtractor`` (frames emitted as their
    analysis windows complete) → optional CMVN (precomputed speaker stats,
    as the offline pipeline applies them) → streaming transducer search
    (greedy for ``beam_width <= 1``, the frame-synchronous beam search
    otherwise, optionally LM-fused). Both searches are strictly causal,
    so the final transcripts equal the offline pipeline's
    (FeatureExtractor → apply_cmvn → TransducerDecoder /
    TransducerBeamDecoder) on the concatenated audio. Greedy partials are
    stable by construction (every emitted label is final); beam partials
    are the current best hypothesis and may be rewritten as frames
    arrive. Plugs into ``serve.StreamingServer`` via its transcriber
    factory.

    Usage::

        tx = StreamingTransducerTranscriber(online_extractor, model,
                                            params, state, coder, cmvn=stats)
        tx.reset(batch_size)
        for chunk, lengths in audio_chunks:      # [B, S], [B]
            partial = tx.push(chunk, lengths)    # list[str], so far
        final = tx.finish()                      # list[str]
    """

    def __init__(
        self,
        online_extractor,  # frontend.online.OnlineFeatureExtractor
        model: Transducer,
        params,
        model_state,
        coder,
        *,
        cmvn: np.ndarray | None = None,
        max_symbols_per_frame: int = 4,
        beam_width: int = 1,
        fusion_table=None,  # decode/lm.py::DenseFusionTable (beam only)
        max_tokens: int = 1024,
    ):
        self.extractor = online_extractor
        self.coder = coder
        if cmvn is not None and hasattr(online_extractor, "fuse_cmvn"):
            # fused frontend: CMVN rides the single front-end dispatch
            online_extractor.fuse_cmvn(np.asarray(cmvn))
            cmvn = None
        self.cmvn = None if cmvn is None else np.asarray(cmvn)
        self.beam_width = int(beam_width)
        if fusion_table is not None and self.beam_width <= 1:
            raise ValueError(
                "LM shallow fusion needs beam_width > 1 (greedy decoding "
                "has no hypothesis set to rescore)"
            )
        if self.beam_width > 1:
            from tfkaldi_tpu.decode.transducer_beam import (
                OnlineTransducerBeamDecoder,
            )

            self._dec = OnlineTransducerBeamDecoder(
                model, params, model_state,
                beam_width=self.beam_width,
                max_symbols_per_frame=max_symbols_per_frame,
                max_tokens=max_tokens,
                fusion_table=fusion_table,
            )
        else:
            self._dec = OnlineTransducerDecoder(
                model, params, model_state,
                max_symbols_per_frame=max_symbols_per_frame,
            )
        # seconds per ENCODER frame: feature winstep × subsample factor —
        # converts the transducer alignment's frame indices to timestamps
        ext = online_extractor.extractor
        self.frame_seconds = (
            ext.frame_step / ext.rate * int(model.subsample_factor or 1)
        )
        self._ids = None
        self._frames = None  # per-row committed label frame indices
        self._confs = None  # per-row committed label confidences
        self._committed = None  # ids again, surviving finish() for words()

    def reset(self, batch_size: int) -> None:
        self.extractor.reset(batch_size)
        self._dec.reset(batch_size)
        self._ids = [[] for _ in range(batch_size)]
        self._frames = [[] for _ in range(batch_size)]
        self._confs = [[] for _ in range(batch_size)]
        self._committed = [[] for _ in range(batch_size)]

    def _commit(self, per_row_ids) -> None:
        """Fold newly emitted labels + their alignment into the running
        per-row streams (``_committed``/``_frames``/``_confs`` survive
        ``finish()`` so ``timestamps``/``confidences``/``words`` stay
        readable)."""
        for row, ids in enumerate(per_row_ids):
            self._ids[row].extend(ids.tolist())
            self._committed[row].extend(ids.tolist())
        for row, fr in enumerate(self._dec.last_label_frames):
            self._frames[row].extend(fr.tolist())
        for row, cf in enumerate(self._dec.last_label_confs):
            self._confs[row].extend(cf.tolist())

    def _sync_beam_alignment(self) -> None:
        """Beam mode: replace the per-row committed streams WHOLESALE with
        the current best hypothesis' label-time backtrace
        (``OnlineTransducerBeamDecoder.best_alignment``). Beam hypotheses
        are re-ranked in hindsight, so unlike greedy commitments the
        alignment is rewritten, not appended; after ``finish()`` it is
        the final hypothesis' backtrace."""
        for row, (ids, frames, confs) in enumerate(self._dec.best_alignment()):
            self._committed[row] = ids.tolist()
            self._frames[row] = frames.tolist()
            self._confs[row] = confs.tolist()

    def _feed(self, feats: np.ndarray, n_new: np.ndarray) -> list[str]:
        if self.cmvn is not None:
            from tfkaldi_tpu.frontend.cmvn import apply_cmvn

            feats = np.asarray(apply_cmvn(feats, self.cmvn))
        if self.beam_width > 1:
            ids = self._dec.step(feats.astype(np.float32), n_new)
            self._sync_beam_alignment()
            return [self.coder.decode(r) for r in ids]
        self._commit(self._dec.step(feats.astype(np.float32), n_new))
        return [
            self.coder.decode(np.asarray(row, np.int32)) for row in self._ids
        ]

    def push(self, audio_chunk, lengths) -> list[str]:
        """``[B, S]`` audio samples (``lengths`` valid per row) → current
        partial transcripts."""
        if self._ids is None:
            raise RuntimeError("call reset(batch_size) before push()")
        return self._feed(*self.extractor.step(audio_chunk, lengths))

    def finish(self) -> list[str]:
        """Flush the feature tail through the decoder; final transcripts."""
        if self._ids is None:
            raise RuntimeError("call reset(batch_size) before finish()")
        self._feed(*self.extractor.flush())
        # encoder-level flush (subsampling front-end's final partial group)
        if self.beam_width > 1:
            out = [self.coder.decode(r) for r in self._dec.finish()]
            self._sync_beam_alignment()
        else:
            self._commit(self._dec.finish())
            out = [
                self.coder.decode(np.asarray(row, np.int32))
                for row in self._ids
            ]
        # _committed/_frames/_confs survive so the alignment stays readable
        self._ids = None
        return out

    def finish_rows(self, rows) -> list[str]:
        """Finish a subset of rows: flush their feature tails and final
        encoder groups through the shared batched step; other rows keep
        streaming undisturbed. Returns the full per-row transcript list —
        entries at ``rows`` are FINAL (re-arm their slots with
        ``reset_rows`` before reuse)."""
        if self._ids is None:
            raise RuntimeError("call reset(batch_size) before finish_rows()")
        self._feed(*self.extractor.flush_rows(rows))
        if self.beam_width > 1:
            out = [self.coder.decode(r) for r in self._dec.finish_rows(rows)]
            self._sync_beam_alignment()
            return out
        self._commit(self._dec.finish_rows(rows))
        return [
            self.coder.decode(np.asarray(row, np.int32)) for row in self._ids
        ]

    def reset_rows(self, rows) -> None:
        """Re-arm a subset of rows for new streams (the per-slot analog
        of ``reset``); other rows keep streaming."""
        if self._ids is None:
            raise RuntimeError("call reset(batch_size) before reset_rows()")
        self.extractor.reset_rows(rows)
        self._dec.reset_rows(rows)
        for row in rows:
            self._ids[int(row)] = []
            self._frames[int(row)] = []
            self._confs[int(row)] = []
            self._committed[int(row)] = []

    def timestamps(self) -> list[np.ndarray]:
        """Per-row emission time in SECONDS of every committed label, in
        audio-stream time since that row's reset (aligned with the
        transcript's labels). A label's time is the start of the encoder
        frame whose joint step emitted it — the alignment the transducer
        lattice defines. Remains readable after ``finish()``; per-slot
        streams read it after ``finish_rows`` and before ``reset_rows``."""
        if self._frames is None:
            raise RuntimeError("call reset(batch_size) before timestamps()")
        return [
            np.asarray(row, np.float64) * self.frame_seconds
            for row in self._frames
        ]

    def confidences(self) -> list[np.ndarray]:
        """Per-row confidence of every committed label (the emitted
        token's joint-step softmax posterior, in [0, 1]), aligned with the
        transcript's labels; same lifecycle as ``timestamps()``."""
        if self._confs is None:
            raise RuntimeError("call reset(batch_size) before confidences()")
        return [np.asarray(row, np.float64) for row in self._confs]

    def words(self) -> list[list]:
        """Per-row word alignments: committed labels grouped at the
        coder's ``<space>`` token into ``WordAlignment(word, start, end,
        confidence)`` spans (see decode/words.py); same lifecycle as
        ``timestamps()``."""
        from tfkaldi_tpu.decode.words import group_words

        if self._committed is None:
            raise RuntimeError("call reset(batch_size) before words()")
        times, confs = self.timestamps(), self.confidences()
        return [
            group_words(
                [self.coder.alphabet[i] for i in ids], times[r], confs[r],
                self.frame_seconds,
            )
            for r, ids in enumerate(self._committed)
        ]
