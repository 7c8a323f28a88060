"""Streaming (online) likelihood emission.

The reference's serving story is a batch-1 TF graph rebuilt per decode
run over whole utterances (neuralNetworks/decoder.py:8-47,
nnet.py:246-289). ``tfkaldi_tpu.serve`` already replaces that with a
model-resident batch service; this module adds the LOW-LATENCY variant:
emit prior-normalized log pseudo-likelihoods chunk by chunk as audio
arrives, carrying the recurrent state across calls — for unidirectional
``model = lstm`` / ``model = gru``. Valid-frame outputs are identical to
the offline batched decoder on the concatenated utterance (same op order
as the training scans; tests/test_online.py pins the equality).

The chunk forward is jitted once per chunk shape; keep the chunk length
fixed (e.g. 16 or 32 frames) to avoid recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float64).eps)


def _validate_streamable(model) -> None:
    """Streaming needs a strictly causal model: unidirectional RNNs, or a
    transformer that declares itself streamable (finite left context,
    zero right context, causal conv — models/transformer.py)."""
    if getattr(model.config, "bidirectional", False):
        raise ValueError(
            "online decoding requires a unidirectional model "
            "(bidirectional = False)"
        )
    check = getattr(model, "validate_streamable", None)
    if check is not None:
        check()


class OnlineRecurrentDecoder:
    """Carry-based streaming emitter for unidirectional LSTM/GRU models.

    Usage::

        dec = OnlineRecurrentDecoder(model, params, model_state, prior)
        dec.reset(batch_size)
        for chunk, lengths in feature_chunks:   # [B, Tc, F], [B]
            log_likes = dec.step(chunk, lengths)  # [B, Tc, O]
    """

    def __init__(self, model, params, model_state, prior: np.ndarray):
        _validate_streamable(model)
        if getattr(model, "subsample_factor", 1) != 1:
            raise ValueError(
                "hybrid likelihood emission is per input frame; a "
                "subsampling front-end has no 1:1 alignment (it is a "
                "ctc/rnnt/attention-only recipe)"
            )
        self.model = model
        self.params = params
        self.model_state = model_state
        self.prior = np.asarray(prior, dtype=np.float32)
        self._carry = None

        def compute(chunk, lengths, carry, params, model_state):
            logits, new_carry = model.apply_stream(
                params, model_state, chunk, lengths, carry
            )
            posteriors = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            likes = posteriors / jnp.asarray(self.prior)[None, None, :]
            # the reference computed this floor and discarded it
            # (nnet.py:283); applied for real here, as in decode/decoder.py
            likes = jnp.where(likes == 0, _EPS, likes)
            return jnp.log(likes), new_carry

        self._fn = jax.jit(compute)

    def reset(self, batch_size: int) -> None:
        """Start new utterances: zero the recurrent state."""
        self._carry = self.model.init_stream_carry(batch_size)

    def step(self, chunk, lengths) -> jnp.ndarray:
        """``[B, Tc, F]`` chunk (``lengths`` valid frames per row) →
        ``[B, Tc, O]`` log pseudo-likelihoods; advances the carry."""
        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before step()")
        if chunk.shape[1] == 0:
            # empty chunk (e.g. a feature flush that added no frames)
            return jnp.zeros(
                (chunk.shape[0], 0, self.prior.shape[0]), jnp.float32
            )
        out, self._carry = self._fn(
            jnp.asarray(chunk, jnp.float32),
            jnp.asarray(lengths, jnp.int32),
            self._carry,
            self.params,
            self.model_state,
        )
        return out


class OnlineCTCDecoder:
    """Streaming greedy (best-path) CTC transcription for unidirectional
    LSTM/GRU: each ``step`` returns the label ids newly emitted by that
    chunk, with repeats merged correctly across chunk boundaries. The
    accumulated stream equals offline best-path decoding of the whole
    utterance (decode/ctc.py with ``beam_width=1``).

    Usage::

        dec = OnlineCTCDecoder(model, params, model_state, blank_id)
        dec.reset(batch_size)
        for chunk, lengths in feature_chunks:
            for row, new_ids in enumerate(dec.step(chunk, lengths)):
                transcript[row].extend(new_ids)   # partial results
    """

    def __init__(self, model, params, model_state, blank_id: int):
        _validate_streamable(model)
        self.model = model
        self.params = params
        self.model_state = model_state
        self.blank_id = int(blank_id)
        self._carry = None
        self._prev = None  # last raw frame label per row (cross-chunk dedupe)
        # global decoder-output-frame counter per row: the base for the
        # per-label frame indices in ``last_label_frames``
        self._frame_base = None
        # last chunk's raw per-frame argmax labels [B, T] + valid counts
        # [B] — consumed by decode/endpoint.py::Endpointer
        self.last_frame_labels = None
        self.last_n_out = None
        # per-row frame index (decoder output frames since reset) of each
        # label the last step()/finish() emitted — aligned with its return
        # — and that label's softmax posterior at the emission frame
        self.last_label_frames = None
        self.last_label_confs = None

        def path_conf(logits):
            """Per-frame argmax label + its softmax posterior (the greedy
            path's frame confidence: exp of the max log-softmax)."""
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return (
                jnp.argmax(logits, axis=-1).astype(jnp.int32),
                jnp.exp(jnp.max(lp, axis=-1)),
            )

        def compute(chunk, lengths, carry, params, model_state):
            # under a subsampling front-end the emitted-position count
            # differs from the input-frame count
            out_fn = getattr(model, "stream_output_lengths", None)
            n_out = lengths if out_fn is None else out_fn(carry, lengths)
            logits, new_carry = model.apply_stream(
                params, model_state, chunk, lengths, carry
            )
            paths, conf = path_conf(logits)
            return paths, conf, n_out, new_carry

        self._fn = jax.jit(compute)
        self._path_conf = jax.jit(path_conf)
        flush_fn = getattr(model, "apply_stream_flush", None)
        self._flush_fn = None
        if flush_fn is not None:
            self._flush_fn = jax.jit(
                lambda carry, params, model_state: flush_fn(
                    params, model_state, carry
                )
            )

    def reset(self, batch_size: int) -> None:
        self._carry = self.model.init_stream_carry(batch_size)
        self._prev = np.full((batch_size,), -1, np.int64)
        self._frame_base = np.zeros((batch_size,), np.int64)

    def _collapse(self, paths, n_out, confs=None):
        out = []
        frames = []
        label_confs = []
        for row in range(paths.shape[0]):
            p = paths[row, : int(n_out[row])]
            if p.size == 0:
                out.append(np.zeros((0,), np.int32))
                frames.append(np.zeros((0,), np.int64))
                label_confs.append(np.zeros((0,), np.float64))
                continue
            keep = np.ones(p.shape[0], dtype=bool)
            keep[0] = p[0] != self._prev[row]
            keep[1:] = p[1:] != p[:-1]
            idx = np.flatnonzero(keep)
            collapsed = p[idx]
            nonblank = collapsed != self.blank_id
            out.append(collapsed[nonblank].astype(np.int32))
            # frame of each emitted label = the first frame of its run;
            # its confidence = the posterior AT that frame (deterministic
            # and chunking-invariant, unlike a run maximum — a run can
            # straddle a chunk boundary)
            frames.append(idx[nonblank] + self._frame_base[row])
            if confs is not None:
                label_confs.append(
                    confs[row, idx[nonblank]].astype(np.float64)
                )
            self._prev[row] = p[-1]
            self._frame_base[row] += p.shape[0]
        self.last_label_frames = frames
        if confs is not None:
            self.last_label_confs = label_confs
        return out

    def step(self, chunk, lengths) -> list[np.ndarray]:
        """``[B, Tc, F]`` chunk → per-row arrays of NEWLY emitted label
        ids (repeats merged across the chunk boundary, blanks dropped)."""
        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before step()")
        # no np.asarray on the chunk: a device array (the fused frontend's
        # output) flows into the jitted step without a host round-trip
        lengths = np.asarray(lengths, np.int32)
        if chunk.shape[1] == 0:
            # empty chunk (e.g. a feature flush that added no frames)
            return self._empty_step(chunk.shape[0])
        paths, conf, n_out, self._carry = self._fn(
            jnp.asarray(chunk, jnp.float32),
            jnp.asarray(lengths, jnp.int32),
            self._carry,
            self.params,
            self.model_state,
        )
        self.last_frame_labels = np.asarray(paths)
        self.last_n_out = np.asarray(n_out)
        return self._collapse(
            self.last_frame_labels, self.last_n_out, np.asarray(conf)
        )

    def _empty_step(self, b: int) -> list[np.ndarray]:
        self.last_frame_labels = np.zeros((b, 0), np.int32)
        self.last_n_out = np.zeros((b,), np.int32)
        self.last_label_frames = [np.zeros((0,), np.int64) for _ in range(b)]
        self.last_label_confs = [np.zeros((0,), np.float64) for _ in range(b)]
        return [np.zeros((0,), np.int32) for _ in range(b)]

    def finish(self) -> list[np.ndarray]:
        """End the utterances: decode the subsampling front-end's final
        zero-padded partial group (offline's ceil tail); a no-op for 1:1
        models. Returns newly emitted label ids per row."""
        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before finish()")
        b = self._prev.shape[0]
        if self._flush_fn is None:
            return self._empty_step(b)
        logits, n, self._carry = self._flush_fn(
            self._carry, self.params, self.model_state
        )
        paths, conf = self._path_conf(logits)
        self.last_frame_labels = np.asarray(paths)
        self.last_n_out = np.asarray(n)
        return self._collapse(
            self.last_frame_labels, self.last_n_out, np.asarray(conf)
        )

    def finish_rows(self, rows) -> list[np.ndarray]:
        """``finish()`` for a subset of rows: decode THEIR final partial
        group; other rows' carry and collapse state are untouched (the
        flush runs batched on device, then the unselected rows' carry is
        restored row-wise). Returns the full per-row list — entries
        outside ``rows`` are empty. Multi-stream serving uses this to end
        one slot of a shared batch."""
        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before finish_rows()")
        b = self._prev.shape[0]
        sel = np.zeros((b,), bool)
        sel[np.asarray(list(rows), np.int64)] = True
        if self._flush_fn is None:
            return self._empty_step(b)
        old_carry = self._carry
        logits, n, flushed = self._flush_fn(
            old_carry, self.params, self.model_state
        )
        self._carry = self.model.merge_stream_carry(
            jnp.asarray(sel), flushed, old_carry
        )
        paths, conf = self._path_conf(logits)
        self.last_frame_labels = np.asarray(paths)
        self.last_n_out = np.where(sel, np.asarray(n), 0).astype(np.int32)
        return self._collapse(
            self.last_frame_labels, self.last_n_out, np.asarray(conf)
        )

    def reset_rows(self, rows) -> None:
        """Re-arm a subset of rows for new utterances (the per-slot
        analog of ``reset``); other rows keep streaming."""
        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before reset_rows()")
        b = self._prev.shape[0]
        sel = np.zeros((b,), bool)
        idx = np.asarray(list(rows), np.int64)
        sel[idx] = True
        self._carry = self.model.merge_stream_carry(
            jnp.asarray(sel), self.model.init_stream_carry(b), self._carry
        )
        self._prev[idx] = -1
        self._frame_base[idx] = 0


class OnlineCTCBeamDecoder:
    """Streaming CTC prefix beam search for unidirectional LSTM/GRU.

    The device emits each chunk's frame log-posteriors through the carried
    recurrent state (one dispatch per chunk); the prefix-beam recursion
    advances on the host frame by frame using the SAME ``beam_step`` as
    the offline search (`decode/ctc_beam.py`), whose only state is the
    prefix→(p_blank, p_nonblank) map — so the chunked decode is exactly
    the offline `ctc_beam_search_py` on the concatenated utterance,
    regardless of chunking. ``step`` returns the current best hypothesis
    per row; ``stable_prefixes`` returns the committed part (the longest
    prefix shared by every live beam entry), which can only grow and is
    safe to surface to the user mid-utterance.

    Usage::

        dec = OnlineCTCBeamDecoder(model, params, state, blank_id, beam_width=16)
        dec.reset(batch_size)
        for chunk, lengths in feature_chunks:
            best = dec.step(chunk, lengths)     # per-row current-best ids
            stable = dec.stable_prefixes()      # per-row committed ids
        final = dec.best()                      # == offline beam search
    """

    def __init__(
        self, model, params, model_state, blank_id: int, beam_width: int = 16,
        fusion_scorer=None,
    ):
        _validate_streamable(model)
        self.model = model
        self.params = params
        self.model_state = model_state
        self.blank_id = int(blank_id)
        self.beam_width = int(beam_width)
        # optional LM shallow fusion (decode/lm.py::FusionScorer)
        self.fusion_scorer = fusion_scorer
        self._carry = None
        self._beams = None
        # last chunk's raw per-frame argmax labels [B, T] + valid counts
        # [B] — consumed by decode/endpoint.py::Endpointer
        self.last_frame_labels = None
        self.last_n_out = None

        def compute(chunk, lengths, carry, params, model_state):
            out_fn = getattr(model, "stream_output_lengths", None)
            n_out = lengths if out_fn is None else out_fn(carry, lengths)
            logits, new_carry = model.apply_stream(
                params, model_state, chunk, lengths, carry
            )
            return (
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                n_out,
                new_carry,
            )

        self._fn = jax.jit(compute)
        flush_fn = getattr(model, "apply_stream_flush", None)
        self._flush_fn = None
        if flush_fn is not None:
            self._flush_fn = jax.jit(
                lambda carry, params, model_state: flush_fn(
                    params, model_state, carry
                )
            )

    def reset(self, batch_size: int) -> None:
        from tfkaldi_tpu.decode.ctc_beam import initial_alignments, initial_beams

        self._carry = self.model.init_stream_carry(batch_size)
        self._beams = [initial_beams() for _ in range(batch_size)]
        # per-row label-time backtraces (ctc_beam.py::beam_step align) +
        # the global decoder-output-frame counter they are indexed in
        self._aligns = [initial_alignments() for _ in range(batch_size)]
        self._frame_base = np.zeros((batch_size,), np.int64)

    def _advance(self, log_probs, n_out):
        from tfkaldi_tpu.decode.ctc_beam import beam_step

        # offline search runs in f64 (ctc_beam.py); match it exactly
        log_probs = np.asarray(log_probs, np.float64)
        self.last_frame_labels = np.argmax(log_probs, axis=-1).astype(np.int32)
        self.last_n_out = np.asarray(n_out, np.int32)
        for row in range(log_probs.shape[0]):
            for t in range(int(n_out[row])):
                self._beams[row] = beam_step(
                    self._beams[row], log_probs[row, t],
                    self.blank_id, self.beam_width, self.fusion_scorer,
                    align=self._aligns[row],
                    frame_index=int(self._frame_base[row]) + t,
                )
            self._frame_base[row] += int(n_out[row])

    def step(self, chunk, lengths) -> list[np.ndarray]:
        """``[B, Tc, F]`` chunk → per-row CURRENT-BEST label ids (the full
        hypothesis so far, which may still change as frames arrive)."""
        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before step()")
        lengths = np.asarray(lengths, np.int32)
        self.last_frame_labels = np.zeros((chunk.shape[0], 0), np.int32)
        self.last_n_out = np.zeros((chunk.shape[0],), np.int32)
        if chunk.shape[1] > 0:
            log_probs, n_out, self._carry = self._fn(
                jnp.asarray(chunk, jnp.float32),
                jnp.asarray(lengths, jnp.int32),
                self._carry,
                self.params,
                self.model_state,
            )
            self._advance(log_probs, np.asarray(n_out))
        return self.best()

    def finish(self) -> list[np.ndarray]:
        """End the utterances: advance the beams over the subsampling
        front-end's final zero-padded partial group (no-op for 1:1
        models); returns the final best hypotheses."""
        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before finish()")
        if self._flush_fn is not None:
            logits, n, self._carry = self._flush_fn(
                self._carry, self.params, self.model_state
            )
            self._advance(
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                np.asarray(n),
            )
        return self.best()

    def finish_rows(self, rows) -> list[np.ndarray]:
        """``finish()`` for a subset of rows: advance THEIR beams over the
        final partial group; other rows' carry and beams are untouched.
        Returns the full per-row best list — entries at ``rows`` are
        final."""
        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before finish_rows()")
        b = len(self._beams)
        sel = np.zeros((b,), bool)
        sel[np.asarray(list(rows), np.int64)] = True
        if self._flush_fn is not None:
            old_carry = self._carry
            logits, n, flushed = self._flush_fn(
                old_carry, self.params, self.model_state
            )
            self._carry = self.model.merge_stream_carry(
                jnp.asarray(sel), flushed, old_carry
            )
            self._advance(
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                np.where(sel, np.asarray(n), 0),
            )
        else:
            self.last_frame_labels = np.zeros((b, 0), np.int32)
            self.last_n_out = np.zeros((b,), np.int32)
        return self.best()

    def reset_rows(self, rows) -> None:
        """Re-arm a subset of rows for new utterances (the per-slot
        analog of ``reset``); other rows keep streaming."""
        from tfkaldi_tpu.decode.ctc_beam import initial_alignments, initial_beams

        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before reset_rows()")
        b = len(self._beams)
        sel = np.zeros((b,), bool)
        idx = np.asarray(list(rows), np.int64)
        sel[idx] = True
        self._carry = self.model.merge_stream_carry(
            jnp.asarray(sel), self.model.init_stream_carry(b), self._carry
        )
        for row in idx:
            self._beams[int(row)] = initial_beams()
            self._aligns[int(row)] = initial_alignments()
            self._frame_base[int(row)] = 0

    def best(self) -> list[np.ndarray]:
        """Per-row highest-marginal hypothesis over all frames seen."""
        from tfkaldi_tpu.decode.ctc_beam import best_prefix

        if self._beams is None:
            raise RuntimeError("call reset(batch_size) before best()")
        return [best_prefix(b) for b in self._beams]

    def best_alignment(self) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Per-row ``(ids, frames, posteriors)`` backtrace of the CURRENT
        best hypothesis: the decoder-output frame at which the surviving
        path appended each label, and the label's softmax posterior at
        that frame (the emission-frame semantics the greedy decoder
        commits). Unlike greedy commitments the whole triple can be
        rewritten as frames arrive — the best hypothesis is re-ranked in
        hindsight; after ``finish()`` it is the final backtrace. Equals
        ``ctc_beam_search_py(..., return_alignment=True)`` on the
        concatenated utterance at any chunking."""
        from tfkaldi_tpu.decode.ctc_beam import alignment_of, best_prefix

        if self._beams is None:
            raise RuntimeError("call reset(batch_size) before best_alignment()")
        out = []
        for row, beams in enumerate(self._beams):
            ids = best_prefix(beams)
            frames, confs = alignment_of(self._aligns[row], ids)
            out.append((ids, frames, confs))
        return out

    def stable_prefixes(self) -> list[np.ndarray]:
        """Per-row committed label ids: the longest common prefix of every
        live beam entry. Future frames only extend live prefixes, so this
        can never shrink — safe for incremental display."""
        if self._beams is None:
            raise RuntimeError("call reset(batch_size) before stable_prefixes()")
        out = []
        for beams in self._beams:
            prefixes = list(beams.keys())
            common = prefixes[0]
            for p in prefixes[1:]:
                n = 0
                for a, b in zip(common, p):
                    if a != b:
                        break
                    n += 1
                common = common[:n]
                if not common:
                    break
            out.append(np.asarray(common, dtype=np.int32))
        return out


class StreamingTranscriber:
    """Raw audio chunks → incremental CTC transcripts, end to end.

    Packages the full streaming chain — ``frontend.online.
    OnlineFeatureExtractor`` (frames emitted as their analysis windows
    complete) → optional CMVN (precomputed speaker stats, as the offline
    pipeline applies them, feature_reader.py:91-115) → streaming CTC
    decoding (greedy for ``beam_width<=1``, prefix beam search otherwise)
    — behind one push/finish API. The final transcripts equal the offline
    batched pipeline's (FeatureExtractor → apply_cmvn → CTCDecoder) on
    the concatenated audio; the per-push partials are usable mid-stream.

    Usage::

        tx = StreamingTranscriber(online_extractor, model, params, state,
                                  coder, blank_id, cmvn=stats, beam_width=8)
        tx.reset(batch_size)
        for chunk, lengths in audio_chunks:      # [B, S], [B]
            partial = tx.push(chunk, lengths)    # list[str], so far
        final = tx.finish()                      # list[str]
    """

    def __init__(
        self,
        online_extractor,  # frontend.online.OnlineFeatureExtractor
        model, params, model_state, coder, blank_id: int,
        *, cmvn: np.ndarray | None = None, beam_width: int = 1,
        fusion_scorer=None, endpoint_config=None,
    ):
        self.extractor = online_extractor
        self.coder = coder
        if cmvn is not None and hasattr(online_extractor, "fuse_cmvn"):
            # fused frontend: CMVN rides the single front-end dispatch
            online_extractor.fuse_cmvn(np.asarray(cmvn))
            cmvn = None
        self.cmvn = None if cmvn is None else np.asarray(cmvn)
        self.beam_width = int(beam_width)
        # seconds per DECODER OUTPUT frame: the feature winstep times the
        # model's subsample factor — converts the greedy decoder's
        # per-label frame indices into wall-clock timestamps
        sub = int(getattr(model, "subsample_factor", 1) or 1)
        ext = online_extractor.extractor
        self.frame_seconds = ext.frame_step / ext.rate * sub
        self._frames = None  # per-row committed label frame indices
        self._confs = None  # per-row committed label confidences
        self._committed = None  # ids again, surviving finish() for words()
        # optional endpointing (decode/endpoint.py): per-row blank-silence
        # rules over the decoder's per-frame argmax stream
        self._endpointer = None
        if endpoint_config is not None:
            import dataclasses

            from tfkaldi_tpu.decode.endpoint import EndpointConfig, Endpointer

            # EndpointConfig.frame_shift is per DECODER OUTPUT frame; with
            # a subsampling front-end one output frame spans
            # subsample_factor feature frames. If the caller left the
            # class default (0.01 s = one unsubsampled feature step) on a
            # subsampled model, every rule would fire subsample_factor
            # times too late — derive the true shift from the model.
            sub = int(getattr(model, "subsample_factor", 1) or 1)
            default_shift = EndpointConfig.frame_shift
            if sub != 1 and endpoint_config.frame_shift == default_shift:
                endpoint_config = dataclasses.replace(
                    endpoint_config, frame_shift=default_shift * sub
                )
            self._endpointer = Endpointer(endpoint_config, blank_id)
        if fusion_scorer is not None and self.beam_width <= 1:
            raise ValueError(
                "LM shallow fusion needs beam_width > 1 (greedy decoding "
                "has no hypothesis set to rescore)"
            )
        if self.beam_width > 1:
            self._dec = OnlineCTCBeamDecoder(
                model, params, model_state, blank_id,
                beam_width=self.beam_width, fusion_scorer=fusion_scorer,
            )
        else:
            self._dec = OnlineCTCDecoder(model, params, model_state, blank_id)
        self._ids = None

    def reset(self, batch_size: int) -> None:
        self.extractor.reset(batch_size)
        self._dec.reset(batch_size)
        if self._endpointer is not None:
            self._endpointer.reset(batch_size)
        self._ids = [[] for _ in range(batch_size)]
        self._frames = [[] for _ in range(batch_size)]
        self._confs = [[] for _ in range(batch_size)]
        self._committed = [[] for _ in range(batch_size)]

    def _commit(self, per_row_ids) -> list[str]:
        """Fold newly emitted greedy labels + their alignment into the
        running per-row streams (``_committed``/``_frames``/``_confs``
        survive ``finish()`` so ``timestamps``/``confidences``/``words``
        stay readable) and render the partial transcripts."""
        for row, new_ids in enumerate(per_row_ids):
            self._ids[row].extend(new_ids.tolist())
            self._committed[row].extend(new_ids.tolist())
            self._frames[row].extend(self._dec.last_label_frames[row].tolist())
            self._confs[row].extend(self._dec.last_label_confs[row].tolist())
        return [
            self.coder.decode(np.asarray(row, np.int32)) for row in self._ids
        ]

    def _sync_beam_alignment(self) -> None:
        """Beam mode: replace the per-row committed streams WHOLESALE with
        the current best hypothesis' label-time backtrace
        (``OnlineCTCBeamDecoder.best_alignment``). Beam hypotheses are
        re-ranked in hindsight, so unlike greedy commitments the
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
        feats = feats.astype(np.float32)
        if self.beam_width > 1:
            ids = self._dec.step(feats, n_new)
            self._sync_beam_alignment()
            out = [self.coder.decode(row) for row in ids]
        else:
            out = self._commit(self._dec.step(feats, n_new))
        if self._endpointer is not None:
            self._endpointer.update(
                self._dec.last_frame_labels, self._dec.last_n_out
            )
        return out

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
            out = [self.coder.decode(row) for row in self._dec.finish()]
            self._sync_beam_alignment()
        else:
            out = self._commit(self._dec.finish())
        # _committed/_frames/_confs survive so the alignment stays readable
        self._ids = None
        return out

    def finish_rows(self, rows) -> list[str]:
        """Finish a subset of rows: flush their feature tails and final
        decoder groups through the shared batched step; other rows keep
        streaming undisturbed. Returns the full per-row transcript list —
        entries at ``rows`` are FINAL. The finished rows keep their
        transcript (and stale state) until ``reset_rows`` re-arms their
        slots for new streams. This is the multi-stream serving primitive:
        N concurrent utterances share one batched device program and end
        independently."""
        if self._ids is None:
            raise RuntimeError("call reset(batch_size) before finish_rows()")
        self._feed(*self.extractor.flush_rows(rows))
        if self.beam_width > 1:
            out = [self.coder.decode(r) for r in self._dec.finish_rows(rows)]
            self._sync_beam_alignment()
        else:
            out = self._commit(self._dec.finish_rows(rows))
        return out

    def reset_rows(self, rows) -> None:
        """Re-arm a subset of rows for new streams (the per-slot analog
        of ``reset``); other rows keep streaming."""
        if self._ids is None:
            raise RuntimeError("call reset(batch_size) before reset_rows()")
        self.extractor.reset_rows(rows)
        self._dec.reset_rows(rows)
        if self._endpointer is not None:
            self._endpointer.reset_rows(rows)
        for row in rows:
            self._ids[int(row)] = []
            self._frames[int(row)] = []
            self._confs[int(row)] = []
            self._committed[int(row)] = []

    def timestamps(self) -> list[np.ndarray]:
        """Per-row emission time in SECONDS of every label in the current
        transcript, in audio-stream time since that row's reset (aligned
        with the transcript's labels). A label's time is the start of the
        decoder output frame that emitted it — under greedy decoding the
        frame whose argmax first produced the label, under beam search
        (``beam_width > 1``) the frame at which the best hypothesis'
        surviving path appended it (its label-time backtrace,
        ``OnlineCTCBeamDecoder.best_alignment``). CTC's usual peaky
        alignment means this lands at or slightly after the sound itself.
        Greedy commitments only grow; a beam alignment can be REWRITTEN
        as frames arrive (hypotheses are re-ranked in hindsight) and is
        final after ``finish()``. Remains readable after ``finish()``;
        per-slot streams read it after ``finish_rows`` and before the
        slot's ``reset_rows``."""
        if self._frames is None:
            raise RuntimeError("call reset(batch_size) before timestamps()")
        return [
            np.asarray(row, np.float64) * self.frame_seconds
            for row in self._frames
        ]

    def confidences(self) -> list[np.ndarray]:
        """Per-row confidence of every label in the current transcript
        (the label's softmax posterior at its emission frame, in [0, 1]),
        aligned with the transcript's labels; same lifecycle — and, under
        beam search, the same rewrite semantics — as ``timestamps()``."""
        if self._confs is None:
            raise RuntimeError("call reset(batch_size) before confidences()")
        return [np.asarray(row, np.float64) for row in self._confs]

    def words(self) -> list[list]:
        """Per-row word alignments: transcript labels grouped at the
        coder's ``<space>`` token into ``WordAlignment(word, start, end,
        confidence)`` spans (see decode/words.py); same lifecycle as
        ``timestamps()``."""
        from tfkaldi_tpu.decode.words import group_words

        times, confs = self.timestamps(), self.confidences()
        return [
            group_words(
                [self.coder.alphabet[i] for i in ids], times[r], confs[r],
                self.frame_seconds,
            )
            for r, ids in enumerate(self._committed)
        ]

    def endpointed(self) -> np.ndarray:
        """Latched per-row endpoint flags (requires ``endpoint_config``).

        The serving loop polls this after each ``push`` and calls
        ``finish()`` for rows whose utterance has ended (trailing blank
        silence / max length — decode/endpoint.py rules)."""
        if self._endpointer is None:
            raise RuntimeError(
                "StreamingTranscriber was built without endpoint_config"
            )
        return self._endpointer.detected()


class OnlineSplicedDecoder:
    """Streaming likelihood emission for the frame-independent DNN family.

    The DNN consumes CMVN'd features spliced with ±``context_width``
    neighbor frames (reference feature_reader.py:117-156); in eval mode it
    is per-frame independent (stored BN statistics, no time coupling), so
    streaming needs only a ``context_width``-frame LOOKAHEAD: frame ``t``
    is emitted once frame ``t + c`` has arrived, with the splice's zero
    padding applied at the stream edges — the left edge immediately, the
    right edge at ``flush()``. Emitted log pseudo-likelihoods equal the
    offline batched ``Decoder`` on offline-spliced features.

    Usage::

        dec = OnlineSplicedDecoder(model, params, state, prior, context_width)
        dec.reset(batch_size)
        for feats, lengths in feature_chunks:      # [B, Tc, F] unspliced
            likes, n_new = dec.step(feats, lengths)
        likes, n_new = dec.flush()                 # last c frames per row
    """

    def __init__(
        self, model, params, model_state, prior: np.ndarray,
        context_width: int, frame_bucket: int = 8,
    ):
        self.model = model
        self.params = params
        self.model_state = model_state
        self.prior = np.asarray(prior, dtype=np.float32)
        self.c = int(context_width)
        self.frame_bucket = int(frame_bucket)
        self._buf = None

        def compute(spliced, lengths, params, model_state):
            logits, _ = model.apply(params, model_state, spliced, lengths, train=False)
            posteriors = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            likes = posteriors / jnp.asarray(self.prior)[None, None, :]
            likes = jnp.where(likes == 0, _EPS, likes)  # nnet.py:283, fixed
            return jnp.log(likes)

        self._fn = jax.jit(compute)

    def reset(self, batch_size: int) -> None:
        # buffers hold frames from global index max(0, emitted - c) on;
        # _start tracks the global index of each buffer's first frame
        self._buf = [None] * batch_size
        self._start = np.zeros((batch_size,), np.int64)
        self._total = np.zeros((batch_size,), np.int64)
        self._emitted = np.zeros((batch_size,), np.int64)

    def _emit(self, navail: np.ndarray):
        c = self.c
        b = len(self._buf)
        t_new = int(navail.max(initial=0))
        if t_new == 0:
            return (
                np.zeros((b, 0, self.prior.shape[0]), np.float32),
                navail.astype(np.int32),
            )
        t_pad = -(-t_new // self.frame_bucket) * self.frame_bucket
        dim = next(f.shape[1] for f in self._buf if f is not None)
        spliced = np.zeros((b, t_pad, dim * (2 * c + 1)), np.float32)
        for row, n in enumerate(navail):
            n = int(n)
            if n == 0:
                continue
            e = int(self._emitted[row])
            # span covers global [e - c, e + n - 1 + c]; zeros on the left
            # edge replicate the offline splice's boundary padding
            lead = max(0, c - e)
            first = int(e - c + lead - self._start[row])  # buffer index of span start
            span = self._buf[row][first : first + (n + 2 * c - lead)]
            if lead:
                span = np.concatenate(
                    [np.zeros((lead, span.shape[1]), span.dtype), span]
                )
            win = np.lib.stride_tricks.sliding_window_view(span, 2 * c + 1, axis=0)
            spliced[row, :n] = win.transpose(0, 2, 1).reshape(n, -1)
            self._emitted[row] = e + n
            keep_from = int(max(0, self._emitted[row] - c) - self._start[row])
            if keep_from > 0:
                self._buf[row] = self._buf[row][keep_from:]
                self._start[row] += keep_from
        likes = np.asarray(
            self._fn(
                jnp.asarray(spliced),
                jnp.asarray(navail, jnp.int32),
                self.params,
                self.model_state,
            )
        )
        return likes, navail.astype(np.int32)

    def step(self, feats, lengths):
        """``[B, Tc, F]`` unspliced CMVN'd feature chunk (``lengths`` valid
        frames per row) → ``([B, T, O]`` log pseudo-likelihoods, counts``)``
        for every frame whose right context is now complete."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before step()")
        feats = np.asarray(feats, np.float32)
        lengths = np.asarray(lengths, np.int64)
        navail = np.zeros((len(self._buf),), np.int64)
        for row, n in enumerate(lengths):
            n = int(n)
            if n > 0:
                new = feats[row, :n]
                self._buf[row] = (
                    new.copy()
                    if self._buf[row] is None
                    else np.concatenate([self._buf[row], new])
                )
                self._total[row] += n
            navail[row] = max(0, self._total[row] - self.c - self._emitted[row])
        return self._emit(navail)

    def flush(self):
        """Emit the last ``c`` frames per row with the offline splice's
        zero right-edge padding, then require ``reset``."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before flush()")
        rem = self._total - self._emitted
        if self.c > 0:
            for row, r in enumerate(rem):
                if r > 0:
                    dim = self._buf[row].shape[1]
                    self._buf[row] = np.concatenate(
                        [self._buf[row], np.zeros((self.c, dim), np.float32)]
                    )
        out = self._emit(rem.astype(np.int64))
        self._buf = None
        return out


class OnlineWindowedDecoder:
    """Streaming likelihood emission for the sequence-local hybrid
    families (TDNN, CNN): output frame t depends on input frames
    ``[t - left_receptive, t + right_receptive]`` (model shifts /
    SAME-padded time kernels) plus the ±``context_width`` input splice.

    Frame t is emitted once frame ``t + c + right_receptive`` has
    arrived; each chunk re-runs the model over a window of spliced
    frames ``[e - left_receptive, e + n - 1 + right_receptive]`` and
    keeps the center. The models' zero-fill boundary semantics make the
    window edges exact: zero-fill at the window START only corrupts
    outputs before the emitted span (already emitted — and when the
    window start IS the utterance start the zero-fill is the offline
    boundary itself), and the window END either lies ``right_receptive``
    real frames past the span (mid-stream) or coincides with the
    utterance end (flush), again the offline boundary. Emitted log
    pseudo-likelihoods therefore equal the offline batched ``Decoder``
    on offline-spliced features — at any chunking
    (tests/test_online.py).
    """

    def __init__(
        self, model, params, model_state, prior: np.ndarray,
        context_width: int, frame_bucket: int = 8,
    ):
        self.model = model
        self.params = params
        self.model_state = model_state
        self.prior = np.asarray(prior, dtype=np.float32)
        self.c = int(context_width)
        self.lrf = int(model.left_receptive)
        self.rrf = int(model.right_receptive)
        self.frame_bucket = int(frame_bucket)
        self._buf = None

        def compute(spliced, lengths, params, model_state):
            logits, _ = model.apply(
                params, model_state, spliced, lengths, train=False
            )
            posteriors = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            likes = posteriors / jnp.asarray(self.prior)[None, None, :]
            likes = jnp.where(likes == 0, _EPS, likes)  # nnet.py:283, fixed
            return jnp.log(likes)

        self._fn = jax.jit(compute)

    def reset(self, batch_size: int) -> None:
        self._buf = [None] * batch_size
        self._start = np.zeros((batch_size,), np.int64)  # global idx of buf[0]
        self._total = np.zeros((batch_size,), np.int64)
        self._emitted = np.zeros((batch_size,), np.int64)

    def _emit(self, navail: np.ndarray, final: bool):
        c, lrf, rrf = self.c, self.lrf, self.rrf
        b = len(self._buf)
        counts = navail.astype(np.int32)
        offs = np.zeros((b,), np.int64)  # emitted-span offset in each window
        w_len = np.zeros((b,), np.int64)
        for row, n in enumerate(navail):
            if int(n) == 0:
                continue
            e = int(self._emitted[row])
            ws = max(0, e - lrf)  # window start (utterance start clamps)
            we = e + int(n) - 1 + (0 if final else rrf)
            offs[row], w_len[row] = e - ws, we - ws + 1
        w_max = int(w_len.max(initial=0))
        if w_max == 0:
            return (
                np.zeros((b, 0, self.prior.shape[0]), np.float32),
                counts,
            )
        w_pad = -(-w_max // self.frame_bucket) * self.frame_bucket
        dim = next(f.shape[1] for f in self._buf if f is not None)
        spliced = np.zeros((b, w_pad, dim * (2 * c + 1)), np.float32)
        for row, n in enumerate(navail):
            n = int(n)
            if n == 0:
                continue
            e = int(self._emitted[row])
            ws = e - int(offs[row])
            wl = int(w_len[row])
            # raw span [ws - c, ws + wl - 1 + c]; zeros before global 0
            lead = max(0, c - ws)
            first = int(ws - c + lead - self._start[row])
            span = self._buf[row][first : first + (wl + 2 * c - lead)]
            if lead:
                span = np.concatenate(
                    [np.zeros((lead, span.shape[1]), span.dtype), span]
                )
            win = np.lib.stride_tricks.sliding_window_view(
                span, 2 * c + 1, axis=0
            )
            spliced[row, :wl] = win.transpose(0, 2, 1).reshape(wl, -1)
            self._emitted[row] = e + n
            keep_from = int(
                max(0, self._emitted[row] - c - lrf) - self._start[row]
            )
            if keep_from > 0:
                self._buf[row] = self._buf[row][keep_from:]
                self._start[row] += keep_from
        likes = np.asarray(
            self._fn(
                jnp.asarray(spliced),
                jnp.asarray(w_len, jnp.int32),
                self.params,
                self.model_state,
            )
        )
        n_max = int(counts.max(initial=0))
        out = np.zeros((b, n_max, self.prior.shape[0]), np.float32)
        for row, n in enumerate(counts):
            if n:
                out[row, :n] = likes[row, int(offs[row]) : int(offs[row]) + n]
        return out, counts

    def step(self, feats, lengths):
        """``[B, Tc, F]`` unspliced CMVN'd feature chunk → ``([B, T, O]``
        log pseudo-likelihoods, counts)`` for every frame whose full
        splice + model right context is now complete."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before step()")
        feats = np.asarray(feats, np.float32)
        lengths = np.asarray(lengths, np.int64)
        navail = np.zeros((len(self._buf),), np.int64)
        for row, n in enumerate(lengths):
            n = int(n)
            if n > 0:
                new = feats[row, :n]
                self._buf[row] = (
                    new.copy()
                    if self._buf[row] is None
                    else np.concatenate([self._buf[row], new])
                )
                self._total[row] += n
            navail[row] = max(
                0, self._total[row] - self.c - self.rrf - self._emitted[row]
            )
        return self._emit(navail, final=False)

    def flush(self):
        """Emit the remaining frames: the window end coincides with the
        utterance end, so the models' own zero-fill reproduces the
        offline right boundary; the splice's c-frame zero pad is
        appended explicitly. Requires ``reset`` afterwards."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before flush()")
        rem = self._total - self._emitted
        if self.c > 0:
            for row, r in enumerate(rem):
                if r > 0:
                    dim = self._buf[row].shape[1]
                    self._buf[row] = np.concatenate(
                        [self._buf[row], np.zeros((self.c, dim), np.float32)]
                    )
        out = self._emit(rem.astype(np.int64), final=True)
        self._buf = None
        return out
