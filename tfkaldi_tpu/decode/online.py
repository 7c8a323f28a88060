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


class OnlineRecurrentDecoder:
    """Carry-based streaming emitter for unidirectional LSTM/GRU models.

    Usage::

        dec = OnlineRecurrentDecoder(model, params, model_state, prior)
        dec.reset(batch_size)
        for chunk, lengths in feature_chunks:   # [B, Tc, F], [B]
            log_likes = dec.step(chunk, lengths)  # [B, Tc, O]
    """

    def __init__(self, model, params, model_state, prior: np.ndarray):
        if model.config.bidirectional:
            raise ValueError(
                "online decoding requires a unidirectional model "
                "(bidirectional = False)"
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
        chunk = np.asarray(chunk)
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
        if model.config.bidirectional:
            raise ValueError(
                "online decoding requires a unidirectional model "
                "(bidirectional = False)"
            )
        self.model = model
        self.params = params
        self.model_state = model_state
        self.blank_id = int(blank_id)
        self._carry = None
        self._prev = None  # last raw frame label per row (cross-chunk dedupe)

        def compute(chunk, lengths, carry, params, model_state):
            logits, new_carry = model.apply_stream(
                params, model_state, chunk, lengths, carry
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_carry

        self._fn = jax.jit(compute)

    def reset(self, batch_size: int) -> None:
        self._carry = self.model.init_stream_carry(batch_size)
        self._prev = np.full((batch_size,), -1, np.int64)

    def step(self, chunk, lengths) -> list[np.ndarray]:
        """``[B, Tc, F]`` chunk → per-row arrays of NEWLY emitted label
        ids (repeats merged across the chunk boundary, blanks dropped)."""
        if self._carry is None:
            raise RuntimeError("call reset(batch_size) before step()")
        chunk = np.asarray(chunk)
        lengths = np.asarray(lengths, np.int32)
        if chunk.shape[1] == 0:
            # empty chunk (e.g. a feature flush that added no frames)
            return [np.zeros((0,), np.int32) for _ in range(chunk.shape[0])]
        paths, self._carry = self._fn(
            jnp.asarray(chunk, jnp.float32),
            jnp.asarray(lengths, jnp.int32),
            self._carry,
            self.params,
            self.model_state,
        )
        paths = np.asarray(paths)
        out = []
        for row in range(paths.shape[0]):
            p = paths[row, : int(lengths[row])]
            if p.size == 0:
                out.append(np.zeros((0,), np.int32))
                continue
            keep = np.ones(p.shape[0], dtype=bool)
            keep[0] = p[0] != self._prev[row]
            keep[1:] = p[1:] != p[:-1]
            collapsed = p[keep]
            out.append(collapsed[collapsed != self.blank_id].astype(np.int32))
            self._prev[row] = p[-1]
        return out
