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
        out, self._carry = self._fn(
            jnp.asarray(chunk, jnp.float32),
            jnp.asarray(lengths, jnp.int32),
            self._carry,
            self.params,
            self.model_state,
        )
        return out
