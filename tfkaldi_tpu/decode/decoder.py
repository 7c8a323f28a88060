"""Prior-normalized pseudo-likelihood emission.

Equivalent of the reference Nnet.decode + Decoder
(neuralNetworks/nnet.py:246-289, decoder.py:8-81), TPU-batched: the
reference runs one utterance per ``session.run`` with a batch-1 graph; here
utterances are packed into padded batches and the softmax → ÷prior →
eps-floor → log chain runs fused on device in one dispatch per batch.

Note: the reference's eps floor is a no-op bug (``np.where(...)`` result
discarded, nnet.py:283) so its log can emit -inf; we apply the floor for
real, which only changes frames the reference would have crashed Kaldi on.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.data.feature_reader import FeatureReader
from tfkaldi_tpu.io import ArkWriter
from tfkaldi_tpu.models.dnn import DNN

_EPS = float(np.finfo(np.float64).eps)


class Decoder:
    """Batched posterior → log pseudo-likelihood computer."""

    def __init__(self, model: DNN, params, model_state, prior: np.ndarray):
        self.model = model
        self.params = params
        self.model_state = model_state
        self.prior = np.asarray(prior, dtype=np.float32)
        self._fn = jax.jit(self._compute)

    def _compute(self, inputs, lengths, params, model_state):
        logits, _ = self.model.apply(params, model_state, inputs, lengths, train=False)
        posteriors = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        likes = posteriors / jnp.asarray(self.prior)[None, None, :]
        likes = jnp.where(likes == 0, _EPS, likes)  # nnet.py:283, fixed
        return jnp.log(likes)

    def compute_batch(self, inputs, lengths):
        """``[B, T, F]`` padded features → ``[B, T, O]`` log pseudo-likelihoods."""
        return self._fn(
            jnp.asarray(inputs), jnp.asarray(lengths, jnp.int32), self.params, self.model_state
        )

    def decode_to_writer(
        self,
        reader: FeatureReader,
        writer: ArkWriter,
        *,
        batch_size: int = 16,
        bucket_multiple: int = 128,
    ) -> int:
        """Stream the whole test set: read+CMVN+splice per utterance, batch,
        compute, write ark records (nnet.py:270-286). Returns #utterances."""
        count = 0
        pending: list[tuple[str, np.ndarray]] = []

        def flush():
            nonlocal count
            if not pending:
                return
            t_pad = -(-max(u.shape[0] for _, u in pending) // bucket_multiple) * bucket_multiple
            dim = pending[0][1].shape[1]
            batch = np.zeros((len(pending), t_pad, dim), np.float32)
            lengths = np.zeros(len(pending), np.int32)
            for i, (_, u) in enumerate(pending):
                batch[i, : u.shape[0]] = u
                lengths[i] = u.shape[0]
            out = np.asarray(self.compute_batch(batch, lengths))
            for i, (utt_id, _) in enumerate(pending):
                writer.write_next_utt(utt_id, out[i, : lengths[i]])
                count += 1
            pending.clear()

        while True:
            utt_id, utt_mat, looped = reader.get_utt()
            if looped:
                break
            if utt_mat is None:
                continue  # too short to splice
            pending.append((utt_id, utt_mat))
            if len(pending) >= batch_size:
                flush()
        flush()
        return count
