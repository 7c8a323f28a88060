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

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.data.feature_reader import FeatureReader
from tfkaldi_tpu.io import ArkWriter
from tfkaldi_tpu.models.dnn import DNN

_EPS = float(np.finfo(np.float64).eps)


class Decoder:
    """Batched posterior → log pseudo-likelihood computer.

    ``mesh``: optional ``jax.sharding.Mesh`` — batches are sharded over the
    'data' axis (the final partial batch is padded up to ``batch_size`` so
    shapes stay divisible) and the forward runs SPMD.
    """

    def __init__(self, model: DNN, params, model_state, prior: np.ndarray, mesh=None):
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            # replicate weights across the mesh (checkpoint restore commits
            # them to one device, which would conflict with sharded inputs)
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            params = jax.tree.map(lambda x: jax.device_put(x, rep), params)
            model_state = jax.tree.map(lambda x: jax.device_put(x, rep), model_state)
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
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("data"))
            inputs = jax.device_put(np.asarray(inputs, np.float32), sh)
            lengths = jax.device_put(np.asarray(lengths, np.int32), sh)
            return self._fn(inputs, lengths, self.params, self.model_state)
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
        compute, write ark records (nnet.py:270-286). Returns #utterances.

        Uses the native bulk loader when available (one fused C++ call per
        batch, byte-identical batches); falls back to the Python reader."""
        from tfkaldi_tpu.decode.streaming import pick_stream

        count = 0
        for utt_ids, inputs, lengths in pick_stream(reader)(
            reader,
            batch_size=batch_size,
            bucket_multiple=bucket_multiple,
            # under a mesh the batch dim must stay divisible by the data axis
            pad_to_batch=self.mesh is not None,
        ):
            out = np.asarray(self.compute_batch(inputs, lengths))
            for i, utt_id in enumerate(utt_ids):
                writer.write_next_utt(utt_id, out[i, : lengths[i]])
                count += 1
        return count
