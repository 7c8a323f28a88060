"""CTC best-path decoding and transcription emission.

The reference's CTC support is an unfinished ``CTCTrainer`` with no decode
path at all (neuralNetworks/trainer.py:533-570 — the loss never returns);
this module is the working TPU-native counterpart for the character/CTC
pipeline (TextBatchDispenser + TextCoder, batchdispenser.py:175-198,
target_coder.py:79-118).

Decoding is batched best-path (greedy) CTC: the device computes the
per-frame argmax over the whole padded batch in one dispatch; collapsing
repeats and removing blanks is O(T) host work per utterance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.data.feature_reader import FeatureReader
from tfkaldi_tpu.data.target_coder import TargetCoder
from tfkaldi_tpu.models.dnn import DNN


def collapse_ctc_path(path: np.ndarray, blank_id: int) -> np.ndarray:
    """Collapse a frame-level CTC path: merge consecutive repeats, then
    drop blanks. ``path`` is a 1-D int array of per-frame label ids."""
    path = np.asarray(path)
    if path.size == 0:
        return path.astype(np.int32)
    keep = np.ones(path.shape[0], dtype=bool)
    keep[1:] = path[1:] != path[:-1]
    collapsed = path[keep]
    return collapsed[collapsed != blank_id].astype(np.int32)


class CTCDecoder:
    """Batched greedy CTC decoder emitting text transcriptions."""

    def __init__(self, model: DNN, params, model_state, coder: TargetCoder, blank_id: int):
        self.model = model
        self.params = params
        self.model_state = model_state
        self.coder = coder
        self.blank_id = int(blank_id)
        self._fn = jax.jit(self._compute)

    def _compute(self, inputs, lengths, params, model_state):
        logits, _ = self.model.apply(params, model_state, inputs, lengths, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def decode_batch(self, inputs, lengths) -> list[np.ndarray]:
        """``[B, T, F]`` padded features → list of collapsed label-id arrays."""
        paths = np.asarray(
            self._fn(
                jnp.asarray(inputs),
                jnp.asarray(lengths, jnp.int32),
                self.params,
                self.model_state,
            )
        )
        return [
            collapse_ctc_path(paths[i, : int(lengths[i])], self.blank_id)
            for i in range(paths.shape[0])
        ]

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
        count = 0
        pending: list[tuple[str, np.ndarray]] = []

        with open(outfile, "w") as fid:

            def flush():
                nonlocal count
                if not pending:
                    return
                t_pad = (
                    -(-max(u.shape[0] for _, u in pending) // bucket_multiple)
                    * bucket_multiple
                )
                dim = pending[0][1].shape[1]
                batch = np.zeros((len(pending), t_pad, dim), np.float32)
                lengths = np.zeros(len(pending), np.int32)
                for i, (_, u) in enumerate(pending):
                    batch[i, : u.shape[0]] = u
                    lengths[i] = u.shape[0]
                for (utt_id, _), ids in zip(pending, self.decode_batch(batch, lengths)):
                    fid.write(f"{utt_id} {self.coder.decode(ids)}\n")
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
