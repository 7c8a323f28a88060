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
    return collapse_ctc_path_aligned(path, blank_id)[0]


def collapse_ctc_path_aligned(
    path: np.ndarray, blank_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """``collapse_ctc_path`` plus the alignment: also returns each emitted
    label's frame index (the first frame of its argmax run)."""
    path = np.asarray(path)
    if path.size == 0:
        return path.astype(np.int32), np.zeros((0,), np.int64)
    keep = np.ones(path.shape[0], dtype=bool)
    keep[1:] = path[1:] != path[:-1]
    idx = np.flatnonzero(keep)
    collapsed = path[idx]
    nonblank = collapsed != blank_id
    return collapsed[nonblank].astype(np.int32), idx[nonblank].astype(np.int64)


class CTCDecoder:
    """Batched CTC decoder emitting text transcriptions.

    ``beam_width=1`` is best-path (greedy): the device argmaxes the whole
    batch in one dispatch. ``beam_width>1`` runs prefix beam search on the
    host over device-computed log-posteriors — native C++
    (native/ctc_beam.cpp) when available, pure Python otherwise.
    """

    def __init__(
        self,
        model: DNN,
        params,
        model_state,
        coder: TargetCoder,
        blank_id: int,
        beam_width: int = 1,
        fusion_scorer=None,
    ):
        self.model = model
        self.params = params
        self.model_state = model_state
        self.coder = coder
        self.blank_id = int(blank_id)
        self.beam_width = int(beam_width)
        # optional LM shallow fusion (decode/lm.py::FusionScorer); the
        # fused search runs the Python beam (the native C++ beam scores
        # acoustics only)
        self.fusion_scorer = fusion_scorer
        # decode_batch side effects: the per-row frame index of each
        # emitted label (greedy: first frame of its argmax run; Python
        # beam: the best hypothesis' backtrace) and its softmax posterior
        # at that frame — the same alignment surface the streaming twin
        # and the transducer expose. None on the native-C++ beam path
        # (transcripts only).
        self.last_label_frames = None
        self.last_label_confs = None
        self._fn = jax.jit(self._compute_argmax)
        self._logprob_fn = jax.jit(self._compute_logprobs)

    def _forward(self, inputs, lengths, params, model_state):
        logits, _ = self.model.apply(params, model_state, inputs, lengths, train=False)
        return logits

    def _compute_argmax(self, inputs, lengths, params, model_state):
        logits = self._forward(inputs, lengths, params, model_state)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return (
            jnp.argmax(logits, axis=-1).astype(jnp.int32),
            jnp.exp(jnp.max(lp, axis=-1)),
        )

    def _compute_logprobs(self, inputs, lengths, params, model_state):
        logits = self._forward(inputs, lengths, params, model_state)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def decode_batch(self, inputs, lengths) -> list[np.ndarray]:
        """``[B, T, F]`` padded features → list of collapsed label-id arrays."""
        args = (
            jnp.asarray(inputs),
            jnp.asarray(lengths, jnp.int32),
            self.params,
            self.model_state,
        )
        # a subsampling front-end emits ceil(n/s) frames per row
        out_fn = getattr(self.model, "output_lengths", None)
        if out_fn is not None:
            lengths = np.asarray(out_fn(np.asarray(lengths)))
        if self.beam_width <= 1:
            paths, conf = map(np.asarray, self._fn(*args))
            out, frames, confs = [], [], []
            for i in range(paths.shape[0]):
                ids, idx = collapse_ctc_path_aligned(
                    paths[i, : int(lengths[i])], self.blank_id
                )
                out.append(ids)
                frames.append(idx)
                confs.append(conf[i, idx].astype(np.float64))
            self.last_label_frames = frames
            self.last_label_confs = confs
            return out

        log_probs = np.asarray(self._logprob_fn(*args))
        from tfkaldi_tpu.decode import native_beam

        if self.fusion_scorer is None and native_beam.available():
            # the native C++ beam scores transcripts only — no backtrace
            self.last_label_frames = None
            self.last_label_confs = None
            return native_beam.ctc_beam_search_batch_native(
                log_probs, lengths, self.blank_id, self.beam_width
            )
        from tfkaldi_tpu.decode.ctc_beam import ctc_beam_search_py

        out, frames, confs = [], [], []
        for i in range(log_probs.shape[0]):
            ids, fr, cf = ctc_beam_search_py(
                log_probs[i, : int(lengths[i])], self.blank_id,
                self.beam_width, scorer=self.fusion_scorer,
                return_alignment=True,
            )
            out.append(ids)
            frames.append(fr)
            confs.append(cf)
        # the Python beam's label-time backtrace (the frame at which the
        # best hypothesis' surviving path appended each label + its
        # posterior there) — same surface as the greedy alignment
        self.last_label_frames = frames
        self.last_label_confs = confs
        return out

    def decode_to_file(
        self,
        reader: FeatureReader,
        outfile: str,
        *,
        batch_size: int = 16,
        bucket_multiple: int = 128,
    ) -> int:
        """Stream the test set and write a Kaldi-style ``text`` file
        (``utt_id transcription`` per line). Returns #utterances.

        Uses the native bulk loader when available (byte-identical batches,
        one fused C++ call per batch); Python reader otherwise."""
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
