"""tfkaldi_tpu: a TPU-native (JAX/XLA/Pallas/pjit) ASR framework.

A from-scratch re-design of the capabilities of vrenkens/tfkaldi (the
reference) — Kaldi-compatible feature extraction, GMM-HMM orchestration
via external Kaldi, hybrid DNN training on frame alignments, and
prior-normalized pseudo-likelihood emission for Kaldi WFST decoding —
grown into a full TPU-first ASR stack:

- batched feature extraction as jit-compiled JAX over padded utterance
  batches (reference: one utterance at a time in numpy,
  processing/prepare_data.py:55-68), with an exact streaming front-end
- all four ASR paradigms: hybrid frame-CE, CTC, RNN-T transduction, and
  attention encoder-decoder (incl. joint CTC-attention + rescoring) —
  the reference ships only the first, with a broken CTC draft
- nine model families behind one Classifier seam: DNN, LSTM, GRU, TDNN,
  CNN, Transformer, Conformer, Transducer, AttentionSeq2Seq — with
  Pallas kernels on the recurrent hot paths and fused lattice scores
  for the transducer
- batched AND streaming decoding for every family that can stream
  (greedy/beam, dense ARPA shallow fusion inside the jitted searches),
  plus spool and low-latency socket serving
- data-parallel / tensor-parallel training over a ``jax.sharding.Mesh``
  with XLA collectives and real multi-host support (reference: single
  ``tf.Session`` on one device, neuralNetworks/nnet.py:131-134)
- static-shape bucketed batching with frame-masked losses (reference:
  pad-to-corpus-max + gather un-padding, seq_convertors.py)
- byte-exact Kaldi ark/scp interchange so external Kaldi (GMM training,
  ``latgen-faster-mapped`` WFST decoding) drops in unchanged, with a
  native C++ bulk loader on the production input path.
"""

__version__ = "0.1.0"
