"""tfkaldi_tpu: a TPU-native (JAX/XLA/Pallas/pjit) hybrid DNN-HMM ASR framework.

A from-scratch re-design of the capabilities of vrenkens/tfkaldi (the
reference): Kaldi-compatible acoustic feature extraction, GMM-HMM
orchestration via external Kaldi, DNN acoustic-model training on frame-level
state alignments, and prior-normalized pseudo-likelihood emission for Kaldi
WFST decoding — built TPU-first:

- batched feature extraction as jit-compiled JAX over padded utterance
  batches (reference: one utterance at a time in numpy,
  processing/prepare_data.py:55-68)
- data-parallel / tensor-parallel training over a ``jax.sharding.Mesh``
  with XLA collectives (reference: single ``tf.Session`` on one device,
  neuralNetworks/nnet.py:131-134)
- static-shape bucketed batching with frame-masked losses (reference:
  pad-to-corpus-max + gather un-padding, seq_convertors.py)
- Pallas kernels for the fused hot ops
- byte-exact Kaldi ark/scp interchange so external Kaldi (GMM training,
  ``latgen-faster-mapped`` WFST decoding) drops in unchanged.
"""

__version__ = "0.1.0"
