"""Pallas TPU kernels for hot ops.

Each kernel has an XLA (pure jnp) fallback; kernels are opt-in where they
beat XLA's fusion on the measured workload, and interpret-mode tested on
CPU.
"""

from tfkaldi_tpu.ops.fused_mlp import fused_ffn_block

__all__ = ["fused_ffn_block"]
