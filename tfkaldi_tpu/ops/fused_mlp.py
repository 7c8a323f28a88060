"""Fused FFN block: ``relu(batchnorm(x @ w + b))`` in one Pallas kernel.

The DNN hot path is a stack of ``[N, H] @ [H, H]`` matmuls each followed by
cheap elementwise work (bias, inference-mode batchnorm affine, relu;
models/dnn.py). XLA fuses the elementwise tail into the matmul epilogue
already; this kernel exists to (a) pin the fusion guarantee, (b) control
the VMEM tiling explicitly, and (c) serve as the template for further
cross-layer fusion. ``tfkaldi_tpu.models.dnn`` routes inference-mode hidden
layers through it when ``DNNConfig.use_pallas_ffn`` is on and the layer's
elementwise chain matches the epilogue, falling back to jnp otherwise (the
numerics match to f32 accumulation order).

The batchnorm here is the *inference* form: a precomputed per-channel
affine ``scale = rsqrt(var+eps)``, ``shift = beta - mean*scale`` folded
into the epilogue. Training-mode BN needs batch moments over all N and
stays in XLA.

Measured on v5e (flagship layer shape [65536,2048]x[2048,2048] + bias +
relu, bf16): the round-3 tiling sweep found ``(tile_n=256, full-M,
full-K)`` — the whole weight matrix VMEM-resident, 256-row activation
tiles streaming past it — measures 4.147 ms vs XLA's 4.172 ms (−0.6%,
parity; round 2's ``(512,512,K)`` was +7%). Outputs are bit-identical to
the XLA path. With the gap closed, the kernel's epilogue/prologue shape
now backs the training-mode BN-backward fusion XLA cannot express
(``ops/bn_fused_bwd.py``); ``use_pallas_ffn`` itself remains opt-in since
parity alone is no reason to leave XLA's scheduler. Sweep table and
history: docs/PERF_DNN_STEP.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(x_ref, w_ref, b_ref, scale_ref, shift_ref, o_ref, acc_ref, *, n_k, relu):
    """Grid: (tiles_n, tiles_m, tiles_k); K innermost for accumulation."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # f32 operands must NOT silently truncate to bf16 (the MXU default):
    # HIGHEST runs the multi-pass f32 matmul so f32-mode numerics match a
    # true f32 contraction. bf16 operands are exact in one pass either way.
    precision = (
        jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32 else None
    )
    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32, precision=precision
    )

    @pl.when(k == n_k - 1)
    def _():
        out = acc_ref[:] + b_ref[:].astype(jnp.float32)
        out = out * scale_ref[:].astype(jnp.float32) + shift_ref[:].astype(jnp.float32)
        if relu:
            out = jnp.maximum(out, 0.0)
        o_ref[:] = out.astype(o_ref.dtype)


def fused_ffn_block(
    x,
    w,
    b,
    scale=None,
    shift=None,
    *,
    relu: bool = True,
    tile_n: int = 256,
    tile_m: int | None = None,
    tile_k: int | None = None,
    interpret: bool | None = None,
):
    """See :func:`_fused_ffn_block`. ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU (CPU test meshes).

    Default tiling (round-3 sweep, docs/PERF_DNN_STEP.md): ``(256, full-M,
    full-K)`` — the whole weight matrix stays VMEM-resident while 256-row
    activation tiles stream past it. On the flagship layer shape this
    measured 4.147 ms vs XLA's 4.172 (−0.6%, i.e. parity), closing the 7%
    gap of the round-2 ``(512, 512, K)`` tiling. ``tile_m=None`` uses
    full M when it divides into <=2048, else 512; same rule for
    ``tile_k``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_m is None:
        m = w.shape[1]
        tile_m = m if m <= 2048 else (2048 if m % 2048 == 0 else 512)
    if tile_k is None:
        k = x.shape[1]
        tile_k = k if k <= 2048 else (2048 if k % 2048 == 0 else 512)
    return _fused_ffn_block(
        x, w, b, scale, shift,
        relu=relu, tile_n=tile_n, tile_m=tile_m, tile_k=tile_k,
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("relu", "tile_n", "tile_m", "tile_k", "interpret")
)
def _fused_ffn_block(
    x,
    w,
    b,
    scale=None,
    shift=None,
    *,
    relu: bool = True,
    tile_n: int = 512,
    tile_m: int = 512,
    tile_k: int = 512,
    interpret: bool = False,
):
    """``relu((x @ w + b) * scale + shift)`` with f32 accumulation.

    Args:
        x: ``[N, K]`` activations (any float dtype; kept as-is for the MXU).
        w: ``[K, M]`` weights.
        b: ``[M]`` bias.
        scale/shift: optional ``[M]`` batchnorm inference affine (defaults
            identity).

    Shapes must be multiples of the tile sizes (callers pad; the DNN's
    N = B·T_pad is already bucket-padded and H/output dims are multiples
    of 512 in the flagship configs).
    """
    n, k = x.shape
    k2, m = w.shape
    assert k == k2, (x.shape, w.shape)
    if scale is None:
        scale = jnp.ones((m,), jnp.float32)
    if shift is None:
        shift = jnp.zeros((m,), jnp.float32)

    tile_n = min(tile_n, n)
    tile_m = min(tile_m, m)
    tile_k = min(tile_k, k)
    if n % tile_n or m % tile_m or k % tile_k:
        raise ValueError(f"shapes {(n, k, m)} not divisible by tiles {(tile_n, tile_k, tile_m)}")
    grid = (n // tile_n, m // tile_m, k // tile_k)

    return pl.pallas_call(
        functools.partial(_ffn_kernel, n_k=grid[2], relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_k), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_m), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_m), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_n, tile_m), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k,
            bytes_accessed=(n * k + k * m + n * m) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, b.reshape(1, m), scale.reshape(1, m), shift.reshape(1, m))
