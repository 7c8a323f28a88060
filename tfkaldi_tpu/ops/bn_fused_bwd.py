"""Fused backward for the flagship DNN layer: relu(maskedBN(x @ w + b)).

Round-2's analysis (docs/PERF_DNN_STEP.md) measured the masked-BN backward
at ~1.1 ms/layer — an HBM-traffic floor for the *unfused* schedule: XLA
materializes the BN input cotangent ``dz`` to HBM in one elementwise pass
(reading ``z`` and the incoming cotangent), then the dgrad and wgrad
matmuls read it back. The fusion below was rejected then because the
Pallas matmul trailed XLA by 7%; the round-3 tiling sweep closed that gap
(``(256, full-M)``: −0.6% vs XLA, see fused_mlp.py), unblocking this.

Design (``custom_vjp``, forward numerics bit-identical to models/dnn.py):

- forward: exactly the XLA ops the unfused path runs (dot + bias in f32,
  bf16 store, masked f32 moments, center+scale+shift, relu on bf16) —
  nothing changes on the forward, so eval/decode paths are untouched.
- backward pass 1 (XLA): recompute the relu gate from the saved ``z``,
  reduce the two moment-feedback sums S1 = Σ m·dpre, S2 = Σ m·dpre·x̂.
- backward pass 2 (Pallas): ONE kernel streams 256-row tiles of
  ``(g, z, mask)`` past the VMEM-resident ``wᵀ`` and, per tile, computes
  ``dz`` in the matmul prologue (relu gate → dpre → BN feedback) and
  issues ``dh = dz_bf16 @ wᵀ`` — emitting ``dz`` as a side output for the
  wgrad. ``dz`` is written once and read once instead of
  written-once-read-twice, and the elementwise pass that produced it
  disappears into the prologue (its HBM reads ride the matmul's).
- wgrad/db/dβ (XLA): ``dW = hᵀ @ dz``, column sums — standard matmuls
  XLA already runs at peak.

The bf16 rounding points mirror autodiff's cast chain (dz rounds to bf16
exactly where the ``astype(bf16)`` VJP would round it), so gradients match
the autodiff path to accumulation-order noise; `tests/test_bn_fused_bwd.py`
pins both that and exact-parity of the forward.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def supported(n: int, h_in: int, h_out: int) -> bool:
    """Shapes the kernel handles: 256-divisible rows, lane-aligned dims,
    and a weight matrix + accumulator that fit VMEM."""
    return (
        n % TILE_N == 0
        and h_in % 128 == 0
        and h_out % 128 == 0
        and h_in * h_out * 2 <= 9 * 1024 * 1024  # wT resident, bf16
    )


# ---------------------------------------------------------------------------
# the fused dgrad kernel
# ---------------------------------------------------------------------------


def _dgrad_kernel(g_ref, z_ref, m_ref, wt_ref, mean_ref, r_ref, beta_ref,
                  c1_ref, c2_ref, dh_ref, dz_ref):
    """One grid step: a [TILE_N, H] tile.

    Prologue (VPU, overlaps the MXU of neighbouring grid steps): recompute
    the relu gate from z, apply the BN backward formula; then the dgrad dot
    against the resident wᵀ."""
    zf = z_ref[:].astype(jnp.float32)
    xhat = zf - mean_ref[:].astype(jnp.float32)
    r = r_ref[:].astype(jnp.float32)
    # relu gate on the bf16-rounded BN value (matching the forward's dtype
    # chain); the comparison itself runs in f32 — Mosaic cannot lower a
    # bf16 cmpf — which preserves the gate exactly (casting back to f32 is
    # value-preserving)
    bn = (xhat * r + beta_ref[:].astype(jnp.float32)).astype(z_ref.dtype)
    gate = bn.astype(jnp.float32) > 0.0
    dpre = jnp.where(gate, g_ref[:].astype(jnp.float32), 0.0)
    # per-row mask arrives lane-broadcast as [TILE_N, 128] (Mosaic requires
    # 8x128-aligned blocks); one lane column carries the row's 0/1
    m = m_ref[:, 0:1].astype(jnp.float32)
    # dz = r·dpre − m·(c1 + x̂·c2), c1 = r·S1/c, c2 = r³·S2/c
    dzf = r * dpre - m * (
        c1_ref[:].astype(jnp.float32) + xhat * c2_ref[:].astype(jnp.float32)
    )
    dzb = dzf.astype(dz_ref.dtype)
    dz_ref[:] = dzb
    dh_ref[:] = jnp.dot(
        dzb, wt_ref[:], preferred_element_type=jnp.float32
    ).astype(dh_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_dgrad(g, z, mask, wt, mean, r, beta, c1, c2, *, interpret: bool):
    """g, z: [N, H] bf16; mask: [N] f32; wt: [H, K] bf16; vectors [H].

    Returns (dh [N, K] bf16, dz [N, H] bf16)."""
    n, h = g.shape
    k = wt.shape[1]
    grid = (n // TILE_N,)
    # lane-broadcast 0/1 mask (bf16: 16 MB/layer at the flagship shape,
    # ~0.02 ms of HBM reads — the price of Mosaic's 8x128 block alignment)
    mask128 = jnp.broadcast_to(mask[:, None], (n, 128)).astype(jnp.bfloat16)
    row = lambda i: (i, 0)  # noqa: E731
    vec = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        _dgrad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, h), row, memory_space=pltpu.VMEM),  # g
            pl.BlockSpec((TILE_N, h), row, memory_space=pltpu.VMEM),  # z
            pl.BlockSpec((TILE_N, 128), row, memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec((h, k), vec, memory_space=pltpu.VMEM),  # wT (resident)
            pl.BlockSpec((1, h), vec, memory_space=pltpu.VMEM),  # mean
            pl.BlockSpec((1, h), vec, memory_space=pltpu.VMEM),  # r
            pl.BlockSpec((1, h), vec, memory_space=pltpu.VMEM),  # beta
            pl.BlockSpec((1, h), vec, memory_space=pltpu.VMEM),  # c1
            pl.BlockSpec((1, h), vec, memory_space=pltpu.VMEM),  # c2
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, h), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), g.dtype),
            jax.ShapeDtypeStruct((n, h), g.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * k,
            bytes_accessed=(2 * n * h + h * k + n * k + n * h) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g, z, mask128, wt, mean.reshape(1, h), r.reshape(1, h), beta.reshape(1, h),
      c1.reshape(1, h), c2.reshape(1, h))


# ---------------------------------------------------------------------------
# the custom-VJP layer
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bn_relu_layer(h, w, b, beta, mask, eps: float, interpret: bool):
    """relu(maskedBN(h @ w + b)) with batch moments — forward bit-identical
    to the unfused models/dnn.py chain; backward runs the fused Pallas
    dgrad. Returns ``(act, batch_mean, batch_var)`` (the caller folds the
    moments into the moving averages exactly as before)."""
    act, mean, var, _ = _forward(h, w, b, beta, mask, eps)
    return act, mean, var


def _forward(h, w, b, beta, mask, eps):
    compute_dtype = h.dtype
    y = jax.lax.dot_general(
        h, w.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = (y + b.astype(jnp.float32)).astype(compute_dtype)
    zf = z.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(zf * mask, axis=0) / count
    var = jnp.sum(jnp.square(zf) * mask, axis=0) / count - jnp.square(mean)
    bn = ((zf - mean) * jax.lax.rsqrt(var + eps) + beta).astype(z.dtype)
    act = jnp.maximum(bn, jnp.zeros_like(bn))
    return act, mean, var, (z, count)


def _fwd(h, w, b, beta, mask, eps, interpret):
    act, mean, var, (z, count) = _forward(h, w, b, beta, mask, eps)
    residuals = (h, w, beta, mask, z, mean, var, count)
    return (act, mean, var), residuals


def _bwd(eps, interpret, residuals, cotangents):
    g, _dmean, _dvar = cotangents  # moments feed non-differentiated state
    h, w, beta, mask, z, mean, var, count = residuals
    f32 = jnp.float32

    # pass 1 (XLA): relu gate + moment-feedback reductions
    zf = z.astype(f32)
    xhat = zf - mean
    r = jax.lax.rsqrt(var + eps)
    bn = (xhat * r + beta).astype(z.dtype)
    dpre = jnp.where(bn > 0, g.astype(f32), 0.0) * mask
    s1 = jnp.sum(dpre, axis=0)
    s2 = jnp.sum(dpre * xhat, axis=0)
    c1 = r * s1 / count
    c2 = r * r * r * s2 / count
    dbeta = s1  # Σ dpre (padding rows carry zero cotangent)

    # pass 2 (Pallas): dz in the dgrad prologue, dz emitted for the wgrad
    dh, dz = _fused_dgrad(
        g, z, mask.reshape(-1), jnp.transpose(w).astype(z.dtype),
        mean, r, beta, c1, c2, interpret=interpret,
    )

    dzf = dz.astype(f32)
    db = jnp.sum(dzf, axis=0)
    dw = jax.lax.dot_general(
        h, dz,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dh, dw, db, dbeta, None


bn_relu_layer.defvjp(_fwd, _bwd)
