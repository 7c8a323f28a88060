"""Pallas TPU kernel for the bidirectional GRU recurrence.

Same design as :mod:`tfkaldi_tpu.ops.pallas_lstm` (see its module doc for
the interleaving rationale): the two independent directions of a BiGRU
layer run interleaved in one grid, issuing both recurrent matmuls back to
back so one direction's MXU work overlaps the other's VPU gate math.

GRU-specific differences from the LSTM kernel:

- gate blocks are ``3H`` (r, z, n — fused/CuDNN formulation, see
  ops/gru_scan.py) and there is no cell state, so the scratch carries are
  just ``h`` per direction
- the recurrent projection of the candidate gate must stay separate from
  the input projection (``n = tanh(gx_n + r * gh_n)``), so the kernel
  keeps ``gx`` and the matmul result apart instead of summing them
  wholesale, and saves ``gh_n`` as a residual for the reset-gate cotangent
- the backward kernel emits BOTH gate-cotangent streams: ``dgx`` (the
  input-projection gradient) and ``dgh`` (its n-block carries the extra
  reset-gate factor) — emitting ``dgh`` from the kernel is cheaper than a
  separate elementwise repass over ``dgx``/``acts`` in HBM

Layout/semantics match ``gru_scan`` exactly (same op order — bit-exact on
chip): gate order r, z, n; the mask freezes the carry past each
utterance's end; outputs are ``h_t * mask_t``; matmul operands in
``compute_dtype`` with f32 accumulation; the weight gradients are hoisted
out of the loop as one ``[H, T·B] @ [T·B, 3H]`` matmul per direction.

Constraints and mesh behavior are shared with the LSTM kernel
(``supported``/``available`` re-exported; batch-dim custom_partitioning).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning

from tfkaldi_tpu.ops.pallas_lstm import (  # shared gates/limits/policy
    CHUNK,
    _VMEM_LIMIT,
    _def_batch_partition,
    available,
    supported,
)

# flipped by tests to run the kernels through the Pallas interpreter on CPU
interpret = False


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _gate_math(gx, gh, h, m, hdim):
    r = jax.nn.sigmoid(gx[:, :hdim] + gh[:, :hdim])
    z = jax.nn.sigmoid(gx[:, hdim : 2 * hdim] + gh[:, hdim : 2 * hdim])
    ghn = gh[:, 2 * hdim :]
    n = jnp.tanh(gx[:, 2 * hdim :] + r * ghn)
    h_cand = (1.0 - z) * n + z * h
    h_new = jnp.where(m > 0, h_cand, h)
    acts = jnp.concatenate([r, z, n], axis=1)
    return h_new, acts, ghn


def _make_fwd_kernel(chunk, residuals):
    """One grid step = ``chunk`` timesteps of BOTH directions (forward
    walks its block top-down, the time-reversed direction bottom-up)."""
    def kernel(*refs):
        if residuals:
            (gxf_ref, gxb_ref, mf_ref, mb_ref, whf_ref, whb_ref,
             ysf_ref, ysb_ref, actsf_ref, actsb_ref, hsf_ref, hsb_ref,
             hcdf_ref, hcdb_ref, ghnf_ref, ghnb_ref,
             hf_ref, hb_ref) = refs
        else:
            (gxf_ref, gxb_ref, mf_ref, mb_ref, whf_ref, whb_ref,
             ysf_ref, ysb_ref,
             hf_ref, hb_ref) = refs

        @pl.when(pl.program_id(0) == 0)
        def _():
            hf_ref[:] = jnp.zeros_like(hf_ref)
            hb_ref[:] = jnp.zeros_like(hb_ref)

        whf = whf_ref[:]
        whb = whb_ref[:]
        hdim = hf_ref.shape[1]

        def body(j, _):
            jr = chunk - 1 - j
            hf = hf_ref[:]
            hb = hb_ref[:]
            hf_cd = hf.astype(whf.dtype)
            hb_cd = hb.astype(whb.dtype)
            # both recurrent matmuls back to back: the second runs on the
            # MXU while the VPU chews the first direction's gate math
            mm_f = jnp.dot(hf_cd, whf, preferred_element_type=jnp.float32)
            mm_b = jnp.dot(hb_cd, whb, preferred_element_type=jnp.float32)
            mf = mf_ref[j][:, None]
            mb = mb_ref[jr][:, None]
            hf_new, acts_f, ghn_f = _gate_math(gxf_ref[j], mm_f, hf, mf, hdim)
            hb_new, acts_b, ghn_b = _gate_math(gxb_ref[jr], mm_b, hb, mb, hdim)
            ysf_ref[j] = hf_new * mf
            ysb_ref[jr] = hb_new * mb
            if residuals:
                actsf_ref[j] = acts_f
                actsb_ref[jr] = acts_b
                hsf_ref[j] = hf_new
                hsb_ref[jr] = hb_new
                hcdf_ref[j] = hf_cd
                hcdb_ref[jr] = hb_cd
                ghnf_ref[j] = ghn_f
                ghnb_ref[jr] = ghn_b
            hf_ref[:] = hf_new
            hb_ref[:] = hb_new
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)

    return kernel


def _fwd_call(gxf, gxb, whf_cd, whb_cd, mask2d, chunk, residuals):
    t, b, three_h = gxf.shape
    h = three_h // 3
    n = t // chunk
    cd = whf_cd.dtype

    fwd_block = lambda i: (i, 0, 0)  # noqa: E731
    rev_block = lambda i, n=n: (n - 1 - i, 0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((chunk, b, three_h), fwd_block),
        pl.BlockSpec((chunk, b, three_h), rev_block),
        pl.BlockSpec((chunk, b), lambda i: (i, 0)),
        pl.BlockSpec((chunk, b), lambda i, n=n: (n - 1 - i, 0)),
        pl.BlockSpec((h, three_h), lambda i: (0, 0)),
        pl.BlockSpec((h, three_h), lambda i: (0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((chunk, b, h), fwd_block),
        pl.BlockSpec((chunk, b, h), rev_block),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, b, h), jnp.float32),
        jax.ShapeDtypeStruct((t, b, h), jnp.float32),
    ]
    if residuals:
        out_specs += [
            pl.BlockSpec((chunk, b, three_h), fwd_block),
            pl.BlockSpec((chunk, b, three_h), rev_block),
            pl.BlockSpec((chunk, b, h), fwd_block),
            pl.BlockSpec((chunk, b, h), rev_block),
            pl.BlockSpec((chunk, b, h), fwd_block),
            pl.BlockSpec((chunk, b, h), rev_block),
            pl.BlockSpec((chunk, b, h), fwd_block),
            pl.BlockSpec((chunk, b, h), rev_block),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((t, b, three_h), jnp.float32),
            jax.ShapeDtypeStruct((t, b, three_h), jnp.float32),
            jax.ShapeDtypeStruct((t, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t, b, h), cd),
            jax.ShapeDtypeStruct((t, b, h), cd),
            jax.ShapeDtypeStruct((t, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t, b, h), jnp.float32),
        ]

    return pl.pallas_call(
        _make_fwd_kernel(chunk, residuals),
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32) for _ in range(2)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(gxf, gxb, mask2d, mask2d, whf_cd, whb_cd)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_gate_math(dy, dh, act, hp, ghn, m, hdim):
    """Analytic per-step GRU backward (identical op order to
    gru_scan._backward so results match it bit-for-bit)."""
    r = act[:, :hdim]
    z = act[:, hdim : 2 * hdim]
    n = act[:, 2 * hdim :]
    dh_cand = m * (dh + dy)
    dh_prev = (1.0 - m) * dh
    dn = (1.0 - z) * dh_cand
    dz = (hp - n) * dh_cand
    dh_prev = dh_prev + z * dh_cand
    dpre_n = (1.0 - n * n) * dn
    dr = dpre_n * ghn
    dpre_r = r * (1.0 - r) * dr
    dpre_z = z * (1.0 - z) * dz
    dgx = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=1)
    dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=1)
    return dgx, dgh, dh_prev


def _make_bwd_kernel(chunk):
    def kernel(dyf_ref, dyb_ref, actsf_ref, actsb_ref, hpf_ref, hpb_ref,
               ghnf_ref, ghnb_ref, mf_ref, mb_ref, whtf_ref, whtb_ref,
               dgxf_ref, dgxb_ref, dghf_ref, dghb_ref,
               dhf_ref, dhb_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            dhf_ref[:] = jnp.zeros_like(dhf_ref)
            dhb_ref[:] = jnp.zeros_like(dhb_ref)

        whtf = whtf_ref[:]
        whtb = whtb_ref[:]
        hdim = dhf_ref.shape[1]
        cd = whtf.dtype

        def body(j, _):
            # cotangents flow against each direction: the fwd direction's
            # backward walks time-reversed blocks bottom-up, the bwd
            # direction's forward-time blocks top-down
            jr = chunk - 1 - j
            mf = mf_ref[jr][:, None]
            mb = mb_ref[j][:, None]
            dgx_f, dgh_f, dhf_prev = _bwd_gate_math(
                dyf_ref[jr], dhf_ref[:], actsf_ref[jr], hpf_ref[jr],
                ghnf_ref[jr], mf, hdim,
            )
            dgx_b, dgh_b, dhb_prev = _bwd_gate_math(
                dyb_ref[j], dhb_ref[:], actsb_ref[j], hpb_ref[j],
                ghnb_ref[j], mb, hdim,
            )
            # both matmuls back to back (MXU/VPU overlap across directions)
            mm_f = jnp.dot(dgh_f.astype(cd), whtf, preferred_element_type=jnp.float32)
            mm_b = jnp.dot(dgh_b.astype(cd), whtb, preferred_element_type=jnp.float32)
            dgxf_ref[jr] = dgx_f
            dgxb_ref[j] = dgx_b
            dghf_ref[jr] = dgh_f
            dghb_ref[j] = dgh_b
            dhf_ref[:] = dhf_prev + mm_f
            dhb_ref[:] = dhb_prev + mm_b
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)

    return kernel


def _bwd_call(dyf, dyb, actsf, actsb, hpf, hpb, ghnf, ghnb, mask2d,
              whtf_cd, whtb_cd, chunk):
    t, b, three_h = actsf.shape
    h = three_h // 3
    n = t // chunk

    fwd3 = lambda i: (i, 0, 0)  # noqa: E731
    rev3 = lambda i, n=n: (n - 1 - i, 0, 0)  # noqa: E731
    fwd2 = lambda i: (i, 0)  # noqa: E731
    rev2 = lambda i, n=n: (n - 1 - i, 0)  # noqa: E731

    # the fwd direction's cotangent scan is time-reversed; the bwd
    # direction's runs in natural time order
    in_specs = [
        pl.BlockSpec((chunk, b, h), rev3),        # dyf
        pl.BlockSpec((chunk, b, h), fwd3),        # dyb
        pl.BlockSpec((chunk, b, three_h), rev3),  # actsf
        pl.BlockSpec((chunk, b, three_h), fwd3),  # actsb
        pl.BlockSpec((chunk, b, h), rev3),        # hpf
        pl.BlockSpec((chunk, b, h), fwd3),        # hpb
        pl.BlockSpec((chunk, b, h), rev3),        # ghnf
        pl.BlockSpec((chunk, b, h), fwd3),        # ghnb
        pl.BlockSpec((chunk, b), rev2),           # mask for fwd dir
        pl.BlockSpec((chunk, b), fwd2),           # mask for bwd dir
        pl.BlockSpec((three_h, h), lambda i: (0, 0)),
        pl.BlockSpec((three_h, h), lambda i: (0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((chunk, b, three_h), rev3),
        pl.BlockSpec((chunk, b, three_h), fwd3),
        pl.BlockSpec((chunk, b, three_h), rev3),
        pl.BlockSpec((chunk, b, three_h), fwd3),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, b, three_h), jnp.float32),
        jax.ShapeDtypeStruct((t, b, three_h), jnp.float32),
        jax.ShapeDtypeStruct((t, b, three_h), jnp.float32),
        jax.ShapeDtypeStruct((t, b, three_h), jnp.float32),
    ]
    return pl.pallas_call(
        _make_bwd_kernel(chunk),
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32) for _ in range(2)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dyf, dyb, actsf, actsb, hpf, hpb, ghnf, ghnb, mask2d, mask2d,
      whtf_cd, whtb_cd)


# ---------------------------------------------------------------------------
# mesh partitioning (same policy as pallas_lstm: batch-dim data parallel)
# ---------------------------------------------------------------------------


@functools.cache
def _fwd_partitioned(chunk, residuals):
    def impl(gxf, gxb, mask2d, whf_cd, whb_cd):
        return _fwd_call(gxf, gxb, whf_cd, whb_cd, mask2d, chunk, residuals)

    f = custom_partitioning(impl)
    f.__wrapped__ = impl
    outs = "t b h2, t b h2"
    if residuals:
        outs += (", t b g, t b g, t b h2, t b h2, t b h2, t b h2"
                 ", t b h2, t b h2")
    rule = f"t b g, t b g, t b, h g, h g -> {outs}"
    return _def_batch_partition(
        f, rule, 10 if residuals else 2, replicated=("t", "g", "h", "h2")
    )


@functools.cache
def _bwd_partitioned(chunk):
    def impl(dyf, dyb, actsf, actsb, hpf, hpb, ghnf, ghnb, mask2d, whtf, whtb):
        return _bwd_call(
            dyf, dyb, actsf, actsb, hpf, hpb, ghnf, ghnb, mask2d, whtf, whtb,
            chunk,
        )

    f = custom_partitioning(impl)
    f.__wrapped__ = impl
    rule = (
        "t b h2, t b h2, t b g, t b g, t b h2, t b h2, t b h2, t b h2, "
        "t b, g h2, g h2 -> t b g, t b g, t b g, t b g"
    )
    # special-factor indices must be sorted: order follows first appearance
    # in the rule (t, then h2, then g)
    return _def_batch_partition(f, rule, 4, replicated=("t", "h2", "g"))


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gru_scan_bidi(gxf, gxb, whf, whb, mask, compute_dtype, chunk=CHUNK):
    """Both directions of a BiGRU layer in one interleaved Pallas kernel.

    Args:
      gxf: ``[T, B, 3H]`` f32 — forward direction's input projections+bias.
      gxb: ``[T, B, 3H]`` f32 — backward direction's (natural time order).
      whf, whb: ``[H, 3H]`` f32 recurrent weights (gate order r, z, n).
      mask: ``[T, B, 1]`` f32 0/1.
      compute_dtype, chunk: static.

    Returns:
      ``(ysf, ysb)`` each ``[T, B, H]`` f32 in natural time order.
    """
    cd = compute_dtype
    mask2d = mask[:, :, 0]
    ysf, ysb = _fwd_entry(chunk, False)(
        gxf, gxb, mask2d, whf.astype(cd), whb.astype(cd)
    )
    return ysf, ysb


def _multi_device() -> bool:
    return jax.device_count() > 1


def _fwd_entry(chunk, residuals):
    if _multi_device():
        return _fwd_partitioned(chunk, residuals)
    return lambda gxf, gxb, mask2d, whf_cd, whb_cd: _fwd_call(
        gxf, gxb, whf_cd, whb_cd, mask2d, chunk, residuals
    )


def _bwd_entry(chunk):
    if _multi_device():
        return _bwd_partitioned(chunk)
    return lambda *args: _bwd_call(*args, chunk)


def _vjp_fwd(gxf, gxb, whf, whb, mask, cd, chunk):
    mask2d = mask[:, :, 0]
    (ysf, ysb, actsf, actsb, hsf, hsb, hcdf, hcdb, ghnf, ghnb) = _fwd_entry(
        chunk, True
    )(gxf, gxb, mask2d, whf.astype(cd), whb.astype(cd))
    return (ysf, ysb), (
        actsf, actsb, hsf, hsb, hcdf, hcdb, ghnf, ghnb, mask2d, whf, whb
    )


def _vjp_bwd(cd, chunk, res, cot):
    actsf, actsb, hsf, hsb, hcdf, hcdb, ghnf, ghnb, mask2d, whf, whb = res
    dyf, dyb = cot
    t, b, three_h = actsf.shape
    h = three_h // 3
    zrow = jnp.zeros((1, b, h), hsf.dtype)
    # carry-input hidden streams (see gru_scan._backward): the fwd direction
    # consumed h from t-1, the reversed direction from t+1
    hpf = jnp.concatenate([zrow, hsf[:-1]], axis=0)
    hpb = jnp.concatenate([hsb[1:], zrow], axis=0)
    whtf = jnp.transpose(whf).astype(cd)
    whtb = jnp.transpose(whb).astype(cd)
    dgxf, dgxb, dghf, dghb = _bwd_entry(chunk)(
        dyf, dyb, actsf, actsb, hpf, hpb, ghnf, ghnb, mask2d, whtf, whtb
    )
    # weight grads hoisted out of the loop (one MXU-efficient matmul each);
    # contracted against dgh — its n-block carries the reset-gate factor
    dn = (((0, 1), (0, 1)), ((), ()))
    dwhf = jax.lax.dot_general(hcdf, dghf.astype(cd), dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    dwhb = jax.lax.dot_general(hcdb, dghb.astype(cd), dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    dmask = jnp.zeros((t, b, 1), jnp.float32)
    return dgxf, dgxb, dwhf.astype(whf.dtype), dwhb.astype(whb.dtype), dmask


gru_scan_bidi.defvjp(_vjp_fwd, _vjp_bwd)
