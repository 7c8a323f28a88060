"""Masked GRU recurrence with a hand-written backward scan.

GRU companion to :mod:`tfkaldi_tpu.ops.lstm_scan` (the reference has no
sequence model at all — neuralNetworks/trainer.py:533-570 never ran — so
both cells are beyond-reference families built on the same Classifier
seam). The formulation is the fused/CuDNN variant: the candidate gate
applies the reset gate to the *recurrent projection*,

    r = sigmoid(gx_r + h @ Wh_r)
    z = sigmoid(gx_z + h @ Wh_z)
    n = tanh(gx_n + r * (h @ Wh_n))
    h' = (1 - z) * n + z * h

which keeps the whole recurrent contribution as ONE ``[B, H] @ [H, 3H]``
matmul per step (the original Cho formulation needs ``(r*h) @ Wh_n`` — a
second matmul inside the scan). Gate order everywhere: r, z, n.

Same design as the LSTM op:

- input projections ``gx`` for the whole sequence are computed outside
  (one big MXU matmul); only the recurrent matmul lives in the scan body
- the backward is the analytic recursion in one reverse ``lax.scan``; its
  single matmul (``dgh @ Wh^T``) takes compute-dtype operands, and the
  weight gradient is hoisted out of the loop as one
  ``[H, T*B] @ [T*B, 3H]`` matmul over the stacked gate cotangents
- residuals are the post-activation gates (f32, so the elementwise
  backward matches autodiff numerics), the hidden stream (f32, for the
  ``z``-gate cotangent ``(h_prev - n)``), the compute-dtype-rounded
  hidden stream (so the weight-grad matmul sees the forward's exact
  operands), and the recurrent ``n`` projection (for the reset-gate
  cotangent)
- ``mask`` freezes the carry past each utterance's end; the step output
  is ``h_t * m_t`` so padded steps emit zeros
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dot(a, b, cd, acc):
    """[M,K]@[K,N] with compute-dtype operands and ``acc`` accumulation."""
    return jax.lax.dot_general(
        a.astype(cd),
        b.astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gru_scan(gx, wh, mask, compute_dtype, unroll, reverse=False):
    """Run the masked GRU recurrence over precomputed gate inputs.

    Args:
      gx: ``[T, B, 3H]`` f32 — input projections plus bias for every step.
      wh: ``[H, 3H]`` f32 — recurrent weights (gate order r, z, n).
      mask: ``[T, B, 1]`` f32 0/1 — 1 at valid frames.
      compute_dtype: matmul operand dtype (static).
      unroll: ``lax.scan`` unroll factor (static).
      reverse: run the recurrence from t=T-1 down to 0 (static). Outputs
        stay in natural time order — no flip copies are materialized.

    Returns:
      ``[T, B, H]`` f32 — ``h_t * mask_t`` (padded steps emit zeros).
    """
    ys, _ = _forward(gx, wh, mask, compute_dtype, unroll, reverse)
    return ys


def _forward(gx, wh, mask, cd, unroll, reverse):
    t, b, three_h = gx.shape
    h_units = three_h // 3
    whc = wh.astype(cd)
    acc = jnp.promote_types(jnp.float32, gx.dtype)

    def step(carry, xs):
        h = carry  # [B, H] f32
        gxt, m = xs
        h_cd = h.astype(cd)  # the rounding the matmul applies; saved as residual
        gh = _dot(h_cd, whc, cd, acc)
        ghr, ghz, ghn = jnp.split(gh, 3, axis=1)
        gxr, gxz, gxn = jnp.split(gxt, 3, axis=1)
        r = jax.nn.sigmoid(gxr + ghr)
        z = jax.nn.sigmoid(gxz + ghz)
        n = jnp.tanh(gxn + r * ghn)
        h_cand = (1.0 - z) * n + z * h
        h_new = jnp.where(m, h_cand, h)
        acts = jnp.concatenate([r, z, n], axis=1)
        return h_new, (h_new * m, acts, h_new, h_cd, ghn)

    zeros = jnp.zeros((b, h_units), gx.dtype)
    _, (ys, acts, hs, h_cds, ghns) = jax.lax.scan(
        step, zeros, (gx, mask), unroll=unroll, reverse=reverse
    )
    return ys, (acts, hs, h_cds, ghns, mask, wh)


def _backward(cd, unroll, reverse, res, dys):
    acts, hs, h_cds, ghns, mask, wh = res
    t, b, three_h = acts.shape
    h_units = three_h // 3
    # carry-input hidden stream: hs shifted one step along the scan
    # direction (the state consumed at step t came from t-1, or t+1 when
    # reversed); the initial carry is zeros
    zrow = jnp.zeros((1, b, h_units), hs.dtype)
    if reverse:
        h_prev = jnp.concatenate([hs[1:], zrow], axis=0)
    else:
        h_prev = jnp.concatenate([zrow, hs[:-1]], axis=0)
    wht = jnp.transpose(wh).astype(cd)  # [3H, H]
    acc = jnp.promote_types(jnp.float32, dys.dtype)

    def step(carry, xs):
        dh = carry  # [B, H] f32
        dy, act, hp, ghn, m = xs
        r, z, n = jnp.split(act, 3, axis=1)
        # where(m, h_cand, h_prev): grads of both branches
        dh_cand = m * (dh + dy)
        dh_prev = (1.0 - m) * dh
        # h_cand = (1 - z) * n + z * h_prev
        dn = (1.0 - z) * dh_cand
        dz = (hp - n) * dh_cand
        dh_prev = dh_prev + z * dh_cand
        # n = tanh(gx_n + r * ghn)
        dpre_n = (1.0 - n * n) * dn
        dr = dpre_n * ghn
        dpre_r = r * (1.0 - r) * dr
        dpre_z = z * (1.0 - z) * dz
        # gh = h_prev @ wh: the n-block cotangent carries the reset gate
        dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=1)
        dh_prev = dh_prev + _dot(dgh.astype(cd), wht, cd, acc)
        dgx = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=1)
        return dh_prev, dgx

    zeros = jnp.zeros((b, h_units), dys.dtype)
    _, dgx = jax.lax.scan(
        step,
        zeros,
        (dys, acts, h_prev, ghns, mask),
        reverse=not reverse,  # cotangents flow against the forward direction
        unroll=unroll,
    )
    # dwh = sum_t h_{t-1}^T @ dgh_t as ONE [H, T*B] @ [T*B, 3H] matmul;
    # dgh differs from dgx only in the n-block (extra reset-gate factor)
    r_stream = acts[:, :, :h_units]
    dgh = jnp.concatenate(
        [dgx[:, :, : 2 * h_units], dgx[:, :, 2 * h_units :] * r_stream], axis=2
    )
    dwh = jax.lax.dot_general(
        h_cds,
        dgh.astype(cd),
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=acc,
    )
    return dgx, dwh.astype(wh.dtype), jnp.zeros_like(mask)


gru_scan.defvjp(_forward, _backward)
