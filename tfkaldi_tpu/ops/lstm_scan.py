"""Masked LSTM recurrence with a hand-written backward scan.

The reference has no sequence model (its CTC trainer was never finished,
neuralNetworks/trainer.py:533-570); this op backs the TPU-native LSTM
family (models/rnn.py). It exists because reverse-mode autodiff of
``lax.scan`` is generic: XLA saves every intermediate of the step function
per timestep and differentiates the step graph mechanically, and the
cotangent matmuls run with f32 operands. Measured on v5e (T=256, B=32,
H=512): 2.9 ms per direction for forward+grad under autodiff.

This op instead:

- saves exactly three residual streams — the post-activation gates
  ``[T, B, 4H]`` in f32 (the elementwise backward then matches autodiff
  numerics), the cell sequence ``[T, B, H]`` in f32, and the hidden
  sequence ``[T, B, H]`` in the compute dtype the forward matmul already
  rounded it to (so the backward weight-gradient matmul sees bit-identical
  operands)
- runs the analytic LSTM backward recursion in one reverse ``lax.scan``
  whose single matmul (``dgates @ whT``) takes compute-dtype (bf16)
  operands at full MXU rate; the weight gradient is hoisted out of the
  scan entirely as one ``[H, T*B] @ [T*B, 4H]`` matmul over the stacked
  ``dgates``

Semantics (identical to the inline scan it replaces, models/rnn.py):
``mask`` freezes the carry past each utterance's end, the step output is
``h_t * m_t``, and gate order is i, f, g, o.
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
def lstm_scan(gx, wh, mask, compute_dtype, unroll, reverse=False):
    """Run the masked LSTM recurrence over precomputed gate inputs.

    Args:
      gx: ``[T, B, 4H]`` f32 — input projections plus bias for every step.
      wh: ``[H, 4H]`` f32 — recurrent weights (gate order i, f, g, o).
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
    t, b, four_h = gx.shape
    h_units = four_h // 4
    whc = wh.astype(cd)
    acc = jnp.promote_types(jnp.float32, gx.dtype)

    def step(carry, xs):
        h, c = carry  # h [B,H] f32, c [B,H] f32
        gxt, m = xs
        h_cd = h.astype(cd)  # the rounding the matmul applies; saved as residual
        gates = gxt + _dot(h_cd, whc, cd, acc)
        gi, gf, gg, go = jnp.split(gates, 4, axis=1)
        i = jax.nn.sigmoid(gi)
        f = jax.nn.sigmoid(gf)
        g = jnp.tanh(gg)
        o = jax.nn.sigmoid(go)
        c_cand = f * c + i * g
        h_cand = o * jnp.tanh(c_cand)
        h_new = jnp.where(m, h_cand, h)
        c_new = jnp.where(m, c_cand, c)
        acts = jnp.concatenate([i, f, g, o], axis=1)
        return (h_new, c_new), (h_new * m, acts, c_new, h_cd)

    zeros = jnp.zeros((b, h_units), gx.dtype)
    _, (ys, acts, cs, h_cds) = jax.lax.scan(
        step, (zeros, zeros), (gx, mask), unroll=unroll, reverse=reverse
    )
    return ys, (acts, cs, h_cds, mask, wh)


def _backward(cd, unroll, reverse, res, dys):
    acts, cs, h_cds, mask, wh = res
    t, b, four_h = acts.shape
    h_units = four_h // 4
    # carry-input cell stream: cs shifted one step along the scan direction
    # (the state consumed at step t came from t-1, or t+1 when reversed)
    zrow = jnp.zeros((1, b, h_units), cs.dtype)
    if reverse:
        c_prev = jnp.concatenate([cs[1:], zrow], axis=0)
    else:
        c_prev = jnp.concatenate([zrow, cs[:-1]], axis=0)
    wht = jnp.transpose(wh).astype(cd)  # [4H, H]
    acc = jnp.promote_types(jnp.float32, dys.dtype)

    def step(carry, xs):
        dh, dc = carry  # dh, dc [B,H] f32
        dy, act, cp, ct, m = xs
        i, f, g, o = jnp.split(act, 4, axis=1)
        # where(m, h_cand, h_prev): grads of both branches
        dh_cand = m * (dh + dy)
        dh_prev = (1.0 - m) * dh
        dc_cand = m * dc
        dc_prev = (1.0 - m) * dc
        # h_cand = o * tanh(c_cand); at m=1, c_cand == c_t (else factor is 0)
        tc = jnp.tanh(ct)
        do_gate = tc * dh_cand
        dc_cand = dc_cand + o * (1.0 - tc * tc) * dh_cand
        # c_cand = f * c_prev + i * g
        df_gate = cp * dc_cand
        dc_prev = dc_prev + f * dc_cand
        di_gate = g * dc_cand
        dg_gate = i * dc_cand
        # through the activations to the pre-activation gates
        dgates = jnp.concatenate(
            [
                i * (1.0 - i) * di_gate,
                f * (1.0 - f) * df_gate,
                (1.0 - g * g) * dg_gate,
                o * (1.0 - o) * do_gate,
            ],
            axis=1,
        )
        # gates = gx_t + h_prev @ wh
        dh_prev = dh_prev + _dot(dgates.astype(cd), wht, cd, acc)
        return (dh_prev, dc_prev), dgates

    zeros = jnp.zeros((b, h_units), dys.dtype)
    _, dgx = jax.lax.scan(
        step,
        (zeros, zeros),
        (dys, acts, c_prev, cs, mask),
        reverse=not reverse,  # cotangents flow against the forward direction
        unroll=unroll,
    )
    # dwh = sum_t h_{t-1}^T @ dgates_t as ONE [H, T*B] @ [T*B, 4H] matmul —
    # same compute-dtype products as a per-step accumulation, but at full
    # MXU efficiency and without a [H,4H] f32 carry in the scan
    dwh = jax.lax.dot_general(
        h_cds,
        dgx.astype(cd),
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=acc,
    )
    return dgx, dwh.astype(wh.dtype), jnp.zeros_like(mask)


lstm_scan.defvjp(_forward, _backward)
