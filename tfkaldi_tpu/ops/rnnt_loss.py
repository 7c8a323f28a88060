"""RNN-T (transducer) loss — Graves 2012, TPU-native formulation.

The reference framework has no sequence-transduction loss at all (its CTC
trainer was never finished, reference trainer.py:533-570); the transducer
is the modern streaming-ASR objective that the CTC/attention families here
are usually compared against, so the framework ships it as a first-class
loss (``loss = rnnt`` with ``model = transducer``).

TPU design — one scan, vector rows, no wavefront:

The textbook alpha recursion is serial in BOTH axes of the (T, U) lattice::

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + label[t, u-1])

GPU implementations walk T+U-1 anti-diagonals. On TPU that shape is poison:
T+U sequential steps of ragged diagonal gathers. Instead, note that WITHIN
a row t the recursion is a first-order linear recurrence in log space, and
linear recurrences have a closed form. With

    A[u] = alpha[t-1, u] + blank[t-1, u]      (the fixed per-row source)
    C[u] = sum_{j<u} label[t, j]              (a plain cumsum)

unrolling the in-row recursion gives

    alpha[t, u] = logsumexp_{k<=u} (A[k] + C[u] - C[k])
                = C[u] + cumlogsumexp(A - C)[u]

so the whole row updates with ONE ``jax.lax.cumlogsumexp`` over the U axis
(an XLA associative scan — log2(U) vector steps, all lanes busy) and the
only sequential axis left is T via ``lax.scan``. Memory is O(B·U) carry +
the stacked rows; gradients flow through the scan by autodiff (the
cumulative ops have exact VJPs), so the backward pass is another
row-parallel scan rather than a hand-scheduled beta recursion.

Padding: label positions past ``label_lengths`` carry ``_NEG`` (a large
finite negative, not -inf — -inf produces NaN through the max-subtracted
cumulative and poisons autodiff with 0·inf). Garbage stays confined to
u > U_b because a cumulative op only looks backward (k <= u), and the
final gather reads alpha at exactly (T_b - 1, U_b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# large finite stand-in for -inf: exp(_NEG - anything reasonable) == 0.0
# exactly in f32, but arithmetic on it stays finite (no NaN in autodiff)
_NEG = -1e9


def rnnt_alpha_loss(
    lp_blank: jnp.ndarray,  # [B, T, U+1] log P(blank | t, u)
    lp_label: jnp.ndarray,  # [B, T, U]   log P(labels[b, u] | t, u)
    input_lengths: jnp.ndarray,  # [B] valid encoder frames
    label_lengths: jnp.ndarray,  # [B] valid labels (<= U)
) -> jnp.ndarray:
    """Alpha-recursion core: per-sequence NLL ``[B]`` from lattice scores.

    The module docstring's row-closed-form scan. Callers must already have
    masked ``lp_label`` past each row's label length to ``_NEG`` (both
    entry points below do). Split out so the fused joint→scores path
    (models/transducer.py::lattice_scores) can feed it without ever
    materializing the full ``[B, T, U+1, V]`` joint-logit tensor.
    """
    b, t_max, u_plus1 = lp_blank.shape
    u_max = u_plus1 - 1

    # time-major rows for the scan
    lp_blank_t = jnp.transpose(lp_blank, (1, 0, 2))  # [T, B, U+1]
    lp_label_t = jnp.transpose(lp_label, (1, 0, 2))  # [T, B, U]

    # C[u] = cumsum of the row's label scores, shifted: C[0] = 0
    zeros = jnp.zeros((t_max, b, 1), jnp.float32)
    c_rows = jnp.cumsum(jnp.concatenate([zeros, lp_label_t], axis=2), axis=2)
    c_rows = c_rows[:, :, :u_plus1]  # [T, B, U+1]

    # virtual row t = -1: only the (0, 0) corner is reachable
    a_init = jnp.full((b, u_plus1), _NEG, jnp.float32).at[:, 0].set(0.0)

    def row(a_prev, xs):
        c_row, blank_row = xs
        alpha = c_row + jax.lax.cumlogsumexp(a_prev - c_row, axis=1)
        return alpha + blank_row, alpha

    _, alphas = jax.lax.scan(row, a_init, (c_rows, lp_blank_t))  # [T, B, U+1]

    # log-likelihood: exit the lattice from (T_b - 1, U_b) with a blank
    bi = jnp.arange(b)
    tt = jnp.maximum(input_lengths - 1, 0)
    uu = jnp.minimum(label_lengths, u_max)
    loglik = alphas[tt, bi, uu] + lp_blank[bi, tt, uu]
    return -loglik


def mask_label_scores(
    lp_label: jnp.ndarray, label_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Mask label-transition scores past each row's label length to ``_NEG``
    (see the module docstring's padding note)."""
    u_max = lp_label.shape[-1]
    valid_u = jnp.arange(u_max)[None, None, :] < label_lengths[:, None, None]
    return jnp.where(valid_u, lp_label, _NEG)


def rnnt_loss(
    logits: jnp.ndarray,  # [B, T, U+1, V] joint-network outputs (unnormalized)
    labels: jnp.ndarray,  # [B, U] int32 target labels (no blanks)
    input_lengths: jnp.ndarray,  # [B] valid encoder frames
    label_lengths: jnp.ndarray,  # [B] valid labels (<= U)
    blank_id: int,
) -> jnp.ndarray:
    """Per-sequence negative log-likelihood ``[B]`` of the RNN-T lattice.

    ``logits[b, t, u]`` is the joint network's distribution after emitting
    ``u`` labels at encoder frame ``t``; index ``blank_id`` advances t,
    index ``labels[b, u]`` advances u. Rows/frames past the stated lengths
    are ignored (the loss is invariant to padding content).

    This entry point takes materialized joint logits (simple, and what the
    unit/oracle tests pin); the production trainer instead feeds
    :func:`rnnt_alpha_loss` from the chunked fused score path
    (models/transducer.py::lattice_scores), which never holds the full
    ``[B, T, U+1, V]`` tensor.
    """
    b, t_max, u_plus1, _ = logits.shape
    u_max = u_plus1 - 1
    if labels.shape[1] != u_max:
        raise ValueError(
            f"labels U={labels.shape[1]} must be logits' U+1-1={u_max}"
        )

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_blank = log_probs[..., blank_id]  # [B, T, U+1]
    # lp_label[b, t, u] = log P(labels[b, u] | t, u)  for u < U
    idx = jnp.broadcast_to(labels[:, None, :, None], (b, t_max, u_max, 1))
    lp_label = jnp.take_along_axis(log_probs[:, :, :u_max, :], idx, axis=-1)[..., 0]
    # mask label transitions past each row's label length
    lp_label = mask_label_scores(lp_label, label_lengths)
    return rnnt_alpha_loss(lp_blank, lp_label, input_lengths, label_lengths)
