"""lstm_scan custom-VJP op: values and gradients vs an autodiff oracle.

The oracle is the plain inline ``lax.scan`` LSTM step this op replaced
(models/rnn.py history), differentiated by JAX autodiff. The custom
backward was additionally verified exact to 1e-14 against the oracle in
float64 (see ops/lstm_scan.py); in float32 the two recursions accumulate
rounding differently, so tolerances here are float-noise scaled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.ops.lstm_scan import lstm_scan

T, B, H = 48, 4, 16


def oracle_scan(gx, wh, mask, cd):
    whc = wh.astype(cd)

    def step(carry, xs):
        h, c = carry
        gxt, m = xs
        gates = gxt + jax.lax.dot_general(
            h.astype(cd), whc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gi, gf, gg, go = jnp.split(gates, 4, axis=1)
        c_new = jax.nn.sigmoid(gf) * c + jax.nn.sigmoid(gi) * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
        h_new = jnp.where(m, h_new, h)
        c_new = jnp.where(m, c_new, c)
        return (h_new, c_new), h_new * m

    zeros = jnp.zeros((gx.shape[1], wh.shape[0]), jnp.float32)
    _, ys = jax.lax.scan(step, (zeros, zeros), (gx, mask), unroll=1)
    return ys


def _data(seed=0):
    rng = np.random.default_rng(seed)
    gx = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32))
    wh = jnp.asarray((rng.standard_normal((H, 4 * H)) / np.sqrt(H)).astype(np.float32))
    lengths = np.array([T, T - 17, 7, 1])
    mask = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None, :])[:, :, None].astype(np.float32)
    )
    cot = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))
    return gx, wh, mask, cot, lengths


@pytest.mark.parametrize("unroll", [1, 4])
def test_forward_matches_oracle(unroll):
    gx, wh, mask, _, _ = _data()
    got = lstm_scan(gx, wh, mask, jnp.float32, unroll)
    want = oracle_scan(gx, wh, mask, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-6)


def test_grads_match_autodiff_oracle():
    gx, wh, mask, cot, _ = _data()

    g1 = jax.grad(
        lambda a, b: jnp.sum(lstm_scan(a, b, mask, jnp.float32, 1) * cot),
        argnums=(0, 1),
    )(gx, wh)
    g2 = jax.grad(
        lambda a, b: jnp.sum(oracle_scan(a, b, mask, jnp.float32) * cot),
        argnums=(0, 1),
    )(gx, wh)
    for a, b in zip(g1, g2):
        scale = np.max(np.abs(np.asarray(b)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=5e-4 * scale
        )


def test_padded_steps_get_zero_gradient():
    gx, wh, mask, cot, lengths = _data()
    dgx = jax.grad(
        lambda a: jnp.sum(lstm_scan(a, wh, mask, jnp.float32, 1) * cot)
    )(gx)
    dgx = np.asarray(dgx)
    for col, n in enumerate(lengths):
        assert np.all(dgx[n:, col, :] == 0.0), f"utt {col} leaks grads into padding"
        if n > 1:
            assert np.any(dgx[: n - 1, col, :] != 0.0)


def test_grad_padding_invariance():
    """Grads at valid frames are unchanged when padding garbage changes."""
    gx, wh, mask, cot, lengths = _data()
    rng = np.random.default_rng(9)
    noise = jnp.asarray(rng.standard_normal(gx.shape).astype(np.float32))
    gx_garbage = jnp.where(mask > 0, gx, gx + 7.7 * noise)

    def loss(a, b):
        return jnp.sum(lstm_scan(a, b, mask, jnp.float32, 1) * cot)

    d1 = jax.grad(loss, argnums=1)(gx, wh)
    d2 = jax.grad(loss, argnums=1)(gx_garbage, wh)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=0, atol=1e-6)


def test_reverse_equals_flip_scan_flip():
    gx, wh, mask, cot, _ = _data()

    def loss_rev(a, b):
        return jnp.sum(lstm_scan(a, b, mask, jnp.float32, 1, reverse=True) * cot)

    def loss_flip(a, b):
        ys = lstm_scan(
            jnp.flip(a, 0), b, jnp.flip(mask, 0), jnp.float32, 1
        )
        return jnp.sum(jnp.flip(ys, 0) * cot)

    y1 = lstm_scan(gx, wh, mask, jnp.float32, 1, reverse=True)
    y2 = jnp.flip(lstm_scan(jnp.flip(gx, 0), wh, jnp.flip(mask, 0), jnp.float32, 1), 0)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=0, atol=0)

    g1 = jax.grad(loss_rev, argnums=(0, 1))(gx, wh)
    g2 = jax.grad(loss_flip, argnums=(0, 1))(gx, wh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


def test_unroll_invariance_of_grads():
    gx, wh, mask, cot, _ = _data()
    outs = []
    for unroll in (1, 8):
        outs.append(
            jax.grad(
                lambda a, b: jnp.sum(lstm_scan(a, b, mask, jnp.float32, unroll) * cot),
                argnums=(0, 1),
            )(gx, wh)
        )
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
