"""Fused BN-backward layer vs the unfused autodiff path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.models import DNN, DNNConfig


def _setup(compute_dtype, n_layers=2, units=256, fused=True):
    cfg = dict(
        input_dim=256, num_labels=64, num_hidden_layers=n_layers,
        num_hidden_units=units, nonlin="relu", batch_norm=True,
        compute_dtype=compute_dtype,
    )
    return (
        DNN(DNNConfig(**cfg, fused_bn_bwd=fused)),
        DNN(DNNConfig(**cfg, fused_bn_bwd=False)),
    )


def _batch(b=4, t=128, f=256, o=64, seed=0):
    rng = np.random.default_rng(seed)
    inputs = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(t // 2, t + 1, (b,)).astype(np.int32))
    targets = jnp.asarray(rng.integers(0, o, (b, t)).astype(np.int32))
    return inputs, lengths, targets


def _loss_fn(model):
    def loss(params, state, inputs, lengths, targets):
        logits, new_state = model.apply(params, state, inputs, lengths, train=True)
        import optax

        t = logits.shape[1]
        mask = jnp.arange(t)[None, :] < lengths[:, None]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
        return jnp.sum(ce * mask), new_state

    return loss


@pytest.mark.parametrize("compute_dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_autodiff(compute_dtype):
    fused_model, ref_model = _setup(compute_dtype)
    params, state = ref_model.init(jax.random.PRNGKey(0))
    inputs, lengths, targets = _batch()

    grad_ref = jax.jit(jax.value_and_grad(_loss_fn(ref_model), has_aux=True))
    grad_fused = jax.jit(jax.value_and_grad(_loss_fn(fused_model), has_aux=True))

    (loss_r, state_r), g_r = grad_ref(params, state, inputs, lengths, targets)
    (loss_f, state_f), g_f = grad_fused(params, state, inputs, lengths, targets)

    # forward is the same ops in the same order: bit-identical loss + stats
    np.testing.assert_array_equal(np.asarray(loss_r), np.asarray(loss_f))
    np.testing.assert_array_equal(
        np.asarray(state_r["bn_mean"]), np.asarray(state_f["bn_mean"])
    )
    np.testing.assert_array_equal(
        np.asarray(state_r["bn_var"]), np.asarray(state_f["bn_var"])
    )

    # backward matches autodiff to accumulation-order noise
    flat_r = jax.tree_util.tree_leaves_with_path(g_r)
    flat_f = jax.tree_util.tree_leaves(g_f)
    tol = 1e-5 if compute_dtype == jnp.float32 else 2e-2
    for (path, a), b in zip(flat_r, flat_f):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-3)
        err = np.abs(a - b).max() / scale
        assert err < tol, (jax.tree_util.keystr(path), err)


def test_padding_rows_do_not_leak():
    """Gradients must be invariant to garbage in padding frames (the mask
    feedback term is the only thing keeping padded rows out of the BN
    statistics backward)."""
    fused_model, _ = _setup(jnp.float32)
    params, state = fused_model.init(jax.random.PRNGKey(0))
    inputs, lengths, targets = _batch()
    t = inputs.shape[1]
    frame_ok = (jnp.arange(t)[None, :] < lengths[:, None])[..., None]

    grad = jax.jit(jax.value_and_grad(_loss_fn(fused_model), has_aux=True))
    (_, _), g_a = grad(params, state, inputs, lengths, targets)
    poisoned = jnp.where(frame_ok, inputs, 1e3)
    (_, _), g_b = grad(params, state, poisoned, lengths, targets)
    for a, b in zip(jax.tree_util.tree_leaves(g_a), jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_path_unchanged():
    """fused_bn_bwd must not touch eval-mode forward at all."""
    fused_model, ref_model = _setup(jnp.bfloat16)
    params, state = ref_model.init(jax.random.PRNGKey(1))
    inputs, lengths, _ = _batch(seed=3)
    lo_f, _ = fused_model.apply(params, state, inputs, lengths, train=False)
    lo_r, _ = ref_model.apply(params, state, inputs, lengths, train=False)
    np.testing.assert_array_equal(np.asarray(lo_f), np.asarray(lo_r))


def test_unsupported_shapes_fall_back():
    """Row counts not divisible by the tile fall back to the XLA path."""
    fused_model, ref_model = _setup(jnp.float32)
    params, state = ref_model.init(jax.random.PRNGKey(0))
    inputs, lengths, targets = _batch(b=3, t=100)  # 300 rows: not tileable

    grad_f = jax.jit(jax.value_and_grad(_loss_fn(fused_model), has_aux=True))
    grad_r = jax.jit(jax.value_and_grad(_loss_fn(ref_model), has_aux=True))
    (loss_f, _), _ = grad_f(params, state, inputs, lengths, targets)
    (loss_r, _), _ = grad_r(params, state, inputs, lengths, targets)
    np.testing.assert_array_equal(np.asarray(loss_f), np.asarray(loss_r))
