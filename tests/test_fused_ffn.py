"""Fused Pallas FFN kernel vs the XLA reference path.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel code
compiles to Mosaic on a real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.models import DNN, DNNConfig
from tfkaldi_tpu.ops import fused_ffn_block


def test_kernel_matches_jnp():
    rng = np.random.default_rng(0)
    n, k, m = 512, 512, 512
    x = rng.standard_normal((n, k)).astype(np.float32)
    w = (rng.standard_normal((k, m)) * 0.05).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, m).astype(np.float32)
    shift = rng.standard_normal(m).astype(np.float32)

    got = np.asarray(fused_ffn_block(x, w, b, scale, shift, relu=True))
    want = np.maximum((x @ w + b) * scale + shift, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kernel_no_affine_no_relu():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((512, 512)).astype(np.float32)
    w = (rng.standard_normal((512, 512)) * 0.05).astype(np.float32)
    b = np.zeros(512, np.float32)
    got = np.asarray(fused_ffn_block(x, w, b, relu=False))
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-5)


def _outputs(use_pallas: bool, batch_norm: bool):
    cfg = DNNConfig(
        input_dim=512,
        num_labels=16,
        num_hidden_layers=2,
        num_hidden_units=512,
        nonlin="relu",
        batch_norm=batch_norm,
        use_pallas_ffn=use_pallas,
    )
    model = DNN(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    if batch_norm:  # non-trivial moving stats
        state["bn_mean"] = state["bn_mean"] + 0.3
        state["bn_var"] = state["bn_var"] * 1.7
    rng = np.random.default_rng(2)
    inputs = jnp.asarray(rng.standard_normal((4, 128, 512)).astype(np.float32))
    lengths = jnp.asarray([128, 100, 64, 128], jnp.int32)
    logits, _ = model.apply(params, state, inputs, lengths, train=False)
    return np.asarray(logits)


def test_dnn_inference_fused_matches_xla():
    for bn in (False, True):
        np.testing.assert_allclose(
            _outputs(True, bn), _outputs(False, bn), rtol=2e-5, atol=2e-5
        )


def test_untileable_input_dim_falls_back():
    """Spliced input dims >512 that aren't multiples of 512 must take the
    XLA path instead of crashing the Pallas kernel."""
    cfg = DNNConfig(
        input_dim=600,
        num_labels=8,
        num_hidden_layers=1,
        num_hidden_units=512,
        nonlin="relu",
        use_pallas_ffn=True,
    )
    model = DNN(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.standard_normal((4, 128, 600)).astype(np.float32))
    logits, _ = model.apply(
        params, state, inputs, jnp.full(4, 128, jnp.int32), train=False
    )
    assert logits.shape == (4, 128, 8)
