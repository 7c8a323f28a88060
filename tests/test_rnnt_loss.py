"""RNN-T loss vs a brute-force lattice oracle.

The oracle is the textbook serial DP (Graves 2012) in float64 numpy; the
production loss (ops/rnnt_loss.py) is the row-parallel cumlogsumexp
formulation. Checks: exact likelihoods on random lattices, padding
invariance in both axes, degenerate shapes, and gradients against autodiff
of an independently-written differentiable DP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.ops.rnnt_loss import rnnt_loss


def oracle_nll(log_probs, labels, t_len, u_len, blank):
    """Serial alpha DP, float64. log_probs [T, U+1, V], labels [U]."""
    lp = np.asarray(log_probs, np.float64)
    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            terms = []
            if t > 0:
                terms.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                terms.append(alpha[t, u - 1] + lp[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(terms)
    return -(alpha[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])


def random_case(rng, b=3, t=7, u=4, v=6, blank=0):
    logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32) * 2.0
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_lens = rng.integers(u + 1, t + 1, (b,)).astype(np.int32)  # T >= U+1 paths exist
    u_lens = rng.integers(1, u + 1, (b,)).astype(np.int32)
    return logits, labels, t_lens, u_lens, blank


def test_matches_oracle():
    rng = np.random.default_rng(0)
    logits, labels, t_lens, u_lens, blank = random_case(rng)
    got = np.asarray(rnnt_loss(logits, labels, t_lens, u_lens, blank))
    log_probs = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    for b in range(logits.shape[0]):
        want = oracle_nll(
            np.asarray(log_probs[b]), labels[b], int(t_lens[b]), int(u_lens[b]), blank
        )
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_nonzero_blank_id():
    rng = np.random.default_rng(1)
    b, t, u, v, blank = 2, 6, 3, 5, 4
    logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
    labels = rng.integers(0, 4, (b, u)).astype(np.int32)
    t_lens = np.array([6, 5], np.int32)
    u_lens = np.array([3, 2], np.int32)
    got = np.asarray(rnnt_loss(logits, labels, t_lens, u_lens, blank))
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    for i in range(b):
        want = oracle_nll(
            np.asarray(log_probs[i]), labels[i], int(t_lens[i]), int(u_lens[i]), blank
        )
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_padding_invariance():
    """Extra T/U padding with arbitrary content must not change the loss."""
    rng = np.random.default_rng(2)
    logits, labels, t_lens, u_lens, blank = random_case(rng, b=2, t=5, u=3)
    base = np.asarray(rnnt_loss(logits, labels, t_lens, u_lens, blank))

    pad_t, pad_u = 4, 3
    b, t, u1, v = logits.shape
    big = rng.standard_normal((b, t + pad_t, u1 + pad_u, v)).astype(np.float32) * 9
    big[:, :t, :u1, :] = logits
    big_labels = rng.integers(1, v, (b, u1 - 1 + pad_u)).astype(np.int32)
    big_labels[:, : u1 - 1] = labels
    padded = np.asarray(rnnt_loss(big, big_labels, t_lens, u_lens, blank))
    np.testing.assert_allclose(padded, base, rtol=1e-5, atol=1e-5)


def test_empty_label_sequence():
    """U_b = 0: the only path is all blanks along t."""
    rng = np.random.default_rng(3)
    b, t, u, v = 2, 4, 2, 5
    logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_lens = np.array([4, 3], np.int32)
    u_lens = np.zeros((b,), np.int32)
    got = np.asarray(rnnt_loss(logits, labels, t_lens, u_lens, 0))
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1), np.float64)
    for i in range(b):
        want = -sum(lp[i, k, 0, 0] for k in range(int(t_lens[i])))
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def _diffable_dp(logits, labels, t_len, u_len, blank):
    """Independent differentiable DP (python loops, tiny shapes only)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    rows = {(0, 0): jnp.asarray(0.0, jnp.float32)}
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            terms = []
            if t > 0:
                terms.append(rows[(t - 1, u)] + lp[t - 1, u, blank])
            if u > 0:
                terms.append(rows[(t, u - 1)] + lp[t, u - 1, labels[u - 1]])
            acc = terms[0]
            for extra in terms[1:]:
                acc = jnp.logaddexp(acc, extra)
            rows[(t, u)] = acc
    return -(rows[(t_len - 1, u_len)] + lp[t_len - 1, u_len, blank])


def test_gradients_match_reference_dp():
    rng = np.random.default_rng(4)
    t, u, v, blank = 5, 3, 4, 0
    logits = rng.standard_normal((1, t, u + 1, v)).astype(np.float32)
    labels = rng.integers(1, v, (1, u)).astype(np.int32)
    t_lens = np.array([t], np.int32)
    u_lens = np.array([u], np.int32)

    g_ours = jax.grad(
        lambda x: jnp.sum(rnnt_loss(x, labels, t_lens, u_lens, blank))
    )(jnp.asarray(logits))
    g_ref = jax.grad(
        lambda x: _diffable_dp(x[0], labels[0], t, u, blank)
    )(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
    # gradient mass lives only inside the valid lattice
    assert float(jnp.abs(g_ours[:, t:, :, :]).sum()) == pytest.approx(0.0, abs=1e-6)


def test_grads_finite_under_padding():
    rng = np.random.default_rng(5)
    logits, labels, t_lens, u_lens, blank = random_case(rng, b=4, t=9, u=5)
    g = jax.grad(
        lambda x: jnp.sum(rnnt_loss(x, labels, t_lens, u_lens, blank))
    )(jnp.asarray(logits))
    assert bool(jnp.isfinite(g).all())
    # padded-frame gradients are exactly zero (no path reaches them)
    for i, (tl, ul) in enumerate(zip(t_lens, u_lens)):
        assert float(jnp.abs(g[i, tl:, :, :]).sum()) == 0.0
        assert float(jnp.abs(g[i, :, ul + 1 :, :]).sum()) == 0.0


def test_fused_lattice_scores_match_materialized():
    """The trainer's fused score path (lattice_scores → rnnt_alpha_loss,
    which never materializes [B, T, U+1, V]) must equal the materialized
    apply_transducer → rnnt_loss formulation — losses bit-close and grads
    within f32 reduction noise — including a T that does NOT divide the
    chunk size (exercises the zero-padded tail block)."""
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig
    from tfkaldi_tpu.ops.rnnt_loss import mask_label_scores, rnnt_alpha_loss

    cfg = TransducerConfig(
        input_dim=8, num_labels=5, enc_layers=1, enc_units=16,
        pred_layers=1, pred_units=12, embed_dim=6, joint_units=10,
        joint_chunk_t=4,  # T=11 below → ragged final block
    )
    model = Transducer(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    b, t, u = 3, 11, 4
    x = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    xl = jnp.asarray([11, 7, 5], jnp.int32)
    y = jnp.asarray(rng.integers(0, 5, (b, u)).astype(np.int32))
    yl = jnp.asarray([4, 2, 3], jnp.int32)

    def loss_ref(p):
        logits, _ = model.apply_transducer(p, state, x, xl, y, yl, train=False)
        return rnnt_loss(logits, y, xl, yl, model.blank_id)

    def loss_fused(p):
        lpb, lpl, _ = model.lattice_scores(p, state, x, xl, y, yl, train=False)
        return rnnt_alpha_loss(lpb, mask_label_scores(lpl, yl), xl, yl)

    np.testing.assert_allclose(
        np.asarray(loss_fused(params)), np.asarray(loss_ref(params)),
        rtol=1e-6, atol=1e-6,
    )
    g_ref = jax.grad(lambda p: jnp.sum(loss_ref(p)))(params)
    g_fused = jax.grad(lambda p: jnp.sum(loss_fused(p)))(params)
    for path, a in jax.tree_util.tree_flatten_with_path(g_ref)[0]:
        b_ = jax.tree_util.tree_flatten_with_path(g_fused)[0]
        fused_leaf = dict(
            (jax.tree_util.keystr(k), v) for k, v in b_
        )[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(fused_leaf), np.asarray(a), rtol=5e-5, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_scores_padding_invariance():
    """Fused scores ignore padding content in both T and U axes."""
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig
    from tfkaldi_tpu.ops.rnnt_loss import mask_label_scores, rnnt_alpha_loss

    cfg = TransducerConfig(
        input_dim=6, num_labels=4, enc_layers=1, enc_units=12,
        pred_layers=1, pred_units=8, embed_dim=5, joint_units=8,
        joint_chunk_t=3,
    )
    model = Transducer(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(12)
    b, t, u = 2, 7, 3
    x = rng.standard_normal((b, t, 6)).astype(np.float32)
    xl = jnp.asarray([7, 5], jnp.int32)
    y = rng.integers(0, 4, (b, u)).astype(np.int32)
    yl = jnp.asarray([3, 2], jnp.int32)

    def run(xa, ya):
        lpb, lpl, _ = model.lattice_scores(
            params, state, jnp.asarray(xa), xl, jnp.asarray(ya), yl, train=False
        )
        return np.asarray(rnnt_alpha_loss(lpb, mask_label_scores(lpl, yl), xl, yl))

    base = run(x, y)
    x_big = np.concatenate(
        [x, rng.standard_normal((b, 4, 6)).astype(np.float32) * 9], axis=1
    )
    y_big = np.concatenate([y, rng.integers(0, 4, (b, 2)).astype(np.int32)], axis=1)
    np.testing.assert_allclose(run(x_big, y_big), base, rtol=1e-5, atol=1e-5)


def test_jit_and_vs_perfect_model():
    """A lattice that puts all mass on the correct path has ~zero loss."""
    t, u, v, blank = 6, 3, 5, 0
    labels = np.array([[1, 2, 3]], np.int32)
    logits = np.full((1, t, u + 1, v), -30.0, np.float32)
    # walk: emit label u at frame u, then blanks
    for tt in range(t):
        for uu in range(u + 1):
            if uu < u and tt == uu:
                logits[0, tt, uu, labels[0, uu]] = 30.0
            else:
                logits[0, tt, uu, blank] = 30.0
    loss = jax.jit(rnnt_loss, static_argnums=4)(
        jnp.asarray(logits), labels, np.array([t], np.int32), np.array([u], np.int32), blank
    )
    assert float(loss[0]) < 1e-3
