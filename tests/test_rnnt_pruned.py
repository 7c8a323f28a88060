"""Pruned (banded) RNN-T loss vs the dense loss and a banded oracle.

The pruned loss (ops/rnnt_loss.py::rnnt_alpha_loss_banded + the band
constructors; models/transducer.py::lattice_scores_pruned) restricts the
lattice to a per-frame band of S label positions, k2-style. Contract under
test: (a) a band covering the whole lattice reproduces the dense loss AND
its gradients exactly; (b) the banded recursion matches a brute-force
banded DP for arbitrary monotone bands; (c) the guided band recovers the
dense loss on concentrated-mass lattices where the diagonal band fails;
(d) padding invariance; (e) the trainer's pruned branch trains.

The reference has no transduction loss at all (its CTC trainer was never
finished, reference trainer.py:533-570).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.ops.rnnt_loss import (
    _NEG,
    diagonal_band_starts,
    guided_band_starts,
    mask_band_label_scores,
    mask_label_scores,
    rnnt_alpha_loss,
    rnnt_alpha_loss_banded,
    rnnt_loss,
)


def dense_scores(logits, labels, u_lens, blank):
    """log_softmax → (lp_blank [B,T,U+1], masked lp_label [B,T,U])."""
    b, t, u_plus1, _ = logits.shape
    u = u_plus1 - 1
    lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    lp_blank = lp[..., blank]
    idx = jnp.broadcast_to(jnp.asarray(labels)[:, None, :, None], (b, t, u, 1))
    lp_label = jnp.take_along_axis(lp[:, :, :u, :], idx, axis=-1)[..., 0]
    return lp_blank, mask_label_scores(lp_label, jnp.asarray(u_lens))


def gather_band(arr, starts, s_range, fill=_NEG):
    """Band-gather [B,T,W] → [B,T,S] at global u = starts[t]+s."""
    gidx = starts[:, :, None] + jnp.arange(s_range)[None, None, :]
    w = arr.shape[2]
    val = jnp.take_along_axis(arr, jnp.clip(gidx, 0, w - 1), axis=2)
    return jnp.where(gidx < w, val, fill)


def banded_oracle_nll(lp_blank, lp_label, starts, t_len, u_len, s_range):
    """Serial banded DP, float64. Arrays are DENSE [T, U+1]/[T, U];
    starts [T] are the per-row band starts; paths restricted to
    u ∈ [starts[t], starts[t]+S)."""
    lb = np.asarray(lp_blank, np.float64)
    ll = np.asarray(lp_label, np.float64)
    alpha = np.full((t_len, u_len + 1), -np.inf)

    def in_band(t, u):
        return starts[t] <= u < starts[t] + s_range

    if in_band(0, 0):
        alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            if not in_band(t, u):
                continue
            terms = []
            if t > 0 and in_band(t - 1, u):
                terms.append(alpha[t - 1, u] + lb[t - 1, u])
            if u > 0 and in_band(t, u - 1):
                terms.append(alpha[t, u - 1] + ll[t, u - 1])
            alpha[t, u] = np.logaddexp.reduce(terms) if terms else -np.inf
    if not in_band(t_len - 1, u_len):
        return 1e9
    return -(alpha[t_len - 1, u_len] + lb[t_len - 1, u_len])


def random_case(rng, b=3, t=9, u=5, v=6, blank=0):
    logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32) * 2.0
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_lens = rng.integers(u + 1, t + 1, (b,)).astype(np.int32)
    u_lens = rng.integers(1, u + 1, (b,)).astype(np.int32)
    return logits, labels, t_lens, u_lens, blank


# ---------------------------------------------------------------------------
# core recursion
# ---------------------------------------------------------------------------


def test_full_width_band_matches_dense():
    rng = np.random.default_rng(0)
    logits, labels, t_lens, u_lens, blank = random_case(rng)
    u = labels.shape[1]
    s = u + 1
    dense = np.asarray(rnnt_loss(logits, labels, t_lens, u_lens, blank))
    lp_blank, lp_label = dense_scores(logits, labels, u_lens, blank)
    starts = diagonal_band_starts(
        jnp.asarray(t_lens), jnp.asarray(u_lens), logits.shape[1], u, s
    )
    assert np.all(np.asarray(starts) == 0)  # S covers everything
    bb = gather_band(lp_blank, starts, s)
    ll = mask_band_label_scores(
        gather_band(lp_label, starts, s), starts, jnp.asarray(u_lens)
    )
    banded = np.asarray(
        rnnt_alpha_loss_banded(bb, ll, starts, jnp.asarray(t_lens), jnp.asarray(u_lens))
    )
    np.testing.assert_allclose(banded, dense, rtol=1e-6, atol=1e-6)


def test_banded_matches_banded_oracle_random_bands():
    """Arbitrary monotone bands: the vectorized banded scan equals the
    serial banded DP node for node."""
    rng = np.random.default_rng(1)
    logits, labels, t_lens, u_lens, blank = random_case(rng, b=4, t=10, u=6)
    t_max, u = logits.shape[1], labels.shape[1]
    s = 3
    lp_blank, lp_label = dense_scores(logits, labels, u_lens, blank)
    # random monotone starts: p[0]=0, increments in {0,1}, exit covered
    for trial in range(5):
        starts = np.zeros((4, t_max), np.int32)
        for b in range(4):
            tl, ul = int(t_lens[b]), int(u_lens[b])
            p = 0
            for t in range(1, t_max):
                p = min(p + rng.integers(0, 2), max(ul + 1 - s, 0))
                starts[b, t] = p
            # force exit coverage at the last valid frame
            lo = max(ul - s + 1, 0)
            starts[b, tl - 1 :] = max(starts[b, tl - 1], lo)
            starts[b] = np.maximum.accumulate(starts[b])
        st = jnp.asarray(starts)
        bb = gather_band(lp_blank, st, s)
        ll = mask_band_label_scores(
            gather_band(lp_label, st, s), st, jnp.asarray(u_lens)
        )
        got = np.asarray(
            rnnt_alpha_loss_banded(
                bb, ll, st, jnp.asarray(t_lens), jnp.asarray(u_lens)
            )
        )
        for b in range(4):
            want = banded_oracle_nll(
                np.asarray(lp_blank[b]),
                np.asarray(lp_label[b]),  # dense masked label scores
                starts[b],
                int(t_lens[b]),
                int(u_lens[b]),
                s,
            )
            np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_guided_band_recovers_peaky_lattice():
    """All mass on one nonuniform monotone path: the guided band finds it
    (loss ≈ dense) where the diagonal band of the same width does not."""
    rng = np.random.default_rng(2)
    b, t, u, v, blank = 2, 12, 6, 7, 0
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_lens = np.array([12, 10], np.int32)
    u_lens = np.array([6, 5], np.int32)
    peak = np.full((b, t, u + 1, v), -6.0, np.float32)
    # path: all labels emitted in a burst near the END of the utterance
    for i in range(b):
        tl, ul = int(t_lens[i]), int(u_lens[i])
        peak[i, :, :, blank] = 4.0
        for j in range(ul):
            ft = tl - ul + j  # late burst — far off the diagonal
            peak[i, ft, j, labels[i, j]] = 10.0
    dense = np.asarray(rnnt_loss(peak, labels, t_lens, u_lens, blank))
    lp_blank, lp_label = dense_scores(peak, labels, u_lens, blank)
    s = 3

    gst = guided_band_starts(
        lp_blank, lp_label, jnp.asarray(t_lens), jnp.asarray(u_lens), s
    )
    bb = gather_band(lp_blank, gst, s)
    ll = mask_band_label_scores(gather_band(lp_label, gst, s), gst, jnp.asarray(u_lens))
    guided = np.asarray(
        rnnt_alpha_loss_banded(bb, ll, gst, jnp.asarray(t_lens), jnp.asarray(u_lens))
    )
    np.testing.assert_allclose(guided, dense, rtol=1e-3, atol=1e-3)

    dst = diagonal_band_starts(
        jnp.asarray(t_lens), jnp.asarray(u_lens), t, u, s
    )
    bb_d = gather_band(lp_blank, dst, s)
    ll_d = mask_band_label_scores(gather_band(lp_label, dst, s), dst, jnp.asarray(u_lens))
    diag = np.asarray(
        rnnt_alpha_loss_banded(bb_d, ll_d, dst, jnp.asarray(t_lens), jnp.asarray(u_lens))
    )
    # the diagonal band misses the late burst → much worse likelihood
    assert np.all(diag > dense + 1.0)


def test_guided_band_strided_recovers_peaky_lattice():
    """proxy_stride > 1: the block-pooled stage 1 still finds a late-burst
    alignment (loss ≈ dense), where a diagonal band of the same width
    provably fails (test_guided_band_recovers_peaky_lattice)."""
    rng = np.random.default_rng(21)
    b, t, u, v, blank = 2, 24, 6, 7, 0
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_lens = np.array([24, 19], np.int32)
    u_lens = np.array([6, 5], np.int32)
    peak = np.full((b, t, u + 1, v), -6.0, np.float32)
    for i in range(b):
        tl, ul = int(t_lens[i]), int(u_lens[i])
        peak[i, :, :, blank] = 4.0
        for j in range(ul):
            peak[i, tl - ul + j, j, labels[i, j]] = 10.0
    dense = np.asarray(rnnt_loss(peak, labels, t_lens, u_lens, blank))
    lp_blank, lp_label = dense_scores(peak, labels, u_lens, blank)
    # Band-width floor under striding: block pooling blurs an alignment
    # step across the block, so a strided band tracks at most ~S−1 label
    # advances per k frames. This burst advances 1 label/frame — the
    # worst case — so k=4 needs S=4 where frame-rate placement needs 3.
    # Production settings (S=16, k=4) have 4× that margin.
    for stride, s in ((2, 3), (4, 4)):
        gst = guided_band_starts(
            lp_blank, lp_label, jnp.asarray(t_lens), jnp.asarray(u_lens), s,
            proxy_stride=stride,
        )
        bb = gather_band(lp_blank, gst, s)
        ll = mask_band_label_scores(
            gather_band(lp_label, gst, s), gst, jnp.asarray(u_lens)
        )
        got = np.asarray(
            rnnt_alpha_loss_banded(
                bb, ll, gst, jnp.asarray(t_lens), jnp.asarray(u_lens)
            )
        )
        np.testing.assert_allclose(got, dense, rtol=1e-3, atol=1e-3)


def test_guided_band_entry_guaranteed_adversarial_proxy():
    """p[0] = 0 is enforced by the entry envelope even when the proxy's
    occupancy argmax at early frames is large (label scores dwarfing
    blanks everywhere — every center lands at U_b)."""
    b, t, u = 2, 10, 6
    t_lens = jnp.asarray([10, 8], jnp.int32)
    u_lens = jnp.asarray([6, 5], jnp.int32)
    lp_blank = jnp.full((b, t, u + 1), -20.0)
    lp_label = jnp.full((b, t, u), 0.0)
    for stride in (1, 2):
        p = np.asarray(
            guided_band_starts(lp_blank, lp_label, t_lens, u_lens, 3,
                               proxy_stride=stride)
        )
        assert np.all(p[:, 0] == 0), (stride, p)
        assert np.all(np.diff(p, axis=1) >= 0)
        assert np.all(np.diff(p, axis=1) <= 2)  # jump ≤ S−1


def test_band_monotone_and_corners():
    """Both constructors (guided at stride 1 AND strided): p[0]=0,
    monotone, exit node always in band."""
    rng = np.random.default_rng(3)
    logits, labels, t_lens, u_lens, blank = random_case(rng, b=5, t=11, u=6)
    t_max, u = logits.shape[1], labels.shape[1]
    lp_blank, lp_label = dense_scores(logits, labels, u_lens, blank)
    for s in (2, 3, 7):
        for starts in (
            diagonal_band_starts(
                jnp.asarray(t_lens), jnp.asarray(u_lens), t_max, u, s
            ),
            guided_band_starts(
                lp_blank, lp_label, jnp.asarray(t_lens), jnp.asarray(u_lens), s
            ),
            guided_band_starts(
                lp_blank, lp_label, jnp.asarray(t_lens), jnp.asarray(u_lens),
                s, proxy_stride=4,
            ),
        ):
            p = np.asarray(starts)
            assert np.all(p[:, 0] == 0)
            assert np.all(np.diff(p, axis=1) >= 0)
            for b in range(p.shape[0]):
                tl, ul = int(t_lens[b]), int(u_lens[b])
                exit_s = ul - p[b, tl - 1]
                assert 0 <= exit_s < s, (s, b, ul, p[b, tl - 1])
                assert np.all(p[b] <= max(u + 1 - s, 0))


# ---------------------------------------------------------------------------
# model-level fused banded scores
# ---------------------------------------------------------------------------


def _tiny_model(prune_s, prune_band, u_for_chunk=4):
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig

    cfg = TransducerConfig(
        input_dim=8, num_labels=5, enc_layers=1, enc_units=16,
        pred_layers=1, pred_units=12, embed_dim=6, joint_units=10,
        joint_chunk_t=u_for_chunk,  # ragged final block for T=11
        prune_s=prune_s, prune_band=prune_band,
    )
    return Transducer(cfg)


@pytest.mark.parametrize("band", ["diagonal", "guided"])
def test_pruned_scores_full_width_match_dense_with_grads(band):
    """S = U+1 → the pruned model path reproduces the dense fused path:
    losses bit-close, every gradient leaf within f32 reduction noise."""
    from tfkaldi_tpu.ops.rnnt_loss import rnnt_alpha_loss_banded

    b, t, u = 3, 11, 4
    model = _tiny_model(prune_s=u + 1, prune_band=band)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    xl = jnp.asarray([11, 7, 6], jnp.int32)
    y = jnp.asarray(rng.integers(0, 5, (b, u)).astype(np.int32))
    yl = jnp.asarray([4, 2, 3], jnp.int32)

    def loss_dense(p):
        lpb, lpl, _ = model.lattice_scores(p, state, x, xl, y, yl, train=False)
        return rnnt_alpha_loss(lpb, mask_label_scores(lpl, yl), xl, yl)

    def loss_pruned(p):
        lpb, lpl, st, _ = model.lattice_scores_pruned(
            p, state, x, xl, y, yl, train=False
        )
        return rnnt_alpha_loss_banded(lpb, lpl, st, xl, yl)

    np.testing.assert_allclose(
        np.asarray(loss_pruned(params)), np.asarray(loss_dense(params)),
        rtol=1e-5, atol=1e-5,
    )
    g_d = jax.grad(lambda p: jnp.sum(loss_dense(p)))(params)
    g_p = jax.grad(lambda p: jnp.sum(loss_pruned(p)))(params)
    flat_p = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_flatten_with_path(g_p)[0]
    )
    for path, leaf in jax.tree_util.tree_flatten_with_path(g_d)[0]:
        np.testing.assert_allclose(
            np.asarray(flat_p[jax.tree_util.keystr(path)]),
            np.asarray(leaf),
            rtol=5e-5, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_pruned_scores_padding_invariance():
    """Pruned path ignores padding content in both T and U axes."""
    from tfkaldi_tpu.ops.rnnt_loss import rnnt_alpha_loss_banded

    model = _tiny_model(prune_s=3, prune_band="guided", u_for_chunk=3)
    params, state = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(12)
    b, t, u = 2, 7, 3
    x = rng.standard_normal((b, t, 8)).astype(np.float32)
    xl = jnp.asarray([7, 5], jnp.int32)
    y = rng.integers(0, 5, (b, u)).astype(np.int32)
    yl = jnp.asarray([3, 2], jnp.int32)

    def run(xa, ya):
        lpb, lpl, st, _ = model.lattice_scores_pruned(
            params, state, jnp.asarray(xa), xl, jnp.asarray(ya), yl, train=False
        )
        return np.asarray(rnnt_alpha_loss_banded(lpb, lpl, st, xl, yl))

    base = run(x, y)
    x_big = np.concatenate(
        [x, rng.standard_normal((b, 4, 8)).astype(np.float32) * 9], axis=1
    )
    y_big = np.concatenate([y, rng.integers(0, 5, (b, 2)).astype(np.int32)], axis=1)
    np.testing.assert_allclose(run(x_big, y_big), base, rtol=1e-5, atol=1e-5)


def test_trainer_pruned_branch_trains():
    """loss = rnnt with rnnt_prune_s > 0: the jitted step runs the banded
    path and the loss decreases on a learnable synthetic task."""
    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig
    from tfkaldi_tpu.train.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(7)
    b, t, u, f, nl = 8, 20, 5, 6, 4
    cfg = TransducerConfig(
        input_dim=f, num_labels=nl, enc_layers=1, enc_units=24,
        pred_layers=1, pred_units=16, embed_dim=8, joint_units=16,
        joint_chunk_t=8, prune_s=3, prune_band="guided",
    )
    model = Transducer(cfg)
    trainer = Trainer(
        model,
        TrainerConfig(
            init_learning_rate=5e-3, num_steps=60, loss_type="rnnt"
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(3))

    # learnable: label j's feature burst appears in order along time
    def make_batch():
        xs = rng.standard_normal((b, t, f)).astype(np.float32) * 0.1
        ys = rng.integers(0, nl, (b, u)).astype(np.int32)
        for i in range(b):
            for j in range(u):
                ft = int(j * t / u) + 1
                xs[i, ft, ys[i, j] % f] += 3.0
        return PaddedBatch(
            inputs=jnp.asarray(xs),
            input_lengths=jnp.full((b,), t, jnp.int32),
            targets=jnp.asarray(ys),
            target_lengths=jnp.full((b,), u, jnp.int32),
        )

    losses = []
    for _ in range(25):
        state, loss = trainer.update(state, make_batch())
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses


def test_trainer_pruned_trajectory_matches_dense():
    """Loss-trajectory equivalence: training with the banded loss tracks
    training with the dense loss on the same synthetic corpus.

    Two gates: (a) a full-width band (prune_s = U+1) reproduces the dense
    per-step losses to float tolerance — the trainer branch itself adds
    no drift; (b) a NARROW guided band (the production setting) produces
    parameters of the same quality. For (b) the comparison must be in
    DENSE loss space: the banded objective upper-bounds the dense NLL
    (it drops lattice paths), so comparing the two raw training losses
    conflates the bound gap with parameter quality. Instead the
    pruned-trained parameters are re-scored with the dense loss — the
    quantity both runs are actually trying to minimize."""
    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig
    from tfkaldi_tpu.train.trainer import Trainer, TrainerConfig

    b, t, u, f, nl = 8, 20, 5, 6, 4

    def make_batches(n):
        rng = np.random.default_rng(11)
        batches = []
        for _ in range(n):
            xs = rng.standard_normal((b, t, f)).astype(np.float32) * 0.1
            ys = rng.integers(0, nl, (b, u)).astype(np.int32)
            for i in range(b):
                for j in range(u):
                    ft = int(j * t / u) + 1
                    xs[i, ft, ys[i, j] % f] += 3.0
            batches.append(PaddedBatch(
                inputs=jnp.asarray(xs),
                input_lengths=jnp.full((b,), t, jnp.int32),
                targets=jnp.asarray(ys),
                target_lengths=jnp.full((b,), u, jnp.int32),
            ))
        return batches

    def make_trainer(prune_s, band):
        cfg = TransducerConfig(
            input_dim=f, num_labels=nl, enc_layers=1, enc_units=24,
            pred_layers=1, pred_units=16, embed_dim=8, joint_units=16,
            joint_chunk_t=8, prune_s=prune_s, prune_band=band,
        )
        return Trainer(
            Transducer(cfg),
            TrainerConfig(
                init_learning_rate=5e-3, num_steps=60, loss_type="rnnt"
            ),
        )

    def run(prune_s, band="guided", n_steps=20):
        trainer = make_trainer(prune_s, band)
        state = trainer.init_state(jax.random.PRNGKey(3))
        losses = []
        for batch in make_batches(n_steps):
            state, loss = trainer.update(state, batch)
            losses.append(float(loss))
        return np.asarray(losses), state

    dense_trainer = make_trainer(0, "guided")

    def dense_nll(state, batches):
        # per-sequence mean dense NLL of the given parameters (the band
        # does not change the parameter tree, so dense re-scoring is just
        # the dense trainer's loss on the same params)
        tot = 0.0
        for batch in batches:
            loss, _ = dense_trainer._loss_sum(
                state.params, state.model_state, batch, train=False, rng=None
            )
            tot += float(loss)
        return tot / (b * len(batches))

    eval_batches = make_batches(4)
    dense, dense_state = run(prune_s=0)
    # (a) full-width band == dense step for step
    full, _ = run(prune_s=u + 1, band="diagonal")
    np.testing.assert_allclose(full, dense, rtol=2e-3)
    # (b) narrow guided band: pruned-trained params score within 10% of
    # dense-trained params IN DENSE LOSS (both trajectories must have
    # actually descended for the comparison to mean anything)
    narrow_losses, narrow_state = run(prune_s=3)
    assert np.isfinite(narrow_losses).all()
    assert narrow_losses[-3:].mean() < narrow_losses[:3].mean() * 0.6
    d_ref = dense_nll(dense_state, eval_batches)
    d_pruned = dense_nll(narrow_state, eval_batches)
    rel = (d_pruned - d_ref) / abs(d_ref)
    assert rel < 0.10, (d_pruned, d_ref, rel)
