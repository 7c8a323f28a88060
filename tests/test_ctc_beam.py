"""CTC prefix beam search vs exhaustive path enumeration."""

import itertools

import numpy as np
import pytest

from tfkaldi_tpu.decode.ctc import collapse_ctc_path
from tfkaldi_tpu.decode.ctc_beam import ctc_beam_search_py


def exact_ctc_argmax(log_probs: np.ndarray, blank_id: int) -> tuple:
    """Brute-force marginal over all V^T paths."""
    t_len, v = log_probs.shape
    totals: dict[tuple, float] = {}
    for path in itertools.product(range(v), repeat=t_len):
        lp = float(sum(log_probs[t, s] for t, s in enumerate(path)))
        key = tuple(collapse_ctc_path(np.asarray(path), blank_id).tolist())
        totals[key] = np.logaddexp(totals.get(key, -np.inf), lp)
    return max(totals.items(), key=lambda kv: kv[1])[0]


@pytest.mark.parametrize("seed", range(8))
def test_beam_matches_exact_on_tiny_problems(seed):
    rng = np.random.default_rng(seed)
    t_len, v = 6, 3  # 729 paths
    logits = rng.standard_normal((t_len, v)) * 2
    log_probs = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    want = exact_ctc_argmax(log_probs, blank_id=0)
    got = tuple(ctc_beam_search_py(log_probs, blank_id=0, beam_width=64).tolist())
    assert got == want


def test_beam_prefers_marginal_over_best_path():
    """The canonical case where best-path (greedy) is wrong: two weaker
    paths that collapse to the same sequence outweigh the single best
    path."""
    # V = [a, blank]; frame probs chosen so greedy picks [blank, blank]
    # but P(a) = P(a,a)+P(a,-)+P(-,a) wins the marginal.
    p = np.array([[0.4, 0.6], [0.4, 0.6]])
    log_probs = np.log(p)
    greedy = collapse_ctc_path(np.argmax(log_probs, 1), blank_id=1)
    assert greedy.size == 0  # greedy says empty
    beam = ctc_beam_search_py(log_probs, blank_id=1, beam_width=8)
    # P(empty) = .36; P([a]) = .16+.24+.24 = .64
    assert beam.tolist() == [0]


def test_native_matches_python():
    from tfkaldi_tpu.decode import native_beam

    if not native_beam.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(42)
    for trial in range(6):
        t_len, v = int(rng.integers(4, 40)), int(rng.integers(3, 37))
        logits = rng.standard_normal((t_len, v)) * 2
        log_probs = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(
            np.float32
        )
        blank = int(rng.integers(0, v))
        want = ctc_beam_search_py(log_probs, blank, beam_width=16).tolist()
        got = native_beam.ctc_beam_search_native(log_probs, blank, beam_width=16).tolist()
        assert got == want, (trial, t_len, v, blank)


def test_native_batch_matches_single():
    from tfkaldi_tpu.decode import native_beam

    if not native_beam.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    b, t_max, v = 5, 30, 12
    logits = rng.standard_normal((b, t_max, v)).astype(np.float32) * 2
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = rng.integers(5, t_max + 1, b).astype(np.int32)
    batch = native_beam.ctc_beam_search_batch_native(log_probs, lengths, 0, 8)
    for i in range(b):
        single = native_beam.ctc_beam_search_native(
            log_probs[i, : lengths[i]], 0, 8
        )
        np.testing.assert_array_equal(batch[i], single)


def test_decoder_beam_path(tmp_path):
    """CTCDecoder with beam_width>1 produces transcriptions end to end."""
    import jax

    from tfkaldi_tpu.data import TextCoder
    from tfkaldi_tpu.data.target_normalizers import aurora4_normalizer
    from tfkaldi_tpu.decode.ctc import CTCDecoder
    from tfkaldi_tpu.models import DNN, DNNConfig

    coder = TextCoder(aurora4_normalizer)
    v = coder.num_labels + 1
    model = DNN(DNNConfig(input_dim=8, num_labels=v, num_hidden_layers=1, num_hidden_units=16))
    params, state = model.init(jax.random.PRNGKey(0))
    dec = CTCDecoder(model, params, state, coder, blank_id=v - 1, beam_width=8)
    rng = np.random.default_rng(0)
    out = dec.decode_batch(
        rng.standard_normal((3, 20, 8)).astype(np.float32), np.array([20, 15, 9])
    )
    assert len(out) == 3
    for ids in out:
        assert all(0 <= i < coder.num_labels for i in ids)
