"""ARPA backoff LM + CTC shallow fusion (decode/lm.py, ctc_beam.py)."""

import math

import numpy as np
import pytest

from tfkaldi_tpu.decode.ctc_beam import ctc_beam_search_py
from tfkaldi_tpu.decode.lm import ArpaLM, FusionScorer

LN10 = math.log(10.0)

ARPA = """\
\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-0.5\ta\t-0.30103
-0.7\tb\t-0.30103
-1.0\t<s>\t-0.30103
-0.9\t<unk>

\\2-grams:
-0.2\ta b
-0.9\tb a
-0.3\t<s> a

\\end\\
"""


@pytest.fixture
def lm(tmp_path):
    path = tmp_path / "toy.arpa"
    path.write_text(ARPA)
    return ArpaLM.load(str(path))


def test_arpa_load_and_direct_hits(lm):
    assert lm.order == 2
    np.testing.assert_allclose(lm.score(("a",), "b"), -0.2 * LN10)
    np.testing.assert_allclose(lm.score(("<s>",), "a"), -0.3 * LN10)
    np.testing.assert_allclose(lm.score((), "a"), -0.5 * LN10)


def test_arpa_backoff_and_unk(lm):
    # (b, b) unseen: backoff(b) + P1(b)
    np.testing.assert_allclose(
        lm.score(("b",), "b"), (-0.30103 - 0.7) * LN10
    )
    # unlisted context backs off with zero penalty
    np.testing.assert_allclose(lm.score(("zzz",), "a"), -0.5 * LN10)
    # unknown word -> <unk> mass
    np.testing.assert_allclose(lm.score((), "zzz"), -0.9 * LN10)
    # long contexts are truncated to order-1
    np.testing.assert_allclose(lm.score(("x", "y", "a"), "b"), -0.2 * LN10)


def test_arpa_gz_roundtrip(tmp_path):
    import gzip

    path = tmp_path / "toy.arpa.gz"
    with gzip.open(path, "wt") as f:
        f.write(ARPA)
    lm = ArpaLM.load(str(path))
    np.testing.assert_allclose(lm.score(("a",), "b"), -0.2 * LN10)


def test_arpa_rejects_garbage(tmp_path):
    p = tmp_path / "bad.arpa"
    p.write_text("\\1-grams:\n-0.5\n\\end\\\n")
    with pytest.raises(ValueError, match="malformed"):
        ArpaLM.load(str(p))
    p2 = tmp_path / "empty.arpa"
    p2.write_text("hello\n")
    with pytest.raises(ValueError, match="no n-gram"):
        ArpaLM.load(str(p2))


def test_fusion_scorer_arithmetic(lm):
    sc = FusionScorer(lm, ["a", "b"], alpha=2.0, beta=0.25)
    # empty prefix: context = (<s>,) -> the listed (<s>, a) bigram
    np.testing.assert_allclose(sc((), 0), 2.0 * (-0.3 * LN10) + 0.25)
    # prefix (a,): (a, b) bigram
    np.testing.assert_allclose(sc((0,), 1), 2.0 * (-0.2 * LN10) + 0.25)
    # cache returns identical values
    np.testing.assert_allclose(sc((0,), 1), sc((0,), 1))
    # bos=None drops the sentence-start context
    sc2 = FusionScorer(lm, ["a", "b"], alpha=1.0, beta=0.0, bos=None)
    np.testing.assert_allclose(sc2((), 0), -0.5 * LN10)


def _ambiguous_logprobs(t=4, v=3):
    """Blank-dominated acoustics that mildly prefer label 0 over 1, so
    the best path is a single emission."""
    lp = np.full((t, v), -10.0)
    lp[:, 2] = -0.7  # blank mass
    lp[:, 0] = -1.2
    lp[:, 1] = -1.4
    return lp - np.log(np.exp(lp).sum(axis=1, keepdims=True))


def test_fusion_changes_beam_outcome(tmp_path):
    """Acoustics alone pick label 'a'; a strongly 'b'-favoring LM flips
    the fused search to 'b'."""
    arpa = """\
\\data\\
ngram 1=3

\\1-grams:
-3.0\ta
-0.05\tb
-2.0\t<s>

\\end\\
"""
    path = tmp_path / "uni.arpa"
    path.write_text(arpa)
    lm = ArpaLM.load(str(path))
    lp = _ambiguous_logprobs()
    blank = 2
    plain = ctc_beam_search_py(lp, blank, beam_width=4)
    assert plain.tolist() == [0]
    fused = ctc_beam_search_py(
        lp, blank, beam_width=4,
        scorer=FusionScorer(lm, ["a", "b", "<blank>"], alpha=1.0),
    )
    assert fused.tolist() == [1]


def test_streaming_fused_beam_equals_offline(tmp_path, lm):
    """OnlineCTCBeamDecoder with a fusion scorer == offline fused search,
    at any chunking."""
    import jax

    from tfkaldi_tpu.decode.online import OnlineCTCBeamDecoder
    from tfkaldi_tpu.models import GRU, RNNConfig

    model = GRU(RNNConfig(input_dim=4, num_labels=3, num_layers=1,
                          hidden_units=8, bidirectional=False, scan_unroll=1))
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.6
    )
    rng = np.random.default_rng(1)
    b, total = 2, 20
    lengths = np.asarray([20, 11], np.int32)
    x = rng.standard_normal((b, total, 4)).astype(np.float32)

    import jax.numpy as jnp

    logits, _ = model.apply(params, state, jnp.asarray(x),
                            jnp.asarray(lengths), train=False)
    log_probs = np.asarray(
        jax.nn.log_softmax(jnp.asarray(logits).astype(jnp.float32), axis=-1)
    ).astype(np.float64)

    def make_scorer():
        return FusionScorer(lm, ["a", "b", "<blank>"], alpha=0.8, beta=0.1)

    offline = [
        ctc_beam_search_py(log_probs[r, : int(n)], 2, 4, scorer=make_scorer())
        for r, n in enumerate(lengths)
    ]

    for chunk in (1, 7, 32):
        dec = OnlineCTCBeamDecoder(model, params, state, 2, beam_width=4,
                                   fusion_scorer=make_scorer())
        dec.reset(b)
        for pos in range(0, total, chunk):
            ck = x[:, pos : pos + chunk]
            cl = np.clip(lengths - pos, 0, ck.shape[1]).astype(np.int32)
            dec.step(ck, cl)
        for row, got in enumerate(dec.best()):
            np.testing.assert_array_equal(got, offline[row])


def test_ctc_decoder_fusion_uses_python_beam(tmp_path, lm, monkeypatch):
    """With a fusion scorer the decoder must not route through the native
    acoustic-only beam."""
    import jax

    from tfkaldi_tpu.decode import CTCDecoder
    from tfkaldi_tpu.decode import native_beam
    from tfkaldi_tpu.models import GRU, RNNConfig

    model = GRU(RNNConfig(input_dim=4, num_labels=3, num_layers=1,
                          hidden_units=8, bidirectional=False, scan_unroll=1))
    params, state = model.init(jax.random.PRNGKey(0))

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("native beam must not run under fusion")

    monkeypatch.setattr(native_beam, "available", lambda: True)
    monkeypatch.setattr(native_beam, "ctc_beam_search_batch_native", boom)

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    dec = CTCDecoder(
        model, params, state, _IdCoder(), 2, beam_width=4,
        fusion_scorer=FusionScorer(lm, ["a", "b", "<blank>"], alpha=0.5),
    )
    x = np.random.default_rng(0).standard_normal((1, 8, 4)).astype(np.float32)
    out = dec.decode_batch(x, np.asarray([8], np.int32))
    assert isinstance(out[0], np.ndarray)


# ---------------------------------------------------------------------------
# dense fusion table (jitted-beam shallow fusion)
# ---------------------------------------------------------------------------

TRIGRAM_ARPA = """\
\\data\\
ngram 1=4
ngram 2=4
ngram 3=2

\\1-grams:
-0.5\ta\t-0.30103
-0.7\tb\t-0.2
-1.0\t<s>\t-0.30103
-0.9\t<unk>

\\2-grams:
-0.2\ta b\t-0.1
-0.9\tb a\t-0.15
-0.3\t<s> a\t-0.1
-0.6\t<s> b

\\3-grams:
-0.25\t<s> a b
-0.45\ta b a

\\end\\
"""


@pytest.fixture
def lm3(tmp_path):
    path = tmp_path / "tri.arpa"
    path.write_text(TRIGRAM_ARPA)
    return ArpaLM.load(str(path))


@pytest.mark.parametrize("which", ["bigram", "trigram"])
def test_dense_table_matches_fusion_scorer(which, lm, lm3):
    """DenseFusionTable[ctx, v] must equal the host FusionScorer for every
    prefix — short prefixes (BOS-filled context) included."""
    from itertools import product

    from tfkaldi_tpu.decode.lm import DenseFusionTable

    the_lm = lm if which == "bigram" else lm3
    tokens = ["a", "b"]
    alpha, beta = 0.4, 0.15
    scorer = FusionScorer(the_lm, tokens, alpha=alpha, beta=beta)
    table = DenseFusionTable(the_lm, tokens, tokens, alpha=alpha, beta=beta)
    n_ctx = the_lm.order - 1
    for plen in range(4):
        for prefix in product(range(2), repeat=plen):
            last = [table.bos_id] * max(n_ctx - plen, 0) + list(
                prefix[-n_ctx:] if n_ctx else []
            )
            row = int(table.flat_context(np.asarray(last)[None, :])[0]) \
                if n_ctx else 0
            for v in range(2):
                want = scorer(tuple(prefix), v)
                got = float(table.table[row, v])
                np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                           err_msg=f"{prefix} -> {v}")


def test_lm_extension_scores_device_gather(lm3):
    """The jit-side gather (buf, counts) → per-column LM terms equals the
    host table lookup."""
    import jax.numpy as jnp

    from tfkaldi_tpu.decode.lm import DenseFusionTable, lm_extension_scores

    tokens = ["a", "b"]
    table = DenseFusionTable(lm3, tokens, tokens, alpha=1.0, beta=0.0)
    table_dev = jnp.asarray(table.table)
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 2, (3, 2, 6)).astype(np.int32)
    counts = np.asarray([[0, 1], [2, 6], [3, 5]], np.int32)
    got = np.asarray(
        lm_extension_scores(table, table_dev, jnp.asarray(buf),
                            jnp.asarray(counts))
    )
    for bi in range(3):
        for ki in range(2):
            c = int(counts[bi, ki])
            last = []
            for back in (2, 1):
                last.append(int(buf[bi, ki, c - back]) if c - back >= 0
                            else table.bos_id)
            row = int(table.flat_context(np.asarray(last)[None, :])[0])
            np.testing.assert_allclose(got[bi, ki], table.table[row],
                                       rtol=1e-6)


def test_dense_table_rejects_explosive_orders(lm):
    from tfkaldi_tpu.decode.lm import DenseFusionTable

    big = ArpaLM(order=8, ngrams={("a",): -1.0}, backoffs={})
    with pytest.raises(ValueError, match="dense fusion table"):
        DenseFusionTable(big, [str(i) for i in range(40)],
                         [str(i) for i in range(40)])
