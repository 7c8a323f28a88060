"""Fused streaming front-end: one device dispatch per push, bit-exact.

``FusedOnlineFeatureExtractor`` keeps the sample buffers on device and
fuses preemphasis + framing + feature tail + CMVN into one jitted call
(docs/PERF_STREAMING.md named this as the dominant-latency lever: the
unfused front-end's ~3 per-push synchronizations are ~60% of the
conformer chunk path). Contracts under test:

- bit-identical feature streams to ``OnlineFeatureExtractor`` (and to
  the offline batch extractor in "high" precision), at any chunking,
  with and without CMVN, snip_edges True/False;
- per-slot lifecycle (flush_rows / reset_rows) matches the unfused twin;
- the whole transcriber push path makes exactly TWO device dispatches
  (fused front-end + decoder step) — the docs' target from ~4.
"""

import jax
import numpy as np
import pytest

from tfkaldi_tpu.decode import StreamingTranscriber
from tfkaldi_tpu.frontend.cmvn import cmvn_stats
from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
from tfkaldi_tpu.frontend.online import (
    FusedOnlineFeatureExtractor,
    OnlineFeatureExtractor,
)
from tfkaldi_tpu.models import GRU, RNNConfig

RATE = 8000
BLANK = 7


class _IdCoder:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def _extractor(snip=True, precision="high"):
    return FeatureExtractor(
        FeatureOpts(
            feature_type="fbank", dynamic="nodelta", nfilt=10, nfft=256,
            snip_edges=snip,
        ),
        RATE,
        spectrum_precision=precision,
    )


def _gru():
    model = GRU(
        RNNConfig(input_dim=10, num_labels=8, num_layers=1, hidden_units=16,
                  bidirectional=False, scan_unroll=1)
    )
    params, state = model.init(jax.random.PRNGKey(0))
    params["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["out"]["w"].shape) * 0.5
    )
    return model, params, state


def _drain(ext_obj, audio, lens, chunk, cmvn=None):
    """Stream a [B, S] batch through an online extractor; returns the
    per-row concatenated valid frames (CMVN applied host-side when the
    extractor does not fuse it)."""
    b = audio.shape[0]
    ext_obj.reset(b)
    if cmvn is not None and hasattr(ext_obj, "fuse_cmvn"):
        ext_obj.fuse_cmvn(cmvn)
        cmvn = None
    rows = [[] for _ in range(b)]

    def collect(feats, counts):
        feats = np.asarray(feats)
        if cmvn is not None:
            from tfkaldi_tpu.frontend.cmvn import apply_cmvn

            feats = np.asarray(apply_cmvn(feats, cmvn))
        for r in range(b):
            rows[r].append(feats[r, : int(counts[r])])

    for pos in range(0, audio.shape[1], chunk):
        ln = np.clip(lens - pos, 0, chunk)
        collect(*ext_obj.step(audio[:, pos : pos + chunk], ln))
    collect(*ext_obj.flush())
    return [np.concatenate(r, axis=0) for r in rows]


@pytest.mark.parametrize("snip", [True, False])
@pytest.mark.parametrize("with_cmvn", [False, True])
def test_fused_frontend_bit_identical(snip, with_cmvn):
    """Fused output == unfused output == offline batch output (high
    precision), bit for bit, at two chunkings."""
    ext = _extractor(snip=snip)
    rng = np.random.default_rng(3)
    audio = rng.standard_normal((2, 7000)).astype(np.float32)
    lens = np.asarray([7000, 5200])
    cmvn = None
    if with_cmvn:
        off, off_n = map(np.asarray, ext(audio, lens))
        cmvn = cmvn_stats(off, off_n)

    off_feats, off_n = map(np.asarray, ext(audio, lens))
    for chunk in (1000, 333):
        un = _drain(OnlineFeatureExtractor(ext), audio, lens, chunk, cmvn)
        fu = _drain(FusedOnlineFeatureExtractor(ext), audio, lens, chunk, cmvn)
        for r in range(2):
            assert un[r].shape == fu[r].shape == (off_n[r], 10)
            if with_cmvn:
                # the normalize math itself fuses differently inside the
                # single program (e.g. div -> mul-by-reciprocal), so the
                # fused CMVN is equal to <= 2 f32 ulps, not bitwise
                np.testing.assert_allclose(fu[r], un[r], rtol=0, atol=1e-6)
            else:
                np.testing.assert_array_equal(fu[r], un[r])
                np.testing.assert_array_equal(fu[r], off_feats[r, : off_n[r]])


def test_fused_frontend_per_slot_lifecycle():
    """flush_rows finishes one row's frames (equal to the unfused twin);
    reset_rows re-arms it; the other row streams on undisturbed."""
    ext = _extractor()
    rng = np.random.default_rng(11)
    audio = rng.standard_normal((2, 6000)).astype(np.float32)
    lens = np.asarray([3000, 6000])

    def run(ext_obj):
        ext_obj.reset(2)
        rows = [[] for _ in range(2)]

        def collect(feats, counts):
            feats = np.asarray(feats)
            for r in range(2):
                rows[r].append(feats[r, : int(counts[r])])

        for pos in range(0, 6000, 1000):
            ln = np.clip(lens - pos, 0, 1000)
            collect(*ext_obj.step(audio[:, pos : pos + 1000], ln))
            if pos + 1000 == 3000:
                collect(*ext_obj.flush_rows([0]))
                ext_obj.reset_rows([0])
        collect(*ext_obj.flush_rows([1]))
        return [np.concatenate(r, axis=0) for r in rows]

    un = run(OnlineFeatureExtractor(ext))
    fu = run(FusedOnlineFeatureExtractor(ext))
    for r in range(2):
        np.testing.assert_array_equal(fu[r], un[r])


def test_transcriber_push_is_two_dispatches_and_identical():
    """The whole streaming path on the fused front-end: per push exactly
    1 front-end dispatch + 1 decoder dispatch (docs target <= 2, from
    ~4), and transcripts + timestamps + confidences equal the unfused
    transcriber's, greedy and beam."""
    model, params, state = _gru()
    ext = _extractor()
    rng = np.random.default_rng(5)
    audio = rng.standard_normal(7000).astype(np.float32)
    full = np.concatenate([audio[None, :]] * 1, axis=0)
    cmvn = cmvn_stats(*map(np.asarray, ext(full, np.asarray([7000]))))

    def run(online_ext, beam_width):
        tx = StreamingTranscriber(
            online_ext, model, params, state, _IdCoder(), BLANK,
            cmvn=cmvn, beam_width=beam_width,
        )
        dec_calls = [0]
        orig = tx._dec._fn

        def counted(*a, **k):
            dec_calls[0] += 1
            return orig(*a, **k)

        tx._dec._fn = counted
        tx.reset(1)
        pushes = 0
        for pos in range(0, len(audio), 1000):
            c = audio[pos : pos + 1000][None, :]
            tx.push(c, np.asarray([c.shape[1]]))
            pushes += 1
        final = tx.finish()[0]
        return tx, final, pushes, dec_calls[0]

    for beam_width in (1, 4):
        fused_ext = FusedOnlineFeatureExtractor(ext)
        tx_f, final_f, pushes, dec_calls = run(fused_ext, beam_width)
        tx_u, final_u, _, _ = run(OnlineFeatureExtractor(ext), beam_width)
        assert final_f == final_u
        np.testing.assert_array_equal(tx_f.timestamps()[0], tx_u.timestamps()[0])
        # the fused CMVN's ~2-ulp rounding propagates into the softmax
        np.testing.assert_allclose(
            tx_f.confidences()[0], tx_u.confidences()[0], rtol=1e-5
        )
        # front-end: at most one dispatch per push/flush; decoder likewise
        # -> whole path <= 2 dispatches per push
        assert fused_ext.dispatch_count <= pushes + 1
        assert dec_calls <= pushes + 1


def test_transducer_transcriber_on_fused_frontend():
    """The transducer transcriber rides the fused front-end too (greedy
    and beam): finals and timestamps equal the unfused twin."""
    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig

    cfg = TransducerConfig(
        input_dim=10, num_labels=4, enc_layers=1, enc_units=16,
        pred_layers=1, pred_units=12, embed_dim=6, joint_units=12,
        scan_unroll=1,
    )
    model = Transducer(cfg)
    params, state = model.init(jax.random.PRNGKey(21))
    ext = _extractor()
    rng = np.random.default_rng(31)
    audio = (rng.standard_normal(6000) * 100).astype(np.float32)

    def run(online_ext, beam_width):
        tx = StreamingTransducerTranscriber(
            online_ext, model, params, state, _IdCoder(),
            beam_width=beam_width,
        )
        tx.reset(1)
        for pos in range(0, len(audio), 1000):
            c = audio[pos : pos + 1000][None, :]
            tx.push(c, np.asarray([c.shape[1]]))
        final = tx.finish()[0]
        return tx, final

    for beam_width in (1, 4):
        tx_f, final_f = run(FusedOnlineFeatureExtractor(ext), beam_width)
        tx_u, final_u = run(OnlineFeatureExtractor(ext), beam_width)
        assert final_f == final_u
        np.testing.assert_array_equal(tx_f.timestamps()[0], tx_u.timestamps()[0])
