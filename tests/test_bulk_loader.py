"""Bulk native batch source vs the Python dispenser path."""

import numpy as np
import pytest

from tests.synthetic import make_featdir
from tfkaldi_tpu.io import native, read_alignments
from tfkaldi_tpu.data import (
    AlignmentBatchDispenser,
    AlignmentCoder,
    DeviceBatcher,
    FeatureReader,
    identity_normalizer,
)
from tfkaldi_tpu.data.bulk_loader import BulkAlignmentBatchSource

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def _both(tmp_path, batch=4, context=2, bucket=16):
    featdir, alifile, info = make_featdir(tmp_path, num_speakers=2, utts_per_speaker=6)
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", context, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, batch, alifile)
    batcher = DeviceBatcher(bucket_multiple=bucket)

    bulk = BulkAlignmentBatchSource(
        f"{featdir}/feats.scp",
        f"{featdir}/cmvn.scp",
        f"{featdir}/utt2spk",
        context,
        read_alignments(alifile),
        batch,
        bucket_multiple=bucket,
    )
    return disp, batcher, bulk


def test_bulk_matches_python_dispenser(tmp_path):
    """Byte-identical batches: the native CMVN+splice performs the exact
    same f32 operations in the same order as the numpy path (divide by
    sqrt(var), no reciprocal), so no tolerance is needed."""
    disp, batcher, bulk = _both(tmp_path)
    for _ in range(3):
        py_batch = batcher(*disp.get_batch())
        nat_batch = bulk.get_batch()
        np.testing.assert_array_equal(py_batch.input_lengths, nat_batch.input_lengths)
        np.testing.assert_array_equal(py_batch.targets, nat_batch.targets)
        assert py_batch.inputs.shape == nat_batch.inputs.shape
        np.testing.assert_array_equal(py_batch.inputs, nat_batch.inputs)


def test_bulk_cursor_stream_matches_python(tmp_path):
    """Interleaved skip/return/split cursor ops drive both sources through
    the same batch stream (the controller's resume fast-forward and
    validation rewind rely on this exactly)."""
    disp, batcher, bulk = _both(tmp_path)
    ops = [
        "get", "get", "split", "get", "skip", "get", "return", "return",
        "get", "get", "get", "get",  # wraps around
    ]
    for op in ops:
        if op == "get":
            py_batch = batcher(*disp.get_batch())
            nat_batch = bulk.get_batch()
            np.testing.assert_array_equal(py_batch.inputs, nat_batch.inputs)
            np.testing.assert_array_equal(py_batch.targets, nat_batch.targets)
        elif op == "skip":
            disp.skip_batch()
            bulk.skip_batch()
        elif op == "return":
            disp.return_batch()
            bulk.return_batch()
        elif op == "split":
            disp.split()
            bulk.split()
            assert disp.num_utt == bulk.num_utt


def test_bulk_get_padded_batch_honors_batcher(tmp_path):
    """The uniform protocol entry must honor the DeviceBatcher's padding
    policy, including the multi-host fixed corpus-max padding."""
    disp, _, bulk = _both(tmp_path)
    fixed = DeviceBatcher(fixed_input_length=64, fixed_target_length=64)
    py_batch = disp.get_padded_batch(fixed)
    nat_batch = bulk.get_padded_batch(fixed)
    assert nat_batch.inputs.shape[1] == 64
    np.testing.assert_array_equal(py_batch.inputs, nat_batch.inputs)
    np.testing.assert_array_equal(py_batch.targets, nat_batch.targets)


def test_bulk_controller_losses_bit_identical(tmp_path):
    """Full-controller equivalence: training through the native bulk source
    produces bit-identical losses and final params vs the Python dispenser
    path, including a validation rollback (return_batch) firing."""
    import jax

    from tfkaldi_tpu.models import DNN, DNNConfig
    from tfkaldi_tpu.train import (
        NnetTrainOptions,
        Trainer,
        TrainerConfig,
        TrainingController,
    )

    results = {}
    for kind in ("python", "native"):
        base = tmp_path / kind
        base.mkdir()
        featdir, alifile, info = make_featdir(
            base, num_speakers=2, utts_per_speaker=8, feat_dim=6, num_labels=5
        )
        if kind == "python":
            reader = FeatureReader(
                f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
            )
            coder = AlignmentCoder(identity_normalizer, info["num_labels"])
            source = AlignmentBatchDispenser(reader, coder, 4, alifile)
        else:
            source = BulkAlignmentBatchSource(
                f"{featdir}/feats.scp",
                f"{featdir}/cmvn.scp",
                f"{featdir}/utt2spk",
                1,
                read_alignments(alifile),
                4,
                num_labels=info["num_labels"],
                max_input_length=60,
            )
        model = DNN(
            DNNConfig(
                input_dim=6 * 3, num_labels=info["num_labels"],
                num_hidden_layers=2, num_hidden_units=8,
            )
        )
        num_steps = int(source.num_batches * 2)
        # lr high enough that a validation regression (and thus a rollback
        # through source.return_batch) reliably fires
        trainer = Trainer(
            model,
            TrainerConfig(init_learning_rate=20.0, num_steps=num_steps, micro_batches=2),
        )
        opts = NnetTrainOptions(
            savedir=str(base / "save"),
            num_epochs=2, batch_size=4, valid_batches=1, valid_frequency=2,
            valid_adapt=True, valid_retries=1, check_freq=2,
        )
        losses = []
        controller = TrainingController(
            trainer, source, DeviceBatcher(bucket_multiple=16), opts,
            metrics_hook=lambda loss, **kw: losses.append(loss),
        )
        state = controller.train()
        results[kind] = (losses, state)

    py_losses, py_state = results["python"]
    nat_losses, nat_state = results["native"]
    assert py_losses == nat_losses  # bit-identical loss trajectory
    assert len(py_losses) > 2
    for a, b in zip(jax.tree.leaves(py_state.params), jax.tree.leaves(nat_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _both_text(tmp_path, batch=4, context=0, bucket=16):
    """Text-target twin of _both: featdir + Kaldi `text` transcriptions,
    TextBatchDispenser vs BulkTextBatchSource."""
    import os

    from tfkaldi_tpu.data import TextBatchDispenser, TextCoder
    from tfkaldi_tpu.data.target_normalizers import aurora4_normalizer
    from tfkaldi_tpu.data.bulk_loader import BulkTextBatchSource

    featdir, _, info = make_featdir(tmp_path, num_speakers=2, utts_per_speaker=6)
    words = ["HELLO WORLD", "SPEECH", "ON TPU", "A B C", "KALDI", "ARK IO"]
    textfile = os.path.join(featdir, "text")
    with open(textfile, "w") as f:
        for i, utt in enumerate(info["utts"]):
            f.write(f"{utt} {words[i % len(words)]}\n")

    coder = TextCoder(aurora4_normalizer)
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk",
        context, 60,
    )
    disp = TextBatchDispenser(reader, coder, batch, textfile)
    batcher = DeviceBatcher(bucket_multiple=bucket)
    bulk = BulkTextBatchSource(
        f"{featdir}/feats.scp",
        f"{featdir}/cmvn.scp",
        f"{featdir}/utt2spk",
        context,
        coder,
        textfile,
        batch,
        bucket_multiple=bucket,
    )
    return disp, batcher, bulk


def test_bulk_text_matches_python_dispenser(tmp_path):
    """Byte-identical text-target batches (features AND encoded targets AND
    both length vectors) vs TextBatchDispenser + DeviceBatcher."""
    disp, batcher, bulk = _both_text(tmp_path)
    assert disp.max_target_length == bulk.max_target_length
    np.testing.assert_array_equal(
        disp.compute_target_count(), bulk.compute_target_count()
    )
    for _ in range(4):  # wraps around the 12-utt corpus
        py_batch = batcher(*disp.get_batch())
        nat_batch = bulk.get_batch()
        np.testing.assert_array_equal(py_batch.input_lengths, nat_batch.input_lengths)
        np.testing.assert_array_equal(py_batch.target_lengths, nat_batch.target_lengths)
        assert py_batch.targets.shape == nat_batch.targets.shape
        np.testing.assert_array_equal(py_batch.targets, nat_batch.targets)
        assert py_batch.inputs.shape == nat_batch.inputs.shape
        np.testing.assert_array_equal(py_batch.inputs, nat_batch.inputs)


def test_bulk_text_cursor_stream_matches_python(tmp_path):
    """skip/return/split cursor equivalence for the text source (resume
    fast-forward + validation rewind on the CTC/RNN-T/attention path)."""
    disp, batcher, bulk = _both_text(tmp_path)
    ops = [
        "get", "get", "split", "get", "skip", "get", "return", "return",
        "get", "get", "get", "get",
    ]
    for op in ops:
        if op == "get":
            py_batch = batcher(*disp.get_batch())
            nat_batch = bulk.get_batch()
            np.testing.assert_array_equal(py_batch.inputs, nat_batch.inputs)
            np.testing.assert_array_equal(py_batch.targets, nat_batch.targets)
        elif op == "skip":
            disp.skip_batch()
            bulk.skip_batch()
        elif op == "return":
            disp.return_batch()
            bulk.return_batch()
        elif op == "split":
            disp.split()
            bulk.split()
            assert disp.num_utt == bulk.num_utt


def test_bulk_text_spliced_context(tmp_path):
    """Context splicing (context_width > 0) with text targets: the
    too-short predicate and spliced features must match the Python path."""
    disp, batcher, bulk = _both_text(tmp_path, context=2)
    for _ in range(3):
        py_batch = batcher(*disp.get_batch())
        nat_batch = bulk.get_batch()
        np.testing.assert_array_equal(py_batch.inputs, nat_batch.inputs)
        np.testing.assert_array_equal(py_batch.targets, nat_batch.targets)


def test_bulk_text_get_padded_batch_honors_batcher(tmp_path):
    disp, _, bulk = _both_text(tmp_path)
    fixed = DeviceBatcher(fixed_input_length=64, fixed_target_length=32)
    py_batch = disp.get_padded_batch(fixed)
    nat_batch = bulk.get_padded_batch(fixed)
    assert nat_batch.inputs.shape[1] == 64
    assert nat_batch.targets.shape[1] == 32
    np.testing.assert_array_equal(py_batch.inputs, nat_batch.inputs)
    np.testing.assert_array_equal(py_batch.targets, nat_batch.targets)


def test_bulk_text_controller_ctc_losses_bit_identical(tmp_path):
    """Full-controller CTC equivalence: training through the native text
    source produces bit-identical losses and final params vs the Python
    dispenser path (the production conformer-CTC input seam)."""
    import os

    import jax

    from tfkaldi_tpu.data import TextBatchDispenser, TextCoder
    from tfkaldi_tpu.data.target_normalizers import aurora4_normalizer
    from tfkaldi_tpu.data.bulk_loader import BulkTextBatchSource
    from tfkaldi_tpu.models import LSTM, RNNConfig
    from tfkaldi_tpu.train import (
        NnetTrainOptions,
        Trainer,
        TrainerConfig,
        TrainingController,
    )

    words = ["HELLO WORLD", "SPEECH", "ON TPU", "A B C"]
    results = {}
    for kind in ("python", "native"):
        base = tmp_path / kind
        base.mkdir()
        featdir, _, info = make_featdir(base, num_speakers=2, utts_per_speaker=8)
        textfile = os.path.join(featdir, "text")
        with open(textfile, "w") as f:
            for i, utt in enumerate(info["utts"]):
                f.write(f"{utt} {words[i % len(words)]}\n")
        coder = TextCoder(aurora4_normalizer)
        if kind == "python":
            reader = FeatureReader(
                f"{featdir}/feats.scp", f"{featdir}/cmvn.scp",
                f"{featdir}/utt2spk", 0, 60,
            )
            source = TextBatchDispenser(reader, coder, 4, textfile)
        else:
            source = BulkTextBatchSource(
                f"{featdir}/feats.scp",
                f"{featdir}/cmvn.scp",
                f"{featdir}/utt2spk",
                0,
                coder,
                textfile,
                4,
                max_input_length=60,
            )
        model = LSTM(RNNConfig(
            input_dim=info["feat_dim"], num_labels=coder.num_labels + 1,
            num_layers=1, hidden_units=8, bidirectional=True,
        ))
        num_steps = int(source.num_batches * 2)
        trainer = Trainer(model, TrainerConfig(
            init_learning_rate=0.05, num_steps=num_steps,
            loss_type="ctc", ctc_blank_id=coder.num_labels,
        ))
        opts = NnetTrainOptions(
            savedir=str(base / "save"),
            num_epochs=2, batch_size=4, valid_batches=1, valid_frequency=2,
            valid_adapt=True, valid_retries=1, check_freq=2,
        )
        losses = []
        controller = TrainingController(
            trainer, source, DeviceBatcher(bucket_multiple=16), opts,
            metrics_hook=lambda loss, **kw: losses.append(loss),
        )
        state = controller.train()
        results[kind] = (losses, state)

    py_losses, py_state = results["python"]
    nat_losses, nat_state = results["native"]
    assert py_losses == nat_losses
    assert len(py_losses) > 2
    for a, b in zip(jax.tree.leaves(py_state.params), jax.tree.leaves(nat_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bulk_no_cmvn_identity(tmp_path):
    """cmvnfile=None (the apply_cmvn=False config) must yield raw spliced
    features, bit-exact vs the Python reader with CMVN disabled."""
    featdir, alifile, info = make_featdir(tmp_path, num_speakers=2, utts_per_speaker=6)
    reader = FeatureReader(f"{featdir}/feats.scp", None, f"{featdir}/utt2spk", 2, 60)
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, 4, alifile)
    bulk = BulkAlignmentBatchSource(
        f"{featdir}/feats.scp", None, f"{featdir}/utt2spk", 2,
        read_alignments(alifile), 4,
    )
    batcher = DeviceBatcher(bucket_multiple=16)
    for _ in range(2):
        py_batch = batcher(*disp.get_batch())
        nat_batch = bulk.get_batch(bucket_multiple=16)
        np.testing.assert_array_equal(py_batch.inputs, nat_batch.inputs)


def test_native_stream_matches_python_stream(tmp_path):
    """Decode-side streaming: the native bulk stream yields byte-identical
    batches to the per-utterance Python stream, including skipping
    utterances too short to splice."""
    from tfkaldi_tpu.decode.streaming import (
        stream_padded_batches,
        stream_padded_batches_native,
    )

    # min_frames=3 with context 2 (needs >=5 frames): some utts get skipped
    featdir, _, info = make_featdir(
        tmp_path, num_speakers=2, utts_per_speaker=5, min_frames=3, max_frames=30
    )

    def batches(fn):
        reader = FeatureReader(
            f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 2, 60
        )
        return list(fn(reader, batch_size=3, bucket_multiple=8))

    py = batches(stream_padded_batches)
    nat = batches(stream_padded_batches_native)
    assert len(py) == len(nat) > 0
    for (pu, pi, pl), (nu, ni, nl) in zip(py, nat):
        assert pu == nu
        np.testing.assert_array_equal(pl, nl)
        np.testing.assert_array_equal(pi, ni)


def test_native_stream_pad_to_batch(tmp_path):
    """pad_to_batch pins the batch dim (mesh decode); filler rows length 1."""
    from tfkaldi_tpu.decode.streaming import (
        stream_padded_batches,
        stream_padded_batches_native,
    )

    featdir, _, _ = make_featdir(tmp_path, num_speakers=1, utts_per_speaker=5)

    def batches(fn):
        reader = FeatureReader(
            f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
        )
        return list(fn(reader, batch_size=4, bucket_multiple=8, pad_to_batch=True))

    py = batches(stream_padded_batches)
    nat = batches(stream_padded_batches_native)
    assert [b[1].shape[0] for b in nat] == [4, 4]
    for (pu, pi, pl), (nu, ni, nl) in zip(py, nat):
        assert pu == nu
        np.testing.assert_array_equal(pl, nl)
        np.testing.assert_array_equal(pi, ni)


def test_bulk_rejects_out_of_range_labels(tmp_path):
    """Same guard AlignmentCoder applies: pdf ids outside [0, num_labels)."""
    featdir, alifile, info = make_featdir(tmp_path)
    alignments = read_alignments(alifile)
    first = next(iter(alignments))
    alignments[first] = alignments[first] + info["num_labels"]
    with pytest.raises(ValueError, match="outside"):
        BulkAlignmentBatchSource(
            f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk",
            1, alignments, 4, num_labels=info["num_labels"],
        )


def test_bulk_cursor_semantics(tmp_path):
    _, _, bulk = _both(tmp_path)
    b0 = bulk.get_batch()
    bulk.return_batch()
    b0_again = bulk.get_batch()
    np.testing.assert_array_equal(np.asarray(b0.inputs), np.asarray(b0_again.inputs))
    bulk.skip_batch()
    b2 = bulk.get_batch()
    assert not np.array_equal(np.asarray(b0.inputs), np.asarray(b2.inputs))


def test_bulk_split(tmp_path):
    disp, _, bulk = _both(tmp_path)
    assert bulk.num_utt == 12
    disp.get_batch()
    bulk.get_batch()
    disp.split()
    bulk.split()
    # num_utt preserves the reference quirk: split does NOT shrink it
    # (batchdispenser.py:168-171 counts target_dict, which split never
    # touches) — but the batch stream starts at the post-carve utterances
    assert bulk.num_utt == disp.num_utt == 12
    assert len(bulk._entries) == 8


def test_bulk_prior_counts(tmp_path):
    disp, _, bulk = _both(tmp_path)
    np.testing.assert_array_equal(
        bulk.compute_target_count(), disp.compute_target_count()
    )


def test_prior_sized_by_num_labels(tmp_path):
    """compute_target_count must size the prior by num_labels even when the
    top label never occurs (matches AlignmentBatchDispenser)."""
    import gzip

    import numpy as np

    from tfkaldi_tpu.data.bulk_loader import BulkAlignmentBatchSource
    from tfkaldi_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native unavailable")
    featdir, alifile, info = make_featdir(tmp_path)
    alignments = {}
    with gzip.open(alifile, "rt") as f:
        for line in f:
            parts = line.split()
            # clamp labels so the top class never occurs
            alignments[parts[0]] = np.minimum(
                np.array([int(x) for x in parts[1:]], dtype=np.int32),
                info["num_labels"] - 2,
            )
    src = BulkAlignmentBatchSource(
        f"{featdir}/feats.scp",
        f"{featdir}/cmvn.scp",
        f"{featdir}/utt2spk",
        1,
        alignments,
        4,
        num_labels=info["num_labels"],
    )
    counts = src.compute_target_count()
    assert counts.shape == (info["num_labels"],)
    assert counts[-1] == 0


def test_multi_ark_scp(tmp_path):
    """Bulk loading across multiple ark files in one scp (real Kaldi data
    dirs split feats into per-job arks)."""
    import gzip

    import numpy as np

    from tests.synthetic import cmvn_stats_f32
    from tfkaldi_tpu.data import DeviceBatcher
    from tfkaldi_tpu.data.bulk_loader import BulkAlignmentBatchSource
    from tfkaldi_tpu.io import ArkWriter, native

    if not native.available():
        import pytest

        pytest.skip("native unavailable")
    rng = np.random.default_rng(0)
    num_labels, dim = 6, 5
    utts = {f"utt{i}": rng.standard_normal((20 + i, dim)).astype(np.float32) for i in range(8)}
    # two arks, one scp
    featdir = tmp_path
    with open(featdir / "feats.scp", "w") as scp:
        for half, names in enumerate([list(utts)[:4], list(utts)[4:]]):
            with ArkWriter(str(featdir / f"part{half}.scp"), str(featdir / f"feats.{half}.ark")) as w:
                for u in names:
                    w.write_next_utt(u, utts[u])
            scp.write(open(featdir / f"part{half}.scp").read())
    with ArkWriter(str(featdir / "cmvn.scp"), str(featdir / "cmvn.ark")) as w:
        w.write_next_utt("spk", cmvn_stats_f32(np.concatenate(list(utts.values()))))
    with open(featdir / "utt2spk", "w") as f:
        f.writelines(f"{u} spk\n" for u in utts)
    alignments = {u: rng.integers(0, num_labels, m.shape[0]).astype(np.int32) for u, m in utts.items()}

    src = BulkAlignmentBatchSource(
        str(featdir / "feats.scp"), str(featdir / "cmvn.scp"), str(featdir / "utt2spk"),
        1, alignments, 8, num_labels=num_labels,
    )
    batch = src.get_batch()
    assert batch.inputs.shape[0] == 8

    # compare against the pure-Python reader path
    from tfkaldi_tpu.data.feature_reader import apply_cmvn_np, splice_np
    from tfkaldi_tpu.io import ArkReader

    reader = ArkReader(str(featdir / "feats.scp"))
    cmvn = ArkReader(str(featdir / "cmvn.scp")).read_utt("spk")
    for i, u in enumerate(utts):
        want = splice_np(apply_cmvn_np(reader.read_utt(u), cmvn), 1)
        got = np.asarray(batch.inputs[i, : want.shape[0]])
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
