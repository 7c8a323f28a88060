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
    disp, batcher, bulk = _both(tmp_path)
    for _ in range(3):
        py_batch = batcher(*disp.get_batch())
        nat_batch = bulk.get_batch()
        np.testing.assert_array_equal(py_batch.input_lengths, nat_batch.input_lengths)
        np.testing.assert_array_equal(py_batch.targets, nat_batch.targets)
        assert py_batch.inputs.shape == nat_batch.inputs.shape
        np.testing.assert_allclose(py_batch.inputs, nat_batch.inputs, atol=1e-5)


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
    _, _, bulk = _both(tmp_path)
    assert bulk.num_utt == 12
    bulk.get_batch()
    bulk.split()
    assert bulk.num_utt == 8


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
