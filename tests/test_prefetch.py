"""Tests for the async device prefetcher, incl. rollback bookkeeping."""

import numpy as np

from tests.synthetic import make_featdir
from tfkaldi_tpu.data import (
    AlignmentBatchDispenser,
    AlignmentCoder,
    DeviceBatcher,
    FeatureReader,
    identity_normalizer,
)
from tfkaldi_tpu.data.prefetch import PrefetchingBatchSource


def _dispenser(tmp_path, batch=4):
    featdir, alifile, info = make_featdir(tmp_path, num_speakers=2, utts_per_speaker=8)
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    return AlignmentBatchDispenser(reader, coder, batch, alifile)


def test_prefetch_delivers_same_batches_as_direct(tmp_path):
    disp_a = _dispenser(tmp_path / "a")
    disp_b = _dispenser(tmp_path / "b")
    batcher = DeviceBatcher(bucket_multiple=16)

    direct = [batcher(*disp_a.get_batch()) for _ in range(4)]
    with PrefetchingBatchSource(disp_b, batcher, depth=2) as source:
        fetched = [source.next() for _ in range(4)]
    for d, f in zip(direct, fetched):
        np.testing.assert_array_equal(np.asarray(d.inputs), np.asarray(f.inputs))
        np.testing.assert_array_equal(np.asarray(d.targets), np.asarray(f.targets))


def test_prefetch_rewind_replays_batches(tmp_path):
    disp = _dispenser(tmp_path)
    batcher = DeviceBatcher(bucket_multiple=16)
    with PrefetchingBatchSource(disp, batcher, depth=2) as source:
        first = [source.next() for _ in range(2)]
        source.rewind(2)  # un-consume both (plus whatever was buffered)
        replay = [source.next() for _ in range(2)]
    for a, b in zip(first, replay):
        np.testing.assert_array_equal(np.asarray(a.inputs), np.asarray(b.inputs))
        np.testing.assert_array_equal(np.asarray(a.targets), np.asarray(b.targets))


def test_prefetch_partial_rewind(tmp_path):
    disp = _dispenser(tmp_path)
    batcher = DeviceBatcher(bucket_multiple=16)
    with PrefetchingBatchSource(disp, batcher, depth=1) as source:
        b0 = source.next()
        b1 = source.next()
        source.rewind(1)  # un-consume only b1
        again = source.next()
    np.testing.assert_array_equal(np.asarray(b1.inputs), np.asarray(again.inputs))
    assert not np.array_equal(np.asarray(b0.inputs), np.asarray(again.inputs))


def test_worker_failure_raises_in_next():
    """A dispenser exception on the worker thread surfaces in next()
    instead of deadlocking the training loop."""
    import pytest

    from tfkaldi_tpu.data.batching import DeviceBatcher
    from tfkaldi_tpu.data.prefetch import PrefetchingBatchSource

    class BoomDispenser:
        def get_batch(self):
            raise ValueError("boom")

    src = PrefetchingBatchSource(BoomDispenser(), DeviceBatcher(), depth=1)
    try:
        with pytest.raises(RuntimeError, match="prefetch worker failed"):
            src.next()
    finally:
        src.close()
