"""Tests for the native C++ bulk ark loader vs the Python paths."""

import numpy as np
import pytest

from tfkaldi_tpu.data.feature_reader import apply_cmvn_np, splice_np
from tfkaldi_tpu.frontend.cmvn import cmvn_stats
from tfkaldi_tpu.io import ArkReader, ArkWriter
from tfkaldi_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


@pytest.fixture()
def archive(tmp_path):
    rng = np.random.default_rng(0)
    mats = {f"u{i}": rng.standard_normal((5 + 7 * i, 9)).astype(np.float32) for i in range(6)}
    scp = str(tmp_path / "f.scp")
    with ArkWriter(scp, str(tmp_path / "f.ark")) as w:
        for k, m in mats.items():
            w.write_next_utt(k, m)
    reader = ArkReader(scp)
    return reader, mats


def test_read_batch_matches_python(archive):
    reader, mats = archive
    offsets = [reader.scp_data[i][1] for i in range(len(reader))]
    path = reader.scp_data[0][0]
    max_rows = max(m.shape[0] for m in mats.values())
    batch, rows = native.read_batch(path, offsets, max_rows, 9)
    for i, (k, m) in enumerate(mats.items()):
        assert rows[i] == m.shape[0]
        np.testing.assert_array_equal(batch[i, : rows[i]], m)
        assert np.all(batch[i, rows[i] :] == 0)


def test_read_batch_double_records(tmp_path):
    import struct

    mat = np.linspace(0, 1, 20).reshape(4, 5)
    ark = tmp_path / "d.ark"
    with open(ark, "wb") as f:
        f.write(b"u1 ")
        pos = f.tell()
        f.write(b"\x00BDM ")
        f.write(struct.pack("<bi", 4, 4))
        f.write(struct.pack("<bi", 4, 5))
        f.write(mat.astype(np.float64).tobytes())
    batch, rows = native.read_batch(str(ark), [pos], 6, 5)
    assert rows[0] == 4
    np.testing.assert_allclose(batch[0, :4], mat.astype(np.float32))


def test_cmvn_splice_batch_matches_python(archive):
    reader, mats = archive
    offsets = [reader.scp_data[i][1] for i in range(len(reader))]
    path = reader.scp_data[0][0]
    max_rows = max(m.shape[0] for m in mats.values())
    # one shared speaker stats over all utterances
    stats = cmvn_stats(np.concatenate(list(mats.values()))).astype(np.float32)
    stats_batch = np.repeat(stats[None], len(mats), axis=0)
    c = 2
    batch, rows = native.read_cmvn_splice_batch(path, offsets, stats_batch, c, max_rows, 9)
    for i, (k, m) in enumerate(mats.items()):
        golden = splice_np(apply_cmvn_np(m, stats.astype(np.float64)), c)
        if golden is None:
            assert rows[i] == -1
            assert np.all(batch[i] == 0)
        else:
            assert rows[i] == m.shape[0]
            np.testing.assert_allclose(batch[i, : rows[i]], golden, atol=1e-5)
            assert np.all(batch[i, rows[i] :] == 0)


def test_error_on_bad_offset(archive):
    reader, _ = archive
    path = reader.scp_data[0][0]
    with pytest.raises(IOError):
        native.read_batch(path, [1], 10, 9)


def test_negative_dims_rejected(tmp_path):
    """A corrupted record whose rows field went negative must fail with a
    per-record error — not pass the max_rows cap and turn the payload read
    into an unbounded write over the batch buffer."""
    import struct

    from tfkaldi_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native arkio unavailable")
    ark = tmp_path / "bad.ark"
    payload = np.zeros(64, np.float32).tobytes()
    with open(ark, "wb") as f:
        f.write(b"u1 ")
        offset = f.tell()
        f.write(b"\x00BFM ")
        f.write(struct.pack("<bi", 4, -3))  # corrupted negative rows
        f.write(struct.pack("<bi", 4, 8))
        f.write(payload)
    with np.testing.assert_raises(IOError):
        native.read_batch(str(ark), [offset], max_rows=16, cols=8)
