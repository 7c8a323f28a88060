"""Byte-level tests for Kaldi ark/scp interchange (reference ark.py semantics)."""

import struct

import numpy as np
import pytest

from tfkaldi_tpu.io import ArkReader, ArkWriter


def _write_archive(tmp_path, mats):
    scp = str(tmp_path / "feats.scp")
    ark = str(tmp_path / "feats.ark")
    with ArkWriter(scp, ark) as writer:
        for key, mat in mats.items():
            writer.write_next_utt(key, mat)
    return scp, ark


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mats = {f"utt{i}": rng.standard_normal((7 + i, 13)).astype(np.float32) for i in range(5)}
    scp, _ = _write_archive(tmp_path, mats)
    reader = ArkReader(scp)
    assert reader.utt_ids == list(mats)
    for key, mat in mats.items():
        np.testing.assert_array_equal(reader.read_utt(key), mat)


def test_binary_layout(tmp_path):
    """Pin the exact byte layout: key, space, \\x00BFM, \\x04+rows, \\x04+cols, f32 data."""
    mat = np.arange(6, dtype=np.float32).reshape(2, 3)
    scp, ark = _write_archive(tmp_path, {"ab": mat})
    raw = open(ark, "rb").read()
    expected = b"ab \x00BFM " + struct.pack("<bi", 4, 2) + struct.pack("<bi", 4, 3) + mat.tobytes()
    assert raw == expected
    # scp offset points at the binary marker (after "key ")
    key, path_pos = open(scp).read().strip().split(" ", 1)
    path, pos = path_pos.rsplit(":", 1)
    assert key == "ab" and path == ark and int(pos) == 3
    assert raw[int(pos) : int(pos) + 2] == b"\x00B"


def test_reads_reference_style_archive(tmp_path):
    """The reference writer omits the space after the key (ark.py:204-206);
    scp-offset-based reads must still work on such archives."""
    mat = np.ones((3, 4), dtype=np.float32)
    ark = tmp_path / "ref.ark"
    with open(ark, "wb") as f:
        f.write(b"uttX")  # no trailing space, as the reference writes
        pos = f.tell()
        f.write(b"\x00BFM ")
        f.write(struct.pack("<bi", 4, 3))
        f.write(struct.pack("<bi", 4, 4))
        f.write(mat.tobytes())
    scp = tmp_path / "ref.scp"
    scp.write_text(f"uttX {ark}:{pos}\n")
    reader = ArkReader(str(scp))
    np.testing.assert_array_equal(reader.read_utt("uttX"), mat)


def test_reads_double_matrices(tmp_path):
    mat = np.linspace(0, 1, 12).reshape(3, 4)
    ark = tmp_path / "d.ark"
    with open(ark, "wb") as f:
        f.write(b"u1 ")
        pos = f.tell()
        f.write(b"\x00BDM ")
        f.write(struct.pack("<bi", 4, 3))
        f.write(struct.pack("<bi", 4, 4))
        f.write(mat.astype(np.float64).tobytes())
    scp = tmp_path / "d.scp"
    scp.write_text(f"u1 {ark}:{pos}\n")
    out = ArkReader(str(scp)).read_utt("u1")
    assert out.dtype == np.float64
    np.testing.assert_array_equal(out, mat)


def test_sequential_loop_around(tmp_path):
    mats = {f"u{i}": np.full((2, 2), i, dtype=np.float32) for i in range(3)}
    scp, _ = _write_archive(tmp_path, mats)
    reader = ArkReader(scp)
    seen = []
    for _ in range(3):
        utt_id, mat, looped = reader.read_next_utt()
        assert not looped
        seen.append(utt_id)
    assert seen == ["u0", "u1", "u2"]
    utt_id, _, looped = reader.read_next_utt()
    assert looped and utt_id == "u0"


def test_cursor_and_split(tmp_path):
    mats = {f"u{i}": np.full((2, 2), i, dtype=np.float32) for i in range(5)}
    scp, _ = _write_archive(tmp_path, mats)
    reader = ArkReader(scp)
    assert reader.read_next_scp() == "u0"
    assert reader.read_next_scp() == "u1"
    # prev un-reads the most recently read utterance (fixed vs reference)
    assert reader.read_previous_scp() == "u1"
    assert reader.read_next_scp() == "u1"
    # rewinding from the very end must not crash (latent reference bug)
    end_reader = ArkReader(scp)
    for _ in range(5):
        end_reader.read_next_scp()
    assert end_reader.read_previous_scp() == "u4"
    reader.split()  # drop u0, u1; keep the rest including the final utterance
    assert reader.utt_ids == ["u2", "u3", "u4"]
    utt_id, _, looped = reader.read_next_utt()
    assert utt_id == "u2" and not looped


def test_rejects_text_archive(tmp_path):
    ark = tmp_path / "t.ark"
    ark.write_bytes(b"u1 1.0 2.0\n")
    scp = tmp_path / "t.scp"
    scp.write_text(f"u1 {ark}:3\n")
    with pytest.raises(ValueError):
        ArkReader(str(scp)).read_utt("u1")


def test_copy_feats_interop(tmp_path):
    """Cross-validate the write->copy-feats->read loop. Uses the real Kaldi
    binary when installed; otherwise the strict native consumer
    (native/kaldi_consumer.cpp, tested in depth in test_kaldi_consumer.py)
    stands in with the same framing rules — so this never skips."""
    import shutil
    import subprocess

    mats = {"a": np.random.default_rng(1).standard_normal((5, 3)).astype(np.float32)}
    scp, ark = _write_archive(tmp_path, mats)
    out_ark = tmp_path / "copied.ark"
    out_scp = tmp_path / "copied.scp"
    if shutil.which("copy-feats") is not None:
        subprocess.run(
            ["copy-feats", f"scp:{scp}", f"ark,scp:{out_ark},{out_scp}"], check=True
        )
    else:
        from tfkaldi_tpu.io import kaldi_compat

        if not kaldi_compat.available():
            pytest.fail("neither Kaldi nor the native consumer is available")
        kaldi_compat.copy_feats(str(ark), str(out_ark), str(out_scp))
    np.testing.assert_allclose(ArkReader(str(out_scp)).read_utt("a"), mats["a"])


def test_ark_golden_bytes(tmp_path):
    """Pin the exact on-disk bytes of a written record — the byte contract
    with Kaldi's C++ readers (ark.py:190-211): 'key ' + \\0BFM + \\x04+rows
    + \\x04+cols + row-major float32, scp offset at the post-key \\0."""
    import struct

    mat = np.array([[1.5, -2.0], [0.25, 4.0], [0.0, -0.5]], dtype=np.float32)
    with ArkWriter(str(tmp_path / "g.scp"), str(tmp_path / "g.ark")) as w:
        w.write_next_utt("utt1", mat)
    raw = open(tmp_path / "g.ark", "rb").read()
    want = (
        b"utt1 "
        + b"\x00BFM "
        + struct.pack("<bi", 4, 3)
        + struct.pack("<bi", 4, 2)
        + mat.tobytes()
    )
    assert raw == want
    scp_line = open(tmp_path / "g.scp").read().strip()
    path, offset = scp_line.split(" ")[1].rsplit(":", 1)
    assert int(offset) == len(b"utt1 ")  # offset points at the \x00
