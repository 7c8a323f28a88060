"""Self-contained TensorBoard event writer: format + round-trip tests."""

import numpy as np

from tfkaldi_tpu.utils import tb_events
from tfkaldi_tpu.utils.visualize import TensorBoardVisualizer


def test_crc32c_known_vectors():
    """CRC-32C (Castagnoli) standard check values — wrong polynomial or
    reflection would make TensorBoard reject every record."""
    assert tb_events.crc32c(b"") == 0
    assert tb_events.crc32c(b"123456789") == 0xE3069283
    assert tb_events.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = tb_events.EventFileWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 3)
    w.add_scalar("train/loss", 1.25, 4)
    w.add_scalar("valid/loss", 2.0, 4)
    w.close()
    events = tb_events.read_events(w.path)
    assert events[0][1]["__file_version__"] == "brain.Event:2"
    scalars = [(s, v) for s, v in events[1:]]
    assert scalars[0][0] == 3 and scalars[0][1]["train/loss"] == 1.5
    assert scalars[1][0] == 4 and scalars[1][1]["train/loss"] == 1.25
    assert scalars[2][1]["valid/loss"] == 2.0


def test_histogram_roundtrip(tmp_path):
    w = tb_events.EventFileWriter(str(tmp_path))
    w.add_histogram("params/w", np.random.default_rng(0).standard_normal(1000), 7)
    w.close()
    events = tb_events.read_events(w.path)
    step, vals = events[1]
    assert step == 7 and vals["params/w"] == "histogram"


def test_corrupt_record_detected(tmp_path):
    w = tb_events.EventFileWriter(str(tmp_path))
    w.add_scalar("t", 1.0, 0)
    w.close()
    blob = bytearray(open(w.path, "rb").read())
    blob[-6] ^= 0xFF  # flip a payload byte of the last record
    bad = tmp_path / "bad_events"
    bad.write_bytes(bytes(blob))
    try:
        tb_events.read_events(str(bad))
        raise AssertionError("expected a CRC failure")
    except IOError:
        pass


def test_tensorboard_own_reader_accepts_our_files(tmp_path):
    """Third-party validation: TensorBoard's own EventFileLoader (when the
    package exists in the env) must read files this writer produced —
    the same hands did NOT write both the writer and this verifier."""
    import pytest

    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            EventFileLoader,
        )
    except ImportError:
        pytest.skip("tensorboard package not installed")
    w = tb_events.EventFileWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 3)
    w.add_histogram("params/w", np.arange(100.0), 4)
    w.close()
    events = list(EventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 3 and events[1].summary.value[0].tag == "train/loss"
    assert events[2].step == 4 and events[2].summary.value[0].tag == "params/w"


def test_visualizer_writes_parseable_events(tmp_path):
    """The production visualizer (metrics hook + validation + params) must
    produce an event file whose records all pass CRC framing and carry the
    expected tags — in an environment with no torch/TensorFlow import."""
    viz = TensorBoardVisualizer(str(tmp_path))
    viz(step=0, loss=3.0, step_time=0.1, num_frames=1000)
    viz.validation(0, 2.5)
    viz.params(0, {"layer0": {"w": np.zeros((4, 4)), "b": np.ones(4)}})
    viz.close()
    import os

    files = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    assert len(files) == 1
    events = tb_events.read_events(str(tmp_path / files[0]))
    tags = set()
    for _, vals in events:
        tags |= set(vals)
    assert {"train/loss", "train/step_time_s", "train/frames_per_sec", "valid/loss"} <= tags
    assert any(t.startswith("params") for t in tags)
