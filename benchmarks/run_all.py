"""Throughput benchmark harness (SURVEY §7.8): every hot path, one command.

    python benchmarks/run_all.py [--out results.json]

Measures on the current default JAX device (TPU when available):
  - feature extraction, device-side (f64-parity and f32 fast spectrum paths)
  - DNN training step (flagship AURORA4 shape, bf16)
  - LSTM training step (2xBiLSTM-512)
  - likelihood-decode forward
  - host data loading: native C++ bulk loader vs pure-Python reader

Prints one human line per benchmark and writes a JSON report. Unlike
bench.py (the driver's single headline metric) this is the full matrix.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _sync(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, sync, reps=5, trials=3) -> float:
    """Best-of-trials mean seconds per rep."""
    fn_out = fn()
    sync(fn_out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def bench_features(results):
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts

    rate = 16000
    opts = FeatureOpts(feature_type="mfcc", dynamic="ddelta", nfilt=23, numcep=13)
    rng = np.random.default_rng(0)
    b, s = 32, rate * 4
    sig = (rng.standard_normal((b, s)) * 1000).astype(np.float32)
    lengths = np.full(b, s)
    for prec in ("high", "fast"):
        ex = FeatureExtractor(opts, rate, prec)
        frames = int(np.asarray(ex(sig, lengths)[1]).sum())
        dt = _time(lambda: ex(sig, lengths)[0], _sync, reps=3)
        fps = frames / dt
        results[f"features_{prec}_frames_per_sec"] = round(fps)
        print(f"features[{prec}]: {fps:,.0f} frames/s ({fps / 100:,.0f}x realtime, "
              f"{b / dt:.1f} utt/s) [incl. host->device transfer]")


def bench_dnn_train(results):
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import DNN, DNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    B, T, F, H, L, O = 128, 512, 440, 2048, 6, 2000
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32)),
        jnp.asarray(rng.integers(0, O, (B, T)).astype(np.int32)),
        jnp.full((B,), T, jnp.int32),
        jnp.full((B,), T, jnp.int32),
    )
    model = DNN(DNNConfig(input_dim=F, num_labels=O, num_hidden_layers=L,
                          num_hidden_units=H, nonlin="relu", batch_norm=True,
                          compute_dtype=jnp.bfloat16))
    tr = Trainer(model, TrainerConfig(num_steps=1000))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, loss = tr.update(st, batch, jax.random.PRNGKey(1))
    _ = float(loss)
    state = {"st": st}

    def step():
        state["st"], loss = tr.update(state["st"], batch)
        return loss

    dt = _time(step, lambda x: float(x), reps=10)
    fps = B * T / dt
    results["dnn_train_frames_per_sec"] = round(fps)
    print(f"dnn train (6x2048 bf16): {fps:,.0f} frames/s ({dt * 1000:.1f} ms/step)")


def bench_lstm_train(results):
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import LSTM, RNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    B, T, F, H, O = 32, 256, 440, 512, 2000
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32)),
        jnp.asarray(rng.integers(0, O, (B, T)).astype(np.int32)),
        jnp.full((B,), T, jnp.int32),
        jnp.full((B,), T, jnp.int32),
    )
    model = LSTM(RNNConfig(input_dim=F, num_labels=O, num_layers=2, hidden_units=H,
                           bidirectional=True, compute_dtype=jnp.bfloat16))
    tr = Trainer(model, TrainerConfig(num_steps=1000))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, loss = tr.update(st, batch, jax.random.PRNGKey(1))
    _ = float(loss)
    state = {"st": st}

    def step():
        state["st"], loss = tr.update(state["st"], batch)
        return loss

    dt = _time(step, lambda x: float(x), reps=5)
    fps = B * T / dt
    results["lstm_train_frames_per_sec"] = round(fps)
    print(f"lstm train (2xBiLSTM-512 bf16): {fps:,.0f} frames/s ({dt * 1000:.1f} ms/step)")


def bench_decode(results):
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.decode import Decoder
    from tfkaldi_tpu.models import DNN, DNNConfig

    B, T, F, H, L, O = 64, 512, 440, 2048, 6, 2000
    model = DNN(DNNConfig(input_dim=F, num_labels=O, num_hidden_layers=L,
                          num_hidden_units=H, nonlin="relu", batch_norm=True,
                          compute_dtype=jnp.bfloat16))
    params, mstate = model.init(jax.random.PRNGKey(0))
    prior = np.full(O, 1.0 / O, np.float32)
    dec = Decoder(model, params, mstate, prior)
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lengths = jnp.full(B, T, jnp.int32)
    dt = _time(lambda: dec.compute_batch(inputs, lengths), _sync, reps=5)
    fps = B * T / dt
    results["decode_frames_per_sec"] = round(fps)
    print(f"likelihood decode fwd: {fps:,.0f} frames/s ({dt * 1000:.1f} ms/batch)")


def bench_data_loading(results):
    """Host-side: native bulk loader vs pure-Python reader+dispenser."""
    import gzip
    import pathlib
    import tempfile

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import (
        AlignmentBatchDispenser,
        AlignmentCoder,
        DeviceBatcher,
        FeatureReader,
        identity_normalizer,
    )
    from tfkaldi_tpu.data.bulk_loader import BulkAlignmentBatchSource
    from tfkaldi_tpu.io import native

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="bench_data_"))
    featdir, alifile, info = make_featdir(
        tmp, num_speakers=4, utts_per_speaker=32, feat_dim=40,
        min_frames=200, max_frames=500,
    )
    batch = 16

    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 5, 500
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, batch, alifile)
    batcher = DeviceBatcher()

    def py_batch():
        return batcher(*disp.get_batch())

    t0 = time.perf_counter()
    frames = sum(py_batch().num_frames for _ in range(8))
    dt_py = (time.perf_counter() - t0) / 8
    print(f"data loading [python]: {frames / 8 / dt_py:,.0f} frames/s host-side")
    results["data_python_frames_per_sec"] = round(frames / 8 / dt_py)

    if native.available():
        alignments = {}
        with gzip.open(alifile, "rt") as f:
            for line in f:
                parts = line.split()
                alignments[parts[0]] = np.array(parts[1:], dtype=np.int32)
        src = BulkAlignmentBatchSource(
            f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk",
            5, alignments, batch, num_labels=info["num_labels"],
        )
        t0 = time.perf_counter()
        frames = sum(src.get_batch().num_frames for _ in range(8))
        dt_c = (time.perf_counter() - t0) / 8
        print(
            f"data loading [native]: {frames / 8 / dt_c:,.0f} frames/s host-side "
            f"({dt_py / dt_c:.1f}x python)"
        )
        results["data_native_frames_per_sec"] = round(frames / 8 / dt_c)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    results: dict = {}
    bench_data_loading(results)
    bench_features(results)
    bench_dnn_train(results)
    bench_lstm_train(results)
    bench_decode(results)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
