"""Benchmark: acoustic-model training throughput (frames/sec) on TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload is the AURORA4 flagship recipe (440-dim spliced fbank input,
6×2048 relu+batchnorm DNN, 2000 pdf outputs, 128-utterance batches;
config_AURORA4.cfg:102-141). The baseline is a measured numpy/BLAS proxy
of the reference's training inner loop — per-microbatch forward+backward
matmuls at float32 on the host CPU (trainer.py:310-332 runs 8 microbatches
of 16 utterances per step; the proxy is *generous* to the reference: no
feed_dict host→device copies, no per-microbatch session dispatch, no
padding transposes, no batchnorm cost).
"""

import json
import sys
import time

import numpy as np

B, T, F, H, L, O = 128, 512, 440, 2048, 6, 2000
MICRO = 16  # reference numutterances_per_minibatch (config_AURORA4.cfg:141)
STEPS = 10

# LSTM has no reference counterpart (its sequence path never worked,
# trainer.py:533-570); the ratio is vs our own round-1 measurement,
# recorded here with provenance so a re-baselining can't go silently stale.
LSTM_BASELINE = {"value": 397608.0, "source": "BENCH_r01.json (round-1 lstm bench, same 32x256 2xBiLSTM-512 shape)"}


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import DNN, DNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    model = DNN(
        DNNConfig(
            input_dim=F,
            num_labels=O,
            num_hidden_layers=L,
            num_hidden_units=H,
            nonlin="relu",
            batch_norm=True,
            compute_dtype=jnp.bfloat16,
        )
    )
    trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3, num_steps=1000))
    state = trainer.init_state(jax.random.PRNGKey(0))

    # stage the batch on device once: this measures the training step (the
    # framework), not this sandbox's ~10 MB/s host↔device tunnel (a real
    # TPU host feeds batches over PCIe with async prefetch)
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32)),
        jnp.asarray(rng.integers(0, O, (B, T)).astype(np.int32)),
        jnp.full((B,), T, jnp.int32),
        jnp.full((B,), T, jnp.int32),
    )

    # warm-up/compile (sync via scalar transfer — device stream is in-order)
    state, loss = trainer.update(state, batch, jax.random.PRNGKey(1))
    print(f"[bench] compiled; warm-up loss {float(loss):.3f}", file=sys.stderr)

    # best of 3 windows: the sandbox shares the chip behind a tunnel, so a
    # single window can absorb unrelated stalls
    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        for i in range(STEPS):
            # production path: the per-step dropout key derives on device
            # (host PRNGKey creation costs extra dispatches per step)
            state, loss = trainer.update(state, batch)
        _ = float(loss)  # forces completion of the whole donated-state chain
        best = min(best, time.perf_counter() - t0)
    fps = B * T * STEPS / best
    print(f"[bench] tpu: best {STEPS}-step window {best:.3f}s -> {fps:,.0f} frames/s", file=sys.stderr)
    return fps


def bench_lstm_tpu() -> float:
    """LSTM family train throughput (2xBiLSTM-512, CE, batch 32x256) —
    the sequence-model counterpart the reference never finished
    (trainer.py:533-570). Runs the interleaved-direction Pallas kernel
    path (ops/pallas_lstm.py) under scan_impl='auto'."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import LSTM, RNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    b, t, f, o, h = 32, 256, 440, 2000, 512
    model = LSTM(RNNConfig(input_dim=f, num_labels=o, num_layers=2, hidden_units=h,
                           bidirectional=True, compute_dtype=jnp.bfloat16))
    trainer = Trainer(model, TrainerConfig(num_steps=1000))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)),
        jnp.asarray(rng.integers(0, o, (b, t)).astype(np.int32)),
        jnp.full((b,), t, jnp.int32),
        jnp.full((b,), t, jnp.int32),
    )
    state, loss = trainer.update(state, batch)
    _ = float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = trainer.update(state, batch)
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / 10)
    fps = b * t / best
    print(f"[bench] lstm train: {best * 1000:.1f} ms/step -> {fps:,.0f} frames/s",
          file=sys.stderr)
    return fps


def bench_gru_tpu() -> float:
    """GRU family train throughput (2xBiGRU-512, CE, batch 32x256 — the
    same shape as the LSTM bench). Runs the interleaved-direction Pallas
    GRU kernel (ops/pallas_gru.py) under scan_impl='auto'; measured
    faster than the Pallas LSTM at 3/4 the gate FLOPs."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import GRU, RNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    b, t, f, o, h = 32, 256, 440, 2000, 512
    model = GRU(RNNConfig(input_dim=f, num_labels=o, num_layers=2, hidden_units=h,
                          bidirectional=True, compute_dtype=jnp.bfloat16))
    trainer = Trainer(model, TrainerConfig(num_steps=1000))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)),
        jnp.asarray(rng.integers(0, o, (b, t)).astype(np.int32)),
        jnp.full((b,), t, jnp.int32),
        jnp.full((b,), t, jnp.int32),
    )
    state, loss = trainer.update(state, batch)
    _ = float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = trainer.update(state, batch)
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / 10)
    fps = b * t / best
    print(f"[bench] gru train: {best * 1000:.1f} ms/step -> {fps:,.0f} frames/s",
          file=sys.stderr)
    return fps


def bench_tdnn_tpu() -> float:
    """TDNN family train throughput (beyond the reference): 5×1024 TDNN
    with Kaldi-style sub-sampled context over raw 40-dim fbank (no input
    splicing — the time-delay layers provide the context), CE, batch
    128×512. All static-shift splices + dense MXU matmuls — the modern
    hybrid acoustic model at DNN-class step cost."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import TDNN, TDNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    b, t, f, h = 128, 512, 40, 1024
    model = TDNN(TDNNConfig(
        input_dim=f, num_labels=O, num_hidden_layers=5, num_hidden_units=h,
        context="-2,-1,0,1,2;-1,0,1;-1,0,1;-3,0,3;-3,0,3",
        batch_norm=True, compute_dtype=jnp.bfloat16,
    ))
    trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3, num_steps=1000))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)),
        jnp.asarray(rng.integers(0, O, (b, t)).astype(np.int32)),
        jnp.full((b,), t, jnp.int32),
        jnp.full((b,), t, jnp.int32),
    )
    state, loss = trainer.update(state, batch)
    _ = float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = trainer.update(state, batch)
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / 10)
    fps = b * t / best
    print(f"[bench] tdnn train: {best * 1000:.1f} ms/step -> {fps:,.0f} frames/s",
          file=sys.stderr)
    return fps


def bench_cnn_tpu() -> float:
    """CNN family train throughput (beyond the reference): classic speech
    CNN — 64/128-filter 9x3/3x3 conv frontend with 3-band freq pooling
    over 40-dim fbank, 4×1024 dense stack, CE, batch 128×512. Convs lower
    to implicit-GEMM on the MXU (NHWC, static shapes)."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import CNN, CNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    b, t, f = 128, 512, 40
    model = CNN(CNNConfig(
        input_dim=f, num_labels=O, filters="64,128", kernels="9x3;3x3",
        pool="3,1", num_channels=1, num_hidden_layers=4,
        num_hidden_units=1024, batch_norm=True, compute_dtype=jnp.bfloat16,
    ))
    trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3, num_steps=1000))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)),
        jnp.asarray(rng.integers(0, O, (b, t)).astype(np.int32)),
        jnp.full((b,), t, jnp.int32),
        jnp.full((b,), t, jnp.int32),
    )
    state, loss = trainer.update(state, batch)
    _ = float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = trainer.update(state, batch)
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / 10)
    fps = b * t / best
    print(f"[bench] cnn train: {best * 1000:.1f} ms/step -> {fps:,.0f} frames/s",
          file=sys.stderr)
    return fps


def bench_conformer_tpu() -> float:
    """Conformer family train throughput (beyond the reference): 12-block
    Conformer (d=256, 4 heads, ffn 1024, depthwise k=15) over raw 40-dim
    fbank, CE, batch 32×512. Every projection/attention/FFN contraction is
    a static-shape bf16 MXU matmul with f32 accumulation; the f32 softmax
    and masked conv BN run on the VPU."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import Transformer, TransformerConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    b, t, f = 32, 512, 40
    model = Transformer(TransformerConfig(
        input_dim=f, num_labels=O, num_blocks=12, d_model=256, num_heads=4,
        ffn_dim=1024, conformer=True, conv_kernel=15,
        compute_dtype=jnp.bfloat16,
    ))
    trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3, num_steps=1000))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)),
        jnp.asarray(rng.integers(0, O, (b, t)).astype(np.int32)),
        jnp.full((b,), t, jnp.int32),
        jnp.full((b,), t, jnp.int32),
    )
    state, loss = trainer.update(state, batch)
    _ = float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = trainer.update(state, batch)
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / 10)
    fps = b * t / best
    print(f"[bench] conformer train: {best * 1000:.1f} ms/step -> {fps:,.0f} frames/s",
          file=sys.stderr)
    return fps


def bench_conformer_ctc_tpu() -> dict:
    """Conformer-CTC with the 4× stacking front-end vs the same model at
    1:1 frame rate, in-process interleaved (the production conformer-CTC
    recipe: attention/FFN cost drops ~4×; input frames/sec is the metric
    that matters to a user feeding audio)."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import Transformer, TransformerConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    b, t, f, v = 32, 512, 40, 40  # ~charset-sized CTC vocabulary
    l_max = 64
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)),
        jnp.asarray(rng.integers(0, v - 1, (b, l_max)).astype(np.int32)),
        jnp.full((b,), t, jnp.int32),
        jnp.full((b,), l_max, jnp.int32),
    )

    def build(sub):
        model = Transformer(TransformerConfig(
            input_dim=f, num_labels=v, num_blocks=12, d_model=256,
            num_heads=4, ffn_dim=1024, conformer=True, conv_kernel=15,
            subsample=sub, compute_dtype=jnp.bfloat16,
        ))
        trainer = Trainer(model, TrainerConfig(
            init_learning_rate=1e-3, num_steps=1000,
            loss_type="ctc", ctc_blank_id=v - 1,
        ))
        return trainer, trainer.init_state(jax.random.PRNGKey(0))

    arms = {1: build(1), 4: build(4)}
    states = {}
    for k, (tr, st) in arms.items():
        st, loss = tr.update(st, batch)
        _ = float(loss)
        states[k] = st
    best = {k: float("inf") for k in arms}
    for _ in range(3):
        for k, (tr, _) in arms.items():
            st = states[k]
            t0 = time.perf_counter()
            for _ in range(10):
                st, loss = tr.update(st, batch)
            _ = float(loss)
            best[k] = min(best[k], (time.perf_counter() - t0) / 10)
            states[k] = st
    out = {k: b * t / v_ for k, v_ in best.items()}
    for k in arms:
        print(
            f"[bench] conformer-ctc sub{k}: {best[k] * 1000:.1f} ms/step -> "
            f"{out[k]:,.0f} input frames/s",
            file=sys.stderr,
        )
    return {"sub4_fps": out[4], "sub1_fps": out[1]}


def bench_decode_tpu() -> dict:
    """Likelihood-emission throughput: the fused forward → softmax → ÷prior
    → eps-floor → log chain (decode/decoder.py) on the flagship DNN,
    batch 128×512, device-resident. The reference decodes ONE utterance per
    ``session.run`` with a batch-1 graph (nnet.py:270-286, decoder.py:49-71),
    so the baseline is the SAME chain dispatched at batch 1 in the same
    process — the ratio is the structural win of batched emission."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.decode import Decoder
    from tfkaldi_tpu.models import DNN, DNNConfig

    model = DNN(DNNConfig(
        input_dim=F, num_labels=O, num_hidden_layers=L, num_hidden_units=H,
        nonlin="relu", batch_norm=True, compute_dtype=jnp.bfloat16,
    ))
    params, model_state = model.init(jax.random.PRNGKey(0))
    prior = np.full((O,), 1.0 / O, np.float32)
    dec = Decoder(model, params, model_state, prior)

    rng = np.random.default_rng(3)
    batched = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    single = batched[:1]
    single_len = lengths[:1]

    def measure(inputs, lens, n_calls):
        out = dec.compute_batch(inputs, lens)  # compile + warm
        _ = float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_calls):
                out = dec.compute_batch(inputs, lens)
            _ = float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / n_calls)
        return best

    # interleaved arms (in-process A/B policy)
    batch_s = measure(batched, lengths, 10)
    one_s = measure(single, single_len, 20)
    batch_s = min(batch_s, measure(batched, lengths, 10))
    one_s = min(one_s, measure(single, single_len, 20))
    fps = B * T / batch_s
    one_fps = T / one_s
    print(
        f"[bench] decode emission: {batch_s * 1000:.1f} ms per {B}-utt batch -> "
        f"{fps:,.0f} frames/s (batch-1 reference structure: "
        f"{one_s * 1000:.2f} ms/utt -> {one_fps:,.0f} frames/s, {fps / one_fps:.1f}x)",
        file=sys.stderr,
    )
    return {"batched_fps": fps, "batch1_fps": one_fps}


def bench_ctc_tpu() -> dict:
    """CTC train step: the flagship sequence configuration (2xBiLSTM-512 +
    CTC over the 39-class character alphabet) the reference's broken
    CTCTrainer promised but never delivered (trainer.py:533-570).

    No reference baseline exists (the reference CTC never ran), so the
    recorded ratio is vs the SAME model trained with CE in the SAME
    process, interleaved — i.e. vs_baseline = the relative cost of the CTC
    loss path. 1.0 would mean the CTC fwd+bwd is free.
    """
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import LSTM, RNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    b, t, f, h = 32, 256, 440, 512
    num_chars = 38  # TextCoder alphabet size (target_coder.py:79-118)
    o = num_chars + 1  # + blank (nnet.py output_dim for loss=ctc)
    l_max = 64
    rng = np.random.default_rng(0)
    model = LSTM(RNNConfig(input_dim=f, num_labels=o, num_layers=2, hidden_units=h,
                           bidirectional=True, compute_dtype=jnp.bfloat16))

    inputs = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))
    in_len = jnp.full((b,), t, jnp.int32)
    ctc_batch = PaddedBatch(
        inputs,
        jnp.asarray(rng.integers(0, num_chars, (b, l_max)).astype(np.int32)),
        in_len,
        jnp.asarray(rng.integers(l_max // 2, l_max + 1, (b,)).astype(np.int32)),
    )
    ce_batch = PaddedBatch(
        inputs, jnp.asarray(rng.integers(0, o, (b, t)).astype(np.int32)), in_len, in_len
    )

    def measure(loss_type, batch):
        trainer = Trainer(model, TrainerConfig(
            num_steps=1000, loss_type=loss_type, ctc_blank_id=num_chars))
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, loss = trainer.update(state, batch)
        _ = float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, loss = trainer.update(state, batch)
            _ = float(loss)
            best = min(best, (time.perf_counter() - t0) / 10)
        return best

    # interleave the arms (in-process A/B policy: the tunnel's session
    # variance is ~2x, so separate runs cannot be compared)
    ctc_ms = measure("ctc", ctc_batch)
    ce_ms = measure("cross_entropy", ce_batch)
    ctc_ms = min(ctc_ms, measure("ctc", ctc_batch))
    ce_ms = min(ce_ms, measure("cross_entropy", ce_batch))
    fps = b * t / ctc_ms
    print(
        f"[bench] ctc train: {ctc_ms * 1000:.1f} ms/step -> {fps:,.0f} frames/s "
        f"(same-model CE step {ce_ms * 1000:.1f} ms; CTC overhead "
        f"{(ctc_ms / ce_ms - 1) * 100:.0f}%)",
        file=sys.stderr,
    )
    return {"ctc_fps": fps, "ce_fps": b * t / ce_ms}


def bench_attention_tpu() -> dict:
    """Attention encoder-decoder train step: the modern offline recipe —
    the SAME 12-block subsample-4 conformer encoder as the conformer-CTC
    bench feeding a 2-block transformer decoder over character targets
    (models/seq2seq.py). The reference has no attention model at all, so
    the recorded ratio is vs the same-encoder conformer-CTC step in the
    same process, interleaved — the marginal cost of the decoder +
    teacher-forced CE over the CTC recipe."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import (
        AttentionSeq2Seq,
        Seq2SeqConfig,
        Transformer,
        TransformerConfig,
    )
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    b, t, f = 32, 512, 40
    num_chars = 38  # TextCoder alphabet
    l_max = 64
    enc_extra = (("num_blocks", "12"), ("d_model", "256"),
                 ("num_heads", "4"), ("ffn_dim", "1024"),
                 ("conv_kernel", "15"), ("subsample", "4"))
    s2s = AttentionSeq2Seq(Seq2SeqConfig(
        input_dim=f, num_labels=num_chars, enc_type="conformer",
        enc_extra=enc_extra, dec_blocks=2, d_model=256, num_heads=4,
        ffn_dim=1024, compute_dtype=jnp.bfloat16,
    ))
    ctc_model = Transformer(TransformerConfig(
        input_dim=f, num_labels=num_chars + 1, num_blocks=12, d_model=256,
        num_heads=4, ffn_dim=1024, conformer=True, conv_kernel=15,
        subsample=4, compute_dtype=jnp.bfloat16,
    ))

    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)),
        jnp.asarray(rng.integers(0, num_chars, (b, l_max)).astype(np.int32)),
        jnp.full((b,), t, jnp.int32),
        jnp.asarray(rng.integers(l_max // 2, l_max + 1, (b,)).astype(np.int32)),
    )

    def measure(model, loss_type):
        trainer = Trainer(model, TrainerConfig(
            num_steps=1000, loss_type=loss_type, ctc_blank_id=num_chars))
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, loss = trainer.update(state, batch)
        _ = float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, loss = trainer.update(state, batch)
            _ = float(loss)
            best = min(best, (time.perf_counter() - t0) / 10)
        return best

    att_ms = measure(s2s, "attention")
    ctc_ms = measure(ctc_model, "ctc")
    att_ms = min(att_ms, measure(s2s, "attention"))
    ctc_ms = min(ctc_ms, measure(ctc_model, "ctc"))
    fps = b * t / att_ms
    print(
        f"[bench] attention train: {att_ms * 1000:.1f} ms/step -> "
        f"{fps:,.0f} input frames/s (same-encoder conformer-CTC step "
        f"{ctc_ms * 1000:.1f} ms; decoder overhead "
        f"{(att_ms / ctc_ms - 1) * 100:.0f}%)",
        file=sys.stderr,
    )
    return {"attention_fps": fps, "ctc_fps": b * t / ctc_ms}


def bench_rnnt_tpu() -> dict:
    """RNN-T train step: the flagship STREAMING sequence configuration
    (2x unidirectional LSTM-512 encoder + 1xLSTM-320 prediction net +
    320-joint over the 39-class character alphabet; models/transducer.py).
    The reference has no transduction path at all, so the recorded ratio is
    vs the SAME unidirectional encoder trained with CTC in the SAME
    process, interleaved — i.e. the relative cost of the lattice
    loss + prediction/joint networks over the CTC recipe.

    Also A/Bs the pruned (banded) lattice loss (ops/rnnt_loss.py,
    ``rnnt_prune_s``): the joint and the alpha recursion evaluated on a
    band of S label positions per frame instead of the full U+1 — the
    k2-style answer to the dense ``[B,T,U+1,V]`` joint that makes RNN-T
    flat in batch (docs/PERF_BATCH_SCALING.md). Both band placements are
    measured: "diagonal" (zero-cost linear band) and "guided" (two-stage:
    rank-1 proxy lattice → occupancy-centered band)."""
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.data.batching import PaddedBatch
    from tfkaldi_tpu.models import LSTM, RNNConfig, Transducer, TransducerConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    b, t, f, h = 32, 256, 440, 512
    num_chars = 38  # TextCoder alphabet (target_coder.py:79-118)
    l_max = 64
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))
    in_len = jnp.full((b,), t, jnp.int32)
    labels = jnp.asarray(rng.integers(0, num_chars, (b, l_max)).astype(np.int32))
    lab_len = jnp.asarray(rng.integers(l_max // 2, l_max + 1, (b,)).astype(np.int32))
    batch = PaddedBatch(inputs, labels, in_len, lab_len)

    td = Transducer(TransducerConfig(
        input_dim=f, num_labels=num_chars, enc_layers=2, enc_units=h,
        pred_layers=1, pred_units=320, embed_dim=128, joint_units=320,
        compute_dtype=jnp.bfloat16,
    ))
    ctc_model = LSTM(RNNConfig(
        input_dim=f, num_labels=num_chars + 1, num_layers=2, hidden_units=h,
        bidirectional=False, compute_dtype=jnp.bfloat16,
    ))

    def measure(model, loss_type):
        trainer = Trainer(model, TrainerConfig(
            num_steps=1000, loss_type=loss_type, ctc_blank_id=num_chars))
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, loss = trainer.update(state, batch)
        _ = float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, loss = trainer.update(state, batch)
            _ = float(loss)
            best = min(best, (time.perf_counter() - t0) / 10)
        return best

    s_band = 16  # prune_s: band width vs U+1 = 65 dense label positions
    td_diag = Transducer(TransducerConfig(
        input_dim=f, num_labels=num_chars, enc_layers=2, enc_units=h,
        pred_layers=1, pred_units=320, embed_dim=128, joint_units=320,
        compute_dtype=jnp.bfloat16, prune_s=s_band, prune_band="diagonal",
    ))
    td_guided = Transducer(TransducerConfig(
        input_dim=f, num_labels=num_chars, enc_layers=2, enc_units=h,
        pred_layers=1, pred_units=320, embed_dim=128, joint_units=320,
        compute_dtype=jnp.bfloat16, prune_s=s_band, prune_band="guided",
    ))

    def timed(tag, model, loss):
        t0 = time.perf_counter()
        ms = measure(model, loss)
        print(f"[bench] rnnt arm {tag}: {ms * 1000:.1f} ms/step "
              f"(arm wall {time.perf_counter() - t0:.0f}s)", file=sys.stderr)
        return ms

    # interleaved arms (in-process A/B policy)
    rnnt_ms = timed("dense", td, "rnnt")
    ctc_ms = timed("ctc", ctc_model, "ctc")
    diag_ms = timed("diag", td_diag, "rnnt")
    guided_ms = timed("guided", td_guided, "rnnt")
    rnnt_ms = min(rnnt_ms, timed("dense2", td, "rnnt"))
    ctc_ms = min(ctc_ms, timed("ctc2", ctc_model, "ctc"))
    diag_ms = min(diag_ms, timed("diag2", td_diag, "rnnt"))
    guided_ms = min(guided_ms, timed("guided2", td_guided, "rnnt"))
    fps = b * t / rnnt_ms

    # b=128 A/B: the shape where the [B,T,U+1,V]-proportional lattice work
    # dominates the step and pruning's FLOP cut pays fully — dense RNN-T is
    # flat in batch (docs/PERF_BATCH_SCALING.md) precisely because of that
    # term, so the pruned loss is what UNLOCKS batch scaling for RNN-T.
    b_big = 128
    inputs_big = jnp.asarray(
        rng.standard_normal((b_big, t, f)).astype(np.float32))
    labels_big = jnp.asarray(
        rng.integers(0, num_chars, (b_big, l_max)).astype(np.int32))
    lab_len_big = jnp.asarray(
        rng.integers(l_max // 2, l_max + 1, (b_big,)).astype(np.int32))
    batch_big = PaddedBatch(
        inputs_big, labels_big, jnp.full((b_big,), t, jnp.int32), lab_len_big)

    def measure_big(model):
        trainer = Trainer(model, TrainerConfig(
            num_steps=1000, loss_type="rnnt", ctc_blank_id=num_chars))
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, loss = trainer.update(state, batch_big)
        _ = float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, loss = trainer.update(state, batch_big)
            _ = float(loss)
            best = min(best, (time.perf_counter() - t0) / 10)
        return best

    dense_big_ms = measure_big(td)
    diag_big_ms = measure_big(td_diag)
    guided_big_ms = measure_big(td_guided)
    dense_big_ms = min(dense_big_ms, measure_big(td))
    diag_big_ms = min(diag_big_ms, measure_big(td_diag))
    guided_big_ms = min(guided_big_ms, measure_big(td_guided))
    print(
        f"[bench] rnnt b=128: dense {dense_big_ms * 1000:.1f} ms "
        f"({b_big * t / dense_big_ms:,.0f} fps), pruned-diag "
        f"{diag_big_ms * 1000:.1f} ms ({dense_big_ms / diag_big_ms:.2f}x), "
        f"pruned-guided {guided_big_ms * 1000:.1f} ms "
        f"({dense_big_ms / guided_big_ms:.2f}x)",
        file=sys.stderr,
    )
    print(
        f"[bench] rnnt train: {rnnt_ms * 1000:.1f} ms/step -> {fps:,.0f} frames/s "
        f"(same-encoder CTC step {ctc_ms * 1000:.1f} ms; transducer overhead "
        f"{(rnnt_ms / ctc_ms - 1) * 100:.0f}%)",
        file=sys.stderr,
    )
    print(
        f"[bench] rnnt pruned S={s_band} (of U+1=65): diagonal "
        f"{diag_ms * 1000:.1f} ms/step ({rnnt_ms / diag_ms:.2f}x dense), "
        f"guided {guided_ms * 1000:.1f} ms/step "
        f"({rnnt_ms / guided_ms:.2f}x dense)",
        file=sys.stderr,
    )
    return {
        "rnnt_fps": fps,
        "ctc_fps": b * t / ctc_ms,
        "pruned_s": s_band,
        "pruned_diagonal_fps": b * t / diag_ms,
        "pruned_guided_fps": b * t / guided_ms,
        "pruned_diagonal_speedup": rnnt_ms / diag_ms,
        "pruned_guided_speedup": rnnt_ms / guided_ms,
        "b128_dense_fps": b_big * t / dense_big_ms,
        "b128_pruned_diagonal_fps": b_big * t / diag_big_ms,
        "b128_pruned_guided_fps": b_big * t / guided_big_ms,
        "b128_pruned_diagonal_speedup": dense_big_ms / diag_big_ms,
        "b128_pruned_guided_speedup": dense_big_ms / guided_big_ms,
    }


def bench_features_tpu() -> float:
    """Batched device feature extraction (AURORA4 dnn-features recipe:
    40-mel log-fbank, 25ms/10ms windows, nfft 512 — config_AURORA4.cfg:63-100)
    in frames/sec, measured device-resident (batch staged once)."""
    import jax.numpy as jnp

    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts

    opts = FeatureOpts.from_config(_FEAT_CONF)
    n_sig, samples = 64, 80000  # 64 five-second utterances per call
    rng = np.random.default_rng(2)
    sigs = jnp.asarray((rng.standard_normal((n_sig, samples)) * 800).astype(np.float32))
    lengths = jnp.full((n_sig,), samples, jnp.int32)

    results = {}
    for precision in ("high", "fast"):
        ex = FeatureExtractor(opts, 16000, precision)
        feats, num_frames = ex(sigs, lengths)  # compile + warm-up
        frames_per_call = float(np.asarray(num_frames).sum())
        _ = float(jnp.sum(feats))  # scalar readback = sync through the tunnel
        calls = 10
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(calls):
                feats, num_frames = ex(sigs, lengths)
            _ = float(jnp.sum(feats))
            best = min(best, time.perf_counter() - t0)
        fps = frames_per_call * calls / best
        results[precision] = fps
        utt_s = fps / (frames_per_call / n_sig)
        print(
            f"[bench] features ({precision}): {best:.3f}s for {calls} x {n_sig} utts "
            f"-> {fps:,.0f} frames/s ({utt_s:,.0f} utt/s at "
            f"{frames_per_call / n_sig:.0f} frames/utt)",
            file=sys.stderr,
        )
    # the metric is the f64-parity path (the CLI default); 'fast' is logged
    return results["high"]


_FEAT_CONF = {
    "type": "fbank", "dynamic": "nodelta", "winlen": "0.025", "winstep": "0.01",
    "nfilt": "40", "nfft": "512", "lowfreq": "0", "highfreq": "-1",
    "preemph": "0.97", "include_energy": "False", "snip_edges": "True",
    "numcep": "13", "ceplifter": "22",
}


def bench_features_reference_proxy() -> float:
    """The reference's feature hot loop (prepare_data.py:55-68): one
    utterance at a time through the Python 2 FeatureComputer — measured by
    running the actual ported reference code (tests/reference_port) on the
    same signals at host-numpy speed."""
    from tests import reference_port as refport

    rng = np.random.default_rng(2)
    sigs = [(rng.standard_normal(80000) * 800).astype(np.float64) for _ in range(8)]
    # warm numpy/scipy
    refport.compute(sigs[0], 16000, _FEAT_CONF)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        frames = 0
        for sig in sigs:
            frames += refport.compute(sig, 16000, _FEAT_CONF).shape[0]
        best = min(best, time.perf_counter() - t0)
    fps = frames / best
    print(
        f"[bench] reference feature loop (ported reference code, per-utterance "
        f"numpy): {best:.3f}s for {len(sigs)} utts -> {fps:,.0f} frames/s",
        file=sys.stderr,
    )
    return fps


def bench_e2e_train() -> dict:
    """Input-INCLUSIVE end-to-end training throughput: synthetic featdir on
    disk → native bulk loader (read+CMVN+splice in C++) → prefetch worker →
    host→device staging → train step. This measures the production wiring
    (cli/main.py builds exactly this source), not just the device step.

    Caveat recorded with the number: in this sandbox host→device staging
    rides a network tunnel, so the e2e figure is a lower bound on real
    hardware (where PCIe staging overlaps fully under the same prefetcher).
    Also reports the host-side input rates (native vs Python dispenser),
    which ARE representative — disk and CPU are local.

    Robustness (round-5): the r03→r04 halving of this metric (82.5k→39.2k
    frames/s) was link noise, not a loader regression — the tunnel's
    bandwidth swings >2x between sessions (docs/PERF_E2E.md). So the
    metric line now carries the evidence to interpret cross-round swings:
    a same-process link calibration (``staging_mbps``: median host→device
    MB/s over repeated device_puts), the implied staging-bound throughput
    (``staging_bound_fps`` = staging_mbps / bytes-per-frame — if e2e_fps
    tracks it, the link is the binding constraint, not the framework),
    per-trial variance (``trial_cv``), and medians alongside bests.
    """
    import shutil
    import tempfile

    import jax

    from tests.synthetic import make_featdir
    from tfkaldi_tpu.data import (
        AlignmentBatchDispenser,
        AlignmentCoder,
        DeviceBatcher,
        FeatureReader,
        identity_normalizer,
    )
    from tfkaldi_tpu.data.bulk_loader import BulkAlignmentBatchSource
    from tfkaldi_tpu.data.prefetch import PrefetchingBatchSource
    from tfkaldi_tpu.io import native, read_alignments
    from tfkaldi_tpu.models import DNN, DNNConfig
    from tfkaldi_tpu.train import Trainer, TrainerConfig

    if not native.available():
        raise RuntimeError("native arkio unavailable")

    import pathlib

    # link calibration: median host→device staging bandwidth, measured in
    # this very process so the e2e number and the calibration see the same
    # link conditions (8 MB puts ~ the per-step batch size below)
    cal = np.random.default_rng(3).standard_normal(2 * 1024 * 1024).astype(np.float32)
    put_times = []
    for i in range(6):
        a = cal + np.float32(i)  # defeat donation/caching
        t0 = time.perf_counter()
        jax.device_put(a).block_until_ready()
        put_times.append(time.perf_counter() - t0)
    staging_mbps = float(np.median([8.0 / t for t in put_times]))
    print(f"[bench] staging calibration: {staging_mbps:.1f} MB/s "
          f"(host->device, median of 6x8MB)", file=sys.stderr)

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    try:
        n_utt, feat_dim, context, batch = 64, 40, 5, 16
        featdir, alifile, info = make_featdir(
            tmp, num_speakers=4, utts_per_speaker=n_utt // 4, feat_dim=feat_dim,
            num_labels=O, min_frames=480, max_frames=512,
        )
        alignments = read_alignments(alifile)
        frame_count = {u: len(a) for u, a in alignments.items()}
        scp_order = list(info["utts"])

        def make_bulk():
            return BulkAlignmentBatchSource(
                f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk",
                context, alignments, batch, num_labels=O, bucket_multiple=512,
            )

        batcher = DeviceBatcher(bucket_multiple=512)

        # host-side input-only rates (no device): native vs Python
        # dispenser; median-of-3 windows + cv so a loaded host is visible
        def host_rate(source):
            n_calls = 12
            source.get_padded_batch(batcher)  # warm page cache
            rates = []
            for _ in range(3):
                frames = 0
                t0 = time.perf_counter()
                for _ in range(n_calls):
                    b = source.get_padded_batch(batcher)
                    frames += int(np.asarray(b.input_lengths).sum())
                rates.append(frames / (time.perf_counter() - t0))
            r = np.asarray(rates)
            return float(np.median(r)), float(r.std() / r.mean())

        nat_in, nat_cv = host_rate(make_bulk())
        py_disp = AlignmentBatchDispenser(
            FeatureReader(
                f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk",
                context, 512,
            ),
            AlignmentCoder(identity_normalizer, O),
            batch, alifile,
        )
        py_in, py_cv = host_rate(py_disp)
        print(
            f"[bench] input path (host-side, disk->padded batch): native "
            f"{nat_in:,.0f} frames/s (cv {nat_cv:.2f}), python {py_in:,.0f} "
            f"frames/s (cv {py_cv:.2f}) ({nat_in / py_in:.2f}x)",
            file=sys.stderr,
        )

        # end-to-end: bulk source -> prefetch -> device step (the exact
        # production path, input included)
        model = DNN(DNNConfig(
            input_dim=feat_dim * (2 * context + 1), num_labels=O,
            num_hidden_layers=L, num_hidden_units=H, nonlin="relu",
            batch_norm=True, compute_dtype=jax.numpy.bfloat16,
        ))
        trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3, num_steps=1000))
        state = trainer.init_state(jax.random.PRNGKey(0))
        bulk = make_bulk()
        source = PrefetchingBatchSource(bulk, batcher, depth=2)
        try:
            # per-step frame counts are deterministic (scp order, wrapping)
            def frames_of(step):
                return sum(
                    frame_count[scp_order[(step * batch + j) % n_utt]]
                    for j in range(batch)
                )

            for _ in range(2):  # compile + warm
                state, loss = trainer.update(state, source.next())
            _ = float(loss)
            warm_steps = 2
            n_steps = 12
            trial_fps = []
            for trial in range(5):
                t0 = time.perf_counter()
                frames = 0
                for k in range(n_steps):
                    state, loss = trainer.update(state, source.next())
                    frames += frames_of(warm_steps + trial * n_steps + k)
                _ = float(loss)
                trial_fps.append(frames / (time.perf_counter() - t0))
            arr = np.asarray(trial_fps)
            fps = float(np.median(arr))
            cv = float(arr.std() / arr.mean())
            # bytes staged per (real) frame: spliced f32 inputs + int32
            # targets; padding to 512-frame buckets adds <7% at this corpus
            bytes_per_frame = feat_dim * (2 * context + 1) * 4 + 4
            staging_bound_fps = staging_mbps * 1e6 / bytes_per_frame
            print(
                f"[bench] e2e train (input-inclusive, native loader + prefetch): "
                f"median {fps:,.0f} frames/s (best {arr.max():,.0f}, cv {cv:.2f}; "
                f"link calib {staging_mbps:.1f} MB/s -> staging bound "
                f"{staging_bound_fps:,.0f} frames/s; real-host bound = "
                f"min(input {nat_in:,.0f}, step))",
                file=sys.stderr,
            )
        finally:
            source.close()
        return {
            "e2e_fps": fps,
            "e2e_best_fps": float(arr.max()),
            "e2e_cv": cv,
            "input_native_fps": nat_in,
            "input_native_cv": nat_cv,
            "input_python_fps": py_in,
            "staging_mbps": staging_mbps,
            "staging_bound_fps": staging_bound_fps,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_streaming_tpu() -> dict:
    """Streaming serving latency + real-time factor (batch 1, 16 kHz).

    Three production streaming stacks, each swept over 40/160/640 ms
    audio chunks:

    - ``conformer``: causal subsampled (x4) conformer-CTC through
      ``StreamingTranscriber`` (raw audio -> online features -> encoder
      -> greedy CTC), the flagship streaming recipe
    - ``lstm_hybrid``: 2xLSTM-512 likelihood emission through
      ``OnlineRecurrentDecoder`` (feature chunks in, the hybrid analog of
      the reference's batch-1 loop, nnet.py:270-286)
    - ``dnn_hybrid``: 6x2048 DNN through ``OnlineSplicedDecoder``
      (context-5 splice lookahead)

    Reports per-chunk wall latency p50/p99 (ms) and RTF = audio seconds
    processed per wall second. In THIS sandbox every chunk crosses a
    ~10 MB/s high-latency host<->device tunnel, so absolute latencies
    carry a tunnel dispatch floor a real TPU host does not have (the
    metric line is tagged ``staging: tunnel``); RTF ratios between chunk
    sizes and between stacks remain meaningful.
    """
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.decode.online import (
        OnlineRecurrentDecoder,
        OnlineSplicedDecoder,
        StreamingTranscriber,
    )
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
    from tfkaldi_tpu.frontend.online import (
        FusedOnlineFeatureExtractor,
        OnlineFeatureExtractor,
    )
    from tfkaldi_tpu.models import (
        DNN,
        DNNConfig,
        LSTM,
        RNNConfig,
        Transformer,
        TransformerConfig,
    )

    rate = 16000
    nfilt = 40
    opts = FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=nfilt,
                       nfft=512)
    chunk_ms = (40, 160, 640)
    total_audio_s = 40.0  # per (stack, chunk size) measurement window
    rng = np.random.default_rng(0)

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    def sweep(push, chunk_samples, warmup_pushes=8):
        """Push fixed-size chunks; return (p50_ms, p99_ms, rtf)."""
        n_chunks = max(8, int(total_audio_s * rate / chunk_samples))
        chunk = (rng.standard_normal((1, chunk_samples)) * 1000).astype(np.float32)
        lens = np.asarray([chunk_samples])
        for _ in range(warmup_pushes):  # compile all bucket shapes
            push(chunk, lens)
        lat = np.empty(n_chunks)
        t_start = time.perf_counter()
        for i in range(n_chunks):
            t0 = time.perf_counter()
            push(chunk, lens)
            lat[i] = time.perf_counter() - t0
        wall = time.perf_counter() - t_start
        rtf = (n_chunks * chunk_samples / rate) / wall
        return (
            float(np.percentile(lat, 50) * 1e3),
            float(np.percentile(lat, 99) * 1e3),
            float(rtf),
        )

    results: dict[str, dict] = {}

    # -- flagship: causal subsampled conformer-CTC, raw audio in ----------
    num_labels = 29  # character CTC
    model = Transformer(TransformerConfig(
        input_dim=nfilt, num_labels=num_labels + 1, num_blocks=12, d_model=256,
        num_heads=4, ffn_dim=1024, conformer=True, conv_kernel=15,
        causal_conv=True, left_context=64, right_context=0, subsample=4,
        compute_dtype=jnp.bfloat16,
    ))
    params, mstate = model.init(jax.random.PRNGKey(0))
    ext = FeatureExtractor(opts, rate)
    res = {}
    feat_res = {}
    unfused_res = {}
    for ms in chunk_ms:
        samples = rate * ms // 1000
        # production path: the FUSED device-resident front-end — one
        # dispatch per push, features never leave the device
        # (docs/PERF_STREAMING.md; tests/test_fused_frontend.py)
        fused_ext = FusedOnlineFeatureExtractor(ext)
        tx = StreamingTranscriber(
            fused_ext, model, params, mstate, _IdCoder(),
            num_labels, beam_width=1,
        )
        tx.reset(1)
        p50, p99, rtf = sweep(tx.push, samples)
        res[str(ms)] = {"p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
                        "rtf": round(rtf, 2)}
        # A/B: the unfused host-buffered front-end (the pre-r5 path, ~3
        # device syncs per push) through the same transcriber
        tx_u = StreamingTranscriber(
            OnlineFeatureExtractor(ext), model, params, mstate, _IdCoder(),
            num_labels, beam_width=1,
        )
        tx_u.reset(1)
        up50, _, urtf = sweep(tx_u.push, samples)
        unfused_res[str(ms)] = {"p50_ms": round(up50, 2), "rtf": round(urtf, 2)}
        # stage budget: the fused feature front-end alone on the same
        # chunks (encoder+search = total - features)
        fext = FusedOnlineFeatureExtractor(ext)
        fext.reset(1)
        fp50, _, _ = sweep(lambda c, l: fext.step(c, l), samples, warmup_pushes=4)
        feat_res[str(ms)] = round(fp50, 2)
        print(f"[bench] streaming conformer {ms}ms: p50 {p50:.1f}ms p99 {p99:.1f}ms "
              f"rtf {rtf:.2f} (fused features alone p50 {fp50:.1f}ms; "
              f"unfused path p50 {up50:.1f}ms rtf {urtf:.2f})", file=sys.stderr)
    results["conformer"] = res
    results["conformer_features_p50_ms"] = feat_res
    results["conformer_unfused_frontend"] = unfused_res
    # per-push device dispatches on the whole fused path: 1 (front-end)
    # + 1 (decoder step) — the docs/PERF_STREAMING.md target
    results["dispatches_per_push"] = 2

    # -- LSTM hybrid: feature chunks -> streaming likelihoods -------------
    o = 2000
    lstm = LSTM(RNNConfig(input_dim=nfilt, num_labels=o, num_layers=2,
                          hidden_units=512, bidirectional=False,
                          compute_dtype=jnp.bfloat16))
    lparams, lstate = lstm.init(jax.random.PRNGKey(1))
    prior = np.full((o,), 1.0 / o, np.float32)
    res = {}
    for ms in chunk_ms:
        frames = max(1, ms // 10)  # 10 ms winstep
        dec = OnlineRecurrentDecoder(lstm, lparams, lstate, prior)
        dec.reset(1)
        fchunk = rng.standard_normal((1, frames, nfilt)).astype(np.float32)
        flens = np.asarray([frames])
        # np.asarray: step returns an unsynced device array; serving reads
        # the likelihoods on host, so the honest latency includes it
        p50, p99, rtf = sweep(
            lambda c, l, d=dec, fc=fchunk, fl=flens: np.asarray(d.step(fc, fl)),
            rate * ms // 1000,
        )
        res[str(ms)] = {"p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
                        "rtf": round(rtf, 2)}
        print(f"[bench] streaming lstm hybrid {ms}ms: p50 {p50:.1f}ms "
              f"p99 {p99:.1f}ms rtf {rtf:.2f}", file=sys.stderr)
    results["lstm_hybrid"] = res

    # -- DNN hybrid: spliced lookahead emission ----------------------------
    cw = 5
    dnn = DNN(DNNConfig(input_dim=nfilt * (2 * cw + 1), num_labels=o,
                        num_hidden_layers=6, num_hidden_units=2048,
                        nonlin="relu", batch_norm=True,
                        compute_dtype=jnp.bfloat16))
    dparams, dstate = dnn.init(jax.random.PRNGKey(2))
    res = {}
    for ms in chunk_ms:
        frames = max(1, ms // 10)
        dec = OnlineSplicedDecoder(dnn, dparams, dstate, prior, cw)
        dec.reset(1)
        fchunk = rng.standard_normal((1, frames, nfilt)).astype(np.float32)
        flens = np.asarray([frames])
        p50, p99, rtf = sweep(
            lambda c, l, d=dec, fc=fchunk, fl=flens: d.step(fc, fl),
            rate * ms // 1000,
        )
        res[str(ms)] = {"p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
                        "rtf": round(rtf, 2)}
        print(f"[bench] streaming dnn hybrid {ms}ms: p50 {p50:.1f}ms "
              f"p99 {p99:.1f}ms rtf {rtf:.2f}", file=sys.stderr)
    results["dnn_hybrid"] = res
    return results


def bench_heldout_tpu() -> dict:
    """Held-out accuracy as a driver-visible metric (compact twin of
    tests/test_heldout_accuracy.py, which takes 10+ min in the full suite).

    Trains two small models through the production ``Nnet`` facade on the
    deterministic class-signature corpus (disjoint train/test speakers,
    tests/synthetic.py) and decodes the HELD-OUT split:

    - hybrid CE: framewise state accuracy from the log(post/prior) ark —
      the exact artifact Kaldi's WFST decode would consume (chance 20%)
    - character CTC: greedy CER (chance ~100%)

    A regression in any loss/decode/data seam shows up here as an accuracy
    drop in the round artifact, not just in CI. Thresholds mirror the CI
    gates (0.85 framewise / 0.15 CER)."""
    import pathlib
    import shutil
    import tempfile
    from configparser import ConfigParser

    from tests.synthetic import make_class_signature_corpus
    from tfkaldi_tpu.data import (
        AlignmentBatchDispenser,
        AlignmentCoder,
        FeatureReader,
        TextBatchDispenser,
        TextCoder,
    )
    from tfkaldi_tpu.data.target_normalizers import (
        aurora4_normalizer,
        identity_normalizer,
    )
    from tfkaldi_tpu.io import ArkReader, ArkWriter
    from tfkaldi_tpu.nnet import Nnet
    from tfkaldi_tpu.utils.wer import edit_distance

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="bench_heldout_"))
    try:
        train_dir, test_dir, info = make_class_signature_corpus(tmp, seed=11)
        num_labels = info["num_classes"]

        def base_cfg(**nnet_overrides):
            cfg = ConfigParser()
            cfg["directories"] = {"expdir": str(tmp / "exp")}
            nnet = {
                "name": "bench_heldout", "context_width": "0",
                "add_layer_period": "0", "starting_step": "0",
                "nonlin": "relu", "l2_norm": "False", "dropout": "1",
                "batch_norm": "False", "learning_rate_decay": "1",
                "numutterances_per_minibatch": "-1", "valid_batches": "0",
                "valid_frequency": "1000", "valid_adapt": "False",
                "valid_retries": "0", "check_freq": "1000",
                "visualise": "False",
            }
            nnet.update({k: str(v) for k, v in nnet_overrides.items()})
            cfg["nnet"] = nnet
            return cfg

        def reader(featdir, max_length, context_width=0):
            return FeatureReader(
                f"{featdir}/feats.scp", f"{featdir}/cmvn.scp",
                f"{featdir}/utt2spk", context_width, max_length,
            )

        # ---- hybrid CE: held-out framewise accuracy ----------------------
        ctx = 1
        cfg = base_cfg(
            name="bench_heldout_hybrid",
            context_width=ctx, num_hidden_units=64, num_hidden_layers=2,
            num_epochs=8, initial_learning_rate=0.01, batch_size=8,
        )
        dispenser = AlignmentBatchDispenser(
            reader(train_dir, info["train"]["max_length"], ctx),
            AlignmentCoder(identity_normalizer, num_labels),
            8, info["train"]["alifile"],
        )
        net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=num_labels)
        net.train(dispenser)
        out_scp = str(tmp / "likes.scp")
        writer = ArkWriter(out_scp, str(tmp / "likes.ark"))
        net.decode(reader(test_dir, info["test"]["max_length"], ctx), writer)
        prior = np.load(f"{net.savedir}/prior.npy")
        ark = ArkReader(out_scp)
        correct = total = 0
        for utt, truth in info["test"]["alignments"].items():
            log_likes = ark.read_utt(utt)
            pred = np.argmax(log_likes + np.log(prior)[None, :], axis=1)
            correct += int(np.sum(pred == truth))
            total += len(truth)
        acc = correct / total

        # ---- character CTC: held-out greedy CER --------------------------
        cfg = base_cfg(
            name="bench_heldout_ctc",
            loss="ctc", model="lstm", bidirectional="True",
            num_hidden_units=64, num_hidden_layers=1, num_epochs=60,
            initial_learning_rate=0.02, batch_size=16,
        )
        coder = TextCoder(aurora4_normalizer)
        dispenser = TextBatchDispenser(
            reader(train_dir, info["train"]["max_length"]), coder, 16,
            f"{train_dir}/text",
        )
        net = Nnet(cfg, input_dim=info["feat_dim"], num_labels=coder.num_labels)
        net.train(dispenser)
        hyp = str(tmp / "decoded.txt")
        net.decode_text(reader(test_dir, info["test"]["max_length"]), coder, hyp)
        errors = total_ref = 0
        with open(hyp) as f:
            for line in f:
                utt, _, text = line.rstrip("\n").partition(" ")
                ref = list(info["test"]["texts"][utt])
                toks = [t for t in text.split(" ")
                        if len(t) == 1 and "a" <= t <= "z"]
                subs, ins, dels, _ = edit_distance(ref, toks)
                errors += subs + ins + dels
                total_ref += len(ref)
        cer = errors / max(total_ref, 1)
        print(f"[bench] heldout: framewise acc {acc:.3f} (gate 0.85), "
              f"ctc greedy CER {cer:.3f} (gate 0.15)", file=sys.stderr)
        return {"framewise_acc": acc, "ctc_cer": cer}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_multistream_tpu() -> dict:
    """Multi-stream serving scaling: N streams share ONE batched program.

    ``serve.MultiStreamServer`` multiplexes N concurrent utterances onto
    the rows of one ``StreamingTranscriber`` (per-slot lifecycle:
    ``finish_rows``/``reset_rows``); this measures its device path —
    batched ``push`` on the flagship causal subsampled conformer-CTC,
    occupancy N = 1..64 with 160 ms chunks, plus the production
    conformer-s4 transducer at N = 16/64 — and reports aggregate RTF
    (audio seconds across ALL streams per wall second) and per-tick
    latency. The derived numbers (docs/PERF_STREAMING.md knee table):

    - ``realtime_ceiling``: the largest measured N whose tick p50 stays
      under the chunk period — past it the engine cannot keep N live
      streams fed, whatever the RTF says. This is what sizes
      ``MultiStreamServer.DEFAULT_SLOTS``.
    - aggregate RTF keeps growing past the ceiling (per-tick cost is a
      fixed dispatch floor + a staging term linear in N, not device
      compute), so batch-oriented callers can run N≫ceiling.

    Per-tick latencies cross the sandbox's host<->device tunnel (metric
    tagged ``staging: tunnel``): the floor is the tunnel RTT and the
    slope the tunnel MB/s, so the ceiling here is a LOWER bound on real
    hardware. ``aggregate_rtf_p50`` (n·chunk/p50) is reported alongside
    the wall-clock RTF because shared-sandbox stalls contaminate the
    mean but not the median.
    """
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.decode.online import StreamingTranscriber
    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
    from tfkaldi_tpu.frontend.online import FusedOnlineFeatureExtractor
    from tfkaldi_tpu.models import Transformer, TransformerConfig
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig

    rate = 16000
    nfilt = 40
    chunk_ms = 160
    chunk_samples = rate * chunk_ms // 1000
    rng = np.random.default_rng(0)

    class _IdCoder:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    num_labels = 29

    def make_ext():
        return FeatureExtractor(
            FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=nfilt,
                        nfft=512),
            rate,
        )

    def make_ctc():
        model = Transformer(TransformerConfig(
            input_dim=nfilt, num_labels=num_labels + 1, num_blocks=12,
            d_model=256, num_heads=4, ffn_dim=1024, conformer=True,
            conv_kernel=15, causal_conv=True, left_context=64,
            right_context=0, subsample=4, compute_dtype=jnp.bfloat16,
        ))
        params, mstate = model.init(jax.random.PRNGKey(0))
        return StreamingTranscriber(
            FusedOnlineFeatureExtractor(make_ext()), model, params, mstate,
            _IdCoder(), num_labels, beam_width=1,
        )

    def make_rnnt():
        # config_AURORA4_transducer.cfg [nnet], greedy decode
        extra = {
            "num_blocks": "12", "d_model": "256", "num_heads": "4",
            "ffn_dim": "1024", "conv_kernel": "15", "subsample": "4",
            "attention_left_context": "64", "attention_right_context": "0",
            "causal_conv": "True", "compute_dtype": "bfloat16",
        }
        model = Transducer(TransducerConfig(
            input_dim=nfilt, num_labels=num_labels, enc_type="conformer",
            pred_layers=1, pred_units=320, embed_dim=128, joint_units=320,
            enc_extra=tuple(extra.items()),
        ))
        params, state = model.init(jax.random.PRNGKey(1))
        return StreamingTransducerTranscriber(
            FusedOnlineFeatureExtractor(make_ext()), model, params, state,
            _IdCoder(),
        )

    def sweep(tag, make_tx, occupancies, n_chunks=48):
        out: dict[str, dict] = {}
        for n in occupancies:
            tx = make_tx()
            tx.reset(n)
            chunk = (rng.standard_normal((n, chunk_samples)) * 1000).astype(
                np.float32)
            lens = np.full((n,), chunk_samples)
            for _ in range(8):  # compile all bucket shapes
                tx.push(chunk, lens)
            lat = np.empty(n_chunks)
            t_start = time.perf_counter()
            for i in range(n_chunks):
                t0 = time.perf_counter()
                tx.push(chunk, lens)
                lat[i] = time.perf_counter() - t0
            wall = time.perf_counter() - t_start
            agg_rtf = n * (n_chunks * chunk_samples / rate) / wall
            p50 = float(np.percentile(lat, 50) * 1e3)
            out[str(n)] = {
                "aggregate_rtf": round(float(agg_rtf), 2),
                "aggregate_rtf_p50": round(n * chunk_ms / p50, 2),
                "p50_ms": round(p50, 2),
                "p99_ms": round(float(np.percentile(lat, 99) * 1e3), 2),
                "realtime_ok": bool(p50 < chunk_ms),
            }
            print(f"[bench] multistream {tag} n={n}: aggregate rtf "
                  f"{agg_rtf:.1f} p50 {p50:.1f}ms",
                  file=sys.stderr)
        return out

    def ceiling(table):
        ok = [int(k) for k, v in table.items() if v["realtime_ok"]]
        return max(ok) if ok else 0

    ctc = sweep("conformer", make_ctc, (1, 4, 16, 32, 64))
    rnnt = sweep("transducer", make_rnnt, (16, 64))
    results = dict(ctc)
    results["transducer"] = rnnt
    results["realtime_ceiling"] = ceiling(ctc)
    results["realtime_ceiling_transducer"] = ceiling(rnnt)
    results["chunk_ms"] = chunk_ms
    return results


def bench_reference_proxy() -> float:
    """Numpy float32 fwd+bwd of the same MLP on one microbatch, extrapolated.

    Models the compute the reference pays per microbatch step (relu MLP
    forward, softmax CE backward), charged at host-BLAS speed.
    """
    rng = np.random.default_rng(1)
    t_small = 128  # keep the proxy measurement cheap; per-frame cost is flat
    n = MICRO * t_small
    x = rng.standard_normal((n, F)).astype(np.float32)
    y = rng.integers(0, O, n)
    ws = [rng.standard_normal((F, H)).astype(np.float32) * 0.03] + [
        rng.standard_normal((H, H)).astype(np.float32) * 0.02 for _ in range(L - 1)
    ]
    wo = rng.standard_normal((H, O)).astype(np.float32) * 0.02

    def fwd_bwd():
        acts = [x]
        h = x
        for w in ws:
            h = np.maximum(h @ w, 0)
            acts.append(h)
        logits = h @ wo
        p = np.exp(logits - logits.max(1, keepdims=True))
        p /= p.sum(1, keepdims=True)
        d = p
        d[np.arange(n), y] -= 1
        gwo = acts[-1].T @ d
        dh = d @ wo.T
        for i in range(L - 1, -1, -1):
            dz = dh * (acts[i + 1] > 0)
            _gw = acts[i].T @ dz
            dh = dz @ ws[i].T
        return gwo

    fwd_bwd()  # warm BLAS
    dt = float("inf")
    for _ in range(3):  # best-of-3, same policy as the TPU side
        t0 = time.perf_counter()
        fwd_bwd()
        dt = min(dt, time.perf_counter() - t0)
    fps = n / dt
    print(
        f"[bench] reference proxy (numpy BLAS): {dt:.3f}s per {n}-frame microbatch "
        f"-> {fps:,.0f} frames/s",
        file=sys.stderr,
    )
    return fps


def main() -> None:
    # the sandbox TPU tunnel occasionally wedges transiently
    # (FailedPrecondition); retry so a blip doesn't zero the recorded metric
    last_err = None
    for attempt in range(3):
        try:
            ours = bench_tpu()
            break
        except Exception as e:  # pragma: no cover - transient backend faults
            last_err = e
            print(f"[bench] attempt {attempt + 1} failed: {e}", file=sys.stderr)
            time.sleep(120)
    else:
        raise last_err

    # feature-extraction gate (BASELINE.md: >=10x the reference's
    # per-utterance loop). Non-fatal: the headline train metric still
    # prints if the feature bench hits a transient backend fault.
    feat_line = None
    try:
        feat_ours = bench_features_tpu()
        feat_ref = bench_features_reference_proxy()
        feat_line = {
            "metric": "feature_throughput",
            "value": round(feat_ours, 1),
            "unit": "frames/sec",
            "vs_baseline": round(feat_ours / feat_ref, 2),
        }
        print(json.dumps(feat_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] feature bench failed: {e}", file=sys.stderr)

    # LSTM train throughput (no reference counterpart — its sequence path
    # never worked; vs_baseline is vs our own round-1 measurement).
    # Non-fatal like the feature bench.
    lstm_line = None
    try:
        lstm_fps = bench_lstm_tpu()
        lstm_line = {
            "metric": "lstm_train_throughput",
            "value": round(lstm_fps, 1),
            "unit": "frames/sec",
            "vs_baseline": round(lstm_fps / LSTM_BASELINE["value"], 2),
            "baseline": LSTM_BASELINE,  # provenance: auditable, never silently stale
        }
        print(json.dumps(lstm_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] lstm bench failed: {e}", file=sys.stderr)

    # GRU family (beyond the reference, like the LSTM; the ratio is vs the
    # same-process LSTM step on the identical shape — i.e. the cell-choice
    # speedup). Non-fatal.
    gru_line = None
    try:
        gru_fps = bench_gru_tpu()
        if lstm_line is not None:
            base = {"value": lstm_line["value"],
                    "source": "same-process LSTM step (identical 32x256 2xBi-512 shape)"}
        else:
            base = dict(LSTM_BASELINE)
        gru_line = {
            "metric": "gru_train_throughput",
            "value": round(gru_fps, 1),
            "unit": "frames/sec",
            "vs_baseline": round(gru_fps / base["value"], 2),
            "baseline": base,
        }
        print(json.dumps(gru_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] gru bench failed: {e}", file=sys.stderr)

    # TDNN family (beyond the reference — no counterpart exists; the
    # ratio is vs this round's DNN step measured in the same process,
    # i.e. the cost of the time-delay splices). Non-fatal.
    tdnn_line = None
    try:
        tdnn_fps = bench_tdnn_tpu()
        tdnn_line = {
            "metric": "tdnn_train_throughput",
            "value": round(tdnn_fps, 1),
            "unit": "frames/sec",
            "vs_baseline": round(tdnn_fps / ours, 2),
            "baseline": {
                "value": round(ours, 1),
                "source": "same-process flagship DNN step (no reference TDNN exists)",
            },
        }
        print(json.dumps(tdnn_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] tdnn bench failed: {e}", file=sys.stderr)

    # CNN family (beyond the reference — no counterpart exists; ratio vs
    # the same-process DNN step, like the TDNN line). Non-fatal.
    cnn_line = None
    try:
        cnn_fps = bench_cnn_tpu()
        cnn_line = {
            "metric": "cnn_train_throughput",
            "value": round(cnn_fps, 1),
            "unit": "frames/sec",
            "vs_baseline": round(cnn_fps / ours, 2),
            "baseline": {
                "value": round(ours, 1),
                "source": "same-process flagship DNN step (no reference CNN exists)",
            },
        }
        print(json.dumps(cnn_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] cnn bench failed: {e}", file=sys.stderr)

    # Conformer family (beyond the reference — no counterpart exists;
    # ratio vs the same-process LSTM step, the sequence family it
    # supersedes in modern recipes). Non-fatal.
    conformer_line = None
    try:
        conf_fps = bench_conformer_tpu()
        if lstm_line is not None:
            conf_base = {"value": lstm_line["value"],
                         "source": "same-process LSTM step (the sequence family conformers replace)"}
        else:
            conf_base = dict(LSTM_BASELINE)
        conformer_line = {
            "metric": "conformer_train_throughput",
            "value": round(conf_fps, 1),
            "unit": "frames/sec",
            "vs_baseline": round(conf_fps / conf_base["value"], 2),
            "baseline": conf_base,
        }
        print(json.dumps(conformer_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] conformer bench failed: {e}", file=sys.stderr)

    # Conformer-CTC with the 4x stacking front-end (the production CTC
    # recipe); ratio vs the same model at 1:1 frame rate, in-process.
    # Non-fatal.
    conformer_ctc_line = None
    try:
        cc = bench_conformer_ctc_tpu()
        conformer_ctc_line = {
            "metric": "conformer_ctc_train_throughput",
            "value": round(cc["sub4_fps"], 1),
            "unit": "frames/sec",
            "vs_baseline": round(cc["sub4_fps"] / cc["sub1_fps"], 2),
            "baseline": {
                "value": round(cc["sub1_fps"], 1),
                "source": "same-process conformer-CTC at subsample=1 (identical model otherwise)",
            },
        }
        print(json.dumps(conformer_ctc_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] conformer-ctc bench failed: {e}", file=sys.stderr)

    # decode-emission throughput (reference structure = batch-1 dispatches;
    # the ratio is the batching win). Non-fatal.
    decode_line = None
    try:
        dec = bench_decode_tpu()
        decode_line = {
            "metric": "decode_throughput",
            "value": round(dec["batched_fps"], 1),
            "unit": "frames/sec",
            "vs_baseline": round(dec["batched_fps"] / dec["batch1_fps"], 2),
            "baseline": {
                "value": round(dec["batch1_fps"], 1),
                "source": "same-process batch-1 dispatch loop (reference decodes one utt per session.run, nnet.py:270-286)",
            },
        }
        print(json.dumps(decode_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] decode bench failed: {e}", file=sys.stderr)

    # CTC train step (flagship sequence config; reference counterpart is
    # broken so the ratio is vs the same-process CE step). Non-fatal.
    ctc_line = None
    try:
        ctc = bench_ctc_tpu()
        ctc_line = {
            "metric": "ctc_train_throughput",
            "value": round(ctc["ctc_fps"], 1),
            "unit": "frames/sec",
            "vs_baseline": round(ctc["ctc_fps"] / ctc["ce_fps"], 2),
            "baseline": {
                "value": round(ctc["ce_fps"], 1),
                "source": "same-process CE step on the same 2xBiLSTM-512 (reference CTC is broken, trainer.py:533-570)",
            },
        }
        print(json.dumps(ctc_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] ctc bench failed: {e}", file=sys.stderr)

    # RNN-T train step (beyond the reference — no transduction path exists;
    # ratio vs the same-encoder CTC step in the same process). Non-fatal.
    rnnt_line = None
    try:
        rn = bench_rnnt_tpu()
        rnnt_line = {
            "metric": "rnnt_train_throughput",
            "value": round(rn["rnnt_fps"], 1),
            "unit": "frames/sec",
            "vs_baseline": round(rn["rnnt_fps"] / rn["ctc_fps"], 2),
            "baseline": {
                "value": round(rn["ctc_fps"], 1),
                "source": "same-process CTC step on the same unidirectional 2xLSTM-512 encoder (no reference transducer exists)",
            },
            # pruned (banded) lattice loss A/B (rnnt_prune_s,
            # ops/rnnt_loss.py; docs/PERF_RNNT_STEP.md)
            "pruned": {
                "s": rn["pruned_s"],
                "diagonal_fps": round(rn["pruned_diagonal_fps"], 1),
                "guided_fps": round(rn["pruned_guided_fps"], 1),
                "diagonal_speedup": round(rn["pruned_diagonal_speedup"], 2),
                "guided_speedup": round(rn["pruned_guided_speedup"], 2),
                # b=128: the batch where the lattice term dominates and the
                # band's FLOP cut pays fully (dense RNN-T is flat in batch,
                # docs/PERF_BATCH_SCALING.md — pruning unlocks the scaling)
                "b128_dense_fps": round(rn["b128_dense_fps"], 1),
                "b128_diagonal_fps": round(rn["b128_pruned_diagonal_fps"], 1),
                "b128_guided_fps": round(rn["b128_pruned_guided_fps"], 1),
                "b128_diagonal_speedup": round(
                    rn["b128_pruned_diagonal_speedup"], 2),
                "b128_guided_speedup": round(
                    rn["b128_pruned_guided_speedup"], 2),
            },
        }
        print(json.dumps(rnnt_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] rnnt bench failed: {e}", file=sys.stderr)

    attention_line = None
    try:
        at = bench_attention_tpu()
        attention_line = {
            "metric": "attention_train_throughput",
            "value": round(at["attention_fps"], 1),
            "unit": "frames/sec",
            "vs_baseline": round(at["attention_fps"] / at["ctc_fps"], 2),
            "baseline": {
                "value": round(at["ctc_fps"], 1),
                "source": "same-process conformer-CTC step on the same 12-block subsample-4 encoder (no reference attention model exists)",
            },
        }
        print(json.dumps(attention_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] attention bench failed: {e}", file=sys.stderr)

    # streaming serving latency/RTF (beyond the reference — it has no
    # online story; the implied comparison point is its batch-1 decode
    # loop, nnet.py:270-286). Non-fatal.
    try:
        st = bench_streaming_tpu()
        for key, metric in (("conformer", "streaming_rtf"),
                            ("lstm_hybrid", "streaming_rtf_lstm_hybrid"),
                            ("dnn_hybrid", "streaming_rtf_dnn_hybrid")):
            line = {
                "metric": metric,
                # headline value: RTF at the 160 ms serving chunk
                "value": st[key]["160"]["rtf"],
                "unit": "x realtime (batch 1)",
                "vs_baseline": st[key]["160"]["rtf"],  # >1 = faster than live audio
                "chunks_ms": st[key],
                # per-chunk latencies cross the sandbox's high-latency
                # host<->device tunnel; see bench_streaming_tpu docstring
                "staging": "tunnel",
            }
            if key == "conformer":
                line["features_p50_ms"] = st["conformer_features_p50_ms"]
            print(json.dumps(line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] streaming bench failed: {e}", file=sys.stderr)

    # multi-stream serving scaling: N concurrent streams through ONE
    # batched transcriber (serve.MultiStreamServer's device path);
    # vs_baseline = aggregate-RTF ratio N=16 vs N=1 (the batching win
    # over one-utterance-per-program serving). Non-fatal.
    try:
        ms = bench_multistream_tpu()
        occ = {k: v for k, v in ms.items() if k.isdigit()}
        line = {
            "metric": "multistream_serving_rtf",
            "value": ms["16"]["aggregate_rtf"],
            "unit": "x realtime aggregate (16 streams)",
            "vs_baseline": round(
                ms["16"]["aggregate_rtf"] / ms["1"]["aggregate_rtf"], 2
            ),
            "baseline": {
                "value": ms["1"]["aggregate_rtf"],
                "source": "same transcriber at occupancy 1 (the reference serves one utterance per batch-1 graph, decoder.py:8-47)",
            },
            "occupancy": occ,
            "occupancy_transducer": ms["transducer"],
            "chunk_ms": ms["chunk_ms"],
            # largest measured N whose tick p50 beats the chunk period —
            # sizes serve.MultiStreamServer.DEFAULT_SLOTS (knee table in
            # docs/PERF_STREAMING.md); tunnel-bound, so a LOWER bound on
            # real hardware
            "realtime_ceiling": ms["realtime_ceiling"],
            "realtime_ceiling_transducer": ms["realtime_ceiling_transducer"],
            "staging": "tunnel",
        }
        print(json.dumps(line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] multistream bench failed: {e}", file=sys.stderr)

    # held-out accuracy trend: the round artifact carries generalization
    # evidence alongside throughput (compact twin of the CI gates)
    try:
        ho = bench_heldout_tpu()
        print(json.dumps({
            "metric": "heldout_framewise_acc",
            "value": round(ho["framewise_acc"], 4),
            "unit": "fraction correct (held-out speakers)",
            "vs_baseline": round(ho["framewise_acc"] / 0.85, 2),
            "baseline": {
                "value": 0.85,
                "source": "CI gate, tests/test_heldout_accuracy.py (chance 0.20)",
            },
        }))
        print(json.dumps({
            "metric": "heldout_cer_ctc",
            "value": round(ho["ctc_cer"], 4),
            "unit": "CER (held-out speakers, greedy)",
            # <1 is better-than-gate (inverted: gate/value)
            "vs_baseline": round(0.15 / max(ho["ctc_cer"], 1e-4), 2),
            "baseline": {
                "value": 0.15,
                "source": "CI gate, tests/test_heldout_accuracy.py (chance ~1.0)",
            },
        }))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] heldout bench failed: {e}", file=sys.stderr)

    ref = bench_reference_proxy()

    # input-inclusive end-to-end metric (the production native-loader path);
    # non-fatal like the other secondary metrics
    e2e_line = None
    try:
        e2e = bench_e2e_train()
        e2e_line = {
            "metric": "e2e_train_throughput",
            "value": round(e2e["e2e_fps"], 1),
            "unit": "frames/sec",
            "vs_baseline": round(e2e["e2e_fps"] / ref, 2),
            "input_native_fps": round(e2e["input_native_fps"], 1),
            "input_native_cv": round(e2e["input_native_cv"], 3),
            "input_python_fps": round(e2e["input_python_fps"], 1),
            # machine-readable caveat: in this sandbox the host<->device link
            # is a ~10 MB/s tunnel, so this number measures staging, not the
            # device. On a real TPU host it is bounded by the input pipeline.
            # The calibration fields make cross-round swings interpretable:
            # if value ~ staging_bound_fps, the link (not the framework) is
            # the binding constraint that round (docs/PERF_E2E.md).
            "staging": "tunnel",
            "staging_mbps": round(e2e["staging_mbps"], 1),
            "staging_bound_fps": round(e2e["staging_bound_fps"], 1),
            "trial_cv": round(e2e["e2e_cv"], 3),
            "best_fps": round(e2e["e2e_best_fps"], 1),
        }
        print(json.dumps(e2e_line))
    except Exception as e:  # pragma: no cover - transient backend faults
        print(f"[bench] e2e bench failed: {e}", file=sys.stderr)
    # Re-emit the round's verdict-gate number compactly near the END so it
    # survives the driver's ~2000-char tail capture (the full rnnt line
    # prints mid-stream and scrolls out of the window).
    if rnnt_line is not None:
        pruned = rnnt_line["pruned"]
        print(json.dumps({
            "metric": "rnnt_pruned_speedup",
            "value": pruned["b128_diagonal_speedup"],
            "unit": "x dense train step (b=128, S=16 of U+1=65)",
            "vs_baseline": pruned["b128_diagonal_speedup"],
            "guided": pruned["b128_guided_speedup"],
            "b32_diagonal": pruned["diagonal_speedup"],
            "recipe": "shipped conformer-s4 recipe enables S=16 diagonal "
                      "(1.20x at its own shape, docs/PERF_RNNT_STEP.md)",
        }))
    # Every secondary metric already printed as its own line above. The
    # headline prints LAST and stays compact (<500 chars) so the driver's
    # tail capture always parses it (round 3's nested-"extra" headline
    # exceeded the capture window and was recorded as parsed=null).
    headline = {
        "metric": "dnn_train_throughput",
        "value": round(ours, 1),
        "unit": "frames/sec",
        "vs_baseline": round(ours / ref, 2),
    }
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
