"""Per-chip batch-size scaling sweep for the sequence families.

Every sequence bench in bench.py was pinned at the reference-era batch
of 32 utterances; the LSTM's documented 71% M-dimension tile-underfill
tax (docs/PERF_LSTM_STEP.md) and the conformer doc's own "larger
per-chip batches" pointer both predict wins from batch scaling. This
harness measures frames/s at per-chip batch 32 -> 64 -> 128 for:

  lstm       2xBiLSTM-512 CE                 (32x256 reference shape)
  gru        2xBiGRU-512 CE
  conformer1 12-block conformer CE, 1:1      (T=512)
  conformer4 12-block conformer-CTC, sub4    (T=512 input frames)
  rnnt       2xLSTM-512 enc transducer       (T=256, U=64)
  conf_rnnt4 causal conformer-s4 transducer  (config_AURORA4_transducer.cfg
             shapes: 12x256 enc, L64/R0, pred 1x320, joint 320; T=512 U=64)
  conf_attn4 conformer-s4 + 4-block decoder  (config_AURORA4_attention.cfg
             shapes, joint CTC 0.3 + attention CE; T=512 U=64)

One process, interleaved best-of-trials per (family, batch). OOM at a
batch size is recorded as such, not fatal.

Run on the TPU:  python benchmarks/batch_sweep.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import (
    GRU,
    LSTM,
    RNNConfig,
    AttentionSeq2Seq,
    Seq2SeqConfig,
    Transducer,
    TransducerConfig,
    Transformer,
    TransformerConfig,
)
from tfkaldi_tpu.train import Trainer, TrainerConfig

F, O = 440, 2000
V = 40  # CTC/transducer charset-sized vocab
BATCHES = (32, 64, 128)
STEPS, TRIALS = 10, 3


def ce_batch(rng, b, t, f, o):
    return PaddedBatch(
        jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)),
        jnp.asarray(rng.integers(0, o, (b, t)).astype(np.int32)),
        jnp.full((b,), t, jnp.int32),
        jnp.full((b,), t, jnp.int32),
    )


def text_batch(rng, b, t, f, l_max):
    return PaddedBatch(
        jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)),
        jnp.asarray(rng.integers(0, V - 1, (b, l_max)).astype(np.int32)),
        jnp.full((b,), t, jnp.int32),
        jnp.full((b,), l_max, jnp.int32),
    )


def build(family, b):
    rng = np.random.default_rng(0)
    if family == "lstm" or family == "gru":
        t = 256
        cell = LSTM if family == "lstm" else GRU
        model = cell(RNNConfig(input_dim=F, num_labels=O, num_layers=2,
                               hidden_units=512, bidirectional=True,
                               compute_dtype=jnp.bfloat16))
        trainer = Trainer(model, TrainerConfig(num_steps=1000))
        batch = ce_batch(rng, b, t, F, O)
        frames = b * t
    elif family == "conformer1":
        t = 512
        model = Transformer(TransformerConfig(
            input_dim=40, num_labels=O, num_blocks=12, d_model=256,
            num_heads=4, ffn_dim=1024, conformer=True, conv_kernel=15,
            compute_dtype=jnp.bfloat16))
        trainer = Trainer(model, TrainerConfig(num_steps=1000))
        batch = ce_batch(rng, b, t, 40, O)
        frames = b * t
    elif family == "conformer4":
        t = 512
        model = Transformer(TransformerConfig(
            input_dim=40, num_labels=V, num_blocks=12, d_model=256,
            num_heads=4, ffn_dim=1024, conformer=True, conv_kernel=15,
            subsample=4, compute_dtype=jnp.bfloat16))
        trainer = Trainer(model, TrainerConfig(
            num_steps=1000, loss_type="ctc", ctc_blank_id=V - 1))
        batch = text_batch(rng, b, t, 40, 64)
        frames = b * t
    elif family == "rnnt":
        t, u = 256, 64
        model = Transducer(TransducerConfig(
            input_dim=F, num_labels=V - 1, enc_type="lstm", enc_layers=2,
            enc_units=512, pred_layers=1, pred_units=320, embed_dim=128,
            joint_units=320, compute_dtype=jnp.bfloat16))
        trainer = Trainer(model, TrainerConfig(
            num_steps=1000, loss_type="rnnt"))
        batch = text_batch(rng, b, t, F, u)
        frames = b * t
    elif family == "conf_rnnt4":
        # the shipped config_AURORA4_transducer.cfg recipe shapes
        t, u = 512, 64
        model = Transducer(TransducerConfig(
            input_dim=40, num_labels=V - 1, enc_type="conformer",
            pred_layers=1, pred_units=320, embed_dim=128, joint_units=320,
            compute_dtype=jnp.bfloat16,
            enc_extra=(
                ("num_blocks", "12"), ("d_model", "256"),
                ("num_heads", "4"), ("ffn_dim", "1024"),
                ("conv_kernel", "15"), ("subsample", "4"),
                ("attention_left_context", "64"),
                ("attention_right_context", "0"),
                ("causal_conv", "True"),
            )))
        trainer = Trainer(model, TrainerConfig(
            num_steps=1000, loss_type="rnnt"))
        batch = text_batch(rng, b, t, 40, u)
        frames = b * t
    elif family == "conf_attn4":
        # the shipped config_AURORA4_attention.cfg recipe shapes
        t, u = 512, 64
        model = AttentionSeq2Seq(Seq2SeqConfig(
            input_dim=40, num_labels=V - 1, enc_type="conformer",
            dec_blocks=4, d_model=256, num_heads=4, ffn_dim=1024,
            label_smoothing=0.1, ctc_weight=0.3,
            compute_dtype=jnp.bfloat16,
            enc_extra=(
                ("num_blocks", "12"), ("d_model", "256"),
                ("num_heads", "4"), ("ffn_dim", "1024"),
                ("conv_kernel", "15"), ("subsample", "4"),
            )))
        trainer = Trainer(model, TrainerConfig(
            num_steps=1000, loss_type="attention"))
        batch = text_batch(rng, b, t, 40, u)
        frames = b * t
    else:
        raise ValueError(family)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state, batch, frames


def main():
    results = {}
    import sys
    families = sys.argv[1:] or ["lstm", "gru", "conformer1", "conformer4",
                                "rnnt", "conf_rnnt4", "conf_attn4"]
    for family in families:
        results[family] = {}
        for b in BATCHES:
            try:
                trainer, st, batch, frames = build(family, b)
                st, loss = trainer.update(st, batch)
                _ = float(loss)
                best = float("inf")
                for _ in range(TRIALS):
                    t0 = time.perf_counter()
                    for _ in range(STEPS):
                        st, loss = trainer.update(st, batch)
                    _ = float(loss)
                    best = min(best, (time.perf_counter() - t0) / STEPS)
                fps = frames / best
                results[family][b] = (best * 1e3, fps)
                print(f"{family:11s} b={b:4d}: {best * 1e3:7.2f} ms/step "
                      f"{fps:12,.0f} frames/s")
            except Exception as e:
                results[family][b] = ("OOM/err", str(e)[:120])
                print(f"{family:11s} b={b:4d}: FAILED {str(e)[:120]}")
            # free the arm before the next batch size (donated buffers)
            trainer = st = batch = None

    print("\nscaling vs b=32:")
    for family, row in results.items():
        base = row.get(32)
        if not base or not isinstance(base[0], float):
            continue
        scal = {
            b: round(v[1] / base[1], 2)
            for b, v in row.items() if isinstance(v[0], float)
        }
        print(f"  {family:11s} {scal}")


if __name__ == "__main__":
    main()
