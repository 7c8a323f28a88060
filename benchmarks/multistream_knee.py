"""Multi-stream occupancy knee sweep — where does the shared batch saturate?

Sweeps ``MultiStreamServer``'s device path (batched ``push`` on a
``StreamingTranscriber`` / ``StreamingTransducerTranscriber``) over
occupancy N on the real chip, for the two shipped production streaming
stacks (config/config_AURORA4_{ctc,transducer}.cfg — conformer-s4
12x256):

- aggregate RTF (audio seconds across ALL streams per wall second): the
  capacity number. Flattening = MXU/VPU saturation.
- per-tick p50/p99 vs the chunk period: once p50 crosses the period the
  server can no longer keep N real-time streams fed, whatever the RTF
  says — that is the hard occupancy ceiling for live traffic.

The derived default/max slots land in ``serve.MultiStreamServer`` and
docs/PERF_STREAMING.md. Run:  python benchmarks/multistream_knee.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

RATE = 16000
NFILT = 40
CHUNK_MS = 160
CHUNK = RATE * CHUNK_MS // 1000
NUM_LABELS = 29


class _IdCoder:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def _make_ext():
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts

    return FeatureExtractor(
        FeatureOpts(feature_type="fbank", dynamic="nodelta", nfilt=NFILT,
                    nfft=512),
        RATE,
    )


def make_ctc_tx():
    import jax
    import jax.numpy as jnp

    from tfkaldi_tpu.decode.online import StreamingTranscriber
    from tfkaldi_tpu.frontend.online import FusedOnlineFeatureExtractor
    from tfkaldi_tpu.models import Transformer, TransformerConfig

    model = Transformer(TransformerConfig(
        input_dim=NFILT, num_labels=NUM_LABELS + 1, num_blocks=12,
        d_model=256, num_heads=4, ffn_dim=1024, conformer=True,
        conv_kernel=15, causal_conv=True, left_context=64, right_context=0,
        subsample=4, compute_dtype=jnp.bfloat16,
    ))
    params, mstate = model.init(jax.random.PRNGKey(0))
    return StreamingTranscriber(
        FusedOnlineFeatureExtractor(_make_ext()), model, params, mstate,
        _IdCoder(), NUM_LABELS, beam_width=1,
    )


def make_transducer_tx():
    import jax

    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber
    from tfkaldi_tpu.frontend.online import FusedOnlineFeatureExtractor
    from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig

    # config_AURORA4_transducer.cfg [nnet] verbatim (decode: greedy)
    extra = {
        "num_blocks": "12", "d_model": "256", "num_heads": "4",
        "ffn_dim": "1024", "conv_kernel": "15", "subsample": "4",
        "attention_left_context": "64", "attention_right_context": "0",
        "causal_conv": "True", "compute_dtype": "bfloat16",
    }
    model = Transducer(TransducerConfig(
        input_dim=NFILT, num_labels=NUM_LABELS, enc_type="conformer",
        pred_layers=1, pred_units=320, embed_dim=128, joint_units=320,
        enc_extra=tuple(extra.items()),
    ))
    params, state = model.init(jax.random.PRNGKey(1))
    return StreamingTransducerTranscriber(
        FusedOnlineFeatureExtractor(_make_ext()), model, params, state,
        _IdCoder(),
    )


def sweep(name: str, make_tx, occupancies, n_chunks: int = 60) -> dict:
    rng = np.random.default_rng(0)
    out: dict[str, dict] = {}
    for n in occupancies:
        tx = make_tx()
        try:
            tx.reset(n)
            chunk = (rng.standard_normal((n, CHUNK)) * 1000).astype(np.float32)
            lens = np.full((n,), CHUNK)
            for _ in range(8):  # compile all bucket shapes
                tx.push(chunk, lens)
            lat = np.empty(n_chunks)
            t_start = time.perf_counter()
            for i in range(n_chunks):
                t0 = time.perf_counter()
                tx.push(chunk, lens)
                lat[i] = time.perf_counter() - t0
            wall = time.perf_counter() - t_start
        except Exception as exc:  # OOM at high N is a result, not a failure
            out[str(n)] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"[knee] {name} n={n}: FAILED {type(exc).__name__}",
                  file=sys.stderr)
            continue
        agg_rtf = n * (n_chunks * CHUNK / RATE) / wall
        row = {
            "aggregate_rtf": round(float(agg_rtf), 2),
            "p50_ms": round(float(np.percentile(lat, 50) * 1e3), 2),
            "p99_ms": round(float(np.percentile(lat, 99) * 1e3), 2),
            "realtime_ok": bool(np.percentile(lat, 50) * 1e3 < CHUNK_MS),
        }
        out[str(n)] = row
        print(f"[knee] {name} n={n}: agg_rtf {agg_rtf:.1f} "
              f"p50 {row['p50_ms']:.1f}ms p99 {row['p99_ms']:.1f}ms",
              file=sys.stderr)
    return out


def main():
    occ = (1, 4, 16, 32, 64, 128)
    results = {
        "chunk_ms": CHUNK_MS,
        "ctc_conformer_s4": sweep("ctc", make_ctc_tx, occ),
        "transducer_conformer_s4": sweep("rnnt", make_transducer_tx, occ),
    }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
