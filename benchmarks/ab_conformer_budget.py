"""Deletion-A/B stage budget for the 1:1 conformer train step.

Round-3 left the step's non-matmul ~32 ms attributed by arithmetic
("LayerNorms + softmax + residual traffic"); this harness measures it the
way docs/PERF_DNN_STEP.md set the house standard: one process, one arm
per DELETED stage, interleaved best-of-trials. Each arm removes exactly
one stage (numerics intentionally change — these are timing probes, not
equivalence arms); base minus arm = that stage's scheduled cost,
including the fusion/HBM interactions a flops model can't see.

Arms:
  base        — committed models/transformer.py step
  no_ln       — all LayerNorms bypassed (6/block + final)
  bf16_smax   — softmax computed in bf16 (halves score-tensor traffic)
  linear_attn — softmax deleted entirely (scores scaled+masked to 0,
                context matmul kept): exp/sum/div + f32->bf16 cast cost
  no_conv     — conformer conv module deleted (GLU+depthwise+BN+swish
                + 2 pointwise matmuls)
  no_macaron  — first FFN of the macaron pair deleted
  no_attn     — whole attention sublayer deleted (QKV/scores/context/out)
  fwd_bwd     — value_and_grad of the same frame-CE loss, no Adam/clip
                (base - fwd_bwd = optimizer + clip + frame averaging)
  fwd         — forward-only apply (train=True statistics, no grad)

Run on the TPU:  python benchmarks/ab_conformer_budget.py [B] [T]
"""

import sys
import time
import types

import jax
import jax.numpy as jnp
import numpy as np

import tfkaldi_tpu.models.transformer as tfm
from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import Transformer, TransformerConfig
from tfkaldi_tpu.train import Trainer, TrainerConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
T = int(sys.argv[2]) if len(sys.argv) > 2 else 512
F, O = 40, 2000
STEPS, TRIALS = 10, 4


def _attention_bf16_softmax(self, hq, hkv, blk, key_valid, rel_mask, dtype):
    cfg = self.config
    b, tq, d = hq.shape
    tk = hkv.shape[1]
    nh, dh = cfg.num_heads, d // cfg.num_heads
    a = blk["attn"]
    q = tfm._dense(hq, a["wq"], a["bq"], dtype).reshape(b, tq, nh, dh)
    k = tfm._dense(hkv, a["wk"], a["bk"], dtype).reshape(b, tk, nh, dh)
    v = tfm._dense(hkv, a["wv"], a["bv"], dtype).reshape(b, tk, nh, dh)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=dtype
    ) * (1.0 / np.sqrt(dh))
    mask = key_valid[:, None, None, :] & rel_mask[None, None, :, :]
    scores = jnp.where(mask, scores, jnp.asarray(-1e4, dtype))
    attn = jax.nn.softmax(scores, axis=-1)  # bf16 end to end
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
    ).astype(dtype)
    return tfm._dense(ctx.reshape(b, tq, d), a["wo"], a["bo"], dtype)


def _attention_linear(self, hq, hkv, blk, key_valid, rel_mask, dtype):
    cfg = self.config
    b, tq, d = hq.shape
    tk = hkv.shape[1]
    nh, dh = cfg.num_heads, d // cfg.num_heads
    a = blk["attn"]
    q = tfm._dense(hq, a["wq"], a["bq"], dtype).reshape(b, tq, nh, dh)
    k = tfm._dense(hkv, a["wk"], a["bk"], dtype).reshape(b, tk, nh, dh)
    v = tfm._dense(hkv, a["wv"], a["bv"], dtype).reshape(b, tk, nh, dh)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / (np.sqrt(dh) * tk))
    mask = key_valid[:, None, None, :] & rel_mask[None, None, :, :]
    attn = jnp.where(mask, scores, 0.0).astype(dtype)  # no exp/sum/div
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
    ).astype(dtype)
    return tfm._dense(ctx.reshape(b, tq, d), a["wo"], a["bo"], dtype)


def _attention_deleted(self, hq, hkv, blk, key_valid, rel_mask, dtype):
    return jnp.zeros_like(hq)


def _conv_deleted(self, h, blk, l, mask_btf, state, new_state, train, dtype):
    return jnp.zeros_like(h)


def build(arm: str):
    model = Transformer(TransformerConfig(
        input_dim=F, num_labels=O, num_blocks=12, d_model=256, num_heads=4,
        ffn_dim=1024, conformer=True, conv_kernel=15,
        compute_dtype=jnp.bfloat16,
    ))
    if arm == "bf16_smax":
        model._attention = types.MethodType(_attention_bf16_softmax, model)
    elif arm == "linear_attn":
        model._attention = types.MethodType(_attention_linear, model)
    elif arm == "no_attn":
        model._attention = types.MethodType(_attention_deleted, model)
    elif arm == "no_conv":
        model._conv_module = types.MethodType(_conv_deleted, model)
    elif arm == "no_macaron":
        # delete the macaron pair's FIRST ffn only. _ffn receives the
        # param subtree directly and jit's pytree unflatten rebuilds the
        # dicts, so object identity can't tag ffn1 — instead use a
        # trace-time call counter: in the conformer apply() each block
        # calls _ffn exactly twice, ffn1 first (transformer.py:424-442),
        # so odd-numbered calls (1st, 3rd, ...) are the macaron halves.
        call_no = [0]

        def ffn_probe(self, h, p, dtype):
            call_no[0] += 1
            if call_no[0] % 2 == 1:  # ffn1 of the current block
                return jnp.zeros_like(h)
            return Transformer._ffn(self, h, p, dtype)

        model._ffn = types.MethodType(ffn_probe, model)
    trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3,
                                           num_steps=1000))
    state = trainer.init_state(jax.random.PRNGKey(0))
    return model, trainer, state


def main():
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32)),
        jnp.asarray(rng.integers(0, O, (B, T)).astype(np.int32)),
        jnp.full((B,), T, jnp.int32),
        jnp.full((B,), T, jnp.int32),
    )

    arms = ["base", "no_ln", "bf16_smax", "linear_attn", "no_conv",
            "no_macaron", "no_attn", "fwd_bwd", "fwd"]
    runners = {}
    orig_ln = tfm._layernorm
    for arm in arms:
        if arm in ("fwd_bwd", "fwd"):
            model, trainer, st = build("base")

            def loss_fn(params, mstate, b=batch, model=model):
                logits, ns = model.apply(
                    params, mstate, b.inputs, b.input_lengths, train=True
                )
                tmask = (jnp.arange(T)[None, :] < b.input_lengths[:, None])
                lp = jax.nn.log_softmax(logits, axis=-1)
                ce = -jnp.take_along_axis(
                    lp, b.targets[..., None], axis=-1
                )[..., 0]
                return jnp.sum(ce * tmask) / jnp.sum(b.input_lengths), ns

            if arm == "fwd_bwd":
                fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

                def run(st, fn=fn):
                    (l, _), g = fn(st.params, st.model_state)
                    return st, l
            else:
                fn = jax.jit(loss_fn)

                def run(st, fn=fn):
                    l, _ = fn(st.params, st.model_state)
                    return st, l

            runners[arm] = (run, st)
            continue
        if arm == "no_ln":
            tfm._layernorm = lambda x, g, b, eps: x
        model, trainer, st = build(arm)
        # compile NOW while any module-level patch is active
        st, loss = trainer.update(st, batch)
        print(f"[compile] {arm}: first-step loss {float(loss):.6f}")
        if arm == "no_ln":
            tfm._layernorm = orig_ln
        runners[arm] = (
            lambda st, tr=trainer, b=batch: tr.update(st, b),
            st,
        )

    # warm the two grad-only arms too
    for arm in ("fwd_bwd", "fwd"):
        run, st = runners[arm]
        st, l = run(st)
        _ = float(l)
        runners[arm] = (run, st)

    best = {a: float("inf") for a in arms}
    for _ in range(TRIALS):
        for arm in arms:
            run, st = runners[arm]
            t0 = time.perf_counter()
            for _ in range(STEPS):
                st, loss = run(st)
            _ = float(loss)
            best[arm] = min(best[arm], (time.perf_counter() - t0) / STEPS)
            runners[arm] = (run, st)

    base = best["base"]
    print(f"\nB={B} T={T} 12-block conformer, ms/step (best of {TRIALS}):")
    for arm in arms:
        d = base - best[arm]
        extra = "" if arm == "base" else f"  (stage cost {d * 1000:+6.2f} ms)"
        print(f"  {arm:12s} {best[arm] * 1000:7.2f}{extra}")
    print(f"  frames/s base: {B * T / base:,.0f}")


if __name__ == "__main__":
    main()
