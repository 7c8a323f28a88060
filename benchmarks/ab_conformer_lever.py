"""Shape-tuned levers against the conformer step's dominant non-matmul
term: the attention-softmax residual traffic.

The deletion budget (benchmarks/ab_conformer_budget.py,
docs/PERF_CONFORMER_STEP.md) measured the softmax *machinery* at
10.1 ms/step and showed the cost is not arithmetic width (bf16 softmax
recovers only 1.4 ms) but the stored probability residuals the backward
re-reads: per block the VJP keeps the f32 softmax output
([B,h,T,T] = 134 MB at 32x512) for the softmax transpose PLUS the bf16
cast ([B,h,T,T] = 67 MB) for the context-matmul transpose — ~201 MB of
forward writes and backward reads per block, x12 blocks ~= 2.4 GB each
way per step.  These arms attack exactly that traffic, with the step's
math otherwise unchanged (unlike the deletion probes, base/remat arms
here are EQUIVALENCE arms — identical loss required):

  base        — committed models/transformer.py step
  remat_core  — jax.checkpoint around scores->mask->softmax->context:
                forward saves only q,k,v (3 x 8.4 MB bf16) and the mask;
                backward recomputes scores+softmax (one extra [T,dh][dh,T]
                matmul per head — the cheap part) instead of re-reading
                201 MB.  Bit-identical loss and gradients.
  remat_attn  — jax.checkpoint around the WHOLE attention sublayer
                (projections included): saves only the [B,T,D] block
                input; backward additionally re-runs the 4 projections.
  bf16_resid  — custom_vjp softmax that saves ONLY the bf16 probability
                tensor (67 MB/block) and uses it for both transposes.
                Forward loss identical; gradients differ by bf16
                rounding of the residual (the directive-sanctioned
                "bf16 attention residuals").

Run on the TPU:  python benchmarks/ab_conformer_lever.py [B] [T]
"""

import sys
import time
import types
from functools import partial

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


# --------------------------------------------------------------------
# bf16-residual softmax: forward math identical to jax.nn.softmax(f32)
# followed by the bf16 cast; backward keeps only the bf16 output.
def _softmax_b16_impl(scores):
    return jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)


@jax.custom_vjp
def softmax_b16_resid(scores):
    return _softmax_b16_impl(scores)


def _softmax_b16_fwd(scores):
    p = _softmax_b16_impl(scores)
    return p, p  # the bf16 tensor is the ONLY residual


def _softmax_b16_bwd(p, dp):
    pf = p.astype(jnp.float32)
    dpf = dp.astype(jnp.float32)
    ds = pf * (dpf - jnp.sum(pf * dpf, axis=-1, keepdims=True))
    return (ds,)


softmax_b16_resid.defvjp(_softmax_b16_fwd, _softmax_b16_bwd)


def _attn_core(q, k, v, mask, dh, dtype):
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / np.sqrt(dh))
    scores = jnp.where(mask, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
    ).astype(dtype)


def _attention_remat_core(self, hq, hkv, blk, key_valid, rel_mask, dtype):
    cfg = self.config
    b, tq, d = hq.shape
    tk = hkv.shape[1]
    nh, dh = cfg.num_heads, d // cfg.num_heads
    a = blk["attn"]
    q = tfm._dense(hq, a["wq"], a["bq"], dtype).reshape(b, tq, nh, dh)
    k = tfm._dense(hkv, a["wk"], a["bk"], dtype).reshape(b, tk, nh, dh)
    v = tfm._dense(hkv, a["wv"], a["bv"], dtype).reshape(b, tk, nh, dh)
    mask = key_valid[:, None, None, :] & rel_mask[None, None, :, :]
    core = jax.checkpoint(partial(_attn_core, dh=dh, dtype=dtype))
    ctx = core(q, k, v, mask)
    return tfm._dense(ctx.reshape(b, tq, d), a["wo"], a["bo"], dtype)


def _attention_remat_attn(self, hq, hkv, blk, key_valid, rel_mask, dtype):
    def whole(hq, hkv, a):
        cfg = self.config
        b, tq, d = hq.shape
        tk = hkv.shape[1]
        nh, dh = cfg.num_heads, d // cfg.num_heads
        q = tfm._dense(hq, a["wq"], a["bq"], dtype).reshape(b, tq, nh, dh)
        k = tfm._dense(hkv, a["wk"], a["bk"], dtype).reshape(b, tk, nh, dh)
        v = tfm._dense(hkv, a["wv"], a["bv"], dtype).reshape(b, tk, nh, dh)
        mask = key_valid[:, None, None, :] & rel_mask[None, None, :, :]
        ctx = _attn_core(q, k, v, mask, dh, dtype)
        return tfm._dense(ctx.reshape(b, tq, d), a["wo"], a["bo"], dtype)

    return jax.checkpoint(whole)(hq, hkv, blk["attn"])


def _attention_bf16_resid(self, hq, hkv, blk, key_valid, rel_mask, dtype):
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
    ) * (1.0 / np.sqrt(dh))
    mask = key_valid[:, None, None, :] & rel_mask[None, None, :, :]
    scores = jnp.where(mask, scores, -1e30)
    attn = softmax_b16_resid(scores).astype(dtype)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
    ).astype(dtype)
    return tfm._dense(ctx.reshape(b, tq, d), a["wo"], a["bo"], dtype)


ARMS = {
    "base": None,
    "remat_core": _attention_remat_core,
    "remat_attn": _attention_remat_attn,
    "bf16_resid": _attention_bf16_resid,
}


def build(arm: str):
    model = Transformer(TransformerConfig(
        input_dim=F, num_labels=O, num_blocks=12, d_model=256, num_heads=4,
        ffn_dim=1024, conformer=True, conv_kernel=15,
        compute_dtype=jnp.bfloat16,
    ))
    if ARMS[arm] is not None:
        model._attention = types.MethodType(ARMS[arm], model)
    trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3,
                                           num_steps=1000))
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state


def main():
    rng = np.random.default_rng(0)
    batch = PaddedBatch(
        jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32)),
        jnp.asarray(rng.integers(0, O, (B, T)).astype(np.int32)),
        jnp.full((B,), T, jnp.int32),
        jnp.full((B,), T, jnp.int32),
    )

    runners = {}
    losses = {}
    for arm in ARMS:
        trainer, st = build(arm)
        st, loss = trainer.update(st, batch)
        losses[arm] = float(loss)
        print(f"[compile] {arm:11s} first-step loss {losses[arm]:.6f}")
        runners[arm] = (lambda st, tr=trainer, b=batch: tr.update(st, b), st)

    best = {a: float("inf") for a in ARMS}
    for _ in range(TRIALS):
        for arm in ARMS:
            run, st = runners[arm]
            t0 = time.perf_counter()
            for _ in range(STEPS):
                st, loss = run(st)
            _ = float(loss)
            best[arm] = min(best[arm], (time.perf_counter() - t0) / STEPS)
            runners[arm] = (run, st)

    base = best["base"]
    print(f"\nB={B} T={T} 12-block conformer, ms/step (best of {TRIALS}):")
    for arm in ARMS:
        eq = "loss==base" if losses[arm] == losses["base"] else "loss DIFFERS"
        print(f"  {arm:11s} {best[arm] * 1000:7.2f}  "
              f"({base / best[arm]:.3f}x)  [{eq}]")
    print(f"  frames/s base: {B * T / base:,.0f}")


if __name__ == "__main__":
    main()
