"""In-process A/B of conformer train-step variants (one process,
interleaved arms, best-of-trials — the established methodology).

Arms:
  base   — committed models/transformer.py step
  qkv    — fused [D,3D] QKV projection (one matmul instead of three)
  flash  — Pallas flash-attention (jax.experimental.pallas.ops.tpu),
           segment-id padding masking, instead of the materialized
           [B,h,T,T] f32 score tensor

Run on the TPU:  python benchmarks/ab_conformer.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.models import Transformer, TransformerConfig
from tfkaldi_tpu.train import Trainer, TrainerConfig

B, T, F = 32, 512, 40
O = 2000


def make_attention_variant(kind):
    """Return an _attention override implementing the variant."""

    def qkv_fused(self, h, blk, key_mask, dtype):
        cfg = self.config
        b, t, d = h.shape
        nh, dh = cfg.num_heads, d // cfg.num_heads
        a = blk["attn"]
        wqkv = jnp.concatenate([a["wq"], a["wk"], a["wv"]], axis=1)
        bqkv = jnp.concatenate([a["bq"], a["bk"], a["bv"]])
        from tfkaldi_tpu.models.transformer import _dense

        qkv = _dense(h, wqkv, bqkv, dtype)
        q, k, v = (x.reshape(b, t, nh, dh) for x in jnp.split(qkv, 3, axis=-1))
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / np.sqrt(dh))
        scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
        ).astype(dtype)
        return _dense(ctx.reshape(b, t, d), a["wo"], a["bo"], dtype)

    def flash(self, h, blk, key_mask, dtype):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention,
        )

        from tfkaldi_tpu.models.transformer import _dense

        cfg = self.config
        b, t, d = h.shape
        nh, dh = cfg.num_heads, d // cfg.num_heads
        a = blk["attn"]
        q = _dense(h, a["wq"], a["bq"], dtype).reshape(b, t, nh, dh)
        k = _dense(h, a["wk"], a["bk"], dtype).reshape(b, t, nh, dh)
        v = _dense(h, a["wv"], a["bv"], dtype).reshape(b, t, nh, dh)
        # [B, h, T, dh]; segment ids: valid=1, padding=2 (valid queries
        # cannot see padded keys; padded rows only see padding)
        seg = jnp.where(key_mask, 1, 2).astype(jnp.int32)
        ctx = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            segment_ids=SegmentIds(q=seg, kv=seg),
            sm_scale=1.0 / float(np.sqrt(dh)),
        )
        ctx = ctx.transpose(0, 2, 1, 3).astype(dtype).reshape(b, t, d)
        return _dense(ctx, a["wo"], a["bo"], dtype)

    return {"qkv": qkv_fused, "flash": flash}[kind]


def build(kind):
    model = Transformer(TransformerConfig(
        input_dim=F, num_labels=O, num_blocks=12, d_model=256, num_heads=4,
        ffn_dim=1024, conformer=True, conv_kernel=15,
        compute_dtype=jnp.bfloat16,
    ))
    if kind != "base":
        import types

        model._attention = types.MethodType(make_attention_variant(kind), model)
    trainer = Trainer(model, TrainerConfig(init_learning_rate=1e-3, num_steps=1000))
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
    arms = {k: build(k) for k in ("base", "qkv", "flash")}
    states = {}
    # warmup/compile + numeric cross-check on the first step's loss
    losses = {}
    for k, (tr, st) in arms.items():
        st, loss = tr.update(st, batch)
        losses[k] = float(loss)
        states[k] = st
    print("first-step losses:", {k: round(v, 6) for k, v in losses.items()})

    best = {k: float("inf") for k in arms}
    for trial in range(4):
        for k, (tr, _) in arms.items():
            st = states[k]
            t0 = time.perf_counter()
            for _ in range(10):
                st, loss = tr.update(st, batch)
            _ = float(loss)
            best[k] = min(best[k], (time.perf_counter() - t0) / 10)
            states[k] = st
    for k, v in best.items():
        print(f"{k:6s}: {v * 1000:7.2f} ms/step  {B * T / v:,.0f} frames/s")


if __name__ == "__main__":
    main()
