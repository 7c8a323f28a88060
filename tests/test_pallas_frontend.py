"""Fused frontend kernel (preemph + double-float split + framing) vs the
committed f64 reference math, in Pallas interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.frontend.features import _df_split_np
from tfkaldi_tpu.ops.pallas_frontend import frame_preemph_split


def _reference(sig, eff, preemph, ws, wl, t_max):
    x = sig.astype(np.float64)
    prev = np.pad(x[:, :-1], ((0, 0), (1, 0)))
    y = x - preemph * prev
    idx = np.arange(sig.shape[1])[None, :]
    y = np.where(idx < eff[:, None], y, 0.0)
    needed = (t_max - 1) * ws + wl
    if needed > y.shape[1]:
        y = np.pad(y, ((0, 0), (0, needed - y.shape[1])))
    fr = np.arange(t_max)[:, None] * ws + np.arange(wl)[None, :]
    return y[:, fr]


def test_matches_f64_framing():
    rng = np.random.default_rng(0)
    B, S, wl, ws = 4, 4000, 400, 160
    t_max = 1 + (S - wl) // ws
    sig = (rng.standard_normal((B, S)) * 800).astype(np.float32)
    eff = np.array([S, S - 137, wl + 3, 2500], np.int32)

    with jax.enable_x64():
        a, b, lo = frame_preemph_split(
            jnp.asarray(sig), jnp.asarray(eff),
            preemph=0.97, frame_step=ws, dft_rows=wl, t_max=t_max, interpret=True,
        )
    frames = _reference(sig, eff, 0.97, ws, wl, t_max)
    ra, rb, rlo = _df_split_np(frames)

    # the two 12-bit terms are bit-identical; the residual term matches to
    # the split representation's own resolution (~2^-48 relative)
    # outputs may carry chunk-rounded zero tail rows; compare the real span
    a, b, lo = (np.asarray(v)[:, : frames.shape[1]] for v in (a, b, lo))
    np.testing.assert_array_equal(a, ra)
    np.testing.assert_array_equal(b, rb)
    scale = np.abs(frames).max()
    assert np.abs(lo - rlo).max() <= 2.0 ** -46 * scale
    total = a.astype(np.float64) + b + lo
    assert np.abs(total - frames).max() <= 2.0 ** -46 * scale


def test_signal_shorter_than_needed_padded():
    """padded_len < (t_max-1)*ws + wl: the wrapper pads the signal."""
    rng = np.random.default_rng(1)
    B, S, wl, ws = 2, 1000, 400, 160
    t_max = 1 + int(np.ceil((S - wl) / ws))  # snip_edges=False-style count
    sig = (rng.standard_normal((B, S)) * 100).astype(np.float32)
    eff = np.full((B,), S, np.int32)
    with jax.enable_x64():
        a, b, lo = frame_preemph_split(
            jnp.asarray(sig), jnp.asarray(eff),
            preemph=0.97, frame_step=ws, dft_rows=wl, t_max=t_max, interpret=True,
        )
    frames = _reference(sig, eff, 0.97, ws, wl, t_max)
    np.testing.assert_array_equal(
        np.asarray(a)[:, : t_max], _df_split_np(frames)[0]
    )


def test_preemph_zero():
    """preemph=0: frames are raw samples (split head == f32 samples)."""
    rng = np.random.default_rng(2)
    B, S, wl, ws = 2, 2000, 400, 160
    t_max = 1 + (S - wl) // ws
    sig = (rng.standard_normal((B, S)) * 800).astype(np.float32)
    eff = np.full((B,), S, np.int32)
    with jax.enable_x64():
        a, b, lo = frame_preemph_split(
            jnp.asarray(sig), jnp.asarray(eff),
            preemph=0.0, frame_step=ws, dft_rows=wl, t_max=t_max, interpret=True,
        )
    frames = _reference(sig, eff, 0.0, ws, wl, t_max)
    total = (np.asarray(a, np.float64) + np.asarray(b) + np.asarray(lo))[:, :t_max]
    np.testing.assert_array_equal(total, frames)
