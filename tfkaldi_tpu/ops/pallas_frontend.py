"""Fused feature-frontend kernel: preemphasis + double-float split +
framing in one VMEM pass.

The committed XLA high path (frontend/features.py) computes
``y = x − preemph·x[n−1]`` in emulated f64, masks, gathers overlapping
frames (one emulated-f64 gather), and Veltkamp-splits the frames into the
three f32 terms the double-float DFT matmuls consume — ~4.6 ms of the
9.7 ms call, all HBM-bound elementwise/gather work (docs/PERF_FEATURES.md;
both cheaper XLA restructurings measured slower and were rejected).

This kernel does the whole stage per utterance in VMEM: the signal row
(~320 KB for 5 s at 16 kHz) is resident; the preemphasis runs as exact
double-float arithmetic on the VPU (Veltkamp two-products + two-sums: all
partial products are ≤24-bit-exact, giving ~48 good bits — the same
precision the split representation can carry, so the result matches the
f64 path to the split's own resolution); the frame windows then stream
out as VMEM block copies. The [B, S] → 3×[B, T, wl] expansion never
round-trips HBM in f64 form.

Layout: Mosaic requires lane-dim offsets to be 128-aligned, so the signal
lives as ``[S/g, g]`` rows with ``g = gcd(frame_len, frame_step)`` — each
frame is then ``frame_len/g`` *consecutive rows* starting at row
``t·frame_step/g``, i.e. one dynamic-sublane block copy per frame. The
outputs come back ``[B, T, wl/g, g]`` and are flattened to ``[B, T, wl]``
by a row-major (layout-preserving) reshape in XLA.

Precision contract: input samples must be exactly f32-representable
(int16 wav data always is). The (a, b, lo) outputs feed
``frontend.features._df_matmul`` unchanged; the (a, b) terms are
bit-identical to the committed path, lo matches to ~2⁻⁴⁸ relative
(tests/test_pallas_frontend.py pins both).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TRUNC_MASK = np.int32(np.uint32(0xFFFFF000).view(np.int32))  # keep 12 significand bits


def supported(frame_len: int, frame_step: int) -> bool:
    """The gcd row width must give a sane VMEM minor dim."""
    g = math.gcd(frame_len, frame_step)
    return g >= 32


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _veltkamp(v):
    """Split an f32 vector into a 12-bit head + ≤12-bit tail (exact)."""
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(v, jnp.int32) & _TRUNC_MASK, jnp.float32
    )
    return hi, v - hi


def _kernel(x_ref, xp_ref, eff_ref, a_ref, b_ref, lo_ref, sa_ref, sb_ref, slo_ref,
            *, consts, row_step, rows_per_frame, g, t_chunk):
    c1h, c1l, c2 = consts
    i = pl.program_id(0)
    j = pl.program_id(1)

    # the grid is (utterance, frame-chunk): the elementwise double-float
    # stage runs once per utterance (j == 0) into persistent VMEM scratch;
    # each chunk step then streams t_chunk frames out of it. Chunking
    # keeps the padded output blocks inside the VMEM budget (a whole-
    # utterance [T, rows, g] block pads its (rows, g) tile to (8, 128)
    # and blows the 16 MB limit).
    @pl.when(j == 0)
    def _():
        x = x_ref[:]    # [1, S/g, g]
        xp = xp_ref[:]
        eff = eff_ref[i, 0]

        # p = preemph . x[n-1] as an exact double-float (elementwise -
        # the [1, S/g, g] view does not change the math)
        xh, xl = _veltkamp(xp)
        s = c1h * xh  # exact (12+12 bits)
        e = jnp.zeros_like(s)
        for q in (c1h * xl, c1l * xh, c1l * xl, c2 * xp):
            s, e1 = _two_sum(s, q)
            e = e + e1
        # y = x - p, renormalized to head+tail
        yh, e2 = _two_sum(x, -s)
        yl = e2 - e
        yh, e3 = _two_sum(yh, yl)
        yl = e3

        # mask: literal zeros after the real samples (sigproc.py:57-60);
        # global sample index = row*g + lane
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        valid = rows * jnp.int32(g) + lanes < eff
        yh = jnp.where(valid, yh, 0.0)
        yl = jnp.where(valid, yl, 0.0)

        # split the head into its two 12-bit terms (frames of the split ==
        # split of the frames: elementwise); stage in VMEM scratch -
        # Mosaic slices REFS, not values
        a_sig, b_sig = _veltkamp(yh)
        sa_ref[:] = a_sig[0]
        sb_ref[:] = b_sig[0]
        slo_ref[:] = yl[0]

    base = j * jnp.int32(t_chunk)

    def body(t, _):
        # frame base+t = rows [(base+t)*row_step, +rows_per_frame) - one
        # dynamic sublane-offset block copy per output frame (strictly
        # 32-bit index math: python ints trace as i64 under enable_x64)
        start = (base + t) * jnp.int32(row_step)
        sl = pl.ds(start, rows_per_frame)
        a_ref[0, t] = sa_ref[sl, :]
        b_ref[0, t] = sb_ref[sl, :]
        lo_ref[0, t] = slo_ref[sl, :]
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(t_chunk), body, None)


@functools.partial(
    jax.jit,
    static_argnames=("preemph", "frame_step", "dft_rows", "t_max", "interpret"),
)
def frame_preemph_split(
    signals,
    eff_len,
    *,
    preemph: float,
    frame_step: int,
    dft_rows: int,
    t_max: int,
    interpret: bool = False,
):
    """``signals`` [B, S] f32, ``eff_len`` [B] int32 →
    ``(a, b, lo)`` each ``[B, t_max, dft_rows]`` f32 — the split frames
    the double-float DFT consumes."""
    b, s = signals.shape
    g = math.gcd(dft_rows, frame_step)
    rows_per_frame = dft_rows // g
    row_step = frame_step // g
    # chunk-rounded frame capacity (the grid below runs whole chunks, so
    # the scratch must cover the tail chunk's over-read too)
    _t_chunk = min(128, t_max)
    _t_cap = -(-t_max // _t_chunk) * _t_chunk
    needed = (_t_cap - 1) * frame_step + dft_rows
    pad_to = max(s, needed)
    lcm = g * 128 // math.gcd(g, 128)
    pad_to = -(-pad_to // lcm) * lcm  # whole rows in BOTH views
    if pad_to > s:
        signals = jnp.pad(signals, ((0, 0), (0, pad_to - s)))
        s = pad_to
    # x[n−1] stream, shifted in XLA (a cheap f32 pad+slice)
    prev = jnp.pad(signals[:, :-1], ((0, 0), (1, 0)))
    nrows = s // g
    sig3 = signals.reshape(b, nrows, g)
    prev3 = prev.reshape(b, nrows, g)

    # split the f64 preemph constant: c ≈ c1h + c1l + c2 with c1h 12-bit
    # (so c1h·x-half products are exact) and c2 the f32 residual of the
    # f64 value (its product's rounding error is ~2⁻⁴⁹·|x|)
    c64 = float(np.float64(preemph))
    c1 = np.float32(c64)
    c2 = np.float32(c64 - float(c1))
    c1h = (np.asarray([c1], np.float32).view(np.int32) & _TRUNC_MASK).view(np.float32)[0]
    c1l = np.float32(c1 - c1h)
    consts = (float(c1h), float(c1l), float(c2))

    eff2d = eff_len.reshape(b, 1).astype(jnp.int32)
    # frame-chunked grid: whole-utterance output blocks pad their
    # (rows, g) tiles to (8, 128) and overflow VMEM; 128-frame chunks
    # keep each output block ~0.5 MB
    t_chunk = _t_chunk
    t_cap = _t_cap
    n_chunks = t_cap // t_chunk

    # index-map constants must be i32: under the caller's enable_x64 scope
    # a literal 0 traces as i64 and Mosaic fails to legalize the mixed
    # (i32, i64, ...) index tuple
    z = np.int32(0)
    blk = lambda i, j: (i, z, z)  # noqa: E731
    out4 = lambda i, j: (i, j, z, z)  # noqa: E731
    shape4 = jax.ShapeDtypeStruct((b, t_cap, rows_per_frame, g), jnp.float32)
    a, b_term, lo = pl.pallas_call(
        functools.partial(
            _kernel, consts=consts, row_step=row_step,
            rows_per_frame=rows_per_frame, g=g, t_chunk=t_chunk,
        ),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, nrows, g), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrows, g), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, j: (z, z), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_chunk, rows_per_frame, g), out4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_chunk, rows_per_frame, g), out4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_chunk, rows_per_frame, g), out4, memory_space=pltpu.VMEM),
        ],
        out_shape=[shape4, shape4, shape4],
        scratch_shapes=[
            pltpu.VMEM((nrows, g), jnp.float32),
            pltpu.VMEM((nrows, g), jnp.float32),
            pltpu.VMEM((nrows, g), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # sequential j reuses the per-utterance scratch filled at j==0
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sig3, prev3, eff2d)
    # row-major flatten of the (rows_per_frame, g) window back to wl.
    # The chunk-rounding tail rows (t_max..t_cap) are windows over the
    # zero-padded signal region — all zeros — and are NOT trimmed here:
    # slicing 3×[B,T,wl] costs ~0.5 ms of pure copies, while the DFT of a
    # few extra zero frames is nearly free and the feature pipeline masks
    # by num_frames at the end anyway. Callers see t_cap rows.
    def fin(v):
        return v.reshape(v.shape[0], t_cap, dft_rows)

    return fin(a), fin(b_term), fin(lo)
