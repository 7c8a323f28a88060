"""Batched, jit-compiled acoustic feature extraction.

One call processes a padded batch ``signals[B, S]`` + ``lengths[B]`` into
``feats[B, T_max, D]`` + ``num_frames[B]`` entirely on device. This
replaces the reference's per-utterance numpy loop
(processing/prepare_data.py:55-68 → feat.py:42-69 → base.py/sigproc.py)
with MXU-batched math; numerics match the reference to ≤1e-4 (see
tests/test_features.py golden tests against a float64 re-derivation).

Pipeline (reference call chain in parentheses):

1. ``snip_edges`` frame-count arithmetic (feat.py:71-90)
2. preemphasis ``y[n] = x[n] - a·x[n-1]``, ``y[0] = x[0]`` (sigproc.py:180-191)
3. zero out samples past the (snipped) utterance end — equivalent to the
   reference's drop-edges + zero-pad-to-whole-frames (sigproc.py:57-60)
4. overlapping frames, rectangular window (sigproc.py:33-68)
5. ``|rfft|²/nfft`` power spectrum (sigproc.py:119-153)
6. frame energy with eps floor (base.py:84-87)
7. mel filterbank matmul with eps floor (base.py:89-96)
8. fbank→log (base.py:100-115) / mfcc: log→DCT→lifter (base.py:37-57) /
   ssc: centroid ratio (base.py:117-154)
9. optional log-energy column (feat.py:63-64)
10. delta/ddelta: reflect-boundary ``[2,1,0,-1,-2]`` correlation per
    utterance (base.py:249-284)
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.frontend import mel

# np.finfo(float).eps — the reference's flooring constant (base.py:87,96)
_EPS = float(np.finfo(np.float64).eps)
# scipy.ndimage.convolve1d(features, [2,1,0,-1,-2], axis=0) computes the
# correlation with the reversed kernel: out[t] = 2f[t+2]+f[t+1]-f[t-1]-2f[t-2]
_DERIV_TAPS = (-2.0, -1.0, 0.0, 1.0, 2.0)  # weight for offset d = -2..2


@dataclasses.dataclass(frozen=True)
class FeatureOpts:
    """Feature configuration; field names/defaults mirror the reference
    ``[gmm-features]``/``[dnn-features]`` config sections
    (config/config_AURORA4.cfg:26-80)."""

    feature_type: str = "fbank"  # fbank | mfcc | ssc
    dynamic: str = "nodelta"  # nodelta | delta | ddelta
    winlen: float = 0.025
    winstep: float = 0.01
    nfilt: int = 23
    nfft: int = 512
    lowfreq: float = 0.0
    highfreq: float = -1.0
    preemph: float = 0.97
    include_energy: bool = False
    snip_edges: bool = True
    numcep: int = 13
    ceplifter: float = 22.0

    @classmethod
    def from_config(cls, conf: dict) -> "FeatureOpts":
        """Build from a reference-style string-valued config dict."""
        return cls(
            feature_type=conf.get("type", conf.get("feature_type", "fbank")),
            dynamic=conf.get("dynamic", "nodelta"),
            winlen=float(conf.get("winlen", 0.025)),
            winstep=float(conf.get("winstep", 0.01)),
            nfilt=int(conf.get("nfilt", 23)),
            nfft=int(conf.get("nfft", 512)),
            lowfreq=float(conf.get("lowfreq", 0)),
            highfreq=float(conf.get("highfreq", -1)),
            preemph=float(conf.get("preemph", 0.97)),
            include_energy=str(conf.get("include_energy", "False")) == "True",
            snip_edges=str(conf.get("snip_edges", "True")) == "True",
            numcep=int(conf.get("numcep", 13)),
            ceplifter=float(conf.get("ceplifter", 22)),
        )

    @property
    def base_dim(self) -> int:
        dim = self.numcep if self.feature_type == "mfcc" else self.nfilt
        return dim + (1 if self.include_energy else 0)

    @property
    def dim(self) -> int:
        """Final feature dimension including dynamics."""
        mult = {"nodelta": 1, "delta": 2, "ddelta": 3}[self.dynamic]
        return self.base_dim * mult


class FeatureExtractor:
    """Jit-compiled batched feature computer for a fixed sample rate.

    Equivalent of the reference ``FeatureComputer`` (feat.py:7-69) but
    operating on padded batches. Compilation is cached per padded signal
    length ``S``; callers should bucket signal lengths (e.g. pad to a
    multiple of one second) to bound recompiles.
    """

    def __init__(self, opts: FeatureOpts, samplerate: int, spectrum_precision: str = "high"):
        """Args:
            spectrum_precision: ``"high"`` (default) runs the elementwise
                stages (preemphasis, power, log) in float64 and the DFT and
                mel matmuls as double-float Veltkamp-split f32 matmuls on
                the MXU with f64-combined partial sums (``_df_matmul``; the
                DCT and the ssc chain keep emulated-f64 matmuls — see the
                inline comments in ``_compute_batch`` for the per-stage
                error budget). Measured on v5e against the ported-reference
                float64 oracle over fbank/mfcc/ssc × nodelta/ddelta on
                3-second noise (the parity-gate metric
                ``err/max(|ref|,1)``): worst 7.7e-5 (ssc+ddelta — the
                TPU's emulated-f64 own floor; fbank/mfcc ≤4.9e-5), at
                2.1x the throughput of routing the mel matmul through
                emulated f64. ``"exact"`` uses XLA's software-emulated f64
                matmul throughout (the verification reference for "high").
                ``"fast"`` runs everything in f32: final-feature error
                ~1e-3 worst-case / ~1e-6 p99 (test-pinned), fine for
                training features when parity is not required.
        """
        if spectrum_precision not in ("high", "exact", "fast"):
            raise ValueError("spectrum_precision must be 'high', 'exact' or 'fast'")
        self.opts = opts
        self.rate = int(samplerate)
        self.spectrum_precision = spectrum_precision
        self.frame_len = int(round(opts.winlen * self.rate))
        self.frame_step = int(round(opts.winstep * self.rate))
        highfreq = opts.highfreq if opts.highfreq >= 0 else self.rate / 2

        # constants kept in float64; cast to the working dtype at trace time
        self._fbank = mel.mel_filterbank(
            opts.nfilt, opts.nfft, self.rate, opts.lowfreq, highfreq
        )
        if opts.feature_type == "mfcc":
            self._dct = mel.dct_ortho_matrix(opts.nfilt, opts.numcep)
            self._lift = mel.lifter_vector(opts.numcep, opts.ceplifter)
        if opts.feature_type == "ssc":
            nbins = opts.nfft // 2 + 1
            self._tiles = np.linspace(1, self.rate / 2, nbins)
        # real-DFT bases over the (un-padded) window; zero-padding to
        # nfft is implicit in truncating the bases to wl rows, and — like
        # numpy's rfft(frame, n=nfft) (sigproc.py:136) — frames LONGER than
        # nfft are truncated to the first nfft samples, hence min() rows.
        # Both precisions use the matmul DFT: on TPU the rfft lowering is
        # both slower at these sizes and pathologically slow to compile,
        # while the matmul rides the MXU.
        nbins = opts.nfft // 2 + 1
        self._dft_rows = min(self.frame_len, opts.nfft)
        n = np.arange(self._dft_rows, dtype=np.float64)[:, None]
        k = np.arange(nbins, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * n * k / opts.nfft
        self._dft_cos = np.cos(ang)
        self._dft_sin = -np.sin(ang)
        # Fused Pallas framing kernel (ops/pallas_frontend.py): OFF by
        # default — measured 0.87x the XLA framing on v5e (the kernel's
        # (rows, g) output blocks pay Mosaic's (8,128) tile padding, ~2.6x
        # HBM write amplification + a relayout, which XLA's dense gather
        # never pays; docs/PERF_FEATURES.md). Kept as the verified
        # bit-identical implementation for future Mosaic layout work.
        self.use_frontend_kernel = False
        self._batch_fn = jax.jit(self._compute_batch, static_argnames=("padded_len",))
        self._finish_from_split_fn = jax.jit(self._finish_from_split)
        # frames → features entry for the online extractor (frontend/online.py)
        self._frames_fn = jax.jit(self._frames_to_feats)
        # split seams for the streaming delta extractor (frontend/online.py):
        # statics per chunk, dynamics over lookahead windows
        self._static_fn = jax.jit(self._frames_to_static)
        self._dynamics_fn = jax.jit(self._apply_dynamics)

    # ------------------------------------------------------------------
    # frame geometry — host-side float64, replicating the reference's float
    # arithmetic exactly (``winlen*rate`` is a *float* in feat.py:86 and
    # sigproc.py:50-55; truncations/ceils must see the same values)
    # ------------------------------------------------------------------

    def frame_geometry(self, lengths) -> tuple[np.ndarray, np.ndarray]:
        """Per-utterance ``(num_frames, effective_len)``.

        ``effective_len`` is the number of real samples that reach the
        framer: the snipped length (feat.py:86-88) when ``snip_edges``,
        otherwise the full length. ``num_frames`` is the count framesig
        then produces (sigproc.py:52-55): 1 if the signal fits one window,
        else ``1 + ceil((eff - frame_len)/frame_step)``.
        """
        lengths = np.asarray(lengths, dtype=np.int64)
        wl_f = self.opts.winlen * self.rate
        ws_f = self.opts.winstep * self.rate
        if self.opts.snip_edges:
            nfull = ((lengths - wl_f) / ws_f).astype(np.int64)  # trunc toward 0
            eff = np.minimum(lengths, (nfull * ws_f + wl_f).astype(np.int64))
        else:
            eff = lengths
        num_frames = np.where(
            eff <= self.frame_len,
            1,
            1 + np.ceil((eff.astype(np.float64) - self.frame_len) / self.frame_step),
        ).astype(np.int32)
        return num_frames, eff.astype(np.int32)

    def num_frames_np(self, lengths) -> np.ndarray:
        """Frame count per utterance (host-side)."""
        return self.frame_geometry(lengths)[0]

    def max_frames(self, padded_len: int) -> int:
        """Static frame capacity for signals padded to ``padded_len``."""
        return int(self.num_frames_np(np.asarray([padded_len]))[0])

    # ------------------------------------------------------------------
    # the traced pipeline
    # ------------------------------------------------------------------

    def _compute_batch(self, signals, num_frames, eff_len, *, padded_len):
        opts = self.opts
        wl, ws = self.frame_len, self.frame_step

        high = self.spectrum_precision in ("high", "exact")
        work_dtype = jnp.float64 if high else jnp.float32

        x = signals.astype(work_dtype)
        # preemphasis first, then mask: the reference preemphasizes the real
        # samples and framesig pads literal zeros after them (sigproc.py:57-60)
        prev = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
        y = x - opts.preemph * prev
        sample_idx = jnp.arange(padded_len, dtype=jnp.int32)[None, :]
        y = jnp.where(sample_idx < eff_len[:, None], y, 0.0)

        # frame capacity for this padded length; pad so every gather is valid
        t_max = self.max_frames(padded_len)
        needed = (t_max - 1) * ws + wl
        if needed > padded_len:
            y = jnp.pad(y, ((0, 0), (0, needed - padded_len)))
        idx = (
            jnp.arange(t_max, dtype=jnp.int32)[:, None] * ws
            + jnp.arange(wl, dtype=jnp.int32)[None, :]
        )
        frames = y[:, idx]  # [B, T, wl] — rectangular window (sigproc.py:33)
        return self._frames_to_feats(frames, num_frames)

    def _frames_to_feats(self, frames, num_frames):
        """Post-framing pipeline: DFT → power → mel/DCT/ssc → dynamics →
        mask. Shared seam between the offline batch path above and the
        online (chunked) extractor in frontend/online.py, so streamed
        frames go through the byte-identical compute."""
        return self._apply_dynamics(
            self._frames_to_static(frames, num_frames), num_frames
        )

    def _frames_to_static(self, frames, num_frames):
        """The per-frame (dynamics-free) portion of ``_frames_to_feats``,
        returning WORK-dtype static features — the seam the streaming
        delta extractor buffers (its lookahead windows then run
        ``_apply_dynamics`` on these exact values)."""
        high = self.spectrum_precision in ("high", "exact")
        work_dtype = jnp.float64 if high else jnp.float32

        # real DFT as matmuls (sigproc.py:119-153); the TPU rfft lowering is
        # slower at these sizes and pathologically slow to compile, while
        # matmuls ride the MXU.
        dft_in = frames[:, :, : self._dft_rows]  # rfft truncation semantics
        dn = (((2,), (0,)), ((), ()))
        if self.spectrum_precision == "high" and jax.default_backend() == "cpu":
            # on hosts float64 matmul is native and cheap — "high" simply
            # uses it (identical numerics to "exact" there). The split
            # scheme below exists for the MXU, where emulated f64 is ~12x
            # slower; XLA:CPU's f32 accumulation would also be the split's
            # worst case (~2e-4 after mfcc+ddelta amplification vs ~1.2e-5
            # measured on v5e), so routing CPU through f64 is both the
            # faster and the more accurate choice per backend.
            mm64 = dict(
                dimension_numbers=dn,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float64,
            )
            xr = jax.lax.dot_general(dft_in, jnp.asarray(self._dft_cos), **mm64)
            xi = jax.lax.dot_general(dft_in, jnp.asarray(self._dft_sin), **mm64)
        elif self.spectrum_precision == "high":
            # double-float DFT on the MXU: frames and bases are Veltkamp-
            # split into a 12-bit-significand f32 "hi" plus an f32 residual,
            # so every hi*hi product is EXACT in f32 (12+12 = 24 bits) and
            # the cross/residual products carry ≤2^-36-relative error. The
            # remaining error source — f32 accumulation under cancellation —
            # is bounded by chunking the contraction into 128-wide blocks
            # whose partial sums are combined in f64. Measured final-feature
            # error vs "exact" (incl. worst-case double-delta
            # amplification): max ~1.2e-5 on v5e / ~5e-5 on CPU f32 — a
            # 2-8x margin under the ≤1e-4 parity gate at a fraction of
            # emulated-f64 matmul cost. (`_df_matmul` below; the same scheme
            # backs the mel/DCT/SSC matmuls further down.)
            frames_split = _df_split_traced(dft_in)
            xr = _df_matmul(frames_split, self._dft_cos)
            xi = _df_matmul(frames_split, self._dft_sin)
        else:
            # "exact": f64 bases on XLA's emulated-f64 matmul (spectrum
            # error ~1e-10). "fast": f32 bases at HIGHEST (bf16x6 on the
            # MXU; final-feature error ~1e-3 worst-case, test-pinned).
            mm_dft = dict(
                dimension_numbers=dn,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=work_dtype,
            )
            cosb = jnp.asarray(self._dft_cos).astype(work_dtype)
            sinb = jnp.asarray(self._dft_sin).astype(work_dtype)
            xr = jax.lax.dot_general(dft_in, cosb, **mm_dft)
            xi = jax.lax.dot_general(dft_in, sinb, **mm_dft)
        return self._finish_batch(xr, xi, num_frames, work_dtype)

    def _finish_from_split(self, frames_split, num_frames):
        """f64 tail fed by the fused frontend kernel's split frames:
        double-float DFT → power → mel/DCT/ssc → dynamics → mask."""
        xr = _df_matmul(frames_split, self._dft_cos)
        xi = _df_matmul(frames_split, self._dft_sin)
        return self._finish_batch(xr, xi, num_frames, jnp.float64)

    def _finish_batch(self, xr, xi, num_frames, work_dtype):
        """Post-DFT tail: power spectrum → energy → mel/DCT/ssc → dynamics
        → frame masking (shared by the XLA and fused-kernel framing paths)."""
        opts = self.opts
        pspec = (xr * xr + xi * xi) * (1.0 / opts.nfft)

        energy = jnp.sum(pspec, axis=-1)
        energy = jnp.where(energy == 0, _EPS, energy)  # base.py:87
        log_energy = jnp.log(energy)

        # mel / DCT / log chain stays in work_dtype: XLA's f32 log is only
        # ~1e-4-accurate, which alone would blow the ≤1e-4 parity budget.
        # In "high" mode on accelerators the MEL matmul (the single most
        # expensive stage of the pipeline — measured 6.2 ms of a 20 ms call
        # as an emulated-f64 matmul on v5e) routes through the same
        # double-float split scheme as the DFT, with ``aa_chunk=16`` so the
        # post-log absolute error stays ~1e-6 even under the 36x worst-case
        # double-delta amplification (measured on v5e: see _df_matmul). The
        # DCT keeps the emulated-f64 matmul (its cancellation-heavy 40-term
        # contraction would need per-8 chunking to meet the budget, and it
        # is 6x smaller than mel); ssc keeps f64 throughout (centroids are
        # kHz-scale, so the 1e-4 gate demands ~1e-8 *relative* accuracy).
        # Elementwise f64 (power, log, division) stays genuinely f64.
        split_mel = (
            self.spectrum_precision == "high"
            and jax.default_backend() != "cpu"
            and opts.feature_type in ("fbank", "mfcc")
        )

        def _f64_dot(lhs, basis64):
            return jax.lax.dot_general(
                lhs,
                jnp.asarray(basis64).astype(work_dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=work_dtype,
            )

        if split_mel:
            feat_raw = _df_matmul(
                _df_split_traced(pspec), self._fbank.T, aa_chunk=16
            )  # [B, T, nfilt]
        else:
            feat_raw = _f64_dot(pspec, self._fbank.T)

        if opts.feature_type == "fbank":
            feat = jnp.log(jnp.where(feat_raw == 0, _EPS, feat_raw))  # base.py:96,115
        elif opts.feature_type == "mfcc":
            logfeat = jnp.log(jnp.where(feat_raw == 0, _EPS, feat_raw))
            feat = _f64_dot(logfeat, self._dct)
            feat = feat * jnp.asarray(self._lift).astype(work_dtype)[None, None, :]
        elif opts.feature_type == "ssc":
            weighted = pspec * jnp.asarray(self._tiles).astype(work_dtype)[None, None, :]
            num = _f64_dot(weighted, self._fbank.T)
            # the reference divides by the *unfloored* filterbank energies
            # (base.py:150-154)
            feat = num / feat_raw
        else:
            raise ValueError(f"unknown feature type {opts.feature_type!r}")

        if opts.include_energy:
            feat = jnp.concatenate([feat, log_energy[..., None]], axis=-1)

        return feat

    def _apply_dynamics(self, feat, num_frames):
        """Dynamics (reflect-boundary deriv/concat) + mask + f32 cast on a
        work-dtype static-feature batch. Factored out so the streaming
        delta extractor (frontend/online.py) runs the byte-identical
        traced tail over its lookahead windows."""
        opts = self.opts
        if opts.dynamic != "nodelta":
            d1 = _reflect_deriv(feat, num_frames)
            if opts.dynamic == "delta":
                feat = jnp.concatenate([feat, d1], axis=-1)
            elif opts.dynamic == "ddelta":
                d2 = _reflect_deriv(d1, num_frames)
                feat = jnp.concatenate([feat, d1, d2], axis=-1)
            else:
                raise ValueError(f"unknown dynamic type {opts.dynamic!r}")

        frame_ok = jnp.arange(feat.shape[1])[None, :] < num_frames[:, None]
        feat = jnp.where(frame_ok[..., None], feat.astype(jnp.float32), 0.0)
        return feat, num_frames

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def __call__(self, signals, lengths):
        """Compute features for a padded batch.

        Args:
            signals: ``[B, S]`` array (any real dtype; int16 wav data is fine).
            lengths: ``[B]`` true sample counts.

        Returns:
            ``(feats, num_frames)``: ``[B, T_max, dim]`` float32 with padding
            frames zeroed, and ``[B]`` int32 valid frame counts.
        """
        signals = jnp.asarray(signals)
        if signals.ndim != 2:
            raise ValueError("signals must be [batch, samples]")
        num_frames, eff_len = self.frame_geometry(np.asarray(lengths))

        # fused frontend kernel (TPU high path): preemphasis + double-float
        # split + framing in one VMEM pass (ops/pallas_frontend.py),
        # replacing the emulated-f64 preemph + gather — ~half the call
        # (docs/PERF_FEATURES.md). (a, b) are bit-identical to the split of
        # the f64 frames; lo matches to ~2^-48 relative. Requires f32-exact
        # samples (wav int16 data always is). The kernel runs as its own
        # f32-world jit OUTSIDE the x64 scope (tracing a Pallas kernel
        # under enable_x64 stalls the Mosaic pipeline); its split output
        # stays on device and feeds the f64 tail jit.
        from tfkaldi_tpu.ops import pallas_frontend

        if (
            self.spectrum_precision == "high"
            and jax.default_backend() == "tpu"
            and signals.dtype != jnp.float64
            and self.use_frontend_kernel
            and pallas_frontend.supported(self._dft_rows, self.frame_step)
        ):
            frames_split = pallas_frontend.frame_preemph_split(
                signals.astype(jnp.float32),
                jnp.asarray(eff_len),
                preemph=self.opts.preemph,
                frame_step=self.frame_step,
                dft_rows=self._dft_rows,
                t_max=self.max_frames(signals.shape[1]),
            )
            with jax.enable_x64():
                return self._finish_from_split_fn(frames_split, jnp.asarray(num_frames))

        if self.spectrum_precision in ("high", "exact"):
            # scoped x64 so the f64 stages trace/execute in real float64
            # without flipping process-global precision semantics
            with jax.enable_x64():
                return self._batch_fn(
                    signals,
                    jnp.asarray(num_frames),
                    jnp.asarray(eff_len),
                    padded_len=signals.shape[1],
                )
        return self._batch_fn(
            signals,
            jnp.asarray(num_frames),
            jnp.asarray(eff_len),
            padded_len=signals.shape[1],
        )

    def compute(self, signal) -> np.ndarray:
        """Single-utterance convenience matching the reference
        ``FeatureComputer.__call__`` output (feat.py:42-69): returns the
        ``[num_frames, dim]`` trimmed feature matrix."""
        signal = np.asarray(signal)
        feats, nframes = self(signal[None, :], np.asarray([signal.shape[0]]))
        return np.asarray(feats[0, : int(nframes[0])])


# the split keeps 24-12 = 12 significand bits in the leading term, so
# leading x leading products are exact in f32 (12+12 = 24 bits)
_TRUNC_MASK = ~np.int32(0xFFF)


def _df_split_np(m: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split a float64 array into three float32 terms ``(a, b, lo)`` with
    ``m ≈ a + b + lo``: ``a`` carries the top ≤12 significand bits (low
    mantissa bits truncated via integer masking — exact, branch-free, and
    immune to compiler reassociation), ``b = f32(m) - a`` the next ≤12,
    ``lo`` the f32 residual of the float64 value."""
    hi = m.astype(np.float32)
    lo = (m - hi.astype(np.float64)).astype(np.float32)
    a = (hi.view(np.int32) & _TRUNC_MASK).view(np.float32)
    b = hi - a  # exact (Sterbenz)
    return a, b, lo


def _df_split_traced(m: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Traced (f64, x64-enabled) version of :func:`_df_split_np`."""
    hi = m.astype(jnp.float32)
    lo = (m - hi.astype(jnp.float64)).astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(hi, jnp.int32)
    a = jax.lax.bitcast_convert_type(bits & jnp.int32(_TRUNC_MASK), jnp.float32)
    b = hi - a
    return a, b, lo


def _df_matmul(lhs_split, basis64: np.ndarray, aa_chunk: int = 128) -> jnp.ndarray:
    """``[..., K] @ [K, N]`` against a float64 host-side basis via the
    double-float split, as f32 MXU matmuls with partial sums combined in f64.

    ``lhs_split`` is the ``(a, b, lo)`` triple from :func:`_df_split_traced`.
    Term magnitudes: ``aa'`` = 1, ``ab'``/``ba'`` = 2^-12,
    ``bb'``/``a·lo'``/``lo·a'`` = 2^-24; everything smaller is dropped
    (≤2^-35 relative). The ``aa'`` products are EXACT in f32 (12+12 = 24
    significand bits), so the scheme's only first-order error is the f32
    *accumulation* of the ``aa'`` contraction — that term alone is chunked
    to ``aa_chunk`` with the chunk partials combined in f64
    (error ≈ aa_chunk·2^-24 relative). The five correction matmuls carry
    ≤2^-12 of the magnitude, so their full-``K`` f32 accumulation error is
    second-order and they run as single matmuls.

    ``aa_chunk`` therefore sets the accuracy/dispatch trade-off: 128 gives
    ~7.6e-6 worst-case relative (fine before the log non-linearity turns
    relative into absolute error that delta/ddelta then amplify ≤6x/36x);
    16 gives ~1e-6 for the post-log mel chain.
    """
    la_full, lb_full, llo_full = lhs_split
    k = basis64.shape[0]
    n_chunks = -(-k // aa_chunk)
    dn = (((la_full.ndim - 1,), (0,)), ((), ()))
    mm32 = dict(
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    ba_f, bb_f, blo_f = _df_split_np(np.asarray(basis64))
    ra = jnp.asarray(ba_f)
    out = (
        jax.lax.dot_general(la_full, jnp.asarray(bb_f), **mm32).astype(jnp.float64)
        + jax.lax.dot_general(lb_full, ra, **mm32).astype(jnp.float64)
        + (
            jax.lax.dot_general(lb_full, jnp.asarray(bb_f), **mm32)
            + jax.lax.dot_general(la_full, jnp.asarray(blo_f), **mm32)
            + jax.lax.dot_general(llo_full, ra, **mm32)
        ).astype(jnp.float64)
    )
    for i in range(n_chunks):
        s = slice(i * aa_chunk, min((i + 1) * aa_chunk, k))
        out = out + jax.lax.dot_general(la_full[..., s], ra[s], **mm32).astype(
            jnp.float64
        )
    return out


def _reflect_deriv(feat: jnp.ndarray, num_frames: jnp.ndarray) -> jnp.ndarray:
    """First-order derivative filter with per-utterance reflect boundaries.

    Matches ``scipy.ndimage.convolve1d(x, [2,1,0,-1,-2], axis=0)`` (mode
    'reflect') applied to each utterance's valid frames (base.py:249-259):
    ``out[t] = 2x[t+2] + x[t+1] - x[t-1] - 2x[t-2]`` with indices mirrored
    at 0 and ``n-1`` (edge-inclusive reflection).
    """
    b, t_max, _ = feat.shape
    t = jnp.arange(t_max, dtype=jnp.int32)[None, :]  # [1, T]
    n = jnp.maximum(num_frames, 1)[:, None]  # [B, 1]
    out = jnp.zeros_like(feat)
    for d, w in zip(range(-2, 3), _DERIV_TAPS):
        if w == 0.0:
            continue
        i = t + d
        i = jnp.where(i < 0, -i - 1, i)
        i = jnp.where(i >= n, 2 * n - 1 - i, i)
        # second pass for pathologically short utterances (n <= 2)
        i = jnp.where(i < 0, -i - 1, i)
        i = jnp.clip(i, 0, t_max - 1)
        gathered = jnp.take_along_axis(feat, i[:, :, None], axis=1)
        out = out + w * gathered
    return out
