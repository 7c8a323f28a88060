"""Streaming (chunked) acoustic feature extraction.

``OnlineFeatureExtractor`` consumes raw audio in arbitrary chunks and
emits feature frames as soon as enough samples exist, producing exactly
the frames the offline batched ``FeatureExtractor`` would produce for the
whole utterance (reference semantics: feat.py:42-69 over
sigproc.py:33-68's framing). Together with ``decode/online.py`` this
closes the low-latency path: wav chunks → features → likelihoods or CTC
labels, all incremental.

How exactness is achieved:

- Preemphasis is a one-sample recurrence ``y[n] = x[n] - a·x[n-1]``
  (sigproc.py:180-191); the last raw sample of each chunk is carried so
  chunk boundaries are invisible. It runs on device in the same working
  dtype as the offline path (f64 for ``high``/``exact``, f32 for
  ``fast``), so per-sample results are bit-identical to the offline
  elementwise op.
- Framing keeps a per-row buffer of not-yet-consumed *preemphasized*
  samples. A frame is emitted once all ``frame_len`` of its samples
  exist; with ``snip_edges`` (feat.py:86-88) that is precisely the
  offline frame set, because snipping makes every frame fully interior.
- The emitted frames feed ``FeatureExtractor._frames_to_feats`` — the
  very code the offline path runs after its gather — so DFT, mel, log,
  energy and masking are the byte-identical compute.
- ``flush()`` finishes the utterance: the zero-padded final frame(s)
  that depend on knowing the true length (the ``snip_edges = False``
  tail, and the short-utterance single frame) are emitted there, again
  matching the offline geometry (``FeatureExtractor.frame_geometry``).

Delta/double-delta dynamics are whole-utterance operators with a
reflected boundary at *both* ends (base.py:249-284) — emitting them
incrementally would require lookahead latency and end-of-utterance
recomputation, so this extractor requires ``dynamic = "nodelta"``
(the standard configuration for recurrent/CTC streaming models, which
learn their own dynamics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.frontend.features import FeatureExtractor


class OnlineFeatureExtractor:
    """Chunked feature computation over a batch of parallel audio streams.

    Usage::

        ext = FeatureExtractor(opts, samplerate)
        online = OnlineFeatureExtractor(ext)
        online.reset(batch_size)
        for chunk, chunk_lengths in audio_chunks:   # [B, S], [B]
            feats, n_new = online.step(chunk, chunk_lengths)
        feats, n_new = online.flush()               # final padded frame(s)

    Rows may advance at different rates (per-chunk ``lengths``); a row
    whose stream has ended simply passes length 0 until ``flush``.
    """

    def __init__(
        self, extractor: FeatureExtractor, frame_bucket: int = 8,
        _emit_static: bool = False,
    ):
        """Args:
            extractor: the configured offline extractor to mirror.
            frame_bucket: emitted frame counts are padded up to a multiple
                of this so jit recompiles stay bounded for varying chunk
                sizes (outputs carry true counts; padding frames are
                zeroed).
            _emit_static: internal (OnlineDynamicExtractor): emit the
                WORK-dtype static features (pre-dynamics, pre-f32-cast)
                instead of the finished f32 features.
        """
        if extractor.opts.dynamic != "nodelta" and not _emit_static:
            raise ValueError(
                "online extraction of delta features goes through "
                "OnlineDynamicExtractor (delta dynamics are whole-"
                "utterance operators, base.py:249-284; it buffers the "
                "lookahead they need)"
            )
        self.extractor = extractor
        self.frame_bucket = int(frame_bucket)
        self._emit_static = bool(_emit_static)
        high = extractor.spectrum_precision in ("high", "exact")
        self._x64 = high
        self._np_dtype = np.float64 if high else np.float32
        self._buf = None  # per-row preemphasized, not-yet-consumed samples
        self._dim = None

        a = float(extractor.opts.preemph)

        def preemph(x, prev):
            shifted = jnp.concatenate([prev[:, None], x[:, :-1]], axis=1)
            return x - a * shifted

        self._preemph_fn = jax.jit(preemph)

    @property
    def dim(self) -> int:
        """Feature dimension (probed once on first use; cached)."""
        if self._dim is None:
            wl = self.extractor.frame_len
            feats, _ = self._run_frames(
                np.zeros((1, 1, wl), self._np_dtype), np.asarray([1])
            )
            self._dim = int(feats.shape[-1])
        return self._dim

    def reset(self, batch_size: int) -> None:
        self._buf = [np.zeros((0,), self._np_dtype) for _ in range(batch_size)]
        self._prev = np.zeros((batch_size,), self._np_dtype)
        self._total = np.zeros((batch_size,), np.int64)
        self._emitted = np.zeros((batch_size,), np.int64)

    # ------------------------------------------------------------------

    def _run_frames(self, frames: np.ndarray, num_frames: np.ndarray):
        """[B, T, wl] work-dtype frames → ([B, T, D] feats, counts) —
        finished f32 features, or work-dtype statics in static mode."""

        def run():
            if self._emit_static:
                feats = self.extractor._static_fn(
                    jnp.asarray(frames), jnp.asarray(num_frames, jnp.int32)
                )
                return feats, num_frames
            return self.extractor._frames_fn(
                jnp.asarray(frames), jnp.asarray(num_frames, jnp.int32)
            )

        if self._x64:
            with jax.enable_x64():
                feats, nf = run()
        else:
            feats, nf = run()
        return np.asarray(feats), np.asarray(nf)

    def _emit(self, navail: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Cut ``navail[row]`` frames from the head of each row's buffer,
        advance the buffers, and run the feature tail."""
        wl = self.extractor.frame_len
        ws = self.extractor.frame_step
        navail = navail.astype(np.int64)
        t_new = int(navail.max(initial=0))
        if t_new == 0:
            b = len(self._buf)
            dt = self._np_dtype if self._emit_static else np.float32
            return np.zeros((b, 0, self.dim), dt), navail.astype(np.int32)
        t_pad = -(-t_new // self.frame_bucket) * self.frame_bucket
        frames = np.zeros((len(self._buf), t_pad, wl), self._np_dtype)
        for row, n in enumerate(navail):
            if n == 0:
                continue
            span = self._buf[row][: (n - 1) * ws + wl]
            # one strided view, then copy into the padded batch
            view = np.lib.stride_tricks.sliding_window_view(span, wl)[::ws]
            frames[row, :n] = view
            self._buf[row] = self._buf[row][n * ws :]
            self._emitted[row] += n
        feats, _ = self._run_frames(frames, navail)
        return feats, navail.astype(np.int32)

    def step(self, chunk, lengths) -> tuple[np.ndarray, np.ndarray]:
        """Feed ``[B, S]`` raw samples (``lengths[B]`` valid per row);
        returns ``(feats[B, T, D], new_frames[B])`` for every frame whose
        window is now complete. ``T`` is bucket-padded; frames beyond
        ``new_frames[row]`` are zeros."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before step()")
        chunk = np.asarray(chunk)
        lengths = np.asarray(lengths, np.int64)
        wl = self.extractor.frame_len
        ws = self.extractor.frame_step

        x = chunk.astype(self._np_dtype)
        if self._x64:
            with jax.enable_x64():
                y = np.asarray(self._preemph_fn(jnp.asarray(x), jnp.asarray(self._prev)))
        else:
            y = np.asarray(self._preemph_fn(jnp.asarray(x), jnp.asarray(self._prev)))

        navail = np.zeros((len(self._buf),), np.int64)
        for row, n in enumerate(lengths):
            n = int(n)
            if n > 0:
                self._buf[row] = np.concatenate([self._buf[row], y[row, :n]])
                self._prev[row] = x[row, n - 1]
                self._total[row] += n
            have = self._buf[row].shape[0]
            navail[row] = 0 if have < wl else (have - wl) // ws + 1
        return self._emit(navail)

    def flush(self) -> tuple[np.ndarray, np.ndarray]:
        """End every stream: emit the remaining frames the offline
        geometry produces for the now-known total lengths (zero-padded
        tail frames under ``snip_edges = False``; the single padded frame
        of a shorter-than-one-window utterance), then require ``reset``."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before flush()")
        out = self._flush_impl(range(len(self._buf)))
        self._buf = None
        return out

    def _flush_impl(self, rows) -> tuple[np.ndarray, np.ndarray]:
        wl = self.extractor.frame_len
        ws = self.extractor.frame_step
        target, _ = self.extractor.frame_geometry(self._total)
        rem = np.zeros((len(self._buf),), np.int64)
        sel = np.asarray(list(rows), np.int64)
        rem[sel] = np.maximum(target.astype(np.int64) - self._emitted, 0)[sel]
        for row, r in enumerate(rem):
            if r == 0:
                continue
            needed = (int(r) - 1) * ws + wl
            have = self._buf[row].shape[0]
            if needed > have:
                # literal zeros past the utterance end, exactly as the
                # offline path masks-then-frames (features.py step 3)
                self._buf[row] = np.concatenate(
                    [self._buf[row], np.zeros((needed - have,), self._np_dtype)]
                )
        return self._emit(rem)

    def flush_rows(self, rows) -> tuple[np.ndarray, np.ndarray]:
        """``flush()`` for a subset of rows: emit THEIR remaining frames
        (other rows emit 0 and keep streaming undisturbed). The extractor
        stays usable; re-arm the finished rows with ``reset_rows`` before
        their slots take a new stream. Multi-stream serving uses this to
        end one slot of a shared batch."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before flush_rows()")
        return self._flush_impl(rows)

    def reset_rows(self, rows) -> None:
        """Re-arm a subset of rows for a new stream (the per-slot analog
        of ``reset``); other rows' buffers are untouched."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before reset_rows()")
        for row in rows:
            self._buf[row] = np.zeros((0,), self._np_dtype)
            self._prev[row] = 0
            self._total[row] = 0
            self._emitted[row] = 0


class OnlineDynamicExtractor:
    """Streaming delta / double-delta features matching the offline batch
    (static columns bit-identical; derivative columns within a few f64
    ulps — see tests/test_online_features.py for the exact bar and why).

    The dynamics filter (``[2,1,0,-1,-2]`` reflect-boundary correlation,
    base.py:249-284) needs ``A`` future frames per output frame (A=2 for
    ``delta``, 4 for ``ddelta``) plus the true end-of-utterance boundary.
    This wrapper streams the per-frame STATIC features (work dtype,
    ``OnlineFeatureExtractor`` in static mode), buffers them, and emits
    frame ``t`` once frame ``t+A`` exists, running each emission through
    the offline path's own traced dynamics tail
    (``FeatureExtractor._apply_dynamics``) over a window of
    ``[t - lead, t + n - 1 + A]`` — the window's edge reflections then
    either never reach the emitted frames (interior) or are exactly the
    true utterance-start reflection (``lead = min(A, t)``). ``flush()``
    passes the true final frame count so the end reflection matches the
    offline geometry. Same ``reset/step/flush`` API as
    ``OnlineFeatureExtractor`` (so ``StreamingTranscriber`` accepts it).
    """

    def __init__(self, extractor: FeatureExtractor, frame_bucket: int = 8):
        if extractor.opts.dynamic == "nodelta":
            raise ValueError(
                "dynamic = 'nodelta' streams through OnlineFeatureExtractor"
            )
        self.extractor = extractor
        self.frame_bucket = int(frame_bucket)
        self.lookahead = {"delta": 2, "ddelta": 4}[extractor.opts.dynamic]
        self._static = OnlineFeatureExtractor(
            extractor, frame_bucket, _emit_static=True
        )
        self._buf = None

    @property
    def dim(self) -> int:
        mult = {"delta": 2, "ddelta": 3}[self.extractor.opts.dynamic]
        return self._static.dim * mult

    def reset(self, batch_size: int) -> None:
        self._static.reset(batch_size)
        self._buf = [None] * batch_size  # static frames from index _start on
        self._start = np.zeros((batch_size,), np.int64)
        self._total = np.zeros((batch_size,), np.int64)
        self._emitted = np.zeros((batch_size,), np.int64)

    def _ingest(self, feats: np.ndarray, nnew: np.ndarray) -> None:
        for row, n in enumerate(nnew):
            n = int(n)
            if n == 0:
                continue
            new = feats[row, :n]
            self._buf[row] = (
                new.copy()
                if self._buf[row] is None
                else np.concatenate([self._buf[row], new])
            )
            self._total[row] += n

    def _emit(self, navail: np.ndarray, flushing: bool):
        a = self.lookahead
        b = len(self._buf)
        t_new = int(navail.max(initial=0))
        if t_new == 0:
            return (
                np.zeros((b, 0, self.dim), np.float32),
                navail.astype(np.int32),
            )
        sdim = self._static.dim
        # window = lead frames of left context + n emitted + (A right
        # context unless flushing, where the buffer ends at the true end)
        leads = np.minimum(self._emitted, a).astype(np.int64)
        wlens = leads + navail + (0 if flushing else a)
        wmax = int(wlens.max())
        wmax_pad = -(-wmax // self.frame_bucket) * self.frame_bucket
        windows = np.zeros((b, wmax_pad, sdim), self._static._np_dtype)
        for row, n in enumerate(navail):
            n = int(n)
            if n == 0:
                continue
            first = int(self._emitted[row] - leads[row] - self._start[row])
            windows[row, : int(wlens[row])] = self._buf[row][
                first : first + int(wlens[row])
            ]
        nf = jnp.asarray(wlens, jnp.int32)
        if self._static._x64:
            with jax.enable_x64():
                out, _ = self.extractor._dynamics_fn(jnp.asarray(windows), nf)
        else:
            out, _ = self.extractor._dynamics_fn(jnp.asarray(windows), nf)
        out = np.asarray(out)
        t_pad = -(-t_new // self.frame_bucket) * self.frame_bucket
        result = np.zeros((b, t_pad, self.dim), np.float32)
        for row, n in enumerate(navail):
            n = int(n)
            if n == 0:
                continue
            lead = int(leads[row])
            result[row, :n] = out[row, lead : lead + n]
            self._emitted[row] += n
            # keep only the frames future windows can still reach
            keep_from = int(max(0, self._emitted[row] - a) - self._start[row])
            if keep_from > 0:
                self._buf[row] = self._buf[row][keep_from:]
                self._start[row] += keep_from
        return result, navail.astype(np.int32)

    def step(self, chunk, lengths):
        """``[B, S]`` raw samples → ``(feats[B, T, D] f32, counts)`` for
        every frame whose ``A``-frame dynamics lookahead is complete."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before step()")
        self._ingest(*self._static.step(chunk, lengths))
        navail = np.maximum(
            self._total - self.lookahead - self._emitted, 0
        )
        return self._emit(navail, flushing=False)

    def flush(self):
        """Emit the remaining frames with the true end-of-utterance
        reflection, then require ``reset``."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before flush()")
        self._ingest(*self._static.flush())
        out = self._emit(self._total - self._emitted, flushing=True)
        self._buf = None
        return out

    def flush_rows(self, rows):
        """``flush()`` for a subset of rows (see
        ``OnlineFeatureExtractor.flush_rows``): emits their remaining
        frames with the true end reflection; other rows keep streaming."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before flush_rows()")
        self._ingest(*self._static.flush_rows(rows))
        sel = np.asarray(list(rows), np.int64)
        rem = np.zeros((len(self._buf),), np.int64)
        rem[sel] = (self._total - self._emitted)[sel]
        return self._emit(rem, flushing=True)

    def reset_rows(self, rows) -> None:
        """Re-arm a subset of rows for a new stream (the per-slot analog
        of ``reset``)."""
        if self._buf is None:
            raise RuntimeError("call reset(batch_size) before reset_rows()")
        self._static.reset_rows(rows)
        for row in rows:
            self._buf[row] = None
            self._start[row] = 0
            self._total[row] = 0
            self._emitted[row] = 0


class FusedOnlineFeatureExtractor:
    """Device-resident streaming front-end: ONE device dispatch per push.

    ``OnlineFeatureExtractor`` above makes ~3 device synchronizations per
    push (preemphasis dispatch + readback, feature dispatch + readback,
    and a CMVN dispatch in the transcriber), because its sample buffers
    live on the host. Measured over the staging tunnel that dispatch
    count IS the chunk latency (docs/PERF_STREAMING.md: ~80 of ~135 ms
    p50 for the conformer path); this class keeps the buffers ON DEVICE
    and fuses preemphasis → framing → the feature tail → optional CMVN
    into one jitted call whose output stays on device (no readback — the
    decoder's jitted step consumes it directly), so a transcriber push
    costs exactly TWO dispatches and one readback end to end.

    Exactness: feature outputs are bit-identical to
    ``OnlineFeatureExtractor`` — the preemphasis is the same traced op on
    the same values, framing is a gather of the same buffered samples,
    and the feature tail is the extractor's own ``_frames_to_feats``. The
    fused CMVN runs the same f32 math the unfused transcriber executes
    but inside one program, where XLA's fusion rounds differently by up
    to ~2 f32 ulps (tests/test_fused_frontend.py pins both bounds).
    Host-side cursors (totals, emitted counts, buffer fill) are mirrored
    deterministically from the pushed lengths, so no device value is
    ever read back mid-stream.

    Geometry: the device buffer holds not-yet-consumed preemphasized
    samples (always < frame_len after a push, so capacity is
    ``frame_len + padded_chunk``); pushes are padded to a multiple of
    ``sample_bucket`` to bound recompiles, and the emitted frame capacity
    is the static maximum for that padding. ``dynamic = "nodelta"`` only
    (the delta path buffers lookahead in ``OnlineDynamicExtractor``).

    Same ``reset/step/flush/flush_rows/reset_rows`` API as
    ``OnlineFeatureExtractor``; ``step`` returns a DEVICE array.
    """

    def __init__(
        self, extractor: FeatureExtractor, sample_bucket: int = 256,
        cmvn: np.ndarray | None = None,
    ):
        if extractor.opts.dynamic != "nodelta":
            raise ValueError(
                "the fused online frontend streams static features only; "
                "delta dynamics go through OnlineDynamicExtractor"
            )
        self.extractor = extractor
        self.sample_bucket = int(sample_bucket)
        high = extractor.spectrum_precision in ("high", "exact")
        self._x64 = high
        self._work = jnp.float64 if high else jnp.float32
        # the unfused transcriber applies CMVN outside any x64 scope, so
        # the f64 stats silently compute in f32 — match that exactly
        self._cmvn32 = None if cmvn is None else np.asarray(cmvn, np.float32)
        self._state = None
        self._cap = 0
        self._fns = {}  # cap -> jitted step
        #: device dispatches made since construction (the quantity
        #: docs/PERF_STREAMING.md tracks; tests pin <= 1 per push)
        self.dispatch_count = 0

    @property
    def dim(self) -> int:
        return self.extractor.opts.base_dim

    def fuse_cmvn(self, stats: np.ndarray) -> None:
        """Fold CMVN into the fused call (transcribers hand their stats
        over so the whole front-end stays one dispatch)."""
        self._cmvn32 = np.asarray(stats, np.float32)
        self._fns = {}

    # ------------------------------------------------------------------

    def _build_fn(self, cap: int):
        ext = self.extractor
        wl, ws = ext.frame_len, ext.frame_step
        frames_cap = (cap - wl) // ws + 1
        a = float(ext.opts.preemph)
        work = self._work
        cmvn32 = self._cmvn32

        def step(chunk, lengths, navail, buf, nbuf, prev):
            b, s = chunk.shape
            x = chunk.astype(work)
            shifted = jnp.concatenate([prev[:, None], x[:, :-1]], axis=1)
            y = x - a * shifted  # the same op OnlineFeatureExtractor runs
            last = jnp.take_along_axis(
                x, jnp.clip(lengths - 1, 0, s - 1)[:, None], axis=1
            )[:, 0]
            prev = jnp.where(lengths > 0, last, prev)
            # append y[:, :lengths] at offset nbuf (masked gather, no scatter)
            i = jnp.arange(cap, dtype=jnp.int32)[None, :]
            src = i - nbuf[:, None]
            take = (src >= 0) & (src < lengths[:, None])
            yg = jnp.take_along_axis(y, jnp.clip(src, 0, s - 1), axis=1)
            buf = jnp.where(take, yg, buf)
            nbuf = nbuf + lengths
            # cut navail frames from the head (offline framing geometry)
            fidx = (
                jnp.arange(frames_cap, dtype=jnp.int32)[:, None] * ws
                + jnp.arange(wl, dtype=jnp.int32)[None, :]
            )
            frames = buf[:, fidx]  # [B, frames_cap, wl]
            tmask = jnp.arange(frames_cap, dtype=jnp.int32)[None, :] < navail[:, None]
            frames = jnp.where(tmask[:, :, None], frames, 0.0)
            feats, _ = ext._frames_to_feats(frames, navail)
            if cmvn32 is not None:
                from tfkaldi_tpu.frontend.cmvn import apply_cmvn

                feats = apply_cmvn(feats, jnp.asarray(cmvn32))
                feats = jnp.where(tmask[:, :, None], feats, 0.0)
            # advance: drop the consumed samples, keep zeros past the fill
            consumed = navail * ws
            src2 = i + consumed[:, None]
            keep = src2 < nbuf[:, None]
            shifted_buf = jnp.take_along_axis(
                buf, jnp.clip(src2, 0, cap - 1), axis=1
            )
            buf = jnp.where(keep, shifted_buf, 0.0)
            nbuf = nbuf - consumed
            return feats, buf, nbuf, prev

        return jax.jit(step)

    def _x64_scope(self):
        import contextlib

        return jax.enable_x64() if self._x64 else contextlib.nullcontext()

    def _ensure_cap(self, s_pad: int) -> None:
        need = self.extractor.frame_len + s_pad
        if need <= self._cap:
            return
        old_cap = self._cap
        self._cap = need
        if self._state is not None and old_cap:
            buf, nbuf, prev = self._state
            with self._x64_scope():
                buf = jnp.pad(buf, ((0, 0), (0, self._cap - old_cap)))
            self._state = (buf, nbuf, prev)

    def reset(self, batch_size: int) -> None:
        self._ensure_cap(self.sample_bucket)
        with self._x64_scope():
            self._state = (
                jnp.zeros((batch_size, self._cap), self._work),
                jnp.zeros((batch_size,), jnp.int32),
                jnp.zeros((batch_size,), self._work),
            )
        self._nbuf = np.zeros((batch_size,), np.int64)
        self._total = np.zeros((batch_size,), np.int64)
        self._emitted = np.zeros((batch_size,), np.int64)

    def _run(self, chunk: np.ndarray, lengths: np.ndarray, navail: np.ndarray):
        """One fused dispatch: returns (device feats [B, frames_cap, D],
        counts). Skipped entirely when nothing is pushed or emitted."""
        b = len(self._nbuf)
        counts = navail.astype(np.int32)
        if int(lengths.max(initial=0)) == 0 and int(navail.max(initial=0)) == 0:
            return np.zeros((b, 0, self.dim), np.float32), counts
        s_pad = max(
            -(-int(chunk.shape[1]) // self.sample_bucket) * self.sample_bucket,
            self.sample_bucket,
        )
        self._ensure_cap(s_pad)
        cap = self._cap
        fn = self._fns.get(cap)
        if fn is None:
            fn = self._fns[cap] = self._build_fn(cap)
        if chunk.shape[1] < s_pad:
            chunk = np.pad(chunk, ((0, 0), (0, s_pad - chunk.shape[1])))

        def run():
            return fn(
                jnp.asarray(chunk.astype(np.float32 if not self._x64 else np.float64)),
                jnp.asarray(lengths, jnp.int32),
                jnp.asarray(navail, jnp.int32),
                *self._state,
            )

        if self._x64:
            with jax.enable_x64():
                feats, buf, nbuf, prev = run()
        else:
            feats, buf, nbuf, prev = run()
        self._state = (buf, nbuf, prev)
        self.dispatch_count += 1
        return feats, counts

    def step(self, chunk, lengths):
        """Feed ``[B, S]`` raw samples; returns ``(feats[B, T, D] on
        DEVICE, new_frames[B])`` for every frame whose window is complete
        — one device dispatch, no readback."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before step()")
        chunk = np.asarray(chunk)
        lengths = np.asarray(lengths, np.int64)
        wl, ws = self.extractor.frame_len, self.extractor.frame_step
        have = self._nbuf + lengths
        navail = np.where(have < wl, 0, (have - wl) // ws + 1)
        self._nbuf = have - navail * ws
        self._total += lengths
        self._emitted += navail
        return self._run(chunk, lengths, navail)

    def flush(self):
        """End every stream: emit the remaining offline-geometry frames
        (zero-padded tails), then require ``reset``."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before flush()")
        out = self._flush_impl(range(len(self._nbuf)))
        self._state = None
        return out

    def _flush_impl(self, rows):
        b = len(self._nbuf)
        target, _ = self.extractor.frame_geometry(self._total)
        rem = np.zeros((b,), np.int64)
        sel = np.asarray(list(rows), np.int64)
        rem[sel] = np.maximum(target.astype(np.int64) - self._emitted, 0)[sel]
        wl, ws = self.extractor.frame_len, self.extractor.frame_step
        # tail frames read literal zeros past the buffer fill — the buffer
        # is kept zeroed there, exactly the offline mask-then-frame pad
        needed = np.where(rem > 0, (rem - 1) * ws + wl, 0)
        if int(needed.max(initial=0)) > self._cap:
            self._ensure_cap(int(needed.max()) - self.extractor.frame_len)
        self._emitted += rem
        self._nbuf = np.maximum(self._nbuf - rem * ws, 0)
        return self._run(np.zeros((b, 0)), np.zeros((b,), np.int64), rem)

    def flush_rows(self, rows):
        """``flush()`` for a subset of rows; other rows emit 0 and keep
        streaming undisturbed."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before flush_rows()")
        return self._flush_impl(rows)

    def reset_rows(self, rows) -> None:
        """Re-arm a subset of rows for a new stream; other rows' device
        buffers are untouched (row-masked zeroing, still one dispatch)."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before reset_rows()")
        b = len(self._nbuf)
        sel = np.zeros((b,), bool)
        idx = np.asarray(list(rows), np.int64)
        sel[idx] = True
        buf, nbuf, prev = self._state
        with self._x64_scope():
            mask = jnp.asarray(sel)
            self._state = (
                jnp.where(mask[:, None], 0.0, buf).astype(buf.dtype),
                jnp.where(mask, 0, nbuf).astype(nbuf.dtype),
                jnp.where(mask, 0.0, prev).astype(prev.dtype),
            )
        self._nbuf[idx] = 0
        self._total[idx] = 0
        self._emitted[idx] = 0
