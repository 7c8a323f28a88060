"""Persistent decode service.

The reference rebuilds its TF graph and reloads weights for every decode
run (neuralNetworks/decoder.py:8-47 — a batch-1 graph per invocation);
for production serving this module loads the model ONCE (weights resident
on the TPU, forward jitted once) and then processes decode jobs as they
arrive.

Job contract (filesystem spool — the same interchange style as the rest of
the pipeline): a job is a directory dropped under ``watch_dir`` containing
a featdir (``feats.scp``, ``cmvn.scp`` unless CMVN is disabled,
``utt2spk``). The service writes
``out_dir/<job>/likelihoods.{ark,scp}`` (hybrid mode) or
``out_dir/<job>/text`` (CTC mode) plus a ``DONE`` marker, and skips jobs
already marked done — restart-safe, like every other stage.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from tfkaldi_tpu.data.feature_reader import FeatureReader
from tfkaldi_tpu.io import ArkWriter
from tfkaldi_tpu.train import Trainer, TrainerConfig
from tfkaldi_tpu.train import checkpoint as ckpt

log = logging.getLogger(__name__)


class DecodeService:
    """Model-resident decode worker over a filesystem spool."""

    def __init__(
        self,
        nnet,  # tfkaldi_tpu.nnet.Nnet (config already parsed)
        watch_dir: str,
        out_dir: str,
        *,
        coder=None,  # required for text modes (ctc / rnnt / attention)
        batch_size: int = 16,
    ):
        self.nnet = nnet
        self.watch_dir = watch_dir
        self.out_dir = out_dir
        self.coder = coder
        self.batch_size = batch_size
        os.makedirs(watch_dir, exist_ok=True)
        os.makedirs(out_dir, exist_ok=True)

        # load weights once; jit once
        trainer = Trainer(nnet.model, TrainerConfig())
        template = trainer.init_state(jax.random.PRNGKey(0))
        state = ckpt.restore_state(os.path.join(nnet.savedir, "final"), template)
        if nnet.loss_type in ("ctc", "rnnt", "attention"):
            if coder is None:
                raise ValueError("text-decode service needs a target coder")
            from tfkaldi_tpu.decode.lm import fusion_from_config

            beam_width = int(nnet.conf.get("beam_width", 1))
            if nnet.loss_type == "attention":
                if nnet.conf.get("decode_mode", "beam") == "rescoring":
                    from tfkaldi_tpu.decode.seq2seq import CTCRescoreDecoder

                    self._decoder = CTCRescoreDecoder(
                        nnet.model, state.params, state.model_state, coder,
                        beam_width=int(nnet.conf.get("beam_width", 10)),
                        rescore_weight=float(
                            nnet.conf.get("rescore_weight", 0.5)
                        ),
                        max_tokens=int(nnet.conf.get("max_decode_tokens", 100)),
                    )
                else:
                    from tfkaldi_tpu.decode.seq2seq import Seq2SeqBeamDecoder

                    self._decoder = Seq2SeqBeamDecoder(
                        nnet.model, state.params, state.model_state, coder,
                        beam_width=beam_width,
                        max_tokens=int(nnet.conf.get("max_decode_tokens", 100)),
                        length_penalty=float(nnet.conf.get("length_penalty", 0.0)),
                        fusion_table=fusion_from_config(
                            nnet.conf, coder, list(coder.alphabet) + ["</s>"]
                        ),
                    )
            elif nnet.loss_type == "rnnt":
                max_symbols = int(nnet.conf.get("max_symbols_per_frame", 4))
                if beam_width > 1:
                    from tfkaldi_tpu.decode.transducer_beam import (
                        TransducerBeamDecoder,
                    )

                    self._decoder = TransducerBeamDecoder(
                        nnet.model, state.params, state.model_state, coder,
                        beam_width=beam_width,
                        max_symbols_per_frame=max_symbols,
                        fusion_table=fusion_from_config(
                            nnet.conf, coder, list(coder.alphabet)
                        ),
                    )
                else:
                    from tfkaldi_tpu.decode.transducer import TransducerDecoder

                    self._decoder = TransducerDecoder(
                        nnet.model, state.params, state.model_state, coder,
                        max_symbols_per_frame=max_symbols,
                    )
            else:
                from tfkaldi_tpu.decode.ctc import CTCDecoder

                self._decoder = CTCDecoder(
                    nnet.model, state.params, state.model_state, coder, nnet.blank_id,
                    beam_width=beam_width,
                )
        else:
            from tfkaldi_tpu.decode import Decoder

            prior = np.load(os.path.join(nnet.savedir, "prior.npy"))
            self._decoder = Decoder(nnet.model, state.params, state.model_state, prior)

    # ------------------------------------------------------------------

    def _pending_jobs(self) -> list[str]:
        jobs = []
        for name in sorted(os.listdir(self.watch_dir)):
            jobdir = os.path.join(self.watch_dir, name)
            if not os.path.isdir(jobdir):
                continue
            if not os.path.isfile(os.path.join(jobdir, "feats.scp")):
                continue  # not (yet) a complete job
            outdir = os.path.join(self.out_dir, name)
            if os.path.isfile(os.path.join(outdir, "DONE")):
                continue
            if os.path.isfile(os.path.join(outdir, "FAILED")):
                continue  # quarantined — operator removes the marker to retry
            jobs.append(name)
        return jobs

    def _reader(self, jobdir: str) -> FeatureReader:
        cmvn = os.path.join(jobdir, "cmvn.scp")
        return FeatureReader(
            os.path.join(jobdir, "feats.scp"),
            cmvn if os.path.isfile(cmvn) else None,
            os.path.join(jobdir, "utt2spk"),
            self.nnet.context_width,
            0,  # max_input_length unused by streaming decode
        )

    def process_job(self, name: str) -> int:
        """Decode one job directory; returns #utterances."""
        jobdir = os.path.join(self.watch_dir, name)
        outdir = os.path.join(self.out_dir, name)
        os.makedirs(outdir, exist_ok=True)
        reader = self._reader(jobdir)
        if self.nnet.loss_type in ("ctc", "rnnt", "attention"):
            count = self._decoder.decode_to_file(
                reader, os.path.join(outdir, "text"), batch_size=self.batch_size
            )
        else:
            ark = os.path.join(outdir, "likelihoods.ark")
            if os.path.isfile(ark):
                os.remove(ark)
            with ArkWriter(os.path.join(outdir, "feats.scp"), ark) as writer:
                count = self._decoder.decode_to_writer(
                    reader, writer, batch_size=self.batch_size
                )
        with open(os.path.join(outdir, "DONE"), "w") as f:
            f.write(f"{count}\n")
        log.info("job %s: decoded %d utterances", name, count)
        return count

    def process_pending(self) -> int:
        """One spool sweep; returns #jobs successfully processed.

        A failing job is quarantined with a FAILED marker (traceback
        inside) instead of crashing the daemon — one malformed or
        half-copied job must not wedge the service across restarts.
        """
        import traceback

        done = 0
        for name in self._pending_jobs():
            try:
                self.process_job(name)
                done += 1
            except Exception:
                log.exception("job %s failed; quarantining", name)
                outdir = os.path.join(self.out_dir, name)
                os.makedirs(outdir, exist_ok=True)
                with open(os.path.join(outdir, "FAILED"), "w") as f:
                    f.write(traceback.format_exc())
        return done

    def run(self, poll_seconds: float = 1.0, stop=lambda: False) -> None:
        """Poll the spool until ``stop()`` returns True."""
        log.info("decode service watching %s", self.watch_dir)
        while not stop():
            if self.process_pending() == 0:
                time.sleep(poll_seconds)


def global_cmvn(featdir: str) -> np.ndarray:
    """Corpus-global CMVN stats: the sum of a featdir's per-speaker
    stats (``cmvn.scp``; Kaldi ``[2, dim+1]`` layout, frontend/cmvn.py).

    Live streams have no speaker-level statistics (the offline pipeline's
    per-speaker CMVN, feature_reader.py:91-115, needs the whole corpus up
    front), so streaming serving normalizes with the training corpus'
    pooled stats instead — the standard online-CMVN fallback."""
    from tfkaldi_tpu.io import ArkReader

    reader = ArkReader(os.path.join(featdir, "cmvn.scp"))
    try:
        total = None
        for speaker in list(reader.utt_ids):
            stats = np.asarray(reader.read_utt(speaker), np.float64)
            total = stats if total is None else total + stats
    finally:
        reader.close()
    if total is None:
        raise ValueError(f"no CMVN stats in {featdir}/cmvn.scp")
    return total


def build_streaming_transcriber(
    nnet,  # tfkaldi_tpu.nnet.Nnet (config already parsed)
    coder,
    samplerate: int,
    features_conf: dict,
    *,
    cmvn: np.ndarray | None = None,
    beam_width: int | None = None,
    endpoint_config=None,
):
    """Build the streaming transcriber a trained config describes.

    Loads the final weights once (like ``DecodeService``), constructs the
    online feature chain from the ``[dnn-features]`` section (delta
    front-ends get the lookahead-buffering ``OnlineDynamicExtractor``),
    and returns the paradigm's transcriber: ``StreamingTranscriber`` for
    CTC, ``StreamingTransducerTranscriber`` for RNN-T. Hybrid/attention
    configs are rejected — their decoders need the whole utterance (the
    spool ``DecodeService`` serves those).
    """
    from tfkaldi_tpu.decode.online import StreamingTranscriber
    from tfkaldi_tpu.decode.transducer import StreamingTransducerTranscriber
    from tfkaldi_tpu.frontend.features import FeatureExtractor, FeatureOpts
    from tfkaldi_tpu.frontend.online import (
        FusedOnlineFeatureExtractor,
        OnlineDynamicExtractor,
    )

    trainer = Trainer(nnet.model, TrainerConfig())
    template = trainer.init_state(jax.random.PRNGKey(0))
    state = ckpt.restore_state(os.path.join(nnet.savedir, "final"), template)

    opts = FeatureOpts.from_config(features_conf)
    ext = FeatureExtractor(opts, samplerate)
    # nodelta serves through the fused device-resident frontend: ONE
    # dispatch per push with CMVN folded in (docs/PERF_STREAMING.md);
    # delta configs need the lookahead-buffering host extractor
    online_ext = (
        FusedOnlineFeatureExtractor(ext)
        if opts.dynamic == "nodelta"
        else OnlineDynamicExtractor(ext)
    )
    if beam_width is None:
        beam_width = int(nnet.conf.get("beam_width", 1))
    if nnet.loss_type == "ctc":
        from tfkaldi_tpu.decode.lm import fusion_from_config

        fusion = None
        if beam_width > 1:
            fusion = fusion_from_config(nnet.conf, coder, list(coder.alphabet))
        return StreamingTranscriber(
            online_ext, nnet.model, state.params, state.model_state, coder,
            nnet.blank_id, cmvn=cmvn, beam_width=beam_width,
            fusion_scorer=fusion, endpoint_config=endpoint_config,
        )
    if nnet.loss_type == "rnnt":
        if endpoint_config is not None:
            raise ValueError(
                "endpointing rides the CTC blank stream; the transducer "
                "transcriber does not support endpoint_config"
            )
        fusion_table = None
        if beam_width > 1:
            from tfkaldi_tpu.decode.lm import fusion_from_config

            fusion_table = fusion_from_config(
                nnet.conf, coder, list(coder.alphabet)
            )
        return StreamingTransducerTranscriber(
            online_ext, nnet.model, state.params, state.model_state, coder,
            cmvn=cmvn, beam_width=beam_width,
            fusion_table=fusion_table,
            max_symbols_per_frame=int(nnet.conf.get("max_symbols_per_frame", 4)),
        )
    raise ValueError(
        f"loss_type {nnet.loss_type!r} has no streaming transcriber "
        "(hybrid/attention decoding needs the full utterance; use the "
        "spool DecodeService)"
    )


# ----------------------------------------------------------------------
# Low-latency streaming service (socket, partial transcripts per chunk)
# ----------------------------------------------------------------------

MSG_AUDIO = b"A"  # client -> server: float32 LE PCM samples
MSG_FINISH = b"F"  # client -> server: end of utterance
MSG_PARTIAL = b"P"  # server -> client: partial transcript (UTF-8)
MSG_FINAL = b"T"  # server -> client: final transcript (UTF-8)
MSG_ERROR = b"E"  # server -> client: error text (UTF-8), then close
MSG_TIMES_REQ = b"S"  # client -> server: request committed-label timestamps
MSG_TIMES = b"M"  # server -> client: float64 LE seconds, one per label
MSG_CONF_REQ = b"C"  # client -> server: request committed-label confidences
MSG_CONF = b"c"  # server -> client: float64 LE posteriors, one per label
MSG_WORDS_REQ = b"W"  # client -> server: request word alignments
MSG_WORDS = b"J"  # server -> client: UTF-8 JSON [{word,start,end,confidence}]

_HDR = 5  # 1-byte type + 4-byte big-endian payload length

#: alignment request types a transcriber can answer any time (greedy:
#: the committed append-only alignment; beam: the current best
#: hypothesis' backtrace, final after the finish)
_ALIGN_REQS = (MSG_TIMES_REQ, MSG_CONF_REQ, MSG_WORDS_REQ)


def _alignment_reply(tx, row: int, mtype: bytes) -> tuple[bytes, bytes]:
    """Answer one alignment request for one transcriber row: timestamps
    and confidences as float64 LE arrays, word alignments as JSON."""
    if mtype == MSG_TIMES_REQ:
        return MSG_TIMES, np.ascontiguousarray(
            tx.timestamps()[row], "<f8"
        ).tobytes()
    if mtype == MSG_CONF_REQ:
        return MSG_CONF, np.ascontiguousarray(
            tx.confidences()[row], "<f8"
        ).tobytes()
    import dataclasses
    import json

    return MSG_WORDS, json.dumps(
        [dataclasses.asdict(w) for w in tx.words()[row]]
    ).encode()


def _send_msg(sock, mtype: bytes, payload: bytes) -> None:
    import struct

    sock.sendall(mtype + struct.pack(">I", len(payload)) + payload)


def _recv_exact(sock, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        part = sock.recv(n - len(buf))
        if not part:
            return None
        buf += part
    return buf


def _recv_msg(sock, max_payload: int = 1 << 26):
    import struct

    hdr = _recv_exact(sock, _HDR)
    if hdr is None:
        return None, None
    (length,) = struct.unpack(">I", hdr[1:])
    if length > max_payload:
        raise ValueError(f"oversized message: {length} bytes")
    return hdr[:1], _recv_exact(sock, length) if length else b""


class StreamingServer:
    """Socket front-end for ``decode.online.StreamingTranscriber``.

    The reference has no serving story at all (decode rebuilds a batch-1
    TF graph per run, decoder.py:8-47); ``DecodeService`` above is the
    batch spool, and this is the LOW-LATENCY counterpart: one TCP
    connection per utterance, float32 PCM chunks in, a partial transcript
    after every chunk, the final transcript on finish. Wire format (all
    integers big-endian): ``type:1 | length:4 | payload``; client sends
    ``A`` (audio) / ``F`` (finish), server answers ``P`` (partial) /
    ``T`` (final) / ``E`` (error).

    Transcribers hold per-stream state (feature buffers, recurrent carry,
    beams), so the server keeps a pool of them; a connection checks one
    out for its whole utterance and returns it on close. ``pool_size``
    bounds concurrent utterances (further connections queue on accept).
    Keep the client's audio chunk size fixed — each distinct chunk length
    compiles its own device program (static shapes under jit).

    Timestamps: a client may send ``S`` at any point (mid-stream for the
    labels so far, or after the final transcript — the connection stays
    open after ``T`` until the client hangs up); the server answers ``M``
    with one float64 LE seconds value per label, aligned with the
    transcript. Greedy transcribers report their committed append-only
    alignment; beam transcribers report the current best hypothesis'
    label-time backtrace (rewritten as frames arrive, final after ``T``).
    """

    def __init__(
        self,
        make_transcriber,  # () -> decode.online.StreamingTranscriber
        *,
        host: str = "127.0.0.1",
        port: int = 0,
        pool_size: int = 1,
    ):
        import queue
        import socket as socketlib

        self._pool: "queue.Queue" = queue.Queue()
        for _ in range(pool_size):
            self._pool.put(make_transcriber())
        self._sock = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_STREAM)
        self._sock.setsockopt(socketlib.SOL_SOCKET, socketlib.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen()
        self.host, self.port = self._sock.getsockname()
        self._closing = False

    # ------------------------------------------------------------------

    def _handle(self, conn) -> None:
        tx = self._pool.get()
        try:
            tx.reset(1)
            while True:
                mtype, payload = _recv_msg(conn)
                if mtype is None:  # client hung up mid-stream
                    return
                if mtype == MSG_AUDIO:
                    samples = np.frombuffer(payload, dtype="<f4")
                    partial = tx.push(samples[None, :], np.asarray([len(samples)]))
                    _send_msg(conn, MSG_PARTIAL, partial[0].encode())
                elif mtype == MSG_FINISH:
                    final = tx.finish()
                    _send_msg(conn, MSG_FINAL, final[0].encode())
                    # stay open: the client may still request alignments
                    # (readable after finish); it hangs up when done
                elif mtype in _ALIGN_REQS:
                    _send_msg(conn, *_alignment_reply(tx, 0, mtype))
                else:
                    raise ValueError(f"unknown message type {mtype!r}")
        except Exception as exc:  # noqa: BLE001 — surfaced to the client
            log.exception("streaming session failed")
            try:
                _send_msg(conn, MSG_ERROR, str(exc).encode())
            except OSError:
                pass
        finally:
            conn.close()
            self._pool.put(tx)  # reset(1) on next checkout clears any state

    def serve_forever(self, stop=lambda: False, poll_seconds: float = 0.2) -> None:
        """Accept loop; one thread per connection. Returns when ``stop()``
        is True (checked between accepts) or ``close()`` is called."""
        import threading

        self._sock.settimeout(poll_seconds)
        while not (stop() or self._closing):
            try:
                conn, _ = self._sock.accept()
            except TimeoutError:
                continue
            except OSError:
                return  # closed
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def close(self) -> None:
        self._closing = True
        self._sock.close()


def stream_transcribe(
    host: str, port: int, samples: np.ndarray, chunk_size: int,
    *, timestamps: bool = False,
):
    """Client helper: stream ``samples`` (float32 PCM) in fixed-size
    chunks; yields each partial transcript, then returns the final via
    StopIteration.value (use ``yield from`` or collect the generator).
    With ``timestamps=True`` the return is ``(final, times)`` where
    ``times`` is a float64 seconds array, one entry per transcript label
    (greedy: committed alignment; beam: the final best hypothesis'
    backtrace).

    An early ``MSG_FINAL`` in reply to an audio chunk (the server
    endpointed the utterance mid-stream) ends the generator immediately
    with that final."""
    import socket as socketlib

    def _times(sock):
        _send_msg(sock, MSG_TIMES_REQ, b"")
        mtype, payload = _recv_msg(sock)
        if mtype == MSG_ERROR:
            raise RuntimeError(payload.decode())
        assert mtype == MSG_TIMES, mtype
        return np.frombuffer(payload, "<f8")

    samples = np.ascontiguousarray(samples, dtype="<f4")
    with socketlib.create_connection((host, port)) as sock:
        for pos in range(0, len(samples), chunk_size):
            _send_msg(sock, MSG_AUDIO, samples[pos : pos + chunk_size].tobytes())
            mtype, payload = _recv_msg(sock)
            if mtype == MSG_ERROR:
                raise RuntimeError(payload.decode())
            if mtype == MSG_FINAL:  # server-side endpoint
                final = payload.decode()
                return (final, _times(sock)) if timestamps else final
            assert mtype == MSG_PARTIAL, mtype
            yield payload.decode()
        _send_msg(sock, MSG_FINISH, b"")
        mtype, payload = _recv_msg(sock)
        if mtype == MSG_ERROR:
            raise RuntimeError(payload.decode())
        assert mtype == MSG_FINAL, mtype
        final = payload.decode()
        return (final, _times(sock)) if timestamps else final


def stream_words(host: str, port: int, samples: np.ndarray, chunk_size: int):
    """Client helper: stream an utterance and return ``(final, words)``
    where ``words`` is the server's word alignment — a list of
    ``decode.words.WordAlignment`` (word, start, end, confidence).
    Partials are consumed internally."""
    import json
    import socket as socketlib

    from tfkaldi_tpu.decode.words import WordAlignment

    samples = np.ascontiguousarray(samples, dtype="<f4")
    with socketlib.create_connection((host, port)) as sock:
        final = None
        for pos in range(0, len(samples), chunk_size):
            _send_msg(sock, MSG_AUDIO, samples[pos : pos + chunk_size].tobytes())
            mtype, payload = _recv_msg(sock)
            if mtype == MSG_ERROR:
                raise RuntimeError(payload.decode())
            if mtype == MSG_FINAL:  # server-side endpoint
                final = payload.decode()
                break
            assert mtype == MSG_PARTIAL, mtype
        if final is None:
            _send_msg(sock, MSG_FINISH, b"")
            mtype, payload = _recv_msg(sock)
            if mtype == MSG_ERROR:
                raise RuntimeError(payload.decode())
            assert mtype == MSG_FINAL, mtype
            final = payload.decode()
        _send_msg(sock, MSG_WORDS_REQ, b"")
        mtype, payload = _recv_msg(sock)
        if mtype == MSG_ERROR:
            raise RuntimeError(payload.decode())
        assert mtype == MSG_WORDS, mtype
        return final, [WordAlignment(**w) for w in json.loads(payload)]


class MultiStreamServer:
    """Batched streaming service: N connections share ONE device program.

    ``StreamingServer`` above checks out an independent batch-1
    transcriber per connection — N concurrent utterances run N separate
    batch-1 device programs, each leaving the MXU almost idle (the
    batch-1/batched structure gap measured in BENCH is ~8×).
    This server instead holds ONE transcriber with ``num_slots`` rows and
    multiplexes connections onto its rows via the per-slot lifecycle
    primitives (``push`` on the shared batch, ``finish_rows`` /
    ``reset_rows`` to end and re-arm single slots): concurrent streams
    ride one compiled program, so serving throughput scales with batch
    occupancy at near-constant step cost. The wire protocol is identical
    to ``StreamingServer`` (``stream_transcribe`` works unchanged), and
    per-stream transcripts are bit-identical to a batch-1 run — the
    contract tests/test_multistream_rows.py pins at the library level.

    Structure: a single ENGINE thread owns the transcriber and runs the
    tick loop — drain slot claims (batched ``reset_rows``), gather at
    most one pending message per slot, ``push`` all gathered audio as one
    batch (idle rows ride along with length 0, which leaves their state
    untouched), then ``finish_rows`` for finishing slots in one batched
    call. Connection threads never touch the transcriber; they talk to
    the engine through per-slot queues, so all device state has a single
    owner and needs no locks.

    If the transcriber was built with an ``endpoint_config``, rows whose
    endpoint latches are finished server-side: the client's next reply is
    an early ``MSG_FINAL`` instead of a partial (``stream_transcribe``
    returns on it).

    Audio chunks larger than ``chunk_size`` samples are rejected
    (``MSG_ERROR``) — every tick pushes a fixed ``[num_slots,
    chunk_size]`` batch so exactly one device program is compiled.

    Choosing ``num_slots`` (measured, docs/PERF_STREAMING.md knee table):
    per-tick latency is a fixed dispatch floor plus a term linear in
    occupancy, so the largest N whose tick p50 stays under the chunk
    period is the REAL-TIME ceiling — beyond it every stream falls
    behind its own audio. On this sandbox's staging tunnel that ceiling
    at 160 ms chunks is N≥64 for the flagship conformer-CTC (p50 still
    120 ms at 64; 128 crosses) and N=16 for the conformer-transducer
    (32 crosses); the default is the measured safe value for BOTH
    production stacks. Aggregate throughput keeps scaling past the
    ceiling (the linear term is audio staging, not device compute), so
    BATCH-oriented callers (offline transcription pools, lattice
    re-scoring) should raise ``num_slots`` toward 64-128 and accept
    per-tick latency above the chunk period. On a real PCIe host both
    the floor (~100 µs dispatches) and the slope (GB/s staging) shrink
    ~100×, putting the real-time ceiling past any per-chip batch a
    16 GB HBM budget allows — there, size ``num_slots`` to traffic.

    No reference counterpart: the reference rebuilds a batch-1 TF graph
    per decode run (neuralNetworks/decoder.py:8-47).
    """

    #: measured real-time occupancy ceiling on the staging tunnel
    #: (tick p50 < 160 ms chunk period; docs/PERF_STREAMING.md)
    DEFAULT_SLOTS = 16

    def __init__(
        self,
        transcriber,  # StreamingTranscriber or StreamingTransducerTranscriber
        *,
        num_slots: int = DEFAULT_SLOTS,
        chunk_size: int = 1600,
        host: str = "127.0.0.1",
        port: int = 0,
        tick_seconds: float = 0.002,
    ):
        import queue
        import socket as socketlib
        import threading

        self.tx = transcriber
        self.num_slots = int(num_slots)
        self.chunk_size = int(chunk_size)
        self._tick_seconds = float(tick_seconds)
        self.tx.reset(self.num_slots)
        self._has_endpoint = getattr(transcriber, "_endpointer", None) is not None

        self._inbox = [queue.Queue() for _ in range(self.num_slots)]
        self._outbox = [queue.Queue() for _ in range(self.num_slots)]
        self._free: "queue.Queue[int]" = queue.Queue()
        for s in range(self.num_slots):
            self._free.put(s)
        self._claims: "queue.Queue[int]" = queue.Queue()
        # a connection may not feed audio into a freshly claimed slot until
        # the ENGINE has re-armed it (reset_rows) — otherwise a tick that
        # already drained the claim queue could push the new stream's first
        # chunk through the previous stream's stale state
        self._armed = [threading.Event() for _ in range(self.num_slots)]
        self._work = threading.Event()  # any inbox/claim pending
        # slots whose stream has ended (client finish, server endpoint, or
        # a failed re-arm): further audio/finish is a protocol error until
        # the next claim re-arms the slot. Engine-thread only — no locks.
        self._finished: set[int] = set()
        self._closing = False
        # occupancy stats (engine-thread only): ticks and rows-with-audio,
        # for measuring how full the shared batch runs
        self.ticks = 0
        self.rows_pushed = 0

        self._sock = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_STREAM)
        self._sock.setsockopt(socketlib.SOL_SOCKET, socketlib.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen()
        self.host, self.port = self._sock.getsockname()
        self._engine = threading.Thread(target=self._engine_loop, daemon=True)
        self._engine.start()

    # -- engine thread: sole owner of the transcriber -------------------

    def _engine_loop(self) -> None:
        import queue

        while not self._closing:
            if not self._work.wait(timeout=0.1):
                continue
            self._work.clear()
            # 1) re-arm freshly claimed slots, batched. Stale messages a
            # dead connection left behind are drained HERE, on the sole
            # consumer thread, so the new stream can never consume (or be
            # fed) the previous stream's traffic. A re-arm failure fails
            # the claimed slots with MSG_ERROR instead of killing the
            # engine thread (every other stream keeps running).
            claimed = []
            while True:
                try:
                    claimed.append(self._claims.get_nowait())
                except queue.Empty:
                    break
            if claimed:
                for s in claimed:
                    for box in (self._inbox[s], self._outbox[s]):
                        try:
                            while True:
                                box.get_nowait()
                        except queue.Empty:
                            pass
                try:
                    self.tx.reset_rows(claimed)
                    self._finished.difference_update(claimed)
                except Exception as exc:  # noqa: BLE001 — fail the slots, not the engine
                    log.exception("slot re-arm failed")
                    for s in claimed:
                        self._outbox[s].put((MSG_ERROR, str(exc)))
                        self._finished.add(s)  # refuse audio until re-claimed
                finally:
                    for s in claimed:
                        self._armed[s].set()
            # 2) gather at most one pending message per slot
            audio_rows: dict[int, np.ndarray] = {}
            finish_slots: list[int] = []
            align_reqs: list[tuple[int, bytes]] = []
            for s in range(self.num_slots):
                try:
                    mtype, samples = self._inbox[s].get_nowait()
                except queue.Empty:
                    continue
                if s in self._finished and mtype not in _ALIGN_REQS:
                    # the stream ended (client finish / server endpoint /
                    # failed re-arm); a conforming client stops sending —
                    # pushing more audio through the finished row would
                    # re-flush stale state, so answer a protocol error
                    self._outbox[s].put((
                        MSG_ERROR,
                        "stream already finished (alignment requests only "
                        "until the slot is re-claimed)",
                    ))
                elif mtype == MSG_AUDIO:
                    audio_rows[s] = samples
                elif mtype in _ALIGN_REQS:
                    align_reqs.append((s, mtype))
                else:
                    finish_slots.append(s)
            if not audio_rows and not finish_slots and not align_reqs:
                continue
            try:
                self._tick(audio_rows, finish_slots, align_reqs)
            except Exception as exc:  # noqa: BLE001 — fail the streams, not the engine
                log.exception("engine tick failed")
                for s in list(audio_rows) + finish_slots + [
                    s for s, _ in align_reqs
                ]:
                    self._outbox[s].put((MSG_ERROR, str(exc)))
            # small coalescing window: let concurrent clients' next chunks
            # land so the following tick batches them together
            if self._tick_seconds:
                time.sleep(self._tick_seconds)
            self._work.set()  # re-check inboxes once more before sleeping

    def _tick(self, audio_rows, finish_slots, align_reqs=()) -> None:
        if audio_rows:
            chunk = np.zeros((self.num_slots, self.chunk_size), np.float32)
            lengths = np.zeros((self.num_slots,), np.int64)
            for s, samples in audio_rows.items():
                chunk[s, : len(samples)] = samples
                lengths[s] = len(samples)
            partials = self.tx.push(chunk, lengths)
            self.ticks += 1
            self.rows_pushed += len(audio_rows)
            endpointed = (
                self.tx.endpointed() if self._has_endpoint else None
            )
            ep_rows = [
                s for s in audio_rows
                if endpointed is not None and bool(endpointed[s])
            ]
            if ep_rows:
                finals = self.tx.finish_rows(ep_rows)
                self._finished.update(ep_rows)
                for s in ep_rows:
                    self._outbox[s].put((MSG_FINAL, finals[s]))
            for s in audio_rows:
                if s not in ep_rows:
                    self._outbox[s].put((MSG_PARTIAL, partials[s]))
        if finish_slots:
            finals = self.tx.finish_rows(finish_slots)
            self._finished.update(finish_slots)
            for s in finish_slots:
                self._outbox[s].put((MSG_FINAL, finals[s]))
        # slot alignments stay readable after finish_rows — reset_rows
        # only happens when the next connection claims the slot
        for s, mtype in align_reqs:
            try:
                self._outbox[s].put(_alignment_reply(self.tx, s, mtype))
            except RuntimeError as exc:  # beam transcriber: no alignment
                self._outbox[s].put((MSG_ERROR, str(exc)))

    # -- connection threads ---------------------------------------------

    def _handle(self, conn) -> None:
        import queue

        slot = self._free.get()
        self._armed[slot].clear()
        self._claims.put(slot)
        self._work.set()
        self._armed[slot].wait()
        try:
            while True:
                mtype, payload = _recv_msg(conn)
                if mtype is None:  # client hung up mid-stream
                    return
                if mtype == MSG_AUDIO:
                    samples = np.frombuffer(payload, dtype="<f4")
                    if len(samples) > self.chunk_size:
                        raise ValueError(
                            f"chunk of {len(samples)} samples exceeds the "
                            f"server chunk_size {self.chunk_size}"
                        )
                    self._inbox[slot].put((MSG_AUDIO, samples))
                elif mtype == MSG_FINISH or mtype in _ALIGN_REQS:
                    self._inbox[slot].put((mtype, None))
                else:
                    raise ValueError(f"unknown message type {mtype!r}")
                self._work.set()
                rtype, data = self._outbox[slot].get()
                if rtype == MSG_ERROR:
                    raise RuntimeError(data)
                _send_msg(
                    conn, rtype,
                    data if isinstance(data, bytes) else data.encode(),
                )
                # after MSG_FINAL the connection stays open: the client may
                # still request the finished stream's timestamps (readable
                # until the next claim's reset_rows); it hangs up when done
        except Exception as exc:  # noqa: BLE001 — surfaced to the client
            log.exception("multi-stream session failed")
            try:
                _send_msg(conn, MSG_ERROR, str(exc).encode())
            except OSError:
                pass
        finally:
            conn.close()
            # drain stale traffic left by a mid-stream hangup — BOTH
            # directions: an unconsumed inbox message would otherwise be
            # pushed into the slot after it is freed, and an unread reply
            # would desync the next connection by one. The engine drains
            # both queues again at claim time (the race-free point), so
            # this is best-effort early cleanup.
            for box in (self._inbox[slot], self._outbox[slot]):
                try:
                    while True:
                        box.get_nowait()
                except queue.Empty:
                    pass
            self._free.put(slot)

    def serve_forever(self, stop=lambda: False, poll_seconds: float = 0.2) -> None:
        """Accept loop; one thread per connection. Returns when ``stop()``
        is True (checked between accepts) or ``close()`` is called."""
        import threading

        self._sock.settimeout(poll_seconds)
        while not (stop() or self._closing):
            try:
                conn, _ = self._sock.accept()
            except TimeoutError:
                continue
            except OSError:
                return  # closed
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def close(self) -> None:
        self._closing = True
        self._work.set()
        self._sock.close()
