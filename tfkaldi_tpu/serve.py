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
        coder=None,  # required for CTC mode (nnet.loss_type == "ctc")
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
        if nnet.loss_type == "ctc":
            if coder is None:
                raise ValueError("CTC service needs a target coder")
            from tfkaldi_tpu.decode.ctc import CTCDecoder

            self._decoder = CTCDecoder(
                nnet.model, state.params, state.model_state, coder, nnet.blank_id,
                beam_width=int(nnet.conf.get("beam_width", 1)),
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
        if self.nnet.loss_type == "ctc":
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
