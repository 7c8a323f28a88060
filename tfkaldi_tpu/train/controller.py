"""Training controller: the reference ``Nnet.train`` state machine
(neuralNetworks/nnet.py:80-244) in functional-JAX form.

Responsibilities:

- carve off the validation set (first ``valid_batches`` batches, then
  ``dispenser.split()``; nnet.py:88-96)
- resume from the checkpoint nearest ``starting_step`` and fast-forward
  the dispenser (nnet.py:101-108)
- the training loop: batch → train step → periodic validation; on a
  validation regression (with ``valid_adapt``) rewind the dispenser,
  restore the last validated state, halve the learning rate, and retry up
  to ``valid_retries`` times before terminating (nnet.py:167-207)
- layerwise growth every ``add_layer_period`` steps (nnet.py:209-229)
- checkpoints every ``check_freq`` steps, a 'validated' snapshot after
  every successful validation, 'final' at the end (nnet.py:231-238)
- the state prior = normalized target bincount → prior.npy (nnet.py:240-244)
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time

import jax
import numpy as np

from tfkaldi_tpu.data.batching import DeviceBatcher, PaddedBatch
from tfkaldi_tpu.data.dispenser import BatchDispenser
from tfkaldi_tpu.train import checkpoint as ckpt
from tfkaldi_tpu.train.trainer import Trainer, TrainState

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class NnetTrainOptions:
    """The ``[nnet]`` training-control knobs (config_AURORA4.cfg:102-153)."""

    savedir: str
    num_epochs: int = 10
    batch_size: int = 128
    valid_batches: int = 2
    valid_frequency: int = 10
    valid_adapt: bool = True
    valid_retries: int = 3
    check_freq: int = 10
    add_layer_period: int = 0
    num_hidden_layers: int = 6
    starting_step: int = 0
    seed: int = 0
    # capture a jax.profiler trace of steps [profile_start, profile_start+
    # profile_steps) into <savedir>/profile when profile_steps > 0
    profile_steps: int = 0
    profile_start: int = 2
    # checkpoint averaging: write 'final' as the parameter mean of the
    # end state and the last N-1 saved training/step* checkpoints
    # (0/1 = off). Standard last-N smoothing for the decode model;
    # optimizer state and BN statistics stay those of the end state.
    average_last: int = 0

    @classmethod
    def from_config(cls, conf: dict, savedir: str) -> "NnetTrainOptions":
        return cls(
            savedir=savedir,
            num_epochs=int(conf.get("num_epochs", 10)),
            batch_size=int(conf.get("batch_size", 128)),
            valid_batches=int(conf.get("valid_batches", 2)),
            valid_frequency=int(conf.get("valid_frequency", 10)),
            valid_adapt=str(conf.get("valid_adapt", "True")) == "True",
            valid_retries=int(conf.get("valid_retries", 3)),
            check_freq=int(conf.get("check_freq", 10)),
            add_layer_period=int(conf.get("add_layer_period", 0)),
            num_hidden_layers=int(conf.get("num_hidden_layers", 6)),
            starting_step=0
            if conf.get("starting_step", "0") == "final"
            else int(conf.get("starting_step", 0)),
            seed=int(conf.get("seed", 0)),
            average_last=int(conf.get("average_last", 0)),
            profile_steps=int(conf.get("profile_steps", 0)),
        )


class TrainingController:
    def __init__(
        self,
        trainer: Trainer,
        dispenser: BatchDispenser,
        batcher: DeviceBatcher,
        options: NnetTrainOptions,
        metrics_hook=None,
        prefetch_depth: int = 2,
        mesh=None,
        validation_hook=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — training state is
        sharded per ``parallel.mesh.state_shardings`` and every batch is
        placed batch-dim-over-'data' so GSPMD runs the step SPMD with grad
        psums over ICI (the TPU-native replacement for the reference's
        in-graph accumulation loop, trainer.py:310-354)."""
        self.trainer = trainer
        self.dispenser = dispenser
        self.batcher = batcher
        self.opt = options
        self.metrics_hook = metrics_hook or (lambda **kw: None)
        self.validation_hook = validation_hook or (lambda step, loss: None)
        self.prefetch_depth = prefetch_depth
        self.mesh = mesh

    def _to_batch(self) -> PaddedBatch:
        batch = self.dispenser.get_padded_batch(self.batcher)
        return self._place(batch)

    def _place(self, batch: PaddedBatch) -> PaddedBatch:
        if self.mesh is not None:
            from tfkaldi_tpu.parallel import shard_batch

            return shard_batch(batch, self.mesh)
        return batch

    def train(self, state: TrainState | None = None) -> TrainState:
        opt = self.opt
        os.makedirs(os.path.join(opt.savedir, "training"), exist_ok=True)

        # validation split (nnet.py:88-96)
        val_batches: list[PaddedBatch] = []
        for _ in range(opt.valid_batches):
            val_batches.append(self._to_batch())
        self.dispenser.split()

        num_steps = int(self.dispenser.num_batches * opt.num_epochs)

        # resume: round starting_step down to a checkpoint and fast-forward
        step = opt.starting_step - opt.starting_step % opt.check_freq
        for _ in range(step):
            self.dispenser.skip_batch()

        if state is None:
            state = self.trainer.init_state(jax.random.PRNGKey(opt.seed))
            if self.mesh is not None:
                from tfkaldi_tpu.parallel import shard_state

                state = shard_state(state, self.mesh)
        if step > 0:
            state = ckpt.restore_state(
                os.path.join(opt.savedir, "training", f"step{step}"), state
            )

        num_retries = 0
        validation_loss = None
        validation_step = step
        validated_dir = os.path.join(opt.savedir, "training", "validated")
        if val_batches:
            # crash durability (reference persists 'validated' on every
            # successful validation, nnet.py:148-149, 206-207): on resume,
            # prefer the persisted rollback point over re-baselining on the
            # resumed state, so a post-resume regression can still roll back
            # to the last state that actually validated.
            meta = ckpt.load_validated_meta(validated_dir) if step > 0 else None
            restored = None
            if meta is not None and meta["step"] <= step:
                candidate = ckpt.restore_state(validated_dir, state)
                # the sidecar is written only after the state commit, so a
                # crash can leave a NEWER state with an older sidecar; the
                # state's own step is the arbiter — on mismatch the sidecar
                # describes a rollback point that no longer exists, so fall
                # through to re-baselining instead of rewinding too far
                if int(candidate.step) == meta["step"]:
                    restored = candidate
                else:
                    log.warning(
                        "validated checkpoint (step %d) and its sidecar "
                        "(step %d) disagree; re-baselining on the resumed state",
                        int(candidate.step), meta["step"],
                    )
            if restored is not None:
                validated = restored
                validation_loss = meta["loss"]
                validation_step = meta["step"]
                log.info(
                    "restored validated rollback point from step %d (loss %f)",
                    validation_step, validation_loss,
                )
            else:
                validation_loss = self.trainer.evaluate(state, val_batches)
                log.info("validation loss at step %d: %f", step, validation_loss)
                validated = ckpt.device_snapshot(state)
                ckpt.save_validated(validated_dir, validated, validation_loss, step)

        # async host→device staging, `prefetch_depth` batches ahead
        from tfkaldi_tpu.data.prefetch import PrefetchingBatchSource

        source = PrefetchingBatchSource(
            self.dispenser,
            self.batcher,
            depth=self.prefetch_depth,
            device_put=self._place if self.mesh is not None else None,
        )
        try:
            state = self._train_loop(
                state, source, step, num_steps, val_batches,
                validation_loss, validation_step, num_retries,
                validated if val_batches else None,
            )
        finally:
            source.close()

        if opt.average_last > 1:
            state = self._average_final(state)
        ckpt.save_state(os.path.join(opt.savedir, "final"), state, block=True)

        # state prior (nnet.py:240-244). Multi-host: each dispenser counts
        # only its scp shard, so sum the counts across hosts (the reference
        # prior spans the whole corpus) and let ONE host write the file —
        # concurrent np.save()s to a shared path tear. The trailing sync
        # keeps other hosts from racing ahead to decode before the file
        # lands.
        counts = self.dispenser.compute_target_count().astype(np.float64)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            with jax.enable_x64():
                # scoped x64: the allgather's device_put would otherwise
                # silently downcast to f32, rounding counts above 2^24
                # (a frequent pdf class on a large corpus)
                counts = np.asarray(multihost_utils.process_allgather(counts)).sum(axis=0)
            prior = (counts / counts.sum()).astype(np.float32)
            if jax.process_index() == 0:
                ckpt.save_prior(os.path.join(opt.savedir, "prior.npy"), prior)
            multihost_utils.sync_global_devices("prior_written")
        else:
            prior = (counts / counts.sum()).astype(np.float32)
            ckpt.save_prior(os.path.join(opt.savedir, "prior.npy"), prior)
        return state

    def _average_final(self, state: TrainState) -> TrainState:
        """Checkpoint averaging (``average_last = N`` in ``[nnet]``):
        replace the end state's PARAMETERS with the mean of the end state
        and the most recent ``N-1`` saved ``training/step*`` checkpoints.
        Optimizer moments and BN statistics stay the end state's — only
        the decode model is smoothed. Every host computes the same
        average from the same files, so multi-host saves stay consistent.
        Note: intended for smoothly converging runs; if validation
        rollback fired, the newest step checkpoints may postdate the
        rollback point and averaging mixes them in regardless."""
        import re

        opt = self.opt
        tdir = os.path.join(opt.savedir, "training")
        end_step = int(state.step)
        steps = sorted(
            int(m.group(1))
            for d in (os.listdir(tdir) if os.path.isdir(tdir) else [])
            if (m := re.fullmatch(r"step(\d+)", d))
            and int(m.group(1)) != end_step
        )
        take = steps[-(opt.average_last - 1):]
        params_list = [state.params]
        for s in take:
            restored = ckpt.restore_state(
                os.path.join(tdir, f"step{s}"), state
            )
            params_list.append(restored.params)
        log.info(
            "checkpoint averaging: final = mean of steps %s",
            [end_step] + list(reversed(take)),
        )
        return dataclasses.replace(
            state, params=ckpt.average_params(params_list)
        )

    def _train_loop(
        self,
        state,
        source,
        step,
        num_steps,
        val_batches,
        validation_loss,
        validation_step,
        num_retries,
        validated,
    ):
        opt = self.opt
        validated_dir = os.path.join(opt.savedir, "training", "validated")
        profiling = False
        while step < num_steps:
            # optional jax.profiler capture window (SURVEY §5: the reference
            # has no tracing at all)
            if opt.profile_steps > 0:
                if step == opt.profile_start and not profiling:
                    jax.profiler.start_trace(os.path.join(opt.savedir, "profile"))
                    profiling = True
                elif profiling and step >= opt.profile_start + opt.profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
            t0 = time.perf_counter()
            batch = source.next()
            # the dropout key derives on device from state.rng and the step
            # counter (trainer.update rng=None) — no host-side PRNG dispatches
            state, loss = self.trainer.update(state, batch)
            loss = float(loss)
            step_time = time.perf_counter() - t0
            log.info("step %d/%d loss: %f (%.3fs)", step, num_steps, loss, step_time)
            self.metrics_hook(
                step=step, loss=loss, step_time=step_time, num_frames=batch.num_frames
            )
            step += 1

            # periodic validation with rollback (nnet.py:167-207)
            if val_batches and step % opt.valid_frequency == 0:
                current_loss = self.trainer.evaluate(state, val_batches)
                log.info("validation loss at step %d: %f", step, current_loss)
                self.validation_hook(step, current_loss)
                if opt.valid_adapt:
                    if current_loss > validation_loss:
                        # rewind consumed + prefetched batches (nnet.py:179-181)
                        source.rewind(step - validation_step)
                        state = ckpt.device_snapshot(validated)
                        state = self.trainer.halve_learning_rate(state)
                        # carry the halved lr into the rollback point so
                        # consecutive retries compound 1/2 -> 1/4 -> ...
                        # (the reference also restores lr_fact from the
                        # checkpoint, but its TF-runtime nondeterminism made
                        # retries diverge anyway; our replay is
                        # bit-deterministic, so without compounding every
                        # retry would replay identically and be futile)
                        validated = dataclasses.replace(
                            # copy: state's buffers get donated next step
                            validated, lr_fact=jax.numpy.array(state.lr_fact, copy=True)
                        )
                        # re-persist so a crash mid-retry resumes with the
                        # compounded lr_fact rather than the stale one
                        ckpt.save_validated(
                            validated_dir, validated, validation_loss, validation_step
                        )
                        step = validation_step
                        if num_retries == opt.valid_retries:
                            log.info("validation loss is worse, terminating training")
                            break
                        log.info(
                            "validation loss is worse, returning to the previously "
                            "validated model with halved learning rate"
                        )
                        num_retries += 1
                        continue
                    validation_loss = current_loss
                    validation_step = step
                    num_retries = 0
                    validated = ckpt.device_snapshot(state)
                    ckpt.save_validated(validated_dir, validated, validation_loss, step)
                else:
                    validation_loss = current_loss

            # layerwise growth (nnet.py:209-229)
            if opt.add_layer_period > 0:
                if (
                    step % opt.add_layer_period == 0
                    and step // opt.add_layer_period < opt.num_hidden_layers
                ):
                    log.info(
                        "adding layer, the model now holds %d/%d layers",
                        step // opt.add_layer_period + 1,
                        opt.num_hidden_layers,
                    )
                    state = self.trainer.add_layer(state)
                    if val_batches:
                        validation_loss = self.trainer.evaluate(state, val_batches)
                        log.info("validation loss at step %d: %f", step, validation_loss)
                        validation_step = step
                        validated = ckpt.device_snapshot(state)
                        ckpt.save_validated(validated_dir, validated, validation_loss, step)
                        num_retries = 0

            if step % opt.check_freq == 0:
                ckpt.save_state(os.path.join(opt.savedir, "training", f"step{step}"), state)

        if profiling:
            jax.profiler.stop_trace()
        return state
