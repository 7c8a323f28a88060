"""Nnet facade: config → model / trainer / controller / decoder wiring.

Equivalent of the reference neuralNetworks/nnet.py:14-289. Consumes the
same ``[nnet]`` config section (config_AURORA4.cfg:102-153) including
``numutterances_per_minibatch`` (mapped to a gradient-accumulation factor)
and the layerwise/validation/checkpoint knobs.
"""

from __future__ import annotations

import dataclasses
import logging
import os

import jax
import numpy as np

from tfkaldi_tpu.data.batching import DeviceBatcher
from tfkaldi_tpu.data.dispenser import BatchDispenser
from tfkaldi_tpu.data.feature_reader import FeatureReader
from tfkaldi_tpu.decode import Decoder
from tfkaldi_tpu.io import ArkWriter
from tfkaldi_tpu.models import DNN, DNNConfig
from tfkaldi_tpu.train import NnetTrainOptions, Trainer, TrainerConfig, TrainingController
from tfkaldi_tpu.train import checkpoint as ckpt

log = logging.getLogger(__name__)


class Nnet:
    """A neural network usable together with external Kaldi."""

    def __init__(self, conf, input_dim: int, num_labels: int):
        """Args:
            conf: configparser object (the full .cfg).
            input_dim: raw feature dimension (pre-splicing).
            num_labels: number of pdf targets.
        """
        self.conf = dict(conf.items("nnet"))
        self.savedir = os.path.join(conf.get("directories", "expdir"), self.conf["name"])
        os.makedirs(os.path.join(self.savedir, "training"), exist_ok=True)

        context_width = int(self.conf.get("context_width", 0))
        self.context_width = context_width
        self.raw_input_dim = input_dim  # pre-splice dim (SpecAugment bands)
        # spliced input dimension (nnet.py:39-40)
        self.input_dim = input_dim * (2 * context_width + 1)
        self.num_labels = num_labels
        # loss selector — the reference hardcodes CrossEnthropyTrainer and
        # ships a broken CTCTrainer (trainer.py:533-570); here `loss = ctc`
        # in [nnet] enables the working character-CTC path (blank = extra
        # final class)
        self.loss_type = self.conf.get("loss", "cross_entropy")
        output_dim = num_labels + 1 if self.loss_type == "ctc" else num_labels
        self.blank_id = (
            num_labels if self.loss_type in ("ctc", "rnnt") else None
        )
        # model selector: the reference's Classifier seam with one concrete
        # DNN (classifiers/classifier.py); `model = lstm` adds the sequence
        # model its unfinished CTC path was meant for
        model_type = self.conf.get("model", "dnn")
        if (model_type == "transducer") != (self.loss_type == "rnnt"):
            raise ValueError(
                "model = transducer and loss = rnnt go together: the "
                "transducer is trained by the lattice loss and has no "
                "per-frame posteriors for CE/CTC"
            )
        if (model_type == "seq2seq") != (self.loss_type == "attention"):
            raise ValueError(
                "model = seq2seq and loss = attention go together: the "
                "encoder-decoder is trained by teacher-forced CE over "
                "text targets and has no per-frame posteriors"
            )
        if model_type == "seq2seq":
            # attention encoder-decoder family (models/seq2seq.py) — text
            # targets like the CTC path; sos/eos is the extra final class
            from tfkaldi_tpu.models import AttentionSeq2Seq, Seq2SeqConfig

            if int(self.conf.get("add_layer_period", 0)) > 0:
                raise ValueError("layerwise init (add_layer_period) requires model = dnn")
            self.model = AttentionSeq2Seq(
                Seq2SeqConfig.from_config(self.conf, self.input_dim, num_labels)
            )
        elif model_type == "transducer":
            # RNN-T family (models/transducer.py) — encoder + prediction
            # network + joint, text targets like the CTC path (blank is
            # the extra final class, added internally by the model)
            from tfkaldi_tpu.models import Transducer, TransducerConfig

            if int(self.conf.get("add_layer_period", 0)) > 0:
                raise ValueError("layerwise init (add_layer_period) requires model = dnn")
            self.model = Transducer(
                TransducerConfig.from_config(self.conf, self.input_dim, num_labels)
            )
        elif model_type in ("lstm", "gru"):
            from tfkaldi_tpu.models import GRU, LSTM, RNNConfig

            if int(self.conf.get("add_layer_period", 0)) > 0:
                raise ValueError("layerwise init (add_layer_period) requires model = dnn")
            cell = LSTM if model_type == "lstm" else GRU
            self.model = cell(RNNConfig.from_config(self.conf, self.input_dim, output_dim))
        elif model_type == "tdnn":
            # Kaldi-era TDNN family (models/tdnn.py) — dense static-shift
            # splices, no recurrence; `tdnn_context` sets per-layer offsets
            from tfkaldi_tpu.models import TDNN, TDNNConfig

            if int(self.conf.get("add_layer_period", 0)) > 0:
                raise ValueError("layerwise init (add_layer_period) requires model = dnn")
            self.model = TDNN(TDNNConfig.from_config(self.conf, self.input_dim, output_dim))
        elif model_type == "cnn":
            # 2D-conv frontend + dense stack (models/cnn.py) — the splice
            # copies become the conv input channels
            from tfkaldi_tpu.models import CNN, CNNConfig

            if int(self.conf.get("add_layer_period", 0)) > 0:
                raise ValueError("layerwise init (add_layer_period) requires model = dnn")
            self.model = CNN(CNNConfig.from_config(
                self.conf, self.input_dim, output_dim,
                num_channels=2 * context_width + 1,
            ))
        elif model_type in ("transformer", "conformer"):
            # self-attention encoder (models/transformer.py); `conformer =
            # True` (or `model = conformer`) adds the macaron FFNs + the
            # depthwise conv module
            from tfkaldi_tpu.models import Transformer, TransformerConfig

            if int(self.conf.get("add_layer_period", 0)) > 0:
                raise ValueError("layerwise init (add_layer_period) requires model = dnn")
            cfg = TransformerConfig.from_config(self.conf, self.input_dim, output_dim)
            if model_type == "conformer" and not cfg.conformer:
                cfg = dataclasses.replace(cfg, conformer=True)
            if cfg.subsample > 1 and self.loss_type != "ctc":
                raise ValueError(
                    "subsample > 1 needs loss = ctc (frame-level CE targets "
                    "require the 1:1 alignment)"
                )
            self.model = Transformer(cfg)
        elif model_type == "dnn":
            self.model = DNN(DNNConfig.from_config(self.conf, self.input_dim, output_dim))
        else:
            raise ValueError(f"unknown model type {model_type!r}")

    def _micro_batches(self, batch_size: int) -> int:
        """Map ``numutterances_per_minibatch`` (microbatch SIZE, -1 = whole
        batch; nnet.py:110-114) to an accumulation COUNT."""
        val = int(self.conf.get("numutterances_per_minibatch", -1))
        if val <= 0 or val >= batch_size:
            return 1
        if batch_size % val != 0:
            raise ValueError(
                f"batch_size {batch_size} not divisible by "
                f"numutterances_per_minibatch {val}"
            )
        return batch_size // val

    def train(self, dispenser: BatchDispenser):
        """Train the network (nnet.py:80-244)."""
        opts = NnetTrainOptions.from_config(self.conf, self.savedir)
        if jax.process_count() > 1:
            # cross-host agreement on the two shard-dependent quantities,
            # BEFORE anything derives from them. Equal-size scp shards do
            # not make these equal: target coverage (utterances the aligner
            # dropped, transcript lengths) varies across strided shards.
            #  - num_batches -> min across hosts (else num_steps — the loop
            #    bound AND the lr-decay exponent — diverges and the hosts
            #    deadlock on mismatched collectives)
            #  - max_target_length -> max across hosts (else CTC batches
            #    assemble global arrays with different shapes per process)
            from jax.experimental import multihost_utils

            local = np.array(
                [dispenser.num_batches, float(dispenser.max_target_length)],
                np.float64,
            )
            with jax.enable_x64():
                # without scoped x64 the allgather device_put silently
                # downcasts to f32, rounding large values
                gathered = np.asarray(multihost_utils.process_allgather(local))
            dispenser.limit_num_batches(float(gathered[:, 0].min()))
            self._agreed_max_target_length = int(gathered[:, 1].max())
        num_steps = int(dispenser.num_batches * opts.num_epochs)
        trainer_cfg = TrainerConfig(
            init_learning_rate=float(self.conf.get("initial_learning_rate", 1e-3)),
            learning_rate_decay=float(self.conf.get("learning_rate_decay", 1)),
            num_steps=num_steps,
            loss_type=self.loss_type,
            micro_batches=self._micro_batches(opts.batch_size),
            ctc_blank_id=self.blank_id if self.blank_id is not None else 0,
            # SpecAugment (beyond the reference): [nnet] specaugment = True
            spec_augment=str(self.conf.get("specaugment", "False")) == "True",
            spec_time_masks=int(self.conf.get("spec_time_masks", 2)),
            spec_time_width=int(self.conf.get("spec_time_width", 20)),
            spec_freq_masks=int(self.conf.get("spec_freq_masks", 2)),
            spec_freq_width=int(self.conf.get("spec_freq_width", 8)),
            spec_raw_dim=self.raw_input_dim,
        )
        trainer = Trainer(self.model, trainer_cfg)
        from tfkaldi_tpu.utils import MetricsLogger

        # multi-chip: all devices (across every host of a pod) on the data
        # axis; GSPMD psums the grads over ICI/DCN (config key
        # `model_parallel` adds a model axis). [nnet] batch_size is the
        # GLOBAL batch: in a multi-host run the caller hands this method a
        # dispenser producing batch_size/process_count utterances per host
        # (cli/main.py does this division).
        mesh = None
        n_dev = jax.device_count()
        n_proc = jax.process_count()
        if n_dev > 1:
            model_axis = max(int(self.conf.get("model_parallel", 1)), 1)
            data_axis = n_dev // model_axis if n_dev % model_axis == 0 else 0
            if data_axis and opts.batch_size % data_axis == 0:
                from tfkaldi_tpu.parallel import make_mesh

                mesh = make_mesh(model=model_axis)
                log.info("training on %s mesh", dict(zip(mesh.axis_names, mesh.devices.shape)))
            else:
                log.warning(
                    "cannot mesh %d devices as data=%s x model=%d with batch_size %d; "
                    "training single-device",
                    n_dev, data_axis or "?", model_axis, opts.batch_size,
                )

        from tfkaldi_tpu.models import LSTM, Transducer

        if isinstance(self.model, (LSTM, Transducer)):
            # pin the exact batch-shard count so the 'auto' Pallas gate
            # validates the TRUE local shard instead of the conservative
            # b/device_count worst case (which wrongly disables the kernel
            # under a model-parallel axis or an unmeshed run)
            import dataclasses as _dc

            shards = int(mesh.shape["data"]) if mesh is not None else 1
            if isinstance(self.model, Transducer):
                # only RNN encoders carry the Pallas shape gate; a
                # conformer encoder's TransformerConfig has no
                # batch_shards field (and no kernel gate to pin)
                if hasattr(self.model.encoder.config, "batch_shards"):
                    self.model.encoder.config = _dc.replace(
                        self.model.encoder.config, batch_shards=shards
                    )
            else:
                self.model.config = _dc.replace(self.model.config, batch_shards=shards)

        batcher = DeviceBatcher()
        if n_proc > 1:
            if mesh is None:
                raise ValueError(
                    "multi-host training requires a device mesh: batch_size "
                    f"{opts.batch_size} must divide over the data axis"
                )
            # pin the padded lengths (reference-style corpus-max padding)
            # so each host's local batch assembles into one consistent
            # global jax.Array. t_max comes from the corpus-wide `maxlength`
            # file (host-invariant); the CTC target length is the allgather
            # maximum agreed above — the host-local max only covers this
            # host's scp shard.
            t_max = int(dispenser.max_input_length)
            l_max = (
                self._agreed_max_target_length if self.loss_type == "ctc" else t_max
            )
            batcher = DeviceBatcher(fixed_input_length=t_max, fixed_target_length=l_max)

        # only process 0 writes the primary metrics file (others keep
        # per-process logs so a pod run stays debuggable without races)
        metrics_name = (
            "metrics.jsonl" if jax.process_index() == 0 else f"metrics.p{jax.process_index()}.jsonl"
        )
        metrics = MetricsLogger(os.path.join(self.savedir, metrics_name))

        # TensorBoard summaries (reference trainer.py:207-211, 249-258)
        viz = None
        metrics_hook = metrics
        validation_hook = None
        if str(self.conf.get("visualise", "False")) == "True" and jax.process_index() == 0:
            from tfkaldi_tpu.utils.visualize import TensorBoardVisualizer

            viz = TensorBoardVisualizer(os.path.join(self.savedir, "logdir"))

            def metrics_hook(**kw):
                metrics(**kw)
                viz(**kw)

            validation_hook = viz.validation

        controller = TrainingController(
            trainer,
            dispenser,
            batcher,
            opts,
            metrics_hook=metrics_hook,
            mesh=mesh,
            validation_hook=validation_hook,
        )
        try:
            state = controller.train()
            if viz is not None:
                viz.params(int(state.step), state.params)
            return state
        finally:
            log.info("avg training throughput: %.0f frames/sec", metrics.avg_frames_per_sec)
            metrics.close()
            if viz is not None:
                viz.close()

    def decode(self, reader: FeatureReader, writer: ArkWriter) -> int:
        """Emit prior-normalized log pseudo-likelihoods for a test set
        (nnet.py:246-289)."""
        if self.loss_type in ("rnnt", "attention"):
            raise ValueError(
                "sequence-transduction models have no per-frame posteriors "
                "to emit as pseudo-likelihoods; use decode_text"
            )
        trainer = Trainer(self.model, TrainerConfig())
        template = trainer.init_state(jax.random.PRNGKey(0))
        state = ckpt.restore_state(os.path.join(self.savedir, "final"), template)
        prior = np.load(os.path.join(self.savedir, "prior.npy"))
        mesh = None
        # decode throughput knobs ([nnet] decode_batch_size /
        # decode_bucket_multiple); defaults match the test-sized shapes
        batch_size = int(self.conf.get("decode_batch_size", 16))
        bucket_multiple = int(self.conf.get("decode_bucket_multiple", 128))
        # decode fans out over the test set, so each host works its own scp
        # shard on its OWN devices (no cross-host batch assembly); a global
        # mesh is only used single-host
        devices = jax.local_devices() if jax.process_count() > 1 else jax.devices()
        if len(devices) > 1 and batch_size % len(devices) == 0:
            from tfkaldi_tpu.parallel import make_mesh

            mesh = make_mesh(devices=devices)
        decoder = Decoder(self.model, state.params, state.model_state, prior, mesh=mesh)
        count = decoder.decode_to_writer(
            reader, writer, batch_size=batch_size, bucket_multiple=bucket_multiple
        )
        writer.close()
        log.info("decoded %d utterances", count)
        return count

    def decode_text(self, reader: FeatureReader, coder, outfile: str) -> int:
        """Decode a test set to a Kaldi-style ``text`` file: greedy/beam
        CTC for ``loss = ctc``, greedy/beam transducer search for
        ``loss = rnnt``, autoregressive attention beam search for
        ``loss = attention`` (the reference has no working text decode)."""
        if self.loss_type not in ("ctc", "rnnt", "attention"):
            raise ValueError(
                "decode_text requires loss = ctc, rnnt, or attention"
            )
        from tfkaldi_tpu.decode.ctc import CTCDecoder

        trainer = Trainer(self.model, TrainerConfig(loss_type=self.loss_type))
        template = trainer.init_state(jax.random.PRNGKey(0))
        state = ckpt.restore_state(os.path.join(self.savedir, "final"), template)

        # optional ARPA-LM shallow fusion inside the jitted beams
        # ([nnet] lm_path / lm_alpha / lm_beta): the backoff LM resolved
        # into a dense device table (decode/lm.py)
        from tfkaldi_tpu.decode.lm import fusion_from_config

        def dense_fusion(column_tokens):
            return fusion_from_config(self.conf, coder, column_tokens)

        if self.loss_type == "attention":
            # decode_mode = rescoring runs the two-pass CTC-nbest +
            # attention-rescore decode (needs ctc_weight > 0); default is
            # the autoregressive attention beam
            if self.conf.get("decode_mode", "beam") == "rescoring":
                from tfkaldi_tpu.decode.seq2seq import CTCRescoreDecoder

                decoder = CTCRescoreDecoder(
                    self.model,
                    state.params,
                    state.model_state,
                    coder,
                    beam_width=int(self.conf.get("beam_width", 10)),
                    rescore_weight=float(self.conf.get("rescore_weight", 0.5)),
                    max_tokens=int(self.conf.get("max_decode_tokens", 100)),
                )
            else:
                from tfkaldi_tpu.decode.seq2seq import Seq2SeqBeamDecoder

                decoder = Seq2SeqBeamDecoder(
                    self.model,
                    state.params,
                    state.model_state,
                    coder,
                    beam_width=int(self.conf.get("beam_width", 1)),
                    max_tokens=int(self.conf.get("max_decode_tokens", 100)),
                    length_penalty=float(self.conf.get("length_penalty", 0.0)),
                    # the EOS column carries the LM's end-of-sentence term
                    fusion_table=dense_fusion(list(coder.alphabet) + ["</s>"]),
                )
            count = decoder.decode_to_file(
                reader,
                outfile,
                batch_size=int(self.conf.get("decode_batch_size", 16)),
                bucket_multiple=int(self.conf.get("decode_bucket_multiple", 128)),
            )
            log.info("decoded %d utterances", count)
            return count
        if self.loss_type == "rnnt":
            # beam_width > 1 selects the batched beam search (same config
            # knob the CTC path uses); 1 = the greedy scan
            beam_width = int(self.conf.get("beam_width", 1))
            max_symbols = int(self.conf.get("max_symbols_per_frame", 4))
            if beam_width > 1:
                from tfkaldi_tpu.decode.transducer_beam import (
                    TransducerBeamDecoder,
                )

                decoder = TransducerBeamDecoder(
                    self.model,
                    state.params,
                    state.model_state,
                    coder,
                    beam_width=beam_width,
                    max_symbols_per_frame=max_symbols,
                    fusion_table=dense_fusion(list(coder.alphabet)),
                )
            else:
                if self.conf.get("lm_path", ""):
                    raise ValueError("lm_path needs beam_width > 1 in [nnet]")
                from tfkaldi_tpu.decode.transducer import TransducerDecoder

                decoder = TransducerDecoder(
                    self.model,
                    state.params,
                    state.model_state,
                    coder,
                    max_symbols_per_frame=max_symbols,
                )
            count = decoder.decode_to_file(
                reader,
                outfile,
                batch_size=int(self.conf.get("decode_batch_size", 16)),
                bucket_multiple=int(self.conf.get("decode_bucket_multiple", 128)),
            )
            log.info("decoded %d utterances", count)
            return count
        # optional ARPA-LM shallow fusion over the coder's alphabet
        # ([nnet] lm_path / lm_alpha / lm_beta; needs beam_width > 1)
        scorer = None
        lm_path = self.conf.get("lm_path", "")
        if lm_path:
            if int(self.conf.get("beam_width", 1)) <= 1:
                raise ValueError("lm_path needs beam_width > 1 in [nnet]")
            from tfkaldi_tpu.decode.lm import ArpaLM, FusionScorer

            # the blank is an extra non-text class past the alphabet
            tokens = list(coder.alphabet) + ["<blank>"]
            scorer = FusionScorer(
                ArpaLM.load(lm_path),
                tokens,
                alpha=float(self.conf.get("lm_alpha", 0.5)),
                beta=float(self.conf.get("lm_beta", 0.0)),
            )
        decoder = CTCDecoder(
            self.model,
            state.params,
            state.model_state,
            coder,
            self.blank_id,
            beam_width=int(self.conf.get("beam_width", 1)),
            fusion_scorer=scorer,
        )
        count = decoder.decode_to_file(
            reader,
            outfile,
            batch_size=int(self.conf.get("decode_batch_size", 16)),
            bucket_multiple=int(self.conf.get("decode_bucket_multiple", 128)),
        )
        log.info("decoded %d utterances", count)
        return count
