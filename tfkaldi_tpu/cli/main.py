"""Pipeline driver: features → GMM → DNN → decode → WER.

Equivalent of the reference main.py, with two usability fixes: the step
toggles are CLI flags instead of edit-the-source booleans (main.py:11-25),
and the config path is an argument instead of hardcoded (main.py:30).

Usage:
    python -m tfkaldi_tpu.cli.main --config config/config_AURORA4.cfg \
        --steps gmm_train_features,train_mono,align_mono,...
    python -m tfkaldi_tpu.cli.main --config ... --steps all
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from configparser import ConfigParser

log = logging.getLogger("tfkaldi_tpu")

# ordered pipeline steps; tuples are (name, required-by-default)
STEPS = [
    "gmm_train_features",
    "dnn_train_features",
    "gmm_test_features",
    "dnn_test_features",
    "train_mono",
    "align_mono",
    "test_mono",
    "train_tri",
    "align_tri",
    "test_tri",
    "train_lda",
    "align_lda",
    "test_lda",
    "train_nnet",
    "test_nnet",
]

# the reference's default-on steps (main.py:11-25)
DEFAULT_STEPS = [
    "gmm_train_features",
    "dnn_train_features",
    "dnn_test_features",
    "train_mono",
    "align_mono",
    "train_tri",
    "align_tri",
    "train_lda",
    "align_lda",
    "train_nnet",
    "test_nnet",
]


def resolve_labels(config):
    """Label space from the config: ``(is_ctc, coder_or_None, num_labels,
    gmm_name_or_None)``.

    CTC mode takes its labels from the TextCoder alphabet; the hybrid path
    reads ``num_pdfs`` from the parent GMM's graph (main.py:123-126).
    Shared by the training/decoding driver and the serve driver so the two
    can never disagree on the alphabet.
    """
    from tfkaldi_tpu.data import TextCoder
    from tfkaldi_tpu.data.target_normalizers import aurora4_normalizer, identity_normalizer

    # ctc, rnnt AND attention are all text-target modes: labels come from
    # the TextCoder alphabet, batches from the TextBatchDispenser, and the
    # decode step emits transcriptions instead of pseudo-likelihood arks
    ctc = config.has_option("nnet", "loss") and config.get("nnet", "loss") in (
        "ctc",
        "rnnt",
        "attention",
    )
    if ctc:
        normalizer = (
            aurora4_normalizer
            if config.has_option("nnet", "normalizer")
            and config.get("nnet", "normalizer") == "aurora4"
            else identity_normalizer
        )
        coder = TextCoder(normalizer)
        return True, coder, coder.num_labels, None
    gmm_name = config.get("nnet", "gmm_name")
    numpdfs_file = os.path.join(
        config.get("directories", "expdir"), gmm_name, "graph", "num_pdfs"
    )
    with open(numpdfs_file) as fid:
        num_labels = int(fid.read().strip())
    return False, None, num_labels, gmm_name


def _cmvn_path(config, featdir: str) -> str | None:
    """CMVN scp for a featdir, honoring the ``apply_cmvn`` key of
    [dnn-features] (present in the reference's CGN recipe but silently
    ignored by its code; here it works)."""
    if (
        config.has_option("dnn-features", "apply_cmvn")
        and config.get("dnn-features", "apply_cmvn") == "False"
    ):
        return None
    return os.path.join(featdir, "cmvn.scp")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="path to the .cfg file")
    parser.add_argument(
        "--steps",
        default="default",
        help="comma-separated steps, 'all', or 'default' "
        f"(available: {','.join(STEPS)})",
    )
    parser.add_argument("--batch-size", type=int, default=32, help="feature-extraction batch")
    return parser.parse_args(argv)


def _merge_shards(out_path: str, shard_paths: list) -> None:
    """Concatenate per-host shard files into one output (host 0 only)."""
    with open(out_path, "w") as fout:
        for p in shard_paths:
            with open(p) as fin:
                fout.write(fin.read())


def _barrier(name: str) -> None:
    """Synchronize all hosts of a multi-host run (no-op single-host)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    args = parse_args(argv)

    config = ConfigParser()
    if not config.read(args.config):
        log.error("cannot read config %s", args.config)
        return 1

    # multi-host pod runtime: jax.distributed must come up BEFORE any other
    # JAX API touches the backend. No-op on a single host (SURVEY §2.2: the
    # reference has no distributed runtime at all).
    from tfkaldi_tpu.parallel import initialize as multihost_initialize

    multihost_initialize()
    import jax

    n_proc, pid = jax.process_count(), jax.process_index()
    if n_proc > 1:
        log.info("multi-host run: process %d of %d", pid, n_proc)

    if args.steps == "all":
        steps = set(STEPS)
    elif args.steps == "default":
        steps = set(DEFAULT_STEPS)
    else:
        steps = set(s.strip() for s in args.steps.split(","))
        unknown = steps - set(STEPS)
        if unknown:
            log.error("unknown steps: %s", ",".join(sorted(unknown)))
            return 1

    from tfkaldi_tpu.frontend.prepare_data import compute_cmvn, prepare_data, shuffle_examples

    def featdir(kind: str, feats: str) -> str:
        return os.path.join(
            config.get("directories", f"{kind}_features"), config.get(feats, "name")
        )

    same_feats = config.get("dnn-features", "name") == config.get("gmm-features", "name")

    # ---- feature preparation (main.py:34-74) ----
    for step, kind, section in [
        ("gmm_train_features", "train", "gmm-features"),
        ("dnn_train_features", "train", "dnn-features"),
        ("gmm_test_features", "test", "gmm-features"),
        ("dnn_test_features", "test", "dnn-features"),
    ]:
        if step not in steps:
            continue
        if section == "dnn-features" and same_feats:
            continue  # identical to gmm features (main.py:45, 67)
        if pid != 0:
            continue  # multi-host: featdirs are written once (barrier below)
        feat_cfg = dict(config.items(section))
        datadir = config.get("directories", f"{kind}_data")
        out = featdir(kind, section)
        log.info("------- computing %s %s features ----------", kind, section)
        prepare_data(
            datadir, out, feat_cfg, feat_cfg["type"], feat_cfg["dynamic"],
            batch_size=args.batch_size,
            # optional per-section key: 'high' (f64 parity, default) | 'fast'
            spectrum_precision=feat_cfg.get("spectrum_precision", "high"),
        )
        log.info("------- computing cmvn stats ----------")
        compute_cmvn(out)
    _barrier("features")

    # ---- GMM stages (main.py:77-114) ----
    from tfkaldi_tpu.kaldi import LdaGmm, MonoGmm, TriGmm

    for cls, prefix in [(MonoGmm, "mono"), (TriGmm, "tri"), (LdaGmm, "lda")]:
        if pid != 0:
            break  # multi-host: external Kaldi runs on one host (its own --nj fan-out)
        gmm = cls(config)
        if f"train_{prefix}" in steps:
            log.info("------- training %s GMM ----------", prefix)
            gmm.train()
        if f"align_{prefix}" in steps:
            log.info("------- aligning %s GMM ----------", prefix)
            gmm.align()
        if f"test_{prefix}" in steps:
            log.info("------- testing %s GMM ----------", prefix)
            gmm.test()
    if {s for s in steps if s.startswith(("train_", "align_", "test_")) and "nnet" not in s}:
        _barrier("gmm")

    if not ({"train_nnet", "test_nnet"} & steps):
        return 0

    # ---- DNN stages (main.py:117-201) ----
    from tfkaldi_tpu.data import (
        AlignmentBatchDispenser,
        AlignmentCoder,
        FeatureReader,
        TextBatchDispenser,
    )
    from tfkaldi_tpu.data.target_normalizers import identity_normalizer
    from tfkaldi_tpu.io import ArkReader, ArkWriter
    from tfkaldi_tpu.nnet import Nnet

    # feature input dim from the first utterance (main.py:118-120)
    train_featdir = featdir("train", "dnn-features")
    reader = ArkReader(os.path.join(train_featdir, "feats.scp"))
    _, features, _ = reader.read_next_utt()
    input_dim = features.shape[1]
    reader.close()

    # character-CTC variant: labels come from the TextCoder alphabet, not
    # the GMM tree (the reference's CTC path was never finished)
    ctc, text_coder, num_labels, gmm_name = resolve_labels(config)

    nnet = Nnet(config, input_dim, num_labels)

    if "train_nnet" in steps:
        seed = (
            int(config.get("nnet", "seed")) if config.has_option("nnet", "seed") else 0
        )
        if config.get("nnet", "starting_step") == "0":
            log.info("------- shuffling examples ----------")
            bands = (
                int(config.get("nnet", "shuffle_length_bands"))
                if config.has_option("nnet", "shuffle_length_bands")
                else 0
            )
            # keep the validation carve (head of the scp) uniformly sampled
            valid_head = int(config.get("nnet", "valid_batches")) * int(
                config.get("nnet", "batch_size")
            )
            # seeded: every host of a multi-host run derives the identical
            # shuffle locally, so no coordination (or shared fs) is needed
            shuffle_examples(
                train_featdir, seed=seed, length_bands=bands, valid_head=valid_head
            )

        train_scp = os.path.join(train_featdir, "feats_shuffled.scp")
        if n_proc > 1:
            # per-host strided shard of the scp index; equal shard sizes so
            # hosts agree on num_batches/num_steps without communicating
            from tfkaldi_tpu.data.sharding import shard_scp

            train_scp = shard_scp(train_scp, drop_remainder=True)
            log.info("host %d training on scp shard %s", pid, train_scp)

        with open(os.path.join(train_featdir, "maxlength")) as fid:
            max_input_length = int(fid.read())
        featreader = FeatureReader(
            train_scp,
            _cmvn_path(config, train_featdir),
            os.path.join(train_featdir, "utt2spk"),
            int(config.get("nnet", "context_width")),
            max_input_length,
        )
        # [nnet] batch_size is the GLOBAL batch; each host dispenses its share
        batch_size = int(config.get("nnet", "batch_size"))
        if n_proc > 1:
            if batch_size % n_proc != 0:
                log.error("batch_size %d not divisible by %d hosts", batch_size, n_proc)
                return 1
            batch_size //= n_proc
        if ctc:
            # production input path for the text-target recipes
            # (CTC/RNN-T/attention): the native bulk loader, byte-identical
            # batches to TextBatchDispenser + DeviceBatcher; opt out with
            # [nnet] native_loader = False
            from tfkaldi_tpu.io import native

            use_native = (
                config.get("nnet", "native_loader", fallback="True") != "False"
                and native.available()
            )
            if use_native:
                from tfkaldi_tpu.data.bulk_loader import BulkTextBatchSource

                dispenser = BulkTextBatchSource(
                    train_scp,
                    _cmvn_path(config, train_featdir),
                    os.path.join(train_featdir, "utt2spk"),
                    int(config.get("nnet", "context_width")),
                    text_coder,
                    os.path.join(train_featdir, "text"),
                    batch_size,
                    max_input_length=max_input_length,
                )
                log.info("using native bulk data loader (text targets)")
            else:
                log.info("using Python data loader (native unavailable or disabled)")
                dispenser = TextBatchDispenser(
                    featreader, text_coder, batch_size,
                    os.path.join(train_featdir, "text"),
                )
        else:
            # merge per-job alignments (main.py:139-142)
            from tfkaldi_tpu.kaldi.gmm import merge_alignments

            ali_dir = os.path.join(config.get("directories", "expdir"), gmm_name, "ali")
            alifile = os.path.join(ali_dir, "pdf.all.gz")
            if not os.path.isfile(alifile):
                alifile = merge_alignments(
                    ali_dir, int(config.get("general", "num_jobs"))
                )
            # production input path: the native bulk loader (one fused C++
            # read+CMVN+splice call per batch, byte-identical batches to
            # the Python dispenser) when the library is available; opt out
            # with [nnet] native_loader = False
            from tfkaldi_tpu.io import native, read_alignments

            use_native = (
                config.get("nnet", "native_loader", fallback="True") != "False"
                and native.available()
            )
            if use_native:
                from tfkaldi_tpu.data.bulk_loader import BulkAlignmentBatchSource

                dispenser = BulkAlignmentBatchSource(
                    train_scp,
                    _cmvn_path(config, train_featdir),
                    os.path.join(train_featdir, "utt2spk"),
                    int(config.get("nnet", "context_width")),
                    read_alignments(alifile),
                    batch_size,
                    num_labels=num_labels,
                    max_input_length=max_input_length,
                )
                log.info("using native bulk data loader")
            else:
                log.info("using Python data loader (native unavailable or disabled)")
                coder = AlignmentCoder(identity_normalizer, num_labels)
                dispenser = AlignmentBatchDispenser(featreader, coder, batch_size, alifile)
        log.info("------- training neural net ----------")
        nnet.train(dispenser)

    if "test_nnet" in steps:
        log.info("------- computing state pseudo-likelihoods ----------")
        savedir = os.path.join(config.get("directories", "expdir"), config.get("nnet", "name"))
        decodedir = os.path.join(savedir, "decode")
        os.makedirs(decodedir, exist_ok=True)

        test_featdir = featdir("test", "dnn-features")
        test_scp = os.path.join(test_featdir, "feats.scp")
        if n_proc > 1:
            # every host decodes its shard of the test set in parallel;
            # host 0 merges the emitted scp/text shards afterwards
            from tfkaldi_tpu.data.sharding import shard_scp

            test_scp = shard_scp(test_scp)
        with open(os.path.join(test_featdir, "maxlength")) as fid:
            max_length = int(fid.read())
        featreader = FeatureReader(
            test_scp,
            _cmvn_path(config, test_featdir),
            os.path.join(test_featdir, "utt2spk"),
            int(config.get("nnet", "context_width")),
            max_length,
        )
        if ctc:
            out = os.path.join(decodedir, "text")
            shard_out = out if n_proc == 1 else f"{out}.p{pid}"
            nnet.decode_text(featreader, text_coder, shard_out)
            _barrier("ctc_decode")
            if pid != 0:
                return 0
            if n_proc > 1:
                _merge_shards(out, [f"{out}.p{p}" for p in range(n_proc)])
            log.info("wrote CTC transcriptions to %s", out)
            ref_text = os.path.join(test_featdir, "text")
            if os.path.isfile(ref_text):
                from tfkaldi_tpu.utils.wer import char_tokens_to_words, score_text_files

                # score in normalized token space (same tokens the net saw)
                norm = os.path.join(decodedir, "text.ref_normalized")
                with open(ref_text) as fin, open(norm, "w") as fout:
                    for line in fin:
                        parts = line.split()
                        if not parts:
                            continue
                        fout.write(
                            parts[0]
                            + " "
                            + text_coder.target_normalizer(
                                " ".join(parts[1:]), text_coder.alphabet
                            )
                            + "\n"
                        )
                log.info("CTC CER: %s", score_text_files(norm, out))
                log.info(
                    "CTC WER: %s",
                    score_text_files(norm, out, transform=char_tokens_to_words),
                )
            return 0
        suffix = "" if n_proc == 1 else f".p{pid}"
        like_path = os.path.join(decodedir, f"likelihoods{suffix}.ark")
        scp_path = os.path.join(decodedir, f"feats{suffix}.scp")
        if os.path.isfile(like_path):
            os.remove(like_path)
        writer = ArkWriter(scp_path, like_path)
        nnet.decode(featreader, writer)
        _barrier("likelihoods")
        if pid != 0:
            return 0  # host 0 merges the scp shards and runs the WFST decode
        if n_proc > 1:
            _merge_shards(
                os.path.join(decodedir, "feats.scp"),
                [os.path.join(decodedir, f"feats.p{p}.scp") for p in range(n_proc)],
            )

        log.info("------- decoding testing sets ----------")
        import shutil

        from tfkaldi_tpu.kaldi.decode_wfst import WfstDecodeOpts, best_wer, decode_wfst

        gmm_exp = os.path.join(config.get("directories", "expdir"), gmm_name)
        shutil.copyfile(
            os.path.join(gmm_exp, "final.mdl"), os.path.join(decodedir, "final.mdl")
        )
        graph_dst = os.path.join(decodedir, "graph")
        if not os.path.isdir(graph_dst):
            shutil.copytree(os.path.join(gmm_exp, "graph"), graph_dst)
        for name in ("utt2spk", "text"):
            shutil.copyfile(
                os.path.join(test_featdir, name), os.path.join(decodedir, name)
            )
        decode_wfst(
            graph_dst,
            decodedir,
            os.path.join(decodedir, "kaldi_decode"),
            config.get("directories", "kaldi_egs"),
            WfstDecodeOpts(
                nj=int(config.get("general", "num_jobs")),
                cmd=config.get("general", "cmd"),
            ),
        )
        log.info("best WER: %s", best_wer(os.path.join(decodedir, "kaldi_decode")))

    return 0


if __name__ == "__main__":
    sys.exit(main())
