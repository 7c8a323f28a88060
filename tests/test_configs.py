"""The shipped .cfg recipes must parse and build every option object
(drop-in compatibility north star: a reference user's configs keep
working)."""

import os
from configparser import ConfigParser

import pytest

from tfkaldi_tpu.frontend.features import FeatureOpts
from tfkaldi_tpu.models import DNNConfig
from tfkaldi_tpu.train import NnetTrainOptions, TrainerConfig

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config")
RECIPES = [f for f in os.listdir(CONFIG_DIR) if f.endswith(".cfg")]


@pytest.mark.parametrize("recipe", RECIPES)
def test_recipe_builds_all_option_objects(recipe):
    cfg = ConfigParser()
    assert cfg.read(os.path.join(CONFIG_DIR, recipe))

    for section in ("gmm-features", "dnn-features"):
        opts = FeatureOpts.from_config(dict(cfg.items(section)))
        assert opts.dim > 0
        assert opts.feature_type in ("fbank", "mfcc", "ssc")

    nnet = dict(cfg.items("nnet"))
    model_type = nnet.get("model", "dnn")
    if model_type == "transducer":
        from tfkaldi_tpu.models import Transducer, TransducerConfig

        td = Transducer(
            TransducerConfig.from_config(nnet, input_dim=40, num_labels=28)
        )
        assert td.vocab_size == 29
    elif model_type == "seq2seq":
        from tfkaldi_tpu.models import AttentionSeq2Seq, Seq2SeqConfig

        s2s = AttentionSeq2Seq(
            Seq2SeqConfig.from_config(nnet, input_dim=40, num_labels=28)
        )
        assert s2s.vocab_size == 29
    elif model_type == "dnn":
        dnn = DNNConfig.from_config(nnet, input_dim=440, num_labels=2000)
        assert dnn.num_hidden_layers > 0 and dnn.num_hidden_units > 0
    tr = TrainerConfig(
        init_learning_rate=float(nnet["initial_learning_rate"]),
        learning_rate_decay=float(nnet["learning_rate_decay"]),
    )
    assert tr.init_learning_rate > 0
    opts = NnetTrainOptions.from_config(nnet, savedir="/tmp/x")
    assert opts.batch_size > 0 and opts.num_epochs > 0

    # required directory keys (cli/main.py)
    for key in ("train_data", "test_data", "train_features", "test_features", "expdir"):
        assert cfg.get("directories", key)

    # GMM sections the CLI drives
    for section in ("mono_gmm", "tri_gmm", "lda_mllt"):
        assert cfg.get(section, "name")
    assert cfg.get("general", "num_jobs")
