"""Neural network classifiers (layer L3).

TPU-first re-design of the reference's neuralNetworks/classifiers/*: pure
functional param pytrees + jit-compiled forwards over padded ``[B, T, F]``
batches with frame masks, instead of TF variable scopes over time-major
tensor lists with gather-based un-padding (seq_convertors.py).
"""

from tfkaldi_tpu.models.cnn import CNN, CNNConfig
from tfkaldi_tpu.models.dnn import DNN, DNNConfig
from tfkaldi_tpu.models.rnn import GRU, LSTM, RNNConfig
from tfkaldi_tpu.models.seq2seq import AttentionSeq2Seq, Seq2SeqConfig
from tfkaldi_tpu.models.tdnn import TDNN, TDNNConfig
from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig
from tfkaldi_tpu.models.transformer import Transformer, TransformerConfig

__all__ = [
    "AttentionSeq2Seq", "CNN", "CNNConfig", "DNN", "DNNConfig", "GRU",
    "LSTM", "RNNConfig", "Seq2SeqConfig", "TDNN", "TDNNConfig",
    "Transducer", "TransducerConfig", "Transformer", "TransformerConfig",
]
