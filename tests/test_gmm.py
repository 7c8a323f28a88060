"""GMM / WFST orchestration: command-line construction at the external
Kaldi boundary (Kaldi itself is not installed in CI; the contract is the
exact command text the reference issues — gmm.py:21-101, decode.sh:40-77)."""

import gzip
import os
from configparser import ConfigParser

import pytest

from tfkaldi_tpu.kaldi import LdaGmm, MonoGmm, TriGmm
from tfkaldi_tpu.kaldi import gmm as gmm_mod
from tfkaldi_tpu.kaldi.decode_wfst import WfstDecodeOpts, best_wer, decode_wfst


@pytest.fixture
def conf(tmp_path):
    c = ConfigParser()
    c["directories"] = {
        "expdir": str(tmp_path / "exp"),
        "train_features": str(tmp_path / "feat"),
        "test_features": str(tmp_path / "testfeat"),
        "language": "/lang",
        "language_test": "/lang_test",
        "kaldi_egs": str(tmp_path),
    }
    c["general"] = {"num_jobs": "2", "cmd": "run.pl"}
    c["gmm-features"] = {"name": "feats"}
    c["mono_gmm"] = {"name": "mono"}
    c["tri_gmm"] = {"name": "tri", "num_leaves": "100", "tot_gauss": "400"}
    c["lda_mllt"] = {
        "name": "lda",
        "context_width": "3",
        "num_leaves": "200",
        "tot_gauss": "800",
    }
    return c


@pytest.fixture
def captured(monkeypatch):
    calls = []

    def fake_run(cmd, cwd=None):
        calls.append((cmd, cwd))

    monkeypatch.setattr(gmm_mod, "run_checked", fake_run)
    # decode_wfst imported run_checked by name (the package re-exports a
    # same-named function, so fetch the module via sys.modules)
    import sys

    monkeypatch.setattr(
        sys.modules["tfkaldi_tpu.kaldi.decode_wfst"], "run_checked", fake_run
    )
    return calls


def test_mono_train_commands(conf, captured):
    MonoGmm(conf).train()
    train_cmd, cwd = captured[0]
    assert train_cmd.startswith("steps/train_mono.sh --cmd run.pl --config ")
    assert "--nj 2" in train_cmd
    assert train_cmd.rstrip().endswith(
        f"/lang  {conf.get('directories', 'expdir')}/mono"
    ) or "/lang" in train_cmd
    assert cwd == conf.get("directories", "kaldi_egs")
    graph_cmd, _ = captured[1]
    assert graph_cmd.startswith("utils/mkgraph.sh --mono /lang_test")
    assert graph_cmd.endswith("/mono/graph")


def test_tri_train_uses_mono_alignments(conf, captured):
    TriGmm(conf).train()
    cmd, _ = captured[0]
    assert cmd.startswith("steps/train_deltas.sh")
    assert "100 400" in cmd  # num_leaves tot_gauss
    assert os.path.join(conf.get("directories", "expdir"), "mono", "ali") in cmd


def test_lda_train_context_opts(conf, captured):
    LdaGmm(conf).train()
    cmd, _ = captured[0]
    assert cmd.startswith("steps/train_lda_mllt.sh")
    assert "--context-opts" in cmd and "--context_width=3" in cmd
    assert "200 800" in cmd
    assert os.path.join(conf.get("directories", "expdir"), "tri", "ali") in cmd


def test_align_builds_ali_to_pdf_pipeline(conf, captured):
    MonoGmm(conf).align()
    align_cmd, _ = captured[0]
    assert align_cmd.startswith("steps/align_si.sh --nj 2 --cmd run.pl")
    assert align_cmd.endswith("/mono/ali")
    # one conversion pipe per job (gmm.py:70-76)
    pipes = [c for c, _ in captured[1:]]
    assert len(pipes) == 2
    for i, cmd in enumerate(pipes, start=1):
        assert f"gunzip -c" in cmd and f"ali.{i}.gz" in cmd
        assert "ali-to-pdf" in cmd and f"pdf.{i}.gz" in cmd


def test_gmm_test_command(conf, captured):
    MonoGmm(conf).test()
    cmd, _ = captured[0]
    assert cmd.startswith("steps/decode.sh --cmd run.pl --nj 2")
    assert conf.get("directories", "test_features") + "/feats" in cmd


def test_merge_alignments(conf, tmp_path):
    ali_dir = tmp_path / "exp" / "mono" / "ali"
    ali_dir.mkdir(parents=True)
    for i, content in ((1, "utt1 0 1\n"), (2, "utt2 2 3\n")):
        with gzip.open(ali_dir / f"pdf.{i}.gz", "wt") as f:
            f.write(content)
    out = MonoGmm(conf).merge_alignments()
    with gzip.open(out, "rt") as f:
        assert f.read() == "utt1 0 1\nutt2 2 3\n"


def test_decode_wfst_latgen_command(conf, captured, tmp_path):
    decode_dir = tmp_path / "exp" / "nnet" / "decode"
    decode_wfst(
        "/graph", "/data", str(decode_dir), str(tmp_path), WfstDecodeOpts(nj=2)
    )
    split_cmd, _ = captured[0]
    assert split_cmd == "utils/split_data.sh /data 2"
    latgen, _ = captured[1]
    assert "latgen-faster-mapped " in latgen  # single-thread variant
    for flag in (
        "--max-active=7000",
        "--min-active=200",
        "--beam=15.0",
        "--lattice-beam=8.0",
        "--acoustic-scale=0.1",
        "--allow-partial=true",
        "--word-symbol-table=/graph/words.txt",
        "/graph/HCLG.fst",
        "copy-feats scp:/data/split2/JOB/feats.scp",
    ):
        assert flag in latgen, flag
    score, _ = captured[2]
    assert score.startswith("local/score.sh")
    assert (decode_dir / "num_jobs").read_text() == "2\n"


def test_decode_wfst_parallel_variant(conf, captured, tmp_path):
    decode_wfst(
        "/graph",
        "/data",
        str(tmp_path / "d"),
        str(tmp_path),
        WfstDecodeOpts(nj=1, num_threads=4, skip_scoring=True),
    )
    latgen = captured[1][0]
    assert "latgen-faster-mapped-parallel --num-threads=4" in latgen
    assert len(captured) == 2  # no scoring call


def test_best_wer(tmp_path):
    (tmp_path / "wer_10").write_text("%WER 12.34 [ 100 / 810 ]\n")
    (tmp_path / "wer_11").write_text("%WER 11.50 [ 93 / 810 ]\n")
    (tmp_path / "other").write_text("%WER 1.0\n")
    out = best_wer(str(tmp_path))
    assert "11.5" in out and "wer_11" in out
