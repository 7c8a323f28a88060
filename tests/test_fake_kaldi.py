"""Drive the external-Kaldi orchestration through REAL subprocesses against
stub Kaldi scripts/binaries (SURVEY §4: CI has no Kaldi, so the boundary is
tested with recorded fixtures). The stubs validate the invocation shape and
produce the files the next pipeline stage consumes."""

import gzip
import os
import stat
from configparser import ConfigParser

import pytest

from tfkaldi_tpu.kaldi import MonoGmm
from tfkaldi_tpu.kaldi.decode_wfst import WfstDecodeOpts, best_wer, decode_wfst


def _write_exec(path, body):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("#!/bin/bash\nset -e\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture
def egs(tmp_path, monkeypatch):
    """A fake kaldi egs dir with stub steps/utils scripts and fake binaries
    (ali-to-pdf, run.pl) on PATH via a bin/ prepended in each stub."""
    egs = tmp_path / "egs"
    bindir = egs / "fakebin"

    # fake ali-to-pdf: transition-ids -> pdf-ids by halving each id
    _write_exec(
        str(bindir / "ali-to-pdf"),
        'awk \'{ printf "%s", $1; for (i=2; i<=NF; i++) printf " %d", int($i/2); print "" }\'\n',
    )
    # run.pl substitute: run the command once with JOB=1
    _write_exec(
        str(bindir / "run.pl"),
        # usage: run.pl [--opt v]... JOB=1:N logfile cmd...
        'while [[ "$1" == --* ]]; do shift 2; done\n'
        "spec=$1; shift\nlog=$1; shift\n"
        'n=${spec##*:}\nfor j in $(seq 1 "$n"); do\n'
        '  thislog=${log//JOB/$j}\n  mkdir -p "$(dirname "$thislog")"\n'
        '  cmd="$*"\n  cmd=${cmd//JOB/$j}\n  bash -c "$cmd" > "$thislog" 2>&1\ndone\n',
    )
    path_line = f'export PATH="{bindir}:$PATH"\n'

    _write_exec(
        str(egs / "steps" / "train_mono.sh"),
        path_line
        + "# args: --cmd c --config f --nj n featdir lang ali expdir (ali empty for mono)\n"
        'while [[ "$1" == --* ]]; do shift 2; done\n'
        'featdir=$1; lang=$2; expdir=${!#}\n'
        'test -f "$featdir/feats.scp"\n'
        'mkdir -p "$expdir"\necho fake-mdl > "$expdir/final.mdl"\n',
    )
    _write_exec(
        str(egs / "utils" / "mkgraph.sh"),
        'while [[ "$1" == --* ]]; do shift; done\n'
        'graph=${!#}\nmkdir -p "$graph"\necho 42 > "$graph/num_pdfs"\n'
        'echo fake-fst > "$graph/HCLG.fst"\necho "a 1" > "$graph/words.txt"\n',
    )
    _write_exec(
        str(egs / "steps" / "align_si.sh"),
        path_line
        + 'nj=2\nwhile [[ "$1" == --* ]]; do if [[ "$1" == --nj ]]; then nj=$2; fi; shift 2; done\n'
        'alidir=${!#}\nmkdir -p "$alidir"\ncp "$(dirname "$alidir")/final.mdl" "$alidir/final.mdl"\n'
        'for j in $(seq 1 "$nj"); do\n'
        '  echo "utt$j 2 4 6" | gzip > "$alidir/ali.$j.gz"\ndone\n',
    )
    _write_exec(
        str(egs / "utils" / "split_data.sh"),
        'data=$1; nj=$2\nfor j in $(seq 1 "$nj"); do\n'
        '  mkdir -p "$data/split$nj/$j"\n'
        '  cp "$data/feats.scp" "$data/split$nj/$j/feats.scp"\ndone\n',
    )
    _write_exec(
        str(egs / "local" / "score.sh"),
        'while [[ "$1" == --* ]]; do shift 2; done\n'
        'decode_dir=${!#}\necho "%WER 7.77 [ 77 / 990 ]" > "$decode_dir/wer_9"\n'
        'echo "%WER 8.88 [ 88 / 990 ]" > "$decode_dir/wer_10"\n',
    )
    # the latgen pipeline runs under run.pl; make the binaries exist
    _write_exec(str(bindir / "latgen-faster-mapped"), 'cat > /dev/null || true\necho lat\n')
    _write_exec(str(bindir / "copy-feats"), "echo feats\n")

    # PATH for the top-level run.pl/gzip pipe commands issued by decode_wfst
    monkeypatch.setenv("PATH", f"{bindir}:" + os.environ["PATH"])
    return egs


@pytest.fixture
def conf(tmp_path, egs):
    c = ConfigParser()
    featdir = tmp_path / "feat" / "feats"
    featdir.mkdir(parents=True)
    (featdir / "feats.scp").write_text("utt1 a.ark:0\n")
    c["directories"] = {
        "expdir": str(tmp_path / "exp"),
        "train_features": str(tmp_path / "feat"),
        "test_features": str(tmp_path / "feat"),
        "language": "/lang",
        "language_test": "/lang_test",
        "kaldi_egs": str(egs),
    }
    c["general"] = {"num_jobs": "2", "cmd": "run.pl"}
    c["gmm-features"] = {"name": "feats"}
    c["mono_gmm"] = {"name": "mono"}
    return c


def test_mono_train_align_merge_against_stubs(conf):
    gmm = MonoGmm(conf)
    gmm.train()
    assert os.path.isfile(os.path.join(gmm.expdir, "final.mdl"))
    assert (
        open(os.path.join(gmm.expdir, "graph", "num_pdfs")).read().strip() == "42"
    )

    gmm.align()
    for j in (1, 2):
        with gzip.open(os.path.join(gmm.expdir, "ali", f"pdf.{j}.gz"), "rt") as f:
            # ali-to-pdf stub halves the transition ids 2 4 6 -> 1 2 3
            assert f.read().strip() == f"utt{j} 1 2 3"

    merged = gmm.merge_alignments()
    with gzip.open(merged, "rt") as f:
        assert f.read() == "utt1 1 2 3\nutt2 1 2 3\n"


def test_decode_wfst_against_stubs(conf, tmp_path, egs):
    srcdir = tmp_path / "exp" / "nnet"
    decode_dir = srcdir / "decode"
    data = tmp_path / "feat" / "feats"
    (srcdir).mkdir(parents=True)
    (srcdir / "final.mdl").write_text("fake\n")
    graph = tmp_path / "graph"
    graph.mkdir()
    (graph / "HCLG.fst").write_text("fst\n")
    (graph / "words.txt").write_text("a 1\n")

    decode_wfst(str(graph), str(data), str(decode_dir), str(egs), WfstDecodeOpts(nj=2))
    # run.pl stub ran latgen once per job and wrote logs
    assert os.path.isfile(decode_dir / "log" / "decode.1.log")
    assert os.path.isfile(decode_dir / "log" / "decode.2.log")
    assert (decode_dir / "num_jobs").read_text() == "2\n"
    # scoring stub wrote wer files; best_wer picks the lowest
    assert "7.77" in best_wer(str(decode_dir))
