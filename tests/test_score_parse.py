"""best_wer against realistic Kaldi ``local/score.sh`` output formats.

The scoring seam was previously tested only against self-invented one-line
``wer_*`` fixtures; these vendored fixtures reproduce the actual output
family of Kaldi's scoring scripts (documented public formats):

- WSJ/AURORA4-style ``local/score.sh``: per-(LMWT, word-insertion-penalty)
  files ``wer_<lmwt>_<penalty>`` holding full ``compute-wer`` output —
  echoed command line, ``%WER``, ``%SER``, ``Scored`` lines
  (kaldi egs/wsj/s5/local/score.sh; reference kaldi/decode.sh:69-77 calls
  exactly this seam).
- older-style ``wer_<lmwt>`` single-penalty files.
"""

import os

import pytest

from tfkaldi_tpu.kaldi.decode_wfst import best_wer


def _aurora4_style(decode_dir, lmwt, penalty, wer, ins, dele, sub, total=14850, errs=None):
    """Full compute-wer output as score.sh captures it (cmd echo + stats)."""
    errs = errs if errs is not None else ins + dele + sub
    content = (
        f"compute-wer --text --mode=present "
        f"ark:{decode_dir}/scoring/test_filt.txt ark,p:- \n"
        f"%WER {wer} [ {errs} / {total}, {ins} ins, {dele} del, {sub} sub ]\n"
        f"%SER 55.12 [ 183 / 332 ]\n"
        f"Scored 332 sentences, 0 not present in hyp.\n"
    )
    with open(os.path.join(decode_dir, f"wer_{lmwt}_{penalty}"), "w") as f:
        f.write(content)


def test_aurora4_score_sh_format(tmp_path):
    """The (LMWT, penalty) sweep: pick the minimum across all files."""
    d = str(tmp_path)
    _aurora4_style(d, 10, "0.0", 9.12, 120, 210, 1024)
    _aurora4_style(d, 14, "0.5", 8.31, 110, 190, 934)
    _aurora4_style(d, 17, "1.0", 8.77, 100, 250, 952)
    out = best_wer(d)
    assert out.startswith("%WER 8.31 [")
    assert out.endswith("[wer_14_0.5]")
    assert "1234 / 14850" in out  # the full error-count payload survives


def test_old_style_single_penalty(tmp_path):
    d = str(tmp_path)
    for lmwt, wer in [(9, 12.3), (10, 11.9), (11, 12.0)]:
        with open(os.path.join(d, f"wer_{lmwt}"), "w") as f:
            f.write(f"compute-wer --text --mode=present ark:t.txt ark,p:- \n")
            f.write(f"%WER {wer} [ {int(wer*10)} / 1000, 3 ins, 4 del, 5 sub ]\n")
    assert "[wer_10]" in best_wer(d)
    assert "%WER 11.9" in best_wer(d)


def test_tie_breaks_deterministically(tmp_path):
    """Equal WERs must resolve to the sorted-first filename regardless of
    filesystem listing order (grep|best_wer.sh was order-dependent too,
    but a protocol artifact must be reproducible)."""
    d = str(tmp_path)
    _aurora4_style(d, 17, "1.0", 8.31, 100, 250, 952)
    _aurora4_style(d, 10, "0.0", 8.31, 120, 210, 1024)
    assert "[wer_10_0.0]" in best_wer(d)


def test_malformed_lines_skipped(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "wer_9"), "w") as f:
        f.write("%WER garbage [ x / y ]\n")  # non-numeric
        f.write("%WER\n")  # truncated
    with open(os.path.join(d, "wer_10"), "w") as f:
        f.write("%WER 10.5 [ 105 / 1000, 1 ins, 2 del, 3 sub ]\n")
    out = best_wer(d)
    assert "%WER 10.5" in out and "[wer_10]" in out


def test_binary_garbage_does_not_crash(tmp_path):
    """A truncated/corrupt scoring file (e.g. a killed score.sh job) must
    not raise UnicodeDecodeError."""
    d = str(tmp_path)
    with open(os.path.join(d, "wer_9"), "wb") as f:
        f.write(b"\xff\xfe%WER 9.9 [ 99 / 1000 ]\n\x00\x80")
    assert "%WER 9.9" in best_wer(d)


def test_no_wer_files(tmp_path):
    assert best_wer(str(tmp_path)) == "no wer_* files found"


def test_wer_named_directory_ignored(tmp_path):
    """score.sh trees can contain scoring dirs; a directory matching the
    wer_ prefix must not crash the scan."""
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "wer_details"))
    _aurora4_style(d, 10, "0.0", 8.31, 120, 210, 904)
    assert "%WER 8.31" in best_wer(d)


def test_full_parse_to_gate_path(tmp_path):
    """The runbook's WER extraction + acceptance-gate arithmetic against a
    realistic decode dir (benchmarks/run_aurora4.sh's python snippets)."""
    d = str(tmp_path)
    _aurora4_style(d, 14, "0.5", 8.31, 110, 190, 934)
    line = best_wer(d)
    wer = None
    for tok in line.replace("%WER", " ").split():
        try:
            wer = float(tok)
            break
        except ValueError:
            continue
    assert wer == 8.31
    # the BASELINE.md 0.2%-abs gate
    assert abs(wer - 8.45) <= 0.2  # passes
    assert not (abs(wer - 8.60) <= 0.2)  # fails
