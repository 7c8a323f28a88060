"""Smoke test for the WER-parity runbook (benchmarks/run_aurora4.sh).

Runs the whole script — env checks, full CLI pipeline, WER extraction, and
the 0.2%-abs acceptance gate — against the stub-Kaldi workspace fixture, so
the protocol is proven executable end-to-end without real Kaldi/AURORA4
(those exist only outside CI; the script is the one-command entry point for
the day they do)."""

import os
import subprocess
import sys

import pytest

from tests.test_cli_full_pipeline import workspace  # noqa: F401  (fixture reuse)

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
    "run_aurora4.sh",
)


@pytest.mark.skipif(sys.platform != "linux", reason="bash runbook")
def test_runbook_full_protocol_with_gate(workspace):  # noqa: F811
    tmp, cfg = workspace
    # the stub local/score.sh writes "%WER 5.55" — gate vs 5.6 passes
    result = subprocess.run(
        [
            "bash", SCRIPT, "--config", str(cfg),
            "--reference-wer", "5.6",
            "--steps",
            "gmm_train_features,gmm_test_features,train_mono,align_mono,train_nnet,test_nnet",
        ],
        env={**os.environ, "KALDI_ROOT": ""},
        capture_output=True,
        text=True,
        timeout=1800,  # generous: the pipeline runs its own JAX subprocess and CI may be under heavy load (observed 210s idle, >600s loaded)
    )
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-3000:]
    assert "best WER: 5.55" in result.stdout
    assert "PASS" in result.stdout

    # the gate FAILS when the WER drifts past 0.2 abs
    result = subprocess.run(
        ["bash", SCRIPT, "--config", str(cfg), "--reference-wer", "6.6",
         "--steps", "test_nnet"],
        env={**os.environ, "KALDI_ROOT": ""},
        capture_output=True,
        text=True,
        timeout=1800,  # generous: the pipeline runs its own JAX subprocess and CI may be under heavy load (observed 210s idle, >600s loaded)
    )
    assert result.returncode == 1, result.stdout[-2000:]
    assert "FAIL" in result.stdout


@pytest.mark.skipif(sys.platform != "linux", reason="bash runbook")
def test_runbook_rejects_missing_kaldi(tmp_path):
    cfg = tmp_path / "c.cfg"
    cfg.write_text("[directories]\nexpdir = /tmp\n")
    result = subprocess.run(
        ["bash", SCRIPT, "--config", str(cfg)],
        env={k: v for k, v in os.environ.items() if k != "KALDI_ROOT"}
        | {"PATH": "/usr/bin:/bin"},
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert result.returncode == 2
    assert "missing Kaldi binary" in result.stderr
