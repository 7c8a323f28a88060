#!/bin/bash
# WER-parity runbook: the full hybrid protocol in one command
# (VERDICT round 1, item 8).
#
# Executes features -> GMM train/align (mono->tri->lda) -> DNN train ->
# likelihood emission -> Kaldi WFST decode -> WER, exactly as the reference
# main.py pipeline does (reference main.py:34-198), and applies the
# BASELINE.md acceptance gate: the resulting WER must be within 0.2% abs of
# a reproduced reference run (reference main.py:195-198).
#
# Usage:
#   benchmarks/run_aurora4.sh --config config/config_AURORA4.cfg \
#       [--kaldi-root /path/to/kaldi] \
#       [--reference-wer 8.31] \
#       [--steps step1,step2,...]         # default: the reference's defaults
#
# Prerequisites (encoded in config_AURORA4.cfg [directories]):
#   - AURORA4 corpus prepared as Kaldi data dirs (train_data/test_data:
#     wav.scp, utt2spk, spk2utt, text[, segments])
#   - a Kaldi egs working dir (kaldi_egs) with steps/ utils/ local/ and a
#     prepared lang/ directory
#   - KALDI_ROOT with compiled binaries (or Kaldi tools already on PATH)
#
# Without --reference-wer the script reports the WER and exits 0; with it,
# exit 1 if the 0.2%-abs gate fails. CI smoke-tests this script against the
# stub egs fixture (tests/test_runbook.py) — the protocol is exercised
# end-to-end even though real Kaldi/AURORA4 are absent in CI.

set -euo pipefail

CONFIG=""
KALDI_ROOT="${KALDI_ROOT:-}"
REFERENCE_WER=""
STEPS="gmm_train_features,dnn_train_features,dnn_test_features,train_mono,align_mono,train_tri,align_tri,train_lda,align_lda,train_nnet,test_nnet"
GATE_ABS="0.2"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --config) CONFIG=$2; shift 2 ;;
    --kaldi-root) KALDI_ROOT=$2; shift 2 ;;
    --reference-wer) REFERENCE_WER=$2; shift 2 ;;
    --steps) STEPS=$2; shift 2 ;;
    --gate-abs) GATE_ABS=$2; shift 2 ;;
    *) echo "unknown argument: $1" >&2; exit 2 ;;
  esac
done

[[ -n "$CONFIG" ]] || { echo "--config is required" >&2; exit 2; }
[[ -f "$CONFIG" ]] || { echo "config not found: $CONFIG" >&2; exit 2; }

if [[ -n "$KALDI_ROOT" ]]; then
  for d in "$KALDI_ROOT"/src/*bin "$KALDI_ROOT/tools/openfst/bin"; do
    [[ -d "$d" ]] && PATH="$d:$PATH"
  done
  export PATH
fi

# the Kaldi binaries the pipeline shells out to (SURVEY §2.3); stubs on
# PATH (CI) satisfy this check too
for bin in copy-feats latgen-faster-mapped ali-to-pdf; do
  command -v "$bin" >/dev/null || {
    echo "missing Kaldi binary on PATH: $bin (set --kaldi-root)" >&2
    exit 2
  }
done

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

echo "=== running pipeline: $STEPS ==="
python -m tfkaldi_tpu.cli.main --config "$CONFIG" --steps "$STEPS"

# locate the decode dir from the config and extract the best WER
WER=$(python - "$CONFIG" <<'EOF'
import sys
from configparser import ConfigParser
import os
from tfkaldi_tpu.kaldi.decode_wfst import best_wer

config = ConfigParser()
config.read(sys.argv[1])
decodedir = os.path.join(
    config.get("directories", "expdir"), config.get("nnet", "name"),
    "decode", "kaldi_decode",
)
line = best_wer(decodedir)
# Kaldi wer line: "%WER 8.31 [ nnn / nnnn ... ]"
for tok in line.replace("%WER", " ").split():
    try:
        print(float(tok))
        break
    except ValueError:
        continue
EOF
)
[[ -n "$WER" ]] || { echo "could not extract WER from decode dir" >&2; exit 1; }
echo "=== best WER: $WER ==="

if [[ -n "$REFERENCE_WER" ]]; then
  python - "$WER" "$REFERENCE_WER" "$GATE_ABS" <<'EOF'
import sys
wer, ref, gate = map(float, sys.argv[1:4])
diff = abs(wer - ref)
ok = diff <= gate
print(f"WER {wer:.2f} vs reference {ref:.2f}: |diff| = {diff:.2f} "
      f"({'PASS' if ok else 'FAIL'}, gate {gate} abs — BASELINE.md)")
sys.exit(0 if ok else 1)
EOF
fi
