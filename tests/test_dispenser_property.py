"""Property test: dispenser cursor semantics against a ring-buffer oracle.

The cursor ops (get/skip/return/split) burned two review findings already
(short-utterance misalignment, stale usable-set); this pins them against a
trivially-correct model: the usable utterances in scp order form a ring,
get_batch/skip_batch advance the cursor by `size` usable entries,
return_batch rewinds it, split drops everything before the cursor.
"""

import numpy as np
import pytest

from tests.synthetic import make_featdir
from tfkaldi_tpu.data import AlignmentBatchDispenser, AlignmentCoder, FeatureReader
from tfkaldi_tpu.data.target_normalizers import identity_normalizer


class Oracle:
    def __init__(self, usable: list[str], size: int):
        self.ring = list(usable)
        self.pos = 0
        self.size = size

    def get_batch(self) -> list[str]:
        out = []
        for _ in range(self.size):
            out.append(self.ring[self.pos % len(self.ring)])
            self.pos += 1
        return out

    def skip_batch(self) -> None:
        self.pos += self.size

    def return_batch(self) -> None:
        self.pos -= self.size

    def split(self) -> None:
        k = self.pos % len(self.ring)
        self.ring = self.ring[k:] + []  # drop consumed prefix
        self.pos = 0


@pytest.mark.parametrize("seed", range(4))
def test_cursor_ops_match_oracle(tmp_path, seed):
    featdir, alifile, info = make_featdir(
        tmp_path, num_speakers=2, utts_per_speaker=9, seed=seed
    )
    size = 3
    reader = FeatureReader(
        f"{featdir}/feats.scp", f"{featdir}/cmvn.scp", f"{featdir}/utt2spk", 1, 60
    )
    coder = AlignmentCoder(identity_normalizer, info["num_labels"])
    disp = AlignmentBatchDispenser(reader, coder, size, alifile)

    # oracle over the dispenser's own usable set, in scp order
    scp_order = [u for u in reader.reader.utt_ids if u in disp._usable]
    oracle = Oracle(scp_order, size)

    rng = np.random.default_rng(100 + seed)
    split_done = False
    for step in range(40):
        # keep the oracle's cursor non-negative for return ops
        ops = ["get", "skip"]
        if oracle.pos >= size:
            ops.append("ret")
        if not split_done and oracle.pos and rng.random() < 0.15:
            ops = ["split"]
        op = str(rng.choice(ops))
        if op == "get":
            inputs, targets = disp.get_batch()
            # identify the batch's utterances by matching target contents
            got_ids = []
            want = oracle.get_batch()
            for t, utt in zip(targets, want):
                np.testing.assert_array_equal(
                    t, info["alignments"][utt], err_msg=f"step {step} op get"
                )
        elif op == "skip":
            disp.skip_batch()
            oracle.skip_batch()
        elif op == "ret":
            disp.return_batch()
            oracle.return_batch()
        else:
            disp.split()
            oracle.split()
            split_done = True  # ring contents now fixed; keep simple
