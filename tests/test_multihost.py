"""Multi-host input sharding: scp index sharding + process-local batch
assembly (single-process semantics checked here; the multi-process path is
the same API with process_count > 1)."""

import numpy as np
import pytest

import jax

from tfkaldi_tpu.data.batching import PaddedBatch
from tfkaldi_tpu.data.sharding import shard_scp, shard_scp_lines
from tfkaldi_tpu.parallel import global_batch_from_local, make_mesh


def test_shards_disjoint_and_cover():
    lines = [f"utt{i} ark:{i}\n" for i in range(23)]
    shards = [shard_scp_lines(lines, 4, i) for i in range(4)]
    got = sorted(line for s in shards for line in s)
    assert got == sorted(lines)
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    for i in range(4):
        for j in range(i + 1, 4):
            assert not set(shards[i]) & set(shards[j])


def test_shard_scp_file(tmp_path):
    scp = tmp_path / "feats.scp"
    scp.write_text("".join(f"utt{i} a.ark:{i}\n" for i in range(10)))
    out = shard_scp(str(scp), num_shards=3, shard_index=1)
    assert out.endswith(".shard1of3.scp")
    assert open(out).read() == "utt1 a.ark:1\nutt4 a.ark:4\nutt7 a.ark:7\n"
    # one shard: untouched
    assert shard_scp(str(scp), num_shards=1, shard_index=0) == str(scp)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device mesh")
def test_global_batch_from_local_single_process():
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(0)
    local = PaddedBatch(
        rng.standard_normal((8, 16, 4)).astype(np.float32),
        rng.integers(0, 5, (8, 16)).astype(np.int32),
        np.full(8, 16, np.int32),
        np.full(8, 16, np.int32),
    )
    g = global_batch_from_local(local, mesh)
    # single process: global == local content, sharded over 'data'
    assert g.inputs.shape == (8, 16, 4)
    assert len(g.inputs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g.inputs), local.inputs)
    np.testing.assert_array_equal(np.asarray(g.targets), local.targets)
