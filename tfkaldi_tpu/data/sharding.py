"""Multi-host input sharding over the scp index.

The scp file is a trivially shardable index of (utt, ark-offset) records
(SURVEY §2.2): each host reads only its strided slice, so a multi-host pod
feeds itself with no coordination beyond process_index — the TPU-native
equivalent of the reference's single-process FeatureReader (the reference
has no distributed input story at all).

Striding (not contiguous blocks) keeps speaker/recording order roughly
interleaved across hosts, so per-host batches stay representative even
when the scp is sorted by speaker.
"""

from __future__ import annotations

import os


def shard_scp_lines(
    lines: list[str], num_shards: int, shard_index: int, drop_remainder: bool = False
) -> list[str]:
    """Strided shard of scp lines: line ``i`` goes to host ``i % num_shards``.

    Shards are disjoint and cover the input; sizes differ by at most 1.
    ``drop_remainder`` truncates the input to a multiple of ``num_shards``
    first so every shard has the SAME size — required when hosts must agree
    on ``num_batches``/``num_steps`` without communicating (at most
    ``num_shards - 1`` utterances are dropped globally).
    """
    if not 0 <= shard_index < num_shards:
        raise ValueError(f"shard_index {shard_index} not in [0, {num_shards})")
    if drop_remainder:
        lines = lines[: len(lines) - len(lines) % num_shards]
    return lines[shard_index::num_shards]


def shard_scp(
    scp_path: str,
    num_shards: int | None = None,
    shard_index: int | None = None,
    out_path: str | None = None,
    drop_remainder: bool = False,
) -> str:
    """Write this host's shard of ``scp_path`` and return the shard's path.

    Defaults shard over ``jax.process_count()``/``jax.process_index()``.
    With one shard the original path is returned unchanged.
    """
    if num_shards is None or shard_index is None:
        import jax

        num_shards = jax.process_count() if num_shards is None else num_shards
        shard_index = jax.process_index() if shard_index is None else shard_index
    if num_shards == 1:
        return scp_path
    with open(scp_path) as f:
        lines = f.readlines()
    shard = shard_scp_lines(lines, num_shards, shard_index, drop_remainder)
    if out_path is None:
        base, ext = os.path.splitext(scp_path)
        out_path = f"{base}.shard{shard_index}of{num_shards}{ext}"
    with open(out_path, "w") as f:
        f.writelines(shard)
    return out_path
