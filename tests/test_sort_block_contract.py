"""Pins the Ray behavior the balanced reassembly/dedup sorts rely on:
``Dataset.sort`` materializes EXACTLY ONE block per output partition —
even when a partition far exceeds ``target_max_block_size``.

stages/reassemble.py and stages/dedup.py consume sort partitions with
``map_batches(batch_size=None)`` (one call per BLOCK): if a Ray upgrade
ever started splitting a reduce partition into multiple blocks, a
document (or candidate bucket) whose rows straddle the split would be
processed torn — silently.  This test turns that silent failure mode
into a red suite: if it fails after a Ray upgrade, switch those stages
back to ``groupby(...).map_groups`` (group integrity guaranteed) or add
a partition-merge step.
"""
import numpy as np
import pyarrow as pa


def test_sort_emits_one_block_per_partition_even_oversized(ray_session):
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 1 << 20  # 1 MiB
    try:
        n = 4000
        t = pa.table(
            {
                "bucket": pa.array(
                    np.random.default_rng(0).integers(0, 1 << 20, n),
                    pa.int32(),
                ),
                "text": pa.array(["x" * 10_000] * n),  # ~40 MB total
            }
        )
        ds = ray.data.from_arrow(t).repartition(num_blocks=8)
        for n_parts, bounds in (
            (2, [(1 << 20) // 2]),
            (4, [(1 << 20) // 4, (1 << 20) // 2, 3 * (1 << 20) // 4]),
        ):
            out = ds.sort("bucket", boundaries=bounds).materialize()
            assert out.num_blocks() == n_parts, (
                f"sort produced {out.num_blocks()} blocks for {n_parts} "
                "partitions — the one-block-per-partition contract that "
                "stages/reassemble.py relies on is broken; see this test's "
                "module docstring"
            )
    finally:
        ctx.target_max_block_size = old_target
