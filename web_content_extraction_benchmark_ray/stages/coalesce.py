"""Block coalescing for small-cardinality groupbys.

Ray's sort-based groupby creates one output partition per INPUT BLOCK.
When a combiner stage emits many tiny blocks over a small key space
(e.g. per-block word counts over a bounded vocabulary), most sort
partitions receive zero rows and are materialized as schema-less empty
blocks — flipping the downstream operator's observed schema
("RefBundle with a different schema" warnings) and defeating
schema-stable fusion.

``coalesce_small`` merges those tiny blocks with
``repartition(num_blocks=k, shuffle=False)``.  Note a STREAMING
repartition (``target_num_rows_per_block``) does NOT work here: it only
splits oversized blocks, it never merges small ones (measured: 64 blocks
of 31 rows stayed 64 blocks).  The num_blocks form is a barrier, but the
input is by construction a combiner output (rows ~ key cardinality ×
blocks), so the barrier cost is negligible while the groupby behind it
drops from one sort partition per upstream block to ``k``.

Use it between a per-batch combiner and a ``groupby`` whose key
cardinality is far below the upstream block count; size ``k`` at or
below the expected number of distinct keys.
"""
from __future__ import annotations

DEFAULT_NUM_BLOCKS = 4


def coalesce_small(ds, num_blocks: int = DEFAULT_NUM_BLOCKS):
    return ds.repartition(num_blocks=num_blocks, shuffle=False)
