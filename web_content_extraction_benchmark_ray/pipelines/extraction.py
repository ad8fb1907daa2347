"""The flagship pipeline: spans table -> reassembly shuffle -> extraction.

Ray shape (SURVEY.md §3.2): ``read_parquet(documents) -> explode ->
bucketed groupby reassembly -> map_batches(ExtractStage actor pool)``.
Per-block granularity replaces the reference's coarse (model × dataset)
process-pool jobs (extract.py:127-161), so retries/skew shrink from "one
dataset×model" to "one block".

Skew handling: bucket count bounds shuffle groups; the extraction stage
runs with a modest ``batch_size`` so one pathological document never
pins a batch of thousands of small ones (heavy docs are additionally
routed to a batch_size=1 lane when ``heavy_lane_bytes`` is set).
"""
from __future__ import annotations

import ray.data

from ..stages.extract import DEFAULT_MODELS, extract_batch
from ..stages.reassemble import (
    DEFAULT_NUM_BUCKETS,
    reassemble,
    reassemble_salted,
)


def _cpu_budget() -> int:
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 4))
    return 4


def extraction_pipeline(
    spans_path: str,
    models=DEFAULT_MODELS,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    concurrency=None,
    batch_size: int = 64,
    heavy_lane_bytes: int | None = None,
    salted: bool = False,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Lazy Dataset of extractions for ``models`` over the spans table."""
    from ..functions.extractors import list_extractors

    unknown = [m for m in models if isinstance(m, str) and m not in list_extractors()]
    if unknown:
        raise ValueError(
            f"unknown extractor(s) {unknown}; available: {list_extractors()}"
        )
    # block geometry: ~2 blocks per CPU keeps the sort exchange's fragment
    # count (mappers x reducers) low at small scale; always capped at the
    # table's row-group count so the read never synthesizes schema-less
    # zero-row blocks (sources/storage.py:capped_num_blocks)
    from ..sources.storage import capped_num_blocks

    requested = override_num_blocks or 2 * _cpu_budget()
    ds = ray.data.read_parquet(
        spans_path,
        override_num_blocks=capped_num_blocks(spans_path, requested),
    )
    # salted: two-phase skew-resistant reassembly (same output) for inputs
    # with pathological span-count tails — see stages/reassemble.py
    if salted:
        assembled = reassemble_salted(ds, num_buckets=num_buckets)
    else:
        # size-aware partitioning: the caller knows the table's on-disk
        # bytes, so partitions never exceed ~64 MiB regardless of cluster
        # shape (num_buckets only parameterizes the SALTED layout now)
        import glob as _glob
        import os as _os

        files = (
            _glob.glob(_os.path.join(spans_path, "*.parquet"))
            if _os.path.isdir(spans_path)
            else [spans_path]
        )
        nbytes = sum(_os.path.getsize(f) for f in files)
        from ..stages.reassemble import _default_partitions

        assembled = reassemble(
            ds, partitions=_default_partitions(nbytes)
        )
    if concurrency is None:
        concurrency = (1, max(2, _cpu_budget()))
    if heavy_lane_bytes:
        # Two-lane routing: oversized docs go through a batch_size=1 lane so
        # a 5 MB pathological page never serializes a batch of 4 kB pages.
        # The assembled set is materialized once (it is the *small* post-
        # shuffle representation; at production scale prefer splitting by a
        # partition predicate on the checkpoint layout instead).
        assembled = assembled.materialize()
        light = assembled.filter(expr=f"n_bytes < {heavy_lane_bytes}")
        heavy = assembled.filter(expr=f"n_bytes >= {heavy_lane_bytes}")
        out_light = light.map_batches(
            extract_batch,
            fn_kwargs={"models": models},
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        out_heavy = heavy.map_batches(
            extract_batch,
            fn_kwargs={"models": models},
            batch_format="pyarrow",
            batch_size=1,
        )
        return out_light.union(out_heavy)
    return assembled.map_batches(
        extract_batch,
        fn_kwargs={"models": models},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
