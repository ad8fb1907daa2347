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


_ROUTE_CACHE: dict = {}


def _route_fingerprint(spans_path: str):
    """Driver-side cache key: path + file listing stats, so repeated
    pipeline calls over one table (bench, eval, the per-model queries)
    probe/census once, and any rewrite invalidates."""
    import glob as _glob
    import os as _os

    files = (
        sorted(_glob.glob(_os.path.join(spans_path, "*.parquet")))
        if _os.path.isdir(spans_path)
        else [spans_path]
    )
    from . import file_key

    return (
        _os.path.abspath(spans_path),
        tuple(file_key(f) for f in files),
    )


def _resolve_heavy_ids(spans_path, heavy_lane_bytes, salted):
    """Skew-routing decision (stages/skew.py).  Returns
    ``(heavy_ids | None, salted_bool)``; ``heavy_ids=None`` means single
    lane.  ``heavy_lane_bytes="auto"`` runs the metadata probe and, only
    when suspicious, the per-doc size census; an explicit int threshold
    runs the census directly (the round-2 post-assembly ``materialize``
    lane split is gone — lanes now filter at the source)."""
    if heavy_lane_bytes is None:
        return None, bool(salted)
    key = (_route_fingerprint(spans_path), heavy_lane_bytes, str(salted))
    if key in _ROUTE_CACHE:
        return _ROUTE_CACHE[key]
    out = _resolve_heavy_ids_uncached(spans_path, heavy_lane_bytes, salted)
    _ROUTE_CACHE[key] = out
    return out


def _resolve_heavy_ids_uncached(spans_path, heavy_lane_bytes, salted):
    from ..stages import skew

    if heavy_lane_bytes == "auto":
        probe = skew.probe_row_groups(spans_path)
        if not probe or not probe["suspect"]:
            return None, salted is True
        byte_t = max(
            skew.HEAVY_ABS_MIN_BYTES,
            int(skew.HEAVY_BYTES_FACTOR * probe["doc_bytes_med"]),
        )
        span_t = max(
            skew.HEAVY_ABS_MIN_SPANS,
            int(skew.HEAVY_SPANS_FACTOR * probe["spans_med"]),
        )
    else:
        byte_t, span_t = int(heavy_lane_bytes), None
    ids = skew.heavy_doc_ids(spans_path, byte_t, span_t)
    if ids is None:
        # not a tail: everything qualifies -> uniformly salted pipeline
        return None, salted in (True, "auto")
    if not ids:
        return None, salted is True
    return ids, salted is True  # "auto": salt only the heavy lane


def _read_spans(spans_path, override_num_blocks):
    # block geometry: ~2 blocks per CPU keeps the sort exchange's fragment
    # count (mappers x reducers) low at small scale; always capped at the
    # table's row-group count so the read never synthesizes schema-less
    # zero-row blocks (sources/storage.py:capped_num_blocks)
    from ..sources.storage import capped_num_blocks

    requested = override_num_blocks or 2 * _cpu_budget()
    return ray.data.read_parquet(
        spans_path,
        override_num_blocks=capped_num_blocks(spans_path, requested),
    )


def _assemble(ds, spans_path, num_buckets, salted):
    # salted: two-phase skew-resistant reassembly (same output) for inputs
    # with pathological span-count tails — see stages/reassemble.py
    if salted:
        return reassemble_salted(ds, num_buckets=num_buckets)
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

    return reassemble(ds, partitions=_default_partitions(nbytes))


def extraction_pipeline(
    spans_path: str,
    models=DEFAULT_MODELS,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    concurrency=None,
    batch_size: int = 64,
    heavy_lane_bytes="auto",
    salted="auto",
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Lazy Dataset of extractions for ``models`` over the spans table.

    Skew routing is AUTOMATIC by default: a metadata-only probe of the
    spans table shortlists pathological byte/span tails, a census names
    the heavy docs, and those route through a salted reassembly +
    batch_size=1 extract lane while everything else takes the plain
    balanced path (stages/skew.py).  ``heavy_lane_bytes`` accepts an
    explicit byte threshold (census runs directly), or None to force a
    single lane; ``salted`` accepts True (whole pipeline salted), False
    (never), or "auto" (heavy lane only)."""
    from ..functions.extractors import list_extractors

    unknown = [m for m in models if isinstance(m, str) and m not in list_extractors()]
    if unknown:
        raise ValueError(
            f"unknown extractor(s) {unknown}; available: {list_extractors()}"
        )
    # `concurrency` is accepted for call-site compatibility: the extract
    # stage became plain-function tasks in round 2 (an actor pool starved
    # the adjacent sort — stages/extract.py), so no pool size applies.
    del concurrency
    heavy_lane_salted = salted is not False  # explicit False wins everywhere
    heavy_ids, salted = _resolve_heavy_ids(spans_path, heavy_lane_bytes, salted)
    if heavy_ids:
        # Two-lane routing, split AT THE SOURCE by a broadcast id
        # predicate: oversized docs go through a salted reassembly and a
        # batch_size=1 extract so a 50 MB pathological page never pins a
        # plain-reassembly bucket nor serializes a batch of 4 kB pages.
        # No materialization — each lane is an independent streaming
        # read; the heavy lane prunes to a handful of docs immediately.
        from ..stages.skew import filter_doc_ids

        ids_ref = ray.put(heavy_ids)
        light = _read_spans(spans_path, override_num_blocks).map_batches(
            filter_doc_ids,
            fn_kwargs={"ids_ref": ids_ref, "keep": False},
            batch_format="pyarrow",
        )
        heavy = _read_spans(spans_path, override_num_blocks).map_batches(
            filter_doc_ids,
            fn_kwargs={"ids_ref": ids_ref, "keep": True},
            batch_format="pyarrow",
        )
        out_light = _assemble(
            light, spans_path, num_buckets, salted
        ).map_batches(
            extract_batch,
            fn_kwargs={"models": models},
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        out_heavy = (
            reassemble_salted(heavy, num_buckets=num_buckets)
            if heavy_lane_salted
            else _assemble(heavy, spans_path, num_buckets, False)
        ).map_batches(
            extract_batch,
            fn_kwargs={"models": models},
            batch_format="pyarrow",
            batch_size=1,
        )
        return out_light.union(out_heavy)
    ds = _read_spans(spans_path, override_num_blocks)
    return _assemble(ds, spans_path, num_buckets, salted).map_batches(
        extract_batch,
        fn_kwargs={"models": models},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
