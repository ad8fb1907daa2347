#!/usr/bin/env python
"""Ray-free worker-contention probe for the scaling measurement.

Runs the EXACT per-document extraction work (render page -> 5
from-scratch extractors) in a plain multiprocessing pool at several
widths and reports per-worker ms/doc.  Because no Ray machinery is
involved, any per-worker inflation measured here is the HOST's
(memory/cache bandwidth shared across resident workers on this VM), not
the engine's — it bounds the scaling efficiency any scheduler could
reach at that width pair on this box.

Measured on this sandbox (32-vCPU VM, flat topology): inflation vs
2-wide ≈ x1.14 @8, x1.20 @16, x1.26 @32 — i.e. a hardware ceiling of
~0.85 on a (4,16) efficiency ratio before any Ray overhead.  A trivial
cache-resident Python loop shows NO such inflation (x0.87 @16), so the
effect is specific to the parse workload's allocation/memory footprint.

Usage: python scripts/contention_probe.py [widths...]   (default 2 4 8 16 32)
"""
from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
MODELS = ("bte", "justext", "density", "readability", "tagclean")
N_DOCS = 200


def work(pages):
    from web_content_extraction_benchmark_ray.functions.extractors import (
        get_extractor,
    )

    ex = [get_extractor(n) for n in MODELS]
    t0 = time.perf_counter()
    for t in pages:
        for f in ex:
            f(t)
    return time.perf_counter() - t0


def main() -> None:
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.sources import pagegen

    widths = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16, 32]
    docs = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()[:N_DOCS]
    pages = [pagegen.render_page(d["doc_id"], d["text"]) for d in docs]
    base = None
    for width in widths:
        with mp.get_context("spawn").Pool(width) as p:
            times = p.map(work, [pages] * width)
        per = sum(times) / width / len(pages) * 1e3
        if base is None:
            base = per
        print(
            f"width={width:2d}: {per:.2f} ms/doc  "
            f"inflation x{per / base:.2f} vs width={widths[0]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
