"""Checkpoint/resume contract + salted-reassembly equivalence.

North-rule requirements under test:
- a killed run resumes at partition granularity without recomputing
  completed partitions (lineage manifest is the resume source of truth);
- salting pathological docs into balanced partitions preserves the exact
  reassembly semantics (property: salted == unsalted for ANY chunking).
"""
import json
import os
import shutil

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from web_content_extraction_benchmark_ray.schema import SPAN_STRUCT
from web_content_extraction_benchmark_ray.sources.synth import build_spans_table


def _spans_ds(ray, rows):
    """rows: list of (doc_id, kind, text, media_ref, offset) scattered."""
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.string()),
                "spans": pa.array(
                    [
                        [
                            {
                                "kind": r[1],
                                "text": r[2],
                                "media_ref": r[3],
                                "offset": r[4],
                            }
                        ]
                        for r in rows
                    ],
                    pa.list_(SPAN_STRUCT),
                ),
            }
        )
    )


docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # doc index
        st.text(alphabet="abcxyz<> /", max_size=12),
    ),
    min_size=1,
    max_size=40,
)


@given(docs_strategy, st.integers(1, 4))
@settings(max_examples=20, deadline=None)
def test_salted_equals_unsalted(ray_session, chunks, salt_range):
    from web_content_extraction_benchmark_ray.stages.reassemble import (
        reassemble,
        reassemble_salted,
    )

    rows = []
    per_doc: dict = {}
    for doc_idx, text in chunks:
        off = per_doc.get(doc_idx, 0)
        doc = f"d{doc_idx}"
        rows.append((doc, "html", text, "", off))
        if off % 3 == 2:
            rows.append((doc, "media", "", f"m://{doc}/{off}", off + 1))
            off += 1
        per_doc[doc_idx] = off + 1
    # scatter rows deterministically
    rows.sort(key=lambda r: (hash((r[0], r[4])) % 97, r[0], r[4]))

    plain = (
        reassemble(_spans_ds(ray_session, rows), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    salted = (
        reassemble_salted(
            _spans_ds(ray_session, rows), num_buckets=4, salt_range=salt_range
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert plain["doc_id"].tolist() == salted["doc_id"].tolist()
    assert plain["html"].tolist() == salted["html"].tolist()
    assert [list(m) for m in plain["media_refs"]] == [
        list(m) for m in salted["media_refs"]
    ]


def test_checkpoint_resume(ray_session, tmp_path):
    from web_content_extraction_benchmark_ray.state.checkpoint import (
        completed_partitions,
        read_lineage,
        read_output,
        run_checkpointed,
    )

    spans = build_spans_table("/root/testdata/sf0.001")
    out_dir = str(tmp_path / "ckpt")
    models = ("bte",)

    # crash after 2 partitions
    with pytest.raises(RuntimeError, match="injected crash"):
        run_checkpointed(
            spans, out_dir, models=models, num_partitions=4, fail_after=2
        )
    assert len(completed_partitions(out_dir)) == 2
    first_lineage = {r["partition_id"]: r for r in read_lineage(out_dir)}
    mtimes = {
        pid: os.path.getmtime(os.path.join(out_dir, f"part-{pid:05d}"))
        for pid in completed_partitions(out_dir)
    }

    # resume: only the remaining partitions run
    new = run_checkpointed(spans, out_dir, models=models, num_partitions=4)
    assert sorted(r["partition_id"] for r in new) == sorted(
        set(range(4)) - set(first_lineage)
    )
    assert completed_partitions(out_dir) == {0, 1, 2, 3}
    for pid, old_mtime in mtimes.items():  # no recompute of completed parts
        assert os.path.getmtime(
            os.path.join(out_dir, f"part-{pid:05d}")
        ) == old_mtime

    # lineage metrics present and consistent
    for rec in read_lineage(out_dir):
        assert rec["row_count"] == rec["doc_count"] * len(models)
        assert rec["error_count"] == 0
        assert rec["wall_ms"] > 0
        assert rec["input_files"]

    # resumed output == single-shot reference run
    resumed = (
        read_output(out_dir)
        .to_pandas()[["doc_id", "model", "plaintext"]]
        .sort_values(["doc_id", "model"])
        .reset_index(drop=True)
    )
    ref_dir = str(tmp_path / "ref")
    run_checkpointed(spans, ref_dir, models=models, num_partitions=4)
    ref = (
        read_output(ref_dir)
        .to_pandas()[["doc_id", "model", "plaintext"]]
        .sort_values(["doc_id", "model"])
        .reset_index(drop=True)
    )
    assert resumed.equals(ref)
    # every doc appears exactly once across partitions (partition disjointness)
    assert resumed["doc_id"].is_unique
    assert len(resumed) == 500


def test_heavy_lane_and_salted_equal_plain(ray_session):
    """Two-lane routing + salted reassembly must be output-equal to the
    plain pipeline on a heavy-tailed input."""
    from web_content_extraction_benchmark_ray.pipelines.extraction import (
        extraction_pipeline,
    )

    spans = build_spans_table("/root/testdata/sf0.001", heavy_tail=True)

    def norm(ds):
        return (
            ds.to_pandas()[["doc_id", "model", "plaintext"]]
            .sort_values(["doc_id", "model"])
            .reset_index(drop=True)
        )

    plain = norm(extraction_pipeline(spans, models=("bte",), num_buckets=16))
    routed = norm(
        extraction_pipeline(
            spans, models=("bte",), num_buckets=16,
            heavy_lane_bytes=50_000, salted=True,
        )
    )
    assert plain.equals(routed)
    assert len(plain) == 500
