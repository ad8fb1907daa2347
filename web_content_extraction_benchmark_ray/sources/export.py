"""File fan-out sinks — the reference's per-page HTML file writer
(S13, ``extract.py:58-78``: one ``<page_id>.html`` under
``combined/html/<dataset>/``) and a per-(model) plaintext variant for
extraction answers.

These are INTERCHANGE/DEBUG sinks: at corpus scale the engine's data
plane is partitioned parquet (see ``state/checkpoint.py``) and never
fans out to one-file-per-document; these exist so outputs can be diffed
against a reference checkout's directory trees.  The writes still run
distributed (each task writes its own batch's files and emits manifest
rows), so even the debug path avoids a driver loop.
"""
from __future__ import annotations

import os

import pyarrow as pa


def export_doc_files(ds, out_dir: str, *, text_col: str = "text",
                     subdir_col: str | None = None, suffix: str = ".html"):
    """Write one ``<doc_id><suffix>`` file per row; returns the manifest
    Dataset ``(doc_id, path, n_bytes)``.  ``subdir_col`` (e.g. the
    dataset/lang label) maps to the reference's per-dataset directories.
    Consume the manifest (count/write) to drive the export."""

    def write_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column(text_col).to_pylist()
        subs = (
            batch.column(subdir_col).to_pylist()
            if subdir_col is not None
            else [""] * len(ids)
        )
        out_id, out_path, out_n = [], [], []
        made: set[str] = set()
        for doc_id, text, sub in zip(ids, texts, subs):
            d = os.path.join(out_dir, str(sub)) if sub else out_dir
            if d not in made:
                os.makedirs(d, exist_ok=True)
                made.add(d)
            path = os.path.join(d, f"{doc_id}{suffix}")
            data = (text or "").encode("utf-8")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)  # atomic: rerun-safe, no torn files
            out_id.append(doc_id)
            out_path.append(path)
            out_n.append(len(data))
        return pa.table(
            {
                "doc_id": pa.array(
                    [str(i) for i in out_id], pa.string()
                ),
                "path": pa.array(out_path, pa.string()),
                "n_bytes": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(write_batch, batch_format="pyarrow")
