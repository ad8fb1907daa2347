"""JSONL interchange (S12/S14): read and write the reference's own
answer/ground-truth JSONL files so engine outputs can be cross-checked
against a real reference run.

Reference semantics reproduced:

- ``read_jsonl`` / ``jsonl_to_dict`` (``/root/reference/src/
  extraction_benchmark/util.py:19-41``): one JSON object per line;
  ``jsonl_to_dict`` keys records by ``page_id`` and drops the key field
  from the value.
- ``write_jsonl_sorted`` (``extract.py:33-38``): one ``{'page_id': k,
  **v}`` per line, **sorted by page_id**, parent dirs created.
  Transparent ``.gz`` on both sides.

``jsonl_to_dataset`` lifts a JSONL file into a ray.data Dataset for
joining against engine outputs (e.g. reference answers ⋈ our answers on
page_id).
"""
from __future__ import annotations

import gzip
import json
import os
from collections.abc import Iterable, Iterator


def _open(path: str, mode: str):
    if path.endswith(".gz"):
        return gzip.open(path, mode + "t", encoding="utf-8")
    return open(path, mode, encoding="utf-8")


def read_jsonl(path: str) -> Iterator[dict]:
    with _open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def jsonl_to_dict(path: str, key: str = "page_id") -> dict[str, dict]:
    out: dict[str, dict] = {}
    for rec in read_jsonl(path):
        k = rec.pop(key)
        out[k] = rec
    return out


def write_jsonl_sorted(records: dict[str, dict] | Iterable[dict],
                       path: str, key: str = "page_id") -> int:
    """Write records as JSONL sorted by ``key`` (the reference's sink
    determinism); returns the row count."""
    if isinstance(records, dict):
        rows = [{key: k, **v} for k, v in records.items()]
    else:
        rows = list(records)
    rows.sort(key=lambda r: str(r[key]))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with _open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return len(rows)


def jsonl_to_dataset(path: str):
    """JSONL file -> ray.data Dataset (driver-side read: these files are
    per-(model, dataset) answer sets, small by construction)."""
    import ray.data

    return ray.data.from_items(list(read_jsonl(path)))
