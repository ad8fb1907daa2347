"""Warm-subprocess extraction stage — the E6/E16 capability class.

The reference shells out per document to a Go binary (domdistiller,
``/root/reference/src/extraction_benchmark/extractors/go_domdistiller/
__init__.py:6-14``) and to a Scala/TF1 pair (web2text, ``extractors/
web2text/__init__.py:39-84``), forking a fresh process per call.  The
Ray-native pattern is an ACTOR that holds ONE long-lived child process
and streams documents over a line protocol — fork cost paid once per
actor, not once per document.  This is the one stage family where an
actor pool (not a task pool) is genuinely required: the warm child is
unserializable state.

The bundled child program implements the whole-text baseline via this
package (any external tool with a stdin/stdout contract slots in), so the
stage's output has the same hash-verified oracle as ``whole_text``.
"""
from __future__ import annotations

import base64
import subprocess
import sys

import pyarrow as pa

# Child program: reads base64(html) lines, writes base64(text) lines.
_CHILD_SRC = r"""
import base64, sys
sys.path.insert(0, {repo_root!r})
from web_content_extraction_benchmark_ray.functions.extractors import get_extractor
fn = get_extractor({model!r})
for line in sys.stdin:
    html = base64.b64decode(line.strip()).decode("utf-8")
    try:
        out = fn(html) or ""
    except Exception:
        out = ""
    sys.stdout.write(base64.b64encode(out.encode("utf-8")).decode() + "\n")
    sys.stdout.flush()
"""


class SubprocExtractStage:
    """Actor: one persistent child process, line-protocol per document."""

    def __init__(self, model: str = "whole_text", out_model: str | None = None):
        import os

        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        self.model = model
        self.out_model = out_model or f"subproc_{model}"
        self.child = subprocess.Popen(
            [sys.executable, "-c",
             _CHILD_SRC.format(repo_root=repo_root, model=model)],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
        )

    def _extract_one(self, html: str) -> str:
        payload = base64.b64encode(html.encode("utf-8")).decode()
        self.child.stdin.write(payload + "\n")
        self.child.stdin.flush()
        line = self.child.stdout.readline()
        return base64.b64decode(line.strip()).decode("utf-8")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        htmls = batch.column("html").to_pylist()
        out_text, out_err = [], []
        for html in htmls:
            try:
                out_text.append(self._extract_one(html))
                out_err.append("")
            except Exception as exc:  # child died: restart, empty answer
                out_text.append("")
                out_err.append(f"{type(exc).__name__}: {exc}"[:200])
                self.__init__(self.model, self.out_model)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "model": pa.array([self.out_model] * len(doc_ids), pa.string()),
                "plaintext": pa.array(out_text, pa.large_string()),
                "error": pa.array(out_err, pa.string()),
            }
        )

    def __del__(self):  # pragma: no cover
        try:
            self.child.kill()
        except Exception:
            pass


def subproc_extract(assembled_ds, model: str = "whole_text",
                    concurrency=(1, 4), batch_size: int = 32):
    """Actor-pool map over assembled documents.  Small fixed pool: each
    actor's cost is its child process, and the pool must stay well under
    the CPU count so co-scheduled all-to-alls keep their slots."""
    return assembled_ds.map_batches(
        SubprocExtractStage,
        fn_constructor_kwargs={"model": model},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
