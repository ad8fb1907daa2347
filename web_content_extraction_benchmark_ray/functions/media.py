"""Media-span path (PDF/layout parse).

The north rule adds a PDF/layout-parse stage for ``kind='media'`` spans —
a capability the reference lacks (SURVEY.md §1.4).  The real decoders
(pdf/image libraries) are not available in this container, so the decode
step is stubbed behind a deterministic fake, while the Ray-side plumbing
(schema, actor signature, span emission, ordering) is real and tested.

``parse_media(media_ref)`` is the seam: swap ``_fake_layout_parse`` for a
real parser (pdfminer / pypdf / OCR model held in actor state) without
touching the pipeline.
"""
from __future__ import annotations


def _real_layout_parse(media_ref: str) -> str:  # pragma: no cover
    try:
        import pdfminer  # noqa: F401 — not installed in this sandbox
    except ImportError as exc:
        raise NotImplementedError(
            "real PDF/layout parsing requires a PDF library; "
            "this sandbox uses the deterministic fake parser"
        ) from exc
    raise NotImplementedError


def _fake_layout_parse(media_ref: str) -> str:
    """Deterministic stand-in: derived purely from the ref string so tests
    and the DuckDB oracle can reproduce it."""
    return f"[media {media_ref} layout]"


def parse_media(media_ref: str, use_real: bool = False) -> str:
    if use_real:
        return _real_layout_parse(media_ref)
    return _fake_layout_parse(media_ref)
