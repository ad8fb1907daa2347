"""Media-span path (PDF/layout parse).

The north rule adds a PDF/layout-parse stage for ``kind='media'`` spans —
a capability the reference lacks (SURVEY.md §1.4).  The REAL binary
decoders live in ``functions/binmedia.py`` (BMP/WAV) and
``functions/pdf.py`` (a genuine pure-Python PDF text extractor: stream
walk, zlib FlateDecode, Tj/TJ/Td operators, string escapes — exercised
on actual payload bytes by the ``pdf_extract`` query).

This module keeps the lighter REF-string path used by the media-SPAN
queries: those rows carry a ``media_ref`` (no payload bytes travel with
the span), so their parse is a deterministic function of the ref —
``parse_media(media_ref)`` remains the seam where a payload fetch +
``functions.pdf.decode_pdf_text`` (or an OCR model held in actor state)
slots in when refs resolve to real storage.
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
