"""Byte-level page ingestion: gzip auto-decompress + encoding detection.

Capability of the reference's file reader (``/root/reference/src/
extraction_benchmark/dataset_readers.py:114-132``): pages arrive as raw
bytes that may be gzip-compressed and in an unknown encoding; the reader
sniffs a bounded window and falls back utf-8 -> cp1252.  From-scratch
detection (no chardet in this sandbox): BOM signatures, strict utf-8 /
utf-16 trial decode of the sniff window, cp1252 fallback (cp1252 never
fails — it maps every byte — which is exactly why it is the terminal
fallback, as in the reference).
"""
from __future__ import annotations

import gzip

SNIFF_BYTES = 100_000  # 100 kB sniff window (dataset_readers.py:124)

# the utf-16 codec consumes the BOM itself (and picks endianness from it)
_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16"),
    (b"\xfe\xff", "utf-16"),
)


def maybe_gunzip(data: bytes) -> bytes:
    """Transparent gzip: magic-number sniff (dataset_readers.py:126-127)."""
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def detect_encoding(data: bytes) -> str:
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc
    window = data[:SNIFF_BYTES]
    if len(data) > SNIFF_BYTES:
        # the window may cut a multi-byte utf-8 sequence: trim up to 3
        # trailing continuation bytes plus the lead byte so a valid long
        # document is not misdetected as cp1252
        end = len(window)
        # a UTF-8 sequence has AT MOST 3 continuation bytes; trimming a
        # 4th would let a cp1252 window ending in four 0x80-0xBF bytes
        # decode cleanly and be misdetected as utf-8
        while end > 0 and end > len(window) - 3 and window[end - 1] & 0xC0 == 0x80:
            end -= 1
        if end > 0 and window[end - 1] & 0xC0 == 0xC0:
            end -= 1
        window = window[:end]
    try:
        window.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "cp1252"


def decode_page_bytes(data: bytes) -> str:
    """bytes (possibly gzipped, unknown encoding) -> str."""
    data = maybe_gunzip(data)
    enc = detect_encoding(data)
    return data.decode(enc, errors="replace")
