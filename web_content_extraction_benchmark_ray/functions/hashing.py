"""Deterministic hashing primitives for dedup / fingerprinting.

Every function here has an exact ANSI-SQL twin used by the DuckDB oracles
(pipelines/dataops_oracles.py), so the hash parity is load-bearing:

- ``hash60(s)``  == DuckDB ``('0x' || substr(md5(s), 1, 15))::BIGINT``
- ``hash64(s)``  == DuckDB ``('0x' || substr(md5(s), 1, 16))::UBIGINT``
  (we only ever use bits 0..59 so int64 stays safe on both sides)

Capability parity with the reference: the reference dedups pages by exact
content hash (``/root/reference/src/extraction_benchmark/extract.py:52-53``
— dict-keyed accumulation by SHA-256).  The near-dup family (MinHash+LSH,
SimHash, n-gram Jaccard, winnowing fingerprints) extends that to the
operations a 100 TB training-data pipeline needs; all are from-scratch
implementations of the published algorithms (Broder 1997; Charikar 2002;
Schleimer et al. 2003 winnowing).
"""
from __future__ import annotations

import hashlib

import numpy as np

from .text import tokenize_ws

# MinHash parameters (shared with the SQL oracle builder)
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
MERSENNE_P = (1 << 31) - 1  # 2^31-1; (P-1)^2 + P fits comfortably in int64
SHINGLE_W = 3  # word n-gram width

# SimHash: 60 bits so the signature is always a non-negative int64 on both
# the Python and the SQL side (BIGINT shifts overflow at bit 63 in DuckDB).
SIMHASH_BITS = 60

# Winnowing: character k-grams, window of w consecutive k-gram hashes.
WINNOW_K = 8
WINNOW_W = 4


def hash60(s: str) -> int:
    """First 60 bits of md5 as a non-negative int64 (SQL-twin above)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def minhash_coeffs(k: int = MINHASH_K) -> tuple[list[int], list[int]]:
    """Deterministic affine-permutation coefficients a_i, b_i in [1, P).

    Derived from md5 so the SQL oracle can embed the identical constants
    (the oracle builder calls this same function)."""
    a = [1 + hash60(f"minhash-a:{i}") % (MERSENNE_P - 1) for i in range(k)]
    b = [hash60(f"minhash-b:{i}") % MERSENNE_P for i in range(k)]
    return a, b


_A, _B = minhash_coeffs()
_A_ARR = np.array(_A, dtype=np.int64)[:, None]
_B_ARR = np.array(_B, dtype=np.int64)[:, None]


def shingles(text: str, w: int = SHINGLE_W) -> list[str]:
    """Distinct word w-grams (space-joined); short docs yield one shingle
    equal to the squeezed text."""
    toks = tokenize_ws(text)
    if len(toks) < w:
        return [" ".join(toks)] if toks else []
    seen = dict.fromkeys(
        " ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)
    )
    return list(seen)


def shingle_base_hashes(text: str) -> np.ndarray:
    """hash60 of each distinct shingle, reduced mod P (int64 vector)."""
    sh = shingles(text)
    if not sh:
        return np.empty(0, dtype=np.int64)
    return np.array([hash60(s) % MERSENNE_P for s in sh], dtype=np.int64)


def minhash_signature(text: str) -> np.ndarray:
    """k-vector of min((a_i*h + b_i) mod P) over distinct shingles.

    Empty docs get the all-P sentinel (matches the SQL coalesce)."""
    h = shingle_base_hashes(text)
    if h.size == 0:
        return np.full(MINHASH_K, MERSENNE_P, dtype=np.int64)
    # (k, n) affine transform entirely in int64: a < P, h < P -> a*h < 2^62
    return ((_A_ARR * h[None, :] + _B_ARR) % MERSENNE_P).min(axis=1)


def band_keys(sig: np.ndarray) -> list[str]:
    """One md5-prefix key per band over the band's hyphen-joined values."""
    keys = []
    for j in range(MINHASH_BANDS):
        part = sig[j * MINHASH_ROWS : (j + 1) * MINHASH_ROWS]
        payload = f"{j}:" + "-".join(str(int(v)) for v in part)
        keys.append(hashlib.md5(payload.encode()).hexdigest()[:16])
    return keys


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).sum()) / MINHASH_K


def simhash60(text: str) -> int:
    """60-bit SimHash over whitespace tokens weighted by multiplicity.

    bit_p(doc) = 1 iff sum over distinct words w of
    count(w) * (2*bit_p(hash60(w)) - 1) > 0 (ties -> 0)."""
    toks = tokenize_ws(text)
    if not toks:
        return 0
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for w, c in counts.items():
        h = hash60(w)
        bits = (h >> np.arange(SIMHASH_BITS)) & 1
        acc += c * (2 * bits - 1)
    out = 0
    for p in range(SIMHASH_BITS):
        if acc[p] > 0:
            out |= 1 << p
    return out


def simhash_hex(text: str) -> str:
    """15-hex-char form (SQL twin: printf('%015x', v))."""
    return format(simhash60(text), "015x")


def winnow_fingerprints(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    """Winnowing-style selection: position j's k-gram hash is selected iff
    it equals the min over the window of the w hashes ending at j
    (SQL twin: ``min(h) OVER (... ROWS BETWEEN w-1 PRECEDING AND CURRENT
    ROW)``).  Returns the sorted distinct selected hashes."""
    n = len(text)
    if n < k:
        return [hash60(text)] if text else []
    hs = [hash60(text[i : i + k]) for i in range(n - k + 1)]
    sel = {
        h
        for j, h in enumerate(hs)
        if h == min(hs[max(0, j - w + 1) : j + 1])
    }
    return sorted(sel)


def fingerprint_digest(fps: list[int]) -> str:
    """Stable digest of a doc's fingerprint set (md5 prefix of the
    hyphen-joined sorted hashes; SQL twin uses string_agg ORDER BY)."""
    payload = "-".join(str(v) for v in fps)
    return hashlib.md5(payload.encode()).hexdigest()[:16]
