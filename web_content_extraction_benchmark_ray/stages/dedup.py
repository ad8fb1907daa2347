"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All stages are shuffle-conscious Ray Data compositions:

- exact:    hash-partition by content hash -> per-group first
            (the reference's dict-keyed dedup, extract.py:52-53, made
            distributed: groupby('h') IS the hash partition).
- minhash:  signature map -> band flat-map (each band row CARRIES the full
            signature so bucket-local verification needs no broadcast and
            no second join) -> groupby (band_id, band_key) -> in-bucket
            pairs -> groupby pair for cross-band distinct.
- simhash:  5 prefix bands x 12 bits; hamming <= 4 implies at least one
            identical band (pigeonhole), so the candidate groupby is EXACT
            for the threshold — no all-pairs, no broadcast.
- jaccard:  inverted-index join: explode distinct shingles (carrying the
            doc's shingle count), groupby shingle emits co-occurrence rows,
            groupby pair counts the intersection. Hot shingles are a skew
            hazard at scale: groups above MAX_DF docs are dropped (df cut,
            never triggered at test scale).

Group keys are content hashes -> uniformly distributed; bucket-count-free
(group count scales with data, Ray's sort-based shuffle handles it).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.text import round6

from ..functions.hashing import (
    MINHASH_BANDS,
    MINHASH_K,
    MINHASH_ROWS,
    band_keys,
    minhash_signature,
    shingle_base_hashes,
    simhash60,
)

MINHASH_THRESHOLD = 0.5  # est. Jaccard at/above which a pair is a near-dup
SIMHASH_BAND_BITS = 12
SIMHASH_NUM_BANDS = 5
SIMHASH_MAX_HAMMING = SIMHASH_NUM_BANDS - 1  # pigeonhole-exact
JACCARD_THRESHOLD = 0.5
MAX_DF = 10_000  # df cut for pathological shingles (skew guard at scale)


# ---------------------------------------------------------------------- exact
def add_content_hash(batch: pa.Table) -> pa.Table:
    hs = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return batch.append_column("h", pa.array(hs, pa.string()))


def first_per_hash(group: pa.Table) -> pa.Table:
    """Survivor = min doc_id within one content-hash group."""
    ids = group.column("doc_id").to_pylist()
    return pa.table({"doc_id": pa.array([min(ids)], pa.int64())})


def dedup_exact(ds):
    """Dataset(doc_id, text) -> Dataset(doc_id) of surviving documents."""
    ds = ds.map_batches(add_content_hash, batch_format="pyarrow")
    return ds.groupby("h").map_groups(first_per_hash, batch_format="pyarrow")


# -------------------------------------------------------------------- minhash
def minhash_band_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> one row per (doc, band): band key + full signature."""
    out_band, out_key, out_id, out_sig = [], [], [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        sig = minhash_signature(text)
        keys = band_keys(sig)
        sig_l = [int(v) for v in sig]
        for j in range(MINHASH_BANDS):
            out_band.append(j)
            out_key.append(keys[j])
            out_id.append(int(doc_id))
            out_sig.append(sig_l)
    return pa.table(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
            "sig": pa.array(out_sig, pa.list_(pa.int64())),
        }
    )


def bucket_pairs(group: pa.Table) -> pa.Table:
    """Within one LSH bucket: verified near-dup pairs (est_j >= threshold)."""
    ids = group.column("doc_id").to_pylist()
    if len(ids) < 2:
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )
    sigs = np.array(group.column("sig").to_pylist(), dtype=np.int64)
    order = np.argsort(np.array(ids, dtype=np.int64), kind="stable")
    ids_s = [ids[i] for i in order]
    sigs = sigs[order]
    a_out, b_out, j_out = [], [], []
    n = len(ids_s)
    for i in range(n):
        for j in range(i + 1, n):
            if ids_s[i] == ids_s[j]:
                continue  # same doc in one bucket twice cannot happen per band
            est = float((sigs[i] == sigs[j]).sum()) / MINHASH_K
            if est >= MINHASH_THRESHOLD:
                a_out.append(ids_s[i])
                b_out.append(ids_s[j])
                j_out.append(round6(est))
    return pa.table(
        {
            "doc_id_a": pa.array(a_out, pa.int64()),
            "doc_id_b": pa.array(b_out, pa.int64()),
            "est_jaccard": pa.array(j_out, pa.float64()),
        }
    )


def distinct_pair(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def dedup_minhash_pairs(ds):
    """Dataset(doc_id, text) -> Dataset(doc_id_a, doc_id_b, est_jaccard)."""
    rows = ds.map_batches(minhash_band_rows, batch_format="pyarrow")
    pairs = rows.groupby(["band_id", "band_key"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    # a pair found by several bands must appear once
    return pairs.groupby(["doc_id_a", "doc_id_b"]).map_groups(
        distinct_pair, batch_format="pyarrow"
    )


# -------------------------------------------------------------------- simhash
def simhash_rows(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    vals = [simhash60(t) for t in batch.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array([int(i) for i in ids], pa.int64()),
            "simhash": pa.array([format(v, "015x") for v in vals], pa.string()),
            "sim_v": pa.array(vals, pa.int64()),
        }
    )


def simhash_band_rows(batch: pa.Table) -> pa.Table:
    out_band, out_val, out_id, out_v = [], [], [], []
    for doc_id, v in zip(
        batch.column("doc_id").to_pylist(), batch.column("sim_v").to_pylist()
    ):
        for j in range(SIMHASH_NUM_BANDS):
            out_band.append(j)
            out_val.append((v >> (SIMHASH_BAND_BITS * j)) & 0xFFF)
            out_id.append(doc_id)
            out_v.append(v)
    return pa.table(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_val": pa.array(out_val, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "sim_v": pa.array(out_v, pa.int64()),
        }
    )


def simhash_bucket_pairs(group: pa.Table) -> pa.Table:
    ids = group.column("doc_id").to_pylist()
    vs = group.column("sim_v").to_pylist()
    pairs = sorted(set(zip(ids, vs)))
    a_out, b_out, d_out = [], [], []
    for i in range(len(pairs)):
        for j in range(i + 1, len(pairs)):
            ham = bin(pairs[i][1] ^ pairs[j][1]).count("1")
            if ham <= SIMHASH_MAX_HAMMING:
                a_out.append(pairs[i][0])
                b_out.append(pairs[j][0])
                d_out.append(ham)
    return pa.table(
        {
            "doc_id_a": pa.array(a_out, pa.int64()),
            "doc_id_b": pa.array(b_out, pa.int64()),
            "hamming": pa.array(d_out, pa.int64()),
        }
    )


def dedup_simhash(ds):
    """Dataset(doc_id, text) -> per-doc signatures (doc_id, simhash hex)."""
    return ds.map_batches(simhash_rows, batch_format="pyarrow").drop_columns(
        ["sim_v"]
    )


def dedup_simhash_pairs(ds):
    """Dataset(doc_id, text) -> (doc_id_a, doc_id_b, hamming) pairs with
    hamming <= 4 — exact under the 5-band pigeonhole decomposition."""
    sigs = ds.map_batches(simhash_rows, batch_format="pyarrow")
    rows = sigs.map_batches(simhash_band_rows, batch_format="pyarrow")
    pairs = rows.groupby(["band_id", "band_val"]).map_groups(
        simhash_bucket_pairs, batch_format="pyarrow"
    )
    return pairs.groupby(["doc_id_a", "doc_id_b"]).map_groups(
        distinct_pair, batch_format="pyarrow"
    )


# -------------------------------------------------------- exact n-gram jaccard
def shingle_rows(batch: pa.Table) -> pa.Table:
    """Explode distinct shingle hashes, carrying the doc's shingle count so
    downstream needs no join back to per-doc totals."""
    out_sh, out_id, out_n = [], [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        # distinct hashes per doc: the SQL twin joins on DISTINCT (doc, hp)
        hs = np.unique(shingle_base_hashes(text))
        n = int(hs.size)
        for h in hs:
            out_sh.append(int(h))
            out_id.append(int(doc_id))
            out_n.append(n)
    return pa.table(
        {
            "sh": pa.array(out_sh, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "n_sh": pa.array(out_n, pa.int64()),
        }
    )


def cooccurrence_rows(group: pa.Table) -> pa.Table:
    """One shingle's posting list -> co-occurring doc pairs (with sizes)."""
    docs = sorted(
        zip(group.column("doc_id").to_pylist(), group.column("n_sh").to_pylist())
    )
    empty = {
        "doc_id_a": pa.array([], pa.int64()),
        "doc_id_b": pa.array([], pa.int64()),
        "n_a": pa.array([], pa.int64()),
        "n_b": pa.array([], pa.int64()),
    }
    if len(docs) < 2 or len(docs) > MAX_DF:
        return pa.table(empty)
    a_out, b_out, na_out, nb_out = [], [], [], []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a_out.append(docs[i][0])
            b_out.append(docs[j][0])
            na_out.append(docs[i][1])
            nb_out.append(docs[j][1])
    return pa.table(
        {
            "doc_id_a": pa.array(a_out, pa.int64()),
            "doc_id_b": pa.array(b_out, pa.int64()),
            "n_a": pa.array(na_out, pa.int64()),
            "n_b": pa.array(nb_out, pa.int64()),
        }
    )


def pair_jaccard(group: pa.Table) -> pa.Table:
    inter = group.num_rows
    na = group.column("n_a")[0].as_py()
    nb = group.column("n_b")[0].as_py()
    a = group.column("doc_id_a")[0].as_py()
    b = group.column("doc_id_b")[0].as_py()
    jac = inter / (na + nb - inter)
    if jac < JACCARD_THRESHOLD:
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "doc_id_a": pa.array([a], pa.int64()),
            "doc_id_b": pa.array([b], pa.int64()),
            "jaccard": pa.array([round6(jac)], pa.float64()),
        }
    )


def dedup_ngram_jaccard(ds):
    """Dataset(doc_id, text) -> (doc_id_a, doc_id_b, jaccard >= 0.5) exact
    word-3-gram Jaccard via the inverted-index join."""
    rows = ds.map_batches(shingle_rows, batch_format="pyarrow")
    co = rows.groupby("sh").map_groups(cooccurrence_rows, batch_format="pyarrow")
    return co.groupby(["doc_id_a", "doc_id_b"]).map_groups(
        pair_jaccard, batch_format="pyarrow"
    )
