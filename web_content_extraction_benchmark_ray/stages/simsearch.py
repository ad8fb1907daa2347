"""Similarity search over embedding columns (list<float>).

- Brute-force cosine top-k: the query matrix (small side) is broadcast
  once via ``ray.put`` and resolved in each actor's ``__init__`` — never
  re-shipped per batch.  Each batch does one float64 matmul against the
  broadcast matrix (numpy), keeps a per-batch partial top-k, and a final
  tiny ``groupby(query_id)`` merge produces the global top-k: the classic
  combiner pattern, so the shuffle moves O(queries x k x batches) rows,
  never the corpus.
- IVF variant: the corpus is partitioned into coarse lists (here the
  table's cluster ``label``; a k-means quantizer slots in the same way),
  the partial top-k runs per list via ``groupby(label).map_groups``, and
  probed lists' partials merge identically.  With nprobe = all lists the
  result is exactly the brute-force answer (hash-verified against the same
  oracle); at scale nprobe < lists trades recall for a lists/nprobe
  scan-cost reduction.
- Near-dup cosine pairs: every batch multiplies against the broadcast
  normalized corpus matrix (fine while the corpus side fits a worker; the
  scale path is LSH-bucketing first — see dedup.simhash's band pattern).

Cosines are computed in float64 and rounded to 6 decimals BEFORE ranking,
with vec_id as tie-break, so ordering is identical in numpy and DuckDB.
"""
from __future__ import annotations

import numpy as np

from ..functions.arrownp import num_col
import pyarrow as pa
import ray

KNN_K = 10
N_QUERIES = 8  # queries = vectors with vec_id < N_QUERIES
COS_DUP_THRESHOLD = 0.99


def load_query_matrix(embeddings_path: str) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side tiny read of the query vectors (vec_id < N_QUERIES)."""
    import pyarrow.parquet as pq

    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = num_col(t.column("vec_id"), np.int64)
    mask = ids < N_QUERIES
    vecs = np.array(
        [v for v, m in zip(t.column("embedding").to_pylist(), mask) if m],
        dtype=np.float64,
    )
    qids = ids[mask]
    order = np.argsort(qids)
    return qids[order], vecs[order]


def emb_matrix(col) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix WITHOUT the
    to_pylist round-trip: flatten() honors list offsets and hands numpy
    the raw value buffer (near zero-copy).  Ragged input raises
    (functions/arrownp.py)."""
    import pyarrow as _pa

    from ..functions.arrownp import list_matrix

    return list_matrix(col, np.float64)


def _norm(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _partial_topk(
    qids: np.ndarray, qmat: np.ndarray, vec_ids: np.ndarray, vecs: np.ndarray
) -> pa.Table:
    """Top-k rows of one corpus slice against all queries."""
    cos = _norm(vecs) @ _norm(qmat).T  # (n, q) float64
    cos_r = np.floor(cos * 1e6 + 0.5) / 1e6  # SQL-twin rounding
    out_q, out_v, out_c = [], [], []
    for qi, qid in enumerate(qids):
        col = cos_r[:, qi]
        keep = vec_ids != qid  # exclude self-match
        order = np.lexsort((vec_ids[keep], -col[keep]))[:KNN_K]
        kept_ids = vec_ids[keep][order]
        kept_cos = col[keep][order]
        out_q.extend([int(qid)] * len(kept_ids))
        out_v.extend(int(v) for v in kept_ids)
        out_c.extend(float(c) for c in kept_cos)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos_r": pa.array(out_c, pa.float64()),
        }
    )


_BCAST_CACHE: dict = {}


def _get_broadcast(ref):
    """ray.get a broadcast object once per worker process (cached by ref)
    — the actor-__init__ benefit without a standing CPU reservation."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    val = _BCAST_CACHE.get(key)
    if val is None:
        val = _BCAST_CACHE[key] = ray.get(ref)
    return val


def partial_topk_batch(batch: pa.Table, queries_ref) -> pa.Table:
    """Task-pool batch stage: broadcast query matrix fetched once per
    worker process."""
    qids, qmat = _get_broadcast(queries_ref)
    vec_ids = num_col(batch.column("vec_id"), np.int64)
    vecs = emb_matrix(batch.column("embedding"))
    if vecs.size == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos_r": pa.array([], pa.float64()),
            }
        )
    return _partial_topk(qids, qmat, vec_ids, vecs)


def merge_topk(group: pa.Table) -> pa.Table:
    """Final per-query merge: global top-k + dense rank."""
    qid = group.column("query_id")[0].as_py()
    vec_ids = num_col(group.column("vec_id"), np.int64)
    cos = num_col(group.column("cos_r"), np.float64)
    order = np.lexsort((vec_ids, -cos))[:KNN_K]
    return pa.table(
        {
            "query_id": pa.array([qid] * len(order), pa.int64()),
            "vec_id": pa.array([int(v) for v in vec_ids[order]], pa.int64()),
            "rank": pa.array(range(1, len(order) + 1), pa.int64()),
            "cos_r": pa.array([float(c) for c in cos[order]], pa.float64()),
        }
    )


def knn_bruteforce(ds, queries_ref, batch_size: int = 512):
    """Dataset(vec_id, embedding) -> (query_id, vec_id, rank, cos_r)."""
    partial = ds.map_batches(
        partial_topk_batch,
        fn_kwargs={"queries_ref": queries_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return partial.groupby("query_id").map_groups(
        merge_topk, batch_format="pyarrow"
    )


def knn_ivf(ds, queries_ref):
    """IVF path: per-list partial top-k via groupby(label), then the same
    global merge.  nprobe = all lists -> exact (same oracle as brute force).
    """
    def list_topk(group: pa.Table) -> pa.Table:
        # broadcast query matrix resolved once per worker process (the same
        # _get_broadcast cache as knn_bruteforce) — a driver-side ray.get
        # here would serialize the matrix into every map_groups task closure
        qids, qmat = _get_broadcast(queries_ref)
        vec_ids = num_col(group.column("vec_id"), np.int64)
        vecs = emb_matrix(group.column("embedding"))
        return _partial_topk(qids, qmat, vec_ids, vecs)

    # list count is far below the read's block count at test scale: coalesce
    # so the groupby sort has no empty partitions (schema-less block warnings)
    from .coalesce import coalesce_small

    partial = coalesce_small(ds, 8).groupby("label").map_groups(
        list_topk, batch_format="pyarrow"
    )
    # final merge input is ~n_lists x n_queries x k rows — single block, so
    # the query_id groupby sort has exactly one (never-empty) partition
    return coalesce_small(partial, 1).groupby("query_id").map_groups(
        merge_topk, batch_format="pyarrow"
    )


# ------------------------------------------------- LSH-bucketed near-dup
RHP_BITS = 64  # random hyperplanes (sign bits of the vector signature)
RHP_BAND_BITS = 8
RHP_BANDS = RHP_BITS // RHP_BAND_BITS  # 8 bands x 8 bits
RHP_SEED = 0x5EED
RHP_PAIR_BUCKETS = 256  # coarse candidate buckets (same discipline as dedup)

_HP_CACHE: dict = {}


def _hyperplanes(dim: int) -> np.ndarray:
    """Deterministic random-hyperplane matrix (seeded; regenerated per
    worker — cheaper than a broadcast for a (dim x 64) float block)."""
    hp = _HP_CACHE.get(dim)
    if hp is None:
        rng = np.random.RandomState(RHP_SEED)
        hp = _HP_CACHE[dim] = rng.standard_normal((dim, RHP_BITS))
    return hp


def rhp_band_rows(batch: pa.Table) -> pa.Table:
    """(vec_id, embedding) -> one row per (vector, band): sign-bit band
    value + coarse bucket, CARRYING the normalized vector so in-bucket
    verification needs no broadcast and no second join (the minhash band
    pattern, stages/dedup.py, applied to vectors)."""
    vec_ids = batch.column("vec_id").to_pylist()
    embs = batch.column("embedding").to_pylist()
    if not vec_ids:
        return pa.table(
            {
                "bucket": pa.array([], pa.int32()),
                "band_id": pa.array([], pa.int32()),
                "band_val": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "nvec": pa.array([], pa.list_(pa.float64())),
            }
        )
    vecs = _norm(np.array(embs, dtype=np.float64))
    bits = (vecs @ _hyperplanes(vecs.shape[1])) >= 0  # (n, RHP_BITS)
    weights = 1 << np.arange(RHP_BAND_BITS, dtype=np.int64)
    out = {"bucket": [], "band_id": [], "band_val": [], "vec_id": [],
           "nvec": []}
    for r, vid in enumerate(vec_ids):
        nv = vecs[r].tolist()
        for j in range(RHP_BANDS):
            bv = int(
                bits[r, j * RHP_BAND_BITS:(j + 1) * RHP_BAND_BITS] @ weights
            )
            out["bucket"].append(
                (j * (1 << RHP_BAND_BITS) + bv) % RHP_PAIR_BUCKETS
            )
            out["band_id"].append(j)
            out["band_val"].append(bv)
            out["vec_id"].append(int(vid))
            out["nvec"].append(nv)
    return pa.table(
        {
            "bucket": pa.array(out["bucket"], pa.int32()),
            "band_id": pa.array(out["band_id"], pa.int32()),
            "band_val": pa.array(out["band_val"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "nvec": pa.array(out["nvec"], pa.list_(pa.float64())),
        }
    )


def rhp_bucket_pairs(group: pa.Table, threshold: float = COS_DUP_THRESHOLD
                     ) -> pa.Table:
    """One coarse bucket: exact-cosine verify every (band_id, band_val)
    posting list (one small matmul per list), emit i<j pairs with
    round(cos, 6) >= threshold."""
    posting: dict = {}
    for b, bv, d, nv in zip(
        group.column("band_id").to_pylist(),
        group.column("band_val").to_pylist(),
        group.column("vec_id").to_pylist(),
        group.column("nvec").to_pylist(),
    ):
        posting.setdefault((b, bv), {})[d] = nv
    a_out, b_out, c_out = [], [], []
    for members in posting.values():
        if len(members) < 2:
            continue
        ids = np.array(sorted(members), dtype=np.int64)
        mat = np.array([members[i] for i in ids], dtype=np.float64)
        cos = np.floor((mat @ mat.T) * 1e6 + 0.5) / 1e6
        ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
        a_out.extend(int(v) for v in ids[ii])
        b_out.extend(int(v) for v in ids[jj])
        c_out.extend(float(c) for c in cos[ii, jj])
    return pa.table(
        {
            "doc_id_a": pa.array(a_out, pa.int64()),
            "doc_id_b": pa.array(b_out, pa.int64()),
            "cos_r": pa.array(c_out, pa.float64()),
        }
    )


def cosine_dup_pairs_lsh(ds, threshold: float = COS_DUP_THRESHOLD):
    """Near-dup pairs via random-hyperplane LSH banding + in-bucket exact
    cosine — the scale path: no corpus broadcast, no O(N²) matmul.

    Exact-duplicate pairs (cos = 1) share every sign bit, so recall on
    them is deterministic 1.0.  For 0.99 <= cos < 1 the per-pair miss
    probability is (1 - (1-p)^8)^8 with p = arccos(cos)/pi — ≈ 3e-6 at
    the 0.99 threshold.  Output matches cosine_dup_pairs: (vec_id_a,
    vec_id_b), distinct across bands via the native Max aggregate."""
    from .dedup import _distinct_pairs

    rows = ds.map_batches(rhp_band_rows, batch_format="pyarrow")
    pairs = rows.groupby("bucket").map_groups(
        lambda g: rhp_bucket_pairs(g, threshold), batch_format="pyarrow"
    )
    out = _distinct_pairs(pairs, "cos_r")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id_a": batch["doc_id_a"],
                "vec_id_b": batch["doc_id_b"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


def cosine_pairs_batch(batch: pa.Table, corpus_ref,
                       threshold: float = COS_DUP_THRESHOLD) -> pa.Table:
    """Near-dup pairs: batch x broadcast-corpus matmul, emit i<j pairs with
    round(cos, 6) >= threshold.  Normalized corpus cached per worker."""
    key = (corpus_ref.hex() if hasattr(corpus_ref, "hex") else id(corpus_ref),
           "normed")
    cached = _BCAST_CACHE.get(key)
    if cached is None:
        ids, mat = ray.get(corpus_ref)
        cached = _BCAST_CACHE[key] = (ids, _norm(np.asarray(mat, dtype=np.float64)))
    ids, mat = cached
    vec_ids = num_col(batch.column("vec_id"), np.int64)
    vecs = _norm(emb_matrix(batch.column("embedding")))
    cos = np.floor((vecs @ mat.T) * 1e6 + 0.5) / 1e6  # SQL-twin rounding
    a_out, b_out = [], []
    for r in range(cos.shape[0]):
        hits = np.nonzero(cos[r] >= threshold)[0]
        for c in hits:
            if vec_ids[r] < ids[c]:  # i<j once, no self
                a_out.append(int(vec_ids[r]))
                b_out.append(int(ids[c]))
    return pa.table(
        {
            "vec_id_a": pa.array(a_out, pa.int64()),
            "vec_id_b": pa.array(b_out, pa.int64()),
        }
    )


def cosine_dup_pairs(ds, corpus_ref, threshold: float = COS_DUP_THRESHOLD,
                     batch_size: int = 512):
    return ds.map_batches(
        cosine_pairs_batch,
        fn_kwargs={"corpus_ref": corpus_ref, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
