"""t-SNE 2-D embedding — the reference's visualization step (M3,
``complexity.py:137-144``: sklearn ``TSNE`` over the per-page HTML
feature vectors, barnes-hut, driver-side).

From-scratch exact t-SNE (KL(P||Q) gradient descent, van der Maaten &
Hinton 2008 — public algorithm), DETERMINISTIC: the embedding
initializes from the engine's own integer-exact PCA projection
(pipelines/project.py) instead of a random normal, and no jitter is
added, so identical inputs give identical embeddings with no seed
plumbing.

Like the reference (and SURVEY.md §2.6), this is a driver-side,
small-data operator: t-SNE's O(N²) affinity matrix and its dense
per-iteration gradient are only meaningful at visualization scale, so
the query bounds N (first ``max_n`` doc_ids) and documents the bound —
the distributed path for "project everything" is ``feature_project``.
No SQL oracle exists (300 coupled float iterations); the driver records
the weaker rows-only check, and the pytest suite pins determinism and
neighborhood preservation instead.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import round6
from .classify import SCALE, clf_examples
from .project import N_FEATS, _power_components, _scatter_matrix

TSNE_PERPLEXITY = 30.0
TSNE_ITERS = 300
TSNE_LR = 100.0
TSNE_EARLY_EXAG = 12.0
TSNE_EXAG_ITERS = 100
TSNE_MAX_N = 2000


def _cond_probs(d2: np.ndarray, perplexity: float) -> np.ndarray:
    """Row-wise conditional P_{j|i} via binary search on sigma (standard
    perplexity calibration)."""
    n = d2.shape[0]
    target = np.log(perplexity)
    P = np.zeros_like(d2)
    for i in range(n):
        row = d2[i]
        lo, hi, beta = 0.0, np.inf, 1.0
        for _ in range(50):
            ex = np.exp(-row * beta)
            ex[i] = 0.0
            s = ex.sum()
            if s <= 0:
                h = 0.0
            else:
                p = ex / s
                nz = p > 0
                h = -(p[nz] * np.log(p[nz])).sum()
            if abs(h - target) < 1e-5:
                break
            if h > target:
                lo = beta
                beta = beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi = beta
                beta = (lo + beta) / 2
        ex = np.exp(-row * beta)
        ex[i] = 0.0
        s = ex.sum()
        P[i] = ex / s if s > 0 else 0.0
    return P


def tsne_embed(x: np.ndarray, y0: np.ndarray,
               perplexity: float = TSNE_PERPLEXITY,
               iters: int = TSNE_ITERS) -> np.ndarray:
    """Exact t-SNE with momentum + early exaggeration, deterministic
    given (x, y0)."""
    n = len(x)
    d2 = np.square(x[:, None, :] - x[None, :, :]).sum(-1)
    P = _cond_probs(d2, min(perplexity, max((n - 1) / 3.0, 2.0)))
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    y = y0.copy()
    vel = np.zeros_like(y)
    for t in range(iters):
        exag = TSNE_EARLY_EXAG if t < TSNE_EXAG_ITERS else 1.0
        dy2 = np.square(y[:, None, :] - y[None, :, :]).sum(-1)
        num = 1.0 / (1.0 + dy2)
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        PQ = (exag * P - Q) * num
        grad = 4.0 * ((np.diag(PQ.sum(1)) - PQ) @ y)
        mom = 0.5 if t < 250 else 0.8
        vel = mom * vel - TSNE_LR * grad
        y = y + vel
        y = y - y.mean(0)
    return y


def tsne_project(sf_dir: str, max_n: int = TSNE_MAX_N):
    """(doc_id, t1, t2) for the first ``max_n`` doc_ids' feature vectors."""
    fx = clf_examples(sf_dir)
    head = fx.sort("doc_id").limit(max_n).to_pandas()
    ids = head["doc_id"].to_numpy(dtype=np.int64)
    x = (
        np.array(head["xq"].tolist(), dtype=np.float64)[:, :N_FEATS] / SCALE
    )
    # deterministic init: the integer-exact PCA projection, scaled to the
    # small magnitudes t-SNE expects at init (~1e-4 like the random init)
    v1, v2 = _power_components(_scatter_matrix(fx))
    y0 = np.column_stack(
        [x @ (np.asarray(v, dtype=np.float64) / SCALE) for v in (v1, v2)]
    )
    den = np.abs(y0).max(axis=0)
    den[den == 0] = 1.0
    y0 = y0 / den * 1e-4
    y = tsne_embed(x, y0)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "t1": pa.array([round6(float(v)) for v in y[:, 0]],
                           pa.float64()),
            "t2": pa.array([round6(float(v)) for v in y[:, 1]],
                           pa.float64()),
        }
    )
