"""Evaluation pipeline: extractions × ground truth -> score records ->
aggregations.

Ray shape (SURVEY.md §3.3): the truth side is small per partition and is
**broadcast** (``ray.put`` once, ``ray.get`` in each actor's ``__init__``)
instead of shuffled — the reference loads the truth dict per process the
same way (eval.py:84-91).  Scoring is an actor-pool ``map_batches`` stage;
aggregation pre-reduces per batch before the tiny groupby.

Ground truth is exact by construction: the page template's main content
(pagegen.truth_plaintext), the analogue of the reference's ground-truth
JSONL (extract.py:41-55).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.evalx import levenshtein_token_ratio, rouge_lsum
from ..functions.text import tokenize_ws
from ..sources import pagegen as pg
from ..sources.synth import build_spans_table
from ..schema import SCORES
from .extraction import extraction_pipeline

EVAL_MODELS = ("bte", "whole_text")


def truth_plaintext(text: str) -> str:
    return " ".join(pg.main_paragraphs(text))


def load_truth(sf_dir: str) -> dict[str, tuple[str, str]]:
    """doc_id -> (truth_plaintext, dataset).  The 'dataset' label is the
    document's lang (the synthetic sub-corpus axis)."""
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return {
        str(d): (truth_plaintext(x), lang)
        for d, x, lang in zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    }


_TRUTH_CACHE: dict = {}


def score_batch(batch: pa.Table, truth_ref) -> pa.Table:
    """Task-pool scorer: the broadcast truth table is ``ray.get``-ed once
    per worker process (cached by ref) — the broadcast-join benefit of an
    actor pool without actors' standing CPU reservation, which starved the
    upstream extraction sort (same pathology as stages/extract.py)."""
    key = truth_ref.hex() if hasattr(truth_ref, "hex") else id(truth_ref)
    truth = _TRUTH_CACHE.get(key)
    if truth is None:
        truth = _TRUTH_CACHE[key] = ray.get(truth_ref)
    return ScoreStage.score(truth, batch)


class ScoreStage:
    """Actor-pool scorer: truth lookup fetched from the object store once
    per actor (broadcast join, no shuffle).  Kept for callers that want a
    standing pool; the pipeline default is the task form above."""

    def __init__(self, truth_ref):
        self.truth = ray.get(truth_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return ScoreStage.score(self.truth, batch)

    @staticmethod
    def score(truth, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in SCORES.names}
        for doc_id, model, pred in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("model").to_pylist(),
            batch.column("plaintext").to_pylist(),
        ):
            hit = truth.get(doc_id)
            if hit is None:  # semi-join: answers without truth are skipped
                continue
            target, dataset = hit
            prec, rec, f1 = rouge_lsum(target, pred)
            rows["doc_id"].append(doc_id)
            rows["model"].append(model)
            rows["dataset"].append(dataset)
            rows["scorer"].append("rouge")
            rows["prec"].append(prec)
            rows["rec"].append(rec)
            rows["f1"].append(f1)
            rows["dist"].append(None)
            dist = levenshtein_token_ratio(
                tokenize_ws(target), tokenize_ws(pred)
            )
            rows["doc_id"].append(doc_id)
            rows["model"].append(model)
            rows["dataset"].append(dataset)
            rows["scorer"].append("levenshtein")
            rows["prec"].append(None)
            rows["rec"].append(None)
            rows["f1"].append(None)
            rows["dist"].append(dist)
        return pa.table(rows, schema=SCORES)


def scores_pipeline(sf_dir: str, models=EVAL_MODELS, num_buckets: int = 128):
    truth_ref = ray.put(load_truth(sf_dir))
    spans = build_spans_table(sf_dir)
    cpus = (
        int(ray.cluster_resources().get("CPU", 4))
        if ray.is_initialized()
        else 4
    )
    ds = extraction_pipeline(
        spans, models=models, num_buckets=num_buckets,
        override_num_blocks=2 * cpus,
    )
    return ds.map_batches(
        score_batch,
        fn_kwargs={"truth_ref": truth_ref},
        batch_format="pyarrow",
        batch_size=64,
    )


# ---------------------------------------------------------------------------
# Aggregations (reference eval.py:242-288 — A1-A4)


def _round6(x: float) -> float:
    """floor(x*1e6+0.5)/1e6 — one fixed rounding rule mirrored literally in
    the oracle SQL so Ray and DuckDB round identically."""
    return float(np.floor(x * 1e6 + 0.5) / 1e6)


def _median_interp(v: np.ndarray) -> float:
    """quantile_cont(0.5) formula: lo + (hi - lo) * frac."""
    return _quantile_interp(v, 0.5)


def _quantile_interp(v: np.ndarray, q: float) -> float:
    v = np.sort(v)
    if len(v) == 0:
        return float("nan")
    pos = (len(v) - 1) * q
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    return float(v[lo] + (v[hi] - v[lo]) * (pos - lo))


def agg_scores_by_dataset(scores_ds, scorer: str = "rouge"):
    """Per-(model, dataset) mean/median (A1).  Pre-aggregation pattern:
    the rouge rows are filtered and reduced per group with an exact
    in-group median (group cardinality is bounded — SURVEY.md §7.7)."""
    col = "f1" if scorer == "rouge" else "dist"

    def agg(group: pd.DataFrame) -> pd.DataFrame:
        v = group[col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "model": [group["model"].iloc[0]],
                "dataset": [group["dataset"].iloc[0]],
                "mean_score": [_round6(float(v.sum() / len(v)))],
                "median_score": [_round6(_median_interp(v))],
                "n": [len(v)],
            }
        )

    filtered = scores_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["scorer"], scorer)),
        batch_format="pyarrow",
    )
    return filtered.groupby(["model", "dataset"]).map_groups(
        agg, batch_format="pandas"
    )


def agg_scores_micro(scores_ds, scorer: str = "rouge"):
    """Global per-model mean/median (A2)."""
    col = "f1" if scorer == "rouge" else "dist"

    def agg(group: pd.DataFrame) -> pd.DataFrame:
        v = group[col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "model": [group["model"].iloc[0]],
                "mean_score": [_round6(float(v.sum() / len(v)))],
                "median_score": [_round6(_median_interp(v))],
                "n": [len(v)],
            }
        )

    filtered = scores_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["scorer"], scorer)),
        batch_format="pyarrow",
    )
    return filtered.groupby("model").map_groups(agg, batch_format="pandas")


def agg_scores_macro(scores_ds, scorer: str = "rouge"):
    """Macro average: mean of per-dataset means (A3). The second-level
    reduce runs on the tiny A1 output."""
    per_ds = agg_scores_by_dataset(scores_ds, scorer).to_pandas()
    out = (
        per_ds.groupby("model", as_index=False)
        .agg(macro_mean=("mean_score", lambda s: _round6(s.sum() / len(s))))
        .sort_values("model")
        .reset_index(drop=True)
    )
    return out


def agg_quantiles(scores_ds, scorer: str = "rouge", qs=(0.25, 0.75)):
    """Per-model exact quantiles (A4)."""
    col = "f1" if scorer == "rouge" else "dist"

    def agg(group: pd.DataFrame) -> pd.DataFrame:
        v = group[col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "model": [group["model"].iloc[0]] * len(qs),
                "q": list(qs),
                "value": [_round6(_quantile_interp(v, q)) for q in qs],
            }
        )

    filtered = scores_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["scorer"], scorer)),
        batch_format="pyarrow",
    )
    return filtered.groupby("model").map_groups(agg, batch_format="pandas")
