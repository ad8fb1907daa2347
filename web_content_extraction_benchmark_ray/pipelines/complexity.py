"""Page-complexity and HTML-feature pipelines (reference complexity.py).

- complexity (A6): ``1 - clip(truth_tokens / src_tokens, 0, 1)`` per doc,
  where src tokens are \\w+ tokens of the script/style-stripped body text
  (complexity.py:54-74).
- global quantiles (A7): [0.25, 0.33, 0.5, 0.66, 0.75]
  (complexity.py:46,76-84).
- HTML tag-ratio features (A8): counts of h1..h6, p, li('ul'), table, a,
  div, br, strong, em over total body tags, plus ``html_to_non_html`` =
  tags per word (complexity.py:93-122 — including the reference's quirk of
  naming the li-count feature 'ul').

All stages are real DOM computations over the assembled documents — the
oracle SQL (pipelines/oracles.py) independently predicts them from the
provable template.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.htmlparse import body_or_root, parse
from ..functions.text import squeeze_ws, sub_common_entities, tokenize_words
from ..sources.synth import build_spans_table
from ..stages.reassemble import reassemble
from .evalpipe import _quantile_interp, _round6, load_truth

FEATURE_TAGS = (
    "h1", "h2", "h3", "h4", "h5", "h6", "p", "ul", "table", "a", "div",
    "br", "strong", "em",
)
_COUNT_TAG = {t: t for t in FEATURE_TAGS}
_COUNT_TAG["ul"] = "li"  # reference quirk: feature 'ul' counts <li> nodes

_DROP = frozenset(("script", "style", "noscript"))


def _src_word_count(html: str) -> int:
    body = body_or_root(parse(html))
    body.drop_tags(_DROP)
    return _src_word_count_from_body(body)


_TRUTH_CACHE: dict = {}


def complexity_batch(batch: pa.Table, truth_ref) -> pa.Table:
    """Task-pool form: broadcast truth ray.get-ed once per worker process
    (actor pools starve co-scheduled all-to-alls — see stages/extract.py)."""
    key = truth_ref.hex() if hasattr(truth_ref, "hex") else id(truth_ref)
    truth = _TRUTH_CACHE.get(key)
    if truth is None:
        truth = _TRUTH_CACHE[key] = ray.get(truth_ref)
    out = {"doc_id": [], "dataset": [], "complexity": []}
    for doc_id, html in zip(
        batch.column("doc_id").to_pylist(), batch.column("html").to_pylist()
    ):
        hit = truth.get(doc_id)
        if hit is None:
            continue
        target, dataset = hit
        truth_tokens = len(tokenize_words(target))
        src_tokens = _src_word_count(html)
        ratio = truth_tokens / src_tokens if src_tokens else 0.0
        out["doc_id"].append(int(doc_id))
        out["dataset"].append(dataset)
        out["complexity"].append(1.0 - min(1.0, max(0.0, ratio)))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "dataset": pa.array(out["dataset"], pa.string()),
            "complexity": pa.array(out["complexity"], pa.float64()),
        }
    )


def html_features(html: str) -> dict[str, float]:
    body = body_or_root(parse(html))
    body.drop_tags(_DROP)
    counts = body.count_tags()
    n_tags = sum(counts.values())
    words = _src_word_count_from_body(body)
    feats = {}
    for f in FEATURE_TAGS:
        feats[f] = counts.get(_COUNT_TAG[f], 0) / n_tags if n_tags else 0.0
    feats["html_to_non_html"] = n_tags / words if words else 0.0
    return feats


def _src_word_count_from_body(body) -> int:
    # entity substitution mirrors the parsers the reference relies on
    # (resiliparse decodes entities before .text)
    text = sub_common_entities(squeeze_ws(" ".join(body.text_chunks(frozenset()))))
    return len(tokenize_words(text))


def features_batch(batch: pa.Table) -> pa.Table:
    rows = {"doc_id": []}
    for f in FEATURE_TAGS:
        rows[f] = []
    rows["html_to_non_html"] = []
    for doc_id, html in zip(
        batch.column("doc_id").to_pylist(), batch.column("html").to_pylist()
    ):
        feats = html_features(html)
        rows["doc_id"].append(int(doc_id))
        for k, v in feats.items():
            rows[k].append(v)
    return pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            **{
                k: pa.array(rows[k], pa.float64())
                for k in list(FEATURE_TAGS) + ["html_to_non_html"]
            },
        }
    )


def _assembled(sf_dir: str, num_buckets: int = 128):
    import ray.data

    path = build_spans_table(sf_dir)
    cpus = (
        int(ray.cluster_resources().get("CPU", 4))
        if ray.is_initialized()
        else 4
    )
    ds = ray.data.read_parquet(path, override_num_blocks=2 * cpus)
    return reassemble(ds, num_buckets=num_buckets)


def complexity_pipeline(sf_dir: str, num_buckets: int = 128):
    truth_ref = ray.put(load_truth(sf_dir))
    return _assembled(sf_dir, num_buckets).map_batches(
        complexity_batch,
        fn_kwargs={"truth_ref": truth_ref},
        batch_format="pyarrow",
    )


def complexity_quantiles(sf_dir: str, qs=(0.25, 0.33, 0.5, 0.66, 0.75)):
    """Global exact quantiles of the complexity distribution (tiny result:
    one driver-side interpolation over the collected column)."""
    values = (
        complexity_pipeline(sf_dir)
        .select_columns(["complexity"])
        .to_pandas()["complexity"]
        .to_numpy(dtype=np.float64)
    )
    return pd.DataFrame(
        {"q": list(qs), "value": [_round6(_quantile_interp(values, q)) for q in qs]}
    )


def features_pipeline(sf_dir: str, num_buckets: int = 128):
    return _assembled(sf_dir, num_buckets).map_batches(
        features_batch, batch_format="pyarrow"
    )
