"""Model-table block classifier — the E15 (BoilerNet) capability class.

The reference's BoilerNet wraps a Keras BiLSTM leaf classifier behind a
lazy per-process model singleton (``/root/reference/src/
extraction_benchmark/extractors/boilernet/__init__.py:31-50``); the
capability being reproduced is "neural leaf/block classifier whose model
table lives in worker state", not that network's exact output (no TF in
this sandbox, and the north rule wants from-scratch logic).

Here the model is a logistic unit over shallow block features
(word count, link density, heading flag) with a FIXED deterministic
weight table — the same shape a learned model would ship as (a weights
blob loaded once per worker).  ``stages/extract.py``'s per-process stage
cache plays the role of the model singleton.  On the provable synthetic
template the decision boundary (score > 0 <=> ~9+ words at zero link
density) exactly selects the main-content paragraphs, so the extractor
has a hash-verified SQL oracle like every other model.
"""
from __future__ import annotations

import math

from ..htmlparse import body_or_root, parse, segment_blocks
from ..text import sub_common_entities, tokenize_ws
from . import register_extractor

# The "model table": weights a trained classifier would load from disk.
WEIGHTS = {
    "w_words": 12.0,   # applied to min(words, 32) / 32
    "w_link": -8.0,    # applied to link-character ratio
    "w_heading": -8.0, # applied to the heading flag
    "bias": -3.0,
}
WORD_CAP = 32


def block_score(words: int, link_ratio: float, is_heading: bool,
                weights: dict = WEIGHTS) -> float:
    z = (
        weights["w_words"] * (min(words, WORD_CAP) / WORD_CAP)
        + weights["w_link"] * link_ratio
        + weights["w_heading"] * (1.0 if is_heading else 0.0)
        + weights["bias"]
    )
    return 1.0 / (1.0 + math.exp(-z))


@register_extractor("leafmodel")
def leafmodel(html: str, weights: dict = WEIGHTS) -> str:
    """Keep blocks the logistic unit scores > 0.5; join with newlines."""
    return leafmodel_from_segments(
        segment_blocks(body_or_root(parse(html))), weights
    )


def leafmodel_from_segments(blocks, weights: dict = WEIGHTS) -> str:
    kept = []
    for b in blocks:
        text = sub_common_entities(b.text())
        if not text:
            continue
        words = len(tokenize_ws(text))
        link_ratio = b.link_chars / len(text)
        if block_score(words, link_ratio, b.is_heading, weights) > 0.5:
            kept.append(text)
    return "\n".join(kept)


from . import register_shared  # noqa: E402

register_shared("leafmodel", "blocks", leafmodel_from_segments)
