"""N-gram majority-vote ensemble extractor, from scratch.

Semantics of the reference's ensemble voter (``extractors/ensemble.py:40-73``
+ member binding ``extractors.py:174-209``), re-derived:

- the full-page token stream (whole text, no boilerplate removal) is padded
  with ``\\0`` sentinel tokens,
- for each token, the left and right ``ngram_size``-grams are rendered as
  space-padded strings; each member model votes (with its weight) if either
  n-gram occurs as a substring of the member's whitespace-normalized answer,
- tokens with votes >= ``int(0.66 * n_members)`` are kept, space-joined.

Difference by design (Ray-Data-first): the reference joins member answers
from JSONL side files via a per-process cache (ensemble.py:24-37, a join in
our table model — SURVEY.md §2.3 N1); this engine computes member answers
inline in the same per-document pass, so the ensemble stage needs no
shuffle at all.  Member answers are NOT recomputed from raw HTML per
member: the document is parsed/segmented ONCE and every member consumes
its shared-input form (SHARED_FORMS), mirroring the reference's
consume-precomputed-answers shape; when the extraction stage runs members
alongside the ensemble in the same job, their already-computed answers are
reused outright (stages/extract.py).
"""
from __future__ import annotations

from ..text import tokenize_ws
from . import SHARED_FORMS, register_extractor
from .baselines import body_text_from_root
from .bte import bte
from .density import density
from .justext import justext
from .readability import readability
from .tagclean import tagclean

NGRAM_SIZE = 5

# (name, fn, weight) — the engine's from-scratch member set; threshold rule
# matches the reference (int(len(models) * .66), extractors.py:197).
MEMBERS = [
    ("bte", bte, 1),
    ("justext", justext, 1),
    ("density", density, 1),
    ("readability", readability, 1),
    ("tagclean", tagclean, 1),
]


def _pad_zero(s: str, n: int) -> str:
    return ("\0 " * n) + s + (" \0" * n)


def majority_vote(
    page_text: str,
    answers: list[str],
    weights: list[int],
    vote_threshold: int,
    ngram_size: int = NGRAM_SIZE,
) -> str:
    """Vote tokens of ``page_text`` against member ``answers``."""
    padded_answers = [
        _pad_zero(" ".join(tokenize_ws(a or "")), ngram_size) for a in answers
    ]
    tokens = tokenize_ws(_pad_zero(page_text, ngram_size - 1))
    votes = [0] * len(tokens)
    for ti in range(ngram_size - 1, len(tokens) - ngram_size + 1):
        gram_l = " " + " ".join(tokens[ti - ngram_size + 1 : ti + 1]) + " "
        gram_r = " " + " ".join(tokens[ti : ti + ngram_size]) + " "
        for answer, w in zip(padded_answers, weights):
            if gram_l in answer or gram_r in answer:
                votes[ti] += w
            if votes[ti] >= vote_threshold:
                break
    body = tokens[ngram_size - 1 : len(tokens) - ngram_size + 1]
    body_votes = votes[ngram_size - 1 : len(votes) - ngram_size + 1]
    return " ".join(t for t, v in zip(body, body_votes) if v >= vote_threshold)


def member_answer(name, fn, html, root, blocks, cached=None):
    """One member's answer through the shared-input fast path.

    ``cached`` maps member name -> already-computed answer (an extraction
    stage running the member model in the same job); a cached answer is
    reused outright — the reference's consume-precomputed-answers shape
    (ensemble.py:24-37).  Otherwise the member's SHARED_FORMS entry
    consumes the per-document ``root``/``blocks`` parsed once for all
    members; only members without a shared form (bte tokenizes raw HTML,
    tagclean mutates its tree) re-read ``html``.
    """
    if cached is not None and name in cached:
        return cached[name]
    form = SHARED_FORMS.get(name) if root is not None else None
    if form is not None:
        kind, sfn = form
        return sfn(blocks) if kind == "blocks" else sfn(root)
    return fn(html)


def ensemble_from_parsed(html, root, blocks, members, cached=None) -> str:
    """Vote with one shared parse: threshold = int(0.66 * total weight),
    where a weight-w member counts as w duplicated entries (reference
    ``_get_ensemble_model_list``, extractors.py:174-209)."""
    page_text = body_text_from_root(root)
    answers = [
        member_answer(name, fn, html, root, blocks, cached)
        for name, fn, _ in members
    ]
    weights = [w for _, _, w in members]
    threshold = int(sum(weights) * 0.66)
    return majority_vote(page_text, answers, weights, threshold)


def _needs_blocks(members) -> bool:
    return any(
        SHARED_FORMS.get(name, ("", None))[0] == "blocks"
        for name, _, _ in members
    )


def _run_ensemble(html: str, members) -> str:
    """Standalone (direct-call) form: parse/segment once, then vote."""
    from ..htmlparse import body_or_root, parse, segment_blocks

    root = parse(html)
    blocks = (
        segment_blocks(body_or_root(root)) if _needs_blocks(members) else None
    )
    return ensemble_from_parsed(html, root, blocks, members)


@register_extractor("ensemble")
def ensemble(html: str) -> str:
    return _run_ensemble(html, MEMBERS)


# N4 parameterizations (reference extractors.py:194-209): best-subset and
# weighted (selected members counted twice).
BEST_MEMBERS = [m for m in MEMBERS if m[0] in ("bte", "density", "readability")]
WEIGHTED_MEMBERS = [
    (name, fn, 2 if name in ("readability", "justext") else w)
    for name, fn, w in MEMBERS
]


@register_extractor("ensemble_best")
def ensemble_best(html: str) -> str:
    return _run_ensemble(html, BEST_MEMBERS)


@register_extractor("ensemble_weighted")
def ensemble_weighted(html: str) -> str:
    return _run_ensemble(html, WEIGHTED_MEMBERS)


# Member binding per ensemble model, consumed by the extraction stage
# (stages/extract.py) so a job running members alongside the ensemble
# computes each member ONCE per document.
ENSEMBLE_MEMBERS = {
    "ensemble": MEMBERS,
    "ensemble_best": BEST_MEMBERS,
    "ensemble_weighted": WEIGHTED_MEMBERS,
}
