"""Text-analysis scalar functions: token counting, quality scoring,
language-ID voting.

Each has an exact SQL twin in pipelines/dataops_oracles.py; the parameters
(stopword list, quality weights, language set) are module constants shared
with the oracle builder so Python and SQL cannot drift.

Capability parity: token counting generalizes the reference's tokenizers
(``/root/reference/src/extraction_benchmark/util.py:44-70``); quality
features extend its tag-ratio page features
(``/root/reference/src/extraction_benchmark/complexity.py:99-122``) to the
document-quality signals a training-data pipeline filters on.
"""
from __future__ import annotations

import re

from .hashing import hash60
from .text import round6, tokenize_words, tokenize_ws

# BPE-ish pre-tokenizer: word runs or single non-space punctuation.
BPE_PATTERN = r"\w+|[^\w\s]"
_BPE_RE = re.compile(BPE_PATTERN, flags=re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", flags=re.UNICODE)

# Tiny fixed stopword list for the quality ratio (SQL embeds the same).
STOPWORDS = ("a", "the", "and", "of", "in", "to", "is")

# Language set for the lexicon-vote heuristic.  The synthetic corpus's text
# is vocabulary soup, so the lexicon is itself synthetic-but-deterministic:
# word w belongs to LANGS[hash60('langlex:'+w) % len(LANGS)].  The mechanism
# (per-language lexicon votes over tokens, argmax with deterministic tie
# break) is the real n-gram/lexicon heuristic shape.
LANGS = ("de", "en", "es", "fr", "zh")


def token_counts(text: str) -> tuple[int, int, int]:
    """(whitespace tokens, \\w+ word tokens, BPE-ish tokens)."""
    return (
        len(tokenize_ws(text)),
        len(tokenize_words(text)),
        len(_BPE_RE.findall(text)),
    )


def quality_features(text: str) -> dict:
    """Deterministic quality signals + combined score in [0, 1]."""
    toks = tokenize_ws(text)
    n_ws = len(toks)
    n_chars = len(text)
    n_punct = len(_PUNCT_RE.findall(text))
    n_stop = sum(1 for t in toks if t.lower() in STOPWORDS)
    stop_ratio = n_stop / n_ws if n_ws else 0.0
    punct_ratio = n_punct / n_chars if n_chars else 0.0
    mean_word_len = (
        sum(len(t) for t in toks) / n_ws if n_ws else 0.0
    )
    score = (
        0.5 * min(1.0, n_ws / 50.0)
        + 0.3 * min(1.0, stop_ratio * 5.0)
        + 0.2 * (1.0 - min(1.0, punct_ratio * 10.0))
    )
    return {
        "n_chars": n_chars,
        "n_ws": n_ws,
        "stop_ratio": round6(stop_ratio),
        "punct_ratio": round6(punct_ratio),
        "mean_word_len": round6(mean_word_len),
        "quality": round6(score),
    }


def lang_of_word(w: str) -> str:
    return LANGS[hash60("langlex:" + w) % len(LANGS)]


def lang_id(text: str) -> tuple[str, float]:
    """(predicted language, winning vote ratio).  Ties break to the
    lexicographically smallest language; empty docs -> ('und', 0.0)."""
    toks = tokenize_ws(text)
    if not toks:
        return "und", 0.0
    votes = {l: 0 for l in LANGS}
    for t in toks:
        votes[lang_of_word(t)] += 1
    best = max(sorted(votes), key=lambda l: votes[l])
    return best, round6(votes[best] / len(toks))
