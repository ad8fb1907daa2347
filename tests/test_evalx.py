"""Scorer tests: bit-parallel LCS vs naive DP (hypothesis), Levenshtein
ratio semantics, ROUGE-LSum behavior incl. the reference's empty-target
conventions (eval.py:50-55)."""
from hypothesis import given, settings
from hypothesis import strategies as st

from web_content_extraction_benchmark_ray.functions.evalx import (
    lcs_indices,
    lcs_len,
    levenshtein_token_ratio,
    rouge_lsum,
    split_sentences,
)


def naive_lcs_len(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(
                prev[j] + 1 if x == y else max(prev[j + 1], cur[j])
            )
        prev = cur
    return prev[-1]


syms = st.sampled_from(["a", "b", "c", "d"])


@given(st.lists(syms, max_size=30), st.lists(syms, max_size=30))
@settings(max_examples=300, deadline=None)
def test_bitparallel_lcs_matches_naive(a, b):
    assert lcs_len(a, b) == naive_lcs_len(a, b)


@given(st.lists(syms, max_size=20), st.lists(syms, max_size=20))
@settings(max_examples=200, deadline=None)
def test_lcs_indices_consistent(a, b):
    idx = lcs_indices(a, b)
    assert len(idx) == naive_lcs_len(a, b)
    assert idx == sorted(set(idx))
    # the indexed subsequence of a must be a subsequence of b
    sub = [a[i] for i in idx]
    it = iter(b)
    assert all(any(x == y for y in it) for x in sub)


def test_levenshtein_ratio():
    assert levenshtein_token_ratio([], []) == 1.0
    assert levenshtein_token_ratio(["a"], []) == 0.0
    assert levenshtein_token_ratio(["a", "b"], ["a", "b"]) == 1.0
    # one substitution among two tokens: LCS=1 -> 2*1/4
    assert levenshtein_token_ratio(["a", "b"], ["a", "c"]) == 0.5


def test_split_sentences():
    assert split_sentences("One two. Three four!\nFive.") == [
        ["One", "two."],
        ["Three", "four!"],
        ["Five."],
    ]
    assert split_sentences("") == []
    assert split_sentences("no punct here") == [["no", "punct", "here"]]


def test_rouge_identical():
    assert rouge_lsum("a b c. d e f.", "a b c. d e f.") == (1.0, 1.0, 1.0)


def test_rouge_pred_superset_recall_one():
    target = "m1 m2 m3 m4."
    pred = "nav1 nav2 m1 m2 m3 m4. foot1 foot2"
    prec, rec, f1 = rouge_lsum(target, pred)
    assert rec == 1.0
    assert prec == 4 / 8
    assert abs(f1 - (2 * prec * rec / (prec + rec))) < 1e-12


def test_rouge_empty_target_conventions():
    # empty target: rec = 1; prec/f1 = 1 iff pred also empty
    assert rouge_lsum("", "") == (1.0, 1.0, 1.0)
    prec, rec, f1 = rouge_lsum("", "some words")
    assert rec == 1.0 and prec == 0.0 and f1 == 0.0
    # empty pred, non-empty target
    prec, rec, f1 = rouge_lsum("some words", "")
    assert (prec, rec, f1) == (0.0, 0.0, 0.0)


def test_rouge_multiset_clipping():
    # pred repeats a token many times; hits are clipped by ref counts
    prec, rec, f1 = rouge_lsum("a a.", "a a a a a a.")
    assert rec == 1.0
    assert prec == 2 / 6
