"""BTE parity tests (reference extractors/bte.py:17-184, FIXTURES.md §"BTE
parity"): the O(B) window search must select the same interval as a
brute-force restatement of the published O(B²) selection rule."""
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from web_content_extraction_benchmark_ray.functions.extractors.bte import (
    _paragraphs,
    _runs,
    best_window,
    bte,
)


def brute_force_window(tokens):
    """Direct restatement of the published scan: i outer ascending, j inner
    ascending, strict improvement, (0,0) default."""
    runs = _runs(tokens) if tokens else [(-1, 0)]
    max_score, max_start, max_end = 0, 0, 0
    for i in range(len(runs)):
        score = 0
        for j in range(i, len(runs)):
            score += runs[j][1]
            if score > max_score:
                max_score = score
                max_start = runs[i - 1][0] + 1 if i > 0 else 0
                max_end = runs[j][0]
    return (max_start, max_end)


def _mk_tokens(bits):
    return ["<t>" if b else "w" for b in bits]


@given(st.lists(st.booleans(), min_size=0, max_size=60))
@settings(max_examples=300, deadline=None)
def test_window_matches_bruteforce(bits):
    tokens = _mk_tokens(bits)
    assert best_window(tokens) == brute_force_window(tokens)


def test_degenerate_all_tags():
    tokens = ["<a>", "<b>", "<c>"]
    assert best_window(tokens) == (0, 0)
    assert bte("<a><b><c>") == ""


def test_degenerate_all_words():
    tokens = ["x", "y", "z"]
    assert best_window(tokens) == (0, 2)


def test_empty():
    assert best_window([]) == (0, 0)
    assert bte("") == ""


def test_simple_page():
    html = (
        "<html><head><title>T</title></head><body>"
        "<div><a href='/'>l1</a> <a href='/'>l2</a> <a href='/'>l3</a></div>"
        "<p>the main body of the page has many words in it for sure</p>"
        "<div><a href='/'>l4</a> <a href='/'>l5</a> <a href='/'>l6</a></div>"
        "</body></html>"
    )
    assert bte(html) == "the main body of the page has many words in it for sure"


def test_paragraph_marking_opening_tags_only():
    # closing tags (captured as '/p' by the name regex) must NOT break
    # paragraphs; opening block tags must.
    tokens = ["a", "b", "</p>", "c", "<p>", "d"]
    assert _paragraphs(tokens) == ["a b c", "d"]
    # li/h1 break, span does not
    tokens = ["a", "<li>", "b", "<span>", "c", "<h1>", "d"]
    assert _paragraphs(tokens) == ["a", "b c", "d"]


def test_entities_and_scripts_stripped():
    html = (
        "<body><script>var words words words words;</script>"
        "<p>say &quot;hi&nbsp;there&#39;s&quot; ok ok ok ok ok</p></body>"
    )
    out = bte(html)
    assert '"hi' in out and "there's" in out


def test_random_soup_never_raises():
    rng = random.Random(13)
    pieces = ["<div>", "</div>", "<p", ">", "word", "<", "&quot;", " ", "\n"]
    for _ in range(50):
        html = "".join(rng.choice(pieces) for _ in range(200))
        bte(html)  # must not raise
