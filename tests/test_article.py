"""Newspaper3k/news-please-class article extraction
(functions/extractors/article.py, pipelines/queries.py extract_article)."""
import pyarrow.parquet as pq

from web_content_extraction_benchmark_ray.functions.extractors.article import (
    article,
)

SF = "/root/testdata/sf0.001"


def test_title_prefers_og_title():
    html = (
        "<html><head><title>Page | SiteName</title>"
        '<meta property="og:title" content="The Real Headline"/>'
        "</head><body><h1>Other</h1></body></html>"
    )
    assert article(html)["title"] == "The Real Headline"


def test_title_strips_site_separator_keeps_longest():
    html = (
        "<html><head><title>A Long Article Headline - Site</title></head>"
        "<body></body></html>"
    )
    assert article(html)["title"] == "A Long Article Headline"
    # spaced pipe and em-dash separators too
    for sep in ("|", "–", "—", "\xbb", "::"):
        h = f"<html><head><title>Big Headline Words {sep} S</title></head></html>"
        assert article(h)["title"] == "Big Headline Words"
    # hyphenated words do NOT split (no surrounding whitespace)
    h = "<html><head><title>Well-Known Headline</title></head></html>"
    assert article(h)["title"] == "Well-Known Headline"


def test_title_falls_back_to_longest_h1():
    html = (
        "<html><body><h1>Short</h1><h1>The Much Longer Headline</h1>"
        "</body></html>"
    )
    assert article(html)["title"] == "The Much Longer Headline"


def test_byline_sources_in_priority_order():
    by_meta = (
        '<html><head><meta name="author" content="Ada Lovelace"/></head>'
        '<body><a rel="author">Wrong</a></body></html>'
    )
    assert article(by_meta)["byline"] == "Ada Lovelace"
    by_rel = (
        '<html><body><a rel="author">Grace Hopper</a>'
        '<span class="byline">Wrong</span></body></html>'
    )
    assert article(by_rel)["byline"] == "Grace Hopper"
    by_class = (
        '<html><body><div class="article-byline">By Alan Turing</div>'
        "</body></html>"
    )
    assert article(by_class)["byline"] == "By Alan Turing"


def test_byline_skips_author_named_containers():
    """An author-NAMED wrapper around a whole article must not become the
    byline; the short inner byline element (visited later in pre-order)
    wins."""
    body = " ".join(["word"] * 300)
    html = (
        f'<html><body><div class="author-page"><h2>Archive</h2>'
        f"<article><p>{body}</p>"
        f'<span class="byline">By Ada Lovelace</span></article>'
        "</div></body></html>"
    )
    assert article(html)["byline"] == "By Ada Lovelace"
    # no short candidate at all -> empty, never the subtree dump
    no_inner = (
        f'<html><body><div class="single-author"><p>{body}</p></div>'
        "</body></html>"
    )
    assert article(no_inner)["byline"] == ""


def test_pub_date_sources_in_priority_order():
    by_meta = (
        '<html><head><meta property="article:published_time" '
        'content="2024-03-01T12:00:00Z"/></head>'
        '<body><time datetime="1999-01-01">old</time></body></html>'
    )
    assert article(by_meta)["pub_date"] == "2024-03-01T12:00:00Z"
    by_time = (
        '<html><body><time datetime="2023-07-15">July 15</time></body></html>'
    )
    assert article(by_time)["pub_date"] == "2023-07-15"
    assert article("<html><body>nothing</body></html>")["pub_date"] == ""


def test_article_on_template_matches_expected(ray_session):
    """End-to-end over the synthetic corpus: title from <title>, empty
    byline/date, body == the cascade zone harvest."""
    from web_content_extraction_benchmark_ray.pipelines.queries import (
        extract_article,
    )
    from web_content_extraction_benchmark_ray.sources.pagegen import (
        expected_cascade,
        title_text,
    )

    df = extract_article(SF).to_pandas().sort_values("doc_id")
    docs = (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas().sort_values("doc_id")
    )
    assert len(df) == len(docs)
    assert df["title"].tolist() == [title_text(i) for i in docs["doc_id"]]
    assert (df["byline"] == "").all()
    assert (df["pub_date"] == "").all()
    assert (
        df["article_text"].tolist()
        == [expected_cascade(t) for t in docs["text"]]
    )
