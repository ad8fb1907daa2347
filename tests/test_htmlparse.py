"""From-scratch HTML tokenizer / DOM robustness tests."""
from web_content_extraction_benchmark_ray.functions.htmlparse import (
    Node,
    body_or_root,
    parse,
    segment_blocks,
)


def test_basic_tree_and_text():
    root = parse("<html><body><p>hello <b>world</b></p></body></html>")
    assert root.text() == "hello world"
    body = body_or_root(root)
    assert body.tag == "body"
    assert [n.tag for n in root.iter_nodes()] == ["html", "body", "p", "b"]


def test_script_style_raw_text():
    html = "<body><script>if (a < b) { x = '<p>'; }</script><p>keep</p></body>"
    root = parse(html)
    assert root.text() == "keep"
    # raw script content is not parsed as tags
    assert [n.tag for n in root.iter_nodes()] == ["body", "script", "p"]


def test_unclosed_and_misnested_tags():
    root = parse("<div><p>one<p>two</div></span><p>three")
    assert root.text() == "one two three"


def test_void_and_selfclosing():
    root = parse("<p>a<br>b<img src='x'/>c</p>")
    assert root.text() == "a b c"


def test_attrs():
    root = parse('<div id="main" class="content x" data-a=\'1\' checked>t</div>')
    div = root.find_all("div")[0]
    assert div.attrs["id"] == "main"
    assert div.attrs["class"] == "content x"
    assert div.attrs["data-a"] == "1"
    assert div.attrs["checked"] == ""


def test_comments_and_doctype_dropped():
    root = parse("<!DOCTYPE html><!-- <p>no</p> --><p>yes</p>")
    assert root.text() == "yes"


def test_drop_tags():
    root = parse("<body><nav>n</nav><p>keep</p><aside><p>drop</p></aside></body>")
    root.drop_tags({"nav", "aside"})
    assert root.text() == "keep"


def test_segment_blocks_link_density():
    html = (
        "<body><ul><li><a href='/'>Nav</a></li></ul>"
        "<p>real content here with <a href='x'>one link</a> inside</p></body>"
    )
    blocks = segment_blocks(body_or_root(parse(html)))
    texts = [b.text() for b in blocks]
    assert "Nav" in texts
    nav = blocks[texts.index("Nav")]
    assert nav.link_chars == len("Nav")
    content = blocks[[i for i, t in enumerate(texts) if "real content" in t][0]]
    assert content.link_chars == len("one link")


def test_segment_blocks_heading_flag():
    blocks = segment_blocks(parse("<h1>Title</h1><p>body text</p>"))
    flags = {b.text(): b.is_heading for b in blocks}
    assert flags["Title"] is True
    assert flags["body text"] is False


def test_pathological_depth_no_recursion_error():
    html = "<div>" * 5000 + "deep" + "</div>" * 5000
    assert parse(html).text() == "deep"


def test_truncated_tag_at_eof():
    assert parse("<p>ok<div clas").text() == "ok"


# ---------------------------------------------------------------- fuzzing
from hypothesis import given, settings
from hypothesis import strategies as st

_html_chars = st.text(
    alphabet='<>/="\'ab c&;!-\n\tp', min_size=0, max_size=200
)


@given(_html_chars)
@settings(max_examples=150, deadline=None)
def test_every_extractor_total_on_garbage(s):
    """No extractor may hang or crash the parser on arbitrary byte soup —
    the reference's error contract catches extractor exceptions per doc
    (extract.py:106-119), but the parser itself must be total."""
    from web_content_extraction_benchmark_ray.functions.extractors import (
        get_extractor,
        list_extractors,
    )

    for name in list_extractors():
        out = get_extractor(name)(s)
        assert isinstance(out, str)


@given(_html_chars)
@settings(max_examples=100, deadline=None)
def test_parse_roundtrip_total(s):
    from web_content_extraction_benchmark_ray.functions.htmlparse import (
        body_or_root,
        parse,
        segment_blocks,
    )

    root = parse(s)
    body_or_root(root).text(" ")
    segment_blocks(root)
