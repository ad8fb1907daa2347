"""The oracle SQL's token/tag constants must equal what the rendered
template actually contains — verified with independent regex counting (not
the engine's own DOM parser)."""
import re

from web_content_extraction_benchmark_ray.functions.text import (
    tokenize_words,
    tokenize_ws,
)
from web_content_extraction_benchmark_ray.pipelines import oracles as oc
from web_content_extraction_benchmark_ray.sources import pagegen as pg


def _body(html: str) -> str:
    return html.split("<body>", 1)[1].split("</body>", 1)[0]


def _strip_scripts(s: str) -> str:
    return re.sub(r"<(script|style)[^>]*>.*?</\1>", "", s, flags=re.S)


OPEN_TAG = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)\b")


def test_tag_census_constants():
    for nwords in (10, 25, 99):
        text = " ".join(["tok"] * nwords)
        npars = -(-nwords // pg.CHUNK_WORDS)
        body = _strip_scripts(_body(pg.render_page(1, text)))
        tags = OPEN_TAG.findall(body)
        assert len(tags) == oc.TAGS_CONST + npars, (nwords, len(tags))
        assert tags.count("a") == oc.TAG_COUNTS["a"]
        assert tags.count("li") == oc.TAG_COUNTS["ul"]
        assert tags.count("div") == oc.TAG_COUNTS["div"]
        assert tags.count("h1") == oc.TAG_COUNTS["h1"]
        assert tags.count("p") == npars + 1  # + footer <p>


def test_token_constants():
    assert oc.GLUE_WS == len(tokenize_ws(pg.PAR_PREFIX + " " + pg.PAR_SUFFIX))
    # boilerplate ws tokens in body, counted off the rendered text parts
    body_bp_text = " ".join(
        [pg.H1_TEXT]
        + pg.NAV_ITEMS
        + pg.ASIDE_ITEMS
        + pg.REPLY_ITEMS
        + pg.FOOTER_LINKS
        + [pg.FOOTER_TAIL_TEXT]
    )
    assert oc.BP_WS_BODY == len(tokenize_ws(body_bp_text))
    assert oc.BP_WORDS_BODY == len(tokenize_words(body_bp_text))
    assert oc.BP_WS_PAGE == oc.BP_WS_BODY + len(
        tokenize_ws(pg.title_text(123))
    )


def test_truth_tokens_formula():
    for nwords in (10, 24, 99):
        text = " ".join(f"w{i}" for i in range(nwords))
        truth = " ".join(pg.main_paragraphs(text))
        npars = -(-nwords // pg.CHUNK_WORDS)
        assert len(tokenize_ws(truth)) == nwords + oc.GLUE_WS * npars
        assert len(tokenize_words(truth)) == nwords + oc.GLUE_WORDS * npars
