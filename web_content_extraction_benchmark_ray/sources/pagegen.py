"""Deterministic CleanEval/Dragnet-style page template.

The reference's correctness anchor is ground-truth corpora whose main
content is known (SURVEY.md §5; reference ``dataset_readers.py:135-198``).
This engine synthesizes an equivalent corpus from the driver's flat
``documents`` table: each document's word-soup ``text`` becomes the main
content of a boilerplate-laden HTML page.

The template is **classifier-provable by construction**:

- every boilerplate block (site header, nav, sidebar, comment links,
  footer) is short and link-dense — guaranteed dropped by the jusText-style,
  density-style, Readability-style, BTE and ensemble extractors;
- every main paragraph carries fixed stopword-rich "glue" (> 200 chars,
  stopword ratio far above the jusText ``stopwords_high=0.2`` threshold from
  reference ``extractors.py:94``) — guaranteed kept.

Hence the expected output of every extractor is a *deterministic,
SQL-expressible* function of ``text`` — which is what lets the DuckDB
oracle hash-verify the whole distributed pipeline (see
``pipelines/oracles.py``).  ``tests/test_template_provable.py`` asserts the
guarantee over adversarial word-soup inputs.
"""
from __future__ import annotations

import random

CHUNK_WORDS = 12

PAR_PREFIX = (
    "It is often the case that these are the terms which we have found to be "
    "of the most interest to all of our readers here and now:"
)
PAR_SUFFIX = (
    "and that is why we think it matters so much to each and every one of us "
    "in the end."
)

H1_TEXT = "NavBrand WebCorpus"
NAV_ITEMS = ["NavHome", "NavTopics", "NavArchive", "NavAbout", "NavContact"]
ASIDE_ITEMS = ["SideWidget1", "SideWidget2", "SideWidget3"]
REPLY_ITEMS = ["ReplyLink1", "ReplyLink2"]
FOOTER_LINKS = ["FooterTerms", "FooterPrivacy"]
FOOTER_TAIL_HTML = "&quot;NavCopyright&quot; 2024"
FOOTER_TAIL_TEXT = '"NavCopyright" 2024'


def title_text(doc_id) -> str:
    return f"Synthetic page {doc_id}"


def chunk_words(text: str) -> list[list[str]]:
    words = text.split()
    return [words[i : i + CHUNK_WORDS] for i in range(0, len(words), CHUNK_WORDS)]


def main_paragraphs(text: str) -> list[str]:
    """The ground-truth main-content paragraphs for ``text`` — exact by
    construction (analogue of CleanEval ``clean/`` files)."""
    return [
        f"{PAR_PREFIX} {' '.join(c)} {PAR_SUFFIX}" for c in chunk_words(text)
    ]


def render_page(doc_id, text: str) -> str:
    """Render the full HTML page for one document."""
    pars = "\n".join(f"<p>{p}</p>" for p in main_paragraphs(text))
    nav = "\n".join(f'<li><a href="/nav/{i}">{t}</a></li>' for i, t in enumerate(NAV_ITEMS))
    aside = "\n".join(
        f'<li><a href="/side/{i}">{t}</a></li>' for i, t in enumerate(ASIDE_ITEMS)
    )
    replies = " ".join(
        f'<a href="/reply/{i}">{t}</a>' for i, t in enumerate(REPLY_ITEMS)
    )
    footer_links = " ".join(
        f'<a href="/foot/{i}">{t}</a>' for i, t in enumerate(FOOTER_LINKS)
    )
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"<title>{title_text(doc_id)}</title>\n"
        "<style>body { margin: 0; } .nav > li { color: #334; }</style>\n"
        f'<script>var tracker = "t-{doc_id}"; if (tracker) {{ track(tracker); }}</script>\n'
        "</head>\n<body>\n"
        '<header class="site-header">\n'
        f'<h1><a href="/">{H1_TEXT}</a></h1>\n'
        f'<nav class="nav"><ul>\n{nav}\n</ul></nav>\n'
        "</header>\n"
        f'<div id="main" class="content">\n{pars}\n</div>\n'
        f'<aside class="sidebar"><ul>\n{aside}\n</ul></aside>\n'
        f'<div class="comments">{replies}</div>\n'
        f"<footer class=\"site-footer\"><p>{footer_links} {FOOTER_TAIL_HTML}</p></footer>\n"
        '<script type="text/javascript">var page_end = true;</script>\n'
        "</body>\n</html>\n"
    )


# ---------------------------------------------------------------------------
# Expected extractor outputs (the per-template oracles; each extractor's
# docstring cites the reference behavior it matches).

def expected_main_joined(text: str, sep: str) -> str:
    return sep.join(main_paragraphs(text))


def expected_whole_text(doc_id, text: str) -> str:
    """bs4-style whole text: script/style dropped, everything else (incl.
    <title>) space-joined (reference extractors.py:18-23)."""
    parts = (
        [title_text(doc_id), H1_TEXT]
        + NAV_ITEMS
        + main_paragraphs(text)
        + ASIDE_ITEMS
        + REPLY_ITEMS
        + FOOTER_LINKS
        + [FOOTER_TAIL_TEXT]
    )
    return " ".join(parts)


def expected_body_text(text: str) -> str:
    """body-only text nodes, script/style excluded (reference
    extractors.py:33-38 capability)."""
    parts = (
        [H1_TEXT]
        + NAV_ITEMS
        + main_paragraphs(text)
        + ASIDE_ITEMS
        + REPLY_ITEMS
        + FOOTER_LINKS
        + [FOOTER_TAIL_TEXT]
    )
    return " ".join(parts)


def expected_tagclean(text: str) -> str:
    """Blacklist cleaning (reference extractors.py:109-143): head/nav/aside/
    footer/script/style killed; header h1 and the comments div survive."""
    parts = [H1_TEXT] + main_paragraphs(text) + REPLY_ITEMS
    return " ".join(parts)


def expected_layout(text: str) -> str:
    """Layout renderer (E7 capability): line-per-block with '* ' list
    bullets; head not rendered (functions/extractors/layout.py)."""
    lines = (
        [H1_TEXT]
        + [f"* {t}" for t in NAV_ITEMS]
        + main_paragraphs(text)
        + [f"* {t}" for t in ASIDE_ITEMS]
        + [" ".join(REPLY_ITEMS)]
        + [" ".join(FOOTER_LINKS) + " " + FOOTER_TAIL_TEXT]
    )
    return "\n".join(lines)


def expected_bte(text: str) -> str:
    return expected_main_joined(text, "\n")


def expected_justext(text: str) -> str:
    """Reference joins kept paragraphs with ' ' (extractors.py:93-95)."""
    return expected_main_joined(text, " ")


def expected_density(text: str) -> str:
    return expected_main_joined(text, "\n")


def expected_readability(text: str) -> str:
    return expected_main_joined(text, "\n")


def expected_cascade(text: str) -> str:
    """Trafilatura-class cascade: zone selection hits div#main (id anchor),
    whose blocks are exactly the main paragraphs; every paragraph exceeds
    the glue length, so the sanity check always passes tier 1
    (functions/extractors/cascade.py)."""
    return expected_main_joined(text, "\n")


def expected_topnode(text: str) -> str:
    """Goose3-class gravity: only the main paragraphs are boostable (the
    footer <p> has zero stopwords), so div#main is the top node and no
    sibling qualifies (functions/extractors/topnode.py)."""
    return expected_main_joined(text, "\n")


def expected_plaintext(text: str) -> str:
    """Resiliparse-class main-content scan: header (h1+nav), aside,
    comments div and footer are pruned by tag/name; what survives is
    div#main's paragraphs, one line each
    (functions/extractors/plaintext.py)."""
    return expected_main_joined(text, "\n")


def expected_ensemble(text: str) -> str:
    return expected_main_joined(text, " ")


EXPECTED_BY_MODEL = {
    "whole_text": lambda doc_id, text: expected_whole_text(doc_id, text),
    "body_text": lambda doc_id, text: expected_body_text(text),
    "tagclean": lambda doc_id, text: expected_tagclean(text),
    "bte": lambda doc_id, text: expected_bte(text),
    "justext": lambda doc_id, text: expected_justext(text),
    "density": lambda doc_id, text: expected_density(text),
    "readability": lambda doc_id, text: expected_readability(text),
    "cascade": lambda doc_id, text: expected_cascade(text),
    "topnode": lambda doc_id, text: expected_topnode(text),
    "plaintext": lambda doc_id, text: expected_plaintext(text),
    "ensemble": lambda doc_id, text: expected_ensemble(text),
    "ensemble_best": lambda doc_id, text: expected_ensemble(text),
    "ensemble_weighted": lambda doc_id, text: expected_ensemble(text),
    # logistic leaf model: decision boundary (~9 words at zero link
    # density) selects exactly the main paragraphs on this template, like
    # the density classifier (functions/extractors/leafmodel.py)
    "leafmodel": lambda doc_id, text: expected_density(text),
    # sequence-context variant: the ±2-bounded neighbour terms cannot
    # cross the template's >=|5.8| base margins, so the decision set is
    # identical (functions/extractors/leafmodel.py:leafmodel_seq)
    "leafmodel_seq": lambda doc_id, text: expected_density(text),
    # 2-step receptive field: context terms bounded by ±3.0 — still
    # inside the same margins (leafmodel.py:SEQ2_WEIGHTS margin sketch)
    "leafmodel_seq2": lambda doc_id, text: expected_density(text),
    "layout": lambda doc_id, text: expected_layout(text),
}


# ---------------------------------------------------------------------------
# Span chunking (the grafted input shape, BASELINE.json input_hint)

def has_media(doc_id: int) -> bool:
    return int(doc_id) % 10 == 0


def media_ref(doc_id: int) -> str:
    return f"pdf://{int(doc_id)}/0"


def split_into_spans(doc_id, html: str, max_spans: int = 8):
    """Deterministically split a page's HTML into 1..max_spans 'html' spans
    (plus a 'media' span for every 10th doc), returning them **shuffled out
    of offset order** — the chunked-arrival shape that forces the
    groupby-doc_id → sort-by-offset reassembly shuffle (SURVEY.md §1.4)."""
    rng = random.Random(f"spans-{doc_id}")
    n = rng.randint(1, max_spans)
    cuts = sorted(rng.sample(range(1, len(html)), min(n - 1, len(html) - 1)))
    bounds = [0] + cuts + [len(html)]
    spans = [
        {
            "kind": "html",
            "text": html[bounds[i] : bounds[i + 1]],
            "media_ref": "",
            "offset": i,
        }
        for i in range(len(bounds) - 1)
    ]
    if has_media(doc_id):
        spans.append(
            {
                "kind": "media",
                "text": "",
                "media_ref": media_ref(doc_id),
                "offset": len(spans),
            }
        )
    rng.shuffle(spans)
    return spans
