"""Tag-set blacklist stripping extractor.

Capability of reference ``extract_lxml_cleaner`` (extractors.py:109-143):
kill a fixed blacklist of subtrees (plus comments/scripts/head), then emit
the remaining whole text.  The blacklist below reproduces the reference's
configuration list (a config constant, extractors.py:113-124).
"""
from __future__ import annotations

from ..htmlparse import parse
from ..text import squeeze_ws, sub_common_entities
from . import register_extractor

TAG_BLACKLIST = frozenset(
    (
        # important
        "aside embed footer form head iframe menu object script "
        # other content
        "applet audio canvas figure map picture svg video "
        # secondary
        "area blink button datalist dialog frame frameset fieldset link input "
        "ins label legend marquee math menuitem nav noscript optgroup option "
        "output param progress rp rt rtc select source style track template "
        "textarea time use"
    ).split()
)


@register_extractor("tagclean")
def tagclean(html: str) -> str:
    root = parse(html)
    root.drop_tags(TAG_BLACKLIST)
    parts = [
        squeeze_ws(sub_common_entities(t))
        for t in root.text_chunks(skip_tags=frozenset())
    ]
    return " ".join(p for p in parts if p)
