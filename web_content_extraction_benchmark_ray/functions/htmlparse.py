"""From-scratch, dependency-free HTML tokenizer and lightweight DOM.

The reference relies on third-party parsers (resiliparse HTMLTree, bs4,
lxml — e.g. ``extractors/extractors.py:18-23,33-38,109-143``).  This engine
re-implements the minimal parsing capability those extractors actually use:

- single-pass regex tokenization into tags / text / comments, with raw-text
  handling for ``script``/``style``/``textarea`` (CDATA-like semantics),
- a forgiving tree builder (auto-closing of mis-nested tags, void elements,
  stray close tags ignored) so pathological documents never raise,
- the traversals the extractors need: text collection with tag exclusion,
  per-tag counting, subtree dropping, block segmentation.

Everything is pure Python but regex-driven (the scan itself runs in C); the
hot path applies it per document inside ``map_batches`` batches.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
RAW_TEXT_TAGS = frozenset(("script", "style", "textarea"))

# Block-level tags: used for block segmentation (jusText/density-style
# paragraph making) and for newline insertion on text rendering.  Mirrors the
# block-tag notion in the reference's CSS-selector truth extraction
# (dataset_readers.py:282-298) and bte.py's paragraph tags (bte.py:148-153).
BLOCK_TAGS = frozenset(
    (
        "address article aside blockquote body center dd details dir div dl dt "
        "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup "
        "hr html isindex li main menu nav noframes noscript ol p pre section "
        "table tbody td tfoot th thead tr ul"
    ).split()
)

_TOKEN_RE = re.compile(
    r"""
    <!--.*?(?:-->|$)              # comment
  | <!\[CDATA\[.*?(?:\]\]>|$)     # cdata
  | <![^>]*>                      # doctype / declaration
  | <\?[^>]*>                     # processing instruction
  | </\s*([a-zA-Z][a-zA-Z0-9:-]*)[^>]*>          # close tag   -> group 1
  | <\s*([a-zA-Z][a-zA-Z0-9:-]*)((?:[^>"']|"[^"]*"|'[^']*')*)(/?)>  # open tag -> groups 2,3,4
  | <[a-zA-Z/!?][^>]*$            # truncated tag at EOF (dropped, HTML5-style)
  | [^<]+                         # text run
  | <                             # stray '<'
    """,
    re.DOTALL | re.VERBOSE,
)

_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?""",
)

TEXT = 0
OPEN = 1
CLOSE = 2


def parse_attrs(attr_str: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(attr_str):
        name = m.group(1).lower()
        val = m.group(2) or ""
        if val[:1] in ("'", '"'):
            val = val[1:-1]
        out.setdefault(name, val)
    return out


def tokenize(html: str):
    """Yield ``(TEXT, text)``, ``(OPEN, name, attr_str, selfclosing)`` or
    ``(CLOSE, name)`` events.  Raw-text element bodies are emitted as a
    single TEXT event (and skipped entirely for script/style consumers that
    drop those subtrees)."""
    pos = 0
    n = len(html)
    while pos < n:
        m = _TOKEN_RE.match(html, pos)
        if m is None:  # pragma: no cover — the pattern always matches
            break
        tok = m.group(0)
        pos = m.end()
        if m.group(2):  # open tag
            name = m.group(2).lower()
            selfclose = bool(m.group(4)) or name in VOID_TAGS
            yield (OPEN, name, m.group(3) or "", selfclose)
            if not selfclose and name in RAW_TEXT_TAGS:
                end = re.compile(rf"</\s*{name}\s*>", re.IGNORECASE)
                em = end.search(html, pos)
                if em is None:
                    yield (TEXT, html[pos:])
                    yield (CLOSE, name)
                    pos = n
                else:
                    yield (TEXT, html[pos : em.start()])
                    yield (CLOSE, name)
                    pos = em.end()
        elif m.group(1):  # close tag
            yield (CLOSE, m.group(1).lower())
        elif tok.startswith("<") and len(tok) > 1:
            continue  # doctype / PI / truncated tag
        else:
            yield (TEXT, tok)


@dataclass
class Node:
    """One element (or the synthetic root).  ``children`` holds ``Node`` or
    ``str`` (text) entries, in document order."""

    tag: str
    attr_str: str = ""
    children: list = field(default_factory=list)
    parent: "Node | None" = None
    _attrs: dict | None = None

    @property
    def attrs(self) -> dict[str, str]:
        if self._attrs is None:
            self._attrs = parse_attrs(self.attr_str) if self.attr_str else {}
        return self._attrs

    def iter_nodes(self):
        """Depth-first pre-order over element nodes (excluding self)."""
        stack = list(reversed([c for c in self.children if isinstance(c, Node)]))
        while stack:
            node = stack.pop()
            yield node
            stack.extend(
                reversed([c for c in node.children if isinstance(c, Node)])
            )

    def find_all(self, tag: str) -> list["Node"]:
        return [n for n in self.iter_nodes() if n.tag == tag]

    def count_tags(self) -> dict[str, int]:
        counts: dict[str, int] = {}
        for n in self.iter_nodes():
            counts[n.tag] = counts.get(n.tag, 0) + 1
        return counts

    def drop_tags(self, tags) -> None:
        """Remove all subtrees whose root tag is in ``tags`` (in place)."""
        tags = frozenset(tags)
        stack = [self]
        while stack:
            node = stack.pop()
            kept = []
            for c in node.children:
                if isinstance(c, Node):
                    if c.tag in tags:
                        continue
                    stack.append(c)
                kept.append(c)
            node.children = kept

    def text_chunks(self, skip_tags=RAW_TEXT_TAGS):
        """Yield raw text runs in document order, skipping ``skip_tags``
        subtrees."""
        skip = frozenset(skip_tags)
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                yield c
            elif c.tag not in skip:
                stack.extend(reversed(c.children))

    def text(self, separator: str = " ", skip_tags=RAW_TEXT_TAGS) -> str:
        """Stripped text runs joined by ``separator`` — semantics of the
        reference's whole-text baselines (bs4 ``get_text(separator=' ',
        strip=True)``, extractors.py:18-23)."""
        parts = [s for s in (t.strip() for t in self.text_chunks(skip_tags)) if s]
        return separator.join(parts)


def parse(html: str) -> Node:
    """Build a forgiving DOM.  Mis-nested close tags pop to the nearest
    matching open element; unmatched close tags are ignored; everything
    left open at EOF is implicitly closed."""
    root = Node("#root")
    cur = root
    open_stack = [root]
    for ev in tokenize(html):
        kind = ev[0]
        if kind == TEXT:
            if ev[1]:
                cur.children.append(ev[1])
        elif kind == OPEN:
            _, name, attr_str, selfclose = ev
            node = Node(name, attr_str, parent=cur)
            cur.children.append(node)
            if not selfclose:
                open_stack.append(node)
                cur = node
        else:  # CLOSE
            name = ev[1]
            for i in range(len(open_stack) - 1, 0, -1):
                if open_stack[i].tag == name:
                    del open_stack[i:]
                    cur = open_stack[-1]
                    break
    return root


def body_or_root(root: Node) -> Node:
    for n in root.iter_nodes():
        if n.tag == "body":
            return n
    return root


@dataclass
class Block:
    """A text block for block-classifier extractors: accumulated text plus
    character counts attributed to links and headings."""

    texts: list = field(default_factory=list)
    link_chars: int = 0
    is_heading: bool = False
    dom_path: str = ""
    _text_cache: str | None = None

    def text(self) -> str:
        # " ".join(x.split()) == re.sub(r"\s+", " ", x).strip() for every
        # whitespace codepoint (str.split and \s agree; probed incl.
        # \x1c-\x1f, \x85, \xa0, U+2028, U+3000) and runs ~4x faster
        # than the regex — this is the hottest string call in extraction.
        # Cached: a Block is finalized at flush() and text() is re-read by
        # every block classifier afterwards.
        if self._text_cache is None:
            self._text_cache = " ".join(" ".join(self.texts).split())
        return self._text_cache


_HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))


def segment_blocks(root: Node, skip_tags=RAW_TEXT_TAGS) -> list[Block]:
    """Split the document into text blocks at block-level tag boundaries,
    tracking link-character counts — the segmentation jusText-style and
    density-style classifiers consume (capability of reference E12/E2,
    extractors.py:91-96 / 26-30, re-derived from the published algorithms).
    """
    skip = frozenset(skip_tags)
    blocks: list[Block] = []
    cur = Block()

    def flush(path: str):
        nonlocal cur
        if cur.text():
            blocks.append(cur)
        cur = Block(dom_path=path)

    # DFS with explicit item kinds so a block boundary flushes both when the
    # subtree is entered and when it is left.
    FLUSH, TXT, ELEM = 0, 1, 2
    stack: list = []
    for c in reversed(root.children):
        stack.append((ELEM if isinstance(c, Node) else TXT, c, 0, 0, ""))
    while stack:
        kind, c, link_depth, heading_depth, path = stack.pop()
        if kind == FLUSH:
            flush(path)
            continue
        if kind == TXT:
            s = c.strip()
            if s:
                if heading_depth:
                    cur.is_heading = True
                cur.texts.append(s)
                if link_depth:
                    cur.link_chars += len(re.sub(r"\s+", " ", s))
            continue
        if c.tag in skip:
            continue
        npath = path + "/" + c.tag
        if c.tag in BLOCK_TAGS:
            flush(npath)
            stack.append((FLUSH, None, 0, 0, path))
        for ch in reversed(c.children):
            stack.append(
                (
                    ELEM if isinstance(ch, Node) else TXT,
                    ch,
                    link_depth + (1 if c.tag == "a" else 0),
                    heading_depth + (1 if c.tag in _HEADING_TAGS else 0),
                    npath,
                )
            )
    if cur.text():
        blocks.append(cur)
    return blocks
