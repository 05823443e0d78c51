"""HTML main-content extraction — boilerplate strip via DOM heuristics.

The north rule's first capability clause: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics". Implemented with the stdlib
``html.parser`` (no bs4/lxml in this container) as a readability-style
scorer:

1. parse into a block tree (block-level elements only);
2. hard-drop non-content subtrees (script/style/noscript/template/
   nav/header/footer/aside/form/iframe + role/class hints);
3. score each candidate block: text length x (1 - link_density) —
   link-dense blocks are navigation/boilerplate;
4. the best-scoring subtree is the main content; its block texts are
   emitted in document order.

Runs as a vectorized ``map_batches`` kernel over an ``html`` column.
The synthetic page generator (:func:`synthesize_html`) wraps a
document's text in an article surrounded by deterministic boilerplate
(nav links, header, ads aside, footer) — extraction must recover the
article text exactly, which gives the operator a strict DuckDB oracle.
"""

from __future__ import annotations

import hashlib
from html import escape, unescape
from html.parser import HTMLParser

import pandas as pd
import pyarrow as pa

# subtrees that are never main content
_DROP_TAGS = {
    "script", "style", "noscript", "template", "nav", "header", "footer",
    "aside", "form", "iframe", "svg", "button", "title",
    # NOTE: void elements (meta, link, br, img) must NOT be here — they
    # have no end tag, so a drop-depth increment would never unwind
}
_BLOCK_TAGS = {
    "html", "body", "div", "article", "section", "main", "p", "ul", "ol",
    "li", "table", "tr", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre",
}
_DROP_HINTS = ("nav", "menu", "footer", "header", "sidebar", "ad", "banner", "promo")
# HTML5 void elements: no end tag ever arrives, so they must never push
# state that an end tag would be needed to unwind
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}


class _Block:
    __slots__ = ("tag", "parent", "children", "text_len", "link_len", "texts", "dropped")

    def __init__(self, tag: str, parent, dropped: bool) -> None:
        self.tag = tag
        self.parent = parent
        self.children: list[_Block] = []
        self.text_len = 0
        self.link_len = 0
        self.texts: list[str] = []
        self.dropped = dropped


class _DomParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Block("html", None, False)
        self.cur = self.root
        self.drop_depth = 0
        self.link_depth = 0
        # open-element stack of (tag, incremented_drop, is_link, is_block);
        # every state push is recorded here so the matching end tag — or an
        # ancestor's end tag implicitly closing this element — unwinds it
        self._stack: list[tuple[str, bool, bool, bool]] = []

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return  # no content, no end tag — must not touch any state
        a = dict(attrs)
        hinted = any(
            h in (a.get("class", "") + " " + a.get("id", "") + " " + a.get("role", "")).lower()
            for h in _DROP_HINTS
        )
        drops = tag in _DROP_TAGS or hinted
        if drops:
            self.drop_depth += 1
        is_link = tag == "a"
        if is_link:
            self.link_depth += 1
        is_block = tag in _BLOCK_TAGS
        if is_block:
            blk = _Block(tag, self.cur, self.drop_depth > 0)
            self.cur.children.append(blk)
            self.cur = blk
        self._stack.append((tag, drops, is_link, is_block))

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                # pop this element and everything it implicitly closes
                for _, drops, is_link, is_block in self._stack[i:]:
                    if drops:
                        self.drop_depth -= 1
                    if is_link:
                        self.link_depth -= 1
                    if is_block and self.cur.parent is not None:
                        self.cur = self.cur.parent
                del self._stack[i:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data):
        t = " ".join(data.split())
        if not t:
            return
        if self.drop_depth > 0:
            return
        self.cur.texts.append(t)
        self.cur.text_len += len(t)
        if self.link_depth > 0:
            self.cur.link_len += len(t)


def _aggregate(blk: _Block) -> tuple[int, int]:
    """Propagate (text_len, link_len) up the tree."""
    t, l = blk.text_len, blk.link_len
    for c in blk.children:
        ct, cl = _aggregate(c)
        t += ct
        l += cl
    blk.text_len, blk.link_len = t, l
    return t, l


def _collect_texts(blk: _Block, out: list[str]) -> None:
    out.extend(blk.texts)
    for c in blk.children:
        if not c.dropped:
            _collect_texts(c, out)


def _score(blk: _Block) -> float:
    if not blk.text_len or blk.dropped:
        return 0.0
    return blk.text_len * (1.0 - blk.link_len / blk.text_len)


def _best_block(blk: _Block) -> _Block:
    """Descend from the root toward the main-content subtree.

    At each level, move into the best-scoring child ONLY when the text
    shed by doing so is majority-link (navigation/ads boilerplate) or
    zero-score noise — never when it would drop plain prose (e.g. a
    short trailing paragraph of the article).
    """
    cur = blk
    while True:
        best_c = None
        best_s = -1.0
        for c in cur.children:
            s = _score(c)
            if s > best_s:
                best_s, best_c = s, c
        if best_c is None:
            return cur
        shed_text = cur.text_len - best_c.text_len
        shed_links = cur.link_len - best_c.link_len
        if shed_text <= 0:
            cur = best_c  # wrapper with no own text
            continue
        if shed_links >= 0.5 * shed_text:
            cur = best_c  # shedding boilerplate
            continue
        return cur


def extract_main_content(html: str) -> str:
    """Main-content text of an HTML page, boilerplate stripped."""
    p = _DomParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return ""
    _aggregate(p.root)
    best = _best_block(p.root)
    out: list[str] = []
    _collect_texts(best, out)
    return unescape(" ".join(out))


def extract_main_content_batch(batch: pa.Table, col: str = "html") -> pa.Table:
    """map_batches kernel: + main_text column."""
    texts = [extract_main_content(h or "") for h in batch[col].to_pylist()]
    return batch.drop_columns([col]).append_column("main_text", pa.array(texts, pa.string()))


# ------------------------------------------------------------ synthesis

def synthesize_html(text: str, doc_id: str) -> str:
    """Deterministic page: the document text inside an article,
    surrounded by boilerplate (nav links, header, link-dense aside,
    footer) derived from doc_id."""
    h = int.from_bytes(hashlib.md5(doc_id.encode()).digest()[:4], "little")
    toks = text.split(" ")
    paras = [" ".join(toks[i : i + 25]) for i in range(0, len(toks), 25)] or [""]
    nav = "".join(
        f'<a href="/{i}">section {h % 7} link {i}</a> ' for i in range(4 + h % 3)
    )
    ads = "".join(f'<a href="/ad{i}">buy thing {i} now</a> ' for i in range(3))
    body = "".join(f"<p>{escape(p)}</p>" for p in paras)
    return (
        "<html><head><title>doc</title><style>p{margin:0}</style>"
        "<script>var x = 1;</script></head><body>"
        f'<nav>{nav}</nav><header><h1>site {h % 100}</h1></header>'
        f'<div class="content"><article>{body}</article></div>'
        f'<aside class="sidebar">{ads}</aside>'
        f"<footer>copyright {2000 + h % 26} some site</footer>"
        "</body></html>"
    )


def html_main_content(docs_ds, text_col: str = "text"):
    """documents -> synthesize page -> extract main content.

    Exact invariant: extraction recovers each document's text verbatim
    (the article body), with every piece of boilerplate stripped.
    """
    def synth(batch: pa.Table) -> pa.Table:
        htmls = [
            synthesize_html(t or "", str(d))
            for d, t in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist())
        ]
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"].to_pylist(), "html": htmls}
        )

    return docs_ds.map_batches(synth, batch_format="pyarrow").map_batches(
        extract_main_content_batch, batch_format="pyarrow"
    )
