"""Mini-HTML DOM kernels: text stripping, link candidates, element extraction.

The reference uses BeautifulSoup (unavailable in-sandbox); these kernels
re-implement the exact *observable* semantics we need on the synthetic corpus,
using a small stdlib ``html.parser`` DOM:

* ``strip_text``       — visible text join (``src/verification/verify.py:84-104``
                          + bad-tag pruning ``verify.py:70-82``)
* ``candidate_links``  — ordered anchor scan + privacy-keyword filter
                          (``src/crawler.py:90-138``); the stateful seen-check /
                          junk filters / in-page dedup stay in the caller so the
                          oracle and the engine replay share one code path
                          (see crawlcore.extract_links)
* ``walk_elements``    — DFS p/h\\d/[u|o]l extraction incl. the colon list-prefix
                          heuristic and <META:.../META> marker
                          (``src/parser-tokenizer.py:108-168``)
* ``compare_parsed_text`` — parse-completeness self-check
                          (``src/parser-tokenizer.py:170-188``)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .textrules import split_sentences

BAD_TAGS = frozenset(
    ["style", "script", "noscript", "head", "title", "meta", "img", "iframe",
     "header", "footer", "nav"]
)
_VOID_TAGS = frozenset(["br", "img", "hr", "meta", "input", "link"])
_H_RE = re.compile(r"h\d")
_L_RE = re.compile(r"[u|o]l")
META_MARKER = (
    "<META: This element identified as list prefix -- moved to content string of "
    "that list./META>"
)


@dataclass
class Node:
    tag: str | None  # None => text node
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)
    text: str = ""

    def get_text(self) -> str:
        if self.tag is None:
            return self.text
        return "".join(c.get_text() for c in self.children)

    def iter_tags(self):
        """All descendant tag nodes, document order (self excluded)."""
        for c in self.children:
            if c.tag is not None:
                yield c
                yield from c.iter_tags()


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(tag="[root]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag=tag, attrs=dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag=tag, attrs=dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].children.append(Node(tag=None, text=data))


def parse_html(html: str) -> Node:
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


def _prune_bad(node: Node) -> None:
    node.children = [c for c in node.children if c.tag not in BAD_TAGS]
    for c in node.children:
        if c.tag is not None:
            _prune_bad(c)


def strip_text(html: str) -> str:
    """Visible text: prune bad tags, join whitespace-stripped text runs with " "."""
    if html == "":
        return ""
    root = parse_html(html)
    _prune_bad(root)
    out: list[str] = []

    def visit(n: Node) -> None:
        for c in n.children:
            if c.tag is None:
                t = c.text.strip()
                if t:
                    out.append(t)
            else:
                visit(c)

    visit(root)
    return " ".join(out)


def anchor_string(a: Node) -> str | None:
    """bs4 ``tag.string`` semantics: the sole text child, else None."""
    if len(a.children) == 1 and a.children[0].tag is None:
        return a.children[0].text
    return None


def candidate_links(html: str, keywords: tuple[str, ...] = ("privacy",)) -> list[str]:
    """Ordered raw hrefs passing the anchor-string + keyword filter.

    Reference scans all <a> once *per keyword* (outer loop ``src/crawler.py:103``);
    an anchor with nested markup has ``.string is None`` and is skipped even when
    its href matches (``crawler.py:105``). Junk filters (javascript/mailto/len<3),
    the seen-dict check, URL completion and in-page dedup are applied by the
    caller, in reference order.
    """
    root = parse_html(html)
    anchors = [t for t in root.iter_tags() if t.tag == "a"]
    out: list[str] = []
    for kw in keywords:
        for a in anchors:
            s = anchor_string(a)
            if s and "href" in a.attrs:
                href = a.attrs["href"]
                if kw in s.lower() or kw in href.lower():
                    out.append(href)
    return out


def walk_elements(html: str) -> list[tuple[str, str, int]]:
    """DFS element extraction → ordered [(content_string, tag_type, tag_index)].

    Reproduces ``walk_tree`` (``src/parser-tokenizer.py:108-168``): p/h\\d/[u|o]l
    capture, list colon-prefix move (sentence-split the previous element, move its
    last sentence into the list text, replace the original by the META marker when
    emptied), list subtrees not recursed, everything else recursed.
    """
    root = parse_html(html)
    _prune_bad(root)
    seq: list[list] = []  # [content_string, tag_type, tag_index] (mutable)
    counters = {"p": 0, "h": 0, "l": 0}

    def walk(node: Node) -> None:
        for el in node.children:
            if el.tag is None:
                continue
            name = el.tag
            if name == "p":
                text = el.get_text().strip() + "\n"
                seq.append([text, "p", counters["p"]])
                counters["p"] += 1
            elif _H_RE.match(name):
                text = el.get_text().strip() + "\n"
                seq.append([text, "h", counters["h"]])
                counters["h"] += 1
            elif _L_RE.match(name):
                text = ""
                if seq:
                    prev = seq[-1][0].strip()
                    if prev.endswith(":"):
                        text = split_sentences(prev)[-1] + "\n"
                        seq[-1][0] = seq[-1][0].replace(text.strip(), "")
                        if seq[-1][0].strip() == "":
                            seq[-1][0] = META_MARKER
                for child in el.children:
                    if child.tag is None:
                        continue
                    text = text + child.get_text().strip() + "\n"
                seq.append([text, "l", counters["l"]])
                counters["l"] += 1
                continue  # list subtree fully consumed
            walk(el)

    walk(root)
    return [(c, t, i) for c, t, i in seq]


def compare_parsed_text(elements: list[tuple[str, str, int]], auto_stripped_text: str) -> list[str]:
    """Remove every parsed line from the stripped text; sentence-split the rest.

    >5 leftover sentences ⇒ the parse failed (``src/parser-tokenizer.py:170-188``,
    gate at 304-317).
    """
    for content, _tag, _idx in elements:
        for segment in content.splitlines():
            auto_stripped_text = auto_stripped_text.replace(segment.strip(), "", 1)
    return split_sentences(auto_stripped_text)
