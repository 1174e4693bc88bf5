"""Minimal HTML DOM used by the text/link extraction chain.

The reference extractor (``/root/reference/crawler/core.py:100-158``) runs on
``BeautifulSoup(html, "html.parser")``.  BeautifulSoup is not available in
this environment, so this module builds an equivalent tree directly on top of
the stdlib :class:`html.parser.HTMLParser` and reproduces the subset of
BeautifulSoup behaviour the extraction chain relies on:

* tree building with the same tag-nesting rules the bs4 ``html.parser``
  tree-builder uses for well-formed documents (explicit end tags pop to the
  matching open ancestor; unmatched end tags are ignored; void elements never
  take children),
* ``find`` / ``find_all`` by tag name and attribute (string or compiled-regex
  values, ``attr=True`` presence checks),
* CSS selection for the three simple selector forms the reference uses —
  ``tag``, ``.class``, ``#id`` — in document order,
* ``decompose`` (detach a subtree),
* ``get_text(separator, strip=True)``: every contiguous character-data run
  becomes one text node (character references are resolved by
  ``convert_charrefs=True`` exactly as in bs4); ``get_text`` joins the
  stripped, non-empty node texts with the separator.  Comments, doctypes and
  processing instructions contribute no text (matching modern bs4 defaults).

On well-formed HTML (which the deterministic fixture generator emits) the
resulting ``get_text(" ", strip=True)`` output is byte-identical to the
BeautifulSoup output, which is what the per-row invariant requires.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# HTML void elements: never pushed on the open-element stack.  Matches the
# bs4 HTMLParserTreeBuilder empty-element set.
VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)


class TextNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: "Element | None" = None):
        self.text = text
        self.parent = parent


class Element:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict[str, str] | None = None,
                 parent: "Element | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list[Element | TextNode] = []
        self.parent = parent

    # -- attribute helpers -------------------------------------------------
    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def __getitem__(self, key: str):
        return self.attrs[key]

    def class_list(self) -> list[str]:
        return self.attrs.get("class", "").split()

    # -- traversal ---------------------------------------------------------
    def iter_elements(self):
        """Pre-order walk over descendant elements (not self)."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Element):
                yield node
                stack.extend(reversed(node.children))

    def iter_text_nodes(self):
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, TextNode):
                yield node
            else:
                stack.extend(reversed(node.children))

    # -- bs4-flavoured API -------------------------------------------------
    def find_all(self, names, attrs: dict | None = None, **attr_filters):
        """All descendant elements matching tag name(s) + attribute filters.

        ``names`` may be a string, a set/list of strings, or None (any tag).
        Attribute filter values: True (presence), str (exact match) or a
        compiled regex (``re.search`` on the value) — the forms the
        reference uses (``crawler/core.py:78,84,296``).
        """
        if isinstance(names, str):
            names = {names}
        elif names is not None:
            names = set(names)
        filters = dict(attrs or {})
        filters.update(attr_filters)

        out = []
        for el in self.iter_elements():
            if names is not None and el.name not in names:
                continue
            if _attrs_match(el, filters):
                out.append(el)
        return out

    def find(self, names, attrs: dict | None = None, **attr_filters):
        if isinstance(names, str):
            names = {names}
        elif names is not None:
            names = set(names)
        filters = dict(attrs or {})
        filters.update(attr_filters)
        for el in self.iter_elements():
            if names is not None and el.name not in names:
                continue
            if _attrs_match(el, filters):
                return el
        return None

    def select(self, selector: str):
        """Simple-selector CSS select: ``tag``, ``.class`` or ``#id``."""
        pred = _selector_predicate(selector)
        return [el for el in self.iter_elements() if pred(el)]

    def select_one(self, selector: str):
        pred = _selector_predicate(selector)
        for el in self.iter_elements():
            if pred(el):
                return el
        return None

    def decompose(self) -> None:
        """Detach this subtree from the document (idempotent)."""
        parent = self.parent
        if parent is not None:
            try:
                parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts = []
        for tn in self.iter_text_nodes():
            t = tn.text.strip() if strip else tn.text
            if strip and not t:
                continue
            parts.append(t)
        return separator.join(parts)


class Document(Element):
    """Root node; also exposes ``.html`` and ``.body`` like a soup object."""

    def __init__(self):
        super().__init__(name="[document]")

    @property
    def html(self):
        return self.find("html")

    @property
    def body(self):
        return self.find("body")


def _attrs_match(el: Element, filters: dict) -> bool:
    for key, want in filters.items():
        val = el.attrs.get(key)
        if want is True:
            if val is None:
                return False
        elif isinstance(want, str):
            if val != want:
                return False
        elif hasattr(want, "search"):  # compiled regex
            if val is None or not want.search(val):
                return False
        else:
            raise TypeError(f"unsupported attr filter: {want!r}")
    return True


def _selector_predicate(selector: str):
    if selector.startswith("."):
        cls = selector[1:]
        return lambda el: cls in el.class_list()
    if selector.startswith("#"):
        ident = selector[1:]
        return lambda el: el.attrs.get("id") == ident
    name = selector
    return lambda el: el.name == name


class _TreeBuilder(HTMLParser):
    def __init__(self):
        # convert_charrefs=True resolves &amp; etc. into the character data,
        # the same configuration bs4 uses with the html.parser builder.
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.stack: list[Element] = [self.root]
        self._data: list[str] = []

    # character data is buffered and flushed into ONE text node whenever a
    # tag boundary occurs — reproducing bs4's current_data/endData behaviour
    # so string segmentation (and hence get_text separators) matches.
    def _flush(self):
        if self._data:
            parent = self.stack[-1]
            parent.children.append(TextNode("".join(self._data), parent))
            self._data = []

    def handle_starttag(self, tag, attrs):
        self._flush()
        parent = self.stack[-1]
        attr_dict = {}
        for k, v in attrs:
            attr_dict[k] = "" if v is None else v
        el = Element(tag, attr_dict, parent)
        parent.children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self._flush()
        parent = self.stack[-1]
        attr_dict = {k: ("" if v is None else v) for k, v in attrs}
        parent.children.append(Element(tag, attr_dict, parent))

    def handle_endtag(self, tag):
        self._flush()
        if tag in VOID_TAGS:
            return
        # pop to the nearest matching open ancestor; ignore if none.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self._data.append(data)

    # comments / doctype / PIs produce no text (bs4 get_text excludes them)
    def handle_comment(self, data):
        self._flush()

    def handle_decl(self, decl):
        self._flush()

    def handle_pi(self, data):
        self._flush()


def parse_html_slow(html: str) -> Document:
    """The stdlib :class:`html.parser.HTMLParser` tree build — the
    reference tokenization, used directly for documents the fast lexer
    declines and as the differential-test oracle for it."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    builder._flush()
    return builder.root


# -- fast path --------------------------------------------------------------
# A str.find/regex lexer for the well-formed common case (r3 verdict
# directive: profile-guided fast path, byte-identical output).  It accepts
# ONLY constructs whose stdlib-HTMLParser tokenization it reproduces
# exactly; anything else (marked sections, bogus end tags, exotic attribute
# syntax, unterminated comments, mismatched cdata end tags) raises
# ``_FastFallback`` and the document re-parses through ``parse_html_slow``
# — so the fast path can be slow on weird pages but never wrong.
# Equivalences mirrored from CPython's html/parser.py goahead loop:
#   * data between tags is one handle_data per segment, html.unescape'd
#     (convert_charrefs=True) except inside script/style cdata;
#   * '<' not starting a construct becomes literal '<' data, advance 1;
#   * comments end at the first '--\\s*>' (commentclose);
#   * '<!doctype'/bogus '<!...' declarations consume to the first '>'
#     (parse_html_declaration's naive find) and contribute no text;
#   * '<?' PIs consume to the first '>' (piclose);
#   * end tags must fully match endtagfind ('</\\s*name\\s*>');
#   * start tags: name + quoted/unquoted/valueless attrs, names
#     lowercased, values unescaped, last duplicate wins, '/>' emits a
#     startendtag (no push, no cdata);
#   * script/style enter cdata mode: content is RAW data until the
#     matching '</\\s*(script|style)' whose full end tag names the SAME
#     element; EOF inside cdata flushes the rest raw (close() behavior).

class _FastFallback(Exception):
    pass


from html import unescape as _unescape  # noqa: E402  (hot-path alias)

_FAST_START_RE = re.compile(
    r'([a-zA-Z][-.a-zA-Z0-9:_]*)'
    r'((?:\s+[a-zA-Z_:][-.a-zA-Z0-9:_]*'
    r'(?:\s*=\s*(?:"[^"<>]*"|\'[^\'<>]*\'|[^\s"\'=<>`]+))?)*)'
    r'\s*(/?)>')
_FAST_ATTR_RE = re.compile(
    r'\s+([a-zA-Z_:][-.a-zA-Z0-9:_]*)'
    r'(?:\s*=\s*("[^"<>]*"|\'[^\'<>]*\'|[^\s"\'=<>`]+))?')
_FAST_END_RE = re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>')
_COMMENT_CLOSE_RE = re.compile(r'--\s*>')
_CDATA_INTEREST = {
    "script": re.compile(r'</\s*script', re.IGNORECASE),
    "style": re.compile(r'</\s*style', re.IGNORECASE),
}


def _parse_fast(html: str) -> Document:
    root = Document()
    stack = [root]
    data: list[str] = []
    n = len(html)
    i = 0
    find = html.find

    def flush():
        if data:
            parent = stack[-1]
            parent.children.append(TextNode("".join(data), parent))
            data.clear()

    while i < n:
        k = find('<', i)
        if k < 0:
            seg = html[i:]
            data.append(_unescape(seg) if '&' in seg else seg)
            break
        if k > i:
            seg = html[i:k]
            data.append(_unescape(seg) if '&' in seg else seg)
        if k + 1 >= n:
            data.append('<')
            break
        c = html[k + 1]
        if ('a' <= c <= 'z') or ('A' <= c <= 'Z'):
            m = _FAST_START_RE.match(html, k + 1)
            if m is None:
                raise _FastFallback
            flush()
            name = m.group(1).lower()
            attrs: dict[str, str] = {}
            attrstr = m.group(2)
            if attrstr:
                for am in _FAST_ATTR_RE.finditer(attrstr):
                    aval = am.group(2)
                    if aval is None:
                        aval = ""
                    else:
                        if aval[0] in '"\'':
                            aval = aval[1:-1]
                        if '&' in aval:
                            aval = _unescape(aval)
                    attrs[am.group(1).lower()] = aval
            parent = stack[-1]
            el = Element(name, attrs, parent)
            parent.children.append(el)
            i = m.end()
            if m.group(3) or name in VOID_TAGS:
                continue                      # startendtag / void: no push
            stack.append(el)
            if name in _CDATA_INTEREST:
                mm = _CDATA_INTEREST[name].search(html, i)
                if mm is None:
                    # EOF inside cdata: the stdlib goahead loop breaks
                    # without flushing when cdata_elem is set, so the
                    # unterminated tail is DISCARDED, not emitted
                    i = n
                    break
                j = mm.start()
                if j > i:
                    data.append(html[i:j])    # raw — no charref conversion
                em = _FAST_END_RE.match(html, j)
                if em is None or em.group(1).lower() != name:
                    raise _FastFallback
                flush()
                for idx in range(len(stack) - 1, 0, -1):
                    if stack[idx].name == name:
                        del stack[idx:]
                        break
                i = em.end()
        elif c == '/':
            em = _FAST_END_RE.match(html, k)
            if em is None:
                raise _FastFallback
            flush()
            name = em.group(1).lower()
            if name not in VOID_TAGS:
                for idx in range(len(stack) - 1, 0, -1):
                    if stack[idx].name == name:
                        del stack[idx:]
                        break
            i = em.end()
        elif c == '!':
            if html.startswith('<!--', k):
                mm = _COMMENT_CLOSE_RE.search(html, k + 4)
                if mm is None:
                    raise _FastFallback
                flush()
                i = mm.end()
            elif html.startswith('<![', k):
                raise _FastFallback           # marked section
            else:
                g = find('>', k + 2)
                if g < 0:
                    raise _FastFallback
                flush()
                i = g + 1
        elif c == '?':
            g = find('>', k + 2)
            if g < 0:
                raise _FastFallback
            flush()
            i = g + 1
        else:
            data.append('<')
            i = k + 1
    flush()
    return root


def parse_html(html: str) -> Document:
    """Parse an HTML string into a :class:`Document` — fast lexer for the
    well-formed common case, stdlib-parser fallback otherwise (identical
    trees either way; see the fast-path contract above)."""
    try:
        return _parse_fast(html)
    except _FastFallback:
        return parse_html_slow(html)
