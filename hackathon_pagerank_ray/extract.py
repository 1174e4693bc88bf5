"""Reference-parity URL / language / text / link extraction.

Behavioural reimplementation (NOT a copy) of the reference crawler's parsing
chain; every function cites the reference code whose observable behaviour it
reproduces.  These row-wise functions serve double duty:

* as the **oracle** in tests (the per-row invariant is byte-identical
  extracted text per url vs the reference parser), and
* as the kernels inside the Ray Data ``map_batches`` actor stage
  (:mod:`hackathon_pagerank_ray.stages.extract_stage`).

Reference chain, in crawl order (``crawler/core.py:271-310``):
parse html → detect language → (optional) language filter → extract text
(mutates the tree: boilerplate is decomposed) → extract links *from the
pruned tree* (so nav/header/footer links never become edges).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse, urlunparse

from .html_dom import Document, parse_html

_WS_RE = re.compile(r"\s+")
_CONTENT_LANGUAGE_RE = re.compile("content-language", re.I)
_LANGUAGE_RE = re.compile("language", re.I)

# Tags stripped outright before any text is read (crawler/core.py:106-109).
NONCONTENT_TAGS = (
    "script", "style", "noscript", "svg", "img", "picture",
    "video", "audio", "canvas", "form", "button",
)

# Boilerplate containers removed next, in this exact order — order matters
# because removing an ancestor hides its descendants from later selectors
# (crawler/core.py:112-134).
BOILERPLATE_SELECTORS = (
    "header", "footer", "nav", "aside",
    ".navbar", ".nav", ".navigation",
    ".site-header", ".site-footer", ".footer",
    "#header", "#footer", "#nav", "#navbar",
    ".cookie", ".cookie-banner", "#cookie-banner", ".banner",
)

# Fallback main-content candidates, tried in order after <main>
# (crawler/core.py:139-148).
MAIN_CANDIDATES = (
    "article", "#main", ".main", ".main-content",
    "#content", ".content", ".page-content", ".layout__content",
)

# -- precomputed lookup tables for the single-pass pruning walk -------------
# extract_text used to run one full-tree traversal per boilerplate selector
# (16) plus one per main candidate (8); profiling showed those walks were
# ~40% of page-parse time.  The tables below classify each element against
# every selector in O(1) during ONE walk; decompose order per selector is
# then replayed with an attachment check, which preserves the reference's
# sequential-selector semantics exactly (an element whose ancestor a
# EARLIER selector removed is never decomposed from the live tree).
_NONCONTENT_SET = frozenset(NONCONTENT_TAGS)
_BP_TAGS: dict[str, int] = {}
_BP_CLASSES: dict[str, int] = {}
_BP_IDS: dict[str, int] = {}
for _i, _sel in enumerate(BOILERPLATE_SELECTORS):
    if _sel.startswith("."):
        _BP_CLASSES[_sel[1:]] = _i
    elif _sel.startswith("#"):
        _BP_IDS[_sel[1:]] = _i
    else:
        _BP_TAGS[_sel] = _i
_CAND_TAGS: dict[str, int] = {}
_CAND_CLASSES: dict[str, int] = {}
_CAND_IDS: dict[str, int] = {}
for _i, _sel in enumerate(MAIN_CANDIDATES):
    if _sel.startswith("."):
        _CAND_CLASSES[_sel[1:]] = _i
    elif _sel.startswith("#"):
        _CAND_IDS[_sel[1:]] = _i
    else:
        _CAND_TAGS[_sel] = _i


def _attached(el, root) -> bool:
    """Is ``el`` still reachable from ``root``?  decompose() clears only
    the subtree root's parent, so walking the parent chain suffices."""
    p = el.parent
    while p is not None:
        if p is root:
            return True
        p = p.parent
    return False


def get_base_domain(netloc: str) -> str:
    """Last-two-label eTLD heuristic (crawler/core.py:13-23)."""
    if not netloc:
        return ""
    labels = netloc.split(".")
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return netloc


def is_same_domain(url: str, base_domain: str) -> bool:
    """Relaxed same-site check (crawler/core.py:26-36)."""
    try:
        return get_base_domain(urlparse(url).netloc.lower()) == base_domain
    except Exception:
        return False


def _norm_parts(url: str) -> tuple[str, str]:
    """(normalized url, lowercased netloc) with ONE urlparse — the hot
    anchor path needs both and used to parse twice."""
    parts = urlparse(url)
    path = parts.path or "/"
    if path != "/" and path.endswith("/"):
        path = path.rstrip("/")
    netloc = parts.netloc.lower()
    parts = parts._replace(fragment="", netloc=netloc, path=path)
    return urlunparse(parts), netloc


def normalize_url(url: str) -> str:
    """Drop fragment, lowercase host, strip trailing slash except at root
    (crawler/core.py:39-60; identical twin at api/main.py:131-152)."""
    return _norm_parts(url)[0]


def detect_page_language(doc: Document) -> str | None:
    """``<html lang>`` → meta content-language → meta name=language, then
    normalize ``en-US``/``en, fr`` → ``en`` (crawler/core.py:65-95)."""
    lang = None
    html_el = doc.html
    if html_el is not None and html_el.has_attr("lang"):
        lang = html_el["lang"]
    if not lang:
        meta = doc.find("meta", attrs={"http-equiv": _CONTENT_LANGUAGE_RE})
        if meta is not None and meta.get("content"):
            lang = meta["content"]
    if not lang:
        meta = doc.find("meta", attrs={"name": _LANGUAGE_RE})
        if meta is not None and meta.get("content"):
            lang = meta["content"]
    if not lang:
        return None
    lang = lang.strip().lower().split(",")[0].split("-")[0]
    return lang or None


def extract_text(doc: Document) -> str:
    """Main-content text extraction (crawler/core.py:100-158).

    MUTATES ``doc``: non-content tags and boilerplate containers are
    decomposed first, which is why link extraction afterwards only sees
    in-content anchors.  Output is ``get_text(" ", strip=True)`` of the main
    region with all whitespace runs collapsed to single spaces — the
    byte-identical per-row invariant.
    """
    # ONE pre-order walk classifies every element against the non-content
    # set and all 16 boilerplate selectors (reference behavior: find_all
    # over the full tree, then per-selector select over the progressively
    # pruned tree — replayed below via attachment checks, see the table
    # comment above).
    noncontent: list = []
    bp_matches: list[list] = [[] for _ in BOILERPLATE_SELECTORS]
    for el in doc.iter_elements():
        name = el.name
        if name in _NONCONTENT_SET:
            noncontent.append(el)
        i = _BP_TAGS.get(name)
        if i is not None:
            bp_matches[i].append(el)
        attrs = el.attrs
        if attrs:
            cls = attrs.get("class")
            if cls:
                for c in cls.split():
                    i = _BP_CLASSES.get(c)
                    if i is not None:
                        bp_matches[i].append(el)
            i = _BP_IDS.get(attrs.get("id"))
            if i is not None:
                bp_matches[i].append(el)
    for el in noncontent:
        el.decompose()
    for matches in bp_matches:       # selector order (crawler/core.py:112+)
        for el in matches:
            if _attached(el, doc):
                el.decompose()

    # main-region selection: <main> first, then the candidate list in
    # priority order (crawler/core.py:137-148) — one walk over the pruned
    # tree records the first match per candidate.
    main = None
    first = [None] * len(MAIN_CANDIDATES)
    for el in doc.iter_elements():
        if el.name == "main":
            main = el
            break
        i = _CAND_TAGS.get(el.name)
        if i is not None and first[i] is None:
            first[i] = el
        attrs = el.attrs
        if attrs:
            cls = attrs.get("class")
            if cls:
                for c in cls.split():
                    i = _CAND_CLASSES.get(c)
                    if i is not None and first[i] is None:
                        first[i] = el
            i = _CAND_IDS.get(attrs.get("id"))
            if i is not None and first[i] is None:
                first[i] = el
    if main is None:
        for el in first:
            if el is not None:
                main = el
                break

    root = main if main is not None else (doc.body or doc)
    text = root.get_text(" ", strip=True)
    return _WS_RE.sub(" ", text).strip()


def extract_links(doc: Document, page_url: str, base_domain: str) -> list[str]:
    """Resolve + normalize + filter anchor targets (crawler/core.py:296-304).

    Must be called AFTER :func:`extract_text` to match the reference, which
    reads anchors from the already-pruned tree.  Keeps same-base-domain
    targets, drops ``mailto:`` / ``javascript:``; duplicates are preserved
    (dedup is a separate operator, SURVEY.md D2).
    """
    return [t for _, t in _iter_anchor_targets(doc, page_url, base_domain)]


def _iter_anchor_targets(doc: Document, page_url: str, base_domain: str):
    """The ONE anchor walk + filter set both link extraction and the
    anchor-text index use — yields ``(element, target_url)`` so the two
    callers can't drift apart on filter rules (and the hot link path
    pays no per-anchor text extraction)."""
    cache: dict[str, tuple[str, bool]] = {}   # href → (target, passes)
    for a in doc.find_all("a", href=True):
        href = a.attrs["href"]
        hit = cache.get(href)
        if hit is None:
            # one parse serves normalize + same-domain (the target's
            # netloc is already lowercased by the normalization); a
            # hostile href (e.g. a malformed IPv6 authority makes
            # urlparse raise ValueError) is dropped like an off-domain
            # link instead of poisoning the whole page
            try:
                target, netloc = _norm_parts(urljoin(page_url, href))
                passes = (get_base_domain(netloc) == base_domain
                          and not target.startswith("mailto:")
                          and not target.startswith("javascript:"))
            except ValueError:
                target, passes = "", False
            hit = cache[href] = (target, passes)
        if hit[1]:
            yield a, hit[0]


def extract_anchors(doc: Document, page_url: str,
                    base_domain: str) -> list[tuple[str, str]]:
    """Like :func:`extract_links` but keeps each anchor's visible text —
    ``(target_url, anchor_text)`` pairs with the text rendered by the
    same ``get_text(" ", strip=True)`` contract as the page extractor.

    The reference discards anchor text at crawl time
    (crawler/core.py:296-304 keeps only hrefs); a search/training
    pipeline additionally needs the anchor-text index (the classic
    description signal for the TARGET page), so this is the reference's
    anchor walk with the text retained.  Same filters by construction
    (shared :func:`_iter_anchor_targets`): same-base-domain only,
    ``mailto:``/``javascript:`` dropped, duplicates preserved.
    """
    return [(target, _WS_RE.sub(" ", a.get_text(" ", strip=True)).strip())
            for a, target in _iter_anchor_targets(doc, page_url,
                                                  base_domain)]


def parse_page(html: str, url: str, target_lang: str | None = None,
               base_domain: str | None = None):
    """Full per-page chain in reference order (crawler/core.py:271-310).

    Returns ``(detected_lang, text, links, indexed)``.  When ``target_lang``
    is set and the detected language exists but doesn't start with it, the
    page is visited-but-not-indexed (``indexed=False``, no text/links) —
    unknown-language pages PASS the filter (crawler/core.py:277-283).

    The reference derives ``base_domain`` once from the crawl seed
    (crawler/core.py:200-202); for a multi-domain Common-Crawl-style corpus
    we default to the page's own base domain, which coincides with the
    reference for any in-domain crawl.  Pass ``base_domain`` to pin it.
    """
    doc = parse_html(html)
    lang = detect_page_language(doc)
    if target_lang:
        if lang is not None and not lang.lower().startswith(target_lang.lower()):
            return lang, "", [], False
    norm_url, page_netloc = _norm_parts(url)
    if base_domain is None:
        base_domain = get_base_domain(page_netloc)
    text = extract_text(doc)
    links = extract_links(doc, norm_url, base_domain)
    return lang, text, links, True
