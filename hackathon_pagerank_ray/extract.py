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


def normalize_url(url: str) -> str:
    """Drop fragment, lowercase host, strip trailing slash except at root
    (crawler/core.py:39-60; identical twin at api/main.py:131-152)."""
    parts = urlparse(url)
    path = parts.path or "/"
    if path != "/" and path.endswith("/"):
        path = path.rstrip("/")
    parts = parts._replace(fragment="", netloc=parts.netloc.lower(), path=path)
    return urlunparse(parts)


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
    for el in doc.find_all(NONCONTENT_TAGS):
        el.decompose()
    for selector in BOILERPLATE_SELECTORS:
        for el in doc.select(selector):
            el.decompose()

    main = doc.find("main")
    if main is None:
        for candidate in MAIN_CANDIDATES:
            main = doc.select_one(candidate)
            if main is not None:
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
    for a in doc.find_all("a", href=True):
        target = normalize_url(urljoin(page_url, a["href"]))
        if not is_same_domain(target, base_domain):
            continue
        if target.startswith("mailto:") or target.startswith("javascript:"):
            continue
        yield a, target


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
    norm_url = normalize_url(url)
    if base_domain is None:
        base_domain = get_base_domain(urlparse(norm_url).netloc.lower())
    text = extract_text(doc)
    links = extract_links(doc, norm_url, base_domain)
    return lang, text, links, True
