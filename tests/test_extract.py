"""Parser-chain unit tests (no Ray) — reference parity semantics."""

import numpy as np

from hackathon_pagerank_ray.extract import (detect_page_language,
                                            extract_text, get_base_domain,
                                            is_same_domain, normalize_url,
                                            parse_page)
from hackathon_pagerank_ray.html_dom import parse_html
from hackathon_pagerank_ray.testgen import generate_pages


def test_normalize_url_reference_cases():
    # crawler/core.py:39-60 semantics
    assert normalize_url("https://EX.org/Foo/#frag") == "https://ex.org/Foo"
    assert normalize_url("https://ex.org/") == "https://ex.org/"
    assert normalize_url("https://ex.org") == "https://ex.org/"
    assert normalize_url("https://ex.org/a/b/") == "https://ex.org/a/b"
    assert normalize_url("https://Ex.Org/Path?q=1#x") == "https://ex.org/Path?q=1"


def test_base_domain_and_same_domain():
    assert get_base_domain("en.wikipedia.org") == "wikipedia.org"
    assert get_base_domain("www.wikipedia.org") == "wikipedia.org"
    assert get_base_domain("localhost") == "localhost"
    assert get_base_domain("") == ""
    assert is_same_domain("https://de.wikipedia.org/x", "wikipedia.org")
    assert not is_same_domain("https://other.net/x", "wikipedia.org")


def test_language_detection_priority():
    d = parse_html('<html lang="en-US"><head>'
                   '<meta http-equiv="content-language" content="de"></head></html>')
    assert detect_page_language(d) == "en"          # html lang wins
    d = parse_html('<html><head><meta http-equiv="Content-Language" '
                   'content="DE-de"></head></html>')
    assert detect_page_language(d) == "de"
    d = parse_html('<html><head><meta name="Language" content="en, fr">'
                   '</head></html>')
    assert detect_page_language(d) == "en"          # first of comma list
    assert detect_page_language(parse_html("<html></html>")) is None


def test_language_filter_semantics():
    # de page, en target → visited but not indexed (crawler/core.py:277-283)
    lang, text, links, indexed = parse_page(
        "<html lang='de'><body>x</body></html>", "https://e.org", "en")
    assert (lang, indexed) == ("de", False) and text == "" and links == []
    # unknown lang passes the filter
    assert parse_page("<html><body>x</body></html>",
                      "https://e.org", "en")[3] is True


def test_extract_text_boilerplate_and_main():
    html = """<html><body>
    <header>HEAD<a href='/h'>hl</a></header><nav>NAV</nav>
    <div class="cookie-banner">COOKIES</div>
    <main><p>keep <b>this</b> text</p><a href='/x'>link</a></main>
    <aside>SIDE</aside><footer>FOOT</footer>
    <script>var x;</script></body></html>"""
    _, text, links, _ = parse_page(html, "https://e.org/p")
    assert text == "keep this text link"
    assert links == ["https://e.org/x"]             # header link pruned


def test_main_candidate_priority():
    # main > article > #main > ... > body (crawler/core.py:137-153)
    html = '<html><body><article>ART</article><div id="main">DM</div>BODY</body></html>'
    d = parse_html(html)
    assert extract_text(d) == "ART"
    html2 = '<html><body><div class="content">C</div>tail</body></html>'
    assert extract_text(parse_html(html2)) == "C"
    html3 = "<html><body>just body</body></html>"
    assert extract_text(parse_html(html3)) == "just body"


def test_link_filters():
    html = ("<html><body><main>"
            "<a href='/rel'>r</a>"
            "<a href='https://EN.E.org/sub/'>s</a>"
            "<a href='https://other.net/x'>off</a>"
            "<a href='mailto:a@b.c'>m</a>"
            "<a href='javascript:void(0)'>j</a>"
            "</main></body></html>")
    _, _, links, _ = parse_page(html, "https://www.e.org/page")
    assert links == ["https://www.e.org/rel", "https://en.e.org/sub"]


def test_corpus_text_column_is_oracle_extraction():
    """FIXTURES.md F3: per-row byte identity on the generated corpus."""
    t = generate_pages(60, seed=7)
    for row in t.to_pylist():
        _, text, _, _ = parse_page(row["html"].decode(), row["url"])
        assert text == row["text"]


def test_malformed_html_no_crash():
    lang, text, links, _ = parse_page(
        "<html lang='de'><body><p>a &amp; b<div>c</p></div>"
        "<a href='/x'>l</a></p>", "https://ex.org/p/")
    assert text == "a & b c l" and links == ["https://ex.org/x"]
    assert parse_page("", "https://ex.org")[1] == ""


# -- malformed-HTML goldens (round 2) ---------------------------------------
# bs4 cannot be installed in this container, so these goldens ENCODE the
# documented behaviours of BeautifulSoup's "html.parser" tree-builder on
# malformed markup (the builder html_dom mirrors):
#   B1 no implied end tags: "<p>one<p>two" nests the second <p> inside the
#      first (bs4 docs, "Differences between parsers")
#   B2 end tag pops to the nearest matching open ancestor, implicitly
#      closing everything above it (BeautifulSoup._popToTag)
#   B3 unmatched end tags are ignored (bs4 docs: '<a></p>' -> '<a></a>')
#   B4 no foster-parenting: text directly inside <table> stays there
#   B5 script/style content is CDATA (stdlib parser behaviour shared by
#      both builders): tags inside are not parsed
#   B6 duplicate attributes: the LAST value wins (bs4 on_duplicate_attribute
#      default 'replace')
# Each case runs the full reference extraction chain (decompose ->
# main-select -> get_text(" ", strip=True) -> whitespace collapse).

MALFORMED_GOLDENS = [
    # (name, html, expected_text, expected_link_paths)
    ("unclosed_p_nests",                                          # B1
     "<html><body><p>first para<p>second para</body></html>",
     "first para second para", []),
    ("unclosed_li",                                               # B1/B2
     "<html><body><ul><li>one<li>two<li>three</ul>tail</body></html>",
     "one two three tail", []),
    ("misnested_inline",                                          # B2/B3
     "<html><body><b>bold <i>both</b> italic</i> tail</body></html>",
     "bold both italic tail", []),
    ("stray_end_tags",                                            # B3
     "<html><body></p><div>content</div></section></body></html>",
     "content", []),
    ("table_loose_text",                                          # B4
     "<html><body><table>loose<tr><td>cell</td></tr></table>after"
     "</body></html>",
     "loose cell after", []),
    ("script_cdata",                                              # B5
     "<html><body><script>var a = \"<p>not text</p>\";</script>visible"
     "</body></html>",
     "visible", []),
    ("unclosed_div_content_class",                                # B1/B2
     "<html><body><header>site nav</header><div class=\"content\">real "
     "<b>stuff\n<p>more</body></html>",
     "real stuff more", []),
    ("duplicate_attr_last_wins",                                  # B6
     "<html><body>outside <div class=\"content\" class=\"x\">inner</div>"
     "</body></html>",
     "outside inner", []),
    ("unclosed_main_swallows_footer",                             # B1
     "<html><body><main>core text<footer>foot</footer></body></html>",
     "core text", []),
    ("end_tag_implicit_close",                                    # B2/B3
     "<html><body><div>a<span>b</div>c</span></body></html>",
     "a b c", []),
    ("unclosed_nav_swallows_links",                               # B1
     "<html><body><nav><a href=\"/x\">x</a><div><a href=\"/y\">y</a>"
     "</body></html>",
     "", []),
]


def test_malformed_html_goldens():
    for name, html, want_text, want_paths in MALFORMED_GOLDENS:
        _, text, links, _ = parse_page(html, "https://www.ex.org/p")
        assert text == want_text, f"{name}: {text!r} != {want_text!r}"
        got_paths = [l.replace("https://www.ex.org", "") for l in links]
        assert got_paths == want_paths, f"{name}: links {got_paths}"
