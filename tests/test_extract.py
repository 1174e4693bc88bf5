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


# -- edge-case goldens (round 3) --------------------------------------------
# More documented html.parser/bs4 builder behaviours, same encoding
# discipline as MALFORMED_GOLDENS:
#   B7  comments and processing instructions are not text
#   B8  CDATA sections: html.parser surfaces them only via unknown_decl;
#       the engine treats them as non-text declarations and DROPS the
#       content.  DOCUMENTED DIVERGENCE: bs4 wraps the payload in a CData
#       NavigableString which get_text() would include — on real-web HTML
#       CDATA appears almost exclusively inside <script> (already CDATA
#       there, B5), where both engines drop it with the script decompose.
#   B9  convert_charrefs semantics: valid named/decimal/hex references
#       (including astral) convert; unknown named and malformed numeric
#       stay literal; legacy named references convert WITHOUT a
#       semicolon, even mid-word ("&ampy" -> "&y", the HTML5 legacy rule)
#   B10 html.parser builds no implied <tbody>/<colgroup>; stray table
#       end tags are ignored (B3); <col> is void
#   B11 attribute quirks: unquoted values, spaces around '=', and
#       valueless attributes all parse (value '' when missing)
#   B12 <svg> subtrees are DECOMPOSED before extraction — both text and
#       <a> links inside never reach the output (reference decompose
#       list, crawler/core.py:106-109, includes "svg")
EDGE_GOLDENS = [
    ("comment_not_text",                                          # B7
     "<html><body>before<!-- hidden <p>x</p> -->after</body></html>",
     "before after", []),
    ("processing_instruction",                                    # B7
     "<html><body>u<?php echo 1; ?>v</body></html>",
     "u v", []),
    ("doctype_and_comment_preamble",                              # B7
     "<!DOCTYPE html><!--c--><html><body>t</body></html>",
     "t", []),
    ("cdata_dropped",                                             # B8
     "<html><body>a<![CDATA[raw <b>bold</b>]]>b</body></html>",
     "ab", []),
    ("charrefs_valid",                                            # B9
     "<html><body>&#65;&#x42; &#120; &#x1F4A9;</body></html>",
     "AB x \U0001F4A9", []),
    ("charrefs_invalid_literal",                                  # B9
     "<html><body>&nosuch; &#xZZ; &amp broken</body></html>",
     "&nosuch; &#xZZ; & broken", []),
    ("charrefs_legacy_no_semicolon",                              # B9
     "<html><body>x&ampy &lt z</body></html>",
     "x&y < z", []),
    ("no_implied_tbody",                                          # B10
     "<html><body><table><tr><td>a</td><td>b</td></tr></table>"
     "</body></html>",
     "a b", []),
    ("stray_tbody_end_ignored",                                   # B10
     "<html><body><table></tbody><tr><td>c</td></tr></table>"
     "</body></html>",
     "c", []),
    ("colgroup_and_void_col",                                     # B10
     "<html><body><table><colgroup><col width=10><col></colgroup>"
     "<tr><td>d</td></tr></table></body></html>",
     "d", []),
    ("unquoted_attr_values",                                      # B11
     "<html><body><div class=content>inner</div>out "
     "<a href=/x>l</a></body></html>",
     "inner", ["/x"]),
    ("spaces_around_equals",                                      # B11
     '<html><body><a href = "/y" >m</a>'
     '<div class = "content" >cc</div></body></html>',
     "cc", ["/y"]),
    ("valueless_attrs",                                           # B11
     "<html><body><div class>q</div><input disabled>r</body></html>",
     "q r", []),
    ("svg_decomposed",                                            # B12
     "<html><body>pre<svg viewBox='0 0 1 1'><text>svg label</text>"
     "<desc>descr</desc></svg>post</body></html>",
     "pre post", []),
    ("svg_links_pruned",                                          # B12
     "<html><body><svg><a href='/svg'>s</a></svg>"
     "<a href='/html'>h</a></body></html>",
     "h", ["/html"]),
]


def test_edge_case_goldens():
    for name, html, want_text, want_paths in EDGE_GOLDENS:
        _, text, links, _ = parse_page(html, "https://www.ex.org/p")
        assert text == want_text, f"{name}: {text!r} != {want_text!r}"
        got_paths = [l.replace("https://www.ex.org", "") for l in links]
        assert got_paths == want_paths, f"{name}: links {got_paths}"


# -- edge-case goldens (round 3, second family) ------------------------------
# Behaviours verified directly against the stdlib html.parser tokenizer
# (which bs4's "html.parser" builder wraps, so tokenization is shared):
#   B13 XHTML self-closing syntax on a non-void tag ("<div/>") is a
#       startendtag — an EMPTY element, not an open scope
#   B14 tag and attribute NAMES lowercase, but attribute VALUES keep
#       case — so class=CONTENT does NOT match the .content selector
#       (CSS class matching is case-sensitive) and extraction falls
#       back to full-body
#   B15 entities in attribute values decode (convert_charrefs applies
#       to attributes too): href="/x?a=1&amp;b=2" yields "&" in the link
#   B16 numeric charref edge cases per the HTML5 tokenizer rules the
#       stdlib implements: out-of-range (> 0x10FFFF) -> U+FFFD;
#       C1-control range (&#150;) remaps via windows-1252 (en dash)
#   B17 "<! bogus >" is a bogus comment (dropped); the abrupt "<!-->"
#       does NOT tokenize as a comment in the stdlib parser — it stays
#       literal text (verified; bs4/html.parser shares this tokenizer)
#   B18 <textarea>/<title> get no RCDATA treatment in html.parser (only
#       script/style are CDATA, B5): markup inside them parses normally
#       and their text IS extracted (title sits in <head>, dropped by
#       the body selection instead)
EDGE_GOLDENS_2 = [
    ("selfclosing_nonvoid_div",                                   # B13
     "<html><body><div/>a<span/>b</body></html>",
     "a b", []),
    ("uppercase_names_value_case_kept",                           # B14
     "<HTML><BODY><DIV CLASS=CONTENT>Up</DIV><A HREF='/U'>u</A>"
     "</BODY></HTML>",
     "Up u", ["/U"]),
    ("entity_decoded_in_href",                                    # B15
     "<html><body><a href='/x?a=1&amp;b=2'>l</a>t</body></html>",
     "l t", ["/x?a=1&b=2"]),
    ("charref_out_of_range_is_fffd",                              # B16
     "<html><body>a&#x110000;b &#1500000;c</body></html>",
     "a�b �c", []),
    ("charref_c1_windows1252_remap",                              # B16
     "<html><body>x&#150;y &#146;z</body></html>",
     "x–y ’z", []),
    ("bogus_comment_and_abrupt_close",                            # B17
     "<html><body>a<! bogus >b<!-->c</body></html>",
     "a b<!-->c", []),
    ("textarea_not_rcdata",                                       # B18
     "<html><body><textarea><p>not parsed</p></textarea>d"
     "</body></html>",
     "not parsed d", []),
    ("title_outside_body_dropped",                                # B18
     "<html><head><title>T</title></head><body>e</body></html>",
     "e", []),
    ("void_br_both_syntaxes",                                     # B13
     "<html><body>f<br>g<br/>h</body></html>",
     "f g h", []),
    ("comment_with_inner_dashes",                                 # B7
     "<html><body>i<!-- a -- b -->j</body></html>",
     "i j", []),
]


def test_edge_case_goldens_2():
    for name, html, want_text, want_paths in EDGE_GOLDENS_2:
        _, text, links, _ = parse_page(html, "https://www.ex.org/p")
        assert text == want_text, f"{name}: {text!r} != {want_text!r}"
        got_paths = [l.replace("https://www.ex.org", "") for l in links]
        assert got_paths == want_paths, f"{name}: links {got_paths}"

# -- edge-case goldens (round 3, third family) --------------------------------
# Behaviours pinned against the REFERENCE extraction semantics
# (crawler/core.py:100-158: decompose script/style/noscript/svg/img/
# picture/video/audio/canvas/form/button from the SHARED soup, THEN read
# anchors from that same mutated tree, core.py:292-296) plus stdlib
# tokenizer quirks verified directly against html.parser this round:
#   B19 svg subtrees are decomposed: their text AND anchors vanish
#       (html.parser has no foreign-content mode — svg children are
#       ordinary elements nested under <svg>, so decompose takes all)
#   B20 form subtrees are decomposed: with no tree-builder foster
#       parenting, <table><form><tr>... nests the row INSIDE the form,
#       so the whole table body vanishes with it — '' is the correct
#       reference-parity output, counter-intuitive as it reads
#   B21 duplicate attributes: LAST value wins (bs4's default
#       on_duplicate_attribute="replace" over html.parser's event
#       stream, which reports both)
#   B22 attribute-quote quirks: unquoted values terminate at
#       whitespace/>; "<" and a single quote are legal inside a
#       double-quoted value; all reach the href verbatim
#   B23 named charrefs WITHOUT the trailing semicolon: convert_charrefs
#       decodes legacy entities by longest match ("&ampc" -> "&c",
#       "&notit;" -> "¬it;") in text AND in attribute values (the
#       stdlib applies the same regex to attrs — it does not implement
#       the HTML5 attribute exception for a following '='/alnum)
#   B24 no implied end tags: <p>one<p>two and <dl><dt>t<dd>d stay open
#       scopes (html.parser emits no implied closes); text order is
#       unchanged so extraction sees every run
EDGE_GOLDENS_3 = [
    ("svg_text_and_links_decomposed",                              # B19
     "<html><body><svg><rect/><text>svg txt</text>"
     "<a href='/s'>s</a></svg>after</body></html>",
     "after", []),
    ("form_subtree_decomposed",                                    # B20
     "<html><body><form><a href='/f'>x</a></form>out"
     "<a href='/o'>o</a></body></html>",
     "out o", ["/o"]),
    ("form_swallows_unfostered_table_row",                         # B20
     "<html><body><table><form><tr><td>c</td></tr></form>"
     "</table></body></html>",
     "", []),
    ("media_and_button_decomposed",                                # B19
     "<html><body><picture>p</picture><video>v</video>"
     "<audio>a</audio><canvas>c</canvas><button>b</button>"
     "<noscript>n</noscript>z</body></html>",
     "z", []),
    ("duplicate_attr_last_wins",                                   # B21
     "<html><body><a href='/first' href='/second'>l</a>"
     "</body></html>",
     "l", ["/second"]),
    ("unquoted_attr_value",                                        # B22
     "<html><body><a href=/p?x=1&y=2>l</a></body></html>",
     "l", ["/p?x=1&y=2"]),
    ("lt_and_quote_inside_quoted_attr",                            # B22
     "<html><body><a href=\"/q'r<s\">l</a></body></html>",
     "l", ["/q'r<s"]),
    ("legacy_entity_no_semicolon_text",                            # B23
     "<html><body>a&amp b&ampc &notit; &nota</body></html>",
     "a& b&c ¬it; ¬a", []),
    ("legacy_entity_no_semicolon_attr",                            # B23
     "<html><body><a href='/x?a=1&amp=2&ampb=3'>l</a>"
     "</body></html>",
     "l", ["/x?a=1&=2&b=3"]),
    ("no_implied_p_close",                                         # B24
     "<html><body><p>one<p>two</body></html>",
     "one two", []),
    ("no_implied_dt_dd_close",                                     # B24
     "<html><body><dl><dt>t<dd>d</dl>x</body></html>",
     "t d x", []),
]


def test_edge_case_goldens_3():
    for name, html, want_text, want_paths in EDGE_GOLDENS_3:
        _, text, links, _ = parse_page(html, "https://www.ex.org/p")
        assert text == want_text, f"{name}: {text!r} != {want_text!r}"
        got_paths = [l.replace("https://www.ex.org", "") for l in links]
        assert got_paths == want_paths, f"{name}: links {got_paths}"


# -- edge-case goldens (round 3, fourth family) --------------------------------
# More stdlib-tokenizer semantics pinned this round (the invariant's
# parser is html.parser on BOTH sides — bs4's default tree builder —
# so these encode the shared tokenizer's documented behaviour):
#   B25 numeric character references: decimal and hex decode via
#       convert_charrefs; C1 controls (&#128;-&#159;) take the HTML5
#       Windows-1252 remap (html.unescape table); NULL and
#       out-of-range code points become U+FFFD
#   B26 comments tolerate inner "--" and close at the first "-->";
#       the degenerate "<!-->" is NOT a complete declaration for the
#       stdlib lexer and passes through as literal text
#   B27 processing instructions (<?...?>) and mid-stream doctypes are
#       events without text — both vanish from extraction
#   B28 an end tag of a void element (</br>) is a no-op event
#   B29 <title> lives in <head>: the reference extracts from the body
#       candidate (crawler/core.py main/article/body selection), so
#       title text never reaches the output; the stdlib has no RCDATA
#       mode for title, so markup inside it nests as real elements —
#       also outside the body candidate
#   B30 no implied </a>: nested anchors both survive with their hrefs,
#       in document order
#   B31 <xmp> has no CDATA mode in the stdlib (script/style only):
#       its content parses as ordinary markup
EDGE_GOLDENS_4 = [
    ("numeric_charrefs",                                           # B25
     "<html><body>&#65;&#x42;c &#8212; d</body></html>",
     "ABc — d", []),
    ("c1_windows1252_remap",                                       # B25
     "<html><body>a&#151;b &#150;</body></html>",
     "a—b –", []),
    ("null_and_oob_charref",                                       # B25
     "<html><body>x&#0;y &#x110000;z</body></html>",
     "x�y �z", []),
    ("comment_dashes_and_bang_gt",                                 # B26
     "<html><body>a<!-- -- w -->b<!-->c</body></html>",
     "a b<!-->c", []),
    ("processing_instruction_dropped",                             # B27
     "<html><body>a<?php echo 1 ?>b</body></html>",
     "a b", []),
    ("bogus_doctype_midstream_dropped",                            # B27
     "<html><body>a<!DOCTYPE junk>b</body></html>",
     "a b", []),
    ("end_tag_of_void_noop",                                       # B28
     "<html><body>a<br></br>b</body></html>",
     "a b", []),
    ("title_outside_body_candidate",                               # B29
     "<html><head><title>T</title></head><body>x</body></html>",
     "x", []),
    ("title_markup_nests_outside_candidate",                       # B29
     "<html><head><title>a<b>c</b></title></head><body>z</body></html>",
     "z", []),
    ("nested_anchors_both_extracted",                              # B30
     "<html><body><a href='/1'>one<a href='/2'>two</a></a>end"
     "</body></html>",
     "one two end", ["/1", "/2"]),
    ("xmp_parsed_as_markup",                                       # B31
     "<html><body><xmp>a<b>c</b></xmp>d</body></html>",
     "a c d", []),
]


def test_edge_case_goldens_4():
    for name, html, want_text, want_paths in EDGE_GOLDENS_4:
        _, text, links, _ = parse_page(html, "https://www.ex.org/p")
        assert text == want_text, f"{name}: {text!r} != {want_text!r}"
        got_paths = [l.replace("https://www.ex.org", "") for l in links]
        assert got_paths == want_paths, f"{name}: links {got_paths}"


# -- fast-lexer differential parity (round 4) -------------------------------
# parse_html now runs a str.find/regex lexer for the well-formed common
# case with a conservative fallback to the stdlib-HTMLParser build
# (parse_html_slow).  The contract: the PUBLIC parse_html tree is always
# identical to the stdlib one — either because the fast path reproduced
# the tokenization, or because it declined and fell back.

def _tree_eq(a, b) -> bool:
    from hackathon_pagerank_ray.html_dom import TextNode
    if type(a) is not type(b):
        return False
    if isinstance(a, TextNode):
        return a.text == b.text
    if a.name != b.name or a.attrs != b.attrs:
        return False
    if len(a.children) != len(b.children):
        return False
    return all(_tree_eq(x, y) for x, y in zip(a.children, b.children))


def test_fast_lexer_tree_identical_on_corpus():
    from hackathon_pagerank_ray.html_dom import parse_html, parse_html_slow
    t = generate_pages(200, seed=13, size_mult=3, with_text=False)
    for h in t["html"]:
        s = h.as_py().decode()
        assert _tree_eq(parse_html(s), parse_html_slow(s)), s[:200]


def test_fast_lexer_tree_identical_on_goldens_and_edges():
    from hackathon_pagerank_ray.html_dom import parse_html, parse_html_slow
    cases = [html for _, html, _, _ in MALFORMED_GOLDENS]
    cases += [html for _, html, _, _ in EDGE_GOLDENS]
    cases += [html for _, html, _, _ in EDGE_GOLDENS_4]
    cases += [
        "",                                      # empty
        "plain text only & some &amp; refs",
        "< notatag>x",                           # literal '<' data
        "a<5>b",                                 # '<' + digit
        "tail ends with <",                      # lone '<' at EOF
        "<div", "<div class='x", "<a href=",     # unterminated start tags
        "<a href=x/>y",                          # '/' folded into value
        "<a href=/rel>y</a>",                    # unquoted leading slash
        "<a href=x />y",                         # real self-closing
        "<p attr = 'v'>spaced equals</p>",
        "<script>if (a<b && c>d) {}</script>after",
        "<script>var s='</scri'+'pt>';</script>x",
        "<SCRIPT>A</SCRIPT>b",                   # case-insensitive cdata end
        "<style>p > a {color:red}</style>t",
        "<script>open forever",                  # EOF inside cdata
        "<!DOCTYPE html><p>x</p>",
        "<!doctype html\nsystem 'about:legacy-compat'><i>y</i>",
        "<!bogus decl>z",
        "<?processing instruction?>w",
        "<![CDATA[raw]]>v",                      # marked section (fallback)
        "<!-- unterminated comment",
        "</>stray", "</ >stray2", "</123>n",     # bogus end tags
        "<a b=1 b=2>dup</a>",                    # last duplicate attr wins
        "<em CLASS='X'>case</em>",               # attr name lowercased
        "<p title='a&amp;b'>attr charref</p>",
        "&notareference; &#x2764;️ &#999999999;",
    ]
    for s in cases:
        assert _tree_eq(parse_html(s), parse_html_slow(s)), s[:120]


def test_fast_lexer_fuzz_mutations():
    """Seeded mutation fuzz: truncations, inserted metachars, deletions,
    splices — the public tree must equal the stdlib tree on every one."""
    import random

    from hackathon_pagerank_ray.html_dom import parse_html, parse_html_slow
    t = generate_pages(30, seed=99, size_mult=2, with_text=False)
    htmls = [h.as_py().decode() for h in t["html"]]
    rng = random.Random(7)
    for _ in range(400):
        s = rng.choice(htmls)
        op = rng.randrange(4)
        if op == 0:
            s = s[:rng.randrange(len(s))]
        elif op == 1:
            pos = rng.randrange(len(s))
            s = s[:pos] + rng.choice("<>&\"'/= !-") + s[pos:]
        elif op == 2:
            pos = rng.randrange(len(s))
            s = s[:pos] + s[pos + 1:]
        else:
            a, b = sorted((rng.randrange(len(s)), rng.randrange(len(s))))
            s = s[:a] + s[b:]
        # the stdlib tokenizer hard-rejects some malformed markup
        # (AssertionError from _markupbase on unknown marked-section
        # keywords); agreement then means BOTH paths raise — the
        # extract STAGE skips such pages like failed fetches
        try:
            slow = parse_html_slow(s)
        except Exception as e:
            try:
                parse_html(s)
            except Exception as e2:
                assert type(e2) is type(e), s[:120]
                continue
            raise AssertionError(f"fast parsed what stdlib rejects: "
                                 f"{s[:120]!r}")
        assert _tree_eq(parse_html(s), slow), s[:120]


def test_stage_skips_parser_rejected_pages():
    """A page whose markup the stdlib tokenizer hard-rejects (unknown
    marked-section keyword raises AssertionError) must be SKIPPED by the
    extract stage — dropped like a failed fetch — never allowed to kill
    the batch."""
    import datetime

    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from hackathon_pagerank_ray.stages.extract_stage import parse_pages

    bad = "<html><body>x<![DATA[boom]]></body></html>"
    good = "<html><body>fine page text</body></html>"
    with _pytest.raises(Exception):
        parse_page(bad, "https://ex.org/bad")      # library API: raises
    ts = datetime.datetime(2024, 1, 1)
    pages = pa.table({
        "url": pa.array(["https://ex.org/bad", "https://ex.org/good"]),
        "warc_ts": pa.array([ts, ts],
                            pa.timestamp("us")),
        "html": pa.array([bad.encode(), good.encode()], pa.binary())})
    out = parse_pages(rd.from_arrow(pages)).to_pandas()
    assert list(out["url"]) == ["https://ex.org/good"]
    assert out["text"].iloc[0] == "fine page text"


def test_hostile_href_dropped_not_fatal():
    """A malformed-authority href (urlparse raises ValueError) drops
    like an off-domain link; the rest of the page still extracts."""
    html = ("<html><body><main>"
            "<a href='http://[::1'>bad</a>"
            "<a href='/ok'>good</a>t</main></body></html>")
    _, text, links, _ = parse_page(html, "https://e.org/p")
    assert links == ["https://e.org/ok"]
    assert text == "bad good t"
