"""P1 HTML-extraction hardening: real-world-malformed HTML fixture matrix
for the stdlib extractor (functions/cleaning.extract_html_text), plus a
stdlib-vs-BeautifulSoup byte-parity differential that auto-activates wherever
bs4 is installed (importorskip — bs4 is absent in this sandbox, so the
expected stdlib behaviors are pinned here and any divergence found by a
bs4-equipped environment is enumerated in IMPLEMENTATION.md §P1).

Reference contract being hardened against: tool.py:38-63 (BeautifulSoup
html.parser, drop script/style/meta/noscript/header/footer/nav subtrees,
get_text(separator=' '), then clean_text)."""

from __future__ import annotations

import pytest

from chinese_corpus_cleaning_spark.functions import cleaning
from chinese_corpus_cleaning_spark.functions.cleaning import extract_html_text

# (name, html, expected-from-stdlib-extractor)
MATRIX = [
    (
        "comments_dropped",
        "<p>before</p><!-- secret comment -->   <p>after</p>",
        "before after",
    ),
    (
        "conditional_comment",
        "<p>a</p><!--[if IE]><script>bad()</script><![endif]--><p>b</p>",
        "a b",
    ),
    (
        "cdata_dropped",
        "<p>x</p><![CDATA[ raw <script> stuff ]]><p>y</p>",
        "x y",
    ),
    (
        "unclosed_script_swallows_rest",
        "<p>kept</p><script>var a = '<p>not text</p>';",
        "kept",
    ),
    (
        "unclosed_style",
        "<p>kept</p><style>.x{content:'<b>no</b>'}",
        "kept",
    ),
    (
        "nested_nav_footer",
        "<nav>menu <footer>deep</footer> tail</nav><p>body</p>",
        "body",
    ),
    (
        "repeated_unbalanced_end_tags",
        "</footer></nav><p>fine</p></div>",
        "fine",
    ),
    (
        "misnested_inline",
        "<b>bold <i>both</b> italic</i> plain",
        "bold both italic plain",
    ),
    (
        "entities_decoded",
        "<p>A&amp;B &lt;tag&gt; &#x4e2d;&#25991; &copy;</p>",
        "A&B <tag> 中文 ©",
    ),
    (
        "bogus_entity_passthrough",
        "<p>&notanentity; stays</p>",
        # html.parser (convert_charrefs) resolves the longest valid prefix:
        # &not -> ¬ (a real entity), the rest passes through
        "¬anentity; stays",
    ),
    (
        "meta_is_void_never_swallows",
        '<meta charset="utf-8">visible<meta http-equiv="x">tail',
        "visible tail",
    ),
    (
        "attributes_never_leak",
        '<p title="hidden words" data-x="more">shown</p>',
        "shown",
    ),
    (
        "script_with_lt_in_string",
        "<script>if (a<b) {}</script><p>ok</p>",
        "ok",
    ),
    (
        "noscript_dropped",
        "<noscript><img src=x>enable js</noscript><p>content</p>",
        "content",
    ),
    (
        "header_footer_nav_all_dropped",
        "<header>h</header><p>mid</p><footer>f</footer><nav>n</nav>",
        "mid",
    ),
    (
        "whitespace_and_controls_cleaned",
        "<p>a\x00b</p>\n\n<p>cd</p>",
        # clean_text: \s+ (incl \x0b) -> ' ', control \x00 stripped
        "ab c d",
    ),
    (
        "doctype_and_pi_ignored",
        "<!DOCTYPE html><?php echo 'x'; ?><p>real</p>",
        "real",
    ),
    (
        "case_insensitive_drop_tags",
        "<SCRIPT>x</SCRIPT><P>Kept</P><NAV>menu</NAV>",
        "Kept",
    ),
    (
        "drop_tag_reopened_inside_itself",
        "<script><script>a</script>after</script><p>t</p>",
        # stdlib counts both opens; the two closes rebalance -> 't' kept
        "after t",
    ),
    (
        "empty_and_tagless",
        "just bare text, no tags at all",
        "just bare text, no tags at all",
    ),
]


@pytest.mark.parametrize("name,html,expected", MATRIX, ids=[m[0] for m in MATRIX])
def test_stdlib_extractor_edge_matrix(name, html, expected):
    assert extract_html_text(html) == expected


def test_bytes_input_with_invalid_utf8():
    # errors='ignore' decode contract (main.py:124-128 analog)
    out = extract_html_text(b"<p>ok\xff\xfe</p>")
    assert out == "ok"


def test_huge_flat_document_no_recursion_error():
    html = "<div>" * 5000 + "deep" + "</div>" * 5000
    assert extract_html_text(html) == "deep"


def test_stdlib_matches_bs4_on_edge_matrix(monkeypatch):
    """Byte-parity differential vs the real BeautifulSoup branch — skipped
    where bs4 is absent (this sandbox); a bs4-equipped CI runs both paths
    over the same matrix and fails on ANY divergence, auto-upgrading the
    matrix expectations to verified byte parity."""
    bs4 = pytest.importorskip("bs4")
    # conftest installs a bare bs4 STUB so the reference's clear_redundancy
    # module can be loaded; only a real installation (has __file__ and a
    # callable BeautifulSoup) can run this differential
    if not getattr(bs4, "__file__", None) or not callable(
        getattr(bs4, "BeautifulSoup", None)
    ):
        pytest.skip("bs4 present only as a test stub, not a real install")

    stdlib_out = {}
    monkeypatch.setattr(cleaning, "_HAVE_BS4", False)
    for name, html, _ in MATRIX:
        stdlib_out[name] = extract_html_text(html)

    monkeypatch.setattr(cleaning, "_HAVE_BS4", True)
    monkeypatch.setattr(cleaning, "BeautifulSoup", bs4.BeautifulSoup, raising=False)
    for name, html, _ in MATRIX:
        assert extract_html_text(html) == stdlib_out[name], name
