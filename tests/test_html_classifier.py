"""Spec tests for the boilerplate classifier (functions/html.py) — the
north-rule net-new capability. The function doubles as the test oracle for
span-sequence equality, so its behavior is pinned here directly."""

from __future__ import annotations

from index_search_monorepo_spark.functions.html import (
    MAX_LINK_DENSITY,
    MIN_BLOCK_CHARS,
    extract_main_content,
    extract_main_content_batch,
)

CONTENT = "This is a long enough paragraph of real article content to keep."
NAVBAR = '<div><a href="/">Home</a> <a href="/x">About</a> <a href="/y">More</a></div>'


def test_keeps_long_content_drops_link_dense_nav():
    html = f"<html><body>{NAVBAR}<p>{CONTENT}</p></body></html>"
    assert extract_main_content(html) == CONTENT


def test_min_block_chars():
    short = "too short"
    assert len(short) < MIN_BLOCK_CHARS
    assert extract_main_content(f"<p>{short}</p>") == ""
    long_enough = "x" * MIN_BLOCK_CHARS
    assert extract_main_content(f"<p>{long_enough}</p>") == long_enough


def test_link_density_threshold():
    text = "Read the full story here today"  # 30 chars
    linky = f'<p><a href="#">{text[:15]}</a>{text[15:]}</p>'
    # link density 0.5 > MAX_LINK_DENSITY -> dropped
    assert MAX_LINK_DENSITY < 0.5
    assert extract_main_content(linky) == ""
    plain = f"<p>{text}</p>"
    assert extract_main_content(plain) == text


def test_script_style_dropped_and_leaf_blocks_only():
    html = (
        "<div>wrapper stray text that is quite long but not a leaf block"
        f"<p>{CONTENT}</p>"
        f"<script>var boilerplate = '{CONTENT}';</script>"
        f"<style>p {{ color: red }}</style>"
        "</div>"
    )
    assert extract_main_content(html) == CONTENT


def test_multiple_blocks_in_document_order():
    a = "First paragraph with plenty of characters for the threshold."
    b = "Second paragraph also long enough to pass the length check."
    html = f"<article><p>{a}</p><p>{b}</p></article>"
    assert extract_main_content(html) == f"{a} {b}"


def test_never_raises_on_garbage():
    assert extract_main_content("") == ""
    assert extract_main_content("<<<<not html>>>>") == ""
    assert extract_main_content("<p unclosed") == ""
    assert extract_main_content_batch(["", f"<p>{CONTENT}</p>"]) == ["", CONTENT]


def test_whitespace_normalized():
    messy = "Lots   of\n\nwhitespace   inside this long enough block here."
    html = f"<p>Lots   of\n\nwhitespace   inside this long enough block here.</p>"
    want = " ".join(messy.split())
    assert extract_main_content(html) == want


# --------------------------------------------------------- DOM weights (r5)


def test_dom_weights_drop_negative_classes():
    """A long, link-free comment block passes the density rules but must be
    dropped by the class/id tri-state (opt-in)."""
    html = (
        "<p>the genuine article body text is long enough to keep</p>"
        '<div class="comment">this comment thread text is also long enough'
        " to keep by density rules alone</div>"
    )
    from index_search_monorepo_spark.functions.html import (
        extract_main_content,
    )

    assert "comment thread" in extract_main_content(html)
    out = extract_main_content(html, dom_weights=True)
    assert "comment thread" not in out
    assert "genuine article body" in out


def test_dom_weights_negative_propagates_to_children():
    html = (
        '<div class="sidebar"><p>long enough nested sidebar paragraph text'
        " here</p></div>"
        "<p>real content paragraph stays in the output here</p>"
    )
    from index_search_monorepo_spark.functions.html import (
        extract_main_content,
    )

    out = extract_main_content(html, dom_weights=True)
    assert "sidebar" not in out
    assert "real content paragraph" in out


def test_dom_weights_positive_keeps_short_blocks():
    from index_search_monorepo_spark.functions.html import (
        extract_main_content,
    )

    html = '<p class="article-text">short but real</p>'
    assert extract_main_content(html) == ""          # < MIN_BLOCK_CHARS
    assert extract_main_content(html, dom_weights=True) == "short but real"


def test_dom_weights_negative_wins_tie():
    from index_search_monorepo_spark.functions.html import (
        extract_main_content,
    )

    html = '<p class="main-footer">long enough text in an ambiguous box</p>'
    assert extract_main_content(html, dom_weights=True) == ""


def test_dom_weights_off_by_default_is_stable():
    """The flag must not change the default path (existing span goldens)."""
    from index_search_monorepo_spark.functions.html import (
        extract_main_content,
    )

    html = '<div class="comment">long enough comment text to keep here</div>'
    assert extract_main_content(html) == (
        "long enough comment text to keep here"
    )


# ------------------------------------------------------- DOM metadata (r5)


def test_parse_html_metadata_full():
    from index_search_monorepo_spark.functions.html import (
        parse_html_metadata,
    )

    html = (
        '<html lang="de"><head><title> My  Title </title>'
        '<meta name="description" content="a page">'
        '<link rel="canonical" href="/canon">'
        "</head><body>"
        '<a href="/one">first</a>'
        '<a href="two.html">second link</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a>no href</a>'
        "<script>var a = '<a href=\"/fake\">x</a>';</script>"
        "</body></html>"
    )
    m = parse_html_metadata(html, base_uri="http://ex.org/dir/page")
    assert m["title"] == "My Title"
    assert m["lang"] == "de"
    assert m["description"] == "a page"
    assert m["canonical"] == "http://ex.org/canon"
    assert m["links"] == [
        ("http://ex.org/one", "first"),
        ("http://ex.org/dir/two.html", "second link"),
    ]


def test_parse_html_metadata_no_base_keeps_raw_hrefs():
    from index_search_monorepo_spark.functions.html import (
        parse_html_metadata,
    )

    m = parse_html_metadata('<a href="/rel">x</a>')
    assert m["links"] == [("/rel", "x")]
    assert m["title"] is None


def test_parse_html_metadata_never_raises():
    from index_search_monorepo_spark.functions.html import (
        parse_html_metadata,
    )

    for junk in ("", None, "<<<>>>", "<a href='"):
        m = parse_html_metadata(junk or "")
        assert m["links"] == [] and m["title"] is None
