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
