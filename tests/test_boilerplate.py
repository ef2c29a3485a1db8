"""Unit tests for kernels/boilerplate.py (main-content extraction)."""

from img2table_spark.kernels.boilerplate import _blocks, extract_main_text


PAGE = (
    "<html><body>"
    '<nav><a href="/">home</a> <a href="/about">about</a> '
    '<a href="/contact">contact</a> <a href="/login">login</a></nav>'
    "<article><p>the quick brown fox jumps over the lazy dog again and again</p>"
    "<p>short</p>"
    "<p>a second long paragraph of honest prose content for the extractor</p></article>"
    "<footer>copyright 2026 example corp "
    '<a href="/privacy">privacy</a> <a href="/terms">terms</a> '
    '<a href="/sitemap">sitemap</a> <a href="/careers">careers</a></footer>'
    "</body></html>"
)


def test_extracts_content_drops_boilerplate():
    out = extract_main_text(PAGE)
    assert out == (
        "the quick brown fox jumps over the lazy dog again and again\n"
        "a second long paragraph of honest prose content for the extractor"
    )


def test_short_blocks_dropped():
    assert "short" not in extract_main_text(PAGE)


def test_link_density_cut():
    # Block long enough to clear the length floor but link-dominated.
    html = '<div><a href="x">all of this text lives inside one anchor tag</a></div>'
    assert extract_main_text(html) == ""


def test_script_style_invisible():
    html = (
        "<div>real content paragraph long enough to keep here</div>"
        "<script>var x = 'not content at all but quite long indeed';</script>"
        "<style>.c { color: red; } .d { margin: 0 auto; }</style>"
    )
    assert extract_main_text(html) == "real content paragraph long enough to keep here"


def test_whitespace_normalized():
    html = "<p>  spaced\n\n   out   content   that is long enough to keep  </p>"
    assert extract_main_text(html) == "spaced out content that is long enough to keep"


def test_blocks_link_char_accounting():
    html = '<p>abc <a href="#">link</a> def</p>'
    [(text, link_chars)] = _blocks(html)
    assert text == "abc link def"
    assert link_chars == 4


def test_tail_text_without_close():
    html = "<p>block one is long enough to be kept</p>trailing prose tail also long enough"
    out = extract_main_text(html)
    assert "block one is long enough to be kept" in out
    assert "trailing prose tail also long enough" in out


def test_attribute_with_gt_inside_quotes():
    html = '<p><img alt="a > b">content paragraph long enough to keep</p>'
    assert extract_main_text(html) == "content paragraph long enough to keep"
