"""HTML main-content extraction (operators/html_extract.py): tree-aware
boilerplate stripping must round-trip the page template exactly and stay
forgiving on the malformed markup real crawls produce."""

from __future__ import annotations

from lakehouse_loader_spark.operators.html_extract import (
    _PAGE_PREFIX,
    _PAGE_SUFFIX,
    _extract_one,
)


def _page(text: str, title: str = "t") -> str:
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return _PAGE_PREFIX.replace("{T}", title) + esc + _PAGE_SUFFIX


class TestTemplateRoundTrip:
    def test_body_and_title_exact(self):
        text = "hello & <world> \"q\" it's  two  spaces\nnewline\ttab"
        title, body, n_links, _ = _extract_one(_page(text, "doc 7"))
        assert title == "doc 7"
        assert body == text  # byte-exact: whitespace NOT collapsed here
        assert n_links == 2

    def test_empty_text(self):
        title, body, n_links, n_tags = _extract_one(_page(""))
        assert body == ""
        assert n_links == 2
        assert n_tags == 14  # the template constant the oracle pins

    def test_entities_unescaped_once(self):
        # '&amp;lt;' in source must decode to '&lt;' (one level), i.e. the
        # original text '&lt;' survives the escape/unescape round trip
        _, body, _, _ = _extract_one(_page("&lt;"))
        assert body == "&lt;"


class TestBoilerplateStripping:
    def test_script_style_nav_footer_dropped(self):
        doc = (
            "<html><head><script>var x = 'SCRIPT';</script>"
            "<style>.c{color:red}</style></head>"
            "<body><nav>NAV</nav><p>keep me</p><footer>FOOT</footer></body></html>"
        )
        _, body, _, _ = _extract_one(doc)
        assert body == "keep me"

    def test_nested_boilerplate_needs_both_closes(self):
        doc = "<nav><header>deep</header>still nav</nav>after"
        _, body, _, _ = _extract_one(doc)
        assert body == "after"

    def test_title_captured_despite_head_being_boilerplate(self):
        doc = "<head><title>T1</title><meta charset='x'></head><p>b</p>"
        title, body, _, _ = _extract_one(doc)
        assert title == "T1"
        assert body == "b"

    def test_content_inside_main_article_kept(self):
        doc = "<main><article><h1>H</h1><p>para</p></article></main>"
        _, body, _, _ = _extract_one(doc)
        assert body == "Hpara"


class TestMalformedForgiveness:
    def test_stray_end_tags_cannot_unskip(self):
        # </nav></nav> before <head> must not make head content visible
        doc = "</nav></nav><head><script>hidden</script></head><p>ok</p>"
        _, body, _, _ = _extract_one(doc)
        assert body == "ok"

    def test_unclosed_script_swallows_tail(self):
        # script is CDATA: an unclosed one eats the rest — forgiving, no raise
        _, body, _, _ = _extract_one("<p>seen</p><script>var a=1;")
        assert body == "seen"

    def test_void_br_does_not_shift_depth(self):
        doc = "<nav>skip<br></nav><p>a<br/>b</p></br>"
        _, body, _, _ = _extract_one(doc)
        assert body == "ab"

    def test_none_and_garbage(self):
        assert _extract_one(None) == ("", "", 0, 0)
        t, b, nl, nt = _extract_one("<<<>>>&#xx;<a")
        assert isinstance(b, str)  # never raises

    def test_link_count_includes_boilerplate_links(self):
        # n_links is a page-level markup stat, counted everywhere
        doc = "<nav><a href='/'>x</a></nav><p><a href='y'>y</a></p>"
        _, _, n_links, _ = _extract_one(doc)
        assert n_links == 2
