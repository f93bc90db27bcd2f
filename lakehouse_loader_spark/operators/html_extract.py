"""HTML main-content extraction — the ingest stage of a web-crawl training
pipeline (Common Crawl WARC/HTML → clean text).

The extractor is a stdlib ``html.parser`` boilerplate stripper in the
jusText/trafilatura family: tag-tree aware (not regex), it drops everything
under boilerplate elements (``script``/``style``/``nav``/``header``/
``footer``/``aside``/``form``/``noscript``/``iframe``/``head``), keeps text
under content elements, captures ``<title>`` separately, and counts links.

Spark shape: one Arrow-batched ``pandas_udf`` returning a struct — the only
stage here that genuinely cannot be a JVM built-in (HTML is not a regular
language; real crawl markup is malformed and needs a forgiving tree parser).
Everything around it (escaping, wrapping, ratios) stays JVM-side.  At 100 TB
the UDF is map-side, per-row, stateless — no shuffle, scales with executors.

Reference parity: the reference has no HTML stage (it delegates queries to
Postgres, src/lib.rs:39-40); this is part of the training-data extension
surface the build adds on top.
"""

from __future__ import annotations

from html.parser import HTMLParser
from io import StringIO

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Elements whose whole subtree is boilerplate for training-data purposes.
# <head> is in the set; <title> inside it is still captured via its own flag.
BOILERPLATE_TAGS = frozenset(
    {"script", "style", "nav", "header", "footer", "aside",
     "form", "noscript", "iframe", "head", "template", "svg"}
)

# Void elements never emit an end tag, so they must not touch the
# boilerplate depth counter even if someone writes </br>.
_VOID = frozenset(
    {"br", "img", "hr", "meta", "link", "input", "area", "base",
     "col", "embed", "source", "track", "wbr"}
)


class _Extractor(HTMLParser):
    """Forgiving single-pass extractor.  Depth-counted skipping (not a tag
    stack) keeps it robust to the mismatched tags real crawls are full of;
    the counter is clamped at 0 so a stray </nav> cannot un-skip <head>."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.skip = 0
        self.in_title = False
        self.title = StringIO()
        self.body = StringIO()
        self.n_links = 0
        self.n_tags = 0

    def handle_starttag(self, tag, attrs):  # noqa: D102
        self.n_tags += 1
        if tag == "a":
            self.n_links += 1
        if tag == "title":
            self.in_title = True
        if tag in BOILERPLATE_TAGS and tag not in _VOID:
            self.skip += 1

    def handle_endtag(self, tag):  # noqa: D102
        if tag == "title":
            self.in_title = False
        if tag in BOILERPLATE_TAGS and tag not in _VOID:
            self.skip = max(0, self.skip - 1)

    def handle_data(self, data):  # noqa: D102
        if self.in_title:
            self.title.write(data)
        elif self.skip == 0:
            self.body.write(data)


def _extract_one(doc: str) -> tuple:
    """Never-raise extraction of (title, body, n_links, n_tags)."""
    p = _Extractor()
    try:
        p.feed(doc or "")
        p.close()
    except Exception:  # malformed beyond recovery: salvage what was parsed
        pass
    return p.title.getvalue(), p.body.getvalue(), p.n_links, p.n_tags


_RESULT_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("n_links", T.IntegerType()),
        T.StructField("n_tags", T.IntegerType()),
    ]
)


def escape_html_col(text: Column) -> Column:
    """JVM-side minimal HTML escaping (&, <, > — the three that change
    parsing).  Order matters: & first, or the later entities double-escape."""
    out = F.replace(text, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


# The deterministic page template used by the self-certifying query: content
# inside <main><p>, one nav with two links, plus the script/style/footer
# noise a real page carries.  No inter-tag whitespace in content scope, so
# extracted body ≡ the escaped-then-unescaped text, i.e. the original text.
_PAGE_PREFIX = (
    '<html><head><title>{T}</title><style>p{m:0}</style>'
    "<script>var a=1;</script></head><body><header>"
    '<nav><a href="/">home</a><a href="/about">about</a></nav>'
    "</header><main><p>"
)
_PAGE_SUFFIX = "</p></main><footer><p>&copy; example</p></footer></body></html>"


def wrap_page_col(text: Column, title: Column) -> Column:
    """Build the deterministic page around escaped ``text`` (JVM concat)."""
    pre_a, pre_b = _PAGE_PREFIX.split("{T}")
    return F.concat(
        F.lit(pre_a), escape_html_col(title), F.lit(pre_b),
        escape_html_col(text), F.lit(_PAGE_SUFFIX),
    )


def extract_html(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add ``title`` / ``body`` / ``n_links`` / ``n_tags`` extracted from
    ``html_col``.  Arrow-batched struct-returning pandas UDF; map-side."""

    @F.pandas_udf(_RESULT_TYPE)
    def _extract(s: pd.Series) -> pd.DataFrame:
        rows = [_extract_one(v) for v in s]
        return pd.DataFrame(rows, columns=["title", "body", "n_links", "n_tags"])

    ex = F.col("_ex")
    return (
        df.withColumn("_ex", _extract(F.col(html_col)))
        .withColumns(
            {
                "title": ex["title"],
                "body": ex["body"],
                "n_links": ex["n_links"],
                "n_tags": ex["n_tags"],
            }
        )
        .drop("_ex")
    )
