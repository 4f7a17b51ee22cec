"""Deterministic HTML -> text extraction (native expressions only).

Per-row invariant (BASELINE.json input_hint): extracted text must be
byte-identical per url, run-to-run and engine-to-engine. So: no HTML
parser library (version drift), no locale-dependent behavior — a fixed
regexp_replace chain that is the exact inverse of the escaping used when
pages are produced:

  escape:  & -> &amp;   < -> &lt;   > -> &gt;
  wrap:    <html><head>...</head><body>TEXT</body></html>

Extraction strips <script>/<style> blocks, strips tags, then unescapes in
the standard order (&lt;/&gt; before &amp; so escaped ampersands never
double-decode). For any page produced by ``escape_html_text``/fixtures,
``extract_text(html) == text`` byte-for-byte (tested).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def escape_html_text(text: Column) -> Column:
    """The canonical escaping used by the synthetic page generator."""
    c = F.regexp_replace(text, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def wrap_html(text: Column, title: Column | None = None) -> Column:
    t = title if title is not None else F.lit("page")
    return F.concat(
        F.lit("<html><head><title>"),
        t,
        F.lit("</title></head><body>"),
        escape_html_text(text),
        F.lit("</body></html>"),
    )


def extract_text(html: Column) -> Column:
    """binary/string html -> extracted text (bytes of the original)."""
    c = html.cast("string")
    # drop script/style/head blocks wholesale ((?s): dot matches newline)
    c = F.regexp_replace(c, r"(?s)<script[^>]*>.*?</script>", "")
    c = F.regexp_replace(c, r"(?s)<style[^>]*>.*?</style>", "")
    c = F.regexp_replace(c, r"(?s)<head[^>]*>.*?</head>", "")
    # strip remaining tags
    c = F.regexp_replace(c, r"<[^>]*>", "")
    # unescape the fixed entity set; &amp; LAST
    c = F.regexp_replace(c, "&lt;", "<")
    c = F.regexp_replace(c, "&gt;", ">")
    return F.regexp_replace(c, "&amp;", "&")
