"""HTML -> text extraction: the front of the web-scale build pipeline.

The input-table contract (BASELINE.json input_hint) is Common-Crawl-style
pages with `html:binary` and the invariant "byte-identical extracted text
per url". This module is the deterministic extractor that produces that
text column:

1. decode utf-8 (errors -> U+FFFD, deterministic)
2. drop comments, <head>...</head> (incl. <title>/<style> metadata),
   <script>/<style> elements with their contents
3. every remaining tag becomes a single space (block separator)
4. unescape the fixed named-entity set (&nbsp; &lt; &gt; &quot; &#39;
   &apos;, with &amp; LAST so double-escapes don't cascade)
5. collapse [ \\t\\r\\n\\f\\v]+ runs to one space and strip the ends

Everything is vectorized pandas .str regex (C speed) inside Arrow
batches — no per-row Python in the Spark path. The same pandas kernel is
the single source of truth for tests, the Spark operator, and the DuckDB
oracle (which replays the identical regex chain in SQL).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_HEAD_RE = re.compile(r"(?is)<head\b.*?</head\s*>")
_SCRIPT_RE = re.compile(r"(?is)<script\b.*?</script\s*>")
_STYLE_RE = re.compile(r"(?is)<style\b.*?</style\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")

# order matters: &amp; must be unescaped LAST
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def extract_text(html: bytes | str) -> str:
    """Single-value extraction (the reference semantics, scalar form)."""
    return extract_text_series(pd.Series([html])).iloc[0]


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a pandas Series of bytes/str."""
    s = html.map(
        lambda b: b.decode("utf-8", "replace")
        if isinstance(b, (bytes, bytearray))
        else ("" if b is None else str(b))
    )
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_HEAD_RE, " ", regex=True)
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_STYLE_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for k, v in _ENTITIES:
        s = s.str.replace(k, v, regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s


def html_to_text(
    df: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    """Spark operator: add/replace text_col with the extraction of
    html_col. mapInPandas keeps the whole batch columnar (Arrow in,
    vectorized regex, Arrow out); at cluster scale it is a map-only stage
    with no shuffle, so it composes with any downstream partitioning."""
    out_fields = [f for f in df.schema.fields if f.name != text_col]
    schema = T.StructType(out_fields + [T.StructField(text_col, T.StringType(), True)])
    cols = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[text_col] = extract_text_series(pdf[html_col])
            yield out

    return df.mapInPandas(run, schema=schema)


# Rich synthetic page wrapper used by the webtext generator: extraction of
# wrap_html_text(text) is byte-identical to text (tested), while giving
# the extractor real work (head/title/style/script/comment + nested tags).
def wrap_html_text(text: str) -> str:
    words = text.split(" ")
    title = " ".join(words[:3])
    a = " ".join(words[:5])
    b = " ".join(words[5:20])
    c = " ".join(words[20:])
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        "<style>p { color: #333; }</style>"
        '<meta charset="utf-8"></head>'
        "<body><!-- header boilerplate -->"
        f"<h1>{a}</h1>\n<p>{b}</p>"
        '<script type="text/javascript">var n = 1 < 2;</script>'
        f"<div><p>{c}</p></div></body></html>"
    )
