"""HTML → text extraction for the pages table's ``html:binary`` column.

The input contract (BASELINE input_hint; reference corpus is
Common-Crawl-shaped) carries BOTH ``html:binary`` and ``text:string``
per page. When only ``html`` is populated — the raw-WARC ingest case —
the engine derives ``text`` itself with this module: a pure Catalyst
``regexp_replace``/``replace`` chain (whole-stage codegen, zero
Python), deliberately restricted to RE2-compatible regex (no
backreferences, no lookaround) so the DuckDB oracle can mirror it
clause for clause.

Extraction rules (the standard tag-strip text pipeline):

1. drop ``<script>``/``<style>``/``<head>`` blocks wholesale
   (case-insensitive, dot-matches-newline, non-greedy) and comments;
2. turn block-closing / line-breaking tags (``<br>``, ``</p>``,
   ``</div>``, ``</li>``, ``</h1..6>``, ``</tr>``) into newlines so
   document line structure survives for the repetition/boilerplate
   operators;
3. strip every remaining tag to a space;
4. decode the frequent entities (&amp; &lt; &gt; &quot; &#39;
   &nbsp;) — a full entity table belongs to a real parser, these six
   cover the overwhelming majority of web text;
5. collapse horizontal whitespace runs, then blank-line runs, then
   trim.

This is the cheap scan-stage path: one projection over 100 TB of WARC
bytes with no Python and no external parser. Pages needing DOM-aware
extraction (tables, boilerplate classifiers) route through an Arrow
UDF instead — the same tiering as the multimodal decode stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) applied in order. RE2-compatible: one
# alternation per block tag instead of a backreferenced close.
_BLOCK_DROP = (
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?is)<head\b[^>]*>.*?</head\s*>",
    r"(?s)<!--.*?-->",
)
_NEWLINE_TAGS = r"(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr)\b[^>]*>"
_ANY_TAG = r"<[^>]+>"
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
)


def html_text_expr(html_col: str = "html") -> Column:
    """Extracted plain text of an ``html:binary`` column (UTF-8)."""
    s = F.decode(F.col(html_col), "UTF-8")
    for pat in _BLOCK_DROP:
        s = F.regexp_replace(s, pat, " ")
    s = F.regexp_replace(s, _NEWLINE_TAGS, "\n")
    s = F.regexp_replace(s, _ANY_TAG, " ")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, r"[ \t\r]+", " ")
    s = F.regexp_replace(s, r" ?\n[ \n]*", "\n")
    # trim() strips spaces only; edge newlines need the regex form
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def with_text_from_html(pages: DataFrame, html_col: str = "html",
                        text_col: str = "text") -> DataFrame:
    """Fill missing/empty ``text`` from ``html`` — the raw-WARC ingest
    adapter in front of the linkage pipeline. Pages that already carry
    extracted text keep it byte-identical (the per-url invariant);
    only null/empty text rows pay the strip chain."""
    have = F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    derived = F.when(have, F.col(text_col)).otherwise(html_text_expr(html_col))
    return pages.withColumn(text_col, derived)
