"""HTML → text extraction, the WARC-adjacent curation step.

A real 100 TB pretraining pipeline ingests WARC archives whose HTTP
bodies are HTML (sources/warc.py is the ingest half — this is the
other half: boilerplate-stripped text the quality/dedup/tokenizer
operators downstream consume).  The reference engine has no text
surface at all (SURVEY.md §2 extensions); trafilatura/jusText are the
full-strength readability answers, but their scoring needs a DOM —
this operator is the regex tier those pipelines use at scan time:
linear, allocation-light, and fully inside Spark codegen.

Everything is chained ``regexp_replace``/``regexp_extract`` built-ins
— zero Python, zero shuffles, whole-stage codegen per row, scan-
parallel at any scale.  Patterns are written in the common subset of
Java regex and RE2 (inline ``(?is)`` flags, non-greedy spans, no
backrefs) so the identical chain runs as a DuckDB oracle.

Fidelity notes (the honest limits of the regex tier): CDATA sections
and SGML processing instructions are treated as tags; a literal ``<``
in text that parses like a tag open is stripped (real HTML escapes it
as ``&lt;``); entity decoding covers the core named set + numeric
references for ASCII, not the full HTML5 table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tags whose CONTENT is boilerplate/noise — dropped wholesale.
#: ``head`` first (title/meta/style live there; the ``\b`` in the
#: pattern keeps it from eating ``<header>``, dropped on its own).
_DROP_CONTENT = ("head", "script", "style", "noscript", "nav",
                 "footer", "header", "aside")

#: Block-level closers that become line breaks so words from adjacent
#: blocks don't fuse ("...end.Next title" → "...end.\nNext title").
_BLOCK_BREAK = r"(?i)</(?:p|div|h[1-6]|li|tr|td|th|table|ul|ol|" \
               r"blockquote|section|article)>|<br\b[^>]*>"

#: Core named entities, decoded in this order (&amp; LAST, so
#: "&amp;lt;" decodes to the literal text "&lt;", not to "<").
ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
            ("&amp;", "&"))


def strip_html(col: Column) -> Column:
    """The text of an HTML column: drop script/style/nav-class
    element content and comments, break at block boundaries, strip
    tags, decode core entities, collapse whitespace."""
    out = col
    for tag in _DROP_CONTENT:
        out = F.regexp_replace(
            out, f"(?is)<{tag}\\b[^>]*>.*?</{tag}>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, _BLOCK_BREAK, "\n")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    # horizontal runs → one space; then trim around line breaks;
    # then squeeze blank lines; then trim the ends
    out = F.regexp_replace(out, "[ \\t\\x0b\\f\\r]+", " ")
    out = F.regexp_replace(out, " ?\\n ?", "\n")
    out = F.regexp_replace(out, "\\n{2,}", "\n")
    return F.regexp_replace(out, "^[\\n ]+|[\\n ]+$", "")


def escape_html_text(col: Column) -> Column:
    """Escape text for embedding into HTML (& first, then < >) — the
    inverse of the entity decode above for round-trip fixtures."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def extract_html_text(df: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id",
                      keep: tuple[str, ...] = ()) -> DataFrame:
    """Per-document extraction: ``(id, title, text, n_links,
    n_words)`` (+``keep`` pass-through).  ``title`` is the first
    ``<title>`` element's decoded text; ``n_links`` counts anchor
    opens in the RAW html (nav links included — it is a boilerplate
    signal, like jusText's link density)."""
    html = F.col(html_col)
    title = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, ch in ENTITIES:
        title = F.replace(title, F.lit(ent), F.lit(ch))
    text = strip_html(html)
    n_words = F.size(F.filter(
        F.split(text, "[ \\t\\n\\x0b\\f\\r]+"),
        lambda w: w != "")).cast("int")
    return df.select(
        F.col(id_col),
        F.trim(title).alias("title"),
        text.alias("text"),
        F.regexp_count(html, F.lit(r"(?i)<a\b")).cast("int")
         .alias("n_links"),
        n_words.alias("n_words"),
        *[F.col(c) for c in keep])


def oracle_strip_html_sql(expr: str) -> str:
    """The DuckDB rendering of :func:`strip_html` over SQL expression
    ``expr`` — the same pattern chain with RE2 global flags, kept
    adjacent to the Spark chain so they evolve together."""
    out = expr
    for tag in _DROP_CONTENT:
        out = (f"regexp_replace({out}, "
               f"'(?is)<{tag}\\b[^>]*>.*?</{tag}>', ' ', 'g')")
    out = f"regexp_replace({out}, '(?s)<!--.*?-->', ' ', 'g')"
    block = _BLOCK_BREAK.replace("'", "''")
    out = f"regexp_replace({out}, '{block}', chr(10), 'g')"
    out = f"regexp_replace({out}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, ch in ENTITIES:
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    out = f"regexp_replace({out}, '[ \\t\\x0b\\f\\r]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n{{2,}}', chr(10), 'g')"
    return f"regexp_replace({out}, '^[\\n ]+|[\\n ]+$', '', 'g')"
