"""Boilerplate removal: html -> main-content text via block text density.

Beyond-reference operator (LLM-data-pipeline family): training-data
curation over a Common-Crawl-style corpus needs more than tag stripping —
navigation bars, headers, footers and link farms dominate raw page text,
and the classic fix (Kohlschuetter et al., "Boilerplate Detection using
Shallow Text Features", WSDM 2010; the same signals CCNet/trafilatura
gate on) is block-level text density: split the page into block-element
segments, keep the ones whose visible text is long and link-poor.

This module re-expresses that heuristic as pure Catalyst expressions —
regexp chains plus higher-order array functions (``transform`` /
``filter`` / ``array_join``). No Python, no UDF, and NO shuffle: the
whole operator is a per-row projection that rides the ingest scan inside
whole-stage codegen, which is the cheapest possible shape at 100 TB
(``tests/test_boilerplate.py`` pins the no-Exchange plan).

Known limits (documented, deliberate): same-tag NESTED boilerplate
subtrees (``<nav>..<nav>..</nav>..</nav>``) strip only to the first
closing tag — the non-greedy regex cannot count braces, and real chrome
virtually never nests the same landmark element; unclosed landmark
elements fall through to the block scorer, which is exactly the fallback
you want (their link-dense content still gets density-dropped).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from dere_spark.sources.warc import decode_entities

#: subtrees that are chrome by construction — dropped wholesale before
#: block scoring (head/title/script/style never render as content;
#: nav/header/footer/aside/form are the landmark boilerplate elements)
_DROP_TAGS = (
    "script", "style", "noscript", "head", "nav", "header", "footer",
    "aside", "form", "select", "button", "svg",
)
_SUBTREE_RE = r"(?is)<(" + "|".join(_DROP_TAGS) + r")\b[^>]*>.*?</\1\s*>"

#: block-level boundaries: each occurrence cuts the page into a new
#: scoring segment (inline tags — a, b, em, span, ... — stay inside the
#: block so anchor text can be measured against its surrounding text)
_BLOCK_RE = (
    r"(?i)</?(p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|"
    r"section|article|main|blockquote|pre|figure|figcaption|br|hr|body|html)"
    r"\b[^>]*>"
)

_ANCHOR_TEXT_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def _clean(fragment: Column) -> Column:
    """Visible text of an html fragment: strip remaining (inline) tags,
    decode the common entities, collapse whitespace, trim."""
    text = F.regexp_replace(fragment, r"(?s)<[^>]*>", " ")
    text = decode_entities(text)
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def extract_main_text(
    html: Column,
    min_block_chars: int = 25,
    max_link_density: float = 0.5,
) -> Column:
    """Main-content text of one html page as a Catalyst expression.

    A block survives when its visible text has at least
    ``min_block_chars`` characters AND its anchor-text share (link
    density — the fraction of visible characters that sit inside
    ``<a>..</a>``) is at most ``max_link_density``. Surviving blocks are
    joined with newlines in document order.

    Thresholds follow the shallow-text-features defaults: short blocks
    are chrome regardless of density (copyright lines, breadcrumbs), and
    long-but-link-dense blocks are link farms / menus. Both are explicit
    parameters because curation pipelines tune them per corpus.
    """
    if min_block_chars < 1:
        raise ValueError(f"min_block_chars must be >= 1, got {min_block_chars}")
    if not 0 <= max_link_density <= 1:
        raise ValueError(
            f"max_link_density must be in [0,1], got {max_link_density}"
        )
    raw = html.cast("string")
    # crawl payloads routinely carry stray NUL bytes; neutralize them
    # FIRST so the block sentinel below is guaranteed absent (an embedded
    # NUL must not split a content block mid-text and length-drop it)
    raw = F.replace(raw, F.lit("\x00"), F.lit(" "))
    raw = F.regexp_replace(raw, r"(?s)<!--.*?-->", " ")
    raw = F.regexp_replace(raw, _SUBTREE_RE, " ")
    blocks = F.split(F.regexp_replace(raw, _BLOCK_RE, "\x00"), "\x00")
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            _clean(b).alias("text"),
            F.length(
                _clean(
                    F.array_join(
                        F.regexp_extract_all(b, F.lit(_ANCHOR_TEXT_RE), F.lit(1)),
                        " ",
                    )
                )
            ).alias("link_n"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["text"]) >= F.lit(int(min_block_chars)))
        & (
            s["link_n"].cast("double")
            <= F.lit(float(max_link_density)) * F.length(s["text"]).cast("double")
        ),
    )
    return F.array_join(F.transform(kept, lambda s: s["text"]), "\n")


def page_main_text(
    pages: DataFrame,
    min_block_chars: int = 25,
    max_link_density: float = 0.5,
) -> DataFrame:
    """Page table ``(url, html, ...)`` -> ``(url, main_text)``.

    Derived column only — the ``text`` column (byte-identical extracted
    text per url, the hard invariant) is never touched; ``main_text`` is
    the curation view of the same page."""
    return pages.select(
        "url",
        extract_main_text(
            F.col("html"),
            min_block_chars=min_block_chars,
            max_link_density=max_link_density,
        ).alias("main_text"),
    )
