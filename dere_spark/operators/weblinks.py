"""Outlink extraction: html -> (src_url, dst_url, anchor) edge table.

Beyond-reference operator (LLM-data-pipeline family): the web link graph
is the third classic Common-Crawl product (pages, text, links) and the
natural input to the engine's graph family (connected components over
hosts, shortest paths, degree stats).

Pure Catalyst: ``regexp_extract_all`` pulls every anchor tag's href and
inner text in two aligned passes (same regex, different capture group —
match counts are identical by construction, so ``arrays_zip`` cannot
misalign), URL resolution is an expression ``CASE`` over the reference
forms, and the result explodes to one row per link.  No UDFs, no
shuffle — extraction is map-side; downstream graph ops repartition on
their own keys.

Relative-reference handling (RFC 3986 §4.2), deliberately conservative:
absolute ``http(s)://``, protocol-relative ``//host/...`` and
root-relative ``/path`` are resolved exactly; path-relative references
are resolved against the source's directory WITHOUT ``..`` collapsing
(dot-segment normalization needs a loop Catalyst can't express cheaply;
the raw form is still a stable graph key).  Non-navigational schemes
(``javascript:``, ``mailto:``, ``tel:``, ``data:``) and pure fragments
are dropped.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_ANCHOR_RE = r"(?is)<a\b[^>]*?href\s*=\s*[\"']([^\"'>]*)[\"'][^>]*>(.*?)</a>"


def _strip_fragment(ref: Column) -> Column:
    return F.regexp_replace(ref, r"#.*$", "")


def resolve_href(src: Column, ref: Column) -> Column:
    """Resolve one href reference against its source page URL.

    Returns NULL for references that are not navigable page links
    (non-http schemes, empty/fragment-only refs) and for references that
    need a source context a malformed ``src`` cannot provide
    (``try_parse_url`` — plain ``parse_url`` throws under Spark 4's
    default ANSI mode, and real crawl HTML guarantees malformed URLs)."""
    ref = _strip_fragment(F.trim(ref))
    scheme = F.lower(F.try_parse_url(src, F.lit("PROTOCOL")))
    # authority incl. any explicit port, taken verbatim from the source
    authority = F.regexp_extract(src, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    origin = F.concat(scheme, F.lit("://"), authority)
    src_path = F.try_parse_url(src, F.lit("PATH"))
    src_full_path = F.when(
        src_path.isNull() | (src_path == ""), F.lit("/")
    ).otherwise(src_path)
    src_dir = F.when(
        src_path.isNull() | ~src_path.contains("/"), F.lit("/")
    ).otherwise(F.regexp_replace(src_path, r"[^/]*$", ""))
    return (
        F.when(ref == "", F.lit(None).cast("string"))
        .when(F.lower(ref).rlike(r"^https?://"), ref)
        .when(ref.startswith("//"), F.concat(scheme, F.lit(":"), ref))
        # any other explicit scheme (javascript:, mailto:, data:, ...) is
        # non-navigational — the colon test must follow the http(s) branch
        .when(ref.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:"), F.lit(None).cast("string"))
        # query-only reference: RFC 3986 §5.3 keeps the source's full path
        .when(ref.startswith("?"), F.concat(origin, src_full_path, ref))
        .when(ref.startswith("/"), F.concat(origin, ref))
        .otherwise(F.concat(origin, src_dir, ref))
    )


def extract_links(pages: DataFrame) -> DataFrame:
    """Page table ``(url, html, ...)`` -> link edges
    ``(src_url, dst_url, anchor)``.

    ``anchor`` is the anchor element's inner text with nested tags
    stripped and whitespace collapsed.  Rows whose href does not resolve
    to a page URL are dropped.  One output row per anchor occurrence —
    duplicate edges are kept (multiplicity is signal; ``.distinct()`` is
    the caller's one-line policy decision)."""
    html_str = F.col("html").cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html_str, F.lit(_ANCHOR_RE), F.lit(1)).alias("href"),
        F.regexp_extract_all(html_str, F.lit(_ANCHOR_RE), F.lit(2)).alias("raw_anchor"),
    )
    exploded = pages.select(
        F.col("url").alias("src_url"), F.explode(pairs).alias("link")
    )
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("link.raw_anchor"), r"(?s)<[^>]*>", " "),
            r"\s+",
            " ",
        )
    )
    return (
        exploded.select(
            "src_url",
            resolve_href(F.col("src_url"), F.col("link.href")).alias("dst_url"),
            anchor.alias("anchor"),
        )
        .where(F.col("dst_url").isNotNull())
    )


def host_edges(links: DataFrame) -> DataFrame:
    """Collapse link edges to distinct host-level edges
    ``(src_host, dst_host)`` — the input shape for the engine's
    connected-components / graph family at web scale (host graph is
    ~3 orders of magnitude smaller than the page graph)."""
    return (
        links.select(
            F.lower(F.try_parse_url(F.col("src_url"), F.lit("HOST"))).alias(
                "src_host"
            ),
            F.lower(F.try_parse_url(F.col("dst_url"), F.lit("HOST"))).alias(
                "dst_host"
            ),
        )
        .where(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
        .where(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )
