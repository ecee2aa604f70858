"""URL canonicalization + re-crawl snapshot dedup for the web page table.

Beyond-reference operators (LLM-data-pipeline family): a Common-Crawl
style corpus re-crawls the same page across snapshots, so the first
corpus-level dedup is URL-level — canonicalize the key, keep the newest
capture.  Content-level dedup (exact / MinHash / SimHash / embedding,
``operators/dedup.py``) runs downstream of this.

Both operators are pure Catalyst expressions / window plans: no UDFs,
one shuffle (the window partition on the canonical key), broadcast-free.
At 100 TB the window partitions by canonical url — cardinality ~page
count, so no skew beyond per-key capture counts (bounded by re-crawl
frequency, typically tens).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def canonicalize_url(url: Column) -> Column:
    """Conservative URL canonical form as a Catalyst expression chain.

    Applied transforms (each safe for identity purposes — no semantics
    change for any RFC 3986-conformant server):

      * scheme and host lowercased (authority is case-insensitive)
      * explicit default ports dropped (``:80`` for http, ``:443`` https)
      * fragment removed (never sent to the server)
      * trailing ``?`` of an empty query removed
      * empty path normalized to ``/``

    Deliberately NOT applied: query-parameter reordering or tracking-param
    stripping (semantics-changing; site-specific policy belongs in a
    config layer, not an identity function).

    Malformed URLs yield NULL (``try_parse_url`` — the plain
    ``parse_url`` THROWS under Spark 4's default ANSI mode, so one bad
    ``WARC-Target-URI`` in a 100 TB crawl would abort the whole job);
    ``latest_snapshot`` falls back to the raw url as the key for such
    rows, so they pass through instead of collapsing into one NULL
    partition."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    # authority taken verbatim, then userinfo stripped; the port is the
    # trailing :digits of the host[:port] remainder — this survives both
    # numeric passwords in userinfo ("user:123@host") and IPv6 bracket
    # literals ("[::1]:8080"), which a naive host-then-colon regex on the
    # full url does not
    authority = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    hostport = F.regexp_replace(authority, r"^.*@", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    host = F.lower(F.regexp_replace(hostport, r":\d+$", ""))
    keep_port = ~(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = F.try_parse_url(url, F.lit("QUERY"))
    return F.when(
        scheme.isNull() | (host == ""),
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(
                query.isNotNull() & (query != ""), F.concat(F.lit("?"), query)
            ).otherwise(F.lit("")),
        )
    )


def latest_snapshot(pages: DataFrame) -> DataFrame:
    """Keep one row per canonical url: the newest ``warc_ts`` capture.

    Input: the page table ``(url, warc_ts, ...)``.  Output: the same
    columns plus ``canonical_url``, one row per canonical key.  Ties on
    ``warc_ts`` break on raw ``url`` (ascending) so the result is
    deterministic under any shuffle order.  Rows whose url does not
    canonicalize (malformed) keep their RAW url as the key — they pass
    through one-per-url instead of all collapsing into a single NULL
    window partition (which would both skew and silently drop them).
    Plan: one hash exchange on the canonical key + a row_number window —
    no join, no broadcast."""
    w = Window.partitionBy("canonical_url").orderBy(
        F.col("warc_ts").desc(), F.col("url").asc()
    )
    return (
        pages.withColumn(
            "canonical_url",
            F.coalesce(canonicalize_url(F.col("url")), F.col("url")),
        )
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
