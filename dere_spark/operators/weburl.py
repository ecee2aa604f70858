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
    config layer, not an identity function)."""
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    # authority = host[:port]; parse_url HOST excludes the port, and Spark
    # has no PORT part — extract an explicit one from the raw authority
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    port = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:(\d+)", 1)
    keep_port = ~(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.parse_url(url, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = F.parse_url(url, F.lit("QUERY"))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            query.isNotNull() & (query != ""), F.concat(F.lit("?"), query)
        ).otherwise(F.lit("")),
    )


def latest_snapshot(pages: DataFrame) -> DataFrame:
    """Keep one row per canonical url: the newest ``warc_ts`` capture.

    Input: the page table ``(url, warc_ts, ...)``.  Output: the same
    columns plus ``canonical_url``, one row per canonical key.  Ties on
    ``warc_ts`` break on raw ``url`` (ascending) so the result is
    deterministic under any shuffle order.  Plan: one hash exchange on
    the canonical key + a row_number window — no join, no broadcast."""
    w = Window.partitionBy("canonical_url").orderBy(
        F.col("warc_ts").desc(), F.col("url").asc()
    )
    return (
        pages.withColumn("canonical_url", canonicalize_url(F.col("url")))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
