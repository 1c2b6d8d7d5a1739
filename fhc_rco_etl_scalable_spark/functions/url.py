"""URL canonicalization + dedup (web-corpus ingestion staple).

Every public web-scale corpus pipeline (CommonCrawl processing, C4,
RefinedWeb) dedups on a CANONICAL url key before content dedup:
scheme/host case, default ports, parameter order, and tracking
parameters (utm_*, gclid, fbclid) all vary freely across crawls of the
same resource, so raw-string dedup under-merges badly.

All native string/array expressions (regexp_extract + higher-order
array functions) — JVM-side, codegen-friendly, zero Python, zero
shuffles until the caller aggregates on the canonical key. The DuckDB
oracle twin transcribes the identical steps (harness_queries.py
``url_dedup``).

Canonical form:
  * scheme and host lowercased;
  * an explicit default port dropped (http:80, https:443), any other
    port kept;
  * trailing slashes stripped from the path (''/'/' collapse);
  * query parameters: tracking params removed (``utm_*``, ``gclid``,
    ``fbclid``), the rest sorted bytewise and rejoined; an emptied
    query drops its '?';
  * fragments dropped (never sent to the server).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Param-name pattern treated as tracking noise. Kept deliberately
#: small and public (the adblock-style long lists are maintained data,
#: not engine logic); extend per deployment.
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|gclid|fbclid)="


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1), r"/+$", ""
    )
    # Strip the fragment BEFORE extracting the query: a '?' whose first
    # appearance is inside the fragment (http://h/p#a?b=1) is fragment
    # text, not a query, and must vanish with it (ADVICE r8 #2).
    defrag = F.regexp_replace(u, r"#.*$", "")
    qs = F.regexp_extract(defrag, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, portpart, path, qpart)


def url_dedup(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """Exact dedup on the canonical URL key: one row per canonical
    URL with the cluster size and the kept representative (min id —
    deterministic). One map-side canonicalization + one groupBy on a
    high-cardinality key; at 100 TB this is the cheapest dedup pass in
    the pipeline and runs before any content hashing."""
    return (
        df.select(
            F.col(id_col).alias("__id"),
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min("__id").alias("keep_id"),
        )
    )
