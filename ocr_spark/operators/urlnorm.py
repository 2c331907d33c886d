"""URL canonicalization — the crawl-side identity rule for dedup/merge keys.

A Common-Crawl-style pipeline keys everything on the url (icelite merge,
exact dedup, resume); raw crawl urls carry noise that splits one logical
page across keys.  Frozen canonicalization rules (v1), chosen to be
expressible identically in Spark SQL functions and DuckDB (the driver
oracle mirrors them 1:1):

  U1. scheme and host lowercase; default ports stripped (":80" for http,
      ":443" for https).
  U2. the fragment ("#...") is dropped.
  U3. tracking query parameters are dropped: any name starting "utm_",
      plus gclid / fbclid / msclkid (exact).
  U4. surviving query parameters are sorted bytewise (stable canonical
      order); an emptied query drops its "?".
  U5. a trailing "/" on a non-root path is stripped ("/a/b/" -> "/a/b";
      bare "https://h/" -> "https://h/").
  U6. urls with no "scheme://" prefix (scheme-less, relative, or plain
      garbage) pass through UNCHANGED — the component regexes would extract
      empty scheme/host and collapse distinct malformed inputs onto one
      "://..." key, silently merging them under icelite/dedup identity.

Everything is built from regexp / array expressions — whole-stage codegen,
no UDFs, no driver round trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_EXACT = ("gclid", "fbclid", "msclkid")


def canonical_url(col: Column | str) -> Column:
    """The canonical form of a url column (rules U1-U6)."""
    raw = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(raw, r"#.*$", "")  # U2 first: fragments may hold '?'
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(rest == "", F.lit("/")).otherwise(
        # U5: strip ALL trailing slashes (keep a lone "/") — a single-slash
        # strip was non-idempotent: 'a//' and 'a/' canonicalized to
        # DIFFERENT keys, splitting the dedup/merge identity
        F.regexp_replace(rest, r"(.)/+$", "$1")
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(*TRACKING_EXACT),
        )
    )
    qstr = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    # U6 guard: only urls that actually parse as scheme://... canonicalize
    return F.when(
        raw.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"),
        F.concat(scheme, F.lit("://"), host, path, qstr),
    ).otherwise(raw)


def with_canonical_url(df, url_col: str = "url", out_col: str = "canonical_url"):
    return df.withColumn(out_col, canonical_url(url_col))
