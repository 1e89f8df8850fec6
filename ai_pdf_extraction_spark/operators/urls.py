"""URL canonicalization — the url-keyed half of crawl dedup.

The reference keys everything on ``source_file``/content hash
(``routers/batches.py:381``); a web pipeline additionally needs a
canonical url key before url-level dedup or bucketing. Pure Column
expressions with exact DuckDB-SQL twins (keep in lockstep with the
``q37`` oracle): lowercase scheme+host, drop fragments, strip
tracking params (``utm_*``, ``fbclid``, ``gclid``), drop default
ports, collapse duplicate slashes in the path, trim a trailing slash
from non-root paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(col: Column | str = "url") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # 1. drop fragment
    u = F.regexp_replace(c, r"#.*$", "")
    # 2. strip tracking params (any position), then tidy separators
    u = F.regexp_replace(u, r"(?i)[?&](?:utm_[a-z]+|fbclid|gclid)=[^&#]*", "")
    u = F.regexp_replace(u, r"\?&", "?")
    # stripping '?utm_…' can leave '&q=…' with no '?' — promote the
    # first '&' back to '?'
    u = F.regexp_replace(u, r"^([^?&]+)&", r"$1?")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 3. lowercase scheme://host (leave path/query case alone)
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1))
    tail = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    u = F.when(head == "", u).otherwise(F.concat(head, tail))
    # 4. default ports (capture-group form: DuckDB's RE2 oracle has no
    #    lookarounds, so keep these patterns lookaround-free)
    u = F.regexp_replace(u, r"^(https://[^/:?]+):443([/?]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/:?]+):80([/?]|$)", r"$1$2")
    # 5. collapse duplicate slashes in the path (not the scheme's //)
    u = F.regexp_replace(u, r"([^:/])//+", r"$1/")
    # 6. trailing slash on a non-root path
    u = F.regexp_replace(u, r"(://[^/?]+/[^?]*[^/?])/($|\?)", r"$1$2")
    return u
