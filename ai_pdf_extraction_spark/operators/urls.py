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
    # 2. strip tracking params INSIDE the query substring only (review
    #    r5: the old '&'-anywhere form corrupted urls carrying a
    #    literal '&' in the PATH when no '?' preceded it — the very
    #    hazard its comment claimed to avoid). Split on the first '?';
    #    within the query, '[?&]'-prefixed matches are always safe, a
    #    leading '&' left by stripping the first param promotes back
    #    to '?', and a trailing lone '?'/'&' drops.
    qpos2 = F.instr(u, "?")
    path2 = F.when(qpos2 > 0, F.substring(u, F.lit(1), qpos2 - 1)).otherwise(u)
    query2 = (
        F.when(qpos2 > 0, F.substring(u, qpos2, F.length(u)))
        .otherwise(F.lit(""))
    )
    query2 = F.regexp_replace(
        query2, r"(?i)[?&](?:utm_[a-z]+|fbclid|gclid)=[^&#]*", ""
    )
    query2 = F.regexp_replace(query2, r"^&", "?")
    query2 = F.regexp_replace(query2, r"[?&]$", "")
    u = F.concat(path2, query2)
    # 3. lowercase scheme://host (leave path/query case alone)
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1))
    tail = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    u = F.when(head == "", u).otherwise(F.concat(head, tail))
    # 4. default ports (capture-group form: DuckDB's RE2 oracle has no
    #    lookarounds, so keep these patterns lookaround-free)
    u = F.regexp_replace(u, r"^(https://[^/:?]+):443([/?]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/:?]+):80([/?]|$)", r"$1$2")
    # 5. collapse duplicate slashes in the PATH only — the query string
    #    (e.g. a redirect-target param carrying its own url) must stay
    #    byte-identical
    qpos = F.instr(u, "?")
    path = F.when(qpos > 0, F.substring(u, F.lit(1), qpos - 1)).otherwise(u)
    query = F.when(qpos > 0, F.substring(u, qpos, F.length(u))).otherwise(F.lit(""))
    u = F.concat(F.regexp_replace(path, r"([^:/])//+", r"$1/"), query)
    # 6. trailing slash on a non-root path
    u = F.regexp_replace(u, r"(://[^/?]+/[^?]*[^/?])/($|\?)", r"$1$2")
    return u
