"""robots.txt politeness — parse + apply, the admission-control half
of the crawl stack.

The reference admits documents by content checks at upload time
(``routers/batches.py``); a crawler must additionally honor each
origin's published exclusion rules BEFORE fetching, the same
decide-before-the-fetch shape as ``urls.url_frontier_delta``. This
module implements the original REP prefix subset of RFC 9309:

* only ``User-agent: *`` groups apply (consecutive ``User-agent``
  lines form one group; rules before any group header are ignored);
* ``Disallow:``/``Allow:`` values are literal path prefixes —
  ``$``/``*`` wildcards are a documented downscope (they need a
  regex-compile per rule; the prefix form covers the vast majority
  of real files and keeps the apply step a pure equality compare);
* an empty ``Disallow:`` value is "allow all" (no rule emitted);
* decision per url: the LONGEST matching rule wins, allow wins ties
  (RFC 9309 §2.2.2), no matching rule ⇒ allowed.

Everything is exact string/integer work — no floats anywhere — so
the Spark plan and the DuckDB oracle agree bit-for-bit.

Scale shape: parsing windows partition by *host* (a robots file is a
few KB — per-host line counts are tiny, and host cardinality gives
the shuffle its parallelism). The apply step is a broadcast join of
the frontier against the per-host rule table (rules for a frontier's
hosts are politeness metadata, orders of magnitude smaller than the
frontier) followed by ONE partial-agg groupBy computing two
conditional maxes — the longest-match tie-break is algebra over
``max(len) filter (allow)`` vs ``max(len) filter (disallow)``, so no
per-url window and no second shuffle of the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ai_pdf_extraction_spark.operators.urls import host_of, strip_authority

# [ \t]* not \s*: Java regex \s includes \x0B (vertical tab) while
# RE2's does not, so identical-LOOKING oracle text would diverge on a
# \x0B byte mid-line (the q97 divergence class)
_UA_RE = r"(?i)^user-agent[ \t]*:"
_RULE_RE = r"(?i)^(dis)?allow[ \t]*:"


def _strip(c) -> F.Column:
    """Strip spaces, tabs AND carriage returns — real robots.txt files
    are routinely CRLF, and ``F.trim`` is space-only: a surviving
    ``\r`` would fail the ``== '*'`` star check and make every rule
    prefix end in ``\r`` (never prefix-matching anything), silently
    ignoring the whole file."""
    return F.regexp_replace(c, r"^[ \t\r]+|[ \t\r]+$", "")


# value tails use ([^\r\n]*), never (.*)$: Java's dot excludes \r
# while RE2's matches it, and Java's $ cannot anchor before an
# interior \r — an explicit class is the only spelling with one
# meaning in both engines (review r7, third pass)
def _star_grouped_lines(
    robots: DataFrame, host_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared parse front half: robots bodies → ``grouped`` lines
    ``(host, body, pos, l, is_ua, grp)`` + the ``(host, body, grp)``
    set of groups containing the ``*`` agent. Used by
    :func:`parse_robots` (Allow/Disallow) and
    :func:`parse_crawl_delays` (Crawl-delay)."""
    # any distinct per-row label works: the body id only keeps line
    # numbering separated per document and never reaches the output,
    # so the union of rules is deterministic. It MUST be projected in
    # its own step BEFORE the explode — inlined next to posexplode it
    # would be evaluated per exploded LINE, giving every line its own
    # "body" (Catalyst keeps the boundary: it never collapses projects
    # across a nondeterministic expression).
    bodies = robots.select(
        F.col(host_col).alias("host"),
        F.monotonically_increasing_id().alias("body"),
        F.col(text_col).alias("_txt"),
    )
    lines = (
        bodies.select(
            "host",
            "body",
            F.posexplode(F.split("_txt", "\n")).alias("pos", "raw"),
        )
        # comments run from '#' to end-of-line (REP)
        .select(
            "host",
            "body",
            "pos",
            _strip(F.regexp_replace("raw", r"#.*$", "")).alias("l"),
        )
    )
    w = Window.partitionBy("host", "body").orderBy("pos")
    is_ua = F.col("l").rlike(_UA_RE)
    marked = lines.select(
        "host",
        "body",
        "pos",
        "l",
        is_ua.alias("is_ua"),
        F.coalesce(F.lag(is_ua, 1).over(w), F.lit(False)).alias("prev_ua"),
    )
    grouped = marked.withColumn(
        "grp",
        F.sum(
            F.when(F.col("is_ua") & ~F.col("prev_ua"), 1).otherwise(0)
        ).over(w),
    )
    star_groups = (
        grouped.filter(
            F.col("is_ua")
            & (
                _strip(F.regexp_extract("l", _UA_RE + r"([^\r\n]*)", 1)) == "*"
            )
        )
        .select("host", "body", "grp")
        .distinct()
    )
    return grouped, star_groups


def prepare_robots_lines(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> tuple[DataFrame, DataFrame]:
    """Compute the shared grouped-lines front half ONCE and persist
    it, for callers running several tail parsers over the same bodies
    (``jobs/frontier_job.py`` feeds both :func:`parse_robots` and
    :func:`parse_crawl_delays`) — without this each tail re-scans the
    robots relation and re-executes the split → posexplode → window
    grouping. Pass the result as ``prepared=``; the caller owns the
    persist (unpersist ``result[0]`` when done, or let the job end)."""
    grouped, star_groups = _star_grouped_lines(robots, host_col, text_col)
    return grouped.persist(), star_groups


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    prepared: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Parse per-host robots.txt bodies into the rule relation
    ``(host, prefix, is_allow, prefix_len)`` for ``User-agent: *``
    groups (semantics in the module docstring).

    Pure Column work: split → posexplode → comment-strip → group
    lines into UA blocks with a running sum over a per-(host, body)
    window (a new group starts at a ``User-agent`` line whose
    predecessor is not one — RFC 9309's consecutive-UA-lines-one-group
    rule), then keep rules from groups containing the ``*`` agent.

    Lines strip spaces/tabs/CR on both sides (CRLF bodies parse
    identically to LF). A host appearing in SEVERAL input rows (e.g.
    re-fetched robots appended to the relation) contributes the UNION
    of each body's star-group rules: grouping windows partition by
    (host, body) — a host-only partition would interleave the two
    bodies' equal line numbers nondeterministically."""
    grouped, star_groups = prepared or _star_grouped_lines(
        robots, host_col, text_col
    )
    rules = grouped.filter(
        F.col("l").rlike(_RULE_RE) & (F.col("grp") > 0)
    ).select(
        "host",
        "body",
        "grp",
        (~F.col("l").rlike(r"(?i)^disallow")).alias("is_allow"),
        _strip(F.regexp_extract("l", _RULE_RE + r"([^\r\n]*)", 2)).alias(
            "prefix"
        ),
    )
    return (
        rules.join(star_groups, ["host", "body", "grp"], "leftsemi")
        .filter(F.col("prefix") != "")
        .select(
            "host",
            "prefix",
            "is_allow",
            F.length("prefix").cast("long").alias("prefix_len"),
        )
        .distinct()
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Admission-check a url relation against :func:`parse_robots`
    rules. Output: the input's columns plus ``(host,
    robots_allow_len, robots_dis_len, robots_allowed)`` — the two
    lengths are the longest matching allow/disallow prefixes (−1 if
    none) and ``robots_allowed = allow_len >= dis_len`` (longest
    match wins, allow wins ties, no match ⇒ allowed: −1 ≥ −1).

    The match target is everything after the authority (path+query,
    ``/`` when empty); prefix matching is an exact ``substr``
    compare — no LIKE, so rule text containing ``%``/``_`` needs no
    escaping and the semantics are byte-literal in both engines.

    Scale shape: the match leg runs over a NARROW (url, target, host)
    projection — broadcast-join it with the rules (politeness metadata
    is tiny; ``broadcast_rules=False`` falls back to a plain
    AQE-skew-safe equi-join keyed by host), keep only rows whose
    target actually starts with the rule prefix, and partial-agg the
    two conditional maxes per url. The decision then joins back to
    the input on the url key, so the input's own columns never enter
    an aggregation: a groupBy-over-every-input-column variant would
    splice the caller's full expression tree into each grouping key —
    composed plans (q88) ballooned to MB-scale generated code that
    way. Join-back also means duplicate input rows pass through
    unmerged (each picks up the same decision)."""
    tgt = strip_authority(url_col)
    u = urls.withColumn("host", host_of(url_col))
    narrow = u.select(
        F.col(url_col).alias("_rb_url"),
        F.when(tgt == "", "/").otherwise(tgt).alias("_tgt"),
        "host",
    )
    r = F.broadcast(rules) if broadcast_rules else rules
    hits = (
        narrow.join(r, "host")
        .filter(
            F.substring(
                "_tgt", F.lit(1), F.col("prefix_len").cast("int")
            )
            == F.col("prefix")
        )
        .groupBy("_rb_url")
        .agg(
            F.max(
                F.when(F.col("is_allow"), F.col("prefix_len"))
            ).alias("_al"),
            F.max(
                F.when(~F.col("is_allow"), F.col("prefix_len"))
            ).alias("_dl"),
        )
    )
    neg = F.lit(-1).cast("long")
    return (
        u.join(hits, u[url_col] == hits["_rb_url"], "left")
        .drop("_rb_url")
        .withColumn("robots_allow_len", F.coalesce("_al", neg))
        .withColumn("robots_dis_len", F.coalesce("_dl", neg))
        .drop("_al", "_dl")
        .withColumn(
            "robots_allowed",
            F.col("robots_allow_len") >= F.col("robots_dis_len"),
        )
    )


_DELAY_RE = r"(?i)^crawl-delay[ \t]*:"


def parse_crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    prepared: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Parse per-host ``Crawl-delay`` directives from ``User-agent:
    *`` groups: ``(host, crawl_delay)`` in whole seconds. Not in RFC
    9309 but honored by major non-Google crawlers (Bing/Yandex); a
    polite bulk crawler treats it as the host's request-spacing floor.

    Conventions (shared with the oracle): only integer-second values
    parse (``^[0-9]+$`` after stripping — fractional or junk values
    are ignored rather than guessed, and ``try_cast`` drops digit
    strings that overflow int64 into the same ignored class instead
    of crashing the job under ANSI mode); when several values apply
    (two ``*`` groups, or several bodies for one host) the MAXIMUM
    wins — the longest wait is the conservative politeness reading.
    Hosts with no parseable directive are absent (caller falls back
    to its default spacing)."""
    grouped, star_groups = prepared or _star_grouped_lines(
        robots, host_col, text_col
    )
    vals = (
        grouped.filter(F.col("l").rlike(_DELAY_RE) & (F.col("grp") > 0))
        .join(star_groups, ["host", "body", "grp"], "leftsemi")
        .select(
            "host",
            _strip(F.regexp_extract("l", _DELAY_RE + r"([^\r\n]*)", 1)).alias(
                "v"
            ),
        )
        .filter(F.col("v").rlike(r"^[0-9]+$"))
        # try_cast: the regex admits arbitrarily long digit runs; an
        # int64-overflowing value is junk like any other (null, then
        # dropped), not an ANSI crash
        .select("host", F.col("v").try_cast("long").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    return vals.groupBy("host").agg(F.max("v").alias("crawl_delay"))


def host_caps_from_delays(
    delays: DataFrame,
    cycle_seconds: int,
    max_cap: int,
) -> DataFrame:
    """Convert per-host crawl delays into per-cycle politeness caps:
    ``cap = min(max_cap, cycle_seconds div crawl_delay)`` (integer
    floor — a 7s delay in a 60s cycle allows 8 fetches, never 9;
    a delay longer than the cycle still allows the div's floor, which
    can be 0: the host waits the cycle out). ``Crawl-delay: 0`` is a
    real-world "no delay" directive, not junk — it maps to the
    ``max_cap`` ceiling rather than an ANSI DIVIDE_BY_ZERO crash.
    Output ``(host, cap)`` feeds
    ``frontier_host_cap(per_host_caps=...)``."""
    return delays.select(
        "host",
        F.least(
            F.lit(max_cap).cast("long"),
            F.when(
                F.col("crawl_delay") > 0,
                F.expr(f"{cycle_seconds}L div crawl_delay"),
            ).otherwise(F.lit(max_cap).cast("long")),
        ).alias("cap"),
    )


_SITEMAP_RE = r"(?i)^sitemap[ \t]*:"


def parse_sitemap_urls(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    prepared: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """``Sitemap:`` directive extraction — the third robots.txt
    feature (rules: :func:`parse_robots`, Crawl-delay:
    :func:`parse_crawl_delays`) and the bridge from admission control
    into sitemap discovery (``urls.parse_sitemaps`` /
    ``parse_sitemap_entries`` consume what this finds).

    Semantics per sitemaps.org/RFC 9309: a ``Sitemap:`` line is
    GROUP-INDEPENDENT — it binds to the whole file wherever it
    appears, even inside a foreign ``User-agent`` group, so unlike
    the other two parsers this one reads ALL lines and ignores the
    group machinery entirely. Case-insensitive key, comments
    stripped, values must be absolute http(s) urls (the spec requires
    full urls; relative junk is dropped), and the output is distinct
    per ``(host, sitemap_url)`` so a refetched body advertising the
    same sitemap collapses. Cross-host sitemap urls are legitimate
    (CDN-hosted sitemaps) and pass through untouched.

    Shares the persisted grouped-lines front half via ``prepared=``
    (the ``frontier_job`` pattern: one split/posexplode pass feeds
    rules + delays + sitemaps). Output cardinality is tiny
    (directives per host), aggregated map-side."""
    grouped, _ = prepared or _star_grouped_lines(
        robots, host_col, text_col
    )
    sm = grouped.filter(F.col("l").rlike(_SITEMAP_RE)).select(
        "host",
        _strip(
            F.regexp_extract("l", _SITEMAP_RE + r"[ \t]*([^\r\n]*)", 1)
        ).alias("sitemap_url"),
    )
    # URI schemes are case-insensitive (RFC 3986) — HTTPS:// is valid
    return sm.filter(
        F.col("sitemap_url").rlike(r"(?i)^https?://")
    ).distinct()
