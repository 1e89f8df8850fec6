"""robots.txt parse + longest-match apply (RFC 9309 prefix subset)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rules_df(spark, per_host: dict):
    rows = [(h, t) for h, t in sorted(per_host.items())]
    return spark.createDataFrame(rows, "host string, robots_txt string")


def test_parse_robots_groups_comments_and_star_only(spark):
    from ai_pdf_extraction_spark.operators.robots import parse_robots

    txt = "\n".join(
        [
            "Disallow: /ignored-no-group",   # before any UA header
            "User-agent: BadBot",
            "Disallow: /",                    # non-* group: ignored
            "",
            "User-agent: GoodBot",
            "User-agent: *",                  # consecutive UAs: one group
            "Disallow: /private/  # comment", # comment stripped
            "Allow: /private/pub",
            "disallow:",                      # empty value: allow-all, no rule
            "DISALLOW : /CaseKeeps",          # directive case-insensitive
        ]
    )
    got = sorted(
        map(tuple, parse_robots(_rules_df(spark, {"a.com": txt})).collect())
    )
    assert got == [
        ("a.com", "/CaseKeeps", False, 10),
        ("a.com", "/private/", False, 9),
        ("a.com", "/private/pub", True, 12),
    ]


def test_parse_robots_second_star_group_also_applies(spark):
    from ai_pdf_extraction_spark.operators.robots import parse_robots

    txt = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b"
    got = sorted(
        r.prefix
        for r in parse_robots(_rules_df(spark, {"h.com": txt})).collect()
    )
    assert got == ["/a", "/b"]


def test_robots_filter_longest_match_allow_wins_ties(spark):
    from ai_pdf_extraction_spark.operators.robots import (
        parse_robots,
        robots_filter,
    )

    rules = parse_robots(
        _rules_df(
            spark,
            {
                "a.com": "User-agent: *\nDisallow: /p/\nAllow: /p/1",
                # exact tie length: allow wins
                "t.com": "User-agent: *\nDisallow: /x\nAllow: /y",
            },
        )
    )
    urls = spark.createDataFrame(
        [
            ("http://a.com/p/2",),     # disallow /p/ wins
            ("http://a.com/p/15",),    # allow /p/1 (len 4) beats /p/ (3)
            ("http://a.com/q/1",),     # no match => allowed
            ("http://a.com",),         # empty path -> '/', no match
            ("http://t.com/x",),       # disallowed
            ("http://b.com/p/2",),     # host without robots => allowed
        ],
        "url string",
    )
    got = {
        r.url: (r.robots_allow_len, r.robots_dis_len, r.robots_allowed)
        for r in robots_filter(urls, rules).collect()
    }
    assert got == {
        "http://a.com/p/2": (-1, 3, False),
        "http://a.com/p/15": (4, 3, True),
        "http://a.com/q/1": (-1, -1, True),
        "http://a.com": (-1, -1, True),
        "http://t.com/x": (-1, 2, False),
        "http://b.com/p/2": (-1, -1, True),
    }
    assert len(got) == 6  # row-per-url preserved through the re-collapse


def test_robots_filter_prefix_is_literal_not_like(spark):
    """A '%' in a rule prefix must match a literal '%' byte — the
    substr compare has no pattern language."""
    from ai_pdf_extraction_spark.operators.robots import (
        parse_robots,
        robots_filter,
    )

    rules = parse_robots(
        _rules_df(spark, {"a.com": "User-agent: *\nDisallow: /a%b"})
    )
    urls = spark.createDataFrame(
        [("http://a.com/a%b/x",), ("http://a.com/aXb/x",)], "url string"
    )
    got = {
        r.url: r.robots_allowed for r in robots_filter(urls, rules).collect()
    }
    assert got == {
        "http://a.com/a%b/x": False,
        "http://a.com/aXb/x": True,
    }


def test_robots_filter_matches_python_twin(spark):
    """Property-style sweep: the relational longest-match algebra
    (two conditional maxes) equals a naive per-url rule scan."""
    from ai_pdf_extraction_spark.operators.robots import (
        parse_robots,
        robots_filter,
    )

    robots = {
        f"h{i}.com": "User-agent: *\n"
        + "\n".join(
            f"{'Allow' if j % 2 else 'Disallow'}: /s{j}/" for j in range(i)
        )
        for i in range(6)
    }
    # twin parse: trivially reconstruct the rule list per host
    twin_rules = {
        h: [
            (f"/s{j}/", bool(j % 2))
            for j in range(int(h[1]))
        ]
        for h in robots
    }
    urls = [
        f"http://h{i}.com/s{j}/page{k}"
        for i in range(6)
        for j in range(6)
        for k in range(2)
    ]

    def twin(u):
        host = u.split("/")[2]
        path = "/" + u.split("/", 3)[3]
        best_a = max(
            (len(p) for p, a in twin_rules[host] if a and path.startswith(p)),
            default=-1,
        )
        best_d = max(
            (len(p) for p, a in twin_rules[host] if not a and path.startswith(p)),
            default=-1,
        )
        return best_a >= best_d

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.robots_allowed
        for r in robots_filter(df, parse_robots(_rules_df(spark, robots))).collect()
    }
    assert got == {u: twin(u) for u in urls}


def test_robots_filter_broadcasts_rules(spark):
    from ai_pdf_extraction_spark.operators.robots import (
        parse_robots,
        robots_filter,
    )

    rules = parse_robots(
        _rules_df(spark, {"a.com": "User-agent: *\nDisallow: /p/"})
    )
    urls = spark.createDataFrame([("http://a.com/p/1",)], "url string")
    plan = (
        robots_filter(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_url_prefilter_flags_and_suffix_blocklist(spark):
    from ai_pdf_extraction_spark.operators.urls import url_prefilter

    urls = spark.createDataFrame(
        [
            ("http://ok.com/article/x12",),          # keep
            ("http://ok.com/img/pic.JPG",),          # asset (case-insensitive)
            ("http://ok.com/jpg",),                  # NOT asset: no dot
            ("http://ok.com/sess/1234567890123",),   # digit heavy
            ("http://ok.com/a1b2/c3d4e5",),          # digits 5, path len 13: keep
            ("http://a.b.spam.net/fine/path",),      # blocked via suffix
            ("http://spam.net/x",),                  # blocked exact
            ("http://notspam.net/x",),               # suffix must be label-aligned
            ("http://ok.com/long/" + "x" * 200,),    # too long at max_len=100
            ("http://ok.com/style.css?v=2",),        # asset: query stripped
        ],
        "url string",
    )
    got = {
        r.url: (r.is_asset, r.digit_heavy, r.too_long, r.blocked_domain, r.keep)
        for r in url_prefilter(
            urls, blocklist=["spam.net"], max_len=100
        ).collect()
    }
    assert got["http://ok.com/article/x12"] == (False, False, False, False, True)
    assert got["http://ok.com/img/pic.JPG"][0] is True
    assert got["http://ok.com/jpg"][0] is False
    assert got["http://ok.com/sess/1234567890123"][1] is True
    assert got["http://ok.com/a1b2/c3d4e5"] == (False, False, False, False, True)
    assert got["http://a.b.spam.net/fine/path"][3] is True
    assert got["http://spam.net/x"][3] is True
    assert got["http://notspam.net/x"][3] is False
    assert got["http://ok.com/long/" + "x" * 200][2] is True
    assert got["http://ok.com/style.css?v=2"][0] is True
    assert all(
        k == (not (a or d or t or b)) for a, d, t, b, k in got.values()
    )


def test_url_prefilter_no_blocklist_and_no_join_in_plan(spark):
    from ai_pdf_extraction_spark.operators.urls import url_prefilter

    urls = spark.createDataFrame([("http://x.com/a",)], "url string")
    out = url_prefilter(urls, blocklist=["b.com"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # blocklist ships as a plan literal
    assert out.collect()[0].blocked_domain is False
    assert (
        url_prefilter(urls).collect()[0].blocked_domain is False
    )  # blocklist omitted entirely


def test_parse_robots_crlf_and_tabs(spark):
    """CRLF bodies and tab-padded directives parse identically to
    clean LF — F.trim is space-only, so the dedicated strip matters
    (a surviving CR made every prefix unmatchable)."""
    from ai_pdf_extraction_spark.operators.robots import parse_robots

    crlf = "User-agent: *\r\nDisallow:\t/private/\r\nAllow: /private/pub\r\n"
    got = sorted(
        map(tuple, parse_robots(_rules_df(spark, {"a.com": crlf})).collect())
    )
    assert got == [
        ("a.com", "/private/", False, 9),
        ("a.com", "/private/pub", True, 12),
    ]


def test_parse_robots_duplicate_host_rows_union_deterministically(spark):
    """A host with several robots bodies (re-fetches appended to the
    relation) contributes the UNION of each body's star rules — line
    numbering never interleaves across bodies."""
    from ai_pdf_extraction_spark.operators.robots import parse_robots

    rows = [
        ("a.com", "User-agent: *\nDisallow: /a"),
        # second body: the UA header is NOT on line 0, so interleaved
        # host-only grouping would mis-attribute /b
        ("a.com", "# refetched\nUser-agent: *\nDisallow: /b"),
        ("a.com", "User-agent: Bad\nDisallow: /never"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    for trial in range(3):
        got = sorted(r.prefix for r in parse_robots(df).collect())
        assert got == ["/a", "/b"], f"trial {trial}"


def test_url_prefilter_regated_output_keeps_single_host_column(spark):
    """Re-gating a url_prefilter output with tighter flags must not
    produce a duplicate host column."""
    from ai_pdf_extraction_spark.operators.urls import url_prefilter

    urls = spark.createDataFrame([("http://a.com/x",)], "url string")
    once = url_prefilter(urls, max_len=100)
    twice = url_prefilter(once.select("url", "host"), max_len=5)
    assert twice.columns.count("host") == 1
    row = twice.collect()[0]
    assert row.too_long is True  # the tighter gate decided


def test_parse_sitemaps_entities_whitespace_and_index_files(spark):
    from ai_pdf_extraction_spark.operators.urls import parse_sitemaps

    xml = (
        "<urlset>"
        "<url><loc>  http://a.com/x?a=1&amp;b=2  </loc></url>"
        "<url><loc>http://a.com/&lt;odd&gt;/&apos;q&quot;</loc></url>"
        "</urlset>"
    )
    idx = (
        "<sitemapindex>"
        "<sitemap><loc>http://b.com/sitemap-2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.com", xml), ("b.com", idx)], "host string, sitemap_xml string"
    )
    got = sorted(map(tuple, parse_sitemaps(df).collect()))
    assert got == [
        ("a.com", "http://a.com/<odd>/'q\""),
        ("a.com", "http://a.com/x?a=1&b=2"),
        # index files surface their child-sitemap locs; caller routes
        ("b.com", "http://b.com/sitemap-2.xml"),
    ]


def test_parse_sitemaps_double_encoded_decodes_once(spark):
    """&amp;lt; must decode to the literal text '&lt;' (amp last),
    never twice to '<'."""
    from ai_pdf_extraction_spark.operators.urls import parse_sitemaps

    df = spark.createDataFrame(
        [("a.com", "<loc>http://a.com/&amp;lt;x</loc>")],
        "host string, sitemap_xml string",
    )
    assert parse_sitemaps(df).collect()[0].url == "http://a.com/&lt;x"


def test_with_canonical_url_matches_column_form_and_is_linear(spark):
    """The staged canonicalizer must be byte-identical to the Column
    form on the adversarial shapes AND keep the optimized plan linear
    (the Column form's self-referencing steps are textually
    exponential — the reason the staged twin exists)."""
    from ai_pdf_extraction_spark.operators.urls import (
        canonicalize_url,
        with_canonical_url,
    )

    raws = [
        "HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&q=1#frag",
        "http://Host.org:80//a//b/",
        "not a url at all",
        "https://example.com/foo&bar",
        "https://a.com//p//q?u=http://x.com//y",
        "http://a/b&gclid=x/rest",
        "http://a/b&c?utm_a=1&keep=2",
        "https://h.com/",
        "",
    ]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    col_form = [
        r.c for r in df.select(
            "url", canonicalize_url("url").alias("c")
        ).orderBy("url").collect()
    ]
    staged = with_canonical_url(df, "url", out="c")
    staged_vals = [r.c for r in staged.orderBy("url").collect()]
    assert staged_vals == col_form
    assert staged.columns == ["url", "c"]  # intermediates dropped
    lin = len(staged._jdf.queryExecution().optimizedPlan().toString())
    exp = len(
        df.select(canonicalize_url("url").alias("c"))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert lin * 5 < exp  # measured ~17x; assert a conservative 5x


def test_frontier_priority_budget_order_fallback_and_plan(spark):
    from ai_pdf_extraction_spark.operators.urls import (
        frontier_priority_budget,
    )

    fr = spark.createDataFrame(
        [(f"http://big.com/{i}", True) for i in range(6)]
        + [(f"http://tiny.com/{i}", True) for i in range(6)]
        + [(f"http://unranked.com/{i}", True) for i in range(2)]
        + [("http://big.com/seen", False)],
        "canon_url string, to_crawl boolean",
    )
    ranks = spark.createDataFrame(
        [("big.com", 900), ("tiny.com", 100)], "host string, rank long"
    )
    out = frontier_priority_budget(fr, ranks, budget=9)
    rows = out.collect()
    assert len(rows) == 9
    hosts = [r.host for r in rows]
    # all 6 big.com urls first, then 3 of tiny.com; unranked (rank 0)
    # never makes the budget; non-to_crawl rows never appear
    assert hosts.count("big.com") == 6 and hosts.count("tiny.com") == 3
    assert all(r.host_rank in (900, 100) for r in rows)
    # determinism: same set at different parallelism
    again = frontier_priority_budget(fr.repartition(7), ranks, budget=9)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort


def test_parse_crawl_delays_max_wins_and_junk_ignored(spark):
    from ai_pdf_extraction_spark.operators.robots import (
        host_caps_from_delays,
        parse_crawl_delays,
    )

    rows = [
        # two star groups: the max (7) wins over 3
        ("a.com", "User-agent: *\nCrawl-delay: 3\n\n"
                  "User-agent: *\nCrawl-delay: 7"),
        # non-star group ignored entirely
        ("b.com", "User-agent: Bad\nCrawl-delay: 1"),
        # junk / fractional values ignored (integer seconds only)
        ("c.com", "User-agent: *\nCrawl-delay: 0.5\nCrawl-delay: soon"),
        ("d.com", "User-agent: *\ncrawl-delay:\t10\r"),  # CRLF + tab
        # 0 = explicit "no delay": parses, caps at max_cap (never an
        # ANSI DIVIDE_BY_ZERO)
        ("e.com", "User-agent: *\nCrawl-delay: 0"),
        # int64-overflowing digit run is junk, not an ANSI crash
        ("f.com", "User-agent: *\nCrawl-delay: 99999999999999999999"),
        ("g.com", "User-agent: *\nCrawl-delay: -5"),  # negative: junk
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {r.host: r.crawl_delay for r in parse_crawl_delays(df).collect()}
    assert got == {"a.com": 7, "d.com": 10, "e.com": 0}
    caps = {
        r.host: r.cap
        for r in host_caps_from_delays(
            parse_crawl_delays(df), cycle_seconds=60, max_cap=25
        ).collect()
    }
    # 60 div 7 = 8 (floor); delay 0 -> the max_cap ceiling
    assert caps == {"a.com": 8, "d.com": 6, "e.com": 25}


def test_frontier_host_cap_per_host_overrides(spark):
    from ai_pdf_extraction_spark.operators.urls import frontier_host_cap

    fr = spark.createDataFrame(
        [(f"http://tight.com/{i}", i, True) for i in range(10)]
        + [(f"http://loose.com/{i}", 100 + i, True) for i in range(10)]
        + [(f"http://defaulted.com/{i}", 200 + i, True) for i in range(10)],
        "canon_url string, first_id long, to_crawl boolean",
    )
    caps = spark.createDataFrame(
        [("tight.com", 2), ("loose.com", 30)], "host string, cap long"
    )
    got = frontier_host_cap(fr, per_host=5, per_host_caps=caps).collect()
    counts = {}
    for r in got:
        counts[r.host] = counts.get(r.host, 0) + 1
    assert counts == {"tight.com": 2, "loose.com": 10, "defaulted.com": 5}


def test_parse_sitemap_entries_pairs_loc_with_its_lastmod(spark):
    from ai_pdf_extraction_spark.operators.urls import parse_sitemap_entries

    xml = (
        "<urlset>\n"
        "  <url>\n    <loc> http://a.com/x </loc>\n"
        "    <lastmod>2026-02-01</lastmod>\n  </url>\n"
        "  <url><loc>http://a.com/y?a=1&amp;b=2</loc></url>\n"
        "  <url><lastmod>2026-03-01</lastmod></url>\n"  # no loc: dropped
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("a.com", xml)], "host string, sitemap_xml string"
    )
    got = sorted(map(tuple, parse_sitemap_entries(df).collect()))
    assert got == [
        ("a.com", "http://a.com/x", "2026-02-01"),
        ("a.com", "http://a.com/y?a=1&b=2", None),
    ]


def test_sitemap_recrawl_delta_decisions(spark):
    from ai_pdf_extraction_spark.operators.urls import sitemap_recrawl_delta

    entries = spark.createDataFrame(
        [
            ("h.com", "http://h.com/new", "2026-01-10"),      # never crawled
            ("h.com", "http://h.com/stale", "2026-01-20"),    # newer than crawl
            ("h.com", "http://h.com/fresh", "2026-01-10"),    # older: skip
            ("h.com", "http://h.com/fresh", "2026-01-12"),    # dup: max still old
            ("h.com", "http://h.com/nodate", None),           # crawled, no evidence
            ("h.com", "http://h.com/dup#frag", "2026-01-20"), # canon collapses
            ("h.com", "http://h.com/dup", "2026-01-02"),
        ],
        "host string, url string, lastmod string",
    )
    crawled = spark.createDataFrame(
        [
            ("http://h.com/stale", "2026-01-15"),
            ("http://h.com/fresh", "2026-01-15"),
            ("http://h.com/nodate", "2026-01-15"),
            ("http://h.com/dup", "2026-01-15"),
        ],
        "canon_url string, crawled_at string",
    )
    got = {
        r.canon_url: (r.lastmod, r.crawled_at, r.needs_fetch)
        for r in sitemap_recrawl_delta(entries, crawled).collect()
    }
    assert got == {
        "http://h.com/new": ("2026-01-10", None, True),
        "http://h.com/stale": ("2026-01-20", "2026-01-15", True),
        "http://h.com/fresh": ("2026-01-12", "2026-01-15", False),
        "http://h.com/nodate": (None, "2026-01-15", False),
        # fragment variant canonicalizes onto /dup; max lastmod 01-20
        "http://h.com/dup": ("2026-01-20", "2026-01-15", True),
    }


def test_sitemap_recrawl_delta_cross_host_url_no_fanout(spark):
    """A url advertised by TWO hosts' sitemaps (mirrored feeds) must
    yield exactly one row per (host, canon_url) — the broadcast key
    projection dedups before the history join, so broadcast and plain
    modes agree (2 rows, not a 2x2 join fan-out)."""
    from ai_pdf_extraction_spark.operators.urls import sitemap_recrawl_delta

    entries = spark.createDataFrame(
        [
            ("h1.com", "http://x.com/p", "2026-01-20"),
            ("h2.com", "http://x.com/p", "2026-01-10"),
        ],
        "host string, url string, lastmod string",
    )
    crawled = spark.createDataFrame(
        [("http://x.com/p", "2026-01-15")],
        "canon_url string, crawled_at string",
    )
    for bcast in (True, False):
        got = sorted(
            map(
                tuple,
                sitemap_recrawl_delta(
                    entries, crawled, broadcast_entries=bcast
                ).collect(),
            )
        )
        assert got == [
            ("h1.com", "http://x.com/p", "2026-01-20", "2026-01-15", True),
            ("h2.com", "http://x.com/p", "2026-01-10", "2026-01-15", False),
        ], f"broadcast_entries={bcast}"


def test_frontier_priority_budget_keeps_fractional_ranks(spark):
    """Normalized double PageRank values must keep their type — a
    long cast would truncate every fractional rank to 0 and silently
    destroy the prioritization."""
    from ai_pdf_extraction_spark.operators.urls import (
        frontier_priority_budget,
    )

    fr = spark.createDataFrame(
        [(f"http://big.com/{i}", True) for i in range(3)]
        + [(f"http://small.com/{i}", True) for i in range(3)],
        "canon_url string, to_crawl boolean",
    )
    ranks = spark.createDataFrame(
        [("big.com", 0.38), ("small.com", 0.02)],
        "host string, rank double",
    )
    got = frontier_priority_budget(fr, ranks, budget=4)
    assert dict(got.dtypes)["host_rank"] == "double"
    rows = got.collect()
    hosts = [r.host for r in rows]
    # all three big.com urls outrank every small.com url
    assert hosts.count("big.com") == 3 and hosts.count("small.com") == 1
    assert {r.host_rank for r in rows} == {0.38, 0.02}


def test_parse_sitemaps_drops_empty_loc(spark):
    from ai_pdf_extraction_spark.operators.urls import parse_sitemaps

    xml = (
        "<urlset><url><loc></loc></url>"
        "<url><loc>   </loc></url>"
        "<url><loc>http://a.com/x</loc></url></urlset>"
    )
    df = spark.createDataFrame(
        [("a.com", xml)], "host string, sitemap_xml string"
    )
    assert [tuple(r) for r in parse_sitemaps(df).collect()] == [
        ("a.com", "http://a.com/x")
    ]


def test_parse_sitemap_urls_group_independent_and_junk(spark):
    from ai_pdf_extraction_spark.operators.robots import (
        parse_sitemap_urls,
    )

    robots = spark.createDataFrame(
        [
            # inside a foreign group: binds anyway; CRLF body; comment
            ("a.com",
             "User-agent: BadBot\r\nDisallow: /\r\n"
             "Sitemap: https://a.com/sm.xml # main\r\n"),
            # case variants + relative junk + duplicate + cross-host
            ("b.com",
             "sitemap:https://b.com/x.xml\n"
             "SITEMAP:  https://cdn.net/shared.xml  \n"
             "Sitemap: /relative\n"
             "Sitemap: https://b.com/x.xml"),
            # no directive
            ("c.com", "User-agent: *\nDisallow: /"),
        ],
        ["host", "robots_txt"],
    )
    got = {(r.host, r.sitemap_url)
           for r in parse_sitemap_urls(robots).collect()}
    assert got == {
        ("a.com", "https://a.com/sm.xml"),
        ("b.com", "https://b.com/x.xml"),
        ("b.com", "https://cdn.net/shared.xml"),
    }


def test_parse_sitemap_urls_uppercase_scheme(spark):
    from ai_pdf_extraction_spark.operators.robots import (
        parse_sitemap_urls,
    )

    robots = spark.createDataFrame(
        [("a.com", "Sitemap: HTTPS://A.COM/SM.XML")],
        ["host", "robots_txt"],
    )
    got = parse_sitemap_urls(robots).collect()
    assert [(r.host, r.sitemap_url) for r in got] == [
        ("a.com", "HTTPS://A.COM/SM.XML")
    ]


def test_robots_value_tails_stop_at_interior_cr(spark):
    from ai_pdf_extraction_spark.operators.robots import (
        parse_crawl_delays,
        parse_sitemap_urls,
    )

    robots = spark.createDataFrame(
        [("a.com",
          "Sitemap: https://a.com/x.xml\rjunk\n"
          "User-agent: *\nCrawl-delay: 7\rtrailing")],
        ["host", "robots_txt"],
    )
    sm = parse_sitemap_urls(robots).collect()
    assert [(r.host, r.sitemap_url) for r in sm] == [
        ("a.com", "https://a.com/x.xml")
    ]
    cd = parse_crawl_delays(robots).collect()
    assert [(r.host, r.crawl_delay) for r in cd] == [("a.com", 7)]
