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
