"""Host link-graph analytics: integer PageRank + degree stats.

The Python twin below reimplements the integer semantics naively
(dict-of-dicts, explicit loops) and must agree BIT-FOR-BIT with the
Spark plan — same discipline as the LM/BPE twins: parity is only
meaningful because the twin shares no Spark code."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _twin_pagerank(edges, iterations=3, scale=1_000_000,
                   damping_num=85, damping_den=100):
    """Naive integer PageRank: dict loops, no Spark."""
    base = (scale * (damping_den - damping_num)) // damping_den
    wout: dict = {}
    for s, d, w in edges:
        wout[s] = wout.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    ranks = {n: scale for n in nodes}
    for _ in range(iterations):
        contrib = {}
        for s, d, w in edges:
            c = (ranks[s] * damping_num * w) // (damping_den * wout[s])
            contrib[d] = contrib.get(d, 0) + c
        ranks = {n: base + contrib.get(n, 0) for n in nodes}
    return ranks


def _random_edges(rng, n_hosts=17, n_edges=120):
    seen = {}
    for _ in range(n_edges):
        s = f"h{rng.randrange(n_hosts)}.com"
        d = f"h{rng.randrange(n_hosts)}.com"
        if s == d:
            continue
        seen[(s, d)] = seen.get((s, d), 0) + rng.randrange(1, 4)
    return [(s, d, w) for (s, d), w in sorted(seen.items())]


def test_pagerank_matches_python_twin_bit_for_bit(spark):
    from ai_pdf_extraction_spark.operators.graphs import pagerank

    rng = random.Random(7)
    for trial in range(3):
        edges = _random_edges(rng)
        df = spark.createDataFrame(edges, "src string, dst string, weight long")
        got = {r.host: r["rank"] for r in pagerank(df, iterations=3).collect()}
        assert got == _twin_pagerank(edges), f"trial {trial}"


def test_pagerank_partition_invariant(spark):
    """Same ranks regardless of input partitioning — the property the
    integer quantization exists to guarantee (a float PageRank fails
    this by summing contributions in partition order)."""
    from ai_pdf_extraction_spark.operators.graphs import pagerank

    edges = _random_edges(random.Random(11), n_hosts=9, n_edges=300)
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    a = sorted(map(tuple, pagerank(df.repartition(1), iterations=2).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(16), iterations=2).collect()))
    assert a == b


def test_pagerank_mass_and_sink_properties(spark):
    """Hub-and-spoke: the hub hoards rank; truncation dust only ever
    loses mass (total ≤ N·scale), never creates it; a no-inlink host
    ends at exactly the base."""
    from ai_pdf_extraction_spark.operators.graphs import pagerank

    scale, n_spokes = 1_000_000, 6
    edges = [(f"spoke{i}.com", "hub.com", 1) for i in range(n_spokes)]
    edges.append(("hub.com", "spoke0.com", 1))
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {r.host: r["rank"] for r in pagerank(df, iterations=3).collect()}
    base = (scale * 15) // 100
    assert got["hub.com"] > got["spoke0.com"] > got["spoke1.com"]
    assert got["spoke1.com"] == base  # inlink-free host: base exactly
    assert sum(got.values()) <= (n_spokes + 1) * scale
    assert got == _twin_pagerank(edges)


def test_pagerank_rejects_zero_iterations(spark):
    from ai_pdf_extraction_spark.operators.graphs import pagerank

    df = spark.createDataFrame(
        [("a.com", "b.com", 1)], "src string, dst string, weight long"
    )
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)


def test_host_edges_collapses_and_drops_self(spark):
    from ai_pdf_extraction_spark.operators.graphs import host_edges

    links = spark.createDataFrame(
        [
            ("http://a.com/p1", "https://B.com/x"),
            ("http://a.com/p2", "https://B.com/y"),   # same host pair
            ("http://a.com/p3", "http://a.com/nav"),  # self link
            ("https://c.com:8080/q", "http://a.com/"),
        ],
        "src_url string, dst_url string",
    )
    got = sorted(map(tuple, host_edges(links).collect()))
    assert got == [("a.com", "B.com", 2), ("c.com:8080", "a.com", 1)]


def test_link_degree_stats_full_outer_marginals(spark):
    from ai_pdf_extraction_spark.operators.graphs import link_degree_stats

    edges = spark.createDataFrame(
        [("a.com", "b.com", 3), ("a.com", "c.com", 1), ("b.com", "c.com", 2)],
        "src string, dst string, weight long",
    )
    got = {r.host: (r.out_hosts, r.out_weight, r.in_hosts, r.in_weight)
           for r in link_degree_stats(edges).collect()}
    assert got == {
        "a.com": (2, 4, 0, 0),
        "b.com": (1, 2, 1, 3),
        "c.com": (0, 0, 2, 3),
    }


def test_pagerank_edges_shuffled_once_per_plan(spark):
    """The per-iteration join must shuffle only the rank relation:
    the persisted (edges ⋈ out-weight) build appears as an
    InMemoryTableScan in each round's plan, never a re-aggregation of
    the raw edge input."""
    from ai_pdf_extraction_spark.operators.graphs import pagerank

    edges = _random_edges(random.Random(3), n_hosts=7, n_edges=60)
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    out = pagerank(df, iterations=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_distinctive_terms_matches_python_twin(spark):
    """tf/df ranking with deterministic tie-break equals a dict-based
    twin (which ranks by the same IEEE double ratio)."""
    from ai_pdf_extraction_spark.operators.text_analysis import (
        distinctive_terms,
    )

    docs = [
        (1, "apple banana apple cherry date"),
        (2, "banana cherry cherry cherry fig"),
        (3, "apple fig fig grape grape grape"),
        (4, "date! DATE, daTe; unique-token"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        map(tuple, distinctive_terms(df, k=3).collect())
    )

    import re
    from collections import Counter

    tf = {
        d: Counter(t for t in re.split(r"[^a-z0-9]+", s.lower()) if t)
        for d, s in docs
    }
    dfreq = Counter(t for c in tf.values() for t in c)
    expect = []
    for d, c in tf.items():
        ranked = sorted(
            c.items(), key=lambda kv: (-(kv[1] / dfreq[kv[0]]), kv[0])
        )[:3]
        expect += [
            (d, t, n, dfreq[t], i + 1) for i, (t, n) in enumerate(ranked)
        ]
    assert got == sorted(expect)
    # doc 4: 'date' tf=3 but df=2; 'unique'/'token' are df=1 singletons
    d4 = [r for r in got if r[0] == 4]
    assert {r[1] for r in d4} == {"date", "token", "unique"}


def test_distinctive_terms_single_tokenization_pass(spark):
    """The df leg must read the persisted tf relation, not re-explode
    the corpus: exactly one Generate (explode) in the plan and an
    InMemoryTableScan feeding both legs."""
    from ai_pdf_extraction_spark.operators.text_analysis import (
        distinctive_terms,
    )

    df = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(20)],
        "doc_id long, text string",
    )
    out = distinctive_terms(df, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both the tf leg and the df leg read the persisted tf relation
    # (plan PRINTS repeat the cached child per InMemoryTableScan, so
    # count scans, not Generate nodes)
    assert plan.count("InMemoryTableScan") >= 2
