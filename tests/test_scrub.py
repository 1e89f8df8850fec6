"""PII scrubbing + corpus-selection operator tests (operators/scrub.py,
operators/text_analysis.repetition_signals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_scrub_pii_redacts_and_counts(spark):
    from ai_pdf_extraction_spark.operators.scrub import pii_counts, scrub_pii

    rows = [
        (1, "mail me at jane.doe+spam@sub.example.co.uk today"),
        (2, "server at 192.168.0.1 and backup 10.0.0.7"),
        (3, "call +1 (555) 010-4477 or 555 010 4478 now"),
        (4, "clean text with no personal data at all"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = pii_counts("text")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            scrub_pii("text").alias("s"),
            counts["n_emails"].alias("e"),
            counts["n_ips"].alias("i"),
            counts["n_phones"].alias("p"),
        ).collect()
    }
    assert got[1]["s"] == "mail me at <EMAIL> today"
    assert (got[1]["e"], got[1]["i"], got[1]["p"]) == (1, 0, 0)
    assert got[2]["s"] == "server at <IP> and backup <IP>"
    assert (got[2]["e"], got[2]["i"], got[2]["p"]) == (0, 2, 0)
    assert got[3]["s"] == "call <PHONE> or <PHONE> now"
    assert (got[3]["e"], got[3]["i"], got[3]["p"]) == (0, 0, 2)
    assert got[4]["s"] == rows[3][1]  # untouched
    # IPs are not double-counted as phones (scrub order contract)
    assert got[2]["p"] == 0


def test_phone_does_not_merge_across_lines(spark):
    """The phone separator class is space-only: two unrelated numbers
    on adjacent lines (years, page numbers) must not be redacted as one
    phone (round-2 review regression)."""
    from ai_pdf_extraction_spark.operators.scrub import scrub_pii

    rows = [
        (1, "In 2020\n2021 was better for data quality overall"),
        (2, "tabs\t12345678\t87654321 stay separate numbers"),
        (3, "real phone +1 555 010 4477 still redacts"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["s"] for r in df.select("doc_id", scrub_pii("text").alias("s")).collect()}
    assert got[1] == rows[0][1]  # untouched
    assert "<PHONE>" not in got[2]
    assert got[3] == "real phone <PHONE> still redacts"


def test_repetition_signals(spark):
    from ai_pdf_extraction_spark.operators.text_analysis import repetition_signals

    rows = [
        (1, "spam spam spam spam"),            # 1 distinct of 4 words
        (2, "all words here are unique ones"),  # no repetition
        (3, "one"),                             # single word → 0/0
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert got[1]["dup_word_ratio"] == pytest.approx(0.75)
    # bigrams of doc1: 3x "spam spam" → top share 1.0
    assert got[1]["top_bigram_share"] == pytest.approx(1.0)
    assert got[2]["dup_word_ratio"] == pytest.approx(0.0)
    # 5 distinct bigrams of 5 → 1/5
    assert got[2]["top_bigram_share"] == pytest.approx(0.2)
    assert got[3]["dup_word_ratio"] == 0.0 and got[3]["top_bigram_share"] == 0.0
    assert got[4]["dup_word_ratio"] == 0.0 and got[4]["top_bigram_share"] == 0.0


def test_stratified_hash_sample_deterministic_rates(spark):
    from ai_pdf_extraction_spark.operators.scrub import stratified_hash_sample

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_hash_sample(df, {"en": 0.25, "de": 1.0}, default_rate=0.0)
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert by_lang["de"] == 1000  # rate 1.0 keeps everything
    assert 150 < by_lang["en"] < 350  # ~25% of 1000, md5-uniform
    # deterministic: same input → identical sample
    again = stratified_hash_sample(df, {"en": 0.25, "de": 1.0}, default_rate=0.0)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_token_budget_selection(spark):
    from ai_pdf_extraction_spark.operators.scrub import token_budget_selection

    rows = [
        # (doc_id, lang, quality, n_tokens)
        (1, "en", 0.9, 60),
        (2, "en", 0.8, 50),
        (3, "en", 0.7, 40),   # cum 150 > 100 → dropped
        (4, "de", 0.5, 100),  # cum 100 → kept
        (5, "de", 0.4, 20),   # cum 120 > 110 → dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality double, n_tokens long")
    got = {r["doc_id"]: r for r in token_budget_selection(df, 110).collect()}
    assert set(got) == {1, 2, 4}
    assert got[2]["cum_tokens"] == 110  # inclusive: exactly the budget stays
    assert got[4]["cum_tokens"] == 100


def test_sequence_pack_invariants(spark):
    """Packing layout invariants: offsets tile the stream with no gaps
    or overlaps in the (shard, id) order, totals add up, chunk spans
    agree with offsets, zero-token docs occupy nothing."""
    from ai_pdf_extraction_spark.operators.scrub import sequence_pack

    rows = [(i, (i * 37) % 90) for i in range(200)]
    rows[7] = (7, 0)  # zero-token doc
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {
        r["doc_id"]: r.asDict()
        for r in sequence_pack(docs, seq_len=64, n_shards=8).collect()
    }
    assert len(out) == 200
    # reconstruct the global order and check contiguity
    order = sorted(out, key=lambda i: (i % 8, i))
    pos = 0
    for i in order:
        r = out[i]
        assert r["start_offset"] == pos and r["end_offset"] == pos + r["n_tokens"]
        pos = r["end_offset"]
    assert pos == sum(t for _, t in rows)
    for r in out.values():
        if r["n_tokens"] == 0:
            assert r["n_seqs"] == 0
        else:
            assert r["first_seq"] == r["start_offset"] // 64
            assert r["last_seq"] == (r["end_offset"] - 1) // 64
            assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1


def test_sequence_pack_windows_are_sharded(spark):
    """The corpus-wide window must be PARTITIONED (by the hash shard);
    only the n_shards-row bases relation may use the one global
    window — otherwise the running sum funnels the corpus through a
    single task."""
    from ai_pdf_extraction_spark.operators.scrub import sequence_pack

    docs = spark.range(100).selectExpr(
        "id as doc_id", "id % 17 as n_tokens"
    )
    out = sequence_pack(docs, seq_len=64, n_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 2
    # the doc-side window carries the shard in its partition spec
    assert "_shard" in plan.split("Window")[1]
    # the narrow projection is persisted and read by BOTH consumers
    # (within-shard window + bases groupBy) — without it the upstream
    # plan (q74: the exact-BPE UDF over the whole corpus) runs twice
    assert plan.count("InMemoryTableScan") >= 2
    # chunk indices are exact integer division (` div `), never
    # double-rounding floor(x / n) — offsets past 2^53 stay exact
    assert " div " in plan and "FLOOR" not in plan.upper()


def _naive_mixture(rows, weights, budget, max_epochs, n_shards=64):
    """Independent pure-Python twin of mixture_sample: same integer
    targets, ceil epochs, (epoch, shard, md5, id) order, inclusive
    running-sum cut."""
    import hashlib

    sum_w = sum(weights.values())
    targets = {s: (budget * w) // sum_w for s, w in weights.items()}
    by_src = {}
    for doc_id, src, tok in rows:
        if src in targets and tok > 0:
            by_src.setdefault(src, []).append((doc_id, tok))
    out = []
    for src, docs in by_src.items():
        avail = sum(t for _, t in docs)
        target = targets[src]
        n_epochs = min(max_epochs, (target + avail - 1) // avail)
        rep = [
            (e, i % n_shards,
             hashlib.md5(f"{e}:{i}".encode()).hexdigest(), i, t)
            for e in range(n_epochs)
            for i, t in docs
        ]
        cum = 0
        for e, _sh, _h, i, t in sorted(rep):
            cum += t
            if cum <= target:
                out.append((i, src, e, t, cum))
    return sorted(out)


def test_mixture_sample_budget_epochs_and_ties(spark):
    from ai_pdf_extraction_spark.operators.scrub import mixture_sample

    rows = (
        [(i, "A", 40) for i in range(3)]          # avail 120, upweighted
        + [(3, "A", 0)]                            # zero-token: dropped
        + [(100 + i, "B", 50) for i in range(20)]  # avail 1000, truncated
        + [(900 + i, "C", 30) for i in range(5)]   # unweighted: dropped
    )
    weights, budget, max_epochs = {"A": 50, "B": 50}, 1000, 3
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = sorted(
        (r["doc_id"], r["source"], r["epoch"], r["n_tokens"],
         r["cum_source_tokens"])
        for r in mixture_sample(df, weights, budget, max_epochs).collect()
    )
    assert got == _naive_mixture(rows, weights, budget, max_epochs)
    # A: target 500, avail 120 -> epoch cap binds (3 full copies = 360)
    a = [r for r in got if r[1] == "A"]
    assert len(a) == 9 and {r[2] for r in a} == {0, 1, 2}
    assert max(r[4] for r in a) == 360
    # B: exactly 10 of 20 docs; the 10th lands EXACTLY on the target
    # (inclusive <= keeps it — the token_budget_selection tie rule)
    b = [r for r in got if r[1] == "B"]
    assert len(b) == 10 and max(r[4] for r in b) == 500
    assert {r[1] for r in got} == {"A", "B"}


def test_mixture_sample_stable_under_repartition(spark):
    from ai_pdf_extraction_spark.operators.scrub import mixture_sample

    rows = [(i, f"s{i % 4}", 5 + i % 13) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    w = {"s0": 3, "s1": 2, "s2": 1}
    base = sorted(map(tuple, mixture_sample(df, w, 800, 2).collect()))
    shuf = sorted(
        map(tuple, mixture_sample(df.repartition(13), w, 800, 2).collect())
    )
    assert base == shuf and len(base) > 0


def test_mixture_sample_validation():
    import pytest as _pytest

    from ai_pdf_extraction_spark.operators.scrub import mixture_sample

    with _pytest.raises(ValueError):
        mixture_sample(None, {}, 100)
    with _pytest.raises(ValueError):
        mixture_sample(None, {"a": -1}, 100)
    with _pytest.raises(ValueError):
        mixture_sample(None, {"a": 0}, 100)


def test_mixture_windows_are_sharded(spark):
    """Both heavy windows partition on (_src, _epoch, _shard); the
    bases window is the only per-source one and runs over a tiny
    grouped relation; the epoch fan-out and bases rejoin broadcast;
    the narrow projection persists for its two consumers."""
    from ai_pdf_extraction_spark.operators.scrub import mixture_sample

    docs = spark.range(200).selectExpr(
        "id as doc_id", "concat('s', id % 3) as source", "1 + id % 9 as n_tokens"
    )
    out = mixture_sample(docs, {"s0": 2, "s1": 1}, 500, 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_shard" in plan.split("Window")[1]
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 2


def test_cluster_balanced_sample_matches_naive_window(spark):
    """The two-phase sharded rank must equal the single-window
    row_number over the operator's global (shard, md5, id) order, and
    the cap must actually cut oversized clusters."""
    from pyspark.sql import Window

    from ai_pdf_extraction_spark.operators.scrub import (
        cluster_balanced_sample,
    )
    from ai_pdf_extraction_spark.operators.similarity import ivf_assign

    emb = spark.createDataFrame(
        [(i, [float((i * 7) % 5), float((i * 3) % 4)]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    cents = [[0.0, 0.0], [4.0, 3.0], [2.0, 1.0]]
    got = sorted(
        map(tuple, cluster_balanced_sample(
            emb, cents, per_cluster=20, n_shards=8
        ).collect())
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("vec_id") % 8, F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    naive = sorted(
        map(tuple, emb.select(
            "vec_id", ivf_assign("embedding", cents).alias("cluster")
        )
        .withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("cluster")).cast("long"),
        )
        .filter(F.col("pick_rank") <= 20)
        .collect())
    )
    assert got == naive and len(got) > 0
    # the cap binds: some domain was larger than per_cluster
    assert any(size > 20 for _, _, _, size in got)
    assert all(rank <= 20 for _, _, rank, _ in got)


def test_cluster_balanced_sample_windows_are_sharded(spark):
    """The per-doc rank window must carry the shard in its partition
    spec (no whole-cluster funnel); bases windows run over the tiny
    grouped relation; the narrow assignment projection persists for
    its two consumers."""
    from ai_pdf_extraction_spark.operators.scrub import (
        cluster_balanced_sample,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 4), 1.0]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    out = cluster_balanced_sample(
        emb, [[0.0, 1.0], [3.0, 1.0]], per_cluster=10, n_shards=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_shard" in plan.split("Window")[1]
    assert "BroadcastHashJoin" in plan
    assert plan.count("InMemoryTableScan") >= 2
