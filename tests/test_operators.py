"""Operator unit tests on small inline data (hermetic — no testdata
dependency): dedup family, similarity search, text analysis."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
        (3, "completely different content about spark shuffle partitions and joins"),
        (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
        (5, "der schnelle braune fuchs springt und die hunde und das wasser und der wald"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    from ai_pdf_extraction_spark.operators.dedup import exact_dedup

    out = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert out[4]["canonical_id"] == 1 and out[4]["is_dup"] is True
    assert out[1]["canonical_id"] == 1 and out[1]["is_dup"] is False
    assert out[4]["group_size"] == 2
    assert out[2]["is_dup"] is False  # near-dup is NOT exact-dup

    # review finding r5: NULL-text docs must SURVIVE the join-back (an
    # inner join on a null fp would silently drop them) and form one
    # exact-duplicate group, distinct from empty-text docs
    nd = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in exact_dedup(nd).collect()}
    assert set(got) == {1, 2, 3, 4}, "dedup must never lose doc ids"
    assert got[1]["canonical_id"] == 1 and got[2]["canonical_id"] == 1
    assert got[2]["is_dup"] and got[2]["group_size"] == 2
    assert got[3]["canonical_id"] == 3 and got[4]["canonical_id"] == 3


def test_granule_dedup(spark):
    """Corpus-level sentence dedup: the boilerplate sentence survives
    only in its FIRST (doc_id, pos) occurrence; unique sentences all
    survive; reassembly preserves original order; all-dup docs come
    back empty with n_kept=0."""
    from ai_pdf_extraction_spark.operators.dedup import granule_dedup

    rows = [
        (1, "Cookie notice here. Unique alpha. Unique beta"),
        (2, "Cookie notice here. Unique gamma"),
        (3, "Cookie notice here"),
        (4, "Unique delta. Cookie notice here. Unique epsilon"),
        (5, ""),  # zero granules: must SURVIVE in the output
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in granule_dedup(df).collect()}
    assert out[5]["n_granules"] == 0 and out[5]["n_kept"] == 0
    assert out[5]["dedup_text"] == ""
    # no window over the granule key: the winner-per-granule must be a
    # partial-aggregating GROUP BY (map-side combine on hot boilerplate
    # keys), never a skew-unsplittable window exchange
    physical = granule_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in physical, physical
    assert out[1]["dedup_text"] == "Cookie notice here. Unique alpha. Unique beta"
    assert out[1]["n_granules"] == 3 and out[1]["n_kept"] == 3
    assert out[2]["dedup_text"] == "Unique gamma"  # boiler deduped away
    assert out[2]["n_kept"] == 1
    assert out[3]["dedup_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["dedup_text"] == "Unique delta. Unique epsilon"
    assert out[4]["n_granules"] == 3 and out[4]["n_kept"] == 2


def test_contamination_flags(spark):
    """Decontamination: docs sharing an n-gram with the benchmark are
    flagged with the right hit counts, clean docs are not, and the
    benchmark shingle side broadcasts (never a shuffle join at scale)."""
    from ai_pdf_extraction_spark.operators.dedup import contamination_flags

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about spark shuffles"),
            (3, "something quick brown fox something else entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox yesterday")],
        "bench_id long, text string",
    )
    out = contamination_flags(docs, bench, n=3, min_hits=1)
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in physical or "BroadcastExchange" in physical
    got = {r["doc_id"]: r for r in out.collect()}
    # doc1 shares "the quick brown" and "quick brown fox"
    assert got[1]["contaminated"] and got[1]["n_hits"] == 2
    assert not got[2]["contaminated"] and got[2]["n_hits"] == 0
    assert got[3]["contaminated"] and got[3]["n_hits"] == 1


def test_ngram_jaccard(spark, docs):
    from ai_pdf_extraction_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # identical
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0  # near-dup
    assert (1, 3) not in pairs  # unrelated


def test_ngram_jaccard_df_cap_drops_hot_shingle(spark):
    """A ubiquitous shingle (every doc shares it) is dropped by the DF
    cap BEFORE sizes are computed, so Jaccard numerator and denominator
    use the same rare-shingle universe — true near-dup pairs survive at
    the threshold instead of being diluted by the dropped shingle."""
    from ai_pdf_extraction_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "subscribe to our newsletter today"  # in every doc
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta eta theta {boiler}"),
        (2, f"alpha beta gamma delta epsilon zeta eta iota {boiler}"),  # near-dup
        (3, f"totally different words here nothing shared {boiler}"),
        (4, f"unrelated content again completely new tokens {boiler}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cap=3 drops the 3 pure-boilerplate shingles (DF=4 each)
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.4, max_shingle_df=3).collect()
    }
    assert (1, 2) in capped, "near-dup must survive the DF cap"
    assert (3, 4) not in capped
    # sizes computed over the SAME capped universe: docs 1/2 each keep
    # 8 rare shingles, sharing 5 → jaccard 5/11
    assert capped[(1, 2)] == pytest.approx(5 / 11, abs=1e-4)
    # uncapped: the 5 shared boilerplate shingles dominate both the
    # numerator and denominator differently — sanity-check it differs
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=None).collect()
    }
    assert uncapped[(1, 2)] != capped[(1, 2)]


@pytest.mark.parametrize(
    "prefix_min_docs", [10**9, 0], ids=["selfjoin", "prefix"]
)
def test_ngram_allpairs_matches_python_twin(spark, prefix_min_docs):
    """The all-pairs baseline must reproduce the naive python Jaccard
    EXACTLY — counts, the round-4 half-away rule, and the threshold
    boundary — on a 48-doc sliding-window corpus dense in partial
    overlaps (added r8 alongside the optimization passes over this
    operator; implementation-agnostic so it pins any future rewrite).
    Parametrized over BOTH all-pairs plans: the small-corpus self-join
    and the Bayardo prefix-filtered plan the operator switches to at
    PREFIX_FILTER_MIN_DOCS (forced here via prefix_min_docs=0); the
    0.05 threshold stresses the near-full prefix length n−⌈t·n⌉+1."""
    import hashlib

    from ai_pdf_extraction_spark.operators.dedup import ngram_jaccard_pairs

    words = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(48):
        # overlapping sliding windows of a shared vocabulary: every
        # doc shares shingles with its neighbours, none with far docs
        toks = [words[(d * 3 + j) % 40] for j in range(12)]
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, threshold=0.05, max_shingle_df=None,
            prefix_min_docs=prefix_min_docs,
        ).collect()
    }

    def shingles(text):
        t = text.lower().split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    import math

    want = {}
    sets = {d: shingles(t) for d, t in rows}
    for a in range(48):
        for b in range(a + 1, 48):
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            j4 = math.floor(j * 10_000 + 0.5) / 10_000
            if j4 >= 0.05:
                want[(a, b)] = j4
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=0), (k, got[k], want[k])


def test_ngram_allpairs_prefix_round4_boundary(spark):
    """The emit rule is round4(J) ≥ t, which half-away rounding
    satisfies for true J as low as t − 5e-5 — the prefix plan's
    pruning bounds must therefore use the relaxed t_eff, not t
    (review r8). shared 1601 / union 4003 gives J = 0.399950… →
    round4 = 0.4000, emitted at t = 0.4 by BOTH plans; a t-based size
    filter (nb ≥ 0.4·4003 = 1601.2) would silently drop it from the
    prefix plan. Also pins: prefix_min_docs=0 forces the prefix plan
    even with max_docs=None (no guard probe), and a nonsense
    threshold > 1 yields the empty result instead of a negative
    slice length."""
    from ai_pdf_extraction_spark.operators.dedup import ngram_jaccard_pairs

    words = [f"u{i}" for i in range(4005)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(words[:1603]))],
        "doc_id long, text string",
    )  # 4003 vs 1601 distinct shingles, b's a subset of a's
    for pmd, max_docs in ((10**9, None), (0, None), (0, 100_000)):
        got = [
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                docs, threshold=0.4, max_shingle_df=None,
                max_docs=max_docs, prefix_min_docs=pmd,
            ).collect()
        ]
        assert got == [(1, 2, 0.4)], (pmd, max_docs, got)
    assert (
        ngram_jaccard_pairs(
            docs, threshold=1.1, max_shingle_df=None, prefix_min_docs=0
        ).count()
        == 0
    )


def test_minhash_lsh_finds_near_dups(spark, docs):
    from ai_pdf_extraction_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 4) in pairs  # identical docs always collide in every band
    # LSH output must be a subset of the true-jaccard pairs
    from ai_pdf_extraction_spark.operators.dedup import ngram_jaccard_pairs

    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs <= true_pairs


def test_pure_python_xxh64_matches_spark(spark):
    """The oracle-side XXH64 (oracle/xxh64.py, public xxHash spec) must
    match Spark's F.xxhash64 bit-for-bit — it underwrites the 64-bit
    SimHash golden oracle (q23)."""
    from ai_pdf_extraction_spark.oracle.xxh64 import spark_xxhash64_str

    cases = ["", "a", "abc", "hello world", "x" * 7, "y" * 8, "z" * 31,
             "w" * 32, "q" * 100, "müller straße", "日本語テキスト",
             " spaces  inside ", "tab\tand\nnewline"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for c in cases:
        assert spark_xxhash64_str(c) == got[c], repr(c)


def test_simhash64_twin_edge_whitespace_and_null(spark):
    """F.trim strips only 0x20; null text drops the row Spark-side —
    the golden twin must mirror both (code-review regression)."""
    from ai_pdf_extraction_spark.operators.dedup import simhash_sketch
    from ai_pdf_extraction_spark.oracle.xxh64 import simhash64_rows

    rows = [
        (1, "\tleading tab and trailing newline\n"),
        (2, "  spaces only trimmed  "),
        (3, None),
        (4, "plain middle text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spark_rows = {r["doc_id"]: r["simhash"] for r in simhash_sketch(docs).collect()}
    golden = {g["doc_id"]: g["simhash"] for g in simhash64_rows(rows)}
    assert set(spark_rows) == set(golden) == {1, 2, 4}  # null doc absent in both
    for doc_id in spark_rows:
        assert spark_rows[doc_id] == golden[doc_id], doc_id


def test_simhash64_golden_twin_matches_operator(spark, docs):
    """The single-process SimHash twin (golden generator) must equal
    the Spark operator row-for-row, bands included."""
    from ai_pdf_extraction_spark.operators.dedup import simhash_sketch
    from ai_pdf_extraction_spark.oracle.xxh64 import simhash64_rows

    spark_rows = {r["doc_id"]: r for r in simhash_sketch(docs).collect()}
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    for g in simhash64_rows(rows):
        s = spark_rows[g["doc_id"]]
        assert g["simhash"] == s["simhash"], g["doc_id"]
        for b in range(4):
            assert g[f"band{b}"] == s[f"band{b}"], (g["doc_id"], b)


def test_neardup_clusters_transitive(spark):
    """Connected components must merge transitively: A~B and B~C put
    A,B,C in one cluster even when (A,C) is not itself a pair."""
    from ai_pdf_extraction_spark.operators.dedup import neardup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    words = base.split()
    rows = [
        (1, base),
        (2, " ".join(words[:-1] + ["mu"])),     # near-dup of 1
        (3, " ".join(words[:-2] + ["mu", "nu"])),  # near-dup of 2, farther from 1
        (4, "totally different content about unrelated matters entirely here"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # exact pairs (LSH at k=12/bands=4 can miss ~0.6-jaccard pairs by
    # design; the clustering contract is what's under test here)
    from ai_pdf_extraction_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, threshold=0.4)
    out = {
        r["doc_id"]: r
        for r in neardup_clusters(docs, threshold=0.4, _pairs=pairs).collect()
    }
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == out[3]["cluster_id"] == 1
    assert out[1]["cluster_size"] == 3
    assert out[1]["is_canonical"] is True and out[3]["is_canonical"] is False
    assert out[4]["cluster_id"] == 4 and out[4]["cluster_size"] == 1
    assert out[5]["cluster_id"] == 5  # empty doc is its own singleton


def test_simhash_close_for_near_dups(spark, docs):
    from ai_pdf_extraction_spark.operators.dedup import simhash_sketch

    sk = {r["doc_id"]: r["simhash"] for r in simhash_sketch(docs.filter("text != ''")).collect()}
    assert sk[1] == sk[4]  # identical text → identical sketch
    ham_12 = bin(sk[1] ^ sk[2]).count("1")
    ham_13 = bin(sk[1] ^ sk[3]).count("1")
    assert ham_12 < ham_13, "near-dup must be closer in hamming space"


def test_ann_zero_vector_does_not_crash(spark):
    """A zero-norm embedding (padded/empty doc) must not DIVIDE_BY_ZERO
    the job under ANSI mode; its pairs rank last with null cosine."""
    from ai_pdf_extraction_spark.operators.similarity import cosine_topk

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0]), (4, [1.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(emb, emb.filter("vec_id = 1"), k=3)
    got = {r["neighbor_id"]: r for r in out.collect()}
    assert set(got) == {2, 3, 4}
    assert got[3]["cos"] is None  # zero vector → null, sorted last
    assert got[3]["rank"] == 3
    assert got[4]["rank"] == 1  # cos ≈ 0.707 beats orthogonal 0.0


def test_embedding_near_dup_and_topk(spark):
    from ai_pdf_extraction_spark.operators.dedup import embedding_near_dup_pairs
    from ai_pdf_extraction_spark.operators.similarity import cosine_topk, ivf_topk

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.999, 0.04, 0.0, 0.0], 0),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0], 1),
        (4, [0.0, 0.0, 1.0, 0.0], 1),
        (5, [0.7, 0.7, 0.0, 0.0], 0),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r["id_a"], r["id_b"]): r["cos"] for r in embedding_near_dup_pairs(emb, threshold=0.95).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert len(pairs) == 1

    topk = cosine_topk(emb, emb.filter("vec_id = 1"), k=2).collect()
    assert [r["neighbor_id"] for r in sorted(topk, key=lambda r: r["rank"])] == [2, 5]

    ivf = ivf_topk(emb, emb.filter("vec_id = 1"), k=3).collect()
    ids = {r["neighbor_id"] for r in ivf}
    assert ids == {2, 5}, "IVF must only search the query's cluster"


def test_pq_codebooks_and_adc_topk(spark):
    """Product quantization: training is deterministic, encode maps
    near-identical vectors to the same codes, and ADC top-k ranks a
    query's own cluster ahead of the other cluster (recall against the
    clustered geometry, the property ADC must preserve)."""
    from ai_pdf_extraction_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    # two tight 8-dim clusters
    vecs = [[1.0 + 0.01 * i, 0.02 * i] + [0.0] * 6 for i in range(6)] + [
        [0.02 * i, 1.0 + 0.01 * i] + [0.0] * 6 for i in range(6)
    ]
    b1 = train_pq_codebooks(vecs, m=2, n_codes=4, n_iters=5, seed=3)
    b2 = train_pq_codebooks(vecs, m=2, n_codes=4, n_iters=5, seed=3)
    assert b1 == b2, "same seed must reproduce codebooks exactly"
    assert len(b1) == 2 and all(len(book) == 4 for book in b1)
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(vecs, m=3)

    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    codes = {
        r["vec_id"]: tuple(r["c"])
        for r in emb.select(
            "vec_id", pq_encode(F.col("embedding"), b1).alias("c")
        ).collect()
    }
    # cluster members quantize (at least on the first subspace, which
    # carries the separating coordinates) to cluster-consistent codes
    assert {codes[i][0] for i in range(6)}.isdisjoint(
        {codes[i][0] for i in range(6, 12)}
    )

    out = pq_topk(emb, emb.filter(F.col("vec_id") < 2), b1, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qid in (0, 1):
        top = got[qid]
        assert len(top) == 5
        # all 5 nearest by ADC come from the query's own cluster
        assert all(n < 6 for n in top), (qid, top)


def test_pq_encode_udf_matches_column_form(spark):
    """The pandas-UDF encoder (large-codebook transport) must produce
    BIT-IDENTICAL codes to the plan-literal Column form on the same
    books — same rounding, same first-match ties."""
    from ai_pdf_extraction_spark.operators.similarity import (
        load_embedding_sample,
        pq_encode,
        pq_encode_udf,
        train_pq_codebooks,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    books = train_pq_codebooks(load_embedding_sample(path), m=8, n_codes=16)
    emb = spark.read.parquet(path).limit(200)
    col_codes = {
        r["vec_id"]: list(r["c"])
        for r in emb.select(
            "vec_id", pq_encode(F.col("embedding"), books).alias("c")
        ).collect()
    }
    udf_codes = {
        r["vec_id"]: list(r["c"])
        for r in emb.select(
            "vec_id", pq_encode_udf(books)(F.col("embedding")).alias("c")
        ).collect()
    }
    assert col_codes == udf_codes
    assert len(col_codes) == 200


def test_round_half_away_6_matches_spark_round(spark):
    """The numpy rounding helper used by training/encode twins
    (assign_coarse, pq_encode_udf) must agree with F.round — Spark
    rounds HALF-AWAY (HALF_UP on the double's shortest decimal repr)
    while np.round is banker's, so a distance on a .5e-6 boundary
    would otherwise assign a different coarse cluster at training time
    than at plan time (ADVICE r6). Grid: the boundary LITERALS
    (k+0.5)·1e-6 where the two rules diverge, plus non-boundary
    values. (Doubles a few ulps off a boundary — e.g. 5/2*1e-6 =
    2.4999999999999998e-6 — are out of scope: there even Spark and
    DuckDB disagree with each other, and no computed distance lands on
    them except by the same freak construction.)"""
    import numpy as np

    from ai_pdf_extraction_spark.operators.similarity import (
        _round_half_away_6,
    )

    vals = [
        2.5e-6, -2.5e-6, 4.5e-6, -4.5e-6, 0.5e-6, -0.5e-6, 1.5e-6,
        3.5e-6, 6.5e-6, 1.23456789, -0.9999995, 2.0000005, 0.0, 1e-7,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    spark_rounded = {
        r["x"]: r["r"]
        for r in df.select("x", F.round("x", 6).alias("r")).collect()
    }
    ours = {v: float(_round_half_away_6(v)) for v in vals}
    assert ours == spark_rounded
    # and banker's np.round genuinely diverges on this grid — the bug
    # class the helper exists to close
    bankers = {v: float(np.round(v, 6)) for v in vals}
    assert bankers != spark_rounded


def test_pq_codes_at_rest_parity(spark, tmp_path):
    """Encode-once materialization (PQ codes at rest): ``pq_codes``
    written to parquet and read back must drive pq_topk/ivfpq_topk to
    results IDENTICAL to the inline-encode path — the stored relation
    is the compact index (id + m ints + coarse), never vectors."""
    from ai_pdf_extraction_spark.operators.similarity import (
        ivfpq_topk,
        load_embedding_sample,
        pq_codes,
        pq_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    sample = load_embedding_sample(path)
    books = train_pq_codebooks(sample, m=8, n_codes=16)
    cents = train_ivf_centroids(sample, n_clusters=4, n_iters=5, seed=13)
    emb = spark.read.parquet(path)
    qs = emb.filter(F.col("vec_id") < 3)

    at_rest = str(tmp_path / "codes")
    pq_codes(emb, books, centroids=cents).write.parquet(at_rest)
    codes = spark.read.parquet(at_rest)
    assert set(codes.columns) == {"vec_id", "codes", "coarse"}

    inline = sorted(map(tuple, pq_topk(emb, qs, books, k=5).collect()))
    rest = sorted(
        map(tuple, pq_topk(None, qs, books, k=5, codes=codes).collect())
    )
    assert inline == rest and len(inline) == 15

    inline2 = sorted(
        map(tuple, ivfpq_topk(emb, qs, cents, books, k=5, nprobe=2).collect())
    )
    rest2 = sorted(
        map(
            tuple,
            ivfpq_topk(
                None, qs, cents, books, k=5, nprobe=2, codes=codes
            ).collect(),
        )
    )
    assert inline2 == rest2


def test_ann_index_job_end_to_end(spark, tmp_path):
    """The ANN-index job: build writes codes parquet + quantizer JSON,
    load feeds pq_topk/ivfpq_topk via codes=, and the results equal
    the inline-encode path (the at-rest parity contract, now through
    the job surface)."""
    from ai_pdf_extraction_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
    )
    from jobs.ann_index_job import build_ann_index, load_ann_index

    src = "/root/testdata/sf0.001/embeddings.parquet"
    out = str(tmp_path / "index")
    import os

    os.makedirs(out, exist_ok=True)
    manifest = build_ann_index(spark, src, out, m=8, n_codes=16, n_clusters=4)
    assert manifest["n_vectors"] == spark.read.parquet(src).count()

    codes, cents, books, mf = load_ann_index(spark, out)
    emb = spark.read.parquet(src)
    qs = emb.filter(F.col("vec_id") < 3)
    inline = sorted(map(tuple, pq_topk(emb, qs, books, k=5).collect()))
    rest = sorted(
        map(tuple, pq_topk(None, qs, books, k=5, codes=codes).collect())
    )
    assert inline == rest and len(rest) == 15
    got = ivfpq_topk(
        None, qs, cents, books, k=5, nprobe=2, codes=codes
    ).count()
    assert got > 0


def test_ivf_trained_quantizer(spark):
    """Real coarse quantizer: deterministic across calls, separates
    two obvious clusters, and the trained ivf_topk path returns only
    same-cluster neighbors."""
    from ai_pdf_extraction_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        train_ivf_centroids,
    )
    from pyspark.sql import functions as F

    # two tight clusters around e1 and e2
    vecs = [[1.0 + 0.01 * i, 0.02 * i, 0.0, 0.0] for i in range(6)] + [
        [0.02 * i, 1.0 + 0.01 * i, 0.0, 0.0] for i in range(6)
    ]
    c1 = train_ivf_centroids(vecs, n_clusters=2, n_iters=5, seed=3)
    c2 = train_ivf_centroids(vecs, n_clusters=2, n_iters=5, seed=3)
    assert c1 == c2, "same seed + iters must reproduce centroids exactly"

    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned = emb.select(
        "vec_id",
        ivf_assign(
            F.transform("embedding", lambda x: x.cast("double")), c1
        ).alias("c"),
    ).collect()
    by_id = {r["vec_id"]: r["c"] for r in assigned}
    first = {by_id[i] for i in range(6)}
    second = {by_id[i] for i in range(6, 12)}
    assert len(first) == 1 and len(second) == 1 and first != second

    got = ivf_topk(emb, emb.filter("vec_id = 0"), k=20, centroids=c1).collect()
    assert {r["neighbor_id"] for r in got} == {1, 2, 3, 4, 5}

    # nprobe = n_clusters degenerates to exact brute force
    from ai_pdf_extraction_spark.operators.similarity import cosine_topk

    brute = cosine_topk(emb, emb.filter("vec_id = 0"), k=4).collect()
    probed = ivf_topk(
        emb, emb.filter("vec_id = 0"), k=4, centroids=c1, nprobe=2
    ).collect()
    key = lambda r: (r["rank"], r["neighbor_id"])  # noqa: E731
    assert sorted([(r["rank"], r["neighbor_id"], r["cos"]) for r in probed]) == sorted(
        [(r["rank"], r["neighbor_id"], r["cos"]) for r in brute]
    )


def test_text_analysis_columns(spark):
    from ai_pdf_extraction_spark.operators.text_analysis import (
        lang_guess,
        quality_score,
        token_count,
    )

    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house went to the park",),
            ("der hund und die katze und das haus der wald",),
            ("",),
            ("   ",),
        ],
        "text string",
    )
    rows = df.select(
        token_count("text").alias("n"),
        lang_guess("text").alias("lang"),
        quality_score("text").alias("q"),
    ).collect()
    assert rows[0]["n"] == 12 and rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "de"
    assert rows[2]["n"] == 0 and rows[3]["n"] == 0
    assert 0.0 <= rows[0]["q"] <= 1.0
    assert rows[0]["q"] > rows[2]["q"]


def test_repair_with_rules(spark):
    from ai_pdf_extraction_spark.plans.repair import repair_with_rules

    df = spark.createDataFrame(
        [
            (1, None, 100.0, 23.0),
            (2, 150.0, 100.0, 50.0),
            (3, None, None, 5.0),
        ],
        "id long, total double, subtotal double, tax double",
    )
    out = {r["id"]: r for r in repair_with_rules(df, ["total == subtotal + tax"]).collect()}
    assert out[1]["total"] == 123.0 and out[1]["repaired_fields"] == ["total"]
    assert out[2]["total"] == 150.0 and out[2]["repaired_fields"] == []
    assert out[3]["total"] is None  # operands missing → not derivable


def test_base64_payload_round_trip(spark):
    """F11: binary → base64 → binary round-trip; output is unchunked
    (no CRLF) like the reference's b64encode, even for payloads past
    the 76-char MIME chunk boundary."""
    import base64 as b64mod

    from ai_pdf_extraction_spark.operators.multimodal import (
        base64_payload,
        decode_base64_payload,
    )

    payloads = [b"short", b"x" * 200, bytes(range(256))]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "media_id long, media binary"
    )
    rows = {
        r["media_id"]: r
        for r in df.select(
            "media_id",
            base64_payload("media").alias("media_b64"),
            "media",
        )
        .select(
            "media_id",
            "media_b64",
            (decode_base64_payload("media_b64") == F.col("media")).alias("ok"),
        )
        .collect()
    }
    for i, p in enumerate(payloads):
        assert rows[i]["media_b64"] == b64mod.b64encode(p).decode()
        assert rows[i]["ok"] is True


def test_multimodal_features_and_sampling(spark):
    from ai_pdf_extraction_spark.operators.multimodal import (
        extract_media_features,
        frame_sample_plan,
        sniff_media_type,
    )

    from ai_pdf_extraction_spark.operators.multimodal import sniff_bytes

    rows = [
        (1, b"\x89PNG\r\n" + bytes(range(250))),
        (2, b"\xff\xd8\xff\xe0" + b"jpegdata" * 10),
        (3, b"RIFF\x24\x08\x00\x00WAVEfmt " + b"\x00" * 32),  # real WAV layout
        (4, b""),
        (5, b"RIFF\x00\x01\x00\x00WEBPVP8 " + b"\x00" * 16),  # RIFF container ≠ wav
        (6, b"\x00\x00\x00\x1cftypisom" + b"\x00" * 16),  # ftyp box size 0x1c
        (7, b"RIFF" + b"\x00" * 40),  # RIFF with unknown kind → unknown
        (8, b"GIF89a" + b"\x05\x00\x04\x00\x00\x00\x00"),  # gif header
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    feats = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert feats[1]["format"] == "png" and feats[1]["media_type"] == "image"
    assert feats[2]["format"] == "jpeg"
    assert feats[3]["media_type"] == "audio" and feats[3]["format"] == "wav"
    assert feats[4]["n_bytes"] == 0 and feats[4]["byte_entropy"] == 0.0
    assert feats[5]["media_type"] == "image" and feats[5]["format"] == "webp"
    assert feats[6]["media_type"] == "video" and feats[6]["format"] == "mp4"
    assert feats[7]["media_type"] == "unknown"
    assert feats[8]["media_type"] == "image" and feats[8]["format"] == "gif"
    assert len(feats[1]["histogram"]) == 16
    assert abs(sum(feats[1]["histogram"]) - 1.0) < 1e-4

    # Column sniffing stays in lockstep with the Python sniffer
    sniffed = {
        r["media_id"]: r["fmt"]
        for r in df.select("media_id", sniff_media_type().alias("fmt")).collect()
    }
    for mid, raw in rows:
        expect = sniff_bytes(raw)[1] or "unknown"
        assert sniffed[mid] == expect, (mid, sniffed[mid], expect)

    frames = spark.createDataFrame([(1, 20), (2, 3), (3, 100)], "media_id long, n_frames int")
    sampled = {r["media_id"]: r["sample_frames"] for r in frame_sample_plan(frames, n_frames=6).collect()}
    assert sampled[1][0:2] == [0, 1] and sampled[1][-2:] == [18, 19]
    assert len(sampled[1]) == 6
    assert sampled[2] == [0, 1, 2]  # fewer frames than budget
    assert all(0 <= i < 100 for i in sampled[3]) and len(sampled[3]) == 6
    # n_frames <= 4: NO middle stride (sequence(1,0) is descending —
    # the empty-middle guard); exactly first-2 + last-2
    sampled4 = {
        r["media_id"]: r["sample_frames"]
        for r in frame_sample_plan(frames, n_frames=4).collect()
    }
    assert sampled4[1] == [0, 1, 18, 19]
    assert sampled4[3] == [0, 1, 98, 99]

    from ai_pdf_extraction_spark.operators.multimodal import decode_media

    # png and jpeg now decode for real — a truncated header is
    # malformed input (ValueError), while the remaining codec seams
    # (webp/mp4) stay NotImplemented
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG", "png")
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff", "jpeg")
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFF\x00\x00\x00\x00WEBP", "webp")


def _wav_bytes(rate=8000, samples=(0, 1000, -1000, 2000)) -> bytes:
    import array
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(array.array("h", list(samples) * 1000).tobytes())
    return buf.getvalue()


def test_wav_pcm_widths_decode():
    """8/24/32-bit PCM rms/peak with hand-computed pins: 8-bit is
    UNSIGNED (bias 128), wider widths signed little-endian."""
    import io
    import wave

    from ai_pdf_extraction_spark.operators.multimodal import decode_media

    def wav(width, pcm):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(width)
            wf.setframerate(8000)
            wf.writeframes(pcm)
        return buf.getvalue()

    # 8-bit samples 128,255,0 → biased 0,127,-128
    d = decode_media(wav(1, bytes([128, 255, 0])), "wav")
    assert d["peak"] == 128
    assert d["rms"] == round(((0 + 127**2 + 128**2) / 3) ** 0.5, 3)

    # 24-bit signed LE
    pcm24 = (100000).to_bytes(3, "little", signed=True) + (
        -200000
    ).to_bytes(3, "little", signed=True)
    d = decode_media(wav(3, pcm24), "wav")
    assert d["peak"] == 200000
    assert d["rms"] == round(((100000**2 + 200000**2) / 2) ** 0.5, 3)

    # 32-bit signed LE
    pcm32 = (1 << 30).to_bytes(4, "little", signed=True) + (
        -5
    ).to_bytes(4, "little", signed=True)
    d = decode_media(wav(4, pcm32), "wav")
    assert d["peak"] == 1 << 30


def _bmp_bytes(w=4, h=2) -> bytes:
    import struct

    row = b"\x10\x20\x30" * w
    pad = b"\x00" * ((4 - (3 * w) % 4) % 4)
    pixels = (row + pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    return header + pixels


def test_media_probe_and_stdlib_decode(spark):
    """Stdlib-real media handling: header probes fill the declared
    width/height/duration_ms fields, and wav/bmp DECODE for real —
    NotImplementedError is reserved for the compressed-codec seam."""
    import struct

    from ai_pdf_extraction_spark.operators.multimodal import (
        decode_media,
        media_metadata,
        probe_media,
    )

    wav = _wav_bytes()
    bmp = _bmp_bytes()
    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00" + b"\x00" * 8
    )
    # minimal JPEG: SOI, APP0 (len 4), SOF0 with h=100 w=200
    jpeg = (
        b"\xff\xd8\xff\xe0\x00\x04zz"
        b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 100, 200) + b"\x03" + b"\x00" * 9
    )

    m = probe_media(png)
    assert (m["width"], m["height"]) == (640, 480)
    m = probe_media(jpeg)
    assert (m["width"], m["height"]) == (200, 100)
    m = probe_media(bmp)
    assert (m["format"], m["width"], m["height"]) == ("bmp", 4, 2)
    m = probe_media(wav)
    assert m["format"] == "wav" and m["duration_ms"] == 500  # 4000 frames @ 8kHz

    # webp: all three chunk layouts carry dims in the header
    vp8x = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBPVP8X" + struct.pack("<I", 10)
        + b"\x00" * 4 + (319).to_bytes(3, "little") + (239).to_bytes(3, "little")
    )
    m = probe_media(vp8x)
    assert (m["format"], m["width"], m["height"]) == ("webp", 320, 240)
    bits = 99 | (49 << 14)
    vp8l = (
        b"RIFF" + struct.pack("<I", 17) + b"WEBPVP8L" + struct.pack("<I", 5)
        + b"\x2f" + bits.to_bytes(4, "little")
    )
    m = probe_media(vp8l)
    assert (m["width"], m["height"]) == (100, 50)
    vp8 = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBPVP8 " + struct.pack("<I", 20)
        + b"\x00" * 3 + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
    )
    m = probe_media(vp8)
    assert (m["width"], m["height"]) == (640, 480)

    # mp4: moov/mvhd duration (version 0), no codec involved
    mvhd = b"\x00" * 12 + struct.pack(">II", 1000, 7500) + b"\x00" * 80
    mvhd_box = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    moov = struct.pack(">I", 8 + len(mvhd_box)) + b"moov" + mvhd_box
    mp4 = struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4 + moov
    m = probe_media(mp4)
    assert (m["format"], m["duration_ms"]) == ("mp4", 7500)

    # 64-bit largesize moov: payload starts after the largesize field
    big_moov = (
        struct.pack(">I", 1) + b"moov"
        + struct.pack(">Q", 16 + len(mvhd_box)) + mvhd_box
    )
    m = probe_media(struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4 + big_moov)
    assert m["duration_ms"] == 7500
    # adversarial u64 duration overflowing int64 clamps to null (would
    # otherwise blow up at Arrow conversion, outside the try/except)
    mvhd1 = (
        b"\x01" + b"\x00" * 19 + struct.pack(">I", 1)
        + struct.pack(">Q", 1 << 63) + b"\x00" * 72
    )
    mb1 = struct.pack(">I", 8 + len(mvhd1)) + b"mvhd" + mvhd1
    mv1 = struct.pack(">I", 8 + len(mb1)) + b"moov" + mb1
    m = probe_media(struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4 + mv1)
    assert m["duration_ms"] is None

    dec = decode_media(wav, "wav")
    assert dec["sample_rate"] == 8000 and dec["n_channels"] == 1
    assert dec["peak"] == 2000 and dec["rms"] > 0
    dec = decode_media(bmp, "bmp")
    # 4 px * 3 bytes = 12-byte rows, already 4-aligned: no padding
    assert dec["width"] == 4 and dec["bpp"] == 24 and len(dec["pixels"]) == 24

    # distributed probe via mapInPandas
    df = spark.createDataFrame(
        [(1, wav), (2, bmp), (3, png), (4, b"junk")],
        "media_id long, media binary",
    )
    got = {r["media_id"]: r for r in media_metadata(df).collect()}
    assert got[1]["duration_ms"] == 500 and got[1]["media_type"] == "audio"
    assert got[2]["width"] == 4
    assert got[3]["height"] == 480
    assert got[4]["media_type"] == "unknown" and got[4]["width"] is None

    # REAL resize: bmp shrinks to 2x1 and round-trips the probe;
    # non-bmp formats pass through unresized
    from ai_pdf_extraction_spark.operators.multimodal import (
        resize_bmp,
        resize_media,
    )

    small = resize_bmp(bmp, 2, 1)
    m = probe_media(small)
    assert (m["format"], m["width"], m["height"]) == ("bmp", 2, 1)
    rs = {r["media_id"]: r for r in resize_media(df, 2, 1).collect()}
    assert rs[2]["resized"] and probe_media(bytes(rs[2]["media"]))["width"] == 2
    assert not rs[1]["resized"] and bytes(rs[1]["media"]) == wav

    # truncated pixel buffer: resize must FAIL (passthrough unresized),
    # never emit a header/payload-mismatched BMP
    truncated = bmp[: 54 + 10]
    with pytest.raises(ValueError):
        resize_bmp(truncated, 2, 2)
    df_t = spark.createDataFrame([(9, truncated)], "media_id long, media binary")
    rt = resize_media(df_t, 2, 2).collect()[0]
    assert not rt["resized"] and bytes(rt["media"]) == truncated

    # top-down source (negative height): orientation survives resize
    import struct as _struct

    # 1x2 bottom-up: storage row0=RED(bottom), row1=BLUE(top)
    red, blue = b"\x00\x00\xff\x00", b"\xff\x00\x00\x00"  # padded rows
    bottom_up = (
        _struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, 8, 0, 0, 0, 0)
        + red + blue
    )
    # same logical image as top-down: height -2, storage row0=BLUE(top)
    top_down = (
        _struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, 1, -2, 1, 24, 0, 8, 0, 0, 0, 0)
        + blue + red
    )
    out_bu = decode_media(resize_bmp(bottom_up, 1, 2), "bmp")["pixels"]
    out_td = decode_media(resize_bmp(top_down, 1, 2), "bmp")["pixels"]
    assert out_bu == out_td == red + blue, (out_bu, out_td)


def _png_raw(width, height, color_type, scanlines):
    """Hand-assembled PNG from already-FILTERED scanlines (each
    (filter_byte, payload_bytes)) — built with struct+zlib only, fully
    independent of png_codec's encoder, so decode is pinned against
    the spec, not against shared code (the shared-kernel blind-spot
    rule)."""
    import struct
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = b"".join(bytes([f]) + bytes(p) for f, p in scanlines)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_filters_hand_literals():
    """PNG filter reconstruction pinned by hand-computed pixel values
    for every filter type (None/Sub/Up/Average/Paeth) — arithmetic
    worked out on paper from the PNG spec, NOT from the codec."""
    from ai_pdf_extraction_spark.operators.png_codec import decode_png

    # grayscale 4x4, one row per filter 0..3
    g = _png_raw(4, 4, 0, [
        (0, [1, 2, 3, 4]),
        (1, [5, 1, 1, 1]),      # Sub:  5, 6, 7, 8
        (2, [10, 10, 10, 10]),  # Up:   15, 16, 17, 18
        (3, [1, 1, 1, 1]),      # Avg:  8, 13, 16, 18
    ])
    dec = decode_png(g)
    assert (dec["width"], dec["height"], dec["channels"]) == (4, 4, 1)
    assert dec["pixels"] == bytes(
        [1, 2, 3, 4, 5, 6, 7, 8, 15, 16, 17, 18, 8, 13, 16, 18]
    )

    # grayscale 4x2 exercising Paeth's three predictor branches
    p = _png_raw(4, 2, 0, [
        (0, [100, 50, 25, 10]),
        (4, [1, 2, 3, 4]),  # Paeth: 101, 52, 28, 14
    ])
    assert decode_png(p)["pixels"] == bytes([100, 50, 25, 10, 101, 52, 28, 14])

    # RGB Sub: "left" is the same CHANNEL of the previous pixel
    rgb = _png_raw(2, 1, 2, [(1, [10, 20, 30, 5, 6, 7])])
    dec = decode_png(rgb)
    assert dec["channels"] == 3
    assert dec["pixels"] == bytes([10, 20, 30, 15, 26, 37])

    # RGBA Up across rows
    rgba = _png_raw(1, 2, 6, [(0, [1, 2, 3, 4]), (2, [10, 20, 30, 40])])
    assert decode_png(rgba)["pixels"] == bytes([1, 2, 3, 4, 11, 22, 33, 44])

    # unsupported shapes are loud, distinct seams
    import struct as _s

    with pytest.raises(ValueError, match="PLTE"):  # palette without PLTE
        decode_png(_png_raw(1, 1, 3, [(0, [0])]))
    with pytest.raises(ValueError):  # bad filter type
        decode_png(_png_raw(2, 1, 0, [(9, [0, 0])]))
    with pytest.raises(ValueError):  # IDAT shorter than h*(stride+1)
        decode_png(_png_raw(4, 2, 0, [(0, [1, 2, 3, 4])]))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)
    # zlib-bomb hardening: absurd DECLARED dims refuse before inflating
    # (a tiny crafted IDAT must never materialize gigabytes)
    import struct as _st
    import zlib as _zl

    def _chunk(t, b):
        return (
            _st.pack(">I", len(b)) + t + b
            + _st.pack(">I", _zl.crc32(t + b) & 0xFFFFFFFF)
        )

    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", _st.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 6, 0, 0, 0))
        + _chunk(b"IDAT", _zl.compress(b"\x00" * 1024))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="refusing"):
        decode_png(bomb)


def _png_palette(width, height, depth, plte, scanlines, trns=None):
    """Hand-assembled color-type-3 PNG (filter byte + packed index
    bytes per row, caller packs the bits)."""
    import struct as _s
    import zlib as _z

    def chunk(t, b):
        return (
            _s.pack(">I", len(b)) + t + b
            + _s.pack(">I", _z.crc32(t + b) & 0xFFFFFFFF)
        )

    raw = b"".join(bytes([f]) + bytes(p) for f, p in scanlines)
    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", _s.pack(">IIBBBBB", width, height, depth, 3, 0, 0, 0)
    ) + chunk(b"PLTE", plte)
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", _z.compress(raw)) + chunk(b"IEND", b"")


def test_png_palette_decode_hand_literals():
    """Palette (color type 3) decode pinned by hand-packed index bytes:
    8-bit indices through PLTE, byte-level Sub filtering BEFORE index
    lookup, sub-byte (2-bit) MSB-first unpacking, and tRNS alpha —
    all worked out on paper from the PNG spec."""
    from ai_pdf_extraction_spark.operators.png_codec import decode_png

    plte = bytes([10, 20, 30, 200, 100, 0, 0, 0, 255, 7, 8, 9])

    # 8-bit indices, filter Sub on row 2: raw [1,1] → indices 1,2
    p = _png_palette(2, 2, 8, plte, [(0, [0, 3]), (1, [1, 1])])
    dec = decode_png(p)
    assert (dec["width"], dec["height"], dec["channels"]) == (2, 2, 3)
    assert dec["pixels"] == bytes(
        [10, 20, 30, 7, 8, 9, 200, 100, 0, 0, 0, 255]
    )

    # 2-bit packed, MSB first: byte 0b00_01_10_11 → indices 0,1,2,3
    p2 = _png_palette(4, 1, 2, plte, [(0, [0b00011011])])
    assert decode_png(p2)["pixels"] == bytes(
        [10, 20, 30, 200, 100, 0, 0, 0, 255, 7, 8, 9]
    )

    # tRNS: alpha per palette index, missing entries opaque
    p3 = _png_palette(3, 1, 8, plte, [(0, [0, 1, 2])], trns=bytes([128, 64]))
    dec = decode_png(p3)
    assert dec["channels"] == 4
    assert dec["pixels"] == bytes(
        [10, 20, 30, 128, 200, 100, 0, 64, 0, 0, 255, 255]
    )

    # out-of-range index is malformed input, loudly
    with pytest.raises(ValueError, match="out of range"):
        decode_png(_png_palette(1, 1, 8, plte[:6], [(0, [5])]))

    # decode_payload_summary path: palette pngs report decode_ok
    from ai_pdf_extraction_spark.operators.multimodal import (
        decode_payload_summary,
    )

    s = decode_payload_summary(p)
    assert s["format"] == "png" and s["decode_ok"] and s["n_decoded"] == 12


def test_png_subbyte_gray_and_unpacked_bomb_cap():
    """Review findings r5: (a) sub-byte GRAYSCALE (legal for color
    type 0) decodes with exact 255/(2^d−1) scaling; (b) the zlib-bomb
    cap must bound the UNPACKED size — a 1-bit image packs 8 pixels
    per byte, so the packed-scanline cap alone under-counts 8×."""
    import struct as _s
    import zlib as _z

    from ai_pdf_extraction_spark.operators.png_codec import decode_png

    def chunk(t, b):
        return (
            _s.pack(">I", len(b)) + t + b
            + _s.pack(">I", _z.crc32(t + b) & 0xFFFFFFFF)
        )

    def gray_png(w, h, depth, rows, interlace=0):
        raw = b"".join(b"\x00" + r for r in rows)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _s.pack(">IIBBBBB", w, h, depth, 0, 0, 0, interlace))
            + chunk(b"IDAT", _z.compress(raw))
            + chunk(b"IEND", b"")
        )

    # 1-bit 8x2: rows 0b10110001, 0b01001110 → 0/255 pattern
    dec = decode_png(gray_png(8, 2, 1, [bytes([0b10110001]), bytes([0b01001110])]))
    assert dec["channels"] == 1
    assert dec["pixels"] == bytes(
        [255, 0, 255, 255, 0, 0, 0, 255, 0, 255, 0, 0, 255, 255, 255, 0]
    )
    # 2-bit scaling: 0,1,2,3 → 0,85,170,255
    dec = decode_png(gray_png(4, 1, 2, [bytes([0b00011011])]))
    assert dec["pixels"] == bytes([0, 85, 170, 255])

    # unpacked-size bomb: 1-bit 65528x32768 → packed want = 2^28
    # (passes the packed cap) but h*w unpacked ≈ 2.1 GB — must refuse
    # BEFORE inflating/unpacking
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 65528, 32768, 1, 0, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(b"\x00" * 64))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="refusing"):
        decode_png(bomb)
    # same cap on the palette path
    bomb_p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 65528, 32768, 1, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes(6))
        + chunk(b"IDAT", _z.compress(b"\x00" * 64))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="refusing"):
        decode_png(bomb_p)


def test_png_16bit_strip_to_high_byte():
    """16-bit samples: filters run at the byte level with bpp =
    2·channels, then the HIGH byte of each big-endian sample survives
    (strip-16). Hand literals: a Sub-filtered 16-bit row's left
    neighbor is TWO bytes back."""
    from ai_pdf_extraction_spark.operators.png_codec import decode_png

    raw16 = _png_raw(2, 2, 0, [(0, [0x12, 0x34, 0xAB, 0xCD]),
                               (1, [0xFF, 0x00, 0x01, 0x01])])
    # relabel depth 8 → 16 in IHDR (offset 24 in magic+IHDR layout)
    data = bytearray(raw16)
    assert data[24] == 8
    data[24] = 16
    dec = decode_png(bytes(data))
    assert (dec["width"], dec["height"], dec["channels"]) == (2, 2, 1)
    # row 2 Sub with bpp=2: recon = FF 00, (01+FF)&FF=00 01 → high
    # bytes FF 00
    assert dec["pixels"] == bytes([0x12, 0xAB, 0xFF, 0x00])

    # decode_payload_summary path: 16-bit pngs now report decode_ok
    from ai_pdf_extraction_spark.operators.multimodal import (
        decode_payload_summary,
    )

    s = decode_payload_summary(bytes(data))
    assert s["format"] == "png" and s["decode_ok"] and s["n_decoded"] == 4


def _adam7_png(width, height, depth, color_type, pixel_rows, plte=None, trns=None):
    """Test-local Adam7 PACKER (independent of the codec's
    deinterlacer): split ``pixel_rows`` (unpacked samples, spp bytes
    per pixel for depth 8, one index byte for sub-byte depths) into
    the seven passes per PNG spec §8.2, pack each with filter 0,
    zlib the concatenation, assemble with interlace=1."""
    import struct as _s
    import zlib as _z

    spp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def chunk(t, b):
        return (
            _s.pack(">I", len(b)) + t + b
            + _s.pack(">I", _z.crc32(t + b) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        pw = max(0, (width - x0 + dx - 1) // dx)
        ph = max(0, (height - y0 + dy - 1) // dy)
        if not (pw and ph):
            continue
        for i in range(ph):
            y = y0 + i * dy
            samples = []
            for j in range(pw):
                x = x0 + j * dx
                samples.append(pixel_rows[y][x * spp : (x + 1) * spp])
            row = b"".join(samples)
            if depth < 8:  # pack indices MSB-first
                packed = bytearray((pw * depth + 7) // 8)
                for j, b in enumerate(row):
                    packed[j * depth // 8] |= b << (8 - depth * (j % (8 // depth) + 1))
                row = bytes(packed)
            raw += b"\x00" + row
    out = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 1))
    )
    if plte is not None:
        out += chunk(b"PLTE", plte)
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", _z.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_adam7_interlace_decode():
    """Adam7: a test-local pass packer (independent implementation of
    the spec's pass geometry) builds interlaced files whose decode
    must reproduce the original raster exactly — grayscale 8×8, RGB
    with odd dims (partial/empty passes), and 2-bit palette+tRNS."""
    import random

    from ai_pdf_extraction_spark.operators.png_codec import decode_png

    # grayscale 8x8, every pixel distinct
    rows = [bytes(y * 16 + x for x in range(8)) for y in range(8)]
    dec = decode_png(_adam7_png(8, 8, 8, 0, rows))
    assert (dec["width"], dec["height"], dec["channels"]) == (8, 8, 1)
    assert dec["pixels"] == b"".join(rows)

    # RGB 5x3: passes 1-2 are single-pixel or empty, 3 empty, etc.
    rng = random.Random(9)
    rows = [bytes(rng.randrange(256) for _ in range(5 * 3)) for _ in range(3)]
    dec = decode_png(_adam7_png(5, 3, 8, 2, rows))
    assert (dec["width"], dec["height"], dec["channels"]) == (5, 3, 3)
    assert dec["pixels"] == b"".join(rows)

    # 2-bit palette 7x5 with tRNS → RGBA
    plte = bytes([10, 20, 30, 200, 100, 0, 0, 0, 255, 7, 8, 9])
    idx_rows = [bytes(rng.randrange(4) for _ in range(7)) for _ in range(5)]
    trns = bytes([255, 128, 64])
    dec = decode_png(_adam7_png(7, 5, 2, 3, idx_rows, plte=plte, trns=trns))
    assert dec["channels"] == 4
    expected = bytearray()
    for row in idx_rows:
        for i in row:
            expected += plte[i * 3 : i * 3 + 3]
            expected.append(trns[i] if i < len(trns) else 255)
    assert dec["pixels"] == bytes(expected)

    # truncated interlaced data is malformed, loudly
    good = _adam7_png(8, 8, 8, 0, [bytes(8) for _ in range(8)])
    import pytest as _pytest
    import struct as _s
    import zlib as _z

    short = _adam7_png(8, 8, 8, 0, [bytes(8) for _ in range(8)])
    # rebuild with half the IDAT payload
    i = short.find(b"IDAT") - 4
    ln = _s.unpack(">I", short[i : i + 4])[0]
    body = short[i + 8 : i + 8 + ln]
    inner = _z.decompress(body)[: 20]
    newbody = _z.compress(inner)
    rebuilt = (
        short[:i]
        + _s.pack(">I", len(newbody)) + b"IDAT" + newbody
        + _s.pack(">I", _z.crc32(b"IDAT" + newbody) & 0xFFFFFFFF)
        + short[i + 12 + ln :]
    )
    with _pytest.raises(ValueError, match="short pixel data"):
        decode_png(rebuilt)
    assert decode_png(good)["pixels"] == bytes(64)


def test_gif_decode_hand_literals():
    """GIF LZW decode pinned by a file assembled BYTE BY BYTE in the
    test, with the LZW bitstream (clear,1,clear,2,clear,eoi at 3-bit
    codes, LSB-first) hand-packed on paper — fully independent of
    gif_codec's encoder (shared-kernel blind-spot rule)."""
    import struct as _s

    from ai_pdf_extraction_spark.operators.gif_codec import decode_gif
    from ai_pdf_extraction_spark.operators.multimodal import (
        decode_media,
        probe_media,
        sniff_bytes,
    )

    palette = bytes([9, 8, 7, 255, 0, 0, 0, 255, 0, 1, 2, 3])
    # codes 4,1,4,2,4,5 @3 bits LSB-first → bytes 0x0C 0xC5 0x02
    gif = (
        b"GIF89a"
        + _s.pack("<HHBBB", 2, 1, 0x81, 0, 0)  # screen: 2x1, 4-color GCT
        + palette
        + b"\x2c" + _s.pack("<HHHHB", 0, 0, 2, 1, 0)
        + b"\x02"  # LZW min code size
        + b"\x03\x0c\xc5\x02" + b"\x00"  # one 3-byte sub-block
        + b"\x3b"
    )
    assert sniff_bytes(gif) == ("image", "gif")
    m = probe_media(gif)
    assert (m["format"], m["width"], m["height"]) == ("gif", 2, 1)
    dec = decode_gif(gif)
    assert (dec["width"], dec["height"], dec["channels"]) == (2, 1, 3)
    assert dec["pixels"] == bytes([255, 0, 0, 0, 255, 0])  # idx 1 then 2
    assert decode_media(gif, "gif")["pixels"] == dec["pixels"]

    # real-LZW dictionary growth: a run "aaaa" compresses as
    # clear, a(0), 4(->"aa"... wait codes: after clear, 0, then code 6
    # is prev+first = "aa"; stream clear,0,6,7? — instead pin via a
    # reference bitstream: codes 4,0,6,5 decode to "a aa" = 3 px wide?
    # Keep it simple and byte-exact: codes 4,0,6,5 @3bit LSB-first:
    # 4|0<<3|(6&3)<<6 = 0x84 wait 6=110b low2=10 -> 0x84|0x80=0x..
    # (worked on paper): byte0 = 100b | 000<<3 | 10<<6 = 0b10000100
    # byte1 = 1 (bit2 of code 6) | 101b<<1 = 0b00001011
    gif2 = (
        b"GIF89a"
        + _s.pack("<HHBBB", 3, 1, 0x81, 0, 0)
        + palette
        + b"\x2c" + _s.pack("<HHHHB", 0, 0, 3, 1, 0)
        + b"\x02"
        + b"\x02\x84\x0b" + b"\x00"
        + b"\x3b"
    )
    dec2 = decode_gif(gif2)
    # code 0 → idx 0; code 6 (= table growth) → "00" → pixels 0,0,0 ×3
    assert dec2["pixels"] == bytes([9, 8, 7] * 3)

    # interlaced flag: rows land via the 4-pass shuffle
    # (4 rows of 1px: sequential passes fill rows 0,4.. then 2, then 1,3)
    pal2 = bytes([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    from ai_pdf_extraction_spark.operators.gif_codec import encode_gif

    flat = encode_gif(1, 4, pal2, bytes([0, 1, 2, 3]))
    # flip the interlace bit and reorder source rows pass-wise:
    # pass rows for h=4 are [0, 2, 1, 3] → storage order 0,2,1,3
    inter = encode_gif(1, 4, pal2, bytes([0, 2, 1, 3]))
    idx_desc = inter.index(b"\x2c")
    inter = (
        inter[: idx_desc + 9]
        + bytes([inter[idx_desc + 9] | 0x40])
        + inter[idx_desc + 10 :]
    )
    assert decode_gif(inter)["pixels"] == decode_gif(flat)["pixels"]


def test_gif_encode_decode_roundtrip():
    """Encoder/decoder roundtrip across palette sizes and dims,
    including multi-sub-block streams (>255 bytes of LZW data)."""
    import random

    from ai_pdf_extraction_spark.operators.gif_codec import (
        decode_gif,
        encode_gif,
    )

    rng = random.Random(3)
    for bits in (1, 2, 4, 8):
        n = 1 << bits
        palette = bytes(rng.randrange(256) for _ in range(3 * n))
        w, h = rng.randint(1, 40), rng.randint(1, 30)
        idx = bytes(rng.randrange(n) for _ in range(w * h))
        dec = decode_gif(encode_gif(w, h, palette, idx))
        assert (dec["width"], dec["height"]) == (w, h)
        expect = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
        assert dec["pixels"] == expect


def test_media_decode_features_stage(spark):
    """Distributed decode stage: wav/bmp/png/gif really decode on the
    executors (md5 over decoded samples matches the single-process
    twin); seams and junk report decode_ok=false with null fields."""
    from ai_pdf_extraction_spark.operators.gif_codec import encode_gif
    from ai_pdf_extraction_spark.operators.multimodal import (
        decode_payload_summary,
        media_decode_features,
    )
    from ai_pdf_extraction_spark.operators.png_codec import encode_png

    rows = [
        (1, _wav_bytes()),
        (2, _bmp_bytes()),
        (3, encode_png(2, 2, 3, bytes(range(12)))),
        (4, encode_gif(2, 1, bytes(12), bytes([1, 2]))),
        (5, b"\xff\xd8\xff" + b"x" * 20),  # jpeg: seam
        (6, b"junk"),
        (7, b"\x89PNG\r\n\x1a\n" + b"\x00" * 4),  # malformed png
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: r for r in media_decode_features(df).collect()}
    for mid, raw in rows:
        twin = decode_payload_summary(raw)
        for k in ("format", "decode_ok", "width", "height", "n_decoded", "payload_md5"):
            assert got[mid][k] == twin[k], (mid, k, got[mid][k], twin[k])
    assert got[1]["decode_ok"] and got[2]["decode_ok"]
    assert got[3]["decode_ok"] and got[3]["n_decoded"] == 12
    assert got[4]["decode_ok"] and (got[4]["width"], got[4]["height"]) == (2, 1)
    assert not got[5]["decode_ok"] and got[5]["format"] == "jpeg"
    assert not got[6]["decode_ok"] and got[6]["format"] is None
    assert not got[7]["decode_ok"] and got[7]["payload_md5"] is None

    # wav bomb: a header DECLARING ~4 GB of frames over tiny data must
    # refuse (ValueError) rather than trust the count — and the stage
    # reports decode_ok=false
    import struct as _s

    from ai_pdf_extraction_spark.operators.multimodal import decode_media

    bomb = (
        b"RIFF" + _s.pack("<I", 36 + 8) + b"WAVE"
        + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + _s.pack("<I", 0xF0000000) + b"\x00" * 8
    )
    with pytest.raises(ValueError, match="refusing wav"):
        decode_media(bomb, "wav")
    assert decode_payload_summary(bomb)["decode_ok"] is False


def test_png_encode_resize_roundtrip(spark):
    """encode→decode round-trips pixels exactly; nearest-neighbor
    resize duplicates pixels by hand-checkable index arithmetic; the
    distributed resize stage now really resizes PNG payloads."""
    from ai_pdf_extraction_spark.operators.multimodal import (
        decode_media,
        probe_media,
        resize_media,
    )
    from ai_pdf_extraction_spark.operators.png_codec import (
        decode_png,
        encode_png,
        resize_png,
    )

    # 2x2 RGB: distinct corner colors
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    data = encode_png(2, 2, 3, px)
    assert decode_png(data)["pixels"] == px
    assert decode_media(data, "png")["width"] == 2  # wired into decode_media

    # upscale 2x2 → 4x4: each source pixel becomes a 2x2 block
    up = decode_png(resize_png(data, 4, 4))
    assert (up["width"], up["height"]) == (4, 4)
    row0 = up["pixels"][:12]
    assert row0 == bytes([255, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0])
    row3 = up["pixels"][36:48]
    assert row3 == bytes([0, 0, 255, 0, 0, 255, 9, 9, 9, 9, 9, 9])

    # downscale picks the top-left sample of each block back out
    down = decode_png(resize_png(resize_png(data, 4, 4), 2, 2))
    assert down["pixels"] == px

    # distributed: png rows resize for real, junk passes through
    df = spark.createDataFrame(
        [(1, data), (2, b"junk")], "media_id long, media binary"
    )
    rs = {r["media_id"]: r for r in resize_media(df, 4, 4).collect()}
    assert rs[1]["resized"]
    m = probe_media(bytes(rs[1]["media"]))
    assert (m["format"], m["width"], m["height"]) == ("png", 4, 4)
    assert not rs[2]["resized"]


def test_lang_detect_wide(spark):
    """Wide language ID: every snippet maps to its expected language
    (script branches AND Latin-marker branches), and accuracy on the
    en/de synthetic corpus is pinned — a regression that breaks either
    the charset priority or the marker argmax fails loudly."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from ai_pdf_extraction_spark.corpus.generate import generate_pages
    from ai_pdf_extraction_spark.operators.text_analysis import lang_detect

    rows = [(lang, text) for lang, text in entrymod._LANG_SAMPLES]
    # plus: Japanese with heavy kanji must still be ja (kana priority
    # over the Han range), and a mostly-English doc with one stray CJK
    # char must stay en (the 5% share floor)
    rows.append(("ja", "日本語の文章で漢字が多い場合でも仮名で判定する。"))
    rows.append(
        ("en", "the quick brown fox and the lazy dog of the farm 中 "
               "went to the market and back to the barn again")
    )
    df = spark.createDataFrame(rows, "expected string, sample string")
    got = df.select("expected", lang_detect(F.col("sample")).alias("got")).collect()
    for r in got:
        assert r["got"] == r["expected"], (r["expected"], r["got"])

    # stopword-bearing synthetic docs across all 8 Latin languages:
    # markers embedded in noise must win the argmax every time (the
    # generator's crawler text is tech vocab without stopwords — 'und'
    # is the CORRECT answer there, so it can't serve as this oracle)
    import random

    from ai_pdf_extraction_spark.operators.text_analysis import (
        EXTRA_MARKERS,
        LANG_MARKERS,
    )

    rng = random.Random(7)
    noise = "alpha beta gamma delta omega sigma".split()
    docs = []
    for i in range(200):
        markers_by_lang = {**LANG_MARKERS, **EXTRA_MARKERS}
        lang = sorted(markers_by_lang)[i % len(markers_by_lang)]
        words = []
        for m in markers_by_lang[lang] * 3:
            words.append(rng.choice(noise))
            words.append(m.strip())
        docs.append((lang, " ".join(words)))
    sdf = spark.createDataFrame(docs, "lang string, text string")
    agg = sdf.select(
        (lang_detect(F.col("text")) == F.col("lang")).cast("int").alias("hit")
    ).agg(F.avg("hit").alias("acc")).collect()[0]
    assert agg["acc"] == 1.0, agg["acc"]

    # real crawler text (Latin tech vocab): an accidental stopword may
    # fire a Latin marker, but no SCRIPT language may ever claim it
    from ai_pdf_extraction_spark.operators.text_analysis import SCRIPT_RANGES

    pages = [r for r in generate_pages(60, seed=11) if r["text"]]
    pdf = spark.createDataFrame([(r["text"],) for r in pages], "text string")
    vals = {r["g"] for r in pdf.select(lang_detect(F.col("text")).alias("g")).collect()}
    assert vals.isdisjoint(SCRIPT_RANGES), vals
    assert "und" in vals  # stopword-free docs stay undetermined


def test_lang_detect_trigram(spark):
    """Trigram evidence: every trigram-hard snippet (no whole-word
    stopword markers — the q52 model says 'und') identifies correctly
    via sub-word trigrams; marker-bearing and script snippets keep
    their q52 answers (markers dominate at MARKER_WEIGHT); the plan
    stays single-evaluation per literal (no-CSE guard)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from ai_pdf_extraction_spark.operators.text_analysis import (
        LANG_TRIGRAMS,
        lang_detect,
        lang_detect_trigram,
    )

    hard = list(entrymod._TRIGRAM_SAMPLES)
    df = spark.createDataFrame(hard, "expected string, sample string")
    got = df.select(
        "expected",
        lang_detect(F.col("sample")).alias("marker_only"),
        lang_detect_trigram(F.col("sample")).alias("got"),
    ).collect()
    for r in got:
        assert r["got"] == r["expected"], (r["expected"], r["got"])
        # the snippets are genuinely trigram-hard: whole-word markers
        # alone must NOT already give the right answer
        assert r["marker_only"] != r["expected"], r["expected"]

    # q52's snippets (script + marker-bearing) keep their answers
    easy = spark.createDataFrame(
        list(entrymod._LANG_SAMPLES), "expected string, sample string"
    )
    got = easy.select(
        "expected", lang_detect_trigram(F.col("sample")).alias("got")
    ).collect()
    for r in got:
        assert r["got"] == r["expected"], (r["expected"], r["got"])

    # no-CSE guard: every trigram literal appears exactly once
    plan = (
        spark.createDataFrame([("x",)], "text string")
        .select(lang_detect_trigram("text").alias("g"))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    for tris in LANG_TRIGRAMS.values():
        for t in tris:
            needle = f", {t}, )"
            assert plan.count(needle) == 1, (t, plan.count(needle))


def test_gopher_quality_rules(spark):
    """Each Gopher rule trips on its crafted snippet and ONLY that
    rule's signal moves (independent expectations, not the oracle):
    the stopword-rich doc passes all rules; bullets, ellipses, hashes,
    numeric words, and brevity each fail."""
    from pyspark.sql import functions as F

    from ai_pdf_extraction_spark.operators.text_analysis import gopher_quality

    rows = [
        (0, "the data to be of and that have with " * 20),
        (1, "• one\n• two\n- three\n* four"),
        (2, "first line...\nsecond part...\nthird bit..."),
        (3, "# # # # # # tag soup with hashes"),
        (4, "12345 67890 00000 11111 22222"),
        (5, "tiny"),
        (6, "superlongword " * 60),  # mean word length 13 > 10
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert got[0]["gopher_pass"] is True
    assert got[0]["n_words"] == 180 and got[0]["stop_hits"] == 8
    assert abs(got[0]["mean_word_len"] - 28 * 20 / 180) < 1e-3
    assert got[1]["bullet_frac"] == 1.0 and not got[1]["gopher_pass"]
    assert got[2]["ellipsis_frac"] == 1.0 and not got[2]["gopher_pass"]
    assert got[3]["symbol_ratio"] > 0.1 and not got[3]["gopher_pass"]
    assert got[4]["alpha_frac"] == 0.0 and not got[4]["gopher_pass"]
    assert got[5]["n_words"] == 1 and not got[5]["gopher_pass"]
    assert got[6]["mean_word_len"] > 10 and not got[6]["gopher_pass"]

    # HOF-projection discipline: the word/line arrays must be produced
    # by a projection, not re-split inside every lambda — the split
    # literals appear exactly once each in the analyzed plan
    plan = gopher_quality(df)._jdf.queryExecution().analyzed().toString()
    assert plan.count("split(text") <= 3  # words + lines + nothing inlined


def test_lang_plans_evaluate_each_marker_once(spark):
    """Plan-size regression guard for the no-CSE blow-up: each marker
    literal must appear EXACTLY ONCE in the analyzed plan of both
    language detectors (the greatest+when-chain form inlines each
    ~2·n_langs times — measured 36× slower)."""
    from pyspark.sql import functions as F

    from ai_pdf_extraction_spark.operators.text_analysis import (
        EXTRA_MARKERS,
        LANG_MARKERS,
        lang_detect,
        lang_guess,
    )

    df = spark.createDataFrame([("x",)], "text string")
    for expr, markers in (
        (lang_guess("text"), LANG_MARKERS),
        (lang_detect("text"), {**LANG_MARKERS, **EXTRA_MARKERS}),
    ):
        plan = (
            df.select(expr.alias("g"))
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        for ms in markers.values():
            for m in ms:
                # the marker only ever appears inside its replace()
                # call, printed as ", <marker>, )" — a bare count
                # would false-positive on e.g. the Greek script
                # branch's "THEN el ELSE"
                needle = f", {m}, )"
                assert plan.count(needle) == 1, (m, plan.count(needle))


def test_winnowing_fingerprints(spark):
    from ai_pdf_extraction_spark.operators.text_analysis import (
        winnowing_fingerprints,
        winnowing_fingerprints_py,
    )

    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox jumps over the lazy cat"
    fa, fb = winnowing_fingerprints_py(a), winnowing_fingerprints_py(b)
    assert fa and fa == sorted(set(fa))
    overlap = len(set(fa) & set(fb)) / len(set(fa) | set(fb))
    assert overlap > 0.5, "near-identical texts share most fingerprints"
    assert winnowing_fingerprints_py("short") == []

    df = spark.createDataFrame([(a,), (b,), (None,)], "text string")
    rows = df.select(winnowing_fingerprints("text").alias("fp")).collect()
    assert rows[0]["fp"] == fa  # UDF identical to the pure function
    assert rows[2]["fp"] == []


def test_url_canonicalization(spark):
    from ai_pdf_extraction_spark.operators.urls import canonicalize_url

    cases = [
        ("HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&q=1#frag",
         "https://www.example.com/A/B?q=1"),
        ("http://Host.org:80//a//b/", "http://host.org/a/b"),
        ("https://h.com/path/?fbclid=123", "https://h.com/path"),
        ("https://h.com/", "https://h.com/"),  # root slash survives
        ("https://h.com/a?gclid=1&utm_medium=m&keep=1", "https://h.com/a?keep=1"),
        ("not a url at all", "not a url at all"),
        # round-2 review regressions:
        # a literal '&' in the PATH must never be promoted to '?'
        ("https://example.com/foo&bar", "https://example.com/foo&bar"),
        ("http://h/a&b?q=1", "http://h/a&b?q=1"),
        # duplicate-slash collapse is path-only; query values keep '//'
        ("https://a.com/p?u=http://x.com//y", "https://a.com/p?u=http://x.com//y"),
        ("https://a.com//p//q?u=http://x.com//y",
         "https://a.com/p/q?u=http://x.com//y"),
        # leading tracking run followed by a real param
        ("https://h.com/a?utm_a=1&utm_b=2&q=1", "https://h.com/a?q=1"),
        # only tracking params → query gone entirely
        ("https://h.com/a?utm_a=1&utm_b=2", "https://h.com/a"),
        # round-5 review regressions: a tracking-LOOKING sequence after
        # a literal '&' in the PATH (no '?') must stay untouched —
        # the old '&'-anywhere strip ate '/rest' too
        ("http://a/b&gclid=x/rest", "http://a/b&gclid=x/rest"),
        # ...while the same sequence genuinely in the query strips
        ("http://a/b?x=1&gclid=x", "http://a/b?x=1"),
        # tracking first + keep later, with a path '&' upstream
        ("http://a/b&c?utm_a=1&keep=2", "http://a/b&c?keep=2"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    for (raw, want), actual in zip(cases, got):
        assert actual == want, f"{raw!r}: {actual!r} != {want!r}"


def test_url_canonicalization_idempotent(spark):
    """Canonicalization must be a FIXPOINT: canonical(canonical(u)) ==
    canonical(u) over a combinatorial sweep of schemes, ports, paths
    (incl. literal '&', '//', trailing '/'), queries (tracking mixes,
    url-valued params) and fragments — a second pass changing anything
    means two crawls of one page could key differently."""
    import itertools

    from pyspark.sql import functions as F

    from ai_pdf_extraction_spark.operators.urls import canonicalize_url

    schemes = ["http://", "HTTPS://", ""]
    hosts = ["Example.COM", "h.com:443", "a.b.c:80"]
    paths = ["/", "/a//b/", "/x&gclid=1/y", "/p", ""]
    queries = ["", "?utm_a=1", "?utm_a=1&q=2", "?q=http://x//y", "?a=1&fbclid=2&b=3"]
    frags = ["", "#frag"]
    urls = [
        "".join(parts)
        for parts in itertools.product(schemes, hosts, paths, queries, frags)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select("url", canonicalize_url("url").alias("c1"))
    rows = once.select(
        "url", "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    bad = [(r["url"], r["c1"], r["c2"]) for r in rows if r["c1"] != r["c2"]]
    assert not bad, bad[:5]


def test_ivfpq_topk_composes_quantizers(spark):
    """IVF-PQ: every returned neighbor shares the query's coarse
    cluster, and its ADC score equals the plain-PQ score for the same
    pair (the composition restricts candidates, never rescores)."""
    from pyspark.sql import functions as F

    from ai_pdf_extraction_spark.operators.similarity import (
        ivf_assign,
        ivfpq_topk,
        pq_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    vecs = [[1.0 + 0.01 * i, 0.02 * i] + [0.0] * 6 for i in range(8)] + [
        [0.02 * i, 1.0 + 0.01 * i] + [0.0] * 6 for i in range(8)
    ]
    cents = train_ivf_centroids(vecs, n_clusters=2, n_iters=5, seed=3)
    books = train_pq_codebooks(vecs, m=2, n_codes=4, n_iters=5, seed=3)
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    qs = emb.filter(F.col("vec_id").isin(0, 8))
    got = ivfpq_topk(emb, qs, cents, books, k=4, nprobe=1).collect()
    clusters = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id",
            ivf_assign(
                F.transform("embedding", lambda x: x.cast("double")), cents
            ).alias("c"),
        ).collect()
    }
    pq_scores = {
        (r["query_id"], r["neighbor_id"]): r["approx_d2"]
        for r in pq_topk(emb, qs, books, k=16).collect()
    }
    assert {r["query_id"] for r in got} == {0, 8}
    for r in got:
        assert clusters[r["neighbor_id"]] == clusters[r["query_id"]], r
        assert pq_scores[(r["query_id"], r["neighbor_id"])] == r["approx_d2"]


def test_granule_dedup_invariants(spark):
    """Property shapes: with all-unique granules nothing is lost
    (reassembly is the identity), and total kept granules across the
    corpus equals the number of DISTINCT granules in it."""
    from pyspark.sql import functions as F

    from ai_pdf_extraction_spark.operators.dedup import granule_dedup

    rows = [
        (1, "alpha one. beta two. gamma three"),
        (2, "delta four. epsilon five"),
        (3, "zeta six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in granule_dedup(df).collect()}
    for i, text in rows:
        assert out[i]["dedup_text"] == text  # identity when unique
        assert out[i]["n_kept"] == out[i]["n_granules"]

    dups = [
        (1, "shared one. only a"),
        (2, "shared one. only b. shared two"),
        (3, "shared two. shared one"),
    ]
    df2 = spark.createDataFrame(dups, "doc_id long, text string")
    got = granule_dedup(df2)
    total_kept = got.agg(F.sum("n_kept")).collect()[0][0]
    assert total_kept == 4  # distinct granules: shared one/two, only a/b


def test_contamination_monotonic_in_benchmark(spark):
    """Growing the benchmark can only ADD contamination flags, never
    remove them — the monotonicity a decontamination pass must have."""
    from pyspark.sql import functions as F

    from ai_pdf_extraction_spark.operators.dedup import contamination_flags

    docs = spark.createDataFrame(
        [(i, f"filler{i} word{i} more{i} alpha{i % 3} beta{i % 3} gamma{i % 3}")
         for i in range(12)],
        "doc_id long, text string",
    )
    small = spark.createDataFrame(
        [(100, "alpha0 beta0 gamma0")], "bench_id long, text string"
    )
    big = small.unionAll(
        spark.createDataFrame(
            [(101, "alpha1 beta1 gamma1")], "bench_id long, text string"
        )
    )
    f_small = {r["doc_id"] for r in contamination_flags(docs, small, n=3)
               .filter("contaminated").collect()}
    f_big = {r["doc_id"] for r in contamination_flags(docs, big, n=3)
             .filter("contaminated").collect()}
    assert f_small <= f_big and len(f_big) > len(f_small)


def test_all_pairs_guard_refuses_large_corpora(spark, docs):
    """The two all-pairs correctness baselines must refuse corpora
    above max_docs (their docstrings designate the bucketed twins as
    the scale plans; the guard is the enforcement — verdict r5 #7).
    The LSH verify path is candidate-restricted, not all-pairs, so the
    guard must NOT fire there."""
    import pytest

    from ai_pdf_extraction_spark.operators.dedup import (
        embedding_near_dup_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(docs, threshold=0.5, max_docs=2).collect()
    # escape hatch: explicit opt-in to the quadratic plan
    assert ngram_jaccard_pairs(docs, threshold=0.5, max_docs=None).count() > 0

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="embedding_near_dup_pairs_lsh"):
        embedding_near_dup_pairs(emb, max_docs=3).collect()
    assert embedding_near_dup_pairs(emb, threshold=0.999, max_docs=None).count() == 0

    # candidate-restricted verify (the LSH path) is linear in
    # candidates, not all-pairs — the guard must not fire even at
    # max_docs=0 when _candidates is given
    cands = spark.createDataFrame([(1, 4)], "id_a long, id_b long")
    verified = ngram_jaccard_pairs(
        docs, threshold=0.5, max_docs=0, _candidates=cands
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in verified} == {(1, 4)}
    # ... and the composed LSH operator (which routes through that
    # path) still runs on a corpus the baseline would refuse
    assert minhash_lsh_pairs(docs, threshold=0.5).count() > 0


def test_residual_ivfpq_recall_and_parity(spark, tmp_path):
    """Residual IVF-PQ (Jégou 2011 §III, the FAISS default): at the
    SAME (m=8, 16 codes) budget, residual-trained codes must beat
    raw-vector codes on recall@10 over clustered data — the codewords
    stop re-describing coarse structure (measured 0.66 vs 0.42 on this
    fixture; the pin leaves slack for none). Also pins: at-rest
    residual codes == inline residual encode, the residual guard, and
    nprobe>1 probe-exploded LUTs staying consistent."""
    import numpy as np

    from ai_pdf_extraction_spark.operators.similarity import (
        ivfpq_topk,
        pq_codes,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    rng = np.random.default_rng(42)
    K, d, n, k = 8, 32, 400, 10
    centers = rng.normal(0, 5, (K, d))
    X = np.vstack([centers[i % K] + rng.normal(0, 0.8, d) for i in range(n)])
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    Xf = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)

    sample = [list(map(float, v)) for v in Xf]
    cents = train_ivf_centroids(sample, n_clusters=K)
    books_raw = train_pq_codebooks(sample, m=8, n_codes=16)
    books_res = train_pq_codebooks(sample, m=8, n_codes=16, centroids=cents)

    n_q = 20
    queries = emb.filter(F.col("vec_id") < n_q)
    d2 = ((Xf[:n_q][:, None, :] - Xf[None, :, :]) ** 2).sum(axis=2)
    truth = {
        qi: set(
            int(j)
            for j in sorted(
                (j for j in range(n) if j != qi), key=lambda j: (d2[qi][j], j)
            )[:k]
        )
        for qi in range(n_q)
    }

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return float(
            np.mean([len(got.get(q, set()) & truth[q]) / k for q in range(n_q)])
        )

    r_raw = recall(ivfpq_topk(emb, queries, cents, books_raw, k=k, nprobe=1))
    r_res = recall(
        ivfpq_topk(emb, queries, cents, books_res, k=k, nprobe=1, residual=True)
    )
    assert r_res > r_raw + 0.1, (
        f"residual recall {r_res:.3f} must beat raw {r_raw:.3f} at the "
        "same budget on clustered data"
    )
    assert r_res >= 0.6  # measured 0.66; regression floor

    # at-rest residual codes drive identical results to inline encode
    at_rest = str(tmp_path / "res_codes")
    pq_codes(emb, books_res, centroids=cents, residual=True).write.parquet(at_rest)
    codes = spark.read.parquet(at_rest)
    inline = sorted(
        map(
            tuple,
            ivfpq_topk(
                emb, queries, cents, books_res, k=k, nprobe=2, residual=True
            ).collect(),
        )
    )
    rest = sorted(
        map(
            tuple,
            ivfpq_topk(
                None, queries, cents, books_res, k=k, nprobe=2, residual=True,
                codes=codes,
            ).collect(),
        )
    )
    assert inline == rest and len(inline) == n_q * k

    # guard: residual encode demands centroids
    import pytest

    with pytest.raises(ValueError, match="residual"):
        pq_codes(emb, books_res, residual=True)


def test_ann_index_job_residual_mode(spark, tmp_path):
    """--residual builds a residual index whose manifest records the
    flag, and load + query(residual=True) equals the inline path."""
    import os

    from ai_pdf_extraction_spark.operators.similarity import ivfpq_topk
    from jobs.ann_index_job import build_ann_index, load_ann_index

    src = "/root/testdata/sf0.001/embeddings.parquet"
    out = str(tmp_path / "index_res")
    os.makedirs(out, exist_ok=True)
    manifest = build_ann_index(
        spark, src, out, m=8, n_codes=16, n_clusters=4, residual=True
    )
    assert manifest["residual"] is True

    codes, cents, books, mf = load_ann_index(spark, out)
    emb = spark.read.parquet(src)
    qs = emb.filter(F.col("vec_id") < 3)
    inline = sorted(
        map(
            tuple,
            ivfpq_topk(
                emb, qs, cents, books, k=5, nprobe=1, residual=True
            ).collect(),
        )
    )
    rest = sorted(
        map(
            tuple,
            ivfpq_topk(
                None, qs, cents, books, k=5, nprobe=1, residual=True, codes=codes
            ).collect(),
        )
    )
    assert inline == rest and len(rest) == 15


def test_load_ann_index_version_and_residual_compat(spark, tmp_path):
    """Pre-v2 manifests (no 'residual' key) load with residual=False —
    their raw codes are still valid; a manifest NEWER than this
    library's PQ_CODES_VERSION fails loud (unknown encode semantics
    must not feed an ADC plan)."""
    import json
    import os

    import pytest

    from jobs.ann_index_job import build_ann_index, load_ann_index

    src = "/root/testdata/sf0.001/embeddings.parquet"
    out = str(tmp_path / "idx")
    os.makedirs(out, exist_ok=True)
    build_ann_index(spark, src, out, m=8, n_codes=16, n_clusters=4)

    mpath = os.path.join(out, "index.json")
    manifest = json.load(open(mpath))
    # simulate a pre-round-6 manifest: v1, no residual key
    manifest["version"] = 1
    manifest.pop("residual")
    json.dump(manifest, open(mpath, "w"))
    codes, cents, books, mf = load_ann_index(spark, out)
    assert mf["residual"] is False and codes.count() > 0

    manifest["version"] = 99
    json.dump(manifest, open(mpath, "w"))
    with pytest.raises(ValueError, match="newer than"):
        load_ann_index(spark, out)


def test_pq_encode_udf_residual_matches_pq_codes(spark):
    """The pandas-UDF transport's residual mode must produce
    BIT-IDENTICAL codes to pq_codes(residual=True) — same coarse
    assignment (round-6 first-match), same residual, same subspace
    argmin."""
    from ai_pdf_extraction_spark.operators.similarity import (
        load_embedding_sample,
        pq_codes,
        pq_encode_udf,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    sample = load_embedding_sample(path)
    cents = train_ivf_centroids(sample, n_clusters=4, n_iters=5, seed=13)
    books = train_pq_codebooks(sample, m=8, n_codes=16, centroids=cents)
    emb = spark.read.parquet(path).limit(200)

    col_codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_codes(emb, books, centroids=cents, residual=True).collect()
    }
    udf_codes = {
        r["vec_id"]: list(r["c"])
        for r in emb.select(
            "vec_id",
            pq_encode_udf(books, centroids=cents)(F.col("embedding")).alias("c"),
        ).collect()
    }
    assert col_codes == udf_codes and len(col_codes) == 200


def test_residual_ivfpq_nprobe_recall_monotone(spark):
    """FAISS's IVF contract, pinned for the residual path: recall@k is
    non-decreasing in nprobe (each probe only ADDS candidate clusters),
    and at nprobe = n_clusters the candidate set is the whole corpus —
    recall equals the exhaustive-ADC ceiling for the same codes."""
    import numpy as np

    from ai_pdf_extraction_spark.operators.similarity import (
        ivfpq_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    rng = np.random.default_rng(11)
    K, d, n, k = 4, 16, 160, 5
    centers = rng.normal(0, 4, (K, d))
    X = np.vstack([centers[i % K] + rng.normal(0, 1.2, d) for i in range(n)])
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    Xf = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    sample = [list(map(float, v)) for v in Xf]
    cents = train_ivf_centroids(sample, n_clusters=K)
    books = train_pq_codebooks(sample, m=4, n_codes=16, centroids=cents)

    n_q = 10
    queries = emb.filter(F.col("vec_id") < n_q)
    d2 = ((Xf[:n_q][:, None, :] - Xf[None, :, :]) ** 2).sum(axis=2)
    truth = {
        qi: set(
            sorted((j for j in range(n) if j != qi), key=lambda j: (d2[qi][j], j))[:k]
        )
        for qi in range(n_q)
    }

    def recall(nprobe):
        got = {}
        df = ivfpq_topk(
            emb, queries, cents, books, k=k, nprobe=nprobe, residual=True
        )
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        import numpy as _np

        return float(
            _np.mean([len(got.get(q, set()) & truth[q]) / k for q in range(n_q)])
        )

    recalls = [recall(p) for p in (1, 2, 4)]
    assert recalls == sorted(recalls), f"recall must be monotone in nprobe: {recalls}"
    # deterministic floor for this fixture (measured 0.48 — PQ at
    # (m=4, 16 codes) over noisy d=16 blobs; the monotone property
    # above is the contract, the floor is a regression tripwire)
    assert recalls[-1] >= 0.4


def test_embedding_near_dup_lsh_twin(spark):
    """The sign-LSH bucketed twin of embedding_near_dup_pairs: its
    result is EXACTLY the baseline's pair set restricted to same-bucket
    pairs (subset property, identical cos values), and at genuine
    near-dup angles (cos >= 0.99 here, theta <= ~8deg) recall is high —
    P(same bucket) = prod(1 - theta_i/pi) ~ 0.9^8 for these angles."""
    import numpy as np

    from ai_pdf_extraction_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )

    rng = np.random.default_rng(5)
    d, n_base = 16, 60
    base = rng.normal(0, 1, (n_base, d))
    rows = []
    for i in range(n_base):
        rows.append((2 * i, [float(x) for x in base[i]]))
        # near-duplicate: tiny perturbation → cos ≈ 0.999
        rows.append(
            (2 * i + 1, [float(x) for x in base[i] + rng.normal(0, 0.01, d)])
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    baseline = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(emb, threshold=0.99).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs_lsh(
            emb, threshold=0.99, n_planes=8, dim=d
        ).collect()
    }
    # subset with identical values
    assert set(lsh) <= set(baseline)
    for k, v in lsh.items():
        assert baseline[k] == v
    # the 60 planted near-dup pairs dominate the baseline; the twin
    # recovers most of them (measured ~0.9+; floor leaves slack)
    planted = {(2 * i, 2 * i + 1) for i in range(n_base)}
    assert planted <= set(baseline)
    recall = len(planted & set(lsh)) / len(planted)
    assert recall >= 0.7, f"near-dup recall {recall} too low"


def test_embedding_lsh_twin_rejects_dim_mismatch(spark):
    """A dim mismatch must FAIL LOUD, not silently degrade: zip_with
    null-pads, every plane dot goes NULL, `NULL > 0` is false, and all
    rows would land in bucket 0 — the unguarded all-pairs product the
    twin exists to avoid (review r6). The check runs in the pair task
    before any matmul."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from ai_pdf_extraction_spark.operators.dedup import (
        embedding_near_dup_pairs_lsh,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(
        PythonException, match=r"dimensions \[3\] != expected \[64\]"
    ):
        embedding_near_dup_pairs_lsh(emb, threshold=0.9).collect()
    # correct dim passes
    assert (
        embedding_near_dup_pairs_lsh(emb, threshold=0.999, dim=3).count() >= 0
    )


def test_embedding_pairs_ragged_dims_fail_loud(spark):
    """RAGGED vector lengths inside one task must raise the SAME
    explanatory ValueError, not numpy's bare IndexError: np.array over
    mixed-length rows builds a 1-D object array with no .shape[1]
    (ADVICE r6). Exercised through the baseline (no expected_dim) so
    the per-row length validation itself is what fires."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from ai_pdf_extraction_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(
        PythonException, match=r"dimensions \[2, 3\] .* one dimension"
    ):
        embedding_near_dup_pairs(emb, threshold=0.5).collect()


def test_float_wav_decode_and_taxonomy():
    """IEEE-float WAV (format 3, 32/64-bit) decodes via the manual
    RIFF walk (stdlib `wave` rejects non-PCM); rms/peak are in the
    native [-1,1] domain rounded 6 — hand-computed pins. Any OTHER
    non-PCM format stays a taxonomy ValueError instead of leaking
    wave.Error out of decode_media (review r6)."""
    import struct

    import pytest

    from ai_pdf_extraction_spark.operators.multimodal import (
        decode_media,
        decode_payload_summary,
    )

    def wav(fmt_code, bits, payload, nch=1, rate=8000):
        fmt = struct.pack(
            "<HHIIHH", fmt_code, nch, rate, rate * nch * bits // 8,
            nch * bits // 8, bits,
        )
        return (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )

    # float32: samples [0.5, -0.25, 1.0, 0.0] → rms √(1.3125/4) =
    # 0.572822 (round 6), peak 1.0, 4 frames @ 8 kHz = 0 ms
    f32 = wav(3, 32, struct.pack("<4f", 0.5, -0.25, 1.0, 0.0))
    dec = decode_media(f32, "wav")
    assert dec["rms"] == 0.572822 and dec["peak"] == 1.0
    assert dec["sample_rate"] == 8000 and dec["n_channels"] == 1
    assert decode_payload_summary(f32)["decode_ok"] is True

    # float64 path + a duration that rounds to whole ms
    f64 = wav(3, 64, struct.pack("<8000d", *([0.5] * 8000)))
    dec = decode_media(f64, "wav")
    assert dec["duration_ms"] == 1000 and dec["rms"] == 0.5 and dec["peak"] == 0.5

    # mu-law (format 7): not decodable here — taxonomy ValueError,
    # summary stays decode_ok=False without raising
    mulaw = wav(7, 8, b"\x00\x01")
    with pytest.raises(ValueError, match="wav"):
        decode_media(mulaw, "wav")
    assert decode_payload_summary(mulaw)["decode_ok"] is False


def test_embedding_near_dup_delta_matches_batch_restriction(spark):
    """The delta must equal embedding_near_dup_pairs_lsh(old ∪ new)
    restricted to pairs touching a new id — and never emit an
    old×old pair, even when both olds share a touched bucket."""
    import random

    from ai_pdf_extraction_spark.operators.dedup import (
        embedding_near_dup_delta,
        embedding_near_dup_pairs_lsh,
    )

    rng = random.Random(5)
    dim = 16
    base = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(6)]

    def jitter(v, eps):
        return [x + rng.gauss(0, eps) for x in v]

    rows = []
    # old corpus: 30 vectors clustered around the 6 bases (old×old
    # near-dups exist and must NOT appear in the delta)
    for i in range(30):
        rows.append((i, jitter(base[i % 6], 0.01)))
    old_rows, new_rows = rows, []
    # new batch: near-dups of old vectors + fresh noise
    for j in range(8):
        new_rows.append((100 + j, jitter(base[j % 6], 0.01)))
    new_rows.append((150, [rng.gauss(0, 1) for _ in range(dim)]))
    schema = "vec_id long, embedding array<float>"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    kw = dict(threshold=0.9, n_planes=4, dim=dim, n_blocks=2)

    batch = embedding_near_dup_pairs_lsh(old.unionByName(new), **kw)
    new_ids = {i for i, _ in new_rows}
    expect = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in batch.collect()
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in embedding_near_dup_delta(new, old, **kw).collect()
    )
    assert got == expect and got  # non-vacuous
    assert all(a in new_ids or b in new_ids for a, b, _ in got)
    # the batch run DID find old×old pairs the delta correctly omits
    batch_pairs = {(r["id_a"], r["id_b"]) for r in batch.collect()}
    assert any(a not in new_ids and b not in new_ids for a, b in batch_pairs)


def test_embedding_near_dup_delta_skips_untouched_buckets(spark):
    """Old vectors in buckets no new vector landed in must not enter
    the block grid (the semi-join restriction): assert the plan carries
    a LeftSemi join, and behaviorally that a new batch far from every
    old cluster emits nothing."""
    from ai_pdf_extraction_spark.operators.dedup import (
        embedding_near_dup_delta,
    )

    dim = 8
    old = spark.createDataFrame(
        [(i, [1.0 * (j == i % dim) for j in range(dim)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    new = spark.createDataFrame(
        [(100, [-1.0] * dim)], "vec_id long, embedding array<float>"
    )
    out = embedding_near_dup_delta(new, old, threshold=0.99, n_planes=4, dim=dim)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert out.count() == 0


def test_embedding_near_dup_delta_dim_mismatch_fails_loud(spark):
    """A wrong-dim OLD vector must raise at bucket assignment, not be
    silently dropped: null-poisoned plane dots send it to bucket 0,
    and the touched-bucket semi-join can remove it before the in-task
    expected_dim check runs (review r7). A re-embedded corpus queried
    at the wrong dim must fail like the batch twin does."""
    import pytest

    from ai_pdf_extraction_spark.operators.dedup import (
        embedding_near_dup_delta,
    )

    old = spark.createDataFrame(
        [(1, [0.1] * 32)], "vec_id long, embedding array<double>"
    )
    new = spark.createDataFrame(
        [(100, [0.2] * 64)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="old-side vector 1 has dim 32"):
        embedding_near_dup_delta(new, old, dim=64).collect()


def test_url_frontier_delta(spark):
    """Within-batch collapse (first discoverer wins), seen-probe flags,
    and the non-broadcast fallback agreeing with the broadcast path."""
    from ai_pdf_extraction_spark.operators.urls import url_frontier_delta

    new = spark.createDataFrame(
        [
            (1, "https://A.com:443/x//1/"),
            (2, "https://a.com/x/1#frag"),  # canon-dup of event 1
            (3, "http://b.com/y?utm_source=z"),  # seen hit after strip
            (4, "http://c.com/new"),
        ],
        "event_id long, url string",
    )
    seen = spark.createDataFrame(
        [("http://b.com/y",), ("http://other.com/z",)], "canon_url string"
    )
    out = {r["canon_url"]: r for r in url_frontier_delta(new, seen).collect()}
    assert set(out) == {
        "https://a.com/x/1", "http://b.com/y", "http://c.com/new"
    }
    a = out["https://a.com/x/1"]
    assert (a["first_id"], a["n_discovered"], a["in_seen"], a["to_crawl"]) == (
        1, 2, False, True
    )
    b = out["http://b.com/y"]
    assert (b["n_discovered"], b["in_seen"], b["to_crawl"]) == (1, True, False)
    assert out["http://c.com/new"]["to_crawl"]
    # seen urls the batch never mentions must not appear
    assert "http://other.com/z" not in out

    plain = {
        r["canon_url"]: (r["first_id"], r["n_discovered"], r["in_seen"])
        for r in url_frontier_delta(new, seen, broadcast_new=False).collect()
    }
    assert plain == {
        k: (v["first_id"], v["n_discovered"], v["in_seen"])
        for k, v in out.items()
    }


def test_frontier_host_cap_matches_naive_and_defers(spark):
    """Two-phase sharded rank equals the naive per-host window; the
    cap binds on the hot host; non-to_crawl rows never appear."""
    from pyspark.sql import Window

    from ai_pdf_extraction_spark.operators.urls import frontier_host_cap

    fr = spark.createDataFrame(
        [(f"http://big.com/{i}", i, 1, False, True) for i in range(30)]
        + [(f"http://small.com/{i}", 100 + i, 1, False, True)
           for i in range(3)]
        + [("http://seen.com/x", 999, 2, True, False)],
        "canon_url string, first_id long, n_discovered long, "
        "in_seen boolean, to_crawl boolean",
    )
    got = sorted(
        map(tuple, frontier_host_cap(fr, per_host=10, n_shards=8).collect())
    )
    w = Window.partitionBy("host").orderBy(
        F.col("first_id") % 8, F.md5("canon_url"), "canon_url"
    )
    naive = sorted(
        map(tuple, fr.filter("to_crawl")
        .withColumn(
            "host",
            F.regexp_extract(
                "canon_url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?]*)", 1
            ),
        )
        .withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= 10)
        .select("canon_url", "host", "first_id", "pick_rank")
        .collect())
    )
    assert got == naive
    hosts = [h for _, h, _, _ in got]
    assert hosts.count("big.com") == 10  # cap binds
    assert hosts.count("small.com") == 3  # under-cap host keeps all
    assert "seen.com" not in hosts


def test_boilerplate_line_removal(spark):
    """Template lines (>= min_docs distinct docs per site) vanish;
    rare lines and blank lines survive; reassembly keeps original
    order; the same line on ANOTHER site is untouched."""
    from ai_pdf_extraction_spark.operators.text_analysis import (
        boilerplate_line_removal,
    )

    docs = [
        # site A: NAV in all 3 docs (bp at min_docs=3); doc-specific
        # bodies survive, as do blank lines
        (1, "A", "NAV A\n\nbody one\nNAV A"),   # repeated within doc:
                                                 # still ONE distinct doc
        (2, "A", "  NAV A \nbody two"),          # indented form strips
        (3, "A", "NAV A\nbody three"),
        # site B has the same line but only 1 doc: kept
        (4, "B", "NAV A\nbody four"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
        for r in boilerplate_line_removal(df, min_docs=3).collect()
    }
    assert got == {
        1: ("\nbody one", 4, 2),
        2: ("body two", 2, 1),
        3: ("body three", 2, 1),
        4: ("NAV A\nbody four", 2, 0),
    }


def test_boilerplate_line_removal_all_removed_empty_string(spark):
    from ai_pdf_extraction_spark.operators.text_analysis import (
        boilerplate_line_removal,
    )

    docs = [(i, "A", "FOOTER") for i in range(5)]
    df = spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    )
    got = boilerplate_line_removal(df, min_docs=5).collect()
    assert all(
        r.clean_text == "" and r.n_removed == 1 for r in got
    ) and len(got) == 5


def test_host_quality_filter_scaled_mean_gate(spark):
    """The gate decides per HOST: every doc of a below-threshold
    source drops, even its best one; decision is the scaled integer
    mean (floor division)."""
    from ai_pdf_extraction_spark.operators.text_analysis import (
        host_quality_filter,
    )

    good = (
        "the quick brown fox and the lazy dog of the northern woods "
        "went to the river and the meadow to rest and to feed"
    )
    docs = [
        (1, "hi", good),
        (2, "hi", good + " " + good),
        (3, "lo", "zzz qqq"),
        (4, "lo", good),  # best-of-bad outlier: still dropped
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    )
    got = {r.doc_id: r for r in host_quality_filter(df, 6000).collect()}
    assert got[1].keep and got[2].keep
    assert not got[3].keep and not got[4].keep
    hq = {r.source: r.host_q_scaled for r in got.values()}
    assert hq["hi"] >= 6000 > hq["lo"]
    # the lo mean is the floor of (sum of scaled qualities) / 2
    q3 = int(round(got[3].quality * 10000))
    q4 = int(round(got[4].quality * 10000))
    assert hq["lo"] == (q3 + q4) // 2


def test_capture_delta_latest_prev_and_change_flags(spark):
    import datetime

    from ai_pdf_extraction_spark.operators.urls import capture_delta

    t = lambda s: datetime.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # url X: 3 captures, content changed between last two
        (1, t(1), "http://x", "d1"),
        (2, t(2), "http://x", "d2"),
        (3, t(3), "http://x", "d3"),
        # url Y: revisit with identical content
        (4, t(1), "http://y", "same"),
        (5, t(2), "http://y", "same"),
        # url Z: single capture
        (6, t(1), "http://z", "d0"),
        # url W: duplicate ts — id breaks the tie
        (7, t(5), "http://w", "older"),
        (8, t(5), "http://w", "newer"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, canon_url string, digest string"
    )
    got = {r.canon_url: r for r in capture_delta(df).collect()}
    assert (got["http://x"].n_captures, got["http://x"].digest,
            got["http://x"].prev_digest, got["http://x"].changed) == (
        3, "d3", "d2", True)
    assert (got["http://y"].digest, got["http://y"].prev_digest,
            got["http://y"].changed) == ("same", "same", False)
    assert (got["http://z"].n_captures, got["http://z"].prev_digest,
            got["http://z"].changed) == (1, None, True)
    assert (got["http://w"].latest_id, got["http://w"].digest,
            got["http://w"].prev_digest) == (8, "newer", "older")


def test_paragraph_lang_mix_dominant_tie_and_blank_paras(spark):
    from ai_pdf_extraction_spark.operators.text_analysis import (
        paragraph_lang_mix,
    )

    en = "the cat and the dog went to the house of the king"
    de = "der hund und die katze und das haus und der garten sind alt"
    docs = [
        # two en paragraphs + one de: dominant en, mixed
        (1, f"{en}\n\n{de}\n\n{en}"),
        # 1-1 tie: lexicographically smaller lang (de) wins
        (2, f"{en}\n\n{de}"),
        # blank/whitespace paragraphs don't count
        (3, f"{en}\n\n   \n\n{en}"),
        # single paragraph: not mixed
        (4, de),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in paragraph_lang_mix(df).collect()}
    assert (got[1].dominant_lang, got[1].n_paras, got[1].n_dominant,
            got[1].n_foreign, got[1].is_mixed) == ("en", 3, 2, 1, True)
    assert (got[2].dominant_lang, got[2].is_mixed) == ("de", True)
    assert (got[3].dominant_lang, got[3].n_paras, got[3].is_mixed) == (
        "en", 2, False)
    assert (got[4].dominant_lang, got[4].n_foreign) == ("de", 0)


def test_normalize_text_steps(spark):
    from ai_pdf_extraction_spark.operators.text_analysis import (
        normalize_text,
    )

    docs = [
        (1, "Café"),                      # NFC composes to Café
        (2, "A​B‌‍﻿C"),     # zero-width stripped
        (3, "a\x07b\x1fc\td"),                  # controls out, tab kept
        (4, "x  \r\ny\rz"),                      # CRLF/CR -> LF, trail ws
        (5, "a\n\n\n\n\nb"),                     # 5 newlines -> 2
        (6, "already clean"),
        (7, "tail spaces   "),                   # end-of-text trim (\z)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in normalize_text(df).collect()}
    assert got[1].clean_text == "Café" and got[1].n_chars_clean == 4
    assert got[2].clean_text == "ABC"
    assert got[3].clean_text == "abc\td" and got[3].changed
    assert got[4].clean_text == "x\ny\nz"
    assert got[5].clean_text == "a\n\nb"
    assert got[6].clean_text == "already clean" and not got[6].changed
    assert got[7].clean_text == "tail spaces"
    assert all(
        r.n_chars_clean == len(r.clean_text) for r in got.values()
    )


def test_extract_outlinks_resolution_and_anchor_cleanup(spark):
    from ai_pdf_extraction_spark.operators.links import extract_outlinks

    pages = spark.createDataFrame(
        [
            (
                "http://www.Ex.co.uk:80/dir/page.html?q=1",
                '<a href="http://other.example.com/a?utm_source=x&amp;a=1">'
                "Abs Link</a>"
                '<a href="//cdn.ex.co.uk/pr">proto</a>'
                '<a class="nav" href="/root/x"> Root\n <i>Link</i> </a>'
                '<a href="rel/y.html">rel</a>'
                '<a href="#frag">skip</a><a href="mailto:a@b.c">skip</a>'
                '<a href="javascript:void(0)">skip</a><a name="x">nohref</a>',
            ),
            # path-less base: relative resolves against origin + '/'
            ("http://bare.example.com", '<a href="q">rq</a>'),
        ],
        ["url", "html"],
    )
    edges = extract_outlinks(pages)
    got = {r.dst_url: r.anchor for r in edges.collect()}
    assert got == {
        # tracking param stripped, &amp; decoded before the resolve
        "http://other.example.com/a?a=1": "Abs Link",
        # protocol-relative takes the page scheme; host lowercased
        "http://cdn.ex.co.uk/pr": "proto",
        # root-relative onto the origin; nested tag + whitespace
        # collapse in the anchor; default :80 dropped by canon
        "http://www.ex.co.uk/root/x": "Root Link",
        # directory-relative (query stripped from the base first)
        "http://www.ex.co.uk/dir/rel/y.html": "rel",
        "http://bare.example.com/q": "rq",
    }
    # zero shuffle: the whole extraction is narrow work in the scan
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_anchor_stats_tie_rule_and_src_fanin(spark):
    from ai_pdf_extraction_spark.operators.links import anchor_stats

    edges = spark.createDataFrame(
        [
            ("s1", "d1", "beta"),
            ("s1", "d1", "alpha"),  # tie 1-1 → 'alpha' wins (lex)
            ("s2", "d2", "x"),
            ("s2", "d2", "x"),  # same src twice: n_srcs stays 1
            ("s3", "d2", "y"),
        ],
        ["src_url", "dst_url", "anchor"],
    )
    got = {r.dst_url: r for r in anchor_stats(edges).collect()}
    assert (got["d1"].n_links, got["d1"].n_srcs, got["d1"].top_anchor,
            got["d1"].top_anchor_links) == (2, 1, "alpha", 1)
    assert (got["d2"].n_links, got["d2"].n_srcs, got["d2"].top_anchor,
            got["d2"].top_anchor_links) == (3, 2, "x", 2)


def test_registered_domain_psl_cases(spark):
    from ai_pdf_extraction_spark.operators.urls import registered_domain

    rows = [
        ("WWW.Example.CO.UK:8080", "example.co.uk"),
        ("a.b.example.com", "example.com"),
        ("x.GitHub.io", "x.github.io"),  # PSL private section
        ("sub.blog.blogspot.com", "blog.blogspot.com"),
        ("co.uk", "co.uk"),  # bare multi-label suffix passes whole
        ("localhost", "localhost"),  # single label passes whole
        ("example.co.jp", "example.co.jp"),  # exactly eTLD+1 already
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], ["h"])
    got = dict(
        df.select("h", registered_domain("h").alias("rd")).collect()
    )
    for host, want in rows:
        assert got[host] == want, host


def test_extract_metadata_canonical_guard(spark):
    from ai_pdf_extraction_spark.operators.links import extract_metadata

    pages = spark.createDataFrame(
        [
            # root-relative canonical: accepted, resolved onto origin
            (
                "http://www.site.example.co.uk/p/1",
                '<head><title> T &amp; <b>1</b> </title>'
                '<meta name="description" content="D &quot;x&quot;">'
                '<link rel="canonical" href="/canon/1"></head>',
            ),
            # same registered domain, different subdomain (AMP shape)
            (
                "http://www.site.example.co.uk/p/2",
                '<head><title>T2</title><link rel="canonical" '
                'href="http://amp.example.co.uk/c/2"></head>',
            ),
            # cross-domain canonical: REJECTED, page url kept
            (
                "http://good.example.com/p/3",
                '<head><title>T3</title><link rel="canonical" '
                'href="http://evil.example.org/steal"></head>',
            ),
            # no canonical at all
            ("http://good.example.com/p/4", "<head><title>T4</title></head>"),
        ],
        ["url", "html"],
    )
    got = {r.url: r for r in extract_metadata(pages).collect()}
    r1 = got["http://www.site.example.co.uk/p/1"]
    assert r1.title == 'T & 1'
    assert r1.meta_desc == 'D "x"'
    assert r1.og_title is None
    assert r1.canonical_accepted is True
    assert r1.effective_url == "http://www.site.example.co.uk/canon/1"
    r2 = got["http://www.site.example.co.uk/p/2"]
    assert r2.canonical_accepted is True
    assert r2.effective_url == "http://amp.example.co.uk/c/2"
    r3 = got["http://good.example.com/p/3"]
    assert r3.canonical_accepted is False
    assert r3.effective_url == "http://good.example.com/p/3"
    r4 = got["http://good.example.com/p/4"]
    assert r4.canonical_href is None
    assert r4.canonical_accepted is False
    assert r4.effective_url == "http://good.example.com/p/4"


def test_frontier_host_cap_registered_domain_key(spark):
    from ai_pdf_extraction_spark.operators.urls import (
        frontier_host_cap,
        host_of,
        registered_domain,
    )

    rows = [
        # 6 urls spread over 3 subdomains of ONE registered domain —
        # a per-host cap of 2 would pass all 6; the rd key caps at 2
        (i, f"http://s{i % 3}.spam.example.com/p/{i}") for i in range(6)
    ] + [(10, "http://other.example.org/p/10")]
    fr = spark.createDataFrame(
        [(u, i, True) for i, u in rows],
        ["canon_url", "first_id", "to_crawl"],
    )
    out = frontier_host_cap(
        fr,
        per_host=2,
        politeness_key=registered_domain(host_of("canon_url")),
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.host, []).append(r)
    # all 6 spam urls share ONE registered domain (subdomain labels
    # s0/s1/s2 and spam are both below the eTLD+1)
    assert len(by_key["example.com"]) == 2
    assert len(by_key["example.org"]) == 1
    assert set(by_key) == {"example.com", "example.org"}


def test_sniff_charset_ladder_and_mismatch(spark):
    from ai_pdf_extraction_spark.operators.text_analysis import (
        sniff_charset,
    )

    pages = spark.createDataFrame(
        [
            # utf-8 BOM + matching declaration: -sig normalization
            # means NOT a mismatch
            (1, "efbbbf4142", '<meta charset="utf-8"><p>x</p>'),
            # utf-16le BOM under a utf-8 declaration: the bug
            (2, "FFFE4100", '<meta charset="utf-8"><p>x</p>'),
            # no BOM: declaration wins, lowercased
            (3, "4142", '<meta charset="ISO-8859-1"><p>x</p>'),
            # nothing declared: content heuristic
            (4, "43", "<p>café</p>"),
            (5, "44", "<p>plain</p>"),
        ],
        ["doc_id", "raw_hex", "html"],
    )
    got = {r.doc_id: r for r in sniff_charset(pages).collect()}
    assert (got[1].bom_charset, got[1].detected_charset,
            got[1].declared_mismatch) == ("utf-8-sig", "utf-8-sig", False)
    assert (got[2].bom_charset, got[2].declared_charset,
            got[2].declared_mismatch) == ("utf-16le", "utf-8", True)
    assert (got[3].bom_charset, got[3].detected_charset) == (
        None, "iso-8859-1")
    assert got[4].detected_charset == "utf-8"
    assert (got[5].detected_charset, got[5].declared_mismatch) == (
        "us-ascii", False)


def test_extract_outlinks_passthrough_provenance(spark):
    from ai_pdf_extraction_spark.operators.links import extract_outlinks

    pages = spark.createDataFrame(
        [(7, "e1", "http://a.example.com/p",
          '<a href="/x">one</a><a href="/y">two</a>')],
        ["doc_id", "epoch", "url", "html"],
    )
    out = extract_outlinks(
        pages, passthrough=("doc_id", "epoch")
    ).collect()
    assert len(out) == 2
    assert all((r.doc_id, r.epoch) == (7, "e1") for r in out)
    assert {r.dst_url for r in out} == {
        "http://a.example.com/x", "http://a.example.com/y"
    }


def test_resolve_href_uppercase_skip_schemes(spark):
    from ai_pdf_extraction_spark.operators.links import extract_outlinks

    pages = spark.createDataFrame(
        [("http://h.com/p",
          '<a href="Mailto:a@b.c">m</a><a href="JAVASCRIPT:x()">j</a>'
          '<a href="DATA:image/png;base64,AAAA">d</a>'
          '<a href="Tel:+1555">t</a><a href="/ok">keep</a>')],
        ["url", "html"],
    )
    got = [r.dst_url for r in extract_outlinks(pages).collect()]
    # RFC 3986: schemes are case-insensitive — none of the
    # non-navigational ones may leak through as relative paths
    assert got == ["http://h.com/ok"]


def test_registered_domain_ipv4_passthrough(spark):
    from ai_pdf_extraction_spark.operators.urls import registered_domain

    df = spark.createDataFrame(
        [("192.168.0.1",), ("10.0.0.2:8080",), ("256.1.2.3",)], ["h"]
    )
    got = dict(df.select("h", registered_domain("h").alias("rd")).collect())
    assert got["192.168.0.1"] == "192.168.0.1"
    assert got["10.0.0.2:8080"] == "10.0.0.2"  # port still stripped
    # not a valid IPv4 octet run? the simple literal check keeps any
    # dotted-quad shape whole — fine for a grouping key
    assert got["256.1.2.3"] == "256.1.2.3"


def test_c4_line_clean_rules_order_and_doc_verdict(spark):
    from ai_pdf_extraction_spark.operators.text_analysis import (
        c4_line_clean,
    )

    text = (
        "A good first sentence stays right here.\n"
        "Enable JavaScript to continue please now.\n"  # marker (ci)
        "  leading spaces but still a fine sentence.\n"  # 7 words
        "too few.\n"
        'He agreed with a loud "absolutely not."\n'  # quote terminal
        "A good last sentence stays here too."
    )
    df = spark.createDataFrame(
        [(1, text), (2, "junk\nmore junk\nstill junk")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in c4_line_clean(df).collect()}
    r1 = got[1]
    assert r1.clean_text == (
        "A good first sentence stays right here.\n"
        "  leading spaces but still a fine sentence.\n"
        'He agreed with a loud "absolutely not."\n'
        "A good last sentence stays here too."
    )
    assert (r1.n_lines_raw, r1.n_lines_kept, r1.kept) == (6, 4, True)
    r2 = got[2]
    assert (r2.clean_text, r2.n_lines_kept, r2.kept) == ("", 0, False)


def test_resolve_redirects_all_statuses(spark):
    from ai_pdf_extraction_spark.operators.urls import resolve_redirects

    fetches = spark.createDataFrame(
        [("u0",), ("u1",), ("u2",), ("a",), ("b",), ("c",),
         ("l1",), ("l2",), ("d",)],
        ["url"],
    )
    redirects = spark.createDataFrame(
        [
            ("u1", "u2"),           # one hop, terminal
            ("a", "b"), ("b", "c"),  # two hops
            ("l1", "l2"), ("l2", "l1"),  # two-cycle
            ("d", "missing"),        # target never fetched
        ],
        ["src", "dst"],
    )
    got = {r.start_url: r for r in
           resolve_redirects(fetches, redirects).collect()}
    assert (got["u0"].status, got["u0"].n_hops,
            got["u0"].final_url) == ("ok", 0, "u0")
    assert (got["u1"].status, got["u1"].n_hops,
            got["u1"].final_url) == ("ok", 1, "u2")
    assert (got["a"].status, got["a"].n_hops,
            got["a"].final_url) == ("ok", 2, "c")
    assert got["l1"].status == "loop" and got["l2"].status == "loop"
    assert (got["d"].status, got["d"].final_url) == ("dangling", "missing")


def test_resolve_redirects_long_chain_exhausts_budget(spark):
    from ai_pdf_extraction_spark.operators.urls import resolve_redirects

    urls = [f"n{i}" for i in range(8)]
    fetches = spark.createDataFrame([(u,) for u in urls], ["url"])
    redirects = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(7)], ["src", "dst"]
    )
    got = {r.start_url: r for r in
           resolve_redirects(fetches, redirects, max_hops=5).collect()}
    assert got["n0"].status == "too_many_hops" and got["n0"].n_hops == 5
    # five hops from n2 lands exactly on the terminal n7: ok
    assert (got["n2"].status, got["n2"].final_url) == ("ok", "n7")


def test_url_templates_distinct_fanout_and_hex_rule(spark):
    from ai_pdf_extraction_spark.operators.urls import url_templates

    rows = (
        # popular page refetched 10x: distinct-count keeps it benign
        [("http://h.com/p/1",)] * 10
        # hex session ids collapse to one template (hex BEFORE digits)
        + [(f"http://h.com/s?sid={'%032x' % i}",) for i in range(4)]
        + [("http://h.com/cal/2026/1",), ("http://h.com/cal/2026/2",),
           ("http://h.com/cal/2027/1",)]
    )
    df = spark.createDataFrame(rows, ["url"])
    got = {(r.host, r.template): r for r in
           url_templates(df, min_urls=3).collect()}
    assert got[("h.com", "/p/{d}")].n_urls == 1
    assert got[("h.com", "/p/{d}")].is_trap is False
    assert got[("h.com", "/s?sid={h}")].n_urls == 4
    assert got[("h.com", "/s?sid={h}")].is_trap is True
    assert got[("h.com", "/cal/{d}/{d}")].n_urls == 3
    assert got[("h.com", "/cal/{d}/{d}")].is_trap is True


def test_host_error_backoff_integer_scaling(spark):
    from ai_pdf_extraction_spark.operators.urls import host_error_backoff

    log = spark.createDataFrame(
        [("a", 200)] * 2 + [("a", 503)]          # 1/3 errors
        + [("b", 503), ("b", 500)]               # all errors
        + [("c", 404), ("c", 200)],              # 4xx is healthy
        ["host", "status"],
    )
    got = {r.host: r for r in host_error_backoff(log, 30).collect()}
    assert (got["a"].n_errors, got["a"].cap) == (1, 20)
    assert (got["b"].n_errors, got["b"].cap) == (2, 0)
    assert (got["c"].n_errors, got["c"].cap) == (0, 30)


def test_c4_line_clean_crlf_corpus_survives(spark):
    from ai_pdf_extraction_spark.operators.text_analysis import (
        c4_line_clean,
    )

    text = (
        "This is a perfectly fine sentence here.\r\n"
        "Another proper closing sentence follows now.\r\n"
        "And a third good sentence ends this one.\r\n"
        "trailing junk"
    )
    got = c4_line_clean(
        spark.createDataFrame([(1, text)], ["doc_id", "text"])
    ).collect()[0]
    # CRLF must not fail the \z-anchored terminal test
    assert (got.n_lines_kept, got.kept) == (3, True)
    assert "\r" not in got.clean_text  # reassembly normalizes to LF


def test_url_templates_uppercase_hex(spark):
    from ai_pdf_extraction_spark.operators.urls import url_templates

    df = spark.createDataFrame(
        [(f"http://s.com/i?sid=A3F0D9E2B1C4456{i}",) for i in range(3)],
        ["url"],
    )
    got = url_templates(df, min_urls=3).collect()
    assert [(r.template, r.n_urls, r.is_trap) for r in got] == [
        ("/i?sid={h}", 3, True)
    ]


def test_trap_filter_flags_matching_templates_only(spark):
    from ai_pdf_extraction_spark.operators.urls import trap_filter

    traps = spark.createDataFrame(
        [("cal.com", "/cal/{d}/{d}", 500, True),
         ("h.com", "/p/{d}", 37, False)],  # below threshold: ignored
        ["host", "template", "n_urls", "is_trap"],
    )
    fr = spark.createDataFrame(
        [("http://cal.com/cal/2026/7", 1, True),
         ("http://h.com/p/5", 2, True),
         ("http://other.com/cal/2026/7", 3, True)],  # other host
        ["canon_url", "first_id", "to_crawl"],
    )
    got = {r.canon_url: r.trap_hit
           for r in trap_filter(fr, traps).collect()}
    assert got == {
        "http://cal.com/cal/2026/7": True,
        "http://h.com/p/5": False,
        "http://other.com/cal/2026/7": False,
    }


def test_trap_filter_plan_broadcasts_traps_no_frontier_shuffle(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from ai_pdf_extraction_spark.operators.urls import trap_filter

    traps = spark.createDataFrame(
        [("cal.com", "/cal/{d}", 500, True)],
        ["host", "template", "n_urls", "is_trap"],
    )
    fr = spark.range(1000).select(
        F.concat(F.lit("http://cal.com/cal/"), F.col("id").cast("string"))
        .alias("canon_url"),
        F.col("id").alias("first_id"),
    )
    plan = (
        trap_filter(fr, traps)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan
    # the frontier side must not shuffle: the ONLY exchange is the
    # broadcast of the trap relation
    import re
    assert len(re.findall(r"Exchange", plan)) == plan.count(
        "BroadcastExchange"
    )
