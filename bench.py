"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` plus the
extraction pipeline over a deterministic synthetic page corpus, and
prints ONE JSON line::

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling-efficiency evidence (north_rule N vs 4N) lives in
``tools/bench_scaling.py`` → ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q02_filtered_revenue",
    "q03_region_nation_rollup",
    "q07_top_orders_per_customer",
    "q09_order_lineitem_stats",
    "q14_order_total_rule",
    "q20_exact_dedup",
    "q21_ngram_jaccard_pairs",
    "q22_minhash_lsh_pairs",
    "q24_embedding_near_dup",
    "q25_ann_topk",
    "q26_ivf_topk",  # trained-quantizer ANN (round-3 operator)
    "q27_hourly_event_counts",
    "q36_curated_corpus",  # flagship composition: quality ∧ canonical ∧ not-near-dup
    # round-3/4 operators so regressions in the newest code are visible
    "q46_table_rows",  # structured table extraction (fixture corpus)
    "q48_table_field_rollup",
    "q49_media_metadata",  # media probe over the fixture media parquet
    "q52_lang_detect_wide",  # script+marker language ID
    "q54_granule_dedup",  # corpus-level sentence dedup
    "q55_contamination",  # benchmark n-gram decontamination
    "q51_warc_extract",  # WARC-native ingestion → extraction
    "q53_media_decode",  # stdlib pixel/sample decode + resize
    "q56_pq_topk",  # product-quantization ADC ANN (codes at rest)
    "q57_curated_corpus_v2",  # full-curation capstone
    "q58_ivfpq_topk",  # composed IVF-PQ index
    "q59_lang_trigram",  # char-trigram language ID
    "q60_gopher_quality",  # full Gopher rule set
    "q61_ivfpq_residual_topk",  # residual-encoding IVF-PQ (FAISS default)
    "q62_salted_host_counts",  # north-rule salted skewed-host aggregation
    "q63_schema_registry_apply",  # versioned schema config -> typed projection
    "q64_embedding_near_dup_lsh",  # bucketed scale twin of q24
    "q65_curated_corpus_v3",  # every-family capstone (adds semantic dedup)
    # round-7 operators
    "q66_exact_dedup_delta",  # incremental exact dedup vs at-rest index
    "q67_span_dedup",  # substring-level duplicated-span removal
    "q68_bpe_token_counts",  # exact merge-table BPE tokenizer
    "q69_lang_trained",  # trained hashed-ngram LID
    "q70_span_decontaminate",  # span-level benchmark decontamination
    "q71_minhash_lsh_delta",  # incremental LSH near-dup vs at-rest index
    "q72_token_budget_bpe",  # token budget priced in exact BPE tokens
    "q73_curated_corpus_v4",  # capstone + substring-span leg
    "q74_sequence_pack",  # training-sequence packing layout
    "q75_embedding_near_dup_delta",  # incremental semantic near-dup
    "q76_lm_perplexity",  # CCNet bigram-LM quality bucketing
    "q77_mixture_sample",  # source-weighted data-mixture builder
    "q78_bpe_pair_counts",  # distributed BPE training round-0
    "q79_curated_corpus_v5",  # capstone + LM-perplexity leg (7 families)
    "q80_url_frontier_delta",  # crawl-frontier seen-set probe
    "q81_cluster_balanced_sample",  # semantic domain capping
    "q83_frontier_host_cap",  # per-host crawl politeness
    "q84_host_pagerank",  # integer host-graph PageRank (3 iterations)
    "q88_frontier_politeness",  # frontier capstone: delta→gate→robots→cap
    "q94_boilerplate_lines",  # per-site template line removal
    "q95_capture_delta",  # revisit collapse + changed-content flag
    "q96_host_quality_filter",  # host-reputation quality gate
    "q97_paragraph_lang_mix",  # mixed-language page detection
    "q98_normalize_text",  # NFC + invisible-char webtext cleaning
    "q99_outlink_extraction",  # HTML → resolved+canonical outlinks
    "q103_extracted_pagerank",  # raw pages → host graph → PageRank
]

EXTRACT_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "24000"))


def _corpus_path(n_docs: int, seed: int = 42) -> str:
    """Deterministic corpus (32 part files — how a crawl actually
    arrives, so the scan parallelizes), cached across bench runs."""
    from ai_pdf_extraction_spark.corpus import write_pages_parquet
    from ai_pdf_extraction_spark.corpus.generate import CORPUS_VERSION

    path = f"/tmp/spark_graft_bench_corpus_v{CORPUS_VERSION}_{n_docs}_{seed}_32f"
    if not os.path.exists(path):
        write_pages_parquet(path, n_docs, seed=seed, n_files=32)
    return path


def run_bench(sf_dir: str, cpus: int) -> dict:
    import __spark_entry__ as entrymod
    from ai_pdf_extraction_spark.plans.pipeline import extraction_plan
    from ai_pdf_extraction_spark.session import build_session
    from pyspark.sql import functions as F

    # size scan splits so the extraction leg runs ~4 task waves of
    # meaningfully-sized tasks (per-task Python-runner overhead
    # dominates sub-1MB tasks; see tools/bench_scaling.py).
    # SCOPED to the extraction leg (set/reset below): a global tiny
    # maxPartitionBytes splits the single-row-group testdata parquet
    # into N byte ranges of which N-1 are empty (parquet reads whole
    # row groups), silently serializing every query on one straggler
    # task while defeating the operators' own parallelism guards.
    corpus = _corpus_path(EXTRACT_DOCS)
    corpus_bytes = sum(
        os.path.getsize(os.path.join(corpus, f)) for f in os.listdir(corpus)
    )
    mpb = max(corpus_bytes // (4 * cpus), 1 << 20)
    spark = build_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    default_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    default_open = spark.conf.get("spark.sql.files.openCostInBytes")

    def _extraction_split_conf(on: bool) -> None:
        # openCostInBytes=0 lowers the effective split size to
        # totalBytes/defaultParallelism — right for the many-file
        # extraction corpus, catastrophic for single-row-group parquet
        # (N byte-range splits, N-1 empty, all work on one straggler)
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(mpb) if on else default_mpb
        )
        spark.conf.set(
            "spark.sql.files.openCostInBytes", "0" if on else default_open
        )
    qs = entrymod.queries()
    # Warm-up: JVM codegen, parquet footers, Python workers — one-time
    # costs that would otherwise all land on the first timed query.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    warm_corpus = _corpus_path(256, seed=3)
    _extraction_split_conf(True)
    extraction_plan(spark.read.parquet(warm_corpus), run_id="warm").agg(
        F.sum("n_chars")
    ).collect()
    _extraction_split_conf(False)

    # best-of-N per query (default 3): the sandbox host is shared and
    # contended, so single timings swing several-fold run to run
    n_trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    timings: dict[str, float] = {}
    # every trial timing, per query — "queries" stays best-of (the
    # comparable number), "trials" shows the spread so a plan
    # regression (all trials slow) is distinguishable from host noise
    # (one slow outlier) without re-running
    trials: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _trial in range(n_trials):
        for name in HEADLINE:
            t0 = time.monotonic()
            rows = qs[name](spark, sf_dir).collect()
            dt = round(time.monotonic() - t0, 3)
            trials[name].append(dt)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            del rows

    # extraction throughput: full kernel pass, forced by an aggregate
    # over the UDF outputs (nothing wide collected to the driver);
    # best-of-N like the queries
    _extraction_split_conf(True)
    extract_sec = None
    trials["extract_pages"] = []
    for _trial in range(n_trials):
        t0 = time.monotonic()
        plan = extraction_plan(spark.read.parquet(corpus), run_id="bench")
        agg = plan.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("parse_ok"), 0).otherwise(1)).alias("fails"),
            F.sum("n_chars").alias("chars"),
        ).collect()[0]
        dt = round(time.monotonic() - t0, 3)
        trials["extract_pages"].append(dt)
        if extract_sec is None or dt < extract_sec:
            extract_sec = dt
    timings["extract_pages"] = extract_sec
    docs_per_sec = round(agg["n"] / max(extract_sec, 1e-9), 1)

    total = round(sum(timings.values()), 3)
    spark.stop()
    return {
        "metric": "headline_queries_plus_extraction_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "trials": trials,
        "n_trials": n_trials,
        "sf": sf_dir,
        "extract_docs": int(agg["n"]),
        "extract_docs_per_sec": docs_per_sec,
        "extract_parse_fail": int(agg["fails"]),
        "cpus": cpus,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run_bench(sf_dir, cpus)))


if __name__ == "__main__":
    main()
