"""Offline corpus profiling — the rebuild of the reference's schema
discovery (SURVEY.md §3.2).

The reference samples representative pages (first 2 + last 2 + strided
middle, ``pdf_service.py:203-283``) and asks an LLM to infer a schema
(``services/ai/discovery.py:256-361``). The deterministic rebuild
samples the corpus the same way, runs the extraction kernels on the
sample, and reports the corpus profile + the fixed output schema — a
one-shot plan-time activity, never a runtime operator (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def representative_sample(pages: DataFrame, max_docs: int = 64) -> DataFrame:
    """First 2 + last 2 + uniformly strided middle, by url order —
    the reference's page-sampling policy lifted to corpus scale.
    Deterministic (no RNG): rank by url, pick index set.

    ``n`` counts DISTINCT urls — the rank space the indices select
    from. Counting raw rows would inflate n on recrawl-duplicate
    corpora and push the last-2/upper-stride picks past the maximum
    rank, silently dropping tail coverage. Recrawl duplicates are
    collapsed to one deterministic row per url in BOTH regimes (the
    small-corpus early return included — the sample contract is ≤
    max_docs unique-url rows, never duplicate rows)."""
    # one deterministic row per duplicated url
    w_dup = Window.partitionBy("url").orderBy(F.xxhash64(F.col("html")))
    deduped = (
        pages.withColumn("_dup_rn", F.row_number().over(w_dup))
        .filter(F.col("_dup_rn") == 1)
        .drop("_dup_rn")
    )
    distinct_urls = pages.select("url").distinct().persist()
    try:
        n = distinct_urls.count()
        if n <= max_docs:
            return deduped
        middle = max_docs - 4
        stride = max((n - 4) / max(middle, 1), 1.0)
        indices = sorted(
            {1, 2, n - 1, n}
            | {min(int(3 + i * stride), n) for i in range(middle)}
        )
        # Rank on the (persisted) url-only projection: the
        # unpartitioned global sort is unavoidable for exact ranks, but
        # it carries 8-byte url strings, not multi-MB html payloads,
        # and the ≤max_docs picks collect to a tiny driver-side isin
        # literal — no second distinct scan, no broadcast join.
        w = Window.orderBy("url")
        picked = [
            r["url"]
            for r in distinct_urls.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn").isin(indices))
            .select("url")
            .collect()
        ]
    finally:
        distinct_urls.unpersist()
    return deduped.filter(F.col("url").isin(picked))


def profile_corpus(spark: SparkSession, input_path: str, max_docs: int = 64) -> dict:
    """Run the kernels over a representative sample; emit the corpus
    profile and the (fixed) output schema as a discovery report."""
    from ai_pdf_extraction_spark.operators.extract import EXTRACTION_TYPE
    from ai_pdf_extraction_spark.plans.pipeline import extraction_plan

    pages = spark.read.parquet(input_path)
    # the ≤max_docs sample feeds four separate actions below — persist
    # it so the sort + extraction UDF run once, not four times
    sample = representative_sample(pages, max_docs).persist()
    extracted = extraction_plan(sample, run_id="profile", min_parallelism=4).persist()

    stats = extracted.agg(
        F.count("*").alias("n_sampled"),
        F.round(F.avg("n_chars"), 1).alias("avg_chars"),
        F.round(F.avg("n_spans"), 2).alias("avg_spans"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("n_parse_fail"),
    ).collect()[0]
    ctype_mix = {
        r["content_type"]: r["n"]
        for r in extracted.groupBy("content_type").agg(F.count("*").alias("n")).collect()
    }
    kind_mix = {
        r["kind"]: r["n"]
        for r in extracted.select(F.explode("spans").alias("s"))
        .groupBy(F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    lang_mix = {
        r["lang"]: r["n"]
        for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    extracted.unpersist()
    sample.unpersist()
    return {
        "n_sampled": int(stats["n_sampled"]),
        "avg_chars": float(stats["avg_chars"]),
        "avg_spans": float(stats["avg_spans"]),
        "parse_fail_rate": round(stats["n_parse_fail"] / max(stats["n_sampled"], 1), 4),
        "content_type_mix": ctype_mix,
        "span_kind_mix": kind_mix,
        "lang_mix": lang_mix,
        "output_schema": EXTRACTION_TYPE.simpleString(),
    }
