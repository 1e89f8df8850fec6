"""End-to-end extraction pipeline: read → route → extract → write,
resumable per bucket group (SURVEY.md §3.1 Spark translation).

Lifecycle parity with the reference's flagship path
(``POST /extract-batch``, ``routers/batches.py:262-427``):

| reference step | here |
|---|---|
| ingest + validation predicates | scan + ``parse_ok`` inside kernel |
| background task + semaphore(5) | Spark task scheduler |
| per-doc status rows (``PENDING→…``) | per-bucket checkpoint = snapshot manifest |
| extraction LLM call per chunk | pandas UDF batch per Arrow slice |
| Postgres insert per doc | bucket-partitioned parquet/Iceberg append |
| batch counters (``batches.py:221-241``) | per-bucket metrics in the snapshot |
"""

from __future__ import annotations

import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ai_pdf_extraction_spark.operators.extract import extract_udf
from ai_pdf_extraction_spark.plans.partitioning import (
    DEFAULT_N_BUCKETS,
    url_bucket,
    url_host,
)
from ai_pdf_extraction_spark.sources.snapshot_table import SnapshotTable

# Per-doc byte budget into the Python worker (P10); generous — the
# synthetic corpus max is ~50 KB, real CC pages p99 ≈ 500 KB.
MAX_DOC_BYTES = 4 * 1024 * 1024

# The output-schema contract, asserted against extraction_plan's
# actual projection in tests/test_plans.py (a stale copy of this list
# is how the streaming select drifted in round 1).
OUTPUT_COLUMNS = (
    "url",
    "warc_ts",
    "lang",
    "host",
    "content_type",
    "extracted_text",
    "spans",
    "parse_ok",
    "warnings",
    "confidence",
    "field_confidences",
    "n_chars",
    "n_spans",
    "tables",
    "n_pages",
    "run_id",
    "bucket",
)


def project_extraction(pages: DataFrame, run_id: str, n_buckets: int) -> DataFrame:
    """Payload cap + kernel UDF + output projection — the part of the
    plan shared VERBATIM by the batch pipeline and the streaming twin
    (stream-safe: no repartition, no rdd access)."""
    truncated = F.length(F.col("html")) > MAX_DOC_BYTES
    pages = pages.withColumn("_truncated", truncated).withColumn(
        "html",
        F.when(
            truncated, F.substring(F.col("html"), 1, MAX_DOC_BYTES)
        ).otherwise(F.col("html")),
    )
    extracted = pages.withColumn("extraction", extract_udf(F.col("html")))
    return extracted.select(
        "url",
        "warc_ts",
        "lang",
        url_host().alias("host"),
        F.col("extraction.content_type").alias("content_type"),
        F.col("extraction.extracted_text").alias("extracted_text"),
        F.col("extraction.spans").alias("spans"),
        F.col("extraction.parse_ok").alias("parse_ok"),
        F.when(
            F.col("_truncated"),
            F.array_union(
                F.col("extraction.warnings"),
                F.array(F.lit(f"input truncated at {MAX_DOC_BYTES} bytes")),
            ),
        )
        .otherwise(F.col("extraction.warnings"))
        .alias("warnings"),
        F.col("extraction.confidence").alias("confidence"),
        F.col("extraction.field_confidences").alias("field_confidences"),
        F.col("extraction.n_chars").alias("n_chars"),
        F.col("extraction.n_spans").alias("n_spans"),
        F.col("extraction.tables").alias("tables"),
        F.col("extraction.n_pages").alias("n_pages"),
        F.lit(run_id).alias("run_id"),
        url_bucket(n_buckets=n_buckets).alias("bucket"),
    )


def extraction_plan(
    pages: DataFrame,
    run_id: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Build the logical plan for one pass.

    Only ``(url, html)``-derived columns enter the Python worker; all
    metadata columns ride along JVM-side (SURVEY.md §4: project only
    what the black-box UDF needs).

    The kernel UDF is CPU-bound, so the scan must yield at least
    ``min_parallelism`` partitions (default 2× default parallelism =
    ≥2 task waves). A 100 TB crawl arrives as many files and skips
    this; a small local corpus is one parquet file → one partition →
    a single-threaded UDF without the explicit repartition.
    """
    spark = pages.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism * 2
    if pages.rdd.getNumPartitions() < target:
        pages = pages.repartition(target)
    # Payload cap + UDF + projection shared verbatim with the streaming
    # twin (reference's ≤2048px image downscale analogue, SURVEY.md
    # §2.2 P10: bound per-doc bytes so one pathological page can't blow
    # an Arrow batch; capped docs carry a truncation warning).
    return project_extraction(pages, run_id, n_buckets)


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    run_id: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    buckets_per_commit: int | None = None,
    input_format: str = "parquet",
) -> dict:
    """Run (or resume) extraction over a page corpus.

    Resume semantics (SURVEY.md §2.9 ST1): buckets already present in
    the output table's snapshot chain are skipped — the per-partition
    watermark. ``buckets_per_commit`` controls commit granularity
    (None = single commit; smaller values trade commit overhead for
    finer resume points, the knob a 1000-executor run would set to
    bound recomputation after preemption).

    ``output_root`` is a PATH: this chunked-resume writer drives the
    parquet+manifest ``SnapshotTable`` (its commit-id data layout and
    manifest chain). An Iceberg deployment instead drives
    ``project_extraction`` + ``make_output_table(...).append`` per
    bucket group — the shared append/read/committed_buckets interface
    (see the seam note in ``sources/snapshot_table.py``). A
    catalog-style name here fails loud rather than creating a local
    directory literally named ``catalog.ns.table``. The guard matches
    dotted word-char identifiers of ANY depth (``ns.table``,
    ``cat.ns.table``, ``cat.ns1.ns2.table`` — Iceberg namespaces nest,
    review r6) — a bare ``out.v2`` is inherently ambiguous with
    ``ns.table`` so it still fails loud, but the error names the escape
    and ``./out.v2`` (any path with a separator or non-identifier char)
    always reads as a path (advice r6).
    """
    if re.fullmatch(r"\w+(\.\w+)+", output_root):
        raise ValueError(
            f"output_root {output_root!r} looks like a catalog table name; "
            "run_extraction writes the parquet SnapshotTable layout — for "
            "Iceberg, drive project_extraction + make_output_table().append "
            "(prefix './' to force the path interpretation)"
        )
    table = SnapshotTable(output_root)
    # Resume invariant: the bucketing fanout is baked into every
    # committed row's bucket id — resuming with a different n_buckets
    # would re-hash urls into different buckets, silently duplicating
    # re-extracted rows and never scheduling ids ≥ the new fanout.
    prev_nb = table.table_property("n_buckets")
    if prev_nb is not None and int(prev_nb) != n_buckets:
        raise ValueError(
            f"table at {output_root!r} was written with n_buckets={prev_nb}; "
            f"resuming with n_buckets={n_buckets} would corrupt the bucket "
            "watermark — pass the original fanout"
        )
    done = table.committed_buckets()
    pending = [b for b in range(n_buckets) if b not in done]
    if not pending:
        return {"run_id": run_id, "committed": [], "skipped": sorted(done), "docs": 0}

    if input_format == "warc":
        from ai_pdf_extraction_spark.sources.warc import read_warc

        pages = read_warc(spark, input_path)
    else:
        pages = spark.read.parquet(input_path)
    plan = extraction_plan(pages, run_id, n_buckets)

    group = len(pending) if buckets_per_commit is None else buckets_per_commit
    committed: list[int] = []
    total_docs = 0
    for i in range(0, len(pending), group):
        chunk = pending[i : i + group]
        commit_id = table.new_commit_id()
        t0 = time.monotonic()
        out = plan.filter(F.col("bucket").isin(chunk)).withColumn(
            "commit_id", F.lit(commit_id)
        )
        out.write.partitionBy("bucket", "commit_id").mode("append").parquet(
            table.data_dir
        )
        elapsed = time.monotonic() - t0
        # Metrics computed from the written data (single extra scan of
        # the small output, never of the input binary column). An
        # all-empty chunk writes no files at all — commit an empty
        # watermark so resume still advances past it.
        try:
            written = (
                spark.read.option("basePath", table.data_dir)
                .parquet(table.data_dir)
                .filter(F.col("commit_id") == commit_id)
            )
            stats = (
                written.groupBy("bucket")
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias(
                        "n_parse_fail"
                    ),
                    F.sum("n_chars").alias("sum_chars"),
                    F.sum("n_spans").alias("sum_spans"),
                )
                .collect()
            )
        except AnalysisException as exc:
            if "UNABLE_TO_INFER_SCHEMA" not in str(exc):
                raise  # real failure, not the empty-chunk case
            stats = []
        n_docs = sum(r["n_docs"] for r in stats)
        metrics = [
            {
                "bucket": int(r["bucket"]),
                "n_docs": int(r["n_docs"]),
                "n_parse_fail": int(r["n_parse_fail"]),
                "parse_fail_rate": round(r["n_parse_fail"] / max(r["n_docs"], 1), 6),
                "sum_chars": int(r["sum_chars"]),
                "sum_spans": int(r["sum_spans"]),
                "commit_elapsed_sec": round(elapsed, 3),
                "commit_docs_per_sec": round(n_docs / max(elapsed, 1e-9), 3),
            }
            for r in stats
        ]
        # Buckets with zero rows still count as committed (watermark
        # must advance past empty partitions).
        table.commit(
            chunk, run_id, metrics, commit_id=commit_id,
            properties={"n_buckets": n_buckets},
        )
        committed.extend(chunk)
        total_docs += n_docs
    return {
        "run_id": run_id,
        "committed": committed,
        "skipped": sorted(done),
        "docs": total_docs,
    }
