"""Read-side status/metrics queries over the output table + snapshot
lineage (SURVEY.md §2.4 A8-A11, §3.3 batch status).

The reference recomputes batch progress on every ``GET
/batches/{id}/status`` poll (``routers/batches.py:430-542``); here the
same aggregation runs over the committed output table and the snapshot
manifests are the durable per-partition lineage (north_rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ai_pdf_extraction_spark.sources.snapshot_table import SnapshotTable


def batch_status(spark: SparkSession, table: SnapshotTable, n_buckets: int) -> dict:
    """Progress + counters, one small aggregation (A8/A9/A11)."""
    committed = table.committed_buckets()
    if not committed:
        return {
            "progress_pct": 0.0,
            "buckets_done": 0,
            "n_buckets": n_buckets,
            "n_docs": 0,
            "n_parse_fail": 0,
        }
    try:
        row = (
            table.read(spark)
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias(
                    "n_parse_fail"
                ),
            )
            .collect()[0]
        )
    except AnalysisException as exc:
        # committed-but-empty table: buckets were committed (watermark
        # advanced) but an all-empty input wrote zero parquet files —
        # UNABLE_TO_INFER_SCHEMA must not crash a successful run's
        # status poll. Any OTHER analysis error (schema drift, corrupt
        # path) is a real failure and must surface, not read as 0 docs.
        if "UNABLE_TO_INFER_SCHEMA" not in str(exc):
            raise
        row = {"n_docs": 0, "n_parse_fail": 0}
    return {
        "progress_pct": round(100.0 * len(committed) / n_buckets, 2),
        "buckets_done": len(committed),
        "n_buckets": n_buckets,
        # `or 0`: zero committed ROWS with orphaned files present reads
        # as an empty frame where sum() is NULL, not 0
        "n_docs": int(row["n_docs"] or 0),
        "n_parse_fail": int(row["n_parse_fail"] or 0),
    }


def per_host_metrics(output: DataFrame) -> DataFrame:
    """Docs / parse-fail rate / span counts per host — skew-aware:
    pre-aggregates per (host, bucket) first (bucket is already a
    partition of the data), then combines, so a hot host never lands
    on one reducer in the first shuffle."""
    partial = output.groupBy("host", "bucket").agg(
        F.count("*").alias("n"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("fails"),
        F.sum("n_spans").alias("spans"),
    )
    return partial.groupBy("host").agg(
        F.sum("n").alias("n_docs"),
        F.round(F.sum("fails") / F.sum("n"), 6).alias("parse_fail_rate"),
        F.sum("spans").alias("n_spans"),
    )


def lineage_df(spark: SparkSession, table: SnapshotTable) -> DataFrame:
    """Per-partition lineage rows from the snapshot chain as a
    DataFrame (run_id, snapshot, bucket, counters, throughput)."""
    schema = (
        "snapshot_id string, parent_id string, run_id string, bucket int, "
        "n_docs long, n_parse_fail long, parse_fail_rate double, "
        "sum_chars long, sum_spans long, commit_elapsed_sec double, "
        "commit_docs_per_sec double"
    )
    fields = [f.split(" ")[0] for f in schema.split(", ")]
    rows = [tuple(r.get(f) for f in fields) for r in table.lineage()]
    return spark.createDataFrame(rows, schema)
