"""Opt-in REAL-Iceberg integration check (r5 verdict #6).

``IcebergSnapshotTable`` (``sources/snapshot_table.py``) routes
correctly and its seam is unit-tested in both modes, but this sandbox
ships no Iceberg runtime jar, so no run against an actual catalog is
ever recorded. This job closes that evidence gap wherever a jar IS
available: point ``SPARK_GRAFT_ICEBERG_JAR`` at an
``iceberg-spark-runtime*.jar`` (or have one in ``$SPARK_HOME/jars``)
and run::

    python jobs/iceberg_integration_job.py [--warehouse DIR] [--docs 120]

It then drives the full append/resume/time-travel cycle against a real
hadoop-type catalog and asserts the manifest↔snapshot mapping the
seam's docstring documents:

* first ``append`` creates the table partitioned on ``bucket`` (the
  Iceberg twin of the fallback's hive layout);
* every commit's (run_id, buckets, metrics) bookkeeping round-trips
  through the snapshot SUMMARY (``graft.*`` properties) — the Iceberg
  analogue of the manifest chain;
* ``committed_buckets`` reproduces the resume watermark from those
  summaries, so a re-run schedules only missing buckets;
* ``read_at`` (VERSION AS OF) on the first snapshot sees only the
  first commit's rows — the snapshot chain is Iceberg's own;
* ``expire_snapshots`` (Iceberg's GC, the ``expire_superseded``
  analogue) leaves the live data readable.

Without a jar the job prints one ``{"skipped": ...}`` JSON line and
exits 0 — safe to wire into any CI lane; it only asserts where it can
actually run. No pytest drives the jar path (that is the point: this
is the out-of-sandbox evidence script); ``tests/test_io_streaming.py``
covers the seam's routing in both modes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

# standalone-runnable (`python jobs/iceberg_integration_job.py`): put
# the repo root on the path when the package isn't already importable
# (spark-submit --py-files provides it on a real cluster)
try:  # pragma: no cover - trivial path bootstrap
    import ai_pdf_extraction_spark  # noqa: F401
except ModuleNotFoundError:  # pragma: no cover
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_integration(warehouse: str, n_docs: int = 120) -> dict:
    """Drive append/resume/time-travel/expire against a real catalog.
    Raises AssertionError on any mapping violation; returns a summary
    dict. Caller guarantees an Iceberg jar is on the session path."""
    from ai_pdf_extraction_spark.corpus import write_pages_parquet
    from ai_pdf_extraction_spark.plans.pipeline import project_extraction
    from ai_pdf_extraction_spark.plans.partitioning import url_bucket
    from ai_pdf_extraction_spark.session import (
        ICEBERG_CATALOG,
        build_session,
        iceberg_available,
    )
    from ai_pdf_extraction_spark.sources.snapshot_table import (
        IcebergSnapshotTable,
        make_output_table,
    )
    from pyspark.sql import functions as F

    spark = build_session(
        app_name="iceberg-integration", iceberg_warehouse=warehouse
    )
    assert iceberg_available(spark), (
        "jar found at build time but the session JVM cannot load "
        "org.apache.iceberg.spark.SparkCatalog — check the jar's Spark/"
        "Scala version against this PySpark"
    )

    name = f"{ICEBERG_CATALOG}.graftdb.extractions"
    spark.sql(f"create namespace if not exists {ICEBERG_CATALOG}.graftdb")
    spark.sql(f"drop table if exists {name}")

    with tempfile.TemporaryDirectory() as td:
        pages_path = f"{td}/pages.parquet"
        write_pages_parquet(pages_path, n_docs, seed=11)
        pages = spark.read.parquet(pages_path)
        n_buckets = 8
        projected = project_extraction(pages, run_id="ice1", n_buckets=n_buckets)
        # bucket column mirrors run_extraction's layout key
        if "bucket" not in projected.columns:
            projected = projected.withColumn(
                "bucket", url_bucket(n_buckets=n_buckets)
            )
        projected = projected.persist()

        table = make_output_table(spark, name)
        assert isinstance(table, IcebergSnapshotTable), type(table).__name__

        # commit 1: buckets 0-3; commit 2: buckets 4-7 (append path)
        first = projected.filter(F.col("bucket") < 4)
        snap1 = table.append(
            first, buckets=[0, 1, 2, 3], run_id="ice1",
            metrics=[{"n_docs": first.count()}],
        )
        second = projected.filter(F.col("bucket") >= 4)
        snap2 = table.append(
            second, buckets=[4, 5, 6, 7], run_id="ice2",
            metrics=[{"n_docs": second.count()}],
        )

        # manifest↔snapshot mapping: bookkeeping round-trips through
        # the snapshot summaries, in commit order, with real parentage
        snaps = table.snapshots()
        assert [s["run_id"] for s in snaps] == ["ice1", "ice2"], snaps
        assert snaps[0]["buckets"] == [0, 1, 2, 3]
        assert snaps[1]["buckets"] == [4, 5, 6, 7]
        assert snaps[1]["parent_id"] == snaps[0]["snapshot_id"]
        assert snap2["snapshot_id"] == snaps[1]["snapshot_id"]

        # resume watermark from summaries alone
        assert table.committed_buckets() == set(range(8))
        pending = [b for b in range(n_buckets) if b not in table.committed_buckets()]
        assert pending == [], "resume must schedule nothing after full commit"

        # read + time travel
        total = table.read().count()
        assert total == projected.count() == n_docs
        at_first = table.read_at(None, snap1["snapshot_id"]).count()
        assert at_first == first.count(), (at_first, first.count())

        # snapshot GC: expire everything older than now, keep last 1 —
        # live data stays intact (Iceberg's expire_superseded analogue)
        spark.sql(
            f"call {ICEBERG_CATALOG}.system.expire_snapshots("
            f"table => 'graftdb.extractions', retain_last => 1, "
            f"older_than => TIMESTAMP '9999-01-01 00:00:00')"
        )
        assert table.read().count() == total
        projected.unpersist()

    summary = {
        "skipped": False,
        "table": name,
        "n_docs": n_docs,
        "snapshots": [s["snapshot_id"] for s in snaps],
        "time_travel_rows": at_first,
        "total_rows": total,
    }
    spark.stop()
    return summary


def main() -> int:
    parser = argparse.ArgumentParser(
        description="opt-in real-Iceberg append/resume/expire integration check"
    )
    parser.add_argument("--warehouse", default=None)
    parser.add_argument("--docs", type=int, default=120)
    args = parser.parse_args()

    from ai_pdf_extraction_spark.session import find_iceberg_jar

    jar = find_iceberg_jar()
    if jar is None:
        print(
            json.dumps(
                {
                    "skipped": True,
                    "reason": "no iceberg-spark-runtime jar "
                    "(set SPARK_GRAFT_ICEBERG_JAR to run)",
                }
            )
        )
        return 0
    if args.warehouse is not None:
        summary = run_integration(args.warehouse, args.docs)
    else:
        with tempfile.TemporaryDirectory() as wh:
            summary = run_integration(wh, args.docs)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
