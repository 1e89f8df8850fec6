"""SparkSession factory with scale-oriented defaults.

Encodes the physical-execution decisions from SURVEY.md §4: AQE on
(coalesce + skew-join split), Arrow enabled for the pandas-UDF hot
path, Arrow batch size capped so batches of large ``html`` binary
columns fit executor memory (SURVEY.md §7.4), and shuffle partitions
sized to parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Cap Arrow record batches: html payloads are tens-of-KB each, so 256
# rows/batch keeps JVM→Python transfer well under memory limits even
# at Common-Crawl page sizes (SURVEY.md §7.4 "Large binary columns
# through Arrow").
ARROW_MAX_RECORDS_PER_BATCH = 256


def build_session(
    app_name: str = "ai-pdf-extraction-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # local[N] → N; a real cluster master string falls back to cpus.
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            par = cpus if inner == "*" else int(inner)
        else:
            par = cpus
        shuffle_partitions = max(par, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-plan, shuffle-partition coalescing, skew-join
        # splitting (north_rule "AQE-tuned shuffle").
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow hot path for pandas UDFs (input_hint: no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # Keep scans splittable at 100 TB: default 128m splits; at
        # local scale this is moot but harmless.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the ``spark-submit --py-files``
    contract from the north_rule, applied programmatically so Python
    workers resolve the kernel imports regardless of driver cwd)."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # imported from a zip (spark-submit --py-files already shipped
        # the package to executors) — nothing to do
        return
    pkg_name = os.path.basename(pkg_dir)
    # cache key = newest source mtime across the whole tree (the dir's
    # own mtime misses edits inside subpackages → stale code shipped)
    newest = 0.0
    for root, _dirs, files in os.walk(pkg_dir):
        for name in files:
            if name.endswith(".py"):
                newest = max(newest, os.path.getmtime(os.path.join(root, name)))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{newest:.0f}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for name in files:
                    if name.endswith(".py"):
                        full = os.path.join(root, name)
                        rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                        zf.write(full, rel)
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
