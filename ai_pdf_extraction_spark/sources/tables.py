"""Table loaders for the driver testdata and the page corpus."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read a page corpus ``(url, warc_ts, html, text, lang)``.

    In production this is ``spark.read.format('iceberg').load(tbl)``;
    the sandbox has no Iceberg jar, so parquet paths serve as the
    physical layout (SURVEY.md §7.4 fallback). Column pruning still
    applies: metrics-only readers must select away the ``html`` binary
    before any action.
    """
    return spark.read.parquet(path)
