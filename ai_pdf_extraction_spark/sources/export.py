"""Export sinks: CSV with array flattening, JSON with batch envelope.

Rebuilds the reference frontend's exporters
(``app/frontend/src/components/EditableResultsTable.tsx:202-288``,
SURVEY.md §2.1 S9/S10) as Spark writers:

* CSV cells for array fields are ``' | '``-joined JSON objects with
  ``','`` → ``'; '`` inside each object (so the cell never fights the
  CSV delimiter); per-field confidences become ``<field>_confidence``
  columns.
* JSON export wraps rows in an envelope ``{schema, batch_id,
  exported_at, total_documents, average_confidence, results}``.
"""

from __future__ import annotations

import json
import os

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def csv_cell(col: Column | str, is_array_of_struct: bool) -> Column:
    """Format one cell the way the reference's ``exportToCSV`` does
    (``EditableResultsTable.tsx:202-224``)."""
    c = F.col(col) if isinstance(col, str) else col
    if is_array_of_struct:
        return F.concat_ws(
            " | ",
            F.transform(c, lambda x: F.replace(F.to_json(x), F.lit(","), F.lit("; "))),
        )
    return c.cast("string")


def flatten_for_csv(
    df: DataFrame,
    confidence_fields: Sequence[str] | None = None,
    confidence_map_col: str = "field_confidences",
) -> DataFrame:
    """Project every column to a CSV-safe string column; arrays of
    structs get the ``' | '`` join treatment, plain arrays are joined
    with ``'; '``, maps become JSON.

    When ``confidence_fields`` is given and ``confidence_map_col``
    exists, the map is expanded into trailing ``<field>_confidence``
    columns holding ``round(conf*100)`` as a string ('' when absent) —
    the reference's exportToCSV confidence columns
    (``EditableResultsTable.tsx:231-244``)."""
    expand_conf = confidence_fields is not None and confidence_map_col in df.columns
    cols = []
    for field in df.schema.fields:
        if expand_conf and field.name == confidence_map_col:
            continue  # replaced by the <field>_confidence columns below
        if isinstance(field.dataType, ArrayType):
            # struct/array/map elements all take the reference's
            # ' | '-joined-JSON treatment (covers the nested `tables`
            # payload: array<array<map<string,string>>>)
            if isinstance(
                field.dataType.elementType, (StructType, ArrayType, MapType)
            ):
                cols.append(csv_cell(field.name, True).alias(field.name))
            else:
                cols.append(
                    F.concat_ws("; ", F.col(field.name).cast("array<string>")).alias(
                        field.name
                    )
                )
        elif isinstance(field.dataType, MapType):
            cols.append(F.to_json(field.name).alias(field.name))
        else:
            cols.append(F.col(field.name).cast("string").alias(field.name))
    if expand_conf:
        for f in confidence_fields:
            conf = F.try_element_at(F.col(confidence_map_col), F.lit(f))
            cols.append(
                F.coalesce(
                    F.round(conf * 100, 0).cast("int").cast("string"), F.lit("")
                ).alias(f"{f}_confidence")
            )
    return df.select(*cols)


def export_csv(
    df: DataFrame, path: str, confidence_fields: Sequence[str] | None = None
) -> None:
    """Header + quoted/escaped CSV (Spark's writer does the ``"``→``""``
    escaping the reference hand-rolls at ``EditableResultsTable.tsx:247-256``)."""
    flatten_for_csv(df, confidence_fields=confidence_fields).coalesce(1).write.option(
        "header", True
    ).option("quoteAll", False).mode("overwrite").csv(path)


def export_json(
    df: DataFrame,
    path: str,
    schema_name: str,
    batch_id: str,
    exported_at: str,
    confidence_col: str | None = None,
) -> dict:
    """JSON export with the reference envelope
    (``EditableResultsTable.tsx:267-288``). Rows are written
    distributed (one JSON object per line); the envelope summary is a
    tiny driver-side sidecar — the only driver-side piece, O(1).

    ``exported_at`` is caller-provided (deterministic tests; the
    reference stamps ``new Date().toISOString()``).
    """
    os.makedirs(path, exist_ok=True)
    # persist around the write + envelope agg: df is typically the raw
    # extraction plan, and without the cache the kernel UDF would run
    # the whole corpus twice (once per action)
    df = df.persist()
    try:
        df.write.mode("overwrite").json(os.path.join(path, "results"))
        agg = [F.count("*").alias("total_documents")]
        if confidence_col:
            agg.append(
                F.round(F.avg(confidence_col), 3).alias("average_confidence")
            )
        row = df.agg(*agg).collect()[0]
    finally:
        # a failed write must not leave the whole extraction corpus
        # pinned in executor storage for the rest of the session
        df.unpersist()
    envelope = {
        "schema": schema_name,
        "batch_id": batch_id,
        "exported_at": exported_at,
        "total_documents": row["total_documents"],
        "average_confidence": row["average_confidence"] if confidence_col else None,
    }
    with open(os.path.join(path, "envelope.json"), "w") as fh:
        json.dump(envelope, fh, indent=1)
    return envelope
