"""Deterministic repair pass (SURVEY.md §3.3 smart-repair).

The reference's ``POST /documents/{id}/smart-repair`` re-asks an LLM to
fill missing/inconsistent fields and records a diff into
``manual_overrides`` (``services/ai/repair.py:57-223``,
``routers/documents.py:157-187``). The deterministic rebuild derives
missing values from the validation rules themselves: a rule
``total == subtotal + tax`` becomes ``coalesce(total, subtotal + tax)``
— pure Catalyst expressions, applied corpus-wide in one pass instead
of per-document API calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_pdf_extraction_spark.functions.rules import (
    RuleCompileError,
    compile_side,
    rule_fields,
)


def repair_with_rules(df: DataFrame, rules: list[str]) -> DataFrame:
    """For each rule ``lhs == rhs`` where ``lhs`` is a bare column,
    fill null ``lhs`` from the compiled ``rhs`` expression. Emits a
    ``repaired_fields`` array column — the analogue of the reference's
    repair diff accounting (``repair.py:196-216``)."""
    fields = {name: F.col(name) for name in df.columns}
    repaired_markers = []
    out = df
    for i, rule in enumerate(rules):
        if "==" not in rule:
            continue
        lhs, rhs = (side.strip() for side in rule.split("==", 1))
        if lhs not in df.columns:
            continue  # only bare-column targets are derivable
        try:
            if not rule_fields(rhs) <= set(df.columns):
                continue  # plan-time sanity check (validation.py:288-342)
            rhs_col = compile_side(rhs, fields)
        except RuleCompileError:
            continue  # malformed rule: skip, like every other bad shape
        was_null = F.col(lhs).isNull() & rhs_col.isNotNull()
        # marker keyed per RULE, not per lhs: two rules offering
        # alternative derivations of the same field must not overwrite
        # each other's marker (the second rule's was_null is False
        # after the first repaired the value)
        marker = f"__repaired_{i}_{lhs}"
        out = out.withColumn(marker, was_null).withColumn(
            lhs, F.coalesce(F.col(lhs), rhs_col)
        )
        repaired_markers.append(F.when(F.col(marker), F.lit(lhs)))
    if repaired_markers:
        out = out.withColumn(
            "repaired_fields",
            F.array_distinct(F.array_compact(F.array(*repaired_markers))),
        )
        out = out.drop(*[c for c in out.columns if c.startswith("__repaired_")])
    else:
        out = out.withColumn("repaired_fields", F.array().cast("array<string>"))
    return out
