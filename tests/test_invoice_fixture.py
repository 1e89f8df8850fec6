"""Invoice-class end-to-end flow (FIXTURES.md §3a; the reference's
Invoices golden corpus, ``app/test-pdfs/Invoices/``): raw string
fields → typed normalization → validation rule with tolerance →
rule-driven repair → CSV/JSON export."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

RAW_INVOICES = [
    # (file, invoice_number, issue_date, items, net, vat, gross)
    (
        "inv1.pdf",
        "INV-001",
        "01/15/2024",
        [{"description": "widget, large", "quantity": "2", "net_price": "$10.00"}],
        "$100.00",
        "$23.00",
        "$123.00",
    ),
    ("inv2.pdf", "INV-002", "15/01/2024", [], "€1.234,56", "€246,91", None),  # gross missing → repair
    ("inv3.pdf", "INV-003", "January 15, 2024", [], "1000", "230", "1,230.00"),
    ("inv4.pdf", "INV-004", "not a date", [], "50.00", "10.00", "99.99"),  # rule violation
]

SCHEMA = (
    "source_file string, invoice_number string, issue_date string, "
    "items array<struct<description string, quantity string, net_price string>>, "
    "summary_net_worth string, summary_vat string, summary_gross_worth string"
)

RULE = "summary_gross_worth == summary_net_worth + summary_vat"


def _normalized(spark):
    from ai_pdf_extraction_spark.functions.normalize import (
        parse_currency,
        parse_date,
        parse_number,
    )

    df = spark.createDataFrame(RAW_INVOICES, SCHEMA)
    return df.select(
        "source_file",
        "invoice_number",
        parse_date("issue_date").alias("issue_date"),
        F.transform(
            "items",
            lambda it: F.struct(
                it["description"].alias("description"),
                parse_number(it["quantity"]).alias("quantity"),
                parse_currency(it["net_price"]).alias("net_price"),
            ),
        ).alias("items"),
        parse_currency("summary_net_worth").alias("summary_net_worth"),
        parse_currency("summary_vat").alias("summary_vat"),
        parse_currency("summary_gross_worth").alias("summary_gross_worth"),
    )


def test_invoice_normalization(spark):
    rows = {r["source_file"]: r for r in _normalized(spark).collect()}
    assert rows["inv1.pdf"]["issue_date"] == datetime.date(2024, 1, 15)
    assert rows["inv2.pdf"]["issue_date"] == datetime.date(2024, 1, 15)
    assert rows["inv3.pdf"]["issue_date"] == datetime.date(2024, 1, 15)
    assert rows["inv4.pdf"]["issue_date"] is None  # unparseable → null+warn path
    assert rows["inv2.pdf"]["summary_net_worth"] == 1234.56  # EU format
    assert rows["inv3.pdf"]["summary_gross_worth"] == 1230.0  # US thousands
    item = rows["inv1.pdf"]["items"][0]
    assert item["quantity"] == 2.0 and item["net_price"] == 10.0


def test_invoice_rule_validation_and_repair(spark):
    from ai_pdf_extraction_spark.functions.rules import compile_rule
    from ai_pdf_extraction_spark.plans.repair import repair_with_rules

    df = _normalized(spark)
    repaired = repair_with_rules(df, [RULE])
    rows = {r["source_file"]: r for r in repaired.collect()}
    # inv2's missing gross is derived from the rule: 1234.56 + 246.91
    assert abs(rows["inv2.pdf"]["summary_gross_worth"] - 1481.47) < 1e-9
    assert rows["inv2.pdf"]["repaired_fields"] == ["summary_gross_worth"]
    assert rows["inv1.pdf"]["repaired_fields"] == []

    fields = {c: F.col(c) for c in repaired.columns}
    checked = repaired.withColumn("rule_ok", compile_rule(RULE, fields))
    ok = {r["source_file"]: r["rule_ok"] for r in checked.collect()}
    assert ok["inv1.pdf"] is True  # 100 + 23 == 123
    assert ok["inv2.pdf"] is True  # repaired value satisfies by construction
    assert ok["inv3.pdf"] is True  # 1000 + 230 == 1230
    assert ok["inv4.pdf"] is False  # 50 + 10 != 99.99 (beyond tolerance)


def test_invoice_export_round_trip(spark, tmp_path):
    import csv as csvmod
    import glob
    import json
    import os

    from ai_pdf_extraction_spark.plans.repair import repair_with_rules
    from ai_pdf_extraction_spark.sources.export import export_csv, export_json

    df = repair_with_rules(_normalized(spark), [RULE]).withColumn(
        "confidence", F.lit(0.95)
    )
    # per-field confidence map (reference field_confidences dict):
    # repaired/missing fields carry no entry → '' in the CSV
    df = df.withColumn(
        "field_confidences",
        F.when(
            F.col("source_file") == "inv2.pdf",
            F.create_map(F.lit("invoice_number"), F.lit(0.99)),
        ).otherwise(
            F.create_map(
                F.lit("invoice_number"), F.lit(0.99),
                F.lit("summary_gross_worth"), F.lit(0.875),
            )
        ),
    )
    out_csv = str(tmp_path / "inv_csv")
    export_csv(
        df, out_csv, confidence_fields=["invoice_number", "summary_gross_worth"]
    )
    with open(glob.glob(os.path.join(out_csv, "*.csv"))[0]) as fh:
        rows = {r["source_file"]: r for r in csvmod.DictReader(fh)}
    assert rows["inv1.pdf"]["items"].count("|") == 0  # single item, no joiner
    assert "; " in rows["inv1.pdf"]["items"]  # comma inside JSON escaped
    assert rows["inv2.pdf"]["summary_gross_worth"] == "1481.47"
    # <field>_confidence columns: round(conf*100) as string, '' if absent
    # (EditableResultsTable.tsx:241-244)
    assert rows["inv1.pdf"]["invoice_number_confidence"] == "99"
    assert rows["inv1.pdf"]["summary_gross_worth_confidence"] == "88"
    assert rows["inv2.pdf"]["summary_gross_worth_confidence"] == ""
    assert "field_confidences" not in rows["inv1.pdf"]

    env = export_json(
        df, str(tmp_path / "inv_json"), schema_name="invoice",
        batch_id="b1", exported_at="2026-01-01T00:00:00Z",
        confidence_col="confidence",
    )
    assert env["total_documents"] == 4
    assert env["average_confidence"] == 0.95


def test_repair_alternative_rules_same_field(spark):
    """Two rules deriving the same field must not clobber each other's
    repair markers (round-2 review regression)."""
    from pyspark.sql import Row

    from ai_pdf_extraction_spark.plans.repair import repair_with_rules

    df = spark.createDataFrame(
        [
            Row(f="a.pdf", total=None, subtotal=10.0, tax=2.0, gross=None, disc=None),
            Row(f="b.pdf", total=None, subtotal=None, tax=None, gross=15.0, disc=3.0),
            Row(f="c.pdf", total=9.0, subtotal=1.0, tax=1.0, gross=1.0, disc=1.0),
        ]
    )
    out = {
        r["f"]: r
        for r in repair_with_rules(
            df, ["total == subtotal + tax", "total == gross - disc"]
        ).collect()
    }
    assert out["a.pdf"]["total"] == 12.0
    assert out["a.pdf"]["repaired_fields"] == ["total"]  # not [] and not doubled
    assert out["b.pdf"]["total"] == 12.0  # second rule fills it
    assert out["b.pdf"]["repaired_fields"] == ["total"]
    assert out["c.pdf"]["repaired_fields"] == []
