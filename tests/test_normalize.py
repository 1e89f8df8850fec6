"""Scalar normalizer + rule-engine tests — the reference's own unit
vectors transliterated (``tests/test_ai_service.py``; FIXTURES.md §4)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ai_pdf_extraction_spark.functions.normalize import (
    clean_null_from_array,
    is_valid_email,
    normalize_field_name,
    parse_boolean,
    parse_currency,
    parse_date,
    parse_number,
    parse_percentage,
    required_empty_warning,
    round_confidence,
)
from ai_pdf_extraction_spark.functions.rules import (
    RuleCompileError,
    compile_rule,
    rule_fields,
)


def _eval1(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def _eval_str(spark, builder, value):
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(builder("s").alias("v")).first()["v"]


CURRENCY_CASES = [
    # reference tests/test_ai_service.py:20-57
    ("$1,234.56", 1234.56),
    ("€1.234,56", 1234.56),
    ("1234,56", 1234.56),
    ("¥1000", 1000.0),
    ("1,234.56", 1234.56),
    ("1.234,56", 1234.56),
    ("-42.50", -42.5),
    ("$0.99", 0.99),
    ("", None),
    (None, None),
    ("not a number", None),
    # price-parser breadth (reference primary path, validation.py:56-60):
    # space thousands, currency-code prefix/suffix, symbol suffix
    ("USD 1 234,56", 1234.56),
    ("1 234.56", 1234.56),
    ("100.00 EUR", 100.0),
    ("1.000,00 €", 1000.0),
    ("£500.00", 500.0),
    ("1000 USD", 1000.0),
]


@pytest.mark.parametrize("raw,expected", CURRENCY_CASES)
def test_parse_currency(spark, raw, expected):
    got = _eval_str(spark, parse_currency, raw)
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


DATE_CASES = [
    # reference tests/test_ai_service.py:59-88
    ("2024-01-15", datetime.date(2024, 1, 15)),
    ("01/15/2024", datetime.date(2024, 1, 15)),  # US wins ambiguity
    ("15/01/2024", datetime.date(2024, 1, 15)),
    ("January 15, 2024", datetime.date(2024, 1, 15)),
    ("Jan 15, 2024", datetime.date(2024, 1, 15)),
    ("15 January 2024", datetime.date(2024, 1, 15)),
    ("32/13/2024", None),
    ("not a date", None),
    (None, None),
    # dateutil-fallback breadth (reference validation.py:129-135)
    ("Jan 15th, 2024", datetime.date(2024, 1, 15)),
    ("January 3rd, 2024", datetime.date(2024, 1, 3)),
    ("15-Jan-2024", datetime.date(2024, 1, 15)),
    ("15-JAN-2024", datetime.date(2024, 1, 15)),
    ("2024.01.15", datetime.date(2024, 1, 15)),
    ("15.01.2024", datetime.date(2024, 1, 15)),  # month-first invalid → dayfirst
    ("01.15.2024", datetime.date(2024, 1, 15)),  # dateutil month-first preferred
    ("15 Jan 2024", datetime.date(2024, 1, 15)),
    ("January 15 2024", datetime.date(2024, 1, 15)),
    ("JANUARY 15, 2024", datetime.date(2024, 1, 15)),
    # single-digit numerics (dateutil parses these; MM/dd nulled them)
    ("1/5/2024", datetime.date(2024, 1, 5)),
    ("2024-1-5", datetime.date(2024, 1, 5)),
    ("2024/1/5", datetime.date(2024, 1, 5)),
]


def test_parse_currency_lone_comma_decimal(spark):
    """Pinned divergence note (normalize.py): ',d' is a decimal comma,
    matching the reference's PRIMARY price-parser path — the
    regex-fallback (validation.py:72-77) would give 12345.0 but is only
    reached when price-parser fails, which it doesn't for this input."""
    assert _eval_str(spark, parse_currency, "1234,5") == pytest.approx(1234.5)


CURRENCY_CODE_CASES = [
    # (raw, detected token, ISO code)
    ("$1,234.56", "$", "USD"),
    ("US$ 99.50", "US$", "USD"),
    ("€1.234,56", "€", "EUR"),
    ("1.234,56 €", "€", "EUR"),  # suffix symbol (EU layout)
    ("£500.00", "£", "GBP"),
    ("¥1,234", "¥", "JPY"),
    ("1000 USD", "USD", "USD"),
    ("eur 5", None, None),  # ISO codes are case-sensitive uppercase
    ("R$ 12,50", "R$", "BRL"),
    ("₹ 1,00,000", "₹", "INR"),
    ("99 ¢", "¢", None),  # subunit: detected but not an ISO code
    ("1234.56", None, None),  # plain number: code-less
    ("", None, None),
]


@pytest.mark.parametrize("raw,token,iso", CURRENCY_CODE_CASES)
def test_currency_code_detection(spark, raw, token, iso):
    from ai_pdf_extraction_spark.functions.normalize import (
        currency_code,
        detect_currency,
    )

    assert _eval_str(spark, detect_currency, raw) == token
    assert _eval_str(spark, currency_code, raw) == iso


def test_currency_code_keeps_numeric_path_byte_stable(spark):
    """The companion column must not perturb parse_currency."""
    for raw, expect in [("US$ 99.50", 99.5), ("1.234,56 €", 1234.56)]:
        assert _eval_str(spark, parse_currency, raw) == pytest.approx(expect)


@pytest.mark.parametrize("raw,expected", DATE_CASES)
def test_parse_date(spark, raw, expected):
    assert _eval_str(spark, parse_date, raw) == expected


def test_date_ambiguity_us_first(spark):
    # 03/04/2024: reference tries MM/DD first → March 4th.
    assert _eval_str(spark, parse_date, "03/04/2024") == datetime.date(2024, 3, 4)


BOOL_CASES = [
    ("yes", True), ("y", True), ("TRUE", True), ("1", True), ("on", True),
    ("no", False), ("n", False), ("False", False), ("0", False), ("off", False),
    ("maybe", None), ("", None),
]


@pytest.mark.parametrize("raw,expected", BOOL_CASES)
def test_parse_boolean(spark, raw, expected):
    assert _eval_str(spark, parse_boolean, raw) is expected


def test_parse_number_and_percentage(spark):
    assert _eval_str(spark, parse_number, "1,234,567") == 1234567.0
    assert _eval_str(spark, parse_number, "3.14") == pytest.approx(3.14)
    assert _eval_str(spark, parse_number, "junk") is None
    assert _eval_str(spark, parse_percentage, "85.5%") == pytest.approx(85.5)
    assert _eval_str(spark, parse_percentage, "12 %") == pytest.approx(12.0)
    assert _eval_str(spark, parse_percentage, "n/a") is None


def test_email_and_field_name(spark):
    assert _eval_str(spark, is_valid_email, "a@b.com") is True
    assert _eval_str(spark, is_valid_email, "nope") is False
    assert _eval_str(spark, normalize_field_name, "Invoice-Number!") == "invoice_number"


def test_array_null_cleaning_and_warnings(spark):
    df = spark.createDataFrame([([1, None, 2], "")], "arr array<int>, s string")
    row = df.select(
        clean_null_from_array("arr").alias("cleaned"),
        required_empty_warning("s", "total").alias("warn"),
    ).first()
    assert row["cleaned"] == [1, 2]
    assert row["warn"] == ["Required field 'total' is empty"]


def test_confidence_rounding(spark):
    assert _eval1(spark, round_confidence(F.lit(0.87654))) == pytest.approx(0.877)


# --- rule engine (reference tests/test_ai_service.py:232-426) --------


def _rule_eval(spark, rule, **fields):
    df = spark.createDataFrame(
        [tuple(fields.values())], ", ".join(f"{k} double" for k in fields)
    )
    cols = {k: F.col(k) for k in fields}
    return df.select(compile_rule(rule, cols).alias("ok")).first()["ok"]


def test_rule_exact_sum(spark):
    # Invoice fixture rule (FIXTURES.md §3a)
    assert _rule_eval(
        spark,
        "summary_gross_worth == summary_net_worth + summary_vat",
        summary_gross_worth=123.0,
        summary_net_worth=100.0,
        summary_vat=23.0,
    ) is True


def test_rule_tolerance(spark):
    # within max(1%, 0.02) passes; beyond fails (validation.py:229-241)
    assert _rule_eval(spark, "a == b", a=100.0, b=100.9) is True
    assert _rule_eval(spark, "a == b", a=100.0, b=102.0) is False
    assert _rule_eval(spark, "a == b", a=0.01, b=0.02) is True  # abs floor


def test_rule_parentheses_division_functions(spark):
    assert _rule_eval(spark, "total == (sub + tax) / 2", total=50.0, sub=60.0, tax=40.0)
    assert _rule_eval(spark, "x == round(3.456, 2)", x=3.46)
    assert _rule_eval(spark, "x == abs(0 - 5)", x=5.0)
    assert _rule_eval(spark, "x == min(3, 7)", x=3.0)
    assert _rule_eval(spark, "x == max(3, 7)", x=7.0)
    assert _rule_eval(spark, "x == sqrt(16)", x=4.0)
    assert _rule_eval(spark, "x == pow(2, 10)", x=1024.0)


def test_rule_missing_operand_skips(spark):
    # reference skips rules whose operands are missing (null result)
    assert _rule_eval(spark, "a == b", a=None, b=3.0) is None


def test_rule_sum_over_array(spark):
    df = spark.createDataFrame([(6.0, [1.0, 2.0, 3.0])], "total double, xs array<double>")
    ok = df.select(
        compile_rule("total == sum(xs)", {"total": F.col("total"), "xs": F.col("xs")}).alias("ok")
    ).first()["ok"]
    assert ok is True


def test_rule_rejects_bad_input():
    with pytest.raises(RuleCompileError):
        compile_rule("a == __import__('os')", {"a": F.lit(1.0)})
    with pytest.raises(RuleCompileError):
        compile_rule("no equals here", {})
    with pytest.raises(RuleCompileError):
        compile_rule("a == unknown_field", {"a": F.lit(1.0)})


def test_rule_fields_extraction():
    assert rule_fields("total == sum(items) + tax") == {"total", "items", "tax"}


def test_rule_division_by_zero_yields_null(spark):
    """ANSI '/' would kill the job; the compiled rule must skip the row
    (null) like the reference's per-document exception handling."""
    assert _rule_eval(spark, "a / b == c", a=1.0, b=0.0, c=5.0) is None


def test_rule_on_string_field_yields_null(spark):
    """repair builds fields from ALL columns; a rule touching a
    non-numeric string column must yield null, not an ANSI cast crash."""
    df = spark.createDataFrame([("abc", 1.0)], "s string, a double")
    got = df.select(
        compile_rule("s == a", {"s": F.col("s"), "a": F.col("a")}).alias("ok")
    ).first()["ok"]
    assert got is None


def test_rule_rejects_kwargs_and_bad_arity():
    from ai_pdf_extraction_spark.functions.rules import compile_side

    with pytest.raises(RuleCompileError):  # kwargs silently changed semantics
        compile_side("round(a, ndigits=2)", {"a": F.lit(1.234)})
    with pytest.raises(RuleCompileError):
        compile_side("pow(a)", {"a": F.lit(2.0)})
    with pytest.raises(RuleCompileError):
        compile_side("min(a)", {"a": F.lit(2.0)})
    with pytest.raises(RuleCompileError):
        compile_side("sqrt()", {})


def test_rule_fields_raises_on_unparseable():
    """rule_fields is the plan-time guard — a partial/empty set for an
    unparseable rule would let it through to crash at compile time."""
    with pytest.raises(RuleCompileError):
        rule_fields("total == b +")


def test_repair_skips_unparseable_rule(spark):
    from ai_pdf_extraction_spark.plans.repair import repair_with_rules

    df = spark.createDataFrame([(None, 2.0)], "a double, b double")
    out = repair_with_rules(df, ["a == b +", "a == b"]).first()
    assert out["a"] == 2.0  # bad rule skipped, good rule applied
    assert out["repaired_fields"] == ["a"]


def test_schema_registry_listing_and_soft_delete(tmp_path):
    """Reference parity (routers/schemas.py:42-209): listings exclude
    soft-deleted schemas, explicit-version fetch still returns them,
    latest resolves the highest non-deleted version, and an unsupported
    field type fails at LOAD."""
    import json

    import pytest

    from ai_pdf_extraction_spark.functions import schema_registry as sr

    assert sr.list_schemas()["invoice"] == [1, 2]
    assert "legacy_report" not in sr.list_schemas()
    assert sr.latest_version("invoice") == 2
    assert sr.load_schema("invoice")["version"] == 2
    assert sr.load_schema("invoice", version=1)["version"] == 1
    assert sr.load_schema("legacy_report", version=1)["deleted"] is True
    with pytest.raises(KeyError):
        sr.latest_version("legacy_report")
    with pytest.raises(KeyError):
        sr.load_schema("invoice", version=9)

    bad = {"name": "x", "version": 1, "fields": [{"name": "a", "type": "blob"}]}
    (tmp_path / "x_v1.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="unsupported type"):
        sr.load_schema("x", schema_dir=str(tmp_path))


def test_schema_evolution_v2_superset_and_typed_apply(spark):
    """The committed invoice v1→v2 evolution: v2's output columns are a
    strict superset of v1's, shared fields parse identically, the new
    required field warns on explicit null/empty but is TRUSTED when its
    key is absent, and the whole application plan is UDF-free (pure
    Catalyst)."""
    from ai_pdf_extraction_spark.functions.schema_registry import (
        apply_schema,
        load_schema,
    )

    docs = spark.createDataFrame(
        [
            (1, '{"invoice_number": "INV-7", "total": "$1,234.50", '
                '"issued_on": "01/15/2024", "paid": "yes", '
                '"discount_pct": "12%", "po_reference": "PO-9", '
                '"contact_email": "a@b.com"}'),
            (2, '{"invoice_number": "", "total": "oops", '
                '"po_reference": null, "contact_email": "nope"}'),
            (3, '{"invoice_number": "INV-8", "total": "$1.00"}'),
        ],
        "id long, doc string",
    )
    v1 = apply_schema(docs, load_schema("invoice", version=1), "doc", keys=["id"])
    v2 = apply_schema(docs, load_schema("invoice", version=2), "doc", keys=["id"])
    assert set(v1.columns) < set(v2.columns)

    r1, r2, r3 = [r.asDict() for r in v2.orderBy("id").collect()]
    assert r1["invoice_number"] == "INV-7" and r1["total"] == 1234.5
    assert str(r1["issued_on"]) == "2024-01-15" and r1["paid"] is True
    assert r1["discount_pct"] == 12.0 and r1["contact_email"] == "a@b.com"
    assert r1["schema_warnings"] == []
    # row 2: empty-string required invoice_number + EXPLICIT-null
    # po_reference warn (P6 checks the raw value null/'' of PRESENT
    # keys; whitespace-only is non-empty by the pinned reference
    # rule); unparseable total nulls; invalid email nulls
    assert r2["invoice_number"] is None and r2["total"] is None
    assert r2["contact_email"] is None
    assert r2["schema_warnings"] == [
        "Required field 'invoice_number' is empty",
        "Required field 'po_reference' is empty",
    ]
    # row 3: po_reference key entirely ABSENT → trusted, no warning
    # (validation.py:441-445 — the missing-vs-explicit-null split)
    assert r3["invoice_number"] == "INV-8" and r3["total"] == 1.0
    assert r3["schema_warnings"] == []
    # shared fields identical across versions
    v1r = {r["id"]: r.asDict() for r in v1.collect()}
    for row in (r1, r2, r3):
        for k in ("invoice_number", "total", "issued_on", "paid"):
            assert v1r[row["id"]][k] == row[k]

    plan = v2._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
