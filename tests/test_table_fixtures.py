"""Array-FieldType golden classes (FIXTURES.md §3; reference corpora
``app/test-pdfs/SEC 8-K`` and ``app/test-pdfs/School attendance``):
structured table-row extraction pinned against HAND-WRITTEN expected
values — deliberately NOT derived from the kernel, so a kernel bug
cannot hide behind the shared-kernel oracle (the round-1 blind spot).

The two classes exercise what the reference's ``array`` fields carry:
- SEC 8-K: text-heavy rows (``securities_registered`` — 3 string
  columns, ``extraction_results.json``), plus a second table per doc.
- School attendance: numeric-string stats rows with MISSING cells
  (2023 rows carry no change_in_* values — reference rows hold null
  there; our map rows omit the key, the map-type adaptation of
  ``validation.py:456-464`` + the List-Stutter filter at 138-154).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SEC_8K_HTML = b"""<!DOCTYPE html><html><head><title>Form 8-K</title></head><body>
<main><article><h1>Microsoft Corporation Form 8-K</h1>
<p>Current report pursuant to Section 13 or 15(d) of the Securities
Exchange Act of 1934, filed by the registrant.</p>
<table>
<tr><th>Title of Each Class</th><th>Trading Symbol</th>
<th>Name of Each Exchange on Which Registered</th></tr>
<tr><td>Common stock, $0.00000625 par value per share</td><td>MSFT</td><td>NASDAQ</td></tr>
<tr><td>3.125% Notes due 2028</td><td>MSFT</td><td>NASDAQ</td></tr>
<tr><td>2.625% Notes due 2033</td><td>MSFT</td><td>NASDAQ</td></tr>
</table>
<p>At the annual shareholders meeting the following directors were
elected by the margins indicated below.</p>
<table>
<tr><th>Director</th><th>Votes For</th><th>Votes Against</th></tr>
<tr><td>Reid Hoffman</td><td>5,182,313,329</td><td>270,968,770</td></tr>
<tr><td>Hugh Johnston</td><td>5,416,256,919</td><td>44,622,754</td></tr>
</table>
</article></main></body></html>"""

SEC_8K_EXPECTED = [
    [
        {
            "title_of_each_class": "Common stock, $0.00000625 par value per share",
            "trading_symbol": "MSFT",
            "name_of_each_exchange_on_which_registered": "NASDAQ",
        },
        {
            "title_of_each_class": "3.125% Notes due 2028",
            "trading_symbol": "MSFT",
            "name_of_each_exchange_on_which_registered": "NASDAQ",
        },
        {
            "title_of_each_class": "2.625% Notes due 2033",
            "trading_symbol": "MSFT",
            "name_of_each_exchange_on_which_registered": "NASDAQ",
        },
    ],
    [
        {
            "director": "Reid Hoffman",
            "votes_for": "5,182,313,329",
            "votes_against": "270,968,770",
        },
        {
            "director": "Hugh Johnston",
            "votes_for": "5,416,256,919",
            "votes_against": "44,622,754",
        },
    ],
]

ATTENDANCE_HTML = b"""<html><body><main><article>
<h1>Student attendance 2024 Semester 1</h1>
<p>The attendance rate is the percentage of days students attended
school, compared to student enrolled days in the reporting period.</p>
<table>
<tr><th>Education Level</th><th>Year</th><th>Attendance Rate</th>
<th>Change in Attendance Rate</th></tr>
<tr><td>K-2</td><td>2023</td><td>90.8</td><td></td></tr>
<tr><td>K-2</td><td>2024</td><td>90.5</td><td>-0.3</td></tr>
<tr><td>3-6</td><td>2023</td><td>90.3</td><td></td></tr>
<tr><td>3-6</td><td>2024</td><td>89.7</td><td>-0.6</td></tr>
</table>
</article></main></body></html>"""

ATTENDANCE_EXPECTED = [
    [
        # 2023 rows: empty change cell -> key omitted (null-clean);
        # cell VALUES keep their raw text (only header keys normalize)
        {"education_level": "K-2", "year": "2023", "attendance_rate": "90.8"},
        {
            "education_level": "K-2",
            "year": "2024",
            "attendance_rate": "90.5",
            "change_in_attendance_rate": "-0.3",
        },
        {"education_level": "3-6", "year": "2023", "attendance_rate": "90.3"},
        {
            "education_level": "3-6",
            "year": "2024",
            "attendance_rate": "89.7",
            "change_in_attendance_rate": "-0.6",
        },
    ]
]


def test_sec8k_table_rows_kernel():
    from ai_pdf_extraction_spark.kernels import extract_document

    res = extract_document(SEC_8K_HTML)
    assert res.parse_ok
    assert res.tables == SEC_8K_EXPECTED
    assert res.n_tables == 2
    assert res.n_pages == 1


def test_attendance_table_rows_kernel():
    from ai_pdf_extraction_spark.kernels import extract_document

    res = extract_document(ATTENDANCE_HTML)
    assert res.parse_ok
    assert res.tables == ATTENDANCE_EXPECTED


def test_table_rows_end_to_end_spark(spark, tmp_path):
    """Same two documents through the REAL pipeline plan (pandas-UDF
    kernel + output projection): the nested column round-trips Arrow
    and parquet and equals the pinned literals."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_pdf_extraction_spark.plans.pipeline import extraction_plan

    src = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array(
                    ["https://sec.example.com/8k", "https://edu.example.com/att"]
                ),
                "warc_ts": pa.array([0, 0], pa.timestamp("us", tz="UTC")),
                "html": pa.array([SEC_8K_HTML, ATTENDANCE_HTML], pa.binary()),
                "text": pa.array([None, None], pa.string()),
                "lang": pa.array(["en", "en"]),
            }
        ),
        src,
    )
    out = (
        extraction_plan(spark.read.parquet(src), run_id="t")
        .select("url", "tables", "n_pages", F.size("tables").alias("n_tables"))
        .collect()
    )
    by_url = {r["url"]: r for r in out}
    sec = by_url["https://sec.example.com/8k"]
    att = by_url["https://edu.example.com/att"]
    assert [[dict(m) for m in t] for t in sec["tables"]] == SEC_8K_EXPECTED
    assert [[dict(m) for m in t] for t in att["tables"]] == ATTENDANCE_EXPECTED
    assert sec["n_pages"] == 1 and sec["n_tables"] == 2


def test_clean_null_deep_matches_reference_semantics(spark):
    """Spark clean_null_from_arrays_deep == the reference's recursive
    _clean_null_from_arrays (validation.py:138-154) == the kernel-side
    Python twin, on a nested arrays-in-arrays shape with nulls at both
    levels."""
    from ai_pdf_extraction_spark.functions.normalize import (
        clean_null_from_arrays_deep,
    )
    from ai_pdf_extraction_spark.kernels.types import clean_null_nested

    data = [([[1, None, 2], None, [None], [3]],)]
    py = clean_null_nested(data[0][0])
    assert py == [[1, 2], [], [3]]

    df = spark.createDataFrame(data, "v array<array<int>>")
    got = df.select(
        clean_null_from_arrays_deep("v", df.schema["v"].dataType).alias("v")
    ).collect()[0]["v"]
    assert got == py
