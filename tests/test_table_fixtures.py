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


def test_colspan_keeps_columns_aligned():
    """A colspan=N cell is followed by N-1 placeholder cells so later
    columns keep their header keys (the SEC voting-table shape)."""
    from ai_pdf_extraction_spark.kernels import extract_document

    html = (
        b"<body><table>"
        b'<tr><th>Name</th><th colspan="2">Votes</th><th>Outcome</th></tr>'
        b"<tr><td>Alice</td><td>10</td><td>2</td><td>won</td></tr>"
        b'<tr><td colspan="2">Bob (uncontested)</td><td>0</td><td>won</td></tr>'
        b"</table></body>"
    )
    assert extract_document(html).tables == [
        [
            {"name": "Alice", "votes": "10", "col_3": "2", "outcome": "won"},
            {"name": "Bob (uncontested)", "col_3": "0", "outcome": "won"},
        ]
    ]


def test_rowspan_carries_value_down():
    """rowspan=N cells repeat their value in the next N-1 rows at the
    same column — the reference School-attendance stub-column shape
    (student_type spanning primary/secondary row groups)."""
    from ai_pdf_extraction_spark.kernels import extract_document

    html = (
        b"<body><table>"
        b"<tr><th>Student Type</th><th>Year</th><th>Rate</th></tr>"
        b'<tr><td rowspan="2">Primary</td><td>2023</td><td>90.8</td></tr>'
        b"<tr><td>2024</td><td>90.5</td></tr>"
        b'<tr><td rowspan="2">Secondary</td><td>2023</td><td>88.1</td></tr>'
        b"<tr><td>2024</td><td>87.9</td></tr>"
        b"</table></body>"
    )
    assert extract_document(html).tables == [
        [
            {"student_type": "Primary", "year": "2023", "rate": "90.8"},
            {"student_type": "Primary", "year": "2024", "rate": "90.5"},
            {"student_type": "Secondary", "year": "2023", "rate": "88.1"},
            {"student_type": "Secondary", "year": "2024", "rate": "87.9"},
        ]
    ]


def test_colspan_rowspan_rectangle_carries_down():
    """A colspan+rowspan cell occupies a rectangle: the next row's
    cells must land under the columns AFTER the rectangle (round-3
    review finding — kernel+oracle share the kernel, so only a pinned
    literal can catch this)."""
    from ai_pdf_extraction_spark.kernels import extract_document

    html = (
        b"<body><table>"
        b"<tr><th>A</th><th>B</th><th>C</th></tr>"
        b'<tr><td colspan="2" rowspan="2">X</td><td>c1</td></tr>'
        b"<tr><td>c2</td></tr>"
        b"</table></body>"
    )
    assert extract_document(html).tables == [
        [{"a": "X", "c": "c1"}, {"a": "X", "c": "c2"}]
    ]


def test_duplicate_header_suffix_never_collides():
    """Headers ['a','a_2','a'] must produce three distinct keys — the
    naive per-base counter collided the third with the literal 'a_2'
    and silently dropped a column."""
    from ai_pdf_extraction_spark.kernels import extract_document

    html = (
        b"<body><table>"
        b"<tr><th>a</th><th>a_2</th><th>a</th></tr>"
        b"<tr><td>v1</td><td>v2</td><td>v3</td></tr>"
        b"</table></body>"
    )
    assert extract_document(html).tables == [
        [{"a": "v1", "a_2": "v2", "a_3": "v3"}]
    ]


def test_overflow_cell_key_never_collides_with_header():
    """A header whose text normalizes to 'col_2' must not be
    overwritten by an overflow data cell's positional col_2 key
    (round-3 second-review finding)."""
    from ai_pdf_extraction_spark.kernels.types import table_records

    assert table_records(["col 2"], [["v1", "v2"]]) == [
        {"col_2": "v1", "col_2_2": "v2"}
    ]
    # and overflow keys stay distinct among themselves
    assert table_records(["a"], [["x", "y", "z"]]) == [
        {"a": "x", "col_2": "y", "col_3": "z"}
    ]


def test_jpeg_probe_markers_and_eof():
    """JPEG scanner: fill bytes, restart markers, and a SOF segment
    whose dimension bytes end exactly at EOF all still yield dims;
    SOS stops the scan instead of misparsing entropy data."""
    import struct

    from ai_pdf_extraction_spark.operators.multimodal import probe_media

    sof = b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 10, 20) + b"\x03"
    # dims end exactly at EOF
    exact = b"\xff\xd8" + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 7, 9)
    m = probe_media(exact)
    assert (m["width"], m["height"]) == (9, 7)
    # fill bytes + RST marker before SOF
    padded = b"\xff\xd8\xff\xff\xff\xd0" + sof + bytes(9)
    m = probe_media(padded)
    assert (m["width"], m["height"]) == (20, 10)
    # SOS before any SOF: scan stops cleanly, dims stay null
    sos_first = b"\xff\xd8\xff\xda\x00\x02" + b"\x12\x34" * 8
    m = probe_media(sos_first)
    assert m["width"] is None and m["format"] == "jpeg"


def _pdf_with_table(rows: list[tuple[str, ...]], col_gaps=(200, 120)) -> bytes:
    """Minimal single-page PDF whose table rows are one Td-moved run
    per cell on a shared baseline."""
    parts = [
        "BT /F1 24 Tf 72 720 Td (Attendance Report) Tj ET",
        "BT /F1 12 Tf 72 680 Td 16 TL (This is the intro paragraph line one.)"
        " Tj T* (And intro line two of the text.) Tj ET",
    ]
    y = 600
    for r in rows:
        seg = f"BT /F1 10 Tf 72 {y} Td ({r[0]}) Tj"
        for gap, cell in zip(col_gaps, r[1:]):
            seg += f" {gap} 0 Td ({cell}) Tj"
        parts.append(seg + " ET")
        y -= 14
    stream = "\n".join(parts).encode("latin-1")
    return (
        b"%PDF-1.4\n1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
        b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
        b"3 0 obj<</Type/Page/Parent 2 0 R/Contents 4 0 R>>endobj\n"
        b"4 0 obj<</Length " + str(len(stream)).encode() + b">>stream\n"
        + stream + b"\nendstream endobj\ntrailer<</Root 1 0 R>>\n%%EOF"
    )


def test_pdf_table_rows_kernel():
    """School-attendance-style stats table from PDF layout: aligned
    column runs become header+row maps; pinned literals, and the
    text/span stream still carries the cells in reading order."""
    from ai_pdf_extraction_spark.kernels import extract_document

    pdf = _pdf_with_table(
        [
            ("Education Level", "Year", "Attendance Rate"),
            ("K-2", "2023", "90.8"),
            ("K-2", "2024", "90.5"),
            ("3-6", "2024", "89.7"),
        ]
    )
    res = extract_document(pdf)
    assert res.parse_ok and res.content_type == "pdf"
    assert res.tables == [
        [
            {"education_level": "K-2", "year": "2023", "attendance_rate": "90.8"},
            {"education_level": "K-2", "year": "2024", "attendance_rate": "90.5"},
            {"education_level": "3-6", "year": "2024", "attendance_rate": "89.7"},
        ]
    ]
    assert "Education Level Year Attendance Rate" in res.text
    assert res.n_pages == 1


def test_pdf_misaligned_columns_are_not_a_table():
    """Two multi-run lines whose columns do NOT align (second line's
    cells sit 40pt off) must not fuse into a table block."""
    from ai_pdf_extraction_spark.kernels import extract_document

    pdf = _pdf_with_table(
        [("Left Col", "Right Col")], col_gaps=(200,)
    )  # single multi-run line: below the 2-line minimum
    res = extract_document(pdf)
    assert res.tables == []


def _pdf_from_rows(rows_xy: list[list[tuple[float, str]]]) -> bytes:
    """Page whose line i carries runs at the given absolute x positions
    (one BT per run — exercises cross-BT baseline clustering too)."""
    parts = []
    y = 700
    for parts_xy in rows_xy:
        for x, text in parts_xy:
            parts.append(f"BT /F1 10 Tf {x} {y} Td ({text}) Tj ET")
        y -= 14
    stream = "\n".join(parts).encode("latin-1")
    return (
        b"%PDF-1.4\n1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
        b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
        b"3 0 obj<</Type/Page/Parent 2 0 R/Contents 4 0 R>>endobj\n"
        b"4 0 obj<</Length " + str(len(stream)).encode() + b">>stream\n"
        + stream + b"\nendstream endobj\ntrailer<</Root 1 0 R>>\n%%EOF"
    )


def test_pdf_table_alignment_tolerance():
    from ai_pdf_extraction_spark.kernels import extract_document

    # jitter within the ±3pt tolerance: still one table
    within = _pdf_from_rows(
        [
            [(72, "H1"), (250, "H2")],
            [(74.5, "a"), (248.0, "b")],
            [(70.2, "c"), (252.9, "d")],
        ]
    )
    got = extract_document(within).tables
    assert got == [[{"h1": "a", "h2": "b"}, {"h1": "c", "h2": "d"}]]

    # second line drifts 40pt: columns don't align, no table forms
    drifted = _pdf_from_rows(
        [
            [(72, "H1"), (250, "H2")],
            [(112, "a"), (290, "b")],
        ]
    )
    assert extract_document(drifted).tables == []

    # adjacent blocks with different column counts split cleanly
    two = _pdf_from_rows(
        [
            [(72, "A"), (250, "B")],
            [(72, "a1"), (250, "b1")],
            [(72, "X"), (200, "Y"), (330, "Z")],
            [(72, "x1"), (200, "y1"), (330, "z1")],
        ]
    )
    assert extract_document(two).tables == [
        [{"a": "a1", "b": "b1"}],
        [{"x": "x1", "y": "y1", "z": "z1"}],
    ]


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
