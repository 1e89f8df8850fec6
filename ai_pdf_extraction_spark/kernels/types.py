"""Result types shared by kernels, oracle, and Spark UDF wrappers.

The shape mirrors the reference's per-document extraction record
``{source_file, extracted_data, confidence, warnings, ...}``
(``app/backend/models.py:159-205``) specialized to the rebuild's fixed
output schema (SURVEY.md §7.2): extracted text + character spans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Span:
    """A character span into ``extracted_text``.

    ``kind`` is one of ``title | paragraph | list_item | table_text``
    (FIXTURES.md §2).
    """

    start: int
    end: int
    kind: str

    def as_tuple(self) -> tuple[int, int, str]:
        return (self.start, self.end, self.kind)


@dataclass
class ExtractionResult:
    text: str
    spans: list[Span]
    parse_ok: bool
    warnings: list[str] = field(default_factory=list)
    content_type: str = "unknown"
    # Deterministic extraction confidence in [0,1], round 3 (the
    # reference's per-record confidence slot, ``models.py:186-199``,
    # minus the LLM logprobs): for HTML the kept-to-candidate text
    # ratio, for PDF the parsed-stream ratio.
    confidence: float = 0.0
    # Per-field confidences (the reference's ``field_confidences``
    # dict, ``models.py:186-199``, merged across chunks at
    # ``services/ai/extraction.py:351-372``). Our fields are the span
    # kinds; values are per-kind evidence ratios in [0,1], round 3:
    # HTML = kept/candidate chars of that kind, PDF = the stream-parse
    # ratio for each kind present.
    field_confidences: dict[str, float] = field(default_factory=dict)
    # Structured table payload — the deterministic analogue of the
    # reference's ``array`` FieldType (array-of-objects rows, e.g. the
    # SEC 8-K ``securities_registered`` field,
    # ``app/test-pdfs/SEC 8-K/extraction_results.json``; validated at
    # ``services/ai/validation.py:467-488``). One entry per accepted
    # <table>: a list of rows, each row a {normalized_header: cell}
    # dict with empty cells removed (the "List Stutter" null filter,
    # ``validation.py:138-154``, applied recursively).
    tables: list[list[dict[str, str]]] = field(default_factory=list)
    # Page-count probe (reference S3, ``services/pdf_service.py:148-179``):
    # content-stream pages for PDFs, 1 for a parsed HTML page, 0 on
    # parse failure.
    n_pages: int = 0

    @property
    def n_chars(self) -> int:
        return len(self.text)

    @property
    def n_spans(self) -> int:
        return len(self.spans)

    @property
    def n_tables(self) -> int:
        return len(self.tables)


_KEY_STRIP_RE = re.compile(r"[^a-z0-9_]")
_KEY_SEP_RE = re.compile(r"[-\s]+")
_KEY_SQUEEZE_RE = re.compile(r"_+")


def norm_field_key(header: str) -> str:
    """Header text → snake_case field name (the reference's field-name
    rule ``models.py:63-71`` — lowercase, ``-``→``_`` — extended to
    free-text headers: whitespace also becomes ``_``, any other
    non-alnum is stripped, runs of ``_`` collapse)."""
    key = _KEY_SEP_RE.sub("_", header.strip().lower())
    key = _KEY_STRIP_RE.sub("", key)
    return _KEY_SQUEEZE_RE.sub("_", key).strip("_")


def table_records(
    header_cells: list[str] | None, data_rows: list[list[str]]
) -> list[dict[str, str]]:
    """Raw table cells → the reference's array-of-objects rows, shared
    by the HTML and PDF kernels (one copy — kernel parity is by
    construction). Header cells normalize via ``norm_field_key``
    (empty → positional ``col_N``, duplicates suffix ``_2``…); data
    cells beyond the header get ``col_N``; empty cells become None →
    omitted keys (the map-type adaptation of ``validation.py:456-464``)
    and all-empty rows become None → removed by the recursive
    List-Stutter filter (``validation.py:138-154``)."""
    headers: list[str] = []
    used: set[str] = set()
    for i, h in enumerate(header_cells or []):
        key = norm_field_key(h) or f"col_{i + 1}"
        # suffix duplicates, bumping past literal headers of the same
        # name ('a', 'a_2', 'a' must NOT collide on a_2)
        name, n = key, 1
        while name in used:
            n += 1
            name = f"{key}_{n}"
        used.add(name)
        headers.append(name)
    header_set = set(headers)
    out_rows: list[dict[str, str] | None] = []
    for cells in data_rows:
        row: dict[str, str] = {}
        used_row: set[str] = set()
        for i, c in enumerate(cells):
            if i < len(headers):
                name = headers[i]  # headers are already unique
            else:
                # overflow cells: positional keys, bumped past BOTH the
                # header names (a header literally called 'col_2' must
                # not be overwritten) and earlier overflow keys
                base = f"col_{i + 1}"
                name, n = base, 1
                while name in header_set or name in used_row:
                    n += 1
                    name = f"{base}_{n}"
            used_row.add(name)
            if c:
                row[name] = c
        out_rows.append(row or None)
    return clean_null_nested(out_rows)


def clean_null_nested(data):
    """Recursively remove None items from lists anywhere in a nested
    dict/list structure — byte-for-byte the reference's "List Stutter"
    fix (``services/ai/validation.py:138-154``), shared by the kernels
    and the pytest oracle."""
    if isinstance(data, dict):
        return {k: clean_null_nested(v) for k, v in data.items()}
    if isinstance(data, list):
        return [clean_null_nested(item) for item in data if item is not None]
    return data


# tables_signature delimiter escaping (percent-style, % first so the
# escape char itself round-trips) — unescaped delimiters let DISTINCT
# payloads serialize identically ({'a':'1','b':'2'} vs {'a':'1,b=2'}),
# masking real golden-vs-Spark differences. Keep in lockstep with the
# Column twin (__spark_entry__._signature_cols) — order matters.
SIG_ESCAPES: tuple[tuple[str, str], ...] = (
    ("%", "%25"),
    ("=", "%3D"),
    (",", "%2C"),
    (";", "%3B"),
    ("|", "%7C"),
)


def sig_escape(s: str) -> str:
    for ch, rep in SIG_ESCAPES:
        s = s.replace(ch, rep)
    return s


def assemble_spans(blocks: list[tuple[str, str]]) -> tuple[str, list["Span"]]:
    """Blank-line-joined text + spans from (kind, text) blocks — the
    ONE copy of the span-geometry rule (``\\n\\n`` separator, [start,
    end) offsets over the joined text), shared by both kernels so a
    separator/offset change can never desynchronize their geometry."""
    pieces: list[str] = []
    spans: list[Span] = []
    offset = 0
    for kind, text in blocks:
        if pieces:
            offset += 2  # "\n\n" separator
        spans.append(Span(offset, offset + len(text), kind))
        pieces.append(text)
        offset += len(text)
    return "\n\n".join(pieces), spans


def tables_signature(tables: list[list[dict[str, str]]]) -> str:
    """Canonical serialization of the structured table payload, for
    golden-vs-Spark value hashing: entries ``key=value`` sorted by key
    and joined with ``,``; rows joined with ``;``; tables joined with
    ``|``; keys/values delimiter-escaped (:data:`SIG_ESCAPES`). The
    Spark twin builds the identical string from the nested column with
    transform/map_entries (``__spark_entry__._signature_cols``)."""
    return "|".join(
        ";".join(
            ",".join(
                f"{sig_escape(k)}={sig_escape(v)}" for k, v in sorted(row.items())
            )
            for row in table
        )
        for table in tables
    )
