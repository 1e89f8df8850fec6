"""Deterministic extraction kernels.

These pure-Python functions fill the semantic slot that the reference
fills with a per-document LLM vision call
(``app/backend/services/ai/extraction.py:207-334``). They are imported
both by pytest (the oracle) and by the pandas-UDF wrappers in
``operators.extract`` — parity is byte-identical by construction
(SURVEY.md §7.1, mirroring the reference's mock-provider pattern at
``app/backend/services/ai/__init__.py:239-363``).
"""

from ai_pdf_extraction_spark.kernels.html_extract import extract_html
from ai_pdf_extraction_spark.kernels.pdf_extract import extract_pdf
from ai_pdf_extraction_spark.kernels.types import ExtractionResult, Span

# Bump when kernel OUTPUT semantics change — cached golden parquet in
# /tmp is keyed on this so stale goldens never shadow a kernel change.
# v2: round-2 robustness fixes (void-element boiler, self-close
#     recovery, implied </head>, link-depth recovery, inline boiler
#     masking, PDF hex-string dicts + operand guards)
# v3: stale inline-boiler entries unwind at block flush; self-close
#     recovery skips '/' inside unquoted attribute values
# v4: container-level inline boiler flushes its implicit block when the
#     boiler stack drains (sibling text survives); a new <a> implies
#     closing an open boiler <a> (HTML5 anchors-never-nest applied to
#     the boiler stack, not just link depth)
# v5: structured table payload (array-of-row-maps per <table> — the
#     reference's `array` FieldType) + n_pages page-count probe
# v6: PDF structured tables — column-aligned multi-run baselines
#     (x within ±3pt of the block's first line) → header + row maps
# v7: colspan-aware HTML table capture (placeholder cells keep later
#     columns under their headers)
# v8: rowspan-aware HTML table capture (spanning cells carry their
#     value down into the spanned rows at the same column)
# v9: <br> inside a table cell is a soft space in the captured cell,
#     matching the text stream
# v10: colspan+rowspan cells carry their full rectangle down (empty
#      placeholders included); duplicate-header suffixing bumps past
#      literal same-named headers instead of colliding
# v11: overflow data-cell keys bump past header names too (a 'col 2'
#      header no longer swallows the overflow cell)
# v12: fifth-review kernel fixes — non-ASCII colspan digits no longer
#      raise out of the parse; ANY non-head element implies </head>
#      (not just <body>); <title> never leaks into text when <head> is
#      omitted; self-closed non-void tags parse as open tags (HTML5
#      §13.1.2 — a <td/> opens a cell); the PDF '"' show-text operator
#      is interpreted (was silently dropping whole lines); <br> honors
#      the inline-boiler mask; tables_signature delimiter-escapes
#      keys/values (distinct payloads can no longer alias)
# v13: self-closed non-void tags are start+IMMEDIATE-end — v12's
#      open-only routing let a childless self-closed boiler container
#      (<nav/>, <div id="comments"/>) push an unpoppable boiler entry
#      that masked the entire rest of the document
# v14: multi-column PDF reading order — x-histogram column split
#      (left column top-to-bottom before the right; full-width lines
#      band-separate); negative baseline gaps (column tops) start a
#      new block. Single-column pages are byte-identical to v13.
KERNEL_VERSION = 14


def extract_document(data: bytes) -> ExtractionResult:
    """Route a raw document to the right kernel by magic bytes.

    Mirrors the reference's content validation: empty-content rejection
    (``routers/batches.py:375-379``) and the ``%PDF`` magic-byte check
    (``services/pdf_service.py:74-87``). Failures become
    ``parse_ok=False`` results, never exceptions — per-row failure
    isolation (``routers/batches.py:177-188``).
    """
    if data is None or len(data) == 0:
        return ExtractionResult(
            text="", spans=[], parse_ok=False, warnings=["empty content"],
            content_type="unknown",
        )
    try:
        # the kernels set content_type on every return path
        if data[:4] == b"%PDF":
            return extract_pdf(data)
        return extract_html(data)
    except Exception as exc:  # pragma: no cover - defensive isolation
        return ExtractionResult(
            text="", spans=[], parse_ok=False,
            warnings=[f"kernel error: {type(exc).__name__}: {exc}"],
            content_type="unknown",
        )
