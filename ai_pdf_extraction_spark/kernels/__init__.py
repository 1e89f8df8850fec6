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
        if data[:4] == b"%PDF":
            res = extract_pdf(data)
            res.content_type = "pdf"
        else:
            res = extract_html(data)
            res.content_type = "html"
        return res
    except Exception as exc:  # pragma: no cover - defensive isolation
        return ExtractionResult(
            text="", spans=[], parse_ok=False,
            warnings=[f"kernel error: {type(exc).__name__}: {exc}"],
            content_type="unknown",
        )
