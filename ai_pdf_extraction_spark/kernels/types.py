"""Result types shared by kernels, oracle, and Spark UDF wrappers.

The shape mirrors the reference's per-document extraction record
``{source_file, extracted_data, confidence, warnings, ...}``
(``app/backend/models.py:159-205``) specialized to the rebuild's fixed
output schema (SURVEY.md §7.2): extracted text + character spans.
"""

from __future__ import annotations

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

    @property
    def n_chars(self) -> int:
        return len(self.text)

    @property
    def n_spans(self) -> int:
        return len(self.spans)
