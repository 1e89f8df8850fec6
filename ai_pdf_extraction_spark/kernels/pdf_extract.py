"""PDF text extraction: pdfminer-style layout analysis.

Replaces the reference's rasterize-then-vision pipeline
(``app/backend/services/pdf_service.py:97-104`` +
``services/ai/extraction.py:241-254``) with deterministic parsing of
PDF content streams:

1. tokenize uncompressed content streams and interpret the text
   operators (``BT/ET Tf Td TD TL Tm T* Tj TJ '``), accumulating
   positioned text runs ``(page, y, x, font_size, text)``;
2. cluster runs into lines by baseline ``y`` (pdfminer's LTTextLine
   analogue), sort in reading order ``(page, -y, x)``;
3. detect multi-column pages from the line x-start histogram
   (``_column_order``): when the starts split into two clusters across
   a ≥``_COLUMN_GAP_MIN`` gap with overlapping y-ranges, read the left
   column top-to-bottom before the right one, with full-width lines
   (estimated to span past the gap — titles, footers) acting as
   vertical band separators read in place;
4. group lines into blocks by vertical gap relative to the line's font
   size (LTTextBox analogue), classify ``title`` vs ``paragraph`` by
   font size.

Scope (SURVEY.md §7.4 + r5 verdict #5): single- and two-column text
PDFs with uncompressed or Flate content streams — invoices and SEC
8-K filings (the reference's own golden classes,
``app/test-pdfs/Invoices/``, ``SEC 8-K/``) are routinely two-column,
so naive ``(-y, x)`` interleaving would zipper the columns line by
line. Parity with the oracle, not pdfminer-completeness, is the bar.
"""

from __future__ import annotations

import re

from ai_pdf_extraction_spark.kernels.types import (
    ExtractionResult,
    Span,
    assemble_spans,
    table_records,
)

# The dict group tolerates hex strings (<DEADBEEF>) and one level of
# nested <<...>> (each side allowing hex strings) — a lone <...> inside
# the dict previously broke the match entirely, leaving /FlateDecode
# undetected and the compressed body tokenized raw.
_STREAM_RE = re.compile(
    rb"(?:<<(?P<dict>(?:[^<>]|<<(?:[^<>]|<[^<>]*>)*>>|<[^<>]*>)*)>>\s*)?"
    rb"stream\r?\n(?P<body>.*?)(?:\r?\n)?endstream",
    re.DOTALL,
)

# Vertical gap (in multiples of font size) that splits two lines into
# separate blocks; pdfminer's LAParams.line_margin analogue.
_BLOCK_GAP_FACTOR = 1.6
# Font size at or above which a block is classified as a title.
_TITLE_FONT_SIZE = 18.0
# Baseline-y tolerance for clustering runs into one line.
_LINE_Y_TOL = 2.0
# Minimum gap between line x-start clusters that reads as a column
# boundary (1 inch — US-letter two-column layouts gutter at ≥0.5in and
# the START positions of the two columns differ by a column width,
# ~3in; table cell runs don't participate because a line's x is its
# FIRST run's x, which stays at the left margin).
_COLUMN_GAP_MIN = 72.0

_ESCAPES = {
    b"n": "\n",
    b"r": "\r",
    b"t": "\t",
    b"b": "\b",
    b"f": "\f",
    b"(": "(",
    b")": ")",
    b"\\": "\\",
}


def _parse_pdf_string(buf: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at ``buf[i] == '('``.

    Returns (decoded text, index after the closing paren). Handles
    nested parens and backslash escapes per PDF 32000-1 §7.3.4.2.
    """
    assert buf[i : i + 1] == b"("
    # fast path: no escapes, no nested parens before the closer
    end = buf.find(b")", i + 1)
    if end != -1:
        seg = buf[i + 1 : end]
        if b"\\" not in seg and b"(" not in seg:
            return seg.decode("latin-1"), end + 1
    i += 1
    depth = 1
    out = bytearray()
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            nxt = buf[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.extend(_ESCAPES[nxt].encode("latin-1"))
                i += 2
            elif nxt and nxt in b"01234567":  # octal escape \ddd (0-7 only)
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and buf[j] in b"01234567":
                    digits += buf[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
            elif nxt in (b"\r", b"\n"):
                # line continuation: drop backslash + EOL (\r\n as one)
                i += 3 if nxt == b"\r" and buf[i + 2 : i + 3] == b"\n" else 2
            elif nxt:
                # unknown escape (incl. \8, \9): per PDF 32000-1
                # §7.3.4.2 drop the backslash, keep the character
                i += 1
            else:
                i += 2  # trailing backslash at EOF: exit loop
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return out.decode("latin-1"), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated PDF string")


_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


_WS_BYTES = frozenset(b" \t\r\n\x00")


def _tokenize(buf: bytes):
    """Yield tokens from a content stream: floats, names, strings,
    array markers, and operators. Integer byte dispatch — this loop is
    the PDF kernel's hot path."""
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if c in _WS_BYTES:
            i += 1
        elif c == 0x28:  # (
            s, i = _parse_pdf_string(buf, i)
            yield ("str", s)
        elif c == 0x5B:  # [
            yield ("arr_open", None)
            i += 1
        elif c == 0x5D:  # ]
            yield ("arr_close", None)
            i += 1
        elif c == 0x2F:  # /
            m = _OP_RE.match(buf, i + 1)
            name = m.group().decode("latin-1") if m else ""
            yield ("name", name)
            i = (m.end() if m else i + 1)
        elif c == 0x3C:  # < — hex string, or << dict (skip to >>)
            if buf[i + 1 : i + 2] == b"<":
                j = buf.find(b">>", i + 2)
                i = j + 2 if j >= 0 else n
            else:
                j = buf.find(b">", i)
                if j < 0:
                    i = n
                else:
                    hexbody = bytes(
                        ch for ch in buf[i + 1 : j] if ch not in _WS_BYTES
                    )
                    if len(hexbody) % 2:  # odd digit count: implicit 0
                        hexbody += b"0"
                    try:
                        yield ("str", bytes.fromhex(hexbody.decode("ascii")).decode("latin-1"))
                    except ValueError:
                        pass  # not valid hex: drop
                    i = j + 1
        else:
            m = _NUM_RE.match(buf, i)
            if m:
                yield ("num", float(m.group()))
                i = m.end()
                continue
            m = _OP_RE.match(buf, i)
            if m:
                yield ("op", m.group().decode("latin-1"))
                i = m.end()
            else:
                i += 1  # unknown byte: skip


class _TextState:
    __slots__ = ("x", "y", "lx", "ly", "leading", "size")

    def __init__(self) -> None:
        self.x = 0.0  # current position
        self.y = 0.0
        self.lx = 0.0  # line start (Td is relative to this)
        self.ly = 0.0
        self.leading = 0.0
        self.size = 12.0


def _runs_from_stream(buf: bytes) -> list[tuple[float, float, float, str]]:
    """Interpret text operators; return runs of (y, x, size, text)."""
    runs: list[tuple[float, float, float, str]] = []
    st = _TextState()
    stack: list = []
    in_array = False
    array_items: list = []
    for kind, val in _tokenize(buf):
        if kind == "arr_open":
            in_array = True
            array_items = []
        elif kind == "arr_close":
            in_array = False
            stack.append(("arr", array_items))
        elif kind in ("num", "str", "name"):
            if in_array:
                array_items.append((kind, val))
            else:
                stack.append((kind, val))
        elif kind == "op":
            op = val
            # every float() is guarded on the operand KIND: one
            # malformed operand skips that operator instead of raising
            # and discarding the whole page's text (the per-stream
            # except would otherwise eat everything)
            if op == "Tf" and len(stack) >= 2 and stack[-1][0] == "num":
                st.size = float(stack[-1][1])
            elif (
                op in ("Td", "TD")
                and len(stack) >= 2
                and stack[-2][0] == "num"
                and stack[-1][0] == "num"
            ):
                tx, ty = float(stack[-2][1]), float(stack[-1][1])
                if op == "TD":
                    st.leading = -ty
                st.lx += tx
                st.ly += ty
                st.x, st.y = st.lx, st.ly
            elif (
                op == "Tm"
                and len(stack) >= 6
                and stack[-2][0] == "num"
                and stack[-1][0] == "num"
            ):
                st.lx, st.ly = float(stack[-2][1]), float(stack[-1][1])
                st.x, st.y = st.lx, st.ly
            elif op == "TL" and stack and stack[-1][0] == "num":
                st.leading = float(stack[-1][1])
            elif op == "T*":
                st.ly -= st.leading if st.leading else st.size * 1.2
                st.x, st.y = st.lx, st.ly
            elif op == "Tj" and stack and stack[-1][0] == "str":
                text = stack[-1][1]
                if text:
                    runs.append((st.y, st.x, st.size, text))
                    st.x += 0.5 * st.size * len(text)
            elif op in ("'", '"') and stack and stack[-1][0] == "str":
                # ' = T* + show; " = aw ac string " — same line-advance
                # + show (the two numeric spacing operands tune
                # word/char spacing, which this layout model ignores).
                # Dropping " lost whole lines with parse_ok=True.
                st.ly -= st.leading if st.leading else st.size * 1.2
                st.x, st.y = st.lx, st.ly
                text = stack[-1][1]
                if text:
                    runs.append((st.y, st.x, st.size, text))
                    st.x += 0.5 * st.size * len(text)
            elif op == "TJ" and stack and stack[-1][0] == "arr":
                # numbers in a TJ array are kerning adjustments in
                # thousandths of text space; a large negative value is
                # an inter-word gap (pdfminer's word_margin analogue)
                pieces: list[str] = []
                for k, v in stack[-1][1]:
                    if k == "str":
                        pieces.append(v)
                    elif k == "num" and v < -180:
                        pieces.append(" ")
                text = "".join(pieces)
                if text:
                    runs.append((st.y, st.x, st.size, text))
                    st.x += 0.5 * st.size * len(text)
            elif op == "BT":
                st = _TextState()
            stack = []
    return runs


def _column_order(page_lines: list) -> list:
    """Reading order for one page's lines (already ``(-y, x)``-sorted):
    x-histogram column split (r5 verdict #5).

    The line x-starts are clustered by their single largest gap; a gap
    ≥ ``_COLUMN_GAP_MIN`` with ≥2 genuinely-columnar lines on each side
    AND overlapping y-ranges reads as a column boundary. Lines that
    START left of the boundary but whose estimated extent (the same
    ``0.5·size·len`` advance model the interpreter uses) reaches well
    past it are FULL-WIDTH (titles, footers): they separate vertical
    bands and read in place; within each band the left side reads
    top-to-bottom before the right, and each side RECURSES, so a
    3+-column layout resolves column by column (the first split peels
    one column off; the multi-column side re-splits on its own largest
    gap).

    Deliberately conservative: any failed precondition returns the
    input order unchanged, so single-column pages — including
    column-aligned TABLE blocks, whose lines all start at the left
    margin — are byte-identical to kernel v13. The y-overlap guard
    keeps an indented block *below* the body (a signature line, a
    right-aligned footer) from masquerading as a second column.

    Scope note: this operates on LINES, after baseline clustering —
    the zipper failure it fixes is interleaved independent baselines
    (the real two-column shape; columns don't share leading for long).
    Two columns whose baselines align EXACTLY (within ``_LINE_Y_TOL``)
    merge into single lines upstream and read row-major — that
    degenerate layout is indistinguishable from a 2-column table row
    block, which the table capture handles as such.
    """
    if len(page_lines) < 4:
        return page_lines
    starts = sorted(ln[2] for ln in page_lines)
    best_gap, best_i = 0.0, -1
    for i in range(len(starts) - 1):
        g = starts[i + 1] - starts[i]
        if g > best_gap:
            best_gap, best_i = g, i
    if best_gap < _COLUMN_GAP_MIN:
        return page_lines
    boundary = (starts[best_i] + starts[best_i + 1]) / 2.0
    span_limit = boundary + 0.25 * best_gap

    def _end_x(ln) -> float:
        size = ln[3]
        return max(px + 0.5 * size * len(t) for px, t in ln[5])

    left = [ln for ln in page_lines if ln[2] < boundary]
    right = [ln for ln in page_lines if ln[2] >= boundary]
    spanning = {id(ln) for ln in left if _end_x(ln) > span_limit}
    col_left = [ln for ln in left if id(ln) not in spanning]
    if len(col_left) < 2 or len(right) < 2:
        return page_lines
    l_top = min(ln[1] for ln in col_left)
    l_bot = max(ln[1] for ln in col_left)
    r_top = min(ln[1] for ln in right)
    r_bot = max(ln[1] for ln in right)
    if l_bot < r_top or r_bot < l_top:  # disjoint y-ranges (-y space)
        return page_lines
    out: list = []
    band_l: list = []
    band_r: list = []

    def _flush_band() -> None:
        # each side recurses: a 3+-column layout's first split separates
        # one column from the rest, and the multi-column side re-splits
        # on ITS largest start gap (same preconditions; recursion stops
        # when any fails, so 2-column pages recurse exactly once into
        # trivially-unsplittable halves)
        out.extend(_column_order(band_l))
        out.extend(_column_order(band_r))
        band_l.clear()
        band_r.clear()

    for ln in page_lines:
        if id(ln) in spanning:
            _flush_band()
            out.append(ln)
        elif ln[2] < boundary:
            band_l.append(ln)
        else:
            band_r.append(ln)
    _flush_band()
    return out


def extract_pdf(data: bytes) -> ExtractionResult:
    """Extract reading-ordered text + spans from raw PDF bytes."""
    warnings: list[str] = []
    if b"%%EOF" not in data:
        warnings.append("pdf: missing %%EOF (truncated?)")
    streams: list[bytes] = []
    n_total_streams = 0
    for m in _STREAM_RE.finditer(data):
        n_total_streams += 1
        body = m.group("body")
        if m.group("dict") and b"/FlateDecode" in m.group("dict"):
            import zlib

            try:
                body = zlib.decompress(body)
            except zlib.error:
                warnings.append("pdf: FlateDecode stream failed to inflate")
                continue
        streams.append(body)
    if not streams:
        return ExtractionResult(
            text="",
            spans=[],
            parse_ok=False,
            warnings=warnings + ["pdf: no content streams found"],
            content_type="pdf",
        )

    # One content stream per page in our corpus; page order = file order.
    # page, -y, x, size, text, x-sorted (x, run) parts
    lines: list[tuple[int, float, float, float, str, list]] = []
    n_parsed_streams = 0
    for page, stream in enumerate(streams):
        try:
            runs = _runs_from_stream(stream)
            n_parsed_streams += 1
        except Exception as exc:
            warnings.append(f"pdf: stream {page} parse error: {type(exc).__name__}")
            continue
        # Cluster runs into lines by baseline y.
        runs.sort(key=lambda r: (-r[0], r[1]))
        cur_y: float | None = None
        cur_parts: list[tuple[float, str]] = []
        cur_size = 12.0

        def flush_line() -> None:
            if cur_parts and cur_y is not None:
                ordered = sorted(cur_parts, key=lambda p: p[0])
                text = " ".join(t for _, t in ordered).strip()
                if text:
                    lines.append(
                        (page, -cur_y, cur_parts[0][0], cur_size, text, ordered)
                    )

        for y, x, size, text in runs:
            if cur_y is None or abs(y - cur_y) > _LINE_Y_TOL:
                flush_line()
                cur_y, cur_parts, cur_size = y, [(x, text)], size
            else:
                cur_parts.append((x, text))
                cur_size = max(cur_size, size)
        flush_line()

    if not lines:
        return ExtractionResult(
            text="",
            spans=[],
            parse_ok=False,
            warnings=warnings + ["pdf: no text extracted"],
            content_type="pdf",
        )

    # Reading order: (page, top-to-bottom, left-to-right), then a
    # per-page column pass — a two-column page must read left column
    # top-to-bottom BEFORE the right column, not zipper the baselines.
    lines.sort(key=lambda ln: (ln[0], ln[1], ln[2]))
    reordered: list[tuple[int, float, float, float, str, list]] = []
    _page_buf: list = []
    _page_no = -1
    for ln in lines:
        if ln[0] != _page_no:
            reordered.extend(_column_order(_page_buf))
            _page_buf, _page_no = [], ln[0]
        _page_buf.append(ln)
    reordered.extend(_column_order(_page_buf))
    lines = reordered

    # Structured table capture (the deterministic analogue of the
    # reference's LLM reading PDF layout tables — `array` FieldType,
    # ``validation.py:467-488``): a table block is ≥2 consecutive
    # multi-run lines (≥2 x-separated text runs on one baseline — one
    # run per cell) whose column x-positions align within ±3pt of the
    # block's first line. The first aligned line is the header row;
    # row-map construction is the shared ``types.table_records``. The
    # text/span stream is UNTOUCHED — cells still read left-to-right
    # inside their line.
    tables: list[list[dict[str, str]]] = []
    _blk_rows: list[list[str]] = []
    _blk_xs: list[float] = []
    _blk_page = -1

    def _flush_table_block() -> None:
        nonlocal _blk_rows, _blk_xs
        if len(_blk_rows) >= 2:
            cleaned = table_records(_blk_rows[0], _blk_rows[1:])
            if cleaned:
                tables.append(cleaned)
        _blk_rows, _blk_xs = [], []

    for page, _neg_y, _x, _size, _text, parts in lines:
        xs = [px for px, _ in parts]
        cells = [t for _, t in parts]
        is_row = len(parts) >= 2
        aligned = (
            is_row
            and _blk_rows
            and page == _blk_page
            and len(xs) == len(_blk_xs)
            and all(abs(a - b) <= 3.0 for a, b in zip(xs, _blk_xs))
        )
        if aligned:
            _blk_rows.append(cells)
        else:
            _flush_table_block()
            if is_row:
                _blk_rows, _blk_xs, _blk_page = [cells], xs, page
    _flush_table_block()

    # Group lines into blocks by vertical gap.
    blocks: list[tuple[str, str]] = []  # (kind, text)
    cur_lines: list[str] = []
    cur_kind = "paragraph"
    prev: tuple[int, float, float] | None = None  # page, -y, size
    for page, neg_y, _x, size, text, _parts in lines:
        new_block = False
        if prev is None:
            new_block = True
        else:
            p_page, p_neg_y, p_size = prev
            gap = neg_y - p_neg_y
            # a NEGATIVE gap means the pen moved back UP the page —
            # only the column order does that (top of the next column
            # after the bottom of the previous): always a new block
            if (
                page != p_page
                or gap > _BLOCK_GAP_FACTOR * max(p_size, size)
                or gap < -_LINE_Y_TOL
            ):
                new_block = True
            elif (size >= _TITLE_FONT_SIZE) != (p_size >= _TITLE_FONT_SIZE):
                new_block = True
        if new_block and cur_lines:
            blocks.append((cur_kind, " ".join(cur_lines)))
            cur_lines = []
        if new_block:
            cur_kind = "title" if size >= _TITLE_FONT_SIZE else "paragraph"
        cur_lines.append(text)
        prev = (page, neg_y, size)
    if cur_lines:
        blocks.append((cur_kind, " ".join(cur_lines)))

    out, spans = assemble_spans(blocks)
    confidence = (
        round(n_parsed_streams / n_total_streams, 3) if n_total_streams else 0.0
    )
    # Per-field confidences: the stream-parse ratio is the evidence
    # granularity for PDFs, attributed to each span kind present.
    field_confidences = {kind: confidence for kind in sorted({k for k, _ in blocks})}
    return ExtractionResult(
        text=out,
        spans=spans,
        parse_ok=True,
        warnings=warnings,
        content_type="pdf",
        confidence=confidence,
        field_confidences=field_confidences,
        # page-count probe (reference S3, ``pdf_service.py:148-179``):
        # one content stream per page in this corpus format
        n_pages=len(streams),
        tables=tables,
    )
