"""HTML main-content extraction: trafilatura-style boilerplate strip.

Replaces the reference's LLM vision extraction call
(``app/backend/services/ai/extraction.py:207-334``) with a
deterministic DOM-heuristic classifier from the published
Readability/boilerpipe/trafilatura algorithm family:

* **section pruning** — subtrees under ``nav/header/footer/aside`` (or
  elements whose class/id matches a boilerplate vocabulary) are never
  main content;
* **link-text ratio** — text blocks dominated by anchor text are
  navigation/boilerplate;
* **text-block segmentation** — block-level elements become candidate
  blocks; short fragment blocks without sentence structure are dropped.

stdlib-only (compiled-regex tag scanner, ``html.unescape`` for
entities) so the kernel is fully deterministic and identical between
the pytest oracle and the Spark pandas UDF.

Output: main text (blocks joined by a blank line) + character spans
``(start, end, kind)`` with kind ∈ {title, paragraph, list_item,
table_text} (FIXTURES.md §2).
"""

from __future__ import annotations

import re

from ai_pdf_extraction_spark.kernels.types import (
    ExtractionResult,
    Span,
    assemble_spans,
    table_records,
)

# Subtrees that never contain main content.
_SKIP_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "svg",
        "iframe",
        "form",
        "select",
        "option",
        "button",
        "head",
        "object",
        "embed",
        "canvas",
        "audio",
        "video",
        "map",
        "textarea",
        # browsers never render <title>; without this, a document that
        # omits <head> (valid HTML5) leaked its title into the text
        # stream as the first paragraph block
        "title",
    }
)

# Void elements (HTML5 §13.1.2) have NO subtree and never a close tag:
# they must not push skip/boiler state that nothing will ever pop.
_VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Semantic boilerplate sections (trafilatura's OVERALL_DISCARD analogue).
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside", "menu"})

# class/id tokens that mark a subtree as boilerplate.
_BOILER_ATTR_RE = re.compile(
    r"(?:^|[\s_-])(?:nav|navbar|menu|sidebar|side-bar|footer|header|banner|"
    r"breadcrumbs?|advert\w*|ads?|sponsor\w*|promo\w*|share|social|comment\w*|"
    r"related|widget|cookie\w*|popup|modal|subscribe|newsletter|pagination|"
    r"skip-link|masthead|byline-tools)(?:$|[\s_-])",
    re.IGNORECASE,
)

# Elements that open a fresh text block.
_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_BLOCK_TAGS = frozenset(
    {
        "p",
        "li",
        "td",
        "th",
        "pre",
        "blockquote",
        "figcaption",
        "dt",
        "dd",
        "caption",
        "summary",
    }
    | _HEADINGS
)

# Containers whose open/close flushes any implicit (tag-less) block.
_CONTAINER_TAGS = frozenset(
    {
        "div",
        "section",
        "article",
        "main",
        "body",
        "ul",
        "ol",
        "dl",
        "table",
        "thead",
        "tbody",
        "tfoot",
        "tr",
        "figure",
        "details",
    }
)

_WS_RE = re.compile(r"\s+")

# Block-acceptance thresholds (deterministic; tuned on the synthetic
# corpus, in the spirit of boilerpipe's densitometric thresholds).
_MIN_PARAGRAPH_CHARS = 25
_MIN_SHORT_SENTENCE_CHARS = 10
_MIN_LIST_ITEM_CHARS = 15
_MIN_TABLE_CELL_CHARS = 3
_MAX_PARAGRAPH_LINK_RATIO = 1.0 / 3.0
_MAX_LIST_LINK_RATIO = 0.25
_MAX_TABLE_LINK_RATIO = 0.2
_MAX_HEADING_LINK_RATIO = 0.8
_SENTENCE_END = (".", "!", "?", ":", ";", "”", '"', "»")


def _kind_for_tag(tag: str) -> str:
    if tag in _HEADINGS:
        return "title"
    if tag == "li":
        return "list_item"
    if tag in ("td", "th", "caption"):
        return "table_text"
    return "paragraph"


class _Block:
    __slots__ = ("kind", "parts", "link_chars", "boiler")

    def __init__(self, kind: str, boiler: bool) -> None:
        self.kind = kind
        self.parts: list[str] = []
        self.link_chars = 0
        self.boiler = boiler


class _TableCtx:
    """In-flight structured capture of one <table> subtree."""

    __slots__ = (
        "rows",
        "row",
        "row_th",
        "cell",
        "cell_pad",
        "cell_rowspan",
        "spans_down",
        "dropped",
    )

    def __init__(self, dropped: bool) -> None:
        self.rows: list[tuple[bool, list[str]]] = []  # (had_th, cells)
        self.row: list[str] | None = None
        self.row_th = False
        self.cell: list[str] | None = None
        self.cell_pad = 0  # colspan-1 placeholder cells after this cell
        self.cell_rowspan = 1  # rowspan of the open cell
        # column index → [text, rows_remaining]: rowspan cells carry
        # their value down into the spanned rows at the same column
        self.spans_down: dict[int, list] = {}
        self.dropped = dropped  # opened inside a boiler subtree


class _MainContentParser:
    """Streams the DOM once, segmenting text into classified blocks.

    Driven by ``_scan`` (a compiled-regex tag scanner ~2× faster than
    stdlib ``html.parser``, which dominated the kernel profile); the
    handler interface mirrors ``HTMLParser`` so either driver works.
    """

    def __init__(self) -> None:
        self.blocks: list[tuple[str, str]] = []  # (kind, normalized text)
        self.candidate_chars = 0  # all non-skip text seen (incl. dropped)
        # per-kind evidence for field_confidences (kept/candidate chars)
        self.kind_candidate: dict[str, int] = {}
        self.kind_kept: dict[str, int] = {}
        self._skip_depth = 0
        self._skip_stack: list[str] = []
        self._boiler_depth = 0
        self._link_depth = 0
        # Entries are [tag, pending] where ``pending`` counts nested
        # same-named non-boiler elements still open inside the subtree,
        # so <div class="ad"><div>…</div>AD TEXT</div> keeps AD TEXT in
        # boiler mode until the *outer* close tag.
        self._boiler_stack: list[list] = []
        self._current: _Block | None = None
        # Structured table capture (the reference's ``array`` FieldType
        # — array-of-objects rows, SEC 8-K ``securities_registered``
        # shape): PARALLEL bookkeeping, never feeds the text/span
        # stream. A stack because tables nest; a nested table's cells
        # belong to the inner table only.
        self.tables: list[list[dict[str, str]]] = []
        self._table_stack: list[_TableCtx] = []

    # -- helpers -------------------------------------------------------

    def _attr_is_boiler(self, attrs: list[tuple[str, str | None]]) -> bool:
        for name, value in attrs:
            if name in ("class", "id", "role") and value:
                if name == "role" and value.lower() in (
                    "navigation",
                    "banner",
                    "contentinfo",
                    "complementary",
                ):
                    return True
                if name != "role" and _BOILER_ATTR_RE.search(value):
                    return True
        return False

    def _flush(self) -> None:
        # Inline elements do not survive a block boundary (libxml2-style
        # recovery, which the trafilatura family inherits): an unclosed
        # <a> must not poison the link ratio of every later block, and
        # an unclosed INLINE boiler element (<a class="share"> with no
        # </a>) must not leave the rest of the document in boiler mode.
        self._link_depth = 0
        while self._boiler_stack and not self._boiler_stack[-1][2]:
            self._boiler_stack.pop()
            self._boiler_depth -= 1
        block = self._current
        self._current = None
        if block is None:
            return
        text = _WS_RE.sub(" ", "".join(block.parts)).strip()
        if not text:
            return
        self.candidate_chars += len(text)
        n = len(text)
        kind = block.kind
        self.kind_candidate[kind] = self.kind_candidate.get(kind, 0) + n
        if block.boiler:
            return
        ratio = block.link_chars / n
        if kind == "title":
            keep = ratio < _MAX_HEADING_LINK_RATIO
        elif kind == "list_item":
            keep = n >= _MIN_LIST_ITEM_CHARS and ratio <= _MAX_LIST_LINK_RATIO
        elif kind == "table_text":
            keep = n >= _MIN_TABLE_CELL_CHARS and ratio <= _MAX_TABLE_LINK_RATIO
        else:
            keep = ratio <= _MAX_PARAGRAPH_LINK_RATIO and (
                n >= _MIN_PARAGRAPH_CHARS
                or (n >= _MIN_SHORT_SENTENCE_CHARS and text.endswith(_SENTENCE_END))
            )
        if keep:
            self.blocks.append((kind, text))
            self.kind_kept[kind] = self.kind_kept.get(kind, 0) + n

    def _open_block(self, kind: str) -> None:
        self._flush()
        self._current = _Block(kind, boiler=self._boiler_depth > 0)

    # -- structured table capture --------------------------------------

    @staticmethod
    def _inject_rowspans(ctx: _TableCtx) -> None:
        """Fill columns occupied by a cell spanning down from an
        earlier row (entry[2] False = created in a previous row) with
        its carried value."""
        while True:
            entry = ctx.spans_down.get(len(ctx.row))
            if entry is None or entry[2]:
                return
            ctx.row.append(entry[0])

    def _table_end_cell(self, ctx: _TableCtx) -> None:
        if ctx.cell is not None:
            if ctx.row is None:
                ctx.row = []
            self._inject_rowspans(ctx)
            col = len(ctx.row)
            text = _WS_RE.sub(" ", "".join(ctx.cell)).strip()
            ctx.row.append(text)
            if ctx.cell_rowspan > 1:
                # rowspan=N: carry this value down into the next N-1
                # rows at the same column (the school-attendance
                # stub-column shape); fresh=True until this row closes.
                # A colspan+rowspan cell occupies a RECTANGLE: its
                # placeholder columns must carry down too (as empties),
                # else next-row cells shift left under wrong headers.
                ctx.spans_down[col] = [text, ctx.cell_rowspan - 1, True]
                for j in range(1, ctx.cell_pad + 1):
                    ctx.spans_down[col + j] = ["", ctx.cell_rowspan - 1, True]
            ctx.row.extend([""] * ctx.cell_pad)
            ctx.cell = None
        ctx.cell_pad = 0
        ctx.cell_rowspan = 1

    def _table_end_row(self, ctx: _TableCtx) -> None:
        self._table_end_cell(ctx)
        if ctx.row is not None:
            self._inject_rowspans(ctx)  # trailing carried columns
            ctx.rows.append((ctx.row_th, ctx.row))
            ctx.row = None
            # age the spans: ones created THIS row start carrying next
            # row; pre-existing ones just served this row
            for col in list(ctx.spans_down):
                entry = ctx.spans_down[col]
                if entry[2]:
                    entry[2] = False
                else:
                    entry[1] -= 1
                    if entry[1] <= 0:
                        del ctx.spans_down[col]
        ctx.row_th = False

    def _table_finalize(self) -> None:
        """Close the top table: a first row containing a <th> becomes
        the header; a headerless table keeps positional keys for every
        row. Row-map construction (key normalization, empty-cell
        omission, List-Stutter filter) is the shared
        ``types.table_records`` — one copy for both kernels."""
        ctx = self._table_stack.pop()
        self._table_end_row(ctx)
        if ctx.dropped or not ctx.rows:
            return
        rows = ctx.rows
        if rows[0][0]:  # header row present
            header, data = rows[0][1], [cells for _, cells in rows[1:]]
        else:  # headerless table: positional keys, every row is data
            header, data = None, [cells for _, cells in rows]
        cleaned = table_records(header, data)
        if cleaned:
            self.tables.append(cleaned)

    def _pop_boiler(self) -> None:
        """Close the top boiler-stack entry, mirroring its entry mode.

        Leaving a block-level boiler subtree ends any open boiler block
        (following bare text must not be swallowed). Leaving an INLINE
        boiler element normally keeps the enclosing live block open —
        but if the element opened while no block was current (e.g.
        ``<div><a class="share">Share</a> sibling text``), the implicit
        block created for its masked text is itself a boiler block, and
        keeping it open would swallow the sibling text; flush it once
        the stack drains so following text starts a fresh live block.
        """
        entry = self._boiler_stack.pop()
        self._boiler_depth -= 1
        if entry[2]:
            self._flush()
        elif (
            self._boiler_depth == 0
            and self._current is not None
            and self._current.boiler
        ):
            self._flush()

    # -- HTMLParser hooks ----------------------------------------------

    def _br(self) -> None:
        """<br> is a soft space in the text stream AND in any open
        table cell (cells capture text independently of blocks) —
        under the SAME boiler mask as handle_data: a <br> inside a
        masked inline element must not leak a space into the live
        block whose text is otherwise fully masked."""
        if self._current is not None and not (
            self._boiler_depth and not self._current.boiler
        ):
            self._current.parts.append(" ")
        if self._table_stack:
            ctx = self._table_stack[-1]
            # same masking rule as handle_data's cell capture
            if ctx.cell is not None and not ctx.dropped and not self._boiler_depth:
                ctx.cell.append(" ")

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            # no subtree, no close tag: never any stack state
            if not self._skip_depth and tag == "br":
                self._br()
            return
        if tag in _SKIP_TAGS:
            self._skip_stack.append(tag)
            self._skip_depth += 1
            return
        if self._skip_depth:
            if "head" in self._skip_stack:
                # HTML5 allows omitting </head> (and <body>): ANY
                # non-head element implies the head is over — head-only
                # content (title/style/script/meta/link) never reaches
                # here (skip/rawtext/void handling above), so gating on
                # <body> alone dropped the whole document when both
                # tags were omitted
                while "head" in self._skip_stack:
                    self._skip_stack.remove("head")
                    self._skip_depth -= 1
            if self._skip_depth:
                return
        if tag == "table":
            self._table_stack.append(
                _TableCtx(
                    dropped=self._boiler_depth > 0 or self._attr_is_boiler(attrs)
                )
            )
        elif self._table_stack:
            ctx = self._table_stack[-1]
            if tag == "tr":
                self._table_end_row(ctx)
                ctx.row = []
            elif tag in ("td", "th"):
                self._table_end_cell(ctx)
                if ctx.row is None:
                    ctx.row = []
                # colspan=N keeps later columns aligned with their
                # headers (the spanning cell is followed by N-1 empty
                # placeholder cells → omitted keys); rowspan=N carries
                # the value down into the next N-1 rows at its column.
                for name, value in attrs:
                    # ascii guard: isdigit() accepts non-ASCII digits
                    # (e.g. superscript two) that int() rejects — one
                    # such attribute must not raise out of the parse
                    if (
                        name == "colspan"
                        and value
                        and value.isascii()
                        and value.isdigit()
                    ):
                        ctx.cell_pad = min(int(value), 100) - 1
                    elif (
                        name == "rowspan"
                        and value
                        and value.isascii()
                        and value.isdigit()
                    ):
                        ctx.cell_rowspan = min(int(value), 1000)
                ctx.cell = []
                if tag == "th":
                    ctx.row_th = True
        if tag == "a" and self._boiler_stack and self._boiler_stack[-1][0] == "a":
            # Anchors never nest (HTML5): a new <a> implies closing an
            # open boiler <a> before it opens. Apply the rule to the
            # boiler stack too — not just link depth — else legitimate
            # text after the inner anchor stays masked until a second
            # </a> that the real DOM never pairs with the outer.
            self._pop_boiler()
        if tag in _BOILER_TAGS or self._attr_is_boiler(attrs):
            self._boiler_depth += 1
            # Block-level boilerplate terminates the open block (on
            # entry AND exit); an INLINE boiler element (a social link
            # mid-paragraph) must not split the enclosing paragraph —
            # its text is masked in handle_data instead. The entry
            # records which mode applies so the pop mirrors it.
            block_level = (
                tag in _BLOCK_TAGS or tag in _CONTAINER_TAGS or tag in _BOILER_TAGS
            )
            self._boiler_stack.append([tag, 0, block_level])
            if block_level:
                self._flush()
            return
        if self._boiler_stack and self._boiler_stack[-1][0] == tag:
            # Same-named nested element inside the boiler subtree: its
            # close tag must not end boiler mode.
            self._boiler_stack[-1][1] += 1
        if tag == "a":
            # anchors never nest (HTML5): an <a> inside an open <a> is
            # an implied close+reopen, so depth stays bounded at 1
            self._link_depth = 1
            return
        if tag in _BLOCK_TAGS:
            self._open_block(_kind_for_tag(tag))
        elif tag in _CONTAINER_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        """Self-closed element. HTML5 §13.1.2: the trailing ``/`` is
        meaningful only on void elements; on anything else browsers
        parse ``<td/>`` as an ORDINARY open tag — route it through
        ``handle_starttag`` so e.g. a self-closed table cell still
        opens a cell instead of silently shifting later columns under
        the wrong headers — then immediately close it: by the letter
        of HTML5 a self-closed container (``<script/>``, ``<nav/>``,
        ``<div id="comments"/>``) would swallow the REST OF THE
        DOCUMENT into its subtree, which is the wrong trade for
        recovery-oriented extraction (a childless boiler mount point
        must not mask the whole page). The start+end pair keeps every
        stack symmetric (boiler, table ctx, link depth) by
        construction."""
        if tag in _VOID_TAGS or tag in _SKIP_TAGS:
            if not self._skip_depth and tag == "br":
                self._br()
            return
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        if tag in _SKIP_TAGS:
            if tag in self._skip_stack:
                # pop the most recent matching entry
                for i in range(len(self._skip_stack) - 1, -1, -1):
                    if self._skip_stack[i] == tag:
                        del self._skip_stack[i]
                        break
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if self._table_stack and tag in ("table", "tr", "td", "th"):
            if tag == "table":
                self._table_finalize()
            elif tag == "tr":
                self._table_end_row(self._table_stack[-1])
            else:
                self._table_end_cell(self._table_stack[-1])
        if self._boiler_stack and self._boiler_stack[-1][0] == tag:
            entry = self._boiler_stack[-1]
            if entry[1]:
                entry[1] -= 1  # closes a nested same-named element
            else:
                self._pop_boiler()
                return
        if tag == "a":
            self._link_depth = 0
            return
        if tag in _BLOCK_TAGS or tag in _CONTAINER_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        if self._table_stack:
            ctx = self._table_stack[-1]
            if ctx.cell is not None and not ctx.dropped and not self._boiler_depth:
                ctx.cell.append(data)
        if (
            self._boiler_depth
            and self._current is not None
            and not self._current.boiler
        ):
            # inline boiler element inside a live block: mask its text
            # without terminating the block
            return
        if self._current is None:
            if not data.strip():
                return
            # Implicit block: bare text inside a container.
            self._current = _Block("paragraph", boiler=self._boiler_depth > 0)
        self._current.parts.append(data)
        if self._link_depth:
            self._current.link_chars += len(_WS_RE.sub(" ", data).strip())

    def close(self) -> None:
        # truncated html: unclosed tables still finalize (libxml2-style
        # recovery — whatever rows were parsed are kept)
        while self._table_stack:
            self._table_finalize()
        self._flush()


_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)(/?)>")
_ATTR_RE = re.compile(
    r"([a-zA-Z-]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))"
)
_ATTR_HINT_RE = re.compile(r"class|id|role|colspan|rowspan", re.IGNORECASE)
# raw-text elements whose content must not be tag-scanned
_RAWTEXT_END = {
    "script": re.compile(r"</script\s*>", re.IGNORECASE),
    "style": re.compile(r"</style\s*>", re.IGNORECASE),
    "textarea": re.compile(r"</textarea\s*>", re.IGNORECASE),
    "title": re.compile(r"</title\s*>", re.IGNORECASE),
}


def _parse_attrs(raw: str) -> list[tuple[str, str | None]]:
    return [
        (m.group(1).lower(), m.group(2) or m.group(3) or m.group(4))
        for m in _ATTR_RE.finditer(raw)
    ]


def _scan(markup: str, handler: _MainContentParser) -> None:
    """Single-pass regex tag scanner feeding the handler — same event
    stream as ``HTMLParser(convert_charrefs=True)`` for well-formed
    markup; malformed tags degrade to text, never exceptions."""
    pos = 0
    n = len(markup)
    unescape = None  # lazy import of html.unescape
    handle_data = handler.handle_data
    handle_starttag = handler.handle_starttag
    handle_endtag = handler.handle_endtag
    find = markup.find
    tag_match = _TAG_RE.match
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            chunk = markup[pos:]
            if chunk:
                if "&" in chunk:
                    if unescape is None:
                        from html import unescape
                    chunk = unescape(chunk)
                handle_data(chunk)
            break
        if lt > pos:
            chunk = markup[pos:lt]
            if "&" in chunk:
                if unescape is None:
                    from html import unescape
                chunk = unescape(chunk)
            handle_data(chunk)
        nxt = markup[lt + 1 : lt + 2]
        if nxt == "!" or nxt == "?":
            if markup.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end == -1 else end + 3
            else:
                end = find(">", lt)
                pos = n if end == -1 else end + 1
            continue
        m = tag_match(markup, lt)
        if not m:
            handle_data("<")
            pos = lt + 1
            continue
        closing, tag, rawattrs, selfclose = m.groups()
        # The greedy attrs group consumes a trailing '/', so the (/?)
        # group alone never fires — recover XHTML-style self-closes
        # here. Only when the '/' is NOT part of an unquoted attribute
        # value (href=http://x.com/a/ must stay an ordinary start tag,
        # matching stdlib HTMLParser): the char before it must be
        # whitespace, a quote, or nothing.
        if (
            not selfclose
            and rawattrs
            and rawattrs.endswith("/")
            and (len(rawattrs) == 1 or rawattrs[-2] in " \t\n\r\"'")
        ):
            selfclose = "/"
            rawattrs = rawattrs[:-1]
        tag = tag.lower()
        pos = m.end()
        if closing:
            handle_endtag(tag)
            continue
        attrs = (
            _parse_attrs(rawattrs)
            if rawattrs and _ATTR_HINT_RE.search(rawattrs)
            else []
        )
        if selfclose:
            handler.handle_startendtag(tag, attrs)
            continue
        handle_starttag(tag, attrs)
        raw_end = _RAWTEXT_END.get(tag)
        if raw_end is not None:
            em = raw_end.search(markup, pos)
            if em is None:
                handle_data(markup[pos:])
                handle_endtag(tag)
                pos = n
            else:
                handle_data(markup[pos : em.start()])
                handle_endtag(tag)
                pos = em.end()


def _decode(data: bytes) -> tuple[str, list[str]]:
    try:
        return data.decode("utf-8"), []
    except UnicodeDecodeError:
        return data.decode("latin-1"), ["html: non-utf8 bytes, latin-1 fallback"]


def extract_html(data: bytes) -> ExtractionResult:
    """Extract main content text + spans from raw HTML bytes."""
    markup, warnings = _decode(data)
    parser = _MainContentParser()
    try:
        _scan(markup, parser)
        parser.close()
    except Exception as exc:
        return ExtractionResult(
            text="",
            spans=[],
            parse_ok=False,
            warnings=warnings + [f"html parse error: {type(exc).__name__}"],
            content_type="html",
        )
    out, spans = assemble_spans(parser.blocks)
    parse_ok = True
    if not out:
        if "<" not in markup:
            # No markup at all: junk binary routed here by the
            # magic-byte dispatcher — a malformed row, not a thin page.
            parse_ok = False
            warnings = warnings + ["html: no markup found"]
        else:
            warnings = warnings + ["html: no main content found"]
    kept = sum(len(t) for _, t in parser.blocks)
    confidence = (
        round(kept / parser.candidate_chars, 3) if parser.candidate_chars else 0.0
    )
    # Per-field confidences (reference ``field_confidences``): for each
    # span kind, the kept-to-candidate char ratio of that kind.
    field_confidences = {
        kind: round(parser.kind_kept.get(kind, 0) / cand, 3)
        for kind, cand in sorted(parser.kind_candidate.items())
        if cand
    }
    return ExtractionResult(
        text=out,
        spans=spans,
        parse_ok=parse_ok,
        warnings=warnings,
        content_type="html",
        confidence=confidence,
        field_confidences=field_confidences,
        tables=parser.tables,
        n_pages=1 if parse_ok else 0,
    )
