"""Kernel unit tests (no Spark). Mirrors the reference's layered test
strategy (SURVEY.md §5): scalar behavior pinned with explicit cases."""

from __future__ import annotations

from ai_pdf_extraction_spark.corpus.generate import generate_pages
from ai_pdf_extraction_spark.kernels import extract_document
from ai_pdf_extraction_spark.kernels.html_extract import extract_html
from ai_pdf_extraction_spark.kernels.pdf_extract import extract_pdf


def test_html_strips_boilerplate():
    html = (
        b"<html><head><title>T</title><script>junk()</script></head><body>"
        b"<nav><ul><li><a href='/a'>Home</a></li><li><a href='/b'>About us page</a></li></ul></nav>"
        b"<main><h1>Real heading here</h1>"
        b"<p>This is the genuine main content paragraph with enough length to keep.</p></main>"
        b"<footer><p>Copyright 2025 Example Corp all rights reserved worldwide.</p></footer>"
        b"</body></html>"
    )
    res = extract_html(html)
    assert res.parse_ok
    assert "Real heading here" in res.text
    assert "genuine main content" in res.text
    assert "Home" not in res.text
    assert "Copyright" not in res.text
    assert "junk()" not in res.text
    assert res.spans[0].kind == "title"


def test_html_link_density_drops_nav_blocks():
    html = (
        b"<body><div><p><a href='/x'>Link one here</a> <a href='/y'>Link two here</a>"
        b" <a href='/z'>Link three here</a></p>"
        b"<p>A normal sentence that is certainly long enough to be kept as content.</p></div></body>"
    )
    res = extract_html(html)
    assert "Link one" not in res.text
    assert "normal sentence" in res.text


def test_html_class_based_boilerplate():
    html = (
        b"<body><div class='sidebar'><p>Promotional sidebar text that is quite long indeed.</p></div>"
        b"<div class='content'><p>Kept paragraph with sufficient length for the classifier.</p></div></body>"
    )
    res = extract_html(html)
    assert "Promotional" not in res.text
    assert "Kept paragraph" in res.text


def test_html_nested_same_tag_inside_boilerplate_stays_boiler():
    """A nested same-named element inside a boilerplate subtree must not
    end boiler mode early (real-world ad/nav containers nest divs)."""
    html = (
        b"<body><div class='advert'><div>inner promo line</div>"
        b"AD TAIL TEXT THAT MUST NOT LEAK INTO THE MAIN CONTENT AT ALL.</div>"
        b"<p>The genuine article paragraph, long enough to be retained.</p></body>"
    )
    res = extract_html(html)
    assert "AD TAIL" not in res.text
    assert "inner promo" not in res.text
    assert "genuine article" in res.text
    # two levels deep + bare text straight after the close tag
    html2 = (
        b"<body><div id='sidebar'><div><div>x</div></div>"
        b"SIDEBAR JUNK LONG ENOUGH TO FORM A BLOCK, TRULY.</div>"
        b"Bare text directly after the sidebar that is long enough to keep.</body>"
    )
    res2 = extract_html(html2)
    assert "SIDEBAR JUNK" not in res2.text
    assert "Bare text directly after" in res2.text
    # boiler-within-boiler still unwinds correctly
    html3 = (
        b"<body><nav><div class='menu'><div>m</div></div>NAV TAIL LONG ENOUGH.</nav>"
        b"<p>Kept paragraph with enough characters to pass the filter.</p></body>"
    )
    res3 = extract_html(html3)
    assert "NAV TAIL" not in res3.text
    assert "Kept paragraph" in res3.text


def test_html_field_confidences_per_kind():
    """Per-field confidences (reference field_confidences dict): for
    each span kind, kept/candidate chars of that kind, round 3."""
    html = (
        b"<body><h1>Perfect heading kept whole</h1>"
        b"<p>A kept paragraph that is long enough to pass the filter, yes.</p>"
        b"<p>tiny</p>"  # dropped paragraph: counts in candidate only
        b"</body>"
    )
    res = extract_html(html)
    fc = res.field_confidences
    assert fc["title"] == 1.0
    kept = len("A kept paragraph that is long enough to pass the filter, yes.")
    cand = kept + len("tiny")
    assert fc["paragraph"] == round(kept / cand, 3)
    assert "list_item" not in fc  # no evidence → no entry
    # failed parse → empty map
    assert extract_html(b"").field_confidences == {}


def test_html_real_world_recovery():
    """Round-2 kernel-review regressions: each of these real-world
    shapes previously emptied or gutted the extraction silently (and,
    because the kernel is shared with the oracle, never showed up as a
    contract mismatch)."""
    cases = [
        # void element with a boiler class must not stick boiler mode
        (b'<body><img class="advert" src="x.png">'
         b"<p>This is the real main content paragraph, long enough.</p></body>",
         "real main content", None),
        # XHTML self-closed script must not swallow the document
        (b'<body><script src="x.js"/>'
         b"<p>Real article content that is long enough to be kept.</p></body>",
         "Real article content", None),
        # HTML5 omitted </head>: <body> implies it
        (b'<html><head><meta charset="utf-8"><title>T</title>'
         b"<body><p>Main article content, plenty long for the filter.</p></body></html>",
         "Main article content", "T"),
        # unclosed <a> must not poison later blocks' link ratios
        (b'<p>See <a href="/x">docs</p>'
         b"<p>This later paragraph is perfectly normal and long enough.</p>",
         "later paragraph is perfectly normal", None),
        # inline boiler (social link) masks its text without splitting
        # the enclosing paragraph
        (b'<p>Follow the news on <a class="social" href="x">Twitter</a>'
         b" for updates about the release today.</p>",
         "Follow the news on for updates", "Twitter"),
        # textarea content is form-widget text, not main content
        (b"<body><textarea>Write a comment here please, long.</textarea>"
         b"<p>Real content paragraph long enough to keep around.</p></body>",
         "Real content", "comment here"),
        # an UNCLOSED inline boiler element unwinds at the block
        # boundary instead of leaving the whole document in boiler mode
        (b'<body><p>Follow us <a class="share" href="#">Share</p>'
         b"<p>The genuine later article paragraph, long enough to keep.</p></body>",
         "genuine later article", "Share"),
        # unquoted attribute values ending in '/' are NOT self-closes
        # (stdlib-HTMLParser equivalence): the anchor opens normally,
        # so this link-dominated block is dropped by the link ratio
        (b"<div><a href=http://x.com/a/>one link</a> "
         b"<a href=http://x.com/b/>two link</a> "
         b"<a href=http://x.com/c/>three link</a> tiny tail.</div>"
         b"<p>Kept normal paragraph with plenty of characters in it.</p>",
         "Kept normal paragraph", "one link"),
        # round-3: inline boiler element opened at CONTAINER level (no
        # block current) must not swallow following sibling bare text
        (b'<body><div><a class="share" href="#">Share</a>'
         b" The first sibling sentence must survive extraction fine."
         b"</div></body>",
         "first sibling sentence must survive", "Share"),
        # round-3: HTML5 anchors never nest — a new <a> inside an open
        # boiler <a> implies closing it, so trailing text is live
        (b'<body><p>Intro words here <a class="share">Share'
         b'<a href="/x">inner anchor text</a>'
         b" and the trailing legit clause stays in the article.</p></body>",
         "trailing legit clause stays", "Share"),
        # round-3: nested boiler anchor inside boiler anchor — implied
        # close keeps depth bounded; sibling tail text survives
        (b'<body><div><a class="share">s one'
         b'<a class="social">s two</a>'
         b" live tail text after the social cluster, long enough.</div></body>",
         "live tail text after the social cluster", "s one"),
    ]
    for html, want, reject in cases:
        res = extract_html(html)
        assert want in res.text, (html, res.text)
        if reject is not None:
            assert reject not in res.text, (html, res.text)


def test_pdf_stream_dict_with_hex_string():
    """A /FlateDecode stream whose dict carries a hex string (/ID
    <DEADBEEF>) must still decompress — the dict regex previously
    failed to match, feeding deflate bytes to the tokenizer."""
    import zlib

    from ai_pdf_extraction_spark.kernels.pdf_extract import extract_pdf

    content = b"BT /F1 12 Tf 72 720 Td (Hello stream world) Tj ET"
    body = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n"
        b"<< /Length " + str(len(body)).encode() +
        b" /Filter /FlateDecode /ID <DEADBEEF> >>\nstream\n" + body +
        b"\nendstream\n%%EOF\n"
    )
    res = extract_pdf(pdf)
    assert res.parse_ok and "Hello stream world" in res.text


def test_pdf_malformed_operand_skips_operator_only():
    """A bad operand (string where Td expects numbers) skips that one
    operator instead of discarding the whole page's text."""
    from ai_pdf_extraction_spark.kernels.pdf_extract import extract_pdf

    pdf = (
        b"%PDF-1.4\n<< /Length 99 >>\nstream\n"
        b"BT /F1 12 Tf 72 720 Td (Kept text before) Tj "
        b"(x) (y) Td (Kept text after) Tj ET\nendstream\n%%EOF\n"
    )
    res = extract_pdf(pdf)
    assert "Kept text before" in res.text
    assert "Kept text after" in res.text


def test_pdf_string_escapes_follow_spec():
    """PDF 32000-1 §7.3.4.2: octal escapes are digits 0-7 only; an
    unknown escape (incl. ``\\8``/``\\9``) drops the backslash and keeps
    the character instead of poisoning the whole content stream."""
    from ai_pdf_extraction_spark.kernels.pdf_extract import _parse_pdf_string

    assert _parse_pdf_string(b"(a\\8b)", 0) == ("a8b", 6)
    assert _parse_pdf_string(b"(a\\9b)", 0)[0] == "a9b"
    assert _parse_pdf_string(b"(\\101)", 0)[0] == "A"
    assert _parse_pdf_string(b"(\\12x)", 0)[0] == chr(0o12) + "x"
    assert _parse_pdf_string(b"(ab\\\ncd)", 0)[0] == "abcd"  # continuation
    assert _parse_pdf_string(b"(ab\\\r\ncd)", 0)[0] == "abcd"
    assert _parse_pdf_string(b"(a\\zb)", 0)[0] == "azb"  # unknown escape
    assert _parse_pdf_string(b"(nested (x) ok)", 0)[0] == "nested (x) ok"


def test_html_spans_offsets_are_exact():
    html = b"<body><h1>Heading text here</h1><p>Paragraph body long enough to keep around.</p></body>"
    res = extract_html(html)
    assert len(res.spans) == 2
    for span in res.spans:
        segment = res.text[span.start : span.end]
        assert segment == segment.strip()
        assert "\n" not in segment
    assert res.text[res.spans[0].start : res.spans[0].end] == "Heading text here"


def test_html_table_and_list_kinds():
    html = (
        b"<body><ul><li>First list item with enough text to keep.</li></ul>"
        b"<table><tr><td>Cell value</td></tr></table></body>"
    )
    res = extract_html(html)
    kinds = {s.kind for s in res.spans}
    assert "list_item" in kinds
    assert "table_text" in kinds


def test_html_entities_and_encoding_fallback():
    res = extract_html("<p>caf\xe9 &amp; friends make it long enough.</p>".encode("latin-1"))
    assert "café & friends" in res.text
    assert any("latin-1" in w for w in res.warnings)


def test_empty_and_junk_content():
    assert extract_document(b"").parse_ok is False
    junk = extract_document(bytes(range(1, 32)))
    assert junk.parse_ok is False
    assert junk.text == ""


def test_pdf_reading_order_and_title():
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n"
        b"4 0 obj\n<< /Length 120 >>\nstream\n"
        b"BT /F1 24 Tf 72 720 Td (Top Title) Tj ET\n"
        b"BT /F1 12 Tf 72 600 Td 16 TL (first line) Tj T* (second line) Tj ET\n"
        b"BT /F1 12 Tf 72 520 Td (lower block) Tj ET\n"
        b"endstream\nendobj\n%%EOF\n"
    )
    res = extract_pdf(pdf)
    assert res.parse_ok
    assert res.text.startswith("Top Title")
    assert res.text.index("first line") < res.text.index("lower block")
    assert res.spans[0].kind == "title"
    # the two 16pt-spaced lines merge into one block; the 80pt gap splits
    assert "first line second line" in res.text


def test_pdf_escapes():
    pdf = (
        b"%PDF-1.4\nstream\n"
        b"BT /F1 12 Tf 72 700 Td (paren \\(x\\) and backslash \\\\ ok here today) Tj ET\n"
        b"endstream\n%%EOF\n"
    )
    res = extract_pdf(pdf)
    assert "paren (x) and backslash \\ ok" in res.text


def test_pdf_no_streams_is_parse_fail():
    res = extract_pdf(b"%PDF-1.4\nnothing here")
    assert res.parse_ok is False


def test_kernel_determinism_across_runs():
    rows_a = generate_pages(50, seed=7)
    rows_b = generate_pages(50, seed=7)
    for a, b in zip(rows_a, rows_b):
        assert a["html"] == b["html"]
        ra, rb = extract_document(a["html"]), extract_document(b["html"])
        assert ra.text == rb.text
        assert [s.as_tuple() for s in ra.spans] == [s.as_tuple() for s in rb.spans]


def test_corpus_has_required_shapes(pages_rows):
    from ai_pdf_extraction_spark.corpus.generate import SKEWED_HOST

    n = len(pages_rows)
    skew = sum(1 for r in pages_rows if SKEWED_HOST in r["url"])
    assert 0.2 * n < skew < 0.4 * n, "skewed host must hold ~30% of rows"
    pdfs = sum(1 for r in pages_rows if r["html"][:4] == b"%PDF")
    assert pdfs > 0
    malformed = sum(1 for r in pages_rows if not extract_document(r["html"]).parse_ok)
    assert malformed > 0


def test_pdf_tj_kerning_word_gaps():
    pdf = (
        b"%PDF-1.4\nstream\n"
        b"BT /F1 12 Tf 72 700 Td [(hello) -250 (kerned) -250 (world) -20 (x)] TJ ET\n"
        b"endstream\n%%EOF\n"
    )
    res = extract_pdf(pdf)
    # large negative kerns are word gaps; small ones are not
    assert "hello kerned worldx" in res.text


def test_kernel_v12_regressions():
    """Pinned shapes for the fifth-review kernel fixes (each was a
    verified real-input failure; the shared-kernel contract cannot see
    any of them by construction)."""
    from ai_pdf_extraction_spark.kernels.html_extract import extract_html
    from ai_pdf_extraction_spark.kernels.pdf_extract import extract_pdf
    from ai_pdf_extraction_spark.kernels.types import tables_signature

    prose = (
        "Real content here with enough prose to clear the threshold "
        "and then some more words again."
    )

    # 1. non-ASCII colspan digit (superscript two): isdigit()==True but
    # int() raises — must not destroy the document
    r = extract_html(
        f'<table><tr><td colspan="²">cellvalue</td></tr></table>'
        f"<p>{prose}</p>".encode()
    )
    assert r.parse_ok and "Real content" in r.text

    # 2. </head> AND <body> omitted (valid HTML5): content must extract
    r = extract_html(
        f"<html><head><meta charset=utf-8><p>{prose}</p>".encode()
    )
    assert r.parse_ok and "Real content" in r.text

    # 3. <title> with <head> omitted never leaks into the text stream
    r = extract_html(
        f"<html><title>Annual Report 2024: Consolidated Statements."
        f"</title><body><p>{prose}</p></body>".encode()
    )
    assert "Annual Report" not in r.text and "Real content" in r.text

    # 4. self-closed <td/> is an OPEN cell (HTML5): columns stay under
    # their headers
    r = extract_html(
        b"<table><tr><th>a</th><th>b</th><th>c</th></tr>"
        b"<tr><td>1</td><td/><td>3</td></tr></table>"
    )
    assert r.tables and r.tables[0][0].get("a") == "1"
    assert r.tables[0][0].get("c") == "3", r.tables

    # 5. PDF '"' show-text operator must not silently drop its line
    pdf = (
        b"%PDF-1.4\nstream\nBT /F1 12 Tf 72 720 Td (First line) Tj "
        b"1 2 (Second line) \" ET\nendstream\n%%EOF\n"
    )
    r = extract_pdf(pdf)
    assert "First line" in r.text and "Second line" in r.text

    # 6. <br> inside a masked inline element leaks no whitespace
    r = extract_html(
        f'<p>Hello<span class="share">ignore<br>me</span>world. {prose}</p>'.encode()
    )
    assert "Helloworld." in r.text, r.text

    # 7. delimiter escaping: distinct payloads can no longer alias
    sig_a = tables_signature([[{"a": "1", "b": "2"}]])
    sig_b = tables_signature([[{"a": "1,b=2"}]])
    assert sig_a != sig_b
    assert tables_signature([[{"k|x": "v;y"}]]) == "k%7Cx=v%3By"


def test_kernel_v13_selfclosed_boiler_container():
    """v12 regression caught by review: a childless self-closed boiler
    container (<nav/>, <div id="comments"/> — common JS mount points)
    must NOT push an unpoppable boiler entry that masks the rest of
    the document. Self-closes are start+immediate-end now."""
    from ai_pdf_extraction_spark.kernels.html_extract import extract_html

    prose = (
        "Real content here with enough prose to clear the threshold "
        "and then some more words again."
    )
    for mount in ('<div id="comments-root"/>', "<nav/>", '<aside class="sidebar"/>'):
        r = extract_html(f"<body>{mount}<p>{prose}</p></body>".encode())
        assert r.parse_ok and "Real content" in r.text, (mount, r.warnings)
    # the <td/> alignment behavior from v12 must survive the change
    r = extract_html(
        b"<table><tr><th>a</th><th>b</th><th>c</th></tr>"
        b"<tr><td>1</td><td/><td>3</td></tr></table>"
    )
    assert r.tables and r.tables[0][0].get("a") == "1"
    assert r.tables[0][0].get("c") == "3", r.tables


def test_pdf_two_column_reading_order():
    """Kernel v14: a two-column page reads the LEFT column
    top-to-bottom before the right one — never zippered by baseline.
    Full-width lines (the title here: 22pt from the left margin,
    extending past the column gap) band-separate and read in place;
    the jump back UP the page to the right column's top starts a new
    block (negative-gap rule). Baselines are OFFSET (680 vs 674) —
    independent column leading, the interleaving that makes the
    zipper; exactly-aligned baselines merge upstream into the
    table-row shape instead (documented scope)."""
    pdf = (
        b"%PDF-1.4\nstream\n"
        b"BT /F1 22 Tf 60 720 Td (Wide Title Across Both Columns) Tj ET\n"
        b"BT /F1 9 Tf 60 680 Td 13 TL (left one) Tj T* (left two) Tj T* (left three) Tj ET\n"
        b"BT /F1 9 Tf 330 674 Td 13 TL (right one) Tj T* (right two) Tj T* (right three) Tj ET\n"
        b"endstream\n%%EOF\n"
    )
    res = extract_pdf(pdf)
    assert res.parse_ok
    idx = {
        t: res.text.index(t)
        for t in ("Wide Title", "left one", "left three", "right one", "right three")
    }
    assert idx["Wide Title"] < idx["left one"] < idx["left three"] < idx["right one"] < idx["right three"]
    # same-baseline pairs must NOT share a line
    assert "left one right one" not in res.text
    # columns are separate blocks (negative-gap rule), title its own
    assert "left one left two left three" in res.text
    assert "right one right two right three" in res.text
    assert res.spans[0].kind == "title"


def test_pdf_column_split_preconditions_hold_order():
    """The split is conservative: an indented block BELOW the body
    (disjoint y-ranges — a signature/footer, not a second column)
    keeps plain (-y, x) order; so does a page whose x-starts cluster
    under the 72pt gap threshold."""
    # right-side cluster strictly below the left body: no column split
    below = (
        b"%PDF-1.4\nstream\n"
        b"BT /F1 9 Tf 60 700 Td 13 TL (body a) Tj T* (body b) Tj T* (body c) Tj ET\n"
        b"BT /F1 9 Tf 330 500 Td 13 TL (sig x) Tj T* (sig y) Tj ET\n"
        b"endstream\n%%EOF\n"
    )
    res = extract_pdf(below)
    assert res.text.index("body c") < res.text.index("sig x")

    # 40pt start offset (an indent, not a column): order is (-y, x)
    indent = (
        b"%PDF-1.4\nstream\n"
        b"BT /F1 9 Tf 60 700 Td 13 TL (alpha a) Tj T* (alpha b) Tj ET\n"
        b"BT /F1 9 Tf 100 700 Td 13 TL (beta a) Tj T* (beta b) Tj ET\n"
        b"endstream\n%%EOF\n"
    )
    res2 = extract_pdf(indent)
    assert res2.text.index("alpha a") < res2.text.index("beta a") < res2.text.index("alpha b")


def test_pdf_three_column_reading_order():
    """The column split recurses: a 3-column page reads col1, col2,
    col3 — the first boundary peels one column, the recursive call on
    the remaining side finds the second. Column start baselines are
    chosen pairwise non-congruent mod the 13pt leading (700/694/691
    -> residues 11/5/2) so no cross-column baseline ever falls within
    the 2pt line-clustering tolerance."""
    pdf = (
        b"%PDF-1.4\nstream\n"
        b"BT /F1 9 Tf 50 700 Td 13 TL (aa one) Tj T* (aa two) Tj T* (aa three) Tj ET\n"
        b"BT /F1 9 Tf 240 694 Td 13 TL (bb one) Tj T* (bb two) Tj T* (bb three) Tj ET\n"
        b"BT /F1 9 Tf 430 691 Td 13 TL (cc one) Tj T* (cc two) Tj T* (cc three) Tj ET\n"
        b"endstream\n%%EOF\n"
    )
    res = extract_pdf(pdf)
    assert res.parse_ok
    order = [res.text.index(t) for t in (
        "aa one", "aa three", "bb one", "bb three", "cc one", "cc three")]
    assert order == sorted(order), res.text
