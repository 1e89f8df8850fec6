"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §1).

Generates rows ``(url, warc_ts, html binary, text, lang)`` with:

* ~88% HTML pages — known main content wrapped in known boilerplate
  (nav/header/footer/sidebar/ads with high link density), so the
  boilerplate classifier has an exact expected output;
* ~8% PDF pages — minimal handcrafted single-column PDFs (pattern from
  the reference's test fixture, ``tests/conftest.py:20-59``);
* ~4% malformed rows — empty bytes, truncated HTML, junk binary —
  which must yield ``parse_ok=false``, never task failure (reference
  failure isolation: ``routers/batches.py:177-188``);
* one skewed host holding ~30% of rows (exercises salted repartition,
  SURVEY.md §7.4) plus a long tail of unique hosts.

Everything is seeded (default seed=42) and uses only ``random.Random``
arithmetic — no wall clock, no external data.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

_VOCAB = (
    "data spark engine cluster shuffle partition column vector batch arrow "
    "document page extract content text layout block heading kernel plan "
    "query join filter scan sink source schema record table bucket salt "
    "metric lineage snapshot resume commit stream byte span token corpus "
    "index merge sort limit window group reduce combine probe build hash"
).split()

_DE_VOCAB = (
    "daten seite inhalt block absatz tabelle spalte zeile verteilt "
    "verarbeitung dokument text auszug plan anfrage schlüssel wert satz"
).split()

SKEWED_HOST = "big.example.com"
_EPOCH = datetime(2025, 6, 1, tzinfo=timezone.utc)


def _sentence(rng: random.Random, vocab: list[str], n_words: int) -> str:
    words = [rng.choice(vocab) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: random.Random, vocab: list[str]) -> str:
    return " ".join(_sentence(rng, vocab, rng.randint(6, 14)) for _ in range(rng.randint(2, 5)))


def _nav_links(rng: random.Random, n: int) -> str:
    return "".join(
        f'<li><a href="/{rng.choice(_VOCAB)}/{i}">{rng.choice(_VOCAB).capitalize()}</a></li>'
        for i in range(n)
    )


def _build_html(rng: random.Random, lang: str) -> bytes:
    vocab = _DE_VOCAB if lang == "de" else _VOCAB
    title = _sentence(rng, vocab, rng.randint(3, 6)).rstrip(".")
    paras = [_paragraph(rng, vocab) for _ in range(rng.randint(2, 6))]
    has_list = rng.random() < 0.4
    has_table = rng.random() < 0.3
    list_html = ""
    if has_list:
        items = "".join(
            f"<li>{_sentence(rng, vocab, rng.randint(4, 9))}</li>" for _ in range(rng.randint(3, 6))
        )
        list_html = f"<ul>{items}</ul>"
    table_html = ""
    if has_table:
        rows = "".join(
            f"<tr><td>{_sentence(rng, vocab, 3)}</td><td>{rng.randint(1, 999)} units</td></tr>"
            for _ in range(rng.randint(2, 4))
        )
        table_html = f"<table><tr><th>Item description</th><th>Amount</th></tr>{rows}</table>"
    body_paras = "".join(f"<p>{p}</p>" for p in paras)
    ad = (
        '<div class="advert banner"><p>Buy now! <a href="/ad">Click here for a great deal</a>'
        " limited offer</p></div>"
    )
    sidebar_links = _nav_links(rng, rng.randint(4, 8))
    comments = (
        '<div id="comments"><p>'
        + _sentence(rng, vocab, rng.randint(5, 9))
        + "</p></div>"
    )
    html = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title} | Example Site</title>"
        '<script>var trackingId="x42";analytics.init();</script>'
        "<style>body{margin:0}.advert{color:red}</style>"
        "</head><body>"
        '<header><div class="logo">Example Site</div>'
        f"<nav><ul>{_nav_links(rng, rng.randint(5, 9))}</ul></nav></header>"
        '<div class="breadcrumbs"><a href="/">Home</a> &gt; <a href="/s">Section</a></div>'
        f"<main><article><h1>{title}</h1>"
        f"{body_paras}{list_html}{table_html}"
        "</article></main>"
        f'<aside class="sidebar"><h3>Related posts</h3><ul>{sidebar_links}</ul>{ad}</aside>'
        f"{comments}"
        '<footer><p>© 2025 Example Site — <a href="/privacy">Privacy</a>'
        ' <a href="/terms">Terms</a></p></footer>'
        "</body></html>"
    )
    return html.encode("utf-8")


def _build_pdf(rng: random.Random) -> bytes:
    """Minimal valid single-column PDF with uncompressed content
    streams, one stream per page (reference pattern:
    ``tests/conftest.py:20-59``)."""
    n_pages = rng.randint(1, 3)
    page_streams: list[bytes] = []
    for _ in range(n_pages):
        title = _sentence(rng, _VOCAB, rng.randint(3, 5)).rstrip(".")
        parts = [f"BT /F1 24 Tf 72 720 Td ({_esc(title)}) Tj ET"]
        y = 680
        for _ in range(rng.randint(2, 4)):
            n_lines = rng.randint(2, 4)
            parts.append(f"BT /F1 12 Tf 72 {y} Td 16 TL")
            for j in range(n_lines):
                line = _sentence(rng, _VOCAB, rng.randint(5, 9))
                parts.append(f"({_esc(line)}) Tj T*" if j < n_lines - 1 else f"({_esc(line)}) Tj")
                y -= 16
            parts.append("ET")
            y -= 30  # block gap > 1.6 * 12
        page_streams.append("\n".join(parts).encode("latin-1"))

    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    font_obj_num = 3 + 2 * n_pages
    for i, stream in enumerate(page_streams):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 {font_obj_num} 0 R >> >> >>"
            ).encode()
        )
        # ~half the streams Flate-compressed, like real-world PDFs
        if rng.random() < 0.5:
            import zlib

            deflated = zlib.compress(stream)
            objs.append(
                f"<< /Length {len(deflated)} /Filter /FlateDecode >>\nstream\n".encode()
                + deflated
                + b"\nendstream"
            )
        else:
            objs.append(
                f"<< /Length {len(stream)} >>\nstream\n".encode()
                + stream
                + b"\nendstream"
            )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _crawler_text(rng: random.Random, raw: bytes) -> str | None:
    """Crawler-provided text column: a lossy strip, NOT the target;
    nullable (FIXTURES.md §1)."""
    if rng.random() < 0.2:
        return None
    import re as _re

    txt = _re.sub(rb"<[^>]+>", b" ", raw[:4000])
    return _re.sub(rb"\s+", b" ", txt).strip().decode("utf-8", "replace")[:500]


def generate_pages(n_docs: int, seed: int = 42) -> list[dict]:
    """Generate ``n_docs`` deterministic page rows."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for i in range(n_docs):
        roll = rng.random()
        if roll < 0.30:
            host = SKEWED_HOST
        else:
            host = f"host-{rng.randint(0, max(1, n_docs // 3))}.example.org"
        lang = "de" if rng.random() < 0.15 else "en"
        kind_roll = rng.random()
        if kind_roll < 0.88:
            path_ext = "html"
            content = _build_html(rng, lang)
        elif kind_roll < 0.96:
            path_ext = "pdf"
            content = _build_pdf(rng)
        else:
            # malformed: empty / truncated html / junk binary
            path_ext = "html"
            bad = rng.randint(0, 2)
            if bad == 0:
                content = b""
            elif bad == 1:
                content = _build_html(rng, lang)[: rng.randint(10, 80)]
            else:
                content = bytes(rng.randrange(256) for _ in range(rng.randint(16, 64)))
        url = f"https://{host}/page/{i:08d}.{path_ext}"
        warc_ts = _EPOCH + timedelta(seconds=rng.randint(0, 86400 * 30))
        rows.append(
            {
                "url": url,
                "warc_ts": warc_ts,
                "html": content,
                "text": _crawler_text(rng, content) if content else None,
                "lang": lang,
            }
        )
    return rows


def _rows_to_table(rows: list[dict]):
    import pyarrow as pa

    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def write_pages_parquet(path: str, n_docs: int, seed: int = 42, n_files: int = 1) -> int:
    """Write the corpus via pyarrow (Spark-free, so the pytest oracle
    can build fixtures without a JVM).

    ``n_files > 1`` writes a directory of part files — the local
    emulation of how a crawl actually arrives (many WARC-derived
    files), so Spark's scan parallelizes without a repartition shuffle.
    """
    import os

    import pyarrow.parquet as pq

    rows = generate_pages(n_docs, seed)
    if n_files <= 1:
        pq.write_table(_rows_to_table(rows), path)
    else:
        os.makedirs(path, exist_ok=True)
        per = (len(rows) + n_files - 1) // n_files
        for i in range(n_files):
            chunk = rows[i * per : (i + 1) * per]
            if chunk:
                pq.write_table(
                    _rows_to_table(chunk), os.path.join(path, f"part-{i:05d}.parquet")
                )
    return len(rows)
