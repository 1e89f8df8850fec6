"""HTML outlink + metadata extraction — the extraction→webgraph bridge.

The reference's HTML pass measures anchor density for its boilerplate
classifier (`extractors/html_extractor.py` link-text-ratio) but never
EMITS the hyperlinks; a web-scale pipeline needs the outlink relation
itself — it is the input to the host graph (``operators/graphs``), to
crawl discovery (each outlink is a frontier candidate), and to
anchor-text aggregation (the classic off-page relevance signal).

Everything here is pure Column work (regexp over the raw HTML inside
the scan, zero Python in the hot path) with exact DuckDB-SQL twins —
the regexes are shared constants and deliberately stay inside the
Java-regex ∩ RE2 common subset (lazy quantifiers, ``(?s)``, character
classes; no backreferences, no lookaround).

Documented downscope (the robots/sitemap discipline): double-quoted
``href`` attributes only; dot-segment (``../``) resolution is out of
scope — the canonicalizer collapses duplicate slashes but does not
rewrite ``a/../b``; ``<base href>`` is ignored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ai_pdf_extraction_spark.operators.urls import (
    _xml_decode,
    host_of,
    with_canonical_url,
)

#: NOTE every pattern below uses [ \t\r\n\f] where prose says
#: 'whitespace': Java \s includes \x0B, RE2's does not — with the
#: regexes SPLICED into the oracles, the explicit class keeps the
#: two engines byte-equivalent in meaning (q97 divergence class)
#: one match per ``<a ... href="...">text</a>`` — group 1 the href,
#: group 2 the raw inner markup. ``[^>]*`` keeps the match inside the
#: opening tag; ``(?s)`` + lazy ``(.*?)`` lets anchor text span lines
#: and nested inline tags. Valid and equivalent in Java regex (Spark)
#: and RE2 (DuckDB) — keep the oracle in lockstep.
ANCHOR_RE = r'(?s)<a[ \t\r\n\f][^>]*href="([^"]*)"[^>]*>(.*?)</a>'

#: absolute-url test (scheme followed by ``://``)
ABS_URL_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"

#: non-navigational schemes dropped before resolution
SKIP_SCHEME_RE = r"(?i)^(javascript|mailto|tel|data):"


def _clean_anchor(col: Column) -> Column:
    """Anchor markup → display text: strip inner tags FIRST (so a
    decoded ``&lt;`` survives as literal text), then entity-decode,
    collapse all whitespace runs to one space, trim. After the
    collapse every whitespace char is a plain space, so the
    space-only ``F.trim`` / DuckDB ``trim`` pair is safe (the CRLF
    trim hazard doesn't apply)."""
    c = F.regexp_replace(col, r"<[^>]*>", "")
    c = _xml_decode(c)
    c = F.regexp_replace(c, r"[ \t\r\n\f]+", " ")
    return F.trim(c)


def resolve_href(base: Column | str, href: Column | str) -> Column:
    """RFC-3986 subset resolution of ``href`` against the page url
    ``base`` — NULL for non-navigational hrefs (empty, fragment-only,
    ``javascript:``/``mailto:``/``tel:``/``data:``).

    Four legs, in test order: already-absolute → kept; ``//host/…``
    protocol-relative → page scheme prepended; ``/path`` root-relative
    → page origin prepended; anything else → resolved against the
    page's directory (query/fragment stripped, then everything up to
    the last ``/``; a path-less base falls back to ``origin/``).
    Dot-segments are NOT rewritten (documented downscope)."""
    b = F.col(base) if isinstance(base, str) else base
    h = F.col(href) if isinstance(href, str) else href
    origin = F.regexp_extract(
        b, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1
    )
    scheme = F.regexp_extract(b, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    base_noq = F.regexp_replace(b, r"[?#].*$", "")
    basedir = F.when(
        base_noq.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*/"),
        F.regexp_extract(base_noq, r"^(.*/)", 1),
    ).otherwise(F.concat(origin, F.lit("/")))
    return (
        F.when(
            (h == "") | h.startswith("#") | h.rlike(SKIP_SCHEME_RE),
            F.lit(None).cast("string"),
        )
        .when(h.rlike(ABS_URL_RE), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(basedir, h))
    )


def extract_outlinks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Page-level hyperlink extraction: one ``(src_url, dst_url,
    anchor)`` row per ``<a href="…">`` in the raw HTML, hrefs
    entity-decoded, resolved against the page url (:func:`resolve_href`
    subset) and canonicalized; anchor markup reduced to clean display
    text. Anchors without an href and non-navigational hrefs are
    dropped.

    Scale shape: regexp_extract_all + arrays_zip + one explode — all
    narrow, inside the scan, zero shuffle; the fan-out is bounded by
    links-per-page, so a 10^12-page crawl is one embarrassingly
    parallel pass whose output feeds ``graphs.host_edges`` (the only
    shuffle lives there, after map-side combine). The two
    ``regexp_extract_all`` calls are projected into their own step
    before the zip — the HOF no-CSE rule: zipping the inlined
    expressions would re-run both regex passes per element.
    Canonicalization uses the staged-projection df-level form
    (:func:`~ai_pdf_extraction_spark.operators.urls.with_canonical_url`)
    to keep the optimized plan linear.

    ``passthrough`` carries provenance columns (doc_id, fetch epoch…)
    from ``pages`` onto every emitted link row — at 10^12 pages the
    discovery loop needs the discoverer id ON the link, not a
    join-back against the page relation."""
    pt = list(passthrough)
    raw = pages.select(
        *pt,
        F.col(url_col).alias("src_url"),
        F.regexp_extract_all(
            F.col(html_col), F.lit(ANCHOR_RE), 1
        ).alias("_hrefs"),
        F.regexp_extract_all(
            F.col(html_col), F.lit(ANCHOR_RE), 2
        ).alias("_texts"),
    )
    z = raw.select(
        *pt,
        "src_url",
        F.explode(F.arrays_zip("_hrefs", "_texts")).alias("_a"),
    ).select(
        *pt,
        "src_url",
        _xml_decode(F.col("_a._hrefs")).alias("_href"),
        _clean_anchor(F.col("_a._texts")).alias("anchor"),
    )
    resolved = z.select(
        *pt,
        "src_url",
        resolve_href("src_url", "_href").alias("_resolved"),
        "anchor",
    ).filter(F.col("_resolved").isNotNull())
    return with_canonical_url(resolved, "_resolved", out="dst_url").select(
        *pt, "src_url", "dst_url", "anchor"
    )


def anchor_stats(edges: DataFrame) -> DataFrame:
    """Inbound anchor-text aggregation per link target — the off-page
    signal search and quality pipelines key on (anchor text describes
    the TARGET): ``(dst_url, n_links, n_srcs, top_anchor,
    top_anchor_links)`` where ``top_anchor`` is the most frequent
    inbound anchor text, ties broken lexicographically-smaller.

    Two partial-agg legs over the edge relation, both keyed on
    ``dst_url`` so AQE coalesces them onto one exchange shape:
    (dst, anchor) counts → exact integer argmax via ``min(struct(-n,
    anchor))`` (the q97 rule — no window, no float), and (dst, src)
    distinct → src fan-in. The caller is expected to pass a persisted
    ``edges`` when it is itself an extraction plan — two consumers of
    an unpersisted fan-out splice the full upstream expression tree
    per leg (the q88 lesson)."""
    per_anchor = edges.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    top = per_anchor.groupBy("dst_url").agg(
        F.sum("n").alias("n_links"),
        F.min(F.struct((-F.col("n")).alias("neg"), "anchor")).alias(
            "_t"
        ),
    )
    srcs = (
        edges.select("dst_url", "src_url")
        .distinct()
        .groupBy("dst_url")
        .agg(F.count(F.lit(1)).alias("n_srcs"))
    )
    return top.join(srcs, "dst_url").select(
        "dst_url",
        "n_links",
        "n_srcs",
        F.col("_t.anchor").alias("top_anchor"),
        (-F.col("_t.neg")).alias("top_anchor_links"),
    )


#: title / meta / canonical extraction regexes (attribute order fixed
#: to the common serialization — documented subset, like the
#: double-quoted-href rule)
TITLE_RE = r"(?s)<title>[ \t\r\n\f]*(.*?)[ \t\r\n\f]*</title>"
META_DESC_RE = r'<meta[ \t\r\n\f]+name="description"[ \t\r\n\f]+content="([^"]*)"'
OG_TITLE_RE = r'<meta[ \t\r\n\f]+property="og:title"[ \t\r\n\f]+content="([^"]*)"'
CANONICAL_RE = r'<link[ \t\r\n\f]+rel="canonical"[ \t\r\n\f]+href="([^"]*)"'


def extract_metadata(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Head-metadata extraction + safe canonical-link override.

    Emits per page: ``title`` (entity-decoded, whitespace-collapsed),
    ``meta_desc`` / ``og_title`` (NULL when absent), ``canonical_href``
    (raw attribute, NULL when absent), ``canonical_accepted`` and
    ``effective_url`` — the url the document should be keyed by
    downstream.

    The override rule is the cross-domain-hijack guard real pipelines
    apply: a ``rel=canonical`` pointing OFF the page's registered
    domain (public-suffix aware —
    :func:`~ai_pdf_extraction_spark.operators.urls.registered_domain`)
    is ignored; a same-registered-domain canonical (absolute or
    resolved relative) replaces the page url. Either way the winner is
    canonicalized, so ``effective_url`` is directly joinable against
    frontier / dedup keys. Pure Column work, zero shuffle."""
    from ai_pdf_extraction_spark.operators.urls import registered_domain

    title = F.regexp_extract(F.col(html_col), TITLE_RE, 1)
    meta_desc = F.regexp_extract(F.col(html_col), META_DESC_RE, 1)
    og_title = F.regexp_extract(F.col(html_col), OG_TITLE_RE, 1)
    canon_href = F.regexp_extract(F.col(html_col), CANONICAL_RE, 1)
    d = pages.select(
        "*",
        _clean_anchor(title).alias("title"),
        F.nullif(_xml_decode(meta_desc), F.lit("")).alias("meta_desc"),
        F.nullif(_xml_decode(og_title), F.lit("")).alias("og_title"),
        F.nullif(_xml_decode(canon_href), F.lit("")).alias(
            "canonical_href"
        ),
    )
    d = d.withColumn(
        "_canon_abs", resolve_href(url_col, "canonical_href")
    )
    d = d.withColumn(
        "canonical_accepted",
        F.col("_canon_abs").isNotNull()
        & (
            registered_domain(host_of("_canon_abs"))
            == registered_domain(host_of(F.col(url_col)))
        ),
    )
    d = d.withColumn(
        "_effective_raw",
        F.when(F.col("canonical_accepted"), F.col("_canon_abs")).otherwise(
            F.col(url_col)
        ),
    )
    return with_canonical_url(d, "_effective_raw", out="effective_url").drop(
        "_canon_abs", "_effective_raw"
    )
