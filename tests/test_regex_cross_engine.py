"""Cross-engine regex dialect pinning: the PII patterns (and the other
shared regexes) must match identically under Java regex (Spark) and
RE2 (DuckDB) — the whole q41 contract rests on that. Adversarial
inputs cover the dialect corners: word boundaries next to unicode,
quantifier greediness, character-class escapes, overlapping candidates.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ai_pdf_extraction_spark.operators.scrub import EMAIL_RE, IP_RE, PHONE_RE

ADVERSARIAL = [
    "plain text with nothing",
    "a@b.co x@y.museum trailing@dot. not@tld",
    "overlap: a@b.com@c.com chained",
    "ip edges 1.2.3.4 999.999.999.999 1.2.3.4.5 00.00.00.00",
    "ip in word x1.2.3.4y and bounded 1.2.3.4 end",
    "phone +1 (555) 010-4477 short 12345 long 123 456 789 012",
    "mixed jane@ex.com at 10.0.0.7 call +44 20 7946 0958 now",
    "unicode müller@straße.de naïve 1.2.3.4 ünïcode",
    "punct .a@b.cc, (x@y.zz) [1.1.1.1] {+1 555-010-1234}",
    "digits-only 1234567890123 and dotted 1.2 1.2.3",
    "email+tag user+tag@sub.domain.org and percent us%er@d.io",
    "tab\tand\nnewline 3.3.3.3\nnext@line.com",
    # \x0B sits inside Java's \s but outside RE2's — the PII patterns
    # are deliberately \s-free (scrub.py), and this input keeps any
    # future edit that introduces \s failing here first
    "vtab\x0bsplit a@b.io\x0b1.2.3.4 +1 555\x0b010 1234",
    "",
]


@pytest.mark.parametrize("pattern", [EMAIL_RE, IP_RE, PHONE_RE])
def test_pii_regex_same_matches_both_engines(spark, pattern):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(ADVERSARIAL)],
                               "i long, s string")
    spark_counts = {
        r["i"]: r["n"]
        for r in df.select("i", F.regexp_count("s", F.lit(pattern)).alias("n")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(ADVERSARIAL):
        duck_n = con.execute(
            "select len(regexp_extract_all(?, ?))", [s, pattern]
        ).fetchone()[0]
        assert spark_counts[i] == duck_n, (pattern, i, ADVERSARIAL[i])


def test_scrub_output_identical_both_engines(spark):
    """Full sequential scrub (email → ip → phone) byte-identical."""
    from ai_pdf_extraction_spark.operators.scrub import scrub_pii

    df = spark.createDataFrame([(i, s) for i, s in enumerate(ADVERSARIAL)],
                               "i long, s string")
    spark_out = {
        r["i"]: r["t"] for r in df.select("i", scrub_pii("s").alias("t")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(ADVERSARIAL):
        duck_t = con.execute(
            """select regexp_replace(regexp_replace(regexp_replace(?,
                 ?, '<EMAIL>', 'g'), ?, '<IP>', 'g'), ?, '<PHONE>', 'g')""",
            [s, EMAIL_RE, IP_RE, PHONE_RE],
        ).fetchone()[0]
        assert spark_out[i] == duck_t, (i, ADVERSARIAL[i])


# --- the \x0B / trailing-\r divergence class (round-7 sweep) --------
# Java \s includes \x0B, RE2's does not; Java's non-multiline $ also
# matches before a final line terminator, RE2's does not. Every shared
# constant was moved onto explicit [ \t\r\n\f] classes and \z anchors;
# these pins run the HOSTILE bytes through both engines so a future
# edit that reintroduces \s or $ fails here, not in production.

_R7_HOSTILE = [
    "line ends with vtab.\x0b",
    "line ends with cr.\r",
    "Sitemap\x0b: https://a.com/x.xml",
    "User-agent\x0b: *",
    "clean sentence stays here ok.",
    "<a\x0bhref=\"/x\">v</a><a href=\"/y\">k</a>",
    "<loc>\x0bhttps://h.com/a</loc>",
]


def _both_engine_counts(spark, pattern, texts):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "i long, s string"
    )
    sc = {
        r["i"]: r["n"]
        for r in df.select(
            "i", F.regexp_count("s", F.lit(pattern)).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    dc = {
        i: con.execute(
            "select len(regexp_extract_all(?, ?))", [s, pattern]
        ).fetchone()[0]
        for i, s in enumerate(texts)
    }
    return sc, dc


def test_r7_explicit_class_regexes_match_identically(spark):
    from ai_pdf_extraction_spark.operators.links import (
        ANCHOR_RE,
        SKIP_SCHEME_RE,
    )
    from ai_pdf_extraction_spark.operators.robots import (
        _DELAY_RE,
        _RULE_RE,
        _SITEMAP_RE,
        _UA_RE,
    )
    from ai_pdf_extraction_spark.operators.text_analysis import (
        C4_TERMINAL_RE,
        CHARSET_META_RE,
    )

    for pattern in (
        ANCHOR_RE,
        SKIP_SCHEME_RE,
        _UA_RE,
        _RULE_RE,
        _DELAY_RE,
        _SITEMAP_RE,
        C4_TERMINAL_RE,
        CHARSET_META_RE,
        r"<loc>[ \t\r\n\f]*(.*?)[ \t\r\n\f]*</loc>",
    ):
        sc, dc = _both_engine_counts(spark, pattern, _R7_HOSTILE)
        assert sc == dc, pattern


def test_r7_divergent_spellings_would_fail_here(spark):
    """Control: the OLD spellings really do diverge on these bytes —
    proving the pin has teeth."""
    sc, dc = _both_engine_counts(
        spark, r"(?i)^sitemap\s*:", _R7_HOSTILE
    )
    assert sc != dc  # Java matches the \x0B variant, RE2 does not
    sc, dc = _both_engine_counts(spark, r"[.!?]\"?$", _R7_HOSTILE)
    assert sc != dc  # Java's $ matches before the trailing \r
