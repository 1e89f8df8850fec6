"""Typed-value normalizers as Column builders (SURVEY.md §2.7).

Each mirrors a validator in the reference's post-extraction
normalization pass (``app/backend/services/ai/validation.py:400-566``)
with semantics pinned by the reference's own unit tests
(``tests/test_ai_service.py``, transliterated in
``/root/repo/tests/test_normalize.py``). All are pure Catalyst Column
expressions — whole-stage-codegen'd, no Python on the hot path.

Spark 4 runs ANSI mode by default, so every cast is a ``try_cast``
(malformed input → null + warning downstream, never a task failure —
the reference's per-value warning behavior, ``validation.py:490-497``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_currency(col: Column | str) -> Column:
    """Currency string → double (``validation.py:34-82``).

    Strips currency symbols/whitespace, then disambiguates EU
    ``1.234,56`` vs US ``1,234.56`` by which separator occurs last;
    a lone comma followed by 1-2 trailing digits is a decimal comma.
    Pinned vectors (``tests/test_ai_service.py:20-57``):
    ``$1,234.56→1234.56  €1.234,56→1234.56  1234,56→1234.56
    ¥1000→1000.0  ""/None/"not a number"→null``.
    """
    # NOTE on the lone-comma rule: ',d' AND ',dd' endings are decimal
    # commas here ('1234,5' → 1234.5). This matches the reference's
    # PRIMARY path (price-parser, validation.py:56-60, which treats a
    # non-3-digit trailing comma group as decimal); the reference's
    # regex FALLBACK (validation.py:72-77, only reached when
    # price-parser fails) would require exactly 2 trailing digits.
    # Pinned by test_parse_currency_lone_comma_decimal.
    s = F.regexp_replace(_c(col).cast("string"), r"[^0-9.,\-]", "")
    rev = F.reverse(s)
    pos_dot = F.instr(rev, ".")  # distance of LAST '.' from the end (0 = absent)
    pos_com = F.instr(rev, ",")
    n_com = F.length(s) - F.length(F.regexp_replace(s, ",", ""))

    eu = F.regexp_replace(F.translate(s, ".", ""), ",", ".")  # comma-decimal
    us = F.translate(s, ",", "")  # dot-decimal / plain

    normalized = (
        F.when(s == "", F.lit(None).cast("string"))
        .when((pos_dot > 0) & (pos_com > 0), F.when(pos_com < pos_dot, eu).otherwise(us))
        .when(
            (pos_com > 0) & (n_com == 1) & (pos_com <= 3),  # ",d" or ",dd" at end
            eu,
        )
        .when(pos_com > 0, us)  # thousands commas
        .otherwise(us)
    )
    return normalized.try_cast("double")


# Currency-token detection (the symbol/ISO half of price-parser that
# parse_currency's numeric path drops — reference validation.py:34-82
# gets it free from Price.fromstring().currency). ISO codes match on
# word boundaries; multi-char symbol prefixes (US$, R$) before bare $.
_ISO_CODES = (
    "USD|EUR|GBP|JPY|CHF|CAD|AUD|NZD|CNY|HKD|SGD|SEK|NOK|DKK|PLN|INR|"
    "BRL|MXN|RUB|KRW|TRY|ZAR"
)
_SYMBOLS = r"US\$|R\$|C\$|A\$|NZ\$|HK\$|S\$|\$|€|£|¥|₹|₩|₽|¢"
_CURRENCY_TOKEN_RE = rf"(\b(?:{_ISO_CODES})\b|{_SYMBOLS})"

# Unambiguous symbol → ISO 4217. '$' resolves to USD (price-parser's
# own default locale bias) and '¥' to JPY — documented guesses for the
# genuinely ambiguous glyphs; '¢' stays unmapped (a subunit, not a
# currency).
_SYMBOL_TO_ISO = {
    "US$": "USD",
    "$": "USD",
    "€": "EUR",
    "£": "GBP",
    "¥": "JPY",
    "₹": "INR",
    "₩": "KRW",
    "₽": "RUB",
    "R$": "BRL",
    "C$": "CAD",
    "A$": "AUD",
    "NZ$": "NZD",
    "HK$": "HKD",
    "S$": "SGD",
}


def detect_currency(col: Column | str) -> Column:
    """First currency token in the string, verbatim ('€', 'US$',
    'USD') — prefix and SUFFIX positions both match ('1.234,56 €').
    Null when nothing matches (plain numbers stay code-less)."""
    tok = F.regexp_extract(_c(col).cast("string"), _CURRENCY_TOKEN_RE, 1)
    return F.when(tok == "", F.lit(None).cast("string")).otherwise(tok)


def currency_code(col: Column | str) -> Column:
    """ISO-4217 companion column for :func:`parse_currency`: a
    detected ISO code passes through; unambiguous symbols map via
    ``_SYMBOL_TO_ISO``; anything else (no token, unmapped symbol) is
    null. Pure Column expressions — the numeric path is untouched."""
    tok = detect_currency(col)
    mapped = F.when(tok.rlike(f"^(?:{_ISO_CODES})$"), tok)  # else null
    for sym, iso in _SYMBOL_TO_ISO.items():
        mapped = F.when(tok == sym, F.lit(iso)).otherwise(mapped)
    return mapped


def parse_date(col: Column | str) -> Column:
    """Date string → DateType (``validation.py:85-135``).

    ISO first; US ``MM/dd/yyyy`` before EU ``dd/MM/yyyy`` (ambiguous
    dates resolve US — reference tries US regex first); then written
    forms with the breadth of the reference's ``dateutil.parser``
    fallback (``validation.py:129-135``): ordinal days (``Jan 15th,
    2024``), hyphenated month names (``15-Jan-2024``), dotted numerics
    (``2024.01.15``, month-first preferred like dateutil), any month
    case. Unparseable → null (caller keeps the raw string + warning,
    ``validation.py:490-497``). Vectors: ``2024-01-15``, ``01/15/2024``
    and ``15/01/2024`` → 2024-01-15, ``January 15, 2024`` → 2024-01-15,
    ``32/13/2024`` → null (``tests/test_ai_service.py:59-88``).
    """
    raw = F.trim(_c(col).cast("string"))
    # dateutil accepts ordinal day suffixes — strip them first
    c = F.regexp_replace(raw, r"(?i)\b(\d{1,2})(st|nd|rd|th)\b", "$1")
    # month names case-insensitively (dateutil is); Java formatters are
    # strict, so canonicalize: initcap space-separated words, and a
    # hyphens→spaces variant for 15-Jan-2024-style forms (safe: all
    # pure-numeric hyphen forms matched earlier in the coalesce)
    cap = F.initcap(c)
    spaced = F.initcap(F.translate(c, "-", " "))
    # single-letter numeric patterns (M/d) accept 1 OR 2 digits, so
    # '1/5/2024' and '2024-1-5' parse like dateutil does; MM/dd would
    # silently null them
    return F.coalesce(
        F.try_to_date(c, "yyyy-M-d"),
        F.try_to_date(c, "M/d/yyyy"),
        F.try_to_date(c, "d/M/yyyy"),
        F.try_to_date(cap, "MMMM d, yyyy"),
        F.try_to_date(cap, "MMM d, yyyy"),
        F.try_to_date(cap, "d MMMM yyyy"),
        F.try_to_date(cap, "d MMM yyyy"),
        F.try_to_date(cap, "MMMM d yyyy"),
        F.try_to_date(cap, "MMM d yyyy"),
        F.try_to_date(c, "yyyy/M/d"),
        F.try_to_date(c, "yyyy.M.d"),
        F.try_to_date(c, "M.d.yyyy"),
        F.try_to_date(c, "d.M.yyyy"),
        F.try_to_date(spaced, "d MMM yyyy"),
        F.try_to_date(spaced, "MMM d yyyy"),
        F.try_to_date(spaced, "d MMMM yyyy"),
        F.try_to_date(spaced, "MMMM d yyyy"),
    )


def parse_number(col: Column | str) -> Column:
    """Number string → double; strips thousands commas
    (``validation.py:511-525``)."""
    return F.regexp_replace(F.trim(_c(col).cast("string")), ",", "").try_cast("double")


_TRUE_WORDS = ("true", "yes", "y", "1", "on")
_FALSE_WORDS = ("false", "no", "n", "0", "off")


def parse_boolean(col: Column | str) -> Column:
    """Boolean coercion (``validation.py:527-539``): true/yes/y/1/on →
    true; false/no/n/0/off → false; anything else → null (warn)."""
    v = F.lower(F.trim(_c(col).cast("string")))
    return (
        F.when(v.isin(*_TRUE_WORDS), F.lit(True))
        .when(v.isin(*_FALSE_WORDS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def parse_percentage(col: Column | str) -> Column:
    """Percentage string → double, '%' stripped (``validation.py:547-556``)."""
    return F.regexp_replace(F.trim(_c(col).cast("string")), r"[%\s]", "").try_cast(
        "double"
    )


def is_valid_email(col: Column | str) -> Column:
    """Reference's email check is exactly "contains '@'"
    (``validation.py:541-545``)."""
    return _c(col).contains("@")


def normalize_field_name(col: Column | str) -> Column:
    """Field-name normalization (``models.py:63-71``): lowercase,
    ``-``→``_``, strip anything not alnum/underscore."""
    return F.regexp_replace(
        F.translate(F.lower(_c(col).cast("string")), "-", "_"), r"[^a-z0-9_]", ""
    )


def clean_null_from_array(col: Column | str) -> Column:
    """Drop nulls from a FLAT array — the single-level case of the
    reference's "List Stutter" fix (``validation.py:138-154``). For
    nested payloads use :func:`clean_null_from_arrays_deep`."""
    return F.filter(_c(col), lambda x: x.isNotNull())


def clean_null_from_arrays_deep(col: Column | str, dtype) -> Column:
    """Recursive "List Stutter" fix (``validation.py:138-154``): drop
    null items from every array at every nesting level of a complex
    column, driven by its DataType (arrays filter then recurse into
    elements; maps/structs recurse into values/fields; atoms pass
    through). Pure Column expressions — identity wraps are skipped so
    simple element types add no HOF layer."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _complex(dt) -> bool:
        return isinstance(dt, (ArrayType, MapType, StructType))

    def _walk(c: Column, dt) -> Column:
        if isinstance(dt, ArrayType):
            cleaned = F.filter(c, lambda x: x.isNotNull())
            if _complex(dt.elementType):
                return F.transform(cleaned, lambda x: _walk(x, dt.elementType))
            return cleaned
        if isinstance(dt, MapType):
            if _complex(dt.valueType):
                return F.transform_values(c, lambda _k, v: _walk(v, dt.valueType))
            return c
        if isinstance(dt, StructType):
            if not any(_complex(f.dataType) for f in dt.fields):
                return c
            return F.struct(
                *[_walk(c[f.name], f.dataType).alias(f.name) for f in dt.fields]
            )
        return c

    return _walk(_c(col), dtype)


def required_empty_warning(
    col: Column | str, field_name: str, present: Column | None = None
) -> Column:
    """Warn iff a required value is EXPLICITLY null or empty string —
    missing keys are trusted (``validation.py:441-445`` checks
    ``if field.name in extracted_fields`` before the null/empty test).

    A Column over a bare VALUE cannot tell "key absent" from "key
    present with null", so callers that have presence information (a
    JSON document parsed to a map — see ``apply_schema``) pass it as
    ``present``; the warning then additionally requires presence.
    Without ``present`` the value-only rule applies (null/'' warns),
    which is correct when the input relation has no missing-key state
    (e.g. a typed column that always exists)."""
    c = _c(col)
    empty = c.isNull() | (c.cast("string") == "")
    cond = empty if present is None else (present & empty)
    return F.when(
        cond,
        F.array(F.lit(f"Required field '{field_name}' is empty")),
    ).otherwise(F.array().cast("array<string>"))


def round_confidence(col: Column | str) -> Column:
    """Confidence scores round to 3 decimals (``models.py:186-199``)."""
    return F.round(_c(col), 3)
