"""spark-submit entrypoint for schema-registry application.

The production shape of the reference's "apply a saved schema to a
batch" flow (``routers/batches.py`` drives extraction with a selected
schema id): read a table carrying a JSON document column, resolve a
committed schema config by name (+optional version) from the in-repo
registry, compile it to the typed Catalyst projection
(``functions/schema_registry.apply_schema``), and write the typed
table. Because the projection is pure Column expressions it is also
stream-safe — pass ``--streaming`` to run the identical projection as
a Structured Streaming availableNow pass over a parquet directory
(the registry-on-a-stream twin).

Usage::

    python tools/make_pyfiles_zip.py /tmp/engine.zip
    spark-submit --master local[32] --py-files /tmp/engine.zip \
        jobs/schema_apply_job.py --input <parquet> --output <dir> \
        --schema invoice [--version 1] [--source-col doc] \
        [--keys id,url] [--streaming]

Same contract as ``extract_job``/``curate_job``: public package API
only, so the file submits unchanged to a real cluster.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(
        description="apply a versioned schema config as a typed projection"
    )
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--schema", required=True)
    parser.add_argument("--version", type=int, default=None)
    parser.add_argument("--source-col", default="doc")
    parser.add_argument("--keys", default="", help="comma-separated passthrough columns")
    parser.add_argument(
        "--streaming", action="store_true",
        help="run as a Structured Streaming availableNow pass "
        "(input is a parquet DIRECTORY; checkpoint under <output>/_checkpoint)",
    )
    args = parser.parse_args()

    from ai_pdf_extraction_spark.functions.schema_registry import (
        apply_schema,
        load_schema,
    )
    from ai_pdf_extraction_spark.session import build_session

    spark = build_session(app_name="schema-apply")
    schema = load_schema(args.schema, version=args.version)
    keys = [k for k in args.keys.split(",") if k]

    if args.streaming:
        batch_schema = spark.read.parquet(args.input).schema
        stream = spark.readStream.schema(batch_schema).parquet(args.input)
        typed = apply_schema(stream, schema, args.source_col, keys=keys)
        q = (
            typed.writeStream.format("parquet")
            .option("path", args.output)
            .option("checkpointLocation", f"{args.output}/_checkpoint")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(600)
        if not finished:
            # counting partial output as success would be silent data
            # loss at the job surface (review r6)
            q.stop()
            raise SystemExit(
                "streaming pass did not finish within 600s — rerun (the "
                "checkpoint resumes) or use the batch mode"
            )
        n = spark.read.parquet(args.output).count()
    else:
        typed = apply_schema(
            spark.read.parquet(args.input), schema, args.source_col, keys=keys
        )
        typed.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()

    print(
        json.dumps(
            {
                "schema": schema["name"],
                "version": schema["version"],
                "rows": n,
                "fields": [f["name"] for f in schema["fields"]],
                "streaming": bool(args.streaming),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
