"""spark-submit entrypoint for the crawl-frontier loop.

The production shape of ``operators/urls`` + ``sources/seen_urls``
(round-7): seed the at-rest seen-set from the already-crawled corpus
once, then per discovery batch probe it (canonicalize, collapse
within-batch dups, broadcast-semi against the seen side — the
historical set is never shuffled), emit the per-host-capped frontier,
and append the scheduled urls so the next cycle skips them. Deferred
urls (over the host cap) were never appended and resurface in the
next probe. Reference analogue: ingest-time duplicate rejection
(``routers/batches.py:381``) moved BEFORE the fetch.

Usage::

    python tools/make_pyfiles_zip.py /tmp/engine.zip
    # seed the seen-set from already-canonical urls
    spark-submit --master local[32] --py-files /tmp/engine.zip \
        jobs/frontier_job.py seed --urls <parquet with canon_url> \
        --seen <seen dir>
    # per discovery batch: probe, cap, emit, append
    spark-submit ... jobs/frontier_job.py probe --new <parquet with \
        (event_id, url)> --seen <seen dir> --output <frontier dir> \
        [--per-host 1000] [--no-append]

``probe`` writes the capped frontier (canon_url, host, first_id,
pick_rank) under ``--output`` and, unless ``--no-append``, appends the
SCHEDULED urls to the seen-set (atomic manifest rewrite — a killed job
leaves the set unchanged and the re-run probe is idempotent).

Same contract as the other jobs: public package API only, submits
unchanged to a real cluster.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(description="crawl-frontier jobs")
    sub = parser.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("seed", help="seed the seen-set")
    s.add_argument("--urls", required=True, help="parquet with canon_url")
    s.add_argument("--seen", required=True)

    p = sub.add_parser("probe", help="probe a discovery batch")
    p.add_argument("--new", required=True, help="parquet with (event_id, url)")
    p.add_argument("--seen", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--per-host", type=int, default=1000)
    p.add_argument("--no-append", action="store_true")
    args = parser.parse_args()

    from ai_pdf_extraction_spark.operators.urls import frontier_host_cap
    from ai_pdf_extraction_spark.session import build_session
    from ai_pdf_extraction_spark.sources.seen_urls import (
        append_seen_set,
        frontier_from_seen_set,
        write_seen_set,
    )

    spark = build_session(app_name=f"frontier-{args.cmd}")
    if args.cmd == "seed":
        manifest = write_seen_set(spark.read.parquet(args.urls), args.seen)
        print(json.dumps({"n_urls": manifest["n_urls"]}))
    else:
        fr = frontier_from_seen_set(
            spark, args.seen, spark.read.parquet(args.new)
        )
        capped = frontier_host_cap(fr, per_host=args.per_host)
        capped.write.mode("overwrite").parquet(args.output)
        # counts read back the just-written parquet — recounting the
        # lazy plan would re-run the probe
        scheduled = spark.read.parquet(args.output)
        summary = {"scheduled": scheduled.count()}
        if not args.no_append:
            manifest = append_seen_set(
                spark, args.seen, scheduled, assume_unseen=True
            )
            summary["seen_n_urls"] = manifest["n_urls"]
        print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
