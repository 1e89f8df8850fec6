"""spark-submit entrypoint for the curation pass (the training-data
side of the engine — quality gate + exact dedup + LSH near-dup drop).

Usage::

    python tools/make_pyfiles_zip.py /tmp/engine.zip
    spark-submit --master local[32] --py-files /tmp/engine.zip \
        jobs/curate_job.py --input <documents parquet> \
        --output <curated parquet dir> \
        [--quality 0.5] [--jaccard 0.8] [--partitions 64] \
        [--benchmark <eval parquet> [--contamination-n 13]] \
        [--embeddings <vec parquet> [--cos-threshold 0.95]]  # v3 pass

Same contract as ``extract_job``: public package API only, so the
file submits unchanged to a real cluster.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(description="run the corpus curation pass")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--quality", type=float, default=0.5)
    parser.add_argument("--jaccard", type=float, default=0.8)
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument(
        "--benchmark",
        default=None,
        help="parquet of (bench_id, text) eval items — those exact column "
        "names; when given, runs the v2 pass (adds decontamination + "
        "granule-dedup stats)",
    )
    parser.add_argument("--contamination-n", type=int, default=13)
    parser.add_argument(
        "--embeddings",
        default=None,
        help="parquet of (vec_id, embedding) keyed like the doc ids; with "
        "--benchmark, runs the v3 pass (adds semantic embedding dedup via "
        "the sign-LSH bucketed pair search)",
    )
    parser.add_argument("--cos-threshold", type=float, default=0.95)
    parser.add_argument(
        "--dim", type=int, default=64,
        help="embedding dimension (the v3 sign-LSH planes are built for "
        "it; a mismatch fails loud)",
    )
    args = parser.parse_args()

    from ai_pdf_extraction_spark.plans.curate import (
        curated_corpus,
        curated_corpus_v2,
        curated_corpus_v3,
    )
    from ai_pdf_extraction_spark.session import build_session

    spark = build_session(app_name="curate")
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    if args.benchmark and args.embeddings:
        curated = curated_corpus_v3(
            docs,
            spark.read.parquet(args.benchmark),
            spark.read.parquet(args.embeddings),
            quality_threshold=args.quality,
            jaccard_threshold=args.jaccard,
            contamination_n=args.contamination_n,
            cos_threshold=args.cos_threshold,
            dim=args.dim,
        )
    elif args.embeddings:
        raise SystemExit("--embeddings requires --benchmark (the v3 pass)")
    elif args.benchmark:
        curated = curated_corpus_v2(
            docs,
            spark.read.parquet(args.benchmark),
            quality_threshold=args.quality,
            jaccard_threshold=args.jaccard,
            contamination_n=args.contamination_n,
        )
    else:
        curated = curated_corpus(
            docs,
            quality_threshold=args.quality,
            jaccard_threshold=args.jaccard,
        )
    writer = curated.repartition(args.partitions) if args.partitions else curated
    writer.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    print(
        json.dumps(
            {
                "docs_in": n_in,
                "docs_kept": out.count(),
                "mean_quality": round(
                    out.agg({"quality": "avg"}).collect()[0][0] or 0.0, 4
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
