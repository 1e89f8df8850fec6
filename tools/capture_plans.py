"""Capture ``explain("formatted")`` for a list of queries against a
given repo root (HEAD or a round-start worktree) — the plan evidence
committed under ``plans/r08/``.

Usage: python tools/capture_plans.py <repo_root> <out_dir> <suffix> q.. q..
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo_root, out_dir, suffix = sys.argv[1:4]
    queries = sys.argv[4:]
    sys.path.insert(0, repo_root)
    os.makedirs(out_dir, exist_ok=True)

    from ai_pdf_extraction_spark.session import build_session

    spark = build_session(
        app_name=f"capture_plans_{suffix}",
        master="local[8]",
        shuffle_partitions=64,
    )
    import __spark_entry__ as entrymod

    assert entrymod.__file__.startswith(repo_root), entrymod.__file__
    qs = entrymod.queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CONTRACT_SF", sf)
    for name in queries:
        try:
            df = qs[name](spark, sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture must not die on one query
            txt = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print("captured", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
