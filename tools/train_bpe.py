"""Train the repo-committed BPE merge table (kernels/bpe_merges.json).

Trains on the deterministic synthetic documents table (sf0.001 — the
same generator seeds every sf, so the word distribution is identical)
using the public Sennrich BPE algorithm in ``kernels.bpe.train_bpe``.
No external weights; re-running reproduces the identical file.

Usage: python tools/train_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ai_pdf_extraction_spark.kernels.bpe import (  # noqa: E402
    BPE_VERSION,
    pre_tokenize,
    train_bpe,
)

DEFAULT_SF = "/root/testdata/sf0.001"
DEFAULT_N_MERGES = 80


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_N_MERGES
    rows = duckdb.connect().execute(
        "select text from read_parquet(?) where text is not null "
        "order by doc_id",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchall()
    freqs: Counter[str] = Counter()
    for (text,) in rows:
        freqs.update(pre_tokenize(text))
    merges = train_bpe(dict(freqs), n_merges)
    payload = {
        "version": BPE_VERSION,
        "n_merges": len(merges),
        "trained_on": f"{os.path.basename(os.path.normpath(sf_dir))} "
        f"documents ({len(rows)} docs, {len(freqs)} word types)",
        "merges": [list(p) for p in merges],
    }
    out = os.path.join(
        REPO, "ai_pdf_extraction_spark", "kernels", "bpe_merges.json"
    )
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(f"{out}: {len(merges)} merges from {len(freqs)} word types")


if __name__ == "__main__":
    main()
