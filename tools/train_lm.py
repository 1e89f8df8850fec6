"""Train the repo-committed bigram LM (kernels/lm_model.json) for
CCNet-style perplexity bucketing (operators/lm.py).

Interpolated (Jelinek-Mercer) word-bigram model over the smallest-SF
synthetic documents sample — the pipeline's "clean reference corpus"
in the CCNet recipe (the real deployment would train on curated text;
the sandbox has exactly one deterministic text distribution, so the
reference sample IS the smallest SF of it — documented provenance,
no external data):

    p(w|v) = λ·c(v,w)/c(v) + (1−λ)·p_uni(w)
    p_uni(w) = (c(w)+0.5)/(N+0.5·(|V|+1))      (+1 slot: OOV)

Quantization: q = round_half_away(log10(p)·10^4) — the repo's
cross-engine rounding rule — committed per OBSERVED bigram (bi_q),
per vocab word as the unseen-bigram backoff (back_q = q of
(1−λ)·p_uni), and one OOV constant. Scoring is then pure int64
lookup+sum in every engine.

Bucket cutoffs: the training docs' own per-token score distribution's
terciles (CCNet buckets the crawl at the reference distribution's
percentiles). Stored as ints on the avg×10^4 scale; the operator
compares ``sum >= cut·n`` so no engine ever divides.

Usage: python tools/train_lm.py [docs_parquet] [out_json]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ai_pdf_extraction_spark.operators.lm import (  # noqa: E402
    BOS,
    LM_VERSION,
    TOKEN_RE,
)

LAMBDA = 0.9
QSCALE = 10_000
DEFAULT_DOCS = "/root/testdata/sf0.001/documents.parquet"
DEFAULT_OUT = os.path.join(
    REPO, "ai_pdf_extraction_spark", "kernels", "lm_model.json"
)


def _q(p: float) -> int:
    x = math.log10(p) * QSCALE
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def tokenize(text: str) -> list[str]:
    return [t.lower() for t in re.findall(TOKEN_RE, text or "")]


def main() -> None:
    docs_path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DOCS
    out_path = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT

    import pyarrow.parquet as pq

    tbl = pq.read_table(docs_path, columns=["doc_id", "text"])
    rows = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    token_docs = [tokenize(text) for _, text in rows]

    uni: Counter = Counter()
    bi: Counter = Counter()
    ctx: Counter = Counter()
    for toks in token_docs:
        prev = BOS
        for w in toks:
            uni[w] += 1
            bi[(prev, w)] += 1
            ctx[prev] += 1
            prev = w

    n_tokens = sum(uni.values())
    vocab = sorted(uni)
    denom = n_tokens + 0.5 * (len(vocab) + 1)

    def p_uni(w: str) -> float:
        return (uni[w] + 0.5) / denom

    bigrams = [
        [v, w, _q(LAMBDA * c / ctx[v] + (1 - LAMBDA) * p_uni(w))]
        for (v, w), c in sorted(bi.items())
    ]
    backoff = [[w, _q((1 - LAMBDA) * p_uni(w))] for w in vocab]
    oov_q = _q((1 - LAMBDA) * 0.5 / denom)

    # score the training docs with the COMMITTED ints (exactly what
    # every engine will compute) to place the tercile cutoffs
    bi_q = {(v, w): q for v, w, q in bigrams}
    back_q = dict(backoff)
    avgs = []
    for toks in token_docs:
        if not toks:
            continue
        prev, total = BOS, 0
        for w in toks:
            total += bi_q.get((prev, w), back_q.get(w, oov_q))
            prev = w
        avgs.append(total / len(toks))
    avgs.sort()
    # tercile order statistics, head = top third (avg CLOSER to 0)
    cut_head = avgs[(2 * len(avgs)) // 3]
    cut_mid = avgs[len(avgs) // 3]
    qha = lambda x: int(math.copysign(math.floor(abs(x) + 0.5), x))  # noqa: E731

    payload = {
        "version": LM_VERSION,
        "lambda": LAMBDA,
        "qscale": QSCALE,
        "n_train_docs": len(rows),
        "n_train_tokens": n_tokens,
        "vocab_size": len(vocab),
        "source": os.path.basename(os.path.dirname(docs_path))
        + "/"
        + os.path.basename(docs_path),
        "source_sha256": hashlib.sha256(
            json.dumps([t for t in token_docs]).encode()
        ).hexdigest(),
        "oov_q": oov_q,
        "cut_head_q": qha(cut_head),
        "cut_mid_q": qha(cut_mid),
        "backoff": backoff,
        "bigrams": bigrams,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
        f.write("\n")
    print(
        json.dumps(
            {
                k: payload[k]
                for k in (
                    "vocab_size",
                    "n_train_tokens",
                    "oov_q",
                    "cut_head_q",
                    "cut_mid_q",
                )
            }
            | {"n_bigrams": len(bigrams), "out": out_path}
        )
    )


if __name__ == "__main__":
    main()
