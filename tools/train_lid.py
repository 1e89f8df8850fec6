"""Train the repo-committed hashed-ngram LID model (kernels/lid_model.json).

Multinomial logistic regression (full-batch gradient descent, zero
init — deterministic) over ``kernels.lid.featurize`` counts of the
deterministic labeled corpus from ``corpus/langtext.py``; weights are
integer-quantized (half-away rounding, the repo's cross-engine
rounding rule) so the shipped scorer is exact int64 arithmetic.
Held-out split: ``doc_id % 5 == 0`` (the pytest accuracy pin
regenerates the same split).

Usage: python tools/train_lid.py [n_docs] [epochs]
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ai_pdf_extraction_spark.corpus.langtext import generate_lang_docs  # noqa: E402
from ai_pdf_extraction_spark.kernels.lid import (  # noqa: E402
    LID_VERSION,
    N_BUCKETS,
    LidModel,
    featurize,
)

SEED = 123
QSCALE = 10_000
LR = 0.05
L2 = 1e-4


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) * QSCALE + 0.5), x))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    docs = generate_lang_docs(n_docs, seed=SEED)
    langs = sorted({lang for _, lang, _ in docs})
    train = [(lang, text) for i, lang, text in docs if i % 5 != 0]
    held = [(lang, text) for i, lang, text in docs if i % 5 == 0]

    def matrix(rows):
        X = np.zeros((len(rows), N_BUCKETS), dtype=np.float64)
        y = np.zeros(len(rows), dtype=np.int64)
        for r, (lang, text) in enumerate(rows):
            for b, c in featurize(text).items():
                X[r, b] = c
            y[r] = langs.index(lang)
        return X, y

    X, y = matrix(train)
    L = len(langs)
    W = np.zeros((L, N_BUCKETS))
    b = np.zeros(L)
    onehot = np.eye(L)[y]
    for _ in range(epochs):
        logits = X @ W.T + b
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - onehot) / len(X)
        W -= LR * (g.T @ X + L2 * W)
        b -= LR * g.sum(axis=0)

    payload = {
        "version": LID_VERSION,
        "n_buckets": N_BUCKETS,
        "langs": langs,
        "qscale": QSCALE,
        "trained_on": f"corpus/langtext.py n={n_docs} seed={SEED} "
        f"epochs={epochs} (held-out: doc_id %% 5 == 0)",
        "bias_q": [_round_half_away(v) for v in b],
        "weights_q": [[_round_half_away(v) for v in row] for row in W],
    }
    model = LidModel(payload)
    acc = sum(
        model.predict(text) == lang for lang, text in held
    ) / len(held)
    payload["held_out_accuracy"] = round(acc, 4)
    out = os.path.join(
        REPO, "ai_pdf_extraction_spark", "kernels", "lid_model.json"
    )
    with open(out, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
        f.write("\n")
    print(f"{out}: {L} langs, held-out accuracy {acc:.4f} on {len(held)} docs")


if __name__ == "__main__":
    main()
