"""Independent naive twin of the LM perplexity scorer
(operators/lm.py) — plain dict lookups over the committed model, no
Spark, no shared scoring code (the shared-kernel blind-spot rule:
parity against a second implementation, not the same function twice).
Used by the pytest parity check; the q76 contract oracle is the
relational DuckDB form, so this is the THIRD independent evaluation
of the same committed integers."""

from __future__ import annotations

import re


def score_docs(
    rows: list[tuple[int, str | None]], payload: dict
) -> list[tuple[int, int, int, str]]:
    """[(doc_id, text)] → [(doc_id, n_tokens, lm_q_sum, ppl_bucket)]."""
    bi = {(v, w): int(q) for v, w, q in payload["bigrams"]}
    back = {w: int(q) for w, q in payload["backoff"]}
    oov = int(payload["oov_q"])
    cut_head = int(payload["cut_head_q"])
    cut_mid = int(payload["cut_mid_q"])

    out = []
    for doc_id, text in rows:
        toks = [t.lower() for t in re.findall("[A-Za-z0-9]+", text or "")]
        if not toks:
            out.append((doc_id, 0, 0, "empty"))
            continue
        prev, total = "<s>", 0
        for w in toks:
            total += bi.get((prev, w), back.get(w, oov))
            prev = w
        n = len(toks)
        if total >= cut_head * n:
            bucket = "head"
        elif total >= cut_mid * n:
            bucket = "middle"
        else:
            bucket = "tail"
        out.append((doc_id, n, total, bucket))
    return out
