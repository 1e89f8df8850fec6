"""Exact byte-pair-encoding tokenizer (merge-table BPE).

``text_analysis.token_count_bpe`` is a regex PROXY — it counts
pre-tokens, not BPE tokens, so a token-budget selection over it
mis-prices long words. This kernel is the exact merge-loop tokenizer
(Sennrich, Haddow & Birch 2015, arXiv:1508.07909 — the public BPE
algorithm; the reference repo tokenizes nothing itself, its LLM
provider does): pre-tokenize with the SAME public regex
(``BPE_TOKEN_PATTERN``), split each pre-token into characters, then
repeatedly merge the adjacent pair with the LOWEST merge rank until no
ranked pair remains (the GPT-2 ``bpe()`` greedy loop — confluent
because a pair containing a merged symbol is always learned later,
hence ranked higher, than its parts).

The merge table is repo-committed data (``bpe_merges.json`` next to
this module, read zip-import-safely via ``importlib.resources``),
trained by ``tools/train_bpe.py`` on the deterministic synthetic
corpus — no external weights, fully reproducible: pair counts over the
word-frequency table, highest count wins, ties broken by the
lexicographically smallest pair.

Versioning: ``BPE_VERSION`` pins kernel semantics, and the merges file
carries its own ``version``; ``load_ranks`` refuses a file version
this kernel doesn't speak (the ``PQ_CODES_VERSION`` discipline). The
q68 oracle golden is keyed on both plus the merges digest, so a
retrained table can never be compared against a stale golden.

The oracle twin (``oracle/bpe_naive.py``) is an INDEPENDENT
implementation — one-pair-at-a-time leftmost merging, no caching — so
pytest parity is a real cross-check, not shared-kernel tautology (the
q23 xxh64 twin discipline).
"""

from __future__ import annotations

import json
from functools import lru_cache

# Bump when tokenizer SEMANTICS change (pre-tokenizer, merge rule,
# unknown-char handling): goldens and any at-rest token counts keyed
# on the old version must regenerate.
BPE_VERSION = 1

# Pre-tokenizer shared with the regex proxy (text_analysis imports it
# from here would be circular; the literal is asserted equal in tests).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

MERGES_RESOURCE = "bpe_merges.json"


def load_merges_payload() -> dict:
    """Raw merges-file payload (zip-import-safe)."""
    from importlib import resources

    with resources.files(__package__).joinpath(MERGES_RESOURCE).open("r") as f:
        return json.load(f)


def load_ranks(payload: dict | None = None) -> dict[tuple[str, str], int]:
    """{(left, right): rank}; rank = training merge order. Fails loud
    on a version this kernel doesn't speak."""
    payload = payload if payload is not None else load_merges_payload()
    if payload.get("version") != BPE_VERSION:
        raise ValueError(
            f"bpe_merges.json version {payload.get('version')!r} != "
            f"kernel BPE_VERSION {BPE_VERSION} — retrain with "
            "tools/train_bpe.py (token counts across versions are not "
            "comparable)"
        )
    return {
        (left, right): rank
        for rank, (left, right) in enumerate(payload["merges"])
    }


def merges_digest(payload: dict | None = None) -> str:
    """Stable digest of the merge table (golden cache keys)."""
    import hashlib

    payload = payload if payload is not None else load_merges_payload()
    blob = json.dumps(
        [payload["version"], payload["merges"]], separators=(",", ":")
    ).encode()
    return hashlib.md5(blob).hexdigest()[:12]


def pre_tokenize(text: str | None) -> list[str]:
    import re

    return re.findall(BPE_TOKEN_PATTERN, text) if text else []


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge loop over one pre-token. Unknown
    characters simply never participate in a ranked pair (each stays
    its own token — counts remain well-defined with no byte fallback)."""
    symbols = list(word)
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        # merge ALL occurrences of the chosen pair, left to right
        pair = (symbols[best_i], symbols[best_i + 1])
        merged: list[str] = []
        i = 0
        while i < len(symbols):
            if (
                i < len(symbols) - 1
                and (symbols[i], symbols[i + 1]) == pair
            ):
                merged.append(symbols[i] + symbols[i + 1])
                i += 2
            else:
                merged.append(symbols[i])
                i += 1
        symbols = merged
    return symbols


class BpeTokenizer:
    """Rank-table tokenizer with a per-word LRU (web text repeats
    words heavily — the cache is what makes the pandas-UDF batch loop
    cheap)."""

    def __init__(self, ranks: dict[tuple[str, str], int] | None = None):
        self.ranks = ranks if ranks is not None else load_ranks()

        @lru_cache(maxsize=65536)
        def _cached(word: str) -> tuple[str, ...]:
            return tuple(encode_word(word, self.ranks))

        self._cached = _cached

    def tokens(self, text: str | None) -> list[str]:
        out: list[str] = []
        for word in pre_tokenize(text):
            out.extend(self._cached(word))
        return out

    def count(self, text: str | None) -> int:
        return sum(len(self._cached(w)) for w in pre_tokenize(text))


def train_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Deterministic BPE training (Sennrich alg. 1) over a word
    frequency table: each round merges the most frequent adjacent
    symbol pair (ties → lexicographically smallest pair), stops early
    when no pair repeats. Used by ``tools/train_bpe.py`` only — the
    runtime loads the committed table."""
    seqs: dict[str, tuple[list[str], int]] = {
        w: (list(w), f) for w, f in word_freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for symbols, freq in seqs.values():
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break  # nothing repeats — further merges memorize noise
        pair = best[0]
        merges.append(pair)
        for w, (symbols, freq) in seqs.items():
            merged: list[str] = []
            i = 0
            while i < len(symbols):
                if i < len(symbols) - 1 and (symbols[i], symbols[i + 1]) == pair:
                    merged.append(symbols[i] + symbols[i + 1])
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            seqs[w] = (merged, freq)
    return merges
