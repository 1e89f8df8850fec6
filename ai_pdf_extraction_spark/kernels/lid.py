"""Trained hashed-ngram language-ID kernel (fastText-style linear).

The marker/trigram detectors (``text_analysis.lang_detect*``) are
hand-written heuristics; this is the TRAINED model slot a production
pipeline fills with fastText — same public algorithm family (Joulin et
al. 2016, arXiv:1607.01759: bag of hashed n-gram features → linear
classifier), deterministic and repo-contained: features are md5-hashed
char trigrams AND whole words of the padded lowercase text, the weight
matrix is trained by ``tools/train_lid.py`` on the synthetic labeled
corpus (``corpus/langtext.py``) and committed INTEGER-QUANTIZED
(``lid_model.json`` next to this module), so scoring is exact int64
arithmetic — bit-identical on every platform, no float drift between
the Spark UDF, the oracle twin, and any future SQL port.

Prediction: ``score[lang] = bias_q[lang] + Σ_f count(f) ·
W_q[lang][h(f)]``, argmax with ties broken by model language order
(sorted, pinned in the file). Empty/whitespace text → ``"und"``.

Versioning: ``LID_VERSION`` pins kernel semantics (hashing, features,
quantization contract); the model file carries its own ``version`` and
``load_model`` refuses a mismatch (the ``PQ_CODES_VERSION``
discipline). Goldens key on both plus the model digest.
"""

from __future__ import annotations

import hashlib
import json
import re

# Bump when feature extraction / hashing / scoring semantics change.
LID_VERSION = 1

MODEL_RESOURCE = "lid_model.json"

N_BUCKETS = 4096  # feature-hash buckets (fastText's hashingTrick dial)
UNKNOWN = "und"


def load_model_payload() -> dict:
    from importlib import resources

    with resources.files(__package__).joinpath(MODEL_RESOURCE).open("r") as f:
        return json.load(f)


def check_model(payload: dict) -> dict:
    if payload.get("version") != LID_VERSION:
        raise ValueError(
            f"lid_model.json version {payload.get('version')!r} != kernel "
            f"LID_VERSION {LID_VERSION} — retrain with tools/train_lid.py "
            "(scores across versions are not comparable)"
        )
    if payload.get("n_buckets") != N_BUCKETS:
        raise ValueError(
            f"lid_model.json n_buckets {payload.get('n_buckets')!r} != "
            f"kernel N_BUCKETS {N_BUCKETS} — feature universes would mix"
        )
    return payload


def model_digest(payload: dict | None = None) -> str:
    payload = payload if payload is not None else load_model_payload()
    blob = json.dumps(
        [payload["version"], payload["langs"], payload["bias_q"],
         payload["weights_q"]],
        separators=(",", ":"),
    ).encode()
    return hashlib.md5(blob).hexdigest()[:12]


def hash_feature(feature: str) -> int:
    """md5-based bucket index — stable across platforms and engines
    (Python's builtin ``hash`` is salted; never use it here)."""
    return int(hashlib.md5(feature.encode()).hexdigest()[:8], 16) % N_BUCKETS


def featurize(text: str | None) -> dict[int, int]:
    """Bucket → count over char trigrams ('3:' prefix) and whole words
    ('w:' prefix) of the space-padded lowercase text. The padding makes
    word-boundary trigrams (' th', 'he ') first-class features, same as
    the heuristic detectors' padded markers."""
    counts: dict[int, int] = {}
    t = (text or "").strip().lower()
    if not t:
        return counts
    padded = f" {t} "
    for i in range(len(padded) - 2):
        b = hash_feature("3:" + padded[i : i + 3])
        counts[b] = counts.get(b, 0) + 1
    for word in re.split(r"\s+", t):
        b = hash_feature("w:" + word)
        counts[b] = counts.get(b, 0) + 1
    return counts


class LidModel:
    """Quantized linear scorer. ``weights_q[lang]`` is a dense
    N_BUCKETS int list; scoring is pure int64 arithmetic."""

    def __init__(self, payload: dict | None = None):
        payload = check_model(
            payload if payload is not None else load_model_payload()
        )
        self.langs: list[str] = payload["langs"]
        self.bias_q: list[int] = payload["bias_q"]
        self.weights_q: list[list[int]] = payload["weights_q"]

    def scores(self, text: str | None) -> list[int] | None:
        feats = featurize(text)
        if not feats:
            return None
        return [
            self.bias_q[li]
            + sum(c * self.weights_q[li][b] for b, c in feats.items())
            for li in range(len(self.langs))
        ]

    def predict(self, text: str | None) -> str:
        s = self.scores(text)
        if s is None:
            return UNKNOWN
        best = max(range(len(s)), key=lambda i: (s[i], -i))
        return self.langs[best]
