"""Deterministic multilingual word-salad corpus for LID training/eval.

The driver's synthetic documents table carries a ``lang`` label but
IDENTICAL English-ish word soup for every language — no trainable
signal. This generator produces the labeled corpus the trained LID
(``kernels/lid.py``) learns from: per-language bags of common function
and content words (public vocabulary knowledge, ~30 words each — the
same kind of material as the q52/q59 snippet lists), mixed with a
shared language-neutral noise vocabulary so the task is non-trivial.
Everything is seeded ``random.Random`` — byte-reproducible, no
external data.
"""

from __future__ import annotations

import random

LANG_VOCAB: dict[str, tuple[str, ...]] = {
    "en": (
        "the and of to in that it is was for on are as with his they at "
        "be this have from or had by word but not what all were when"
    ).split(),
    "de": (
        "der die und das ist nicht mit ein eine von den dem zu auf für "
        "sich auch als wird bei aus nach wenn über noch haben werden kann"
    ).split(),
    "fr": (
        "le la les et des en un une du que pour dans est qui sur pas "
        "plus par avec tout faire son mais comme être vous nous alors"
    ).split(),
    "es": (
        "el los las que y en un una del se con por para es al lo como "
        "más pero sus ya este sí porque esta entre cuando también"
    ).split(),
    "it": (
        "il la che di e un una per con non sono del gli nel si da come "
        "più anche questo essere della alla hanno molto dove perché"
    ).split(),
    "pt": (
        "o os as que de do da em um uma para com não por mais se como "
        "seu sua ou quando muito já está você pelo isso são ção"
    ).split(),
    "nl": (
        "de het een van en in is dat op te zijn met voor niet aan er "
        "ook als maar om door naar dan nog wel bij uit over deze"
    ).split(),
    "sv": (
        "och det att i en jag på är som med för inte om han var men "
        "ett vid kan av den till efter hade vad där nu mycket"
    ).split(),
}

# language-neutral noise every doc samples from (numbers, latinate
# product-ish tokens) — keeps pure-vocab-lookup from being sufficient
NOISE_VOCAB: tuple[str, ...] = (
    "2024 300 data info web page item x7 alpha beta server model "
    "index table net max pro plus"
).split()

NOISE_SHARE = 0.2
MIN_WORDS = 8
MAX_WORDS = 20


def generate_lang_docs(
    n: int, seed: int
) -> list[tuple[int, str, str]]:
    """``n`` docs cycling through the 8 languages: (doc_id, lang,
    text). ~20% noise tokens, 8-20 words — short enough that the
    4-trigram baseline misfires sometimes, which is what the trained
    model must beat."""
    rng = random.Random(seed)
    langs = sorted(LANG_VOCAB)
    out = []
    for i in range(n):
        lang = langs[i % len(langs)]
        vocab = LANG_VOCAB[lang]
        n_words = rng.randint(MIN_WORDS, MAX_WORDS)
        words = [
            rng.choice(NOISE_VOCAB)
            if rng.random() < NOISE_SHARE
            else rng.choice(vocab)
            for _ in range(n_words)
        ]
        out.append((i, lang, " ".join(words)))
    return out
