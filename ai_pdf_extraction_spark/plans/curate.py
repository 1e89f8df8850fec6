"""Curation pass: what a training-data pipeline emits after
extraction (the q36 capstone, as an importable plan).

Survivors are documents that (a) clear the quality threshold, (b) are
the canonical copy of their exact-duplicate group, and (c) are not the
higher id of a verified near-duplicate pair. Near-dup pairs come from
the banded MinHash-LSH scale path (``operators.dedup.minhash_lsh_pairs``)
— candidates only, never the all-pairs shingle self-join
(``ngram_jaccard_pairs`` is the correctness baseline, not the plan to
run on a corpus).

Scale notes (10^12 docs): one shingle explode persisted across the
signature/verify consumers; exact dedup is a single window shuffle on
the 32-byte fingerprint; the near-dup loser set is tiny relative to
the corpus, so its anti-join broadcasts under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_pdf_extraction_spark.operators.dedup import (
    contamination_flags,
    exact_dedup,
    granule_dedup,
    minhash_lsh_pairs,
)
from ai_pdf_extraction_spark.operators.text_analysis import quality_score, token_count


def curated_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.5,
    jaccard_threshold: float = 0.8,
    n: int = 3,
    k: int = 12,
    bands: int = 4,
) -> DataFrame:
    """One scan, one fingerprint window, one LSH pass; survivors carry
    their quality score and token count. Output: (id, lang, quality,
    n_tokens)."""
    scored = docs.select(
        id_col,
        "lang",
        quality_score(text_col).alias("quality"),
        token_count(text_col).alias("n_tokens"),
    )
    canon = (
        exact_dedup(docs, id_col=id_col, text_col=text_col)
        .filter(~F.col("is_dup"))
        .select(id_col)
    )
    near_losers = (
        minhash_lsh_pairs(
            docs, id_col=id_col, text_col=text_col,
            n=n, k=k, bands=bands, threshold=jaccard_threshold,
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        scored.join(canon, id_col)
        .join(near_losers, id_col, "left_anti")
        .filter(F.col("quality") >= quality_threshold)
        .select(id_col, "lang", "quality", "n_tokens")
    )


def curated_corpus_v2(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    contamination_n: int = 13,
    **knobs,
) -> DataFrame:
    """The FULL curation pass, composing every dedup/filter family the
    engine ships: quality ∧ exact-canonical ∧ ¬LSH-near-dup (the v1
    plan) ∧ ¬benchmark-contaminated, with corpus-level granule-dedup
    stats riding each survivor. Scale shapes compose unchanged: the
    contamination shingle set broadcasts, granule winners partial-
    aggregate, the LSH loser set anti-joins — and the shingle and
    granule persists live in separate cache slots so neither evicts
    the other. Output: (id, lang, quality, n_tokens, n_granules,
    n_kept)."""
    base = curated_corpus(docs, id_col=id_col, text_col=text_col, **knobs)
    contaminated = (
        contamination_flags(
            docs, benchmark, n=contamination_n, id_col=id_col, text_col=text_col
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    gran = granule_dedup(docs, id_col=id_col, text_col=text_col).select(
        id_col, "n_granules", "n_kept"
    )
    return base.join(contaminated, id_col, "left_anti").join(gran, id_col)
