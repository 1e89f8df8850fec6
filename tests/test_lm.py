"""Bigram-LM perplexity bucketing (operators/lm.py + oracle/lm_naive
twin). The q76 contract oracle is a third, fully relational DuckDB
evaluation of the same committed integers; here we pin

- model load + version/shape gates (the PQ_CODES_VERSION rule),
- Spark plan ≡ naive Python twin on real testdata + adversarial text,
- the exact tie rule (sum == cut·n lands in the BETTER bucket),
- non-degenerate terciles on the training distribution itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_pdf_extraction_spark.operators.lm import (
    LM_VERSION,
    check_lm_model,
    lm_perplexity,
    load_lm_payload,
)
from ai_pdf_extraction_spark.oracle.lm_naive import score_docs

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_model_loads_and_version_gates():
    payload = load_lm_payload()
    assert payload["version"] == LM_VERSION
    assert payload["cut_head_q"] > payload["cut_mid_q"]  # closer to 0 = better
    assert payload["oov_q"] < payload["cut_mid_q"]  # OOV scores worse than cuts
    assert len(payload["bigrams"]) > len(payload["backoff"]) > 0
    with pytest.raises(ValueError, match="LM_VERSION"):
        check_lm_model({"version": LM_VERSION + 1})
    with pytest.raises(ValueError, match="missing"):
        check_lm_model({"version": LM_VERSION})


def test_spark_matches_naive_twin(spark):
    docs = (
        spark.read.parquet(SF_DOCS)
        .select("doc_id", "text")
        .limit(64)
        .collect()
    )
    rows = [(r["doc_id"], r["text"]) for r in docs]
    rows += [
        (9001, ""),
        (9002, None),
        (9003, "   \t\n "),
        (9004, "zzz qqq xxyzzy 0x7f 12345"),  # all-OOV
        (9005, "THE The the tHe"),  # per-token lower
        (9006, "a"),  # single token: BOS bigram only
        (9007, "naïve café — touché!"),  # non-ascii split into ascii runs
    ]
    payload = load_lm_payload()
    expected = {r[0]: r[1:] for r in score_docs(rows, payload)}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["lm_q_sum"], r["ppl_bucket"])
        for r in lm_perplexity(df).collect()
    }
    assert got == expected


def test_tie_lands_in_better_bucket(spark):
    # hand-built model: 'good' scores exactly -100/token; cut_head at
    # -100 means a sum of n*-100 must tie INTO head (>= rule), and one
    # extra OOV token (-1000) drops below cut_mid*n -> tail.
    payload = {
        "version": LM_VERSION,
        "bigrams": [["<s>", "good", -100], ["good", "good", -100]],
        "backoff": [["good", -100]],
        "oov_q": -1000,
        "cut_head_q": -100,
        "cut_mid_q": -400,
    }
    df = spark.createDataFrame(
        [(1, "good good good"), (2, "good good zzz"), (3, "good zzz zzz")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["lm_q_sum"], r["ppl_bucket"])
        for r in lm_perplexity(df, payload=payload).collect()
    }
    assert got[1] == (-300, "head")  # -300 == -100*3: tie -> head
    assert got[2] == (-1200, "middle")  # -400*3 == -1200: tie -> middle
    assert got[3] == (-2100, "tail")
    # naive twin agrees on the tie rule
    naive = {r[0]: (r[2], r[3]) for r in score_docs(
        [(1, "good good good"), (2, "good good zzz"), (3, "good zzz zzz")],
        payload,
    )}
    assert naive == got


def test_terciles_nondegenerate_on_training_sample(spark):
    """Cutoffs came from this distribution's terciles — each bucket
    must hold roughly a third of the training docs (exactness is not
    required: quantized ties move a few docs across a cut)."""
    df = spark.read.parquet(SF_DOCS).select("doc_id", "text")
    n = df.count()
    counts = {
        r["ppl_bucket"]: r["count"]
        for r in lm_perplexity(df).groupBy("ppl_bucket").count().collect()
    }
    for bucket in ("head", "middle", "tail"):
        assert counts.get(bucket, 0) >= n // 6, (bucket, counts, n)
