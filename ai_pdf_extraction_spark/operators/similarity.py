"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the IVF-style
variant restricts the candidate set to the query's coarse cluster
(here the precomputed ``label`` column stands in for a k-means coarse
quantizer — at 100 TB you'd train centroids offline, broadcast them,
and assign via a vectorized pandas UDF). Both are pure DataFrame ops:
the probe side is tiny and **broadcast**, so the scan side streams
without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _side(
    df,
    id_col: str,
    vec_col: str,
    id_alias: str,
    vec_alias: str,
    norm_alias: str,
    extra: dict | None = None,
):
    """Project (id, double vector, PRECOMPUTED norm [, extras]): norms
    cost O(rows·d) here vs O(queries·rows·d) if recomputed per pair
    inside the join."""
    v = _as_double(vec_col)
    cols = [
        F.col(id_col).alias(id_alias),
        v.alias(vec_alias),
        _norm(v).alias(norm_alias),
    ]
    for alias, col in (extra or {}).items():
        cols.append(col.alias(alias))
    return df.select(*cols)


def _ranked_topk(q, c, pred, k: int):
    """Score-join + per-query top-k shared by all three variants —
    rounding and tie-break semantics live in exactly one place.
    try_divide: a zero-norm vector (padded/empty doc) yields null cos
    (sorted last) instead of an ANSI DIVIDE_BY_ZERO job failure."""
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = c.join(F.broadcast(q), pred).select(
        "query_id",
        "neighbor_id",
        F.round(F.try_divide(dot, F.col("qn") * F.col("cn")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: every query row against every corpus
    row. Query side is broadcast (small by construction); corpus side
    never shuffles until the per-query top-k window, which AQE keeps
    partitioned by query_id. Output: (query_id, neighbor_id, cos, rank).

    Cosine is rounded to 6 before ranking so result order is stable
    across engines/float summation orders; ties break by neighbor id.
    Self-matches are excluded.
    """
    q = _side(queries, id_col, vec_col, "query_id", "qv", "qn")
    c = _side(emb, id_col, vec_col, "neighbor_id", "cv", "cn")
    return _ranked_topk(q, c, F.col("query_id") != F.col("neighbor_id"), k)


def lsh_planes(n_planes: int = 8, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Deterministic random-hyperplane set for sign-LSH, rounded so
    the identical literals embed in the DuckDB oracle SQL."""
    import numpy as np

    rs = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in row] for row in rs.standard_normal((n_planes, dim))]


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id: bit i = (v · plane_i) > 0. Pure Column
    expression; the planes are plan-time literals (broadcast by
    closure, the inverse of the reference's rebuild-every-time prompt
    anti-pattern, SURVEY.md §4 X10)."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, lit_plane, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(0)
    return bucket.cast("int")


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Sign-LSH-bucketed ANN (single probe): candidates share the
    query's hyperplane-sign bucket; exact cosine top-k within. With 8
    planes the corpus shards into ≤256 buckets — the scale path where
    brute force is the fallback and recall trades against candidate
    count. Same output shape as ``cosine_topk``."""
    planes = lsh_planes(n_planes, dim)
    q = _side(queries, id_col, vec_col, "query_id", "qv", "qn").withColumn(
        "qb", lsh_bucket(F.col("qv"), planes)
    )
    c = _side(emb, id_col, vec_col, "neighbor_id", "cv", "cn").withColumn(
        "cb", lsh_bucket(F.col("cv"), planes)
    )
    return _ranked_topk(
        q,
        c,
        (F.col("qb") == F.col("cb")) & (F.col("query_id") != F.col("neighbor_id")),
        k,
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """IVF-bucketed ANN: search only the query's coarse cluster
    (nprobe=1). Same output shape as ``cosine_topk``; recall < 1.0 by
    design — the scale path trades exactness for a candidate set
    |cluster| ≪ |corpus|."""
    qs = _side(
        queries, id_col, vec_col, "query_id", "qv", "qn",
        extra={"qc": F.col(cluster_col)},
    )
    cs = _side(
        emb, id_col, vec_col, "neighbor_id", "cv", "cn",
        extra={"cc": F.col(cluster_col)},
    )
    return _ranked_topk(
        qs,
        cs,
        (F.col("qc") == F.col("cc")) & (F.col("query_id") != F.col("neighbor_id")),
        k,
    )
