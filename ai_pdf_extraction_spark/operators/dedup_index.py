"""Incremental (cross-run) dedup against an at-rest index.

Every batch dedup operator in :mod:`dedup` re-shuffles the whole
corpus; a production pipeline dedups each NEW crawl against the
existing corpus without touching the old one. The reference does
exactly this at ingest time — each upload's content hash is checked
against previously stored hashes (``routers/batches.py:381-382``
computes ``file_hash`` per file and rejects matches from the DB) —
and this module is that check at corpus scale, for both families:

* **exact delta** — the index keeps one row per distinct content
  fingerprint ``(fp, canonical_id, n_docs)``; a new crawl's
  fingerprints LEFT-join it (plus a group-by within the batch), and
  the result equals ``exact_dedup(old ∪ new)`` restricted to new ids —
  by construction, because min/count over a union decompose over the
  parts. The old corpus contributes one aggregated row per distinct
  fp: never re-scanned, never re-shuffled.
* **MinHash-LSH delta** — the index keeps each indexed doc's k-hash
  MinHash signature; new docs compute signatures over the SAME frozen
  shingle universe, band into buckets (:func:`dedup.band_buckets`,
  shared with the batch path so banding can't drift), and probe the
  index's buckets. Candidates = new×old bucket collisions ∪ new×new;
  verification (true n-gram Jaccard) touches ONLY candidate old docs
  — a semi-join pulls their text back through the shingler; the rest
  of the old corpus is never read. With an unrestricted shingle
  universe the result is EXACTLY ``minhash_lsh_pairs(old ∪ new)``
  restricted to pairs touching a new id (signatures and per-pair
  Jaccard are corpus-independent); with a DF cap the universe is
  FROZEN at index build time (the hot-shingle set is computed over
  the indexed corpus and stored), the standard incremental-index
  compromise — a shingle that only becomes hot after later appends
  keeps participating, documented drift vs a from-scratch batch run.

At-rest layout (``write_dedup_index`` / ``append_dedup_index``)::

    index_dir/
      index.json            # version, params, committed batch list
      fingerprints/<batch>/ # (fp, canonical_id, n_docs) per batch
      signatures/<batch>/   # (doc_id, h0..h{k-1}) per batch
      hot_<token>/          # frozen DF-capped hot set (absent if uncapped)

Every build and append writes under FRESH uniquely-named directories
(``b{i}_{token}``) and then commits by atomically rewriting
``index.json`` (tmp + ``os.replace``) — a crash at ANY point (append
or rebuild-over-existing) leaves the previous manifest pointing only
at intact previous directories; uncommitted orphans are never read,
the same manifest-is-the-commit-point discipline as
``SnapshotTable``. Loading
re-aggregates fingerprints across batches (min canonical, summed
counts — lossless for the delta semantics above). The manifest pins
``DEDUP_INDEX_VERSION`` plus the shingle/MinHash params; a version or
param mismatch fails loud instead of silently mixing universes (the
``PQ_CODES_VERSION`` discipline from ``similarity.py``).

Scale notes (10^12-doc index, 10^9-doc crawl batch):

* The exact delta joins the new batch's fp groups against the index's
  fp relation — an equi-join on a 32-byte key; AQE handles skew, and
  the index side is one aggregated row per distinct fp (≪ corpus).
* The LSH bucket probe joins the new batch's (id, bucket) relation
  against the index's derived buckets. On a real cluster the stored
  signature relation would be written ``bucketBy(bucket)`` into a
  catalog table so the probe is co-located (no index shuffle); the
  sandbox has no catalog, so the join is a plain equi-join here and
  the derivation (band md5 over k columns) is narrow column work over
  the index scan. ``broadcast_new=True`` map-side-probes the index
  scan when the new batch is small enough to broadcast.
* Verification cost is O(candidates), never O(new × old).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_pdf_extraction_spark.operators.dedup import (
    DEFAULT_MAX_SHINGLE_DF,
    _persist_latest,
    _word_shingles,
    band_buckets,
    hot_shingle_set,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from ai_pdf_extraction_spark.operators.text_analysis import fingerprint

# Bump when index semantics change (fingerprint expression, signature
# hash family, banding, frozen-universe rule): an at-rest index built
# under different semantics must refuse to serve deltas.
DEDUP_INDEX_VERSION = 1

_MANIFEST = "index.json"

# delta-side shingle persist slot (see dedup._persist_latest): the new
# batch's capped shingles feed signatures + verification sizes + the
# verify join — three consumers, one explode.
_DELTA_SHINGLE_CACHE: list[DataFrame] = []

# new×old bucket-collision slot: feeds both the candidate union and the
# candidate-old-id semi-join — persist so the index probe runs once.
_DELTA_CAND_CACHE: list[DataFrame] = []

# new-batch bucket slot: band_buckets(new_sig) feeds THREE consumers
# (the index probe + both sides of the new×new self-join) — without the
# persist each re-runs the signature groupBy over the shingle cache.
_NEW_BUCKETS_CACHE: list[DataFrame] = []

# live-index shingle slot: when the index relations are built in-plan
# (no at-rest files — contract queries, tests, first build), the hot
# set and the signatures share ONE persisted shingle explode.
_INDEX_SHINGLE_CACHE: list[DataFrame] = []

# verification-universe slot: new_sh ∪ candidate-old shingles feeds
# THREE consumers inside ngram_jaccard_pairs (sizes + both join
# sides) — the new half is already cached, but the old half re-runs
# the candidate semi-join + shingle explode + frozen-cap anti join
# per consumer without this persist.
_VERIFY_SHINGLE_CACHE: list[DataFrame] = []


# ---------------------------------------------------------------------------
# relation builders (pure plans — the IO layer below persists them)
# ---------------------------------------------------------------------------


def index_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct content fingerprint of ``docs``:
    ``(fp, canonical_id, n_docs)`` — min id and count, i.e. exactly the
    partial aggregate ``exact_dedup`` computes, kept at rest. NULL text
    coalesces to the same sentinel as ``exact_dedup`` so null-text docs
    dedup across runs too."""
    return (
        docs.select(
            F.col(id_col),
            F.coalesce(fingerprint(text_col), F.lit("null-text")).alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_docs"),
        )
    )


def hot_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame | None:
    """The frozen hot-shingle set for an index: shingles whose document
    frequency over the INDEXED corpus exceeds the cap (see
    ``dedup._df_capped`` for why the cap exists). ``None`` cap → no
    frozen set (and exact batch/delta equivalence, see module doc)."""
    if max_shingle_df is None:
        return None
    # the ONE cap rule — shared with the batch path's _df_capped
    return hot_shingle_set(
        _word_shingles(docs, id_col, text_col, n), max_shingle_df
    )


def _frozen_capped(sh: DataFrame, hot: DataFrame | None) -> DataFrame:
    """Apply a FROZEN hot set (anti join) — the incremental analogue of
    ``_df_capped``, which recomputes DF over its input."""
    if hot is None:
        return sh
    return sh.join(hot.select("shingle"), "shingle", "left_anti")


def index_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 12,
    hot: DataFrame | None = None,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures over the frozen universe: (id, h0..h{k-1}).
    Docs with zero surviving shingles get no row — same as the batch
    path, where they can never collide in any bucket."""
    raw = (
        _shingles
        if _shingles is not None
        else _word_shingles(docs, id_col, text_col, n)
    )
    sh = _frozen_capped(raw, hot)
    return minhash_signatures(docs, id_col, text_col, n, k, _shingles=sh)


def live_index_relations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 12,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> tuple[DataFrame, DataFrame | None]:
    """(signatures, hot) built IN-PLAN over one persisted shingle
    explode — for callers without at-rest files (the q71 contract
    query, tests, and the first build): the hot-set groupBy and the
    signature aggregation otherwise each re-run the split+explode over
    the whole corpus."""
    sh = _persist_latest(
        _INDEX_SHINGLE_CACHE, _word_shingles(docs, id_col, text_col, n)
    )
    hot = (
        hot_shingle_set(sh, max_shingle_df)
        if max_shingle_df is not None
        else None
    )
    sigs = index_signatures(docs, id_col, text_col, n, k, hot, _shingles=sh)
    return sigs, hot


def exact_dedup_delta(
    new_docs: DataFrame,
    index_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup of a NEW batch against an at-rest fingerprint index.
    Output per new doc: (id, canonical_id, group_size, is_dup,
    in_index) — identical to ``exact_dedup(old ∪ new)`` restricted to
    new ids, plus ``in_index`` (the fp was already stored: the
    reference's ingest-time duplicate rejection signal).

    Decomposition: union-canonical = min(index canonical, batch min);
    union-size = index count + batch count — both read off the
    aggregated index row, so the old corpus is never rescanned. One
    group-by over the batch + one equi-join on the 32-byte fp (AQE
    skew-safe), then the join back to per-doc rows — the same
    hot-key-safe two-exchange shape as ``exact_dedup``."""
    fp_new = new_docs.select(
        F.col(id_col),
        F.coalesce(fingerprint(text_col), F.lit("null-text")).alias("fp"),
    )
    batch_groups = fp_new.groupBy("fp").agg(
        F.min(id_col).alias("_batch_min"),
        F.count("*").alias("_batch_n"),
    )
    idx = index_fps.select(
        "fp",
        F.col("canonical_id").alias("_idx_canonical"),
        F.col("n_docs").alias("_idx_n"),
    )
    merged = batch_groups.join(idx, "fp", "left").select(
        "fp",
        F.when(
            F.col("_idx_canonical").isNotNull(),
            F.least("_idx_canonical", "_batch_min"),
        )
        .otherwise(F.col("_batch_min"))
        .alias("canonical_id"),
        (F.coalesce("_idx_n", F.lit(0)) + F.col("_batch_n")).alias("group_size"),
        F.col("_idx_canonical").isNotNull().alias("in_index"),
    )
    return (
        fp_new.join(merged, "fp")
        .select(id_col, "canonical_id", "group_size", "in_index")
        .withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))
        .select(id_col, "canonical_id", "group_size", "is_dup", "in_index")
    )


def minhash_lsh_delta(
    new_docs: DataFrame,
    index_sigs: DataFrame,
    old_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.4,
    hot: DataFrame | None = None,
    broadcast_new: bool = False,
) -> DataFrame:
    """Near-duplicate pairs touching a NEW batch, against an at-rest
    MinHash-signature index. Output: (id_a, id_b, jaccard), id_a <
    id_b, at least one id from the new batch. Ids must be globally
    unique across batches (crawl ids are).

    Candidates = new-batch buckets ⋈ index buckets (new×old) ∪
    new-batch self-join (new×new); verification is true n-gram Jaccard
    over the frozen universe, computed from the new batch's shingles
    plus the shingles of ONLY the candidate old docs (``old_docs``
    semi-joined on the candidate id set — the corpus relation is the
    text store; the index never duplicates text). With ``hot=None``
    and an uncapped batch run this equals ``minhash_lsh_pairs(old ∪
    new)`` restricted to new-touching pairs (pinned in pytest).

    ``broadcast_new`` broadcasts the new batch's bucket relation so
    the index-side probe is map-side over the index scan (no index
    shuffle) — use when the crawl batch is broadcast-sized; otherwise
    the equi-join shuffles both sides and a production deployment
    stores signatures ``bucketBy(bucket)`` to co-locate (module doc).
    """
    new_sh = _persist_latest(
        _DELTA_SHINGLE_CACHE,
        _frozen_capped(_word_shingles(new_docs, id_col, text_col, n), hot),
    )
    new_sig = minhash_signatures(new_docs, id_col, text_col, n, k, _shingles=new_sh)
    new_b = _persist_latest(
        _NEW_BUCKETS_CACHE, band_buckets(new_sig, id_col, k, bands)
    )
    old_b = band_buckets(index_sigs, id_col, k, bands)

    probe = F.broadcast(new_b) if broadcast_new else new_b
    cand_no = _persist_latest(
        _DELTA_CAND_CACHE,
        probe.alias("nw")
        .join(old_b.alias("od"), "bucket")
        .select(
            F.least(F.col(f"nw.{id_col}"), F.col(f"od.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"nw.{id_col}"), F.col(f"od.{id_col}")).alias("id_b"),
        )
        .distinct(),
    )
    cand_nn = (
        new_b.alias("a")
        .join(new_b.alias("b"), "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    candidates = cand_no.union(cand_nn).distinct()

    # shingles for verification: the new batch + ONLY candidate olds
    old_cand_ids = (
        cand_no.select(F.col("id_a").alias(id_col))
        .union(cand_no.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # plain semi-join — the candidate-id set is data-dependent and
    # unbounded (boilerplate-heavy corpora amplify bucket collisions),
    # so forcing a broadcast here could exceed the broadcast cap on
    # exactly the inputs that need the delta most; AQE still converts
    # it to a broadcast at runtime when the set is actually small.
    old_cand = old_docs.join(old_cand_ids, id_col, "left_semi")
    old_cand_sh = _frozen_capped(
        _word_shingles(old_cand, id_col, text_col, n), hot
    )
    verify_sh = _persist_latest(
        _VERIFY_SHINGLE_CACHE, new_sh.unionByName(old_cand_sh)
    )
    return ngram_jaccard_pairs(
        new_docs,  # unused (shingles handed in); keeps the signature
        id_col,
        text_col,
        n,
        threshold,
        _shingles=verify_sh,
        _candidates=candidates,
    )


# ---------------------------------------------------------------------------
# at-rest IO
# ---------------------------------------------------------------------------


def _write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic manifest rewrite — the commit point for build/append."""
    tmp = os.path.join(index_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(index_dir, _MANIFEST))


def _read_manifest(index_dir: str) -> dict:
    path = os.path.join(index_dir, _MANIFEST)
    try:
        with open(path) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(f"no dedup index manifest at {path}")
    if manifest.get("version") != DEDUP_INDEX_VERSION:
        raise ValueError(
            f"dedup index at {index_dir} has version "
            f"{manifest.get('version')!r}, this build expects "
            f"{DEDUP_INDEX_VERSION} — rebuild the index (fingerprint/"
            "signature semantics changed; serving deltas across "
            "versions would silently mix universes)"
        )
    return manifest


def _write_batch(
    docs: DataFrame,
    index_dir: str,
    batch: str,
    params: dict,
    hot: DataFrame | None,
    sigs: DataFrame | None = None,
) -> int:
    """Write one batch's fingerprint + signature relations; returns the
    batch doc count, read back from the just-written (tiny, aggregated)
    fingerprint relation instead of a third full scan of the batch."""
    fp_path = os.path.join(index_dir, "fingerprints", batch)
    index_fingerprints(docs, params["id_col"], params["text_col"]).write.mode(
        "overwrite"
    ).parquet(fp_path)
    if sigs is None:
        sigs = index_signatures(
            docs,
            params["id_col"],
            params["text_col"],
            n=params["n"],
            k=params["k"],
            hot=hot,
        )
    sigs.write.mode("overwrite").parquet(os.path.join(index_dir, "signatures", batch))
    n = (
        docs.sparkSession.read.parquet(fp_path)
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    return int(n or 0)


def write_dedup_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 12,
    bands: int = 4,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> dict:
    """Build a fresh dedup index over ``docs``; returns the manifest.
    The hot-shingle universe is computed here and FROZEN — appends and
    deltas reuse it (module doc)."""
    import uuid

    os.makedirs(index_dir, exist_ok=True)
    params = {
        "id_col": id_col,
        "text_col": text_col,
        "n": n,
        "k": k,
        "bands": bands,
        "max_shingle_df": max_shingle_df,
    }
    # every build writes under FRESH unique names, manifest-committed
    # last — so rebuilding over an existing index is crash-safe too: a
    # death mid-rebuild leaves the OLD manifest pointing at intact OLD
    # directories, never at half-written new data (append always wrote
    # fresh dirs; this extends the guarantee to rebuilds)
    token = uuid.uuid4().hex[:8]
    # hot set + signatures off ONE persisted shingle explode
    sigs, hot = live_index_relations(
        docs, id_col, text_col, n, k, max_shingle_df
    )
    hot_dir = None
    if hot is not None:
        hot = hot.persist()
        n_hot = hot.count()  # materialize before reuse; also manifest stat
        hot_dir = f"hot_{token}"
        hot.write.mode("overwrite").parquet(os.path.join(index_dir, hot_dir))
    else:
        n_hot = 0
    batch = f"b0_{token}"
    n_docs = _write_batch(docs, index_dir, batch, params, hot, sigs=sigs)
    if hot is not None:
        hot.unpersist()
    manifest = {
        "version": DEDUP_INDEX_VERSION,
        "params": params,
        "batches": [batch],
        "n_docs": n_docs,
        "n_hot_shingles": n_hot,
        "hot_dir": hot_dir,
    }
    _write_manifest(index_dir, manifest)
    return manifest


def load_dedup_index(spark: SparkSession, index_dir: str) -> dict:
    """Load an at-rest index: manifest + live relations. Returns
    ``{"manifest", "fps", "sigs", "hot"}`` — ``fps`` re-aggregated
    across batches (min canonical / summed counts: lossless), ``sigs``
    the batch union, ``hot`` the frozen set or None. Fails loud on a
    version mismatch (see ``_read_manifest``)."""
    manifest = _read_manifest(index_dir)
    fps_parts = [
        spark.read.parquet(os.path.join(index_dir, "fingerprints", b))
        for b in manifest["batches"]
    ]
    fps = fps_parts[0]
    for part in fps_parts[1:]:
        fps = fps.unionByName(part)
    if len(fps_parts) > 1:
        fps = fps.groupBy("fp").agg(
            F.min("canonical_id").alias("canonical_id"),
            F.sum("n_docs").alias("n_docs"),
        )
    sig_parts = [
        spark.read.parquet(os.path.join(index_dir, "signatures", b))
        for b in manifest["batches"]
    ]
    sigs = sig_parts[0]
    for part in sig_parts[1:]:
        sigs = sigs.unionByName(part)
    hot = (
        spark.read.parquet(os.path.join(index_dir, manifest["hot_dir"]))
        if manifest["hot_dir"]
        else None
    )
    return {"manifest": manifest, "fps": fps, "sigs": sigs, "hot": hot}


def append_dedup_index(
    spark: SparkSession, index_dir: str, new_docs: DataFrame
) -> dict:
    """Append a new batch to an existing index (the index-append half
    of the crawl loop: delta-dedup the batch, then append its survivors
    — or the whole batch — so the NEXT crawl sees it). Params come from
    the manifest (an append cannot change the universe); the new
    uniquely-named batch directory is invisible until the atomic
    manifest rewrite commits it, so a crashed append leaves an ignored
    orphan and a re-run simply writes a fresh one (resume-safe, pinned
    in pytest)."""
    import uuid

    manifest = _read_manifest(index_dir)
    params = manifest["params"]
    hot = (
        spark.read.parquet(os.path.join(index_dir, manifest["hot_dir"]))
        if manifest["hot_dir"]
        else None
    )
    batch = f"b{len(manifest['batches'])}_{uuid.uuid4().hex[:8]}"
    n_new = _write_batch(new_docs, index_dir, batch, params, hot)
    manifest["batches"] = manifest["batches"] + [batch]
    manifest["n_docs"] += n_new
    _write_manifest(index_dir, manifest)
    return manifest


def exact_delta_from_index(index: dict, new_docs: DataFrame) -> DataFrame:
    """``exact_dedup_delta`` wired from a loaded index (params from the
    manifest, so a caller can't accidentally mismatch universes)."""
    p = index["manifest"]["params"]
    return exact_dedup_delta(new_docs, index["fps"], p["id_col"], p["text_col"])


def lsh_delta_from_index(
    index: dict,
    new_docs: DataFrame,
    old_docs: DataFrame,
    threshold: float = 0.4,
    broadcast_new: bool = False,
) -> DataFrame:
    """``minhash_lsh_delta`` wired from a loaded index (params from the
    manifest)."""
    p = index["manifest"]["params"]
    return minhash_lsh_delta(
        new_docs,
        index["sigs"],
        old_docs,
        id_col=p["id_col"],
        text_col=p["text_col"],
        n=p["n"],
        k=p["k"],
        bands=p["bands"],
        threshold=threshold,
        hot=index["hot"],
        broadcast_new=broadcast_new,
    )
