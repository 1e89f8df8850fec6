"""At-rest seen-url set — the persistent half of the crawl frontier.

:func:`operators.urls.url_frontier_delta` decides fetch/skip against a
``seen`` relation; this module is that relation at rest, closing the
crawl loop the same way ``operators.dedup_index`` closes the dedup
loop (and with the same commit discipline):

* batches live under uniquely-named ``b{i}_{token}/`` parquet dirs;
* ``seen.json`` is rewritten atomically (tmp + ``os.replace``) AFTER
  the batch lands — a crash mid-append leaves an invisible orphan dir
  and the previous manifest intact (resume = re-run the append);
* the manifest pins ``SEEN_SET_VERSION``: canonicalization semantics
  live in :func:`operators.urls.canonicalize_url`, and a set built
  under different semantics must fail loud, not silently re-crawl or
  silently skip (the ``DEDUP_INDEX_VERSION`` discipline).

THE invariant: one row per canonical url across ALL batches. The
builder distincts once (the one permissible shuffle — index build);
appends preserve it either by trusting the caller (``assume_unseen=
True`` — the crawl-loop path, where the appended relation IS the
frontier's ``to_crawl`` output, already proven unseen by the probe)
or by re-running the frontier probe themselves. The historical set is
never re-shuffled on append: the probe is the broadcast LEFT-SEMI
scan from ``url_frontier_delta``.

The reference's analogue is its ingest-time duplicate rejection
(``routers/batches.py:381`` — hash-vs-DB before storing); a crawler
needs the same membership test BEFORE the fetch, at 10^12-url scale.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEEN_SET_VERSION = 1

_MANIFEST = "seen.json"


def _write_manifest(set_dir: str, manifest: dict) -> None:
    tmp = os.path.join(set_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(set_dir, _MANIFEST))


def _read_manifest(set_dir: str) -> dict:
    path = os.path.join(set_dir, _MANIFEST)
    try:
        with open(path) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(f"no seen-set manifest at {path}")
    if manifest.get("version") != SEEN_SET_VERSION:
        raise ValueError(
            f"seen-set at {set_dir} has version "
            f"{manifest.get('version')!r}, this build expects "
            f"{SEEN_SET_VERSION} — rebuild (canonicalization semantics "
            "changed; membership across versions is meaningless)"
        )
    return manifest


def _write_batch(urls: DataFrame, set_dir: str, batch: str) -> int:
    path = os.path.join(set_dir, batch)
    urls.select("canon_url").write.mode("overwrite").parquet(path)
    n = urls.sparkSession.read.parquet(path).count()
    return int(n)


def write_seen_set(
    urls: DataFrame, set_dir: str, url_col: str = "canon_url"
) -> dict:
    """Build a fresh seen-set from already-canonical urls; the one
    ``distinct`` shuffle establishes the one-row-per-url invariant."""
    os.makedirs(set_dir, exist_ok=True)
    batch = f"b0_{uuid.uuid4().hex[:8]}"
    n = _write_batch(
        urls.select(F.col(url_col).alias("canon_url")).distinct(),
        set_dir,
        batch,
    )
    manifest = {
        "version": SEEN_SET_VERSION,
        "batches": [batch],
        "n_urls": n,
    }
    _write_manifest(set_dir, manifest)
    return manifest


def load_seen_set(spark: SparkSession, set_dir: str) -> DataFrame:
    """The seen relation (one row per canonical url — the batch union
    is disjoint by the append invariant, so no distinct on read)."""
    manifest = _read_manifest(set_dir)
    parts = [
        spark.read.parquet(os.path.join(set_dir, b))
        for b in manifest["batches"]
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def append_seen_set(
    spark: SparkSession,
    set_dir: str,
    urls: DataFrame,
    url_col: str = "canon_url",
    assume_unseen: bool = False,
) -> dict:
    """Append canonical urls after a crawl commits. ``assume_unseen=
    True`` is the crawl-loop fast path: the appended relation is the
    frontier's ``to_crawl`` output, already disjoint from the set by
    the probe that produced it — only a within-batch distinct runs.
    Otherwise the unseen subset is computed here with the same
    broadcast semi-probe (historical set scanned map-side, never
    shuffled). Crash-safe: the fresh batch dir is invisible until the
    atomic manifest rewrite."""
    manifest = _read_manifest(set_dir)
    batch_urls = (
        urls.select(F.col(url_col).alias("canon_url")).distinct()
    )
    if not assume_unseen:
        seen_keys = load_seen_set(spark, set_dir)
        hits = seen_keys.join(
            F.broadcast(batch_urls), "canon_url", "leftsemi"
        )
        batch_urls = batch_urls.join(hits, "canon_url", "left_anti")
    batch = f"b{len(manifest['batches'])}_{uuid.uuid4().hex[:8]}"
    n = _write_batch(batch_urls, set_dir, batch)
    manifest["batches"] = manifest["batches"] + [batch]
    manifest["n_urls"] += n
    _write_manifest(set_dir, manifest)
    return manifest


def frontier_from_seen_set(
    spark: SparkSession,
    set_dir: str,
    new_urls: DataFrame,
    url_col: str = "url",
    id_col: str = "event_id",
    broadcast_new: bool = True,
) -> DataFrame:
    """``url_frontier_delta`` wired from the at-rest set — the per-crawl
    entry point: probe, fetch ``to_crawl``, then ``append_seen_set(...,
    assume_unseen=True)`` with the same rows."""
    from ai_pdf_extraction_spark.operators.urls import url_frontier_delta

    return url_frontier_delta(
        new_urls,
        load_seen_set(spark, set_dir),
        url_col=url_col,
        id_col=id_col,
        broadcast_new=broadcast_new,
    )
