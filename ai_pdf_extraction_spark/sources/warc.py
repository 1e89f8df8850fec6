"""WARC ingestion: Common Crawl's native container → the pages schema.

The crawl actually arrives as ~1 GB ``.warc.gz`` files (one gzip
member per record, concatenated); the standard processing shape is ONE
WARC FILE PER TASK — a ``binaryFile`` LISTING (paths only, content
pruned) fans out across executors and each task STREAM-parses its
file with the stdlib (``gzip.GzipFile`` over the open handle —
concatenated members parse natively), yielding bounded row batches as
it goes, so per-task memory never holds a whole file. No external
warc library; record parsing is the WARC/1.0 header grammar
(ISO 28500): headers block, blank line, ``Content-Length`` octets of
block, blank line pair.

At 10^12 docs the listing is a manifest of file paths; Spark schedules
one parse task per file and the extraction pipeline consumes the
resulting pages DataFrame unchanged (``plans.pipeline.run_extraction``
accepts any pages-shaped input).
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ai_pdf_extraction_spark.streaming.ingest import PAGES_SCHEMA


def iter_warc_records(stream) -> Iterator[tuple[dict, bytes]]:
    """Stream (headers, block) pairs from a binary file-like of
    UNCOMPRESSED WARC bytes. Tolerant of leading/trailing blank lines;
    stops cleanly at EOF or on a malformed length."""
    while True:
        # skip record separators
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return  # lost sync: stop rather than misattribute payloads
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if hline in (b"\r\n", b"\n", b""):
                break
            if b":" in hline:
                k, v = hline.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            return  # crafted negative length would slurp the rest
        block = stream.read(length)
        if len(block) < length:
            return  # truncated file: drop the partial record
        yield headers, block


def _http_payload(block: bytes) -> bytes:
    """Strip the HTTP response envelope from a ``response`` record's
    block (payload follows the first blank line)."""
    if block[:5] in (b"HTTP/",):
        for sep in (b"\r\n\r\n", b"\n\n"):
            idx = block.find(sep)
            if idx != -1:
                return block[idx + len(sep):]
    return block


def _parse_warc_ts(value: str):
    try:
        return datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None


def iter_page_rows(stream) -> Iterator[dict]:
    """``response`` records from an UNCOMPRESSED byte stream → pages
    rows, ONE AT A TIME — the streaming core shared by the distributed
    reader and :func:`warc_bytes_to_rows`. A gzip error mid-stream ends
    the iteration cleanly (records already yielded survive — one
    damaged crawl file must never fail the task, ST3). ``zlib.error``
    is caught explicitly: corrupt DEFLATE data inside a gzip member
    raises it directly, and it is NOT an OSError subclass."""
    try:
        for headers, block in iter_warc_records(stream):
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri")
            if not url:
                continue
            yield {
                "url": url,
                "warc_ts": _parse_warc_ts(headers.get("warc-date", "")),
                "html": _http_payload(block),
                "text": None,
                "lang": None,
            }
    except (OSError, EOFError, zlib.error):
        return


def warc_bytes_to_rows(name: str, raw: bytes) -> list[dict]:
    """One WARC file's bytes → pages rows (``response`` records only).
    Gzip (incl. concatenated-member) and plain files both parse.
    Test/compat entry point — the distributed reader streams from file
    handles instead (:func:`read_warc`)."""
    if raw[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    return list(iter_page_rows(stream))


# Remote-filesystem seam: scheme → opener(uri) -> seekable binary
# handle. A cluster deployment registers its object-store client once
# per executor (s3 via boto3/fsspec, hdfs via pyarrow.fs, ...) and the
# path-per-task reader works unchanged against remote URIs. Kept as an
# explicit registry rather than a hard fsspec dependency: the sandbox
# ships no remote-FS client, and the local path must never grow one.
_FS_OPENERS: dict = {}


def register_warc_filesystem(scheme: str, opener) -> None:
    """Register ``opener(uri) -> seekable binary file handle`` for a
    URI scheme (e.g. ``"s3"``). The handle is owned by the reader task
    and closed when its stream is exhausted."""
    _FS_OPENERS[scheme.lower()] = opener


class _ClosingStream:
    """Delegating stream wrapper whose ``close()`` also closes the
    OWNED base handle — explicit ownership instead of assigning
    ``GzipFile.myfileobj`` (a CPython-private attribute; an internals
    change would silently leak fds on long-lived executors)."""

    def __init__(self, stream, base):
        self._stream = stream
        self._base = base

    def read(self, n: int = -1) -> bytes:
        return self._stream.read(n)

    def readline(self, limit: int = -1) -> bytes:
        return self._stream.readline(limit)

    def close(self) -> None:
        try:
            self._stream.close()
        finally:
            self._base.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_warc_stream(path: str, openers: dict | None = None):
    """Open a WARC path/URI as an uncompressed byte stream WITHOUT
    materializing the file: an opener resolved by scheme + a gzip
    wrapper when the magic says so (``GzipFile`` handles Common
    Crawl's concatenated members natively). ``close()`` on the
    returned stream closes the underlying handle too (explicit
    ``_ClosingStream`` ownership), so long-lived executors never leak
    fds. Handles bare paths and the ``file:`` URIs ``binaryFile``
    listings produce, including percent-encoded characters (Hadoop
    encodes e.g. spaces as ``%20``); other schemes route through
    :func:`register_warc_filesystem` (s3/hdfs — registered once per
    deployment), falling back to ``fsspec.open`` when that library is
    present. ``openers`` overlays extra scheme openers for this call —
    how the distributed reader ships driver-side registrations to
    Python workers (an explicit argument, not a module-global mutation:
    cloudpickled closures rebuild their globals in a shadow dict, so a
    worker-side registry update from inside the closure would never
    reach this module's real registry)."""
    # local (executor-side) registrations win over the shipped overlay:
    # a per-worker client carries real credentials/config
    registry = {**(openers or {}), **_FS_OPENERS}
    scheme = ""
    if "://" in path or path.startswith("file:"):
        scheme = path.split(":", 1)[0].lower()
    if scheme in ("", "file"):
        p = path
        if scheme == "file":
            from urllib.parse import unquote, urlparse

            p = unquote(urlparse(p).path)
        fh = open(p, "rb")
    elif scheme in registry:
        fh = registry[scheme](path)
    else:
        try:
            import fsspec
        except ImportError:
            raise ValueError(
                f"no opener for scheme {scheme!r} ({path}); register one "
                "with register_warc_filesystem() or install fsspec"
            ) from None
        fh = fsspec.open(path, "rb").open()
    try:
        magic = fh.read(2)
        fh.seek(0)
        if magic == b"\x1f\x8b":
            return _ClosingStream(gzip.GzipFile(fileobj=fh), fh)
        return fh
    except Exception:
        fh.close()
        raise


def iter_row_batches(
    path: str, batch_rows: int, openers: dict | None = None
) -> Iterator[list[dict]]:
    """Stream-parse one WARC file into row batches of ≤ ``batch_rows``.
    Peak state per yield is one batch plus gzip's window — never the
    whole file (the round-3 verdict's task-memory-envelope finding:
    ``binaryFile`` content materialized ~1 GB/file/task; a 2 GiB
    ``binaryFile`` hard cap also no longer applies)."""
    stream = open_warc_stream(path, openers=openers)
    try:
        batch: list[dict] = []
        for row in iter_page_rows(stream):
            batch.append(row)
            if len(batch) >= batch_rows:
                yield batch
                batch = []
        if batch:
            yield batch
    finally:
        stream.close()


def _paths_to_pages_gen(batch_rows: int):
    """The mapInPandas generator shared by the batch and streaming
    readers: path rows in, bounded pages batches out. Driver-side
    :func:`register_warc_filesystem` registrations snapshot into the
    closure here, so they reach the Python workers (whose fresh module
    import starts with an empty registry); executor-side registrations
    (long-lived clients set up per worker) take precedence — the
    snapshot is passed as an explicit overlay, never written into the
    worker's registry."""
    openers = dict(_FS_OPENERS)  # driver snapshot rides the closure

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name in pdf["path"]:
                for rows in iter_row_batches(name, batch_rows, openers=openers):
                    yield pd.DataFrame(
                        {
                            "url": [r["url"] for r in rows],
                            "warc_ts": pd.Series(
                                [r["warc_ts"] for r in rows], dtype="object"
                            ),
                            "html": [r["html"] for r in rows],
                            "text": pd.Series(
                                [r["text"] for r in rows], dtype="object"
                            ),
                            "lang": pd.Series(
                                [r["lang"] for r in rows], dtype="object"
                            ),
                        }
                    )

    return gen


def read_warc(
    spark: SparkSession,
    path: str | None = None,
    batch_rows: int = 256,
    paths: list[str] | None = None,
) -> DataFrame:
    """Distributed WARC → pages DataFrame. The ``binaryFile`` listing
    supplies file PATHS only (content pruned away — never loaded);
    the path list is collected ONCE at construction (one listing job —
    a crawl listing is ~10^6 paths, driver-trivial; previously a
    ``count`` here plus the execution-time scan listed twice) and
    parallelized one-file-per-slice, so each task STREAM-parses its
    file, yielding Arrow batches of ≤ ``batch_rows`` rows as it goes.
    One slice per file — never hash-partitioned on path, which would
    collide ~1/e of the buckets empty and hand some tasks 2-3 ~1 GB
    files (the straggler shape CLAUDE.md warns about). The output
    carries the exact PAGES_SCHEMA the extraction pipeline reads;
    per-task memory is bounded by batch_rows · max_record_size
    regardless of file size.

    ``paths=`` bypasses the Hadoop listing with an explicit manifest —
    the entry point for remote URIs handled by
    :func:`register_warc_filesystem` (schemes Hadoop can't list)."""
    if paths is None:
        if path is None:
            raise ValueError("read_warc needs path= or paths=")
        paths = [
            r["path"]
            for r in spark.read.format("binaryFile")
            .load(path)
            .select("path")
            .collect()
        ]
    rdd = spark.sparkContext.parallelize(
        [(p,) for p in paths], numSlices=max(len(paths), 1)
    )
    files = spark.createDataFrame(rdd, "path string")
    return files.mapInPandas(_paths_to_pages_gen(batch_rows), PAGES_SCHEMA)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    batch_rows: int = 256,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming twin of :func:`read_warc`: a ``binaryFile`` file
    stream supplies newly-arrived WARC paths (exactly-once via the
    query's checkpoint WAL), each micro-batch stream-parses its files
    with the SAME generator as the batch reader, and the result is a
    streaming pages DataFrame the extraction projection consumes
    unchanged — continuous crawl ingestion without a distinct code
    path. ``maxFilesPerTrigger`` bounds micro-batch size (files, and
    therefore memory, per trigger)."""
    files = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is
        # fixed by the format (content stays pruned — never selected)
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
        .select("path")
    )
    # same fan-out guarantee as the batch reader: without this, the
    # file-source scan packs small files into byte-sized partitions and
    # one task parses a whole trigger's files serially. Round-robin
    # over the session's parallelism spreads the ≤max_files_per_trigger
    # paths one-ish per task.
    files = files.repartition(spark.sparkContext.defaultParallelism)
    return files.mapInPandas(_paths_to_pages_gen(batch_rows), PAGES_SCHEMA)


# Bump when write_warc's record envelope changes: fixture caches
# (e.g. __spark_entry__._ensure_warc_fixtures) key on this so a format
# change can never silently reuse a stale on-disk shard.
WARC_FORMAT_VERSION = 1


def write_warc(path: str, rows: list[dict], compress: bool = True) -> int:
    """Test/fixture writer: pages rows → a spec-shaped WARC file
    (``response`` records with an HTTP envelope, one gzip member per
    record when compressed — the Common Crawl layout)."""
    out = io.BytesIO()
    for r in rows:
        ts = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"]
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {ts}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n" + http + b"\r\n\r\n"
        )
        out.write(gzip.compress(rec) if compress else rec)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())
    return len(rows)
