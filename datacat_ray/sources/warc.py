"""WARC source: read Common-Crawl-style web archives into the pages schema.

WARC (ISO 28500, the public Common-Crawl container format) stores a
sequence of records, each a version line + header block + Content-Length
payload; ``response`` records carry an HTTP message whose body is the
page. This module provides:

- ``write_warc`` — fixture/test writer (gzip or plain),
- ``parse_warc_bytes`` — record parser (url, warc_ts µs, html bytes),
- ``read_warc`` — a Ray Dataset of pages-schema rows: one read task per
  WARC file via ``read_binary_files`` + a flat parse ``map_batches``.
  Common-Crawl segment files are ~1 GB, one blob per task — sized to the
  worker heap like any wide-binary batch; a Datasource subclass that
  streams records within a file is the refinement path if single files
  outgrow the heap.

The pages schema matches ``fixtures.PAGES_SCHEMA`` (url, warc_ts, html,
text, lang), so ``build_extract_pipeline`` consumes WARC input unchanged.
"""

from __future__ import annotations

import datetime
import gzip
import io

import pyarrow as pa

_CRLF = b"\r\n"


def _warc_date(ts_us: int) -> str:
    dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=ts_us)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> int:
    """WARC-Date → epoch µs; accepts WARC 1.0 whole-second and WARC 1.1
    fractional-second forms. Epoch math on naive datetimes — never
    ``.timestamp()``, which would shift by the host's local timezone."""
    s = s.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            dt = datetime.datetime.strptime(s, fmt)
        except ValueError:
            continue
        return (dt - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
            microseconds=1
        )
    raise ValueError(f"unparseable WARC-Date: {s!r}")


def write_warc(path: str, records: list[dict], compress: bool = True) -> str:
    """Write (url, warc_ts µs, html bytes) records as WARC/1.0 responses.
    ``compress=True`` writes one gzip member per record (the Common-Crawl
    layout, readable by streaming decompressors member-by-member)."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html; charset=utf-8" + _CRLF
            + f"Content-Length: {len(r['html'])}".encode() + _CRLF
            + _CRLF
            + r["html"]
        )
        rec = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + f"WARC-Target-URI: {r['url']}".encode() + _CRLF
            + f"WARC-Date: {_warc_date(r['warc_ts'])}".encode() + _CRLF
            + f"WARC-Record-ID: <urn:uuid:rec-{i:08d}>".encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response" + _CRLF
            + f"Content-Length: {len(http)}".encode() + _CRLF
            + _CRLF
            + http
            + _CRLF + _CRLF
        )
        out.write(gzip.compress(rec) if compress else rec)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())
    return path


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse WARC bytes (gzip members or plain) → list of
    {url, warc_ts (µs int), html (bytes)} from response records. Thin
    wrapper over the streaming iterator — ONE parser for both paths."""
    if data[:2] == b"\x1f\x8b":
        # concatenated gzip members: GzipFile reads through all of them
        return list(iter_warc_records(gzip.GzipFile(fileobj=io.BytesIO(data))))
    return list(iter_warc_records(io.BytesIO(data)))


def _read_exact(stream, n: int) -> bytes:
    """Read exactly n bytes (file-like objects may short-read)."""
    chunks = []
    while n > 0:
        b = stream.read(n)
        if not b:
            break
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


def _read_header_block(stream) -> bytes | None:
    """Read lines up to the blank line ending a WARC header block
    (skipping leading record-separator blank lines); None at EOF."""
    while True:  # skip inter-record separators
        line = stream.readline()
        if not line:
            return None
        if line.strip():
            break
    lines = [line]
    while True:
        line = stream.readline()
        if not line or not line.strip():
            return b"".join(lines)
        lines.append(line)


def _iter_raw_records(stream):
    """Incrementally yield (headers dict, payload bytes) per WARC record
    from a DECOMPRESSED stream — constant memory per record. A malformed
    Content-Length ends the file gracefully (framing is unrecoverable
    past it) instead of raising out of the read task."""
    while True:
        head = _read_header_block(stream)
        if head is None:
            return
        lines = head.decode("utf-8", errors="replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            return
        hdr = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                hdr[k.strip().lower()] = v.strip()
        try:
            length = int(hdr.get("content-length", "0"))
        except ValueError:
            return
        yield hdr, _read_exact(stream, length)


def iter_warc_records(stream):
    """Incrementally yield {url, warc_ts, html} response records from a
    DECOMPRESSED WARC byte stream (the single shared record parser)."""
    for hdr, payload in _iter_raw_records(stream):
        if hdr.get("warc-type") != "response":
            continue
        body_at = payload.find(_CRLF + _CRLF)
        html = payload[body_at + 4 :] if body_at >= 0 else b""
        try:
            ts = _parse_warc_date(hdr.get("warc-date", ""))
        except ValueError:
            ts = 0
        yield {
            "url": hdr.get("warc-target-uri", ""), "warc_ts": ts, "html": html
        }


class WarcDatasource:
    """Streaming WARC datasource: each file is read as a stream and
    records batch out incrementally (``records_per_block`` rows per Arrow
    block), so a 1 GB Common-Crawl segment never has to fit a worker heap
    — the scale-true read path. Gzip (member-per-record, the CC layout)
    is detected by magic and decompressed on the fly."""

    def __new__(cls, paths, records_per_block: int = 256):
        from ray.data.datasource import FileBasedDatasource

        class _Impl(FileBasedDatasource):
            _FILE_EXTENSIONS = None  # accept any listed path

            def _read_stream(self, f, path):
                import gzip as _gz
                import logging
                import zlib

                head = f.read(2)
                buffered = io.BufferedReader(_RawChain(head, f))
                if head == b"\x1f\x8b":
                    stream = _gz.GzipFile(fileobj=buffered)
                else:
                    stream = buffered
                batch: list[dict] = []
                n_ok = 0
                records = iter_warc_records(stream)
                while True:
                    try:
                        rec = next(records)
                    except StopIteration:
                        break
                    except (EOFError, OSError, zlib.error) as exc:
                        # truncated/corrupt gzip member mid-segment — a
                        # real Common-Crawl failure mode. Keep the readable
                        # prefix (framing past the corruption is gone)
                        # instead of killing the read task.
                        logging.getLogger(__name__).warning(
                            "WARC segment %s truncated/corrupt after %d "
                            "records (%s: %s) — keeping the readable "
                            "prefix", path, n_ok,
                            type(exc).__name__, exc,
                        )
                        break
                    n_ok += 1
                    batch.append(rec)
                    if len(batch) >= records_per_block:
                        yield _records_table(batch)
                        batch = []
                if batch:
                    yield _records_table(batch)

        return _Impl(paths)


class _RawChain(io.RawIOBase):
    """Prepend already-read sniff bytes back onto a stream; RawIOBase so
    ``io.BufferedReader`` supplies efficient read()/readline() on top."""

    def __init__(self, head: bytes, f):
        self._head = head
        self._f = f

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        if self._head:
            n = min(len(b), len(self._head))
            b[:n] = self._head[:n]
            self._head = self._head[n:]
            return n
        data = self._f.read(len(b))
        if not data:
            return 0
        b[: len(data)] = data
        return len(data)


def _records_table(recs: list[dict]) -> pa.Table:
    from datacat_ray.fixtures import PAGES_SCHEMA

    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in recs],
            "warc_ts": [r["warc_ts"] for r in recs],
            "html": [r["html"] for r in recs],
            "text": [None] * len(recs),
            "lang": [None] * len(recs),
        },
        schema=PAGES_SCHEMA,
    )


def read_warc(paths, records_per_block: int = 256) -> "ray.data.Dataset":
    """WARC file(s) → Dataset in the pages schema (url, warc_ts, html,
    text, lang), streamed record-by-record via ``WarcDatasource``."""
    import ray.data

    return ray.data.read_datasource(
        WarcDatasource(paths, records_per_block=records_per_block)
    )


def extract_pages_warc(paths, cfg=None) -> "ray.data.Dataset":
    """Flagship cascade directly over WARC input: read_warc → exact
    bucketed keep-latest dedup (the winner-prefilter variant needs a
    parquet-statistics pass, so WARC uses the groupby path) → fused
    extraction."""
    from datacat_ray.config import PipelineConfig
    from datacat_ray.pipelines.extract import build_extract_pipeline

    return build_extract_pipeline(read_warc(paths), cfg or PipelineConfig())


# ---------------------------------------------------------------------------
# WET sink: Common-Crawl's extracted-plain-text format (WARC conversion
# records) — the canonical output of a main-content extraction pipeline
# ---------------------------------------------------------------------------


def _wet_record(url: str, ts_us: int, text: str) -> bytes:
    body = text.encode("utf-8")
    return (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: conversion" + _CRLF
        + f"WARC-Target-URI: {url}".encode() + _CRLF
        + f"WARC-Date: {_warc_date(ts_us)}".encode() + _CRLF
        + b"Content-Type: text/plain" + _CRLF
        + f"Content-Length: {len(body)}".encode() + _CRLF
        + _CRLF
        + body
        + _CRLF + _CRLF
    )


def parse_wet_bytes(data: bytes) -> list[dict]:
    """WET bytes → [{url, warc_ts, text}] from conversion records (shared
    record parser, conversion filter + text decode)."""
    if data[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        stream = io.BytesIO(data)
    out = []
    for hdr, payload in _iter_raw_records(stream):
        if hdr.get("warc-type") != "conversion":
            continue
        try:
            ts = _parse_warc_date(hdr.get("warc-date", ""))
        except ValueError:
            ts = 0
        out.append(
            {"url": hdr.get("warc-target-uri", ""), "warc_ts": ts,
             "text": payload.decode("utf-8", "replace")}
        )
    return out


_EPOCH = datetime.datetime(1970, 1, 1)


def write_wet(ds, out_dir: str, compress: bool = True) -> list[dict]:
    """Distributed WET sink: each Arrow block of (url, warc_ts, main_text)
    writes its own ``part-<sha>.warc.wet[.gz]`` shard (atomic rename,
    shard name derived from the block's url set). After all shards land, a
    ``wet_manifest.json`` is published atomically and any ``*.warc.wet*``
    file NOT in it is removed — a re-run with different block boundaries
    cannot leave stale shards that duplicate records. Returns the shard
    list."""
    import hashlib
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        tss = t["warc_ts"].to_pylist()
        texts = t["main_text"].to_pylist()
        blob = io.BytesIO()
        for u, ts, tx in zip(urls, tss, texts):
            if hasattr(ts, "timestamp"):
                # naive UTC datetime: epoch math, never .timestamp()
                # (which reinterprets in the host's LOCAL timezone)
                ts_us = (ts - _EPOCH) // datetime.timedelta(microseconds=1)
            else:
                ts_us = int(ts or 0)
            rec = _wet_record(u, ts_us, tx or "")
            blob.write(gzip.compress(rec) if compress else rec)
        sha = hashlib.sha1("\n".join(sorted(urls)).encode()).hexdigest()[:12]
        ext = ".warc.wet.gz" if compress else ".warc.wet"
        name = f"part-{sha}{ext}"
        tmp = os.path.join(out_dir, f".tmp.{name}.{os.getpid()}")
        with open(tmp, "wb") as fh:
            fh.write(blob.getvalue())
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.Table.from_pydict(
            {"shard": [name], "n_records": pa.array([len(urls)], pa.int64())}
        )

    shards = ds.map_batches(_write, batch_format="pyarrow").take_all()
    live = {s["shard"] for s in shards}
    mtmp = os.path.join(out_dir, f".tmp.wet_manifest.json.{os.getpid()}")
    with open(mtmp, "w") as fh:
        json.dump(sorted(live), fh, indent=1)
    os.replace(mtmp, os.path.join(out_dir, "wet_manifest.json"))
    for f in os.listdir(out_dir):
        if ".warc.wet" in f and f not in live and not f.startswith(".tmp."):
            os.unlink(os.path.join(out_dir, f))
    return shards
