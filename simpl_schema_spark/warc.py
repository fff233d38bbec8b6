"""WARC / WET web-archive sources (ISO 28500; WARC 1.0/1.1).

The north-rule input is an Iceberg table of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)`` — but the upstream artifact those
tables are BUILT from is the crawl itself: WARC files (raw HTTP
responses) and WET files (pre-extracted plain text).  This module is the
ingestion edge: ``read_warc`` / ``read_wet`` parse archive files into a
DataFrame, and :func:`warc_to_documents` shapes the result into exactly
the engine's canonical page schema so every downstream operator
(validation, dedup, text analysis, sinks.write_documents) composes.

Spark-first shape
-----------------
Files are read with ``spark.read.format("binaryFile")`` (one row per
file, whole content) and parsed by an Arrow-batched ``mapInPandas``
stage — pure-Python stdlib parsing (``gzip`` + byte scanning), no
external libraries.  Parallelism is FILE-level, which is the right
granularity at crawl scale:

- a Common Crawl snapshot ships ~60-90k WARC/WET files of ~1 GB gzip
  each — file-level tasks saturate any executor fleet long before
  record-level splitting would help;
- the files are multi-member gzip, which is NOT block-splittable — any
  record-level split would re-read and re-inflate from the file start,
  so per-file tasks are also the efficient plan, not just the simple
  one.

Memory: one task materializes one file (~1 GB inflated).  Bound
concurrent tasks by executor memory (``spark.executor.cores`` ×
~1.5 GB head-room), not by ``spark.sql.files.maxPartitionBytes`` (which
binaryFile ignores — every file is one partition row regardless).

Reference mapping: the reference engine has no archive reader (it
validates in-memory documents); this source exists so its validation
semantics can be applied to the crawl the north rule names.  Record and
header grammar follow the public WARC spec (ISO 28500 / IIPC
warc-specifications) — headers are ``Name: value`` lines terminated by
CRLFCRLF, payload length is the mandatory ``Content-Length``, records
are separated by CRLFCRLF.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "read_warc",
    "read_wet",
    "warc_to_documents",
    "build_wet",
    "RECORD_SCHEMA",
]

#: one row per WARC record.  `error` carries per-record parse failures
#: under on_error='skip' (media.py policy): one corrupt record must not
#: abort a 90k-file ingestion job.
RECORD_SCHEMA = (
    "source_file string, record_offset long, record_type string, "
    "record_id string, url string, warc_ts timestamp, "
    "content_type string, http_status int, http_content_type string, "
    "payload binary, text string, content_length long, error string"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _inflate(content: bytes) -> bytes:
    """Whole-file inflate; multi-member gzip (the WARC packaging) reads
    as the concatenation of members, which GzipFile handles natively."""
    if content[:2] == _GZIP_MAGIC:
        with gzip.GzipFile(fileobj=io.BytesIO(content)) as fh:
            return fh.read()
    return content


def _parse_headers(block: bytes) -> dict:
    """WARC/HTTP header block → {lower-name: value}; continuation lines
    (ISO 28500 §4: leading SP/TAB) fold into the previous value."""
    headers: dict[str, str] = {}
    last = None
    for raw in block.split(b"\r\n"):
        if not raw:
            continue
        if raw[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + raw.strip().decode("latin-1")
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


def _parse_warc_date(value: Optional[str]):
    """WARC-Date is ISO-8601 UTC (`2017-01-01T00:00:00Z`, optionally
    fractional seconds in 1.1).  Returns a tz-naive UTC datetime (Spark
    session tz is UTC in this engine's jobs)."""
    if not value:
        return None
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _split_http(payload: bytes):
    """HTTP response message → (status, content-type, body).  Anything
    that does not look like HTTP returns (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None, payload
    lines = head.split(b"\r\n", 1)
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    headers = _parse_headers(lines[1] if len(lines) > 1 else b"")
    return status, headers.get("content-type"), body


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield raw record dicts from an INFLATED WARC/WET byte stream.

    Tolerant scan: a malformed record yields one dict with ``error`` set
    and scanning resumes at the next ``WARC/`` marker, so one bad record
    costs one row, not the file.
    """
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            nxt = data.find(b"\r\nWARC/", pos)
            yield {
                "record_offset": pos,
                "error": "desynchronized: no WARC/ marker at record start",
            }
            if nxt < 0:
                return
            pos = nxt + 2
            continue
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            yield {"record_offset": pos, "error": "truncated header block"}
            return
        headers = _parse_headers(data[pos + data[pos:head_end].find(b"\r\n") + 2 : head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            yield {
                "record_offset": pos,
                "error": "missing or non-numeric Content-Length",
            }
            nxt = data.find(b"\r\nWARC/", head_end)
            if nxt < 0:
                return
            pos = nxt + 2
            continue
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            yield {
                "record_offset": pos,
                "error": f"truncated payload: need {length} bytes, have {n - body_start}",
            }
            return
        yield {
            "record_offset": pos,
            "headers": headers,
            "payload": data[body_start:body_end],
            "error": None,
        }
        pos = body_end


def _records_to_rows(
    path: str,
    content: bytes,
    record_types: Optional[tuple],
    parse_http: bool,
    on_error: str,
) -> Iterator[dict]:
    try:
        data = _inflate(content)
    except OSError as exc:
        if on_error == "raise":
            raise
        yield {
            "source_file": path,
            "record_offset": 0,
            "error": f"gzip: {exc}",
        }
        return
    for rec in iter_warc_records(data):
        if rec.get("error"):
            if on_error == "raise":
                raise ValueError(
                    f"{path} @{rec['record_offset']}: {rec['error']}"
                )
            yield {"source_file": path, **{k: rec.get(k) for k in ("record_offset", "error")}}
            continue
        h = rec["headers"]
        rtype = h.get("warc-type")
        if record_types is not None and rtype not in record_types:
            continue
        payload = rec["payload"]
        status = http_ct = None
        text = None
        if rtype == "conversion":
            # WET: the payload IS the extracted text (UTF-8 per spec)
            text = payload.decode("utf-8", errors="replace")
        elif parse_http and h.get("content-type", "").startswith(
            "application/http"
        ):
            status, http_ct, payload = _split_http(payload)
        yield {
            "source_file": path,
            "record_offset": rec["record_offset"],
            "record_type": rtype,
            "record_id": h.get("warc-record-id"),
            "url": h.get("warc-target-uri"),
            "warc_ts": _parse_warc_date(h.get("warc-date")),
            "content_type": h.get("content-type"),
            "http_status": status,
            "http_content_type": http_ct,
            "payload": payload,
            "text": text,
            "content_length": len(payload) if payload is not None else None,
            "error": None,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: Optional[tuple] = ("response",),
    parse_http: bool = True,
    on_error: str = "skip",
    path_glob: Optional[str] = None,
) -> DataFrame:
    """WARC files under ``path`` → one row per record (RECORD_SCHEMA).

    ``record_types`` filters records DURING the parse (None = all) —
    request/metadata records are skipped before they are materialized,
    which is most of the bytes in a response-only read.  ``parse_http``
    splits ``application/http`` payloads into (status, content-type,
    body).  ``on_error='skip'`` (default — media.py policy) turns
    malformed records/files into rows with ``error`` set; ``'raise'``
    aborts.  ``path_glob`` forwards to binaryFile's ``pathGlobFilter``
    (e.g. ``"*.warc.gz"``).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")
    rts = tuple(record_types) if record_types is not None else None

    cols = [f.split()[0] for f in RECORD_SCHEMA.split(", ")]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in _records_to_rows(
                    path_, bytes(content), rts, parse_http, on_error
                ):
                    # every column present (error rows carry a subset) so
                    # Arrow sees uniform object columns, None not NaN
                    rows.append({c: rec.get(c) for c in cols})
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(batches, schema=RECORD_SCHEMA)


def read_wet(
    spark: SparkSession,
    path: str,
    *,
    on_error: str = "skip",
    path_glob: Optional[str] = None,
) -> DataFrame:
    """WET (extracted-text conversion) files → records with ``text``
    populated; convenience wrapper over ``read_warc`` selecting
    ``conversion`` records."""
    return read_warc(
        spark,
        path,
        record_types=("conversion",),
        parse_http=False,
        on_error=on_error,
        path_glob=path_glob,
    )


def build_wet(records, *, compress: bool = True) -> bytes:
    """Serialize ``(url, iso_date, text)`` triples into WET bytes —
    deterministic synthesis for tests/benchmarks (no external data).

    The unit tests deliberately do NOT use this builder (they construct
    bytes by hand against the spec) so builder and parser cannot share a
    bug; this helper is for fixture generation at volume.
    """
    out = io.BytesIO()
    for url, iso_date, text in records:
        payload = text.encode("utf-8")
        head = b"\r\n".join(
            [
                b"WARC/1.0",
                b"WARC-Type: conversion",
                b"WARC-Record-ID: <urn:wet:" + url.encode() + b">",
                b"WARC-Date: " + iso_date.encode(),
                b"WARC-Target-URI: " + url.encode(),
                b"Content-Type: text/plain",
                b"Content-Length: " + str(len(payload)).encode(),
            ]
        )
        out.write(head + b"\r\n\r\n" + payload + b"\r\n\r\n")
    data = out.getvalue()
    return gzip.compress(data, mtime=0) if compress else data


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Record rows → the engine's canonical page table
    ``(url, warc_ts, html, text, lang)`` (BASELINE.json input_hint).

    ``html`` is the HTTP body for response records; ``text`` is the WET
    extraction when present (join WARC+WET reads by url upstream, or run
    ``text.html.extract_text`` downstream for the in-engine extraction).
    ``lang`` is null here — language ID is an operator
    (``text.analysis.with_lang_id``), not an ingestion fact.  Error rows
    and record types without a target URI are dropped; one row per
    (url, warc_ts) survives per file (last wins deterministically by
    record offset) so re-crawled duplicates inside a file cannot double
    downstream counts.
    """
    recs = records.where(
        F.col("error").isNull() & F.col("url").isNotNull()
    ).select(
        "url",
        "warc_ts",
        F.when(F.col("record_type") == "response", F.col("payload"))
        .otherwise(F.lit(None).cast("binary"))
        .alias("html"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        "source_file",
        "record_offset",
    )
    # deterministic last-record-wins without a global window: max(struct)
    # per key — same single-hash-agg idiom as dedup.keep_best
    picked = recs.groupBy("url", "warc_ts").agg(
        F.max(
            F.struct("record_offset", "source_file", "html", "text", "lang")
        ).alias("r")
    )
    return picked.select(
        "url",
        "warc_ts",
        F.col("r.html").alias("html"),
        F.col("r.text").alias("text"),
        F.col("r.lang").alias("lang"),
    )
