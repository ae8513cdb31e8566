"""WARC source: Common Crawl-style web archives → transcripts rows.

At 100 TB the natural input for a main-content extraction pipeline is a
crawl archive, not a pre-built table.  This reader turns WARC files
(ISO 28500 framing: `WARC/1.x` header block + CRLFCRLF + Content-Length
body + CRLFCRLF) into the pipeline's transcripts shape entirely inside
Spark: `binaryFile` scan → Arrow-batched Python parser (`mapInPandas`,
one record set per file) → (conv_id, turn_idx, role, text, tool, ts).

Scale notes: WARC members are per-record gzip streams, so a .warc.gz file
is NOT splittable — parallelism comes from the number of files, which is
how Common Crawl ships (thousands of ~1 GB segments).  Each task holds one
file's bytes; `spark.sql.files.maxPartitionBytes` does not apply to
binaryFile wholes, so segment size is the memory unit.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd

WARC_ROWS_DDL = (
    "warc_file STRING, record_id STRING, warc_type STRING, target_uri STRING, "
    "warc_date STRING, http_status INT, content_type STRING, payload STRING"
)


def parse_warc_bytes(data: bytes, max_payload: int = 16 * 1024 * 1024) -> list[dict]:
    """Parse one WARC file's bytes into response-record dicts.

    Handles plain and (multi-member) gzip files; skips records without the
    WARC/ magic; tolerates a truncated final record.  HTTP response bodies
    are decoded as UTF-8 with replacement (the kernel's parser is
    byte-agnostic beyond that).
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # Locate the record header block.
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"WARC/", pos)
            if nxt == -1:
                break
            pos = nxt
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end == -1:
            break
        header_block = data[pos:head_end].decode("utf-8", "replace")
        headers: dict[str, str] = {}
        for line in header_block.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        body = data[body_start : body_start + length]
        pos = body_start + length
        # Records are separated by CRLFCRLF.
        while data.startswith(b"\r\n", pos):
            pos += 2
        wtype = headers.get("warc-type", "")
        record = {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": wtype,
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "http_status": None,
            "content_type": headers.get("content-type", ""),
            "payload": None,
        }
        if wtype == "response" and body[:5] in (b"HTTP/",):
            # Split HTTP headers from the entity body.
            http_end = body.find(b"\r\n\r\n")
            if http_end != -1:
                status_line = body[: body.find(b"\r\n")].decode("utf-8", "replace")
                parts = status_line.split(" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    record["http_status"] = int(parts[1])
                record["payload"] = body[http_end + 4 :][:max_payload].decode(
                    "utf-8", "replace"
                )
        elif wtype in ("resource", "conversion"):
            record["payload"] = body[:max_payload].decode("utf-8", "replace")
        records.append(record)
    return records


def read_warc(spark, path: str):
    """path (glob of .warc / .warc.gz files) → DataFrame of WARC_ROWS_DDL."""
    from .pipeline import ensure_worker_imports

    ensure_worker_imports(spark)
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .warc import parse_warc_bytes  # executor-side import

        for batch in batches:
            rows = []
            for path_, content in zip(batch["path"], batch["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    rec["warc_file"] = path_
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "record_id", "warc_type", "target_uri",
                         "warc_date", "http_status", "content_type", "payload"],
            )

    return files.mapInPandas(parse, WARC_ROWS_DDL)


def warc_as_transcripts(warc_rows):
    """WARC response records → the transcripts input shape: one tool turn
    per successfully fetched page, conv keyed by target host."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    host = F.parse_url(F.col("target_uri"), F.lit("HOST"))
    w = Window.partitionBy(host).orderBy("warc_date", "record_id")
    return (
        warc_rows.filter(
            (F.col("warc_type") == "response") & (F.col("http_status") == 200)
        )
        .select(
            F.concat(F.lit("conv-"), F.coalesce(host, F.lit("unknown"))).alias(
                "conv_id"
            ),
            (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
            F.lit("tool").alias("role"),
            F.col("payload").alias("text"),
            F.lit("crawler").alias("tool"),
            F.to_timestamp("warc_date").alias("ts"),
        )
    )


def build_warc_bytes(pages: list[tuple[str, str, str]]) -> bytes:
    """Minimal WARC/1.0 writer for tests and fixtures:
    pages = [(url, iso_date, html)]."""
    out = bytearray()
    for i, (url, date, html) in enumerate(pages):
        http = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        ).encode()
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:test:{i}>\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        out += header + b"\r\n" + http + b"\r\n\r\n"
    return bytes(out)
