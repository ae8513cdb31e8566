"""Arrow-batch extraction kernel for ``DataFrame.mapInPandas``.

This is the JVM↔Python boundary of the pipeline (SURVEY.md §3.1): Spark
streams Arrow record batches of (conv_id, turn_idx, text, part_id) into one
Python worker per core; the kernel runs the extraction per document and
yields Arrow batches of the extraction schema.  There is no per-row Python
at the Spark API level — batching, transfer, and vectorized decode are
Arrow's.  Per-document work inside the batch is inherent to the algorithm
(the reference is a per-document mutation-heavy DOM pipeline).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd

from .extract import extract_one, extract_one_gated

OUT_SCHEMA_DDL = (
    "conv_id STRING, turn_idx INT, part_id INT, status STRING, "
    "title STRING, byline STRING, dir STRING, content STRING, "
    "text_content STRING, length INT, excerpt STRING, site_name STRING, "
    "spans ARRAY<STRUCT<start: INT, end: INT>>, "
    "candidate_count INT, top_score DOUBLE, attempts INT, parse_ms DOUBLE"
)

OUT_COLUMNS = [
    "conv_id", "turn_idx", "part_id", "status", "title", "byline", "dir",
    "content", "text_content", "length", "excerpt", "site_name", "spans",
    "candidate_count", "top_score", "attempts", "parse_ms",
]


def compute_spans(text_content: str | None, paragraph_texts: list[str]) -> list[dict]:
    """Character offsets of each top-level paragraph's text within
    text_content (FIXTURES.md §3): deterministic forward scan."""
    spans = []
    if not text_content:
        return spans
    cursor = 0
    for ptext in paragraph_texts:
        if not ptext:
            continue
        idx = text_content.find(ptext, cursor)
        if idx == -1:
            idx = text_content.find(ptext)
            if idx == -1:
                continue
        spans.append({"start": idx, "end": idx + len(ptext)})
        cursor = idx + len(ptext)
    return spans


def _extract_with_spans(html: str, url: str, opts: dict | None,
                        readerable_gate: bool = False) -> dict | None:
    if readerable_gate:
        out = extract_one_gated(html, url=url, opts=opts)
        if out is None:
            return None
    else:
        out = extract_one(html, url=url, opts=opts)
    spans: list[dict] = []
    if out["status"] == "ok":
        spans = compute_spans(out["text_content"], out.get("paragraph_texts") or [])
    out["spans"] = spans
    return out


def _extract_batch_columns(conv, turn, part, texts, url, opts,
                           readerable_gate: bool = False) -> dict:
    cols: dict[str, list] = {c: [] for c in OUT_COLUMNS}
    for i in range(len(texts)):
        t0 = time.perf_counter()
        html = texts[i]
        if html is None:
            if readerable_gate:
                continue  # the gate drops null payloads too
            res = {"status": "not_html", "spans": []}
        else:
            res = _extract_with_spans(html, url, opts, readerable_gate)
            if res is None:
                continue  # gated out: not probably readerable
        ms = (time.perf_counter() - t0) * 1000.0
        cols["conv_id"].append(conv[i])
        cols["turn_idx"].append(turn[i])
        cols["part_id"].append(part[i])
        cols["status"].append(res["status"])
        for f in ("title", "byline", "dir", "content", "text_content",
                  "excerpt", "site_name"):
            cols[f].append(res.get(f))
        cols["length"].append(res.get("length"))
        cols["spans"].append(res.get("spans", []))
        metrics = res.get("metrics") or {}
        cols["candidate_count"].append(metrics.get("candidate_count"))
        cols["top_score"].append(metrics.get("top_score"))
        cols["attempts"].append(metrics.get("attempts"))
        cols["parse_ms"].append(ms)
    return cols


def make_extraction_kernel(url: str = "http://fakehost/test/page.html",
                           opts: dict | None = None,
                           readerable_gate: bool = False):
    """Returns a mapInArrow function: Arrow batches of (conv_id, turn_idx,
    text, part_id) → Arrow batches of OUT_SCHEMA_DDL.  Arrow-direct (no
    pandas materialization) halves the per-batch conversion cost for these
    large-string columns.

    readerable_gate=True folds the isProbablyReaderable pre-check into the
    SAME parse the extraction uses (one parse per document, not two) and
    emits only readerable rows — output-identical to the two-pass gate."""
    import pyarrow as pa

    out_type = pa.struct(
        [
            ("conv_id", pa.string()), ("turn_idx", pa.int32()),
            ("part_id", pa.int32()), ("status", pa.string()),
            ("title", pa.string()), ("byline", pa.string()),
            ("dir", pa.string()), ("content", pa.string()),
            ("text_content", pa.string()), ("length", pa.int32()),
            ("excerpt", pa.string()), ("site_name", pa.string()),
            (
                "spans",
                pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32())])),
            ),
            ("candidate_count", pa.int32()), ("top_score", pa.float64()),
            ("attempts", pa.int32()), ("parse_ms", pa.float64()),
        ]
    )
    out_schema = pa.schema(list(out_type))

    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            cols = _extract_batch_columns(
                batch.column("conv_id").to_pylist(),
                batch.column("turn_idx").to_pylist(),
                batch.column("part_id").to_pylist()
                if "part_id" in batch.schema.names
                else [None] * batch.num_rows,
                batch.column("text").to_pylist(),
                url, opts, readerable_gate,
            )
            yield pa.RecordBatch.from_pydict(
                {f.name: pa.array(cols[f.name], type=f.type) for f in out_schema},
                schema=out_schema,
            )

    return kernel


def make_readerable_kernel(url: str = "http://fakehost/test/page.html"):
    """mapInPandas gate: (conv_id, turn_idx, text, part_id) →
    same + readerable boolean (Readability-readerable.js semantics)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .dom import JSDOMParser, ParseFatal
        from .readerable import is_probably_readerable

        for batch in batches:
            flags = []
            for html in batch["text"].tolist():
                if html is None:
                    flags.append(False)
                    continue
                try:
                    parser = JSDOMParser()
                    doc = parser.parse(html, url)
                    flags.append(
                        not parser.error_state and is_probably_readerable(doc)
                    )
                except (ParseFatal, RecursionError):
                    flags.append(False)
            out = batch.copy()
            out["readerable"] = flags
            yield out

    return kernel
