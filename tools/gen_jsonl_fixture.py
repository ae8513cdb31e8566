"""Generate the committed JSONL ingestion fixture
(tests/goldens/transcripts_sample.jsonl) deterministically from the
smoke transcript corpus: the 12 lexicographically-first conversations'
turns serialized one-JSON-object-per-line (sorted keys, ASCII-escaped),
followed by five crafted bad lines exercising every malformed class the
jsonl_transcript_ingest operator counts — truncated JSON, non-JSON,
JSON-valid-but-no-conv_id, non-integer turn_idx, and a duplicate
(conv_id, turn_idx) key.

Run: python3 tools/gen_jsonl_fixture.py   (idempotent)
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "tests", "goldens", "transcripts_smoke.parquet")
DST = os.path.join(REPO, "tests", "goldens", "transcripts_sample.jsonl")
N_CONVS = 12

BAD_LINES = [
    '{"conv_id": "bad-1", "turn_idx": ',
    "not json at all",
    '{"turn_idx": 0, "role": "user", "text": "no conv id"}',
    '{"conv_id": "bad-2", "turn_idx": "x", "role": "user"}',
]


def main() -> None:
    rows = pq.read_table(SRC).to_pylist()
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    convs = sorted({r["conv_id"] for r in rows})[:N_CONVS]
    keep = [r for r in rows if r["conv_id"] in set(convs)]
    lines = [
        json.dumps(
            {
                k: r[k]
                for k in ("conv_id", "turn_idx", "role", "text", "tool")
            },
            sort_keys=True,
            ensure_ascii=True,
        )
        for r in keep
    ]
    # duplicate-key line: re-send the first turn with different text
    first = keep[0]
    lines.append(
        json.dumps(
            {
                "conv_id": first["conv_id"],
                "turn_idx": first["turn_idx"],
                "role": "user",
                "text": "duplicate delivery of the first turn",
                "tool": None,
            },
            sort_keys=True,
            ensure_ascii=True,
        )
    )
    lines.extend(BAD_LINES)
    with open(DST, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {DST}: {len(lines)} lines ({len(keep)} corpus turns)")


if __name__ == "__main__":
    main()
