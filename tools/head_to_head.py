"""Interleaved single-core head-to-head: reference under node vs this
engine, full 101-fixture corpus, alternating reps within the same window so
host-capacity drift hits both sides equally.

Usage: python3 tools/head_to_head.py [reps]
Prints per-rep docs/s for both sides and the per-rep + median ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_RUNNER = os.path.join(REPO, "tools", "ref_extract.mjs")
PAGES = "/root/reference/test/test-pages"


def load_corpus() -> list[str]:
    docs = []
    for slug in sorted(os.listdir(PAGES)):
        src = os.path.join(PAGES, slug, "source.html")
        if os.path.exists(src):
            with open(src, encoding="utf-8", errors="replace") as f:
                docs.append(f.read())
    return docs


def run_node(docs: list[str]) -> float:
    payload = json.dumps(docs)
    t0 = time.time()
    proc = subprocess.run(
        ["node", REF_RUNNER], input=payload, capture_output=True, text=True,
        check=True,
    )
    dt = time.time() - t0
    # subtract node startup: measured by an empty batch
    t1 = time.time()
    subprocess.run(["node", REF_RUNNER], input="[]", capture_output=True,
                   text=True, check=True)
    startup = time.time() - t1
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert len(out) == len(docs)
    return len(docs) / max(dt - startup, 1e-6)


def run_engine(docs: list[str]) -> float:
    from readability_1_spark.extract import extract_one

    t0 = time.time()
    for d in docs:
        extract_one(d)
    return len(docs) / (time.time() - t0)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    docs = load_corpus()
    print(f"corpus: {len(docs)} fixtures; {reps} interleaved reps")
    # warm both sides once (JIT/import warmup out of the measurement)
    run_engine(docs[:10])
    run_node(docs[:10])
    ratios = []
    for i in range(reps):
        node_ds = run_node(docs)
        eng_ds = run_engine(docs)
        ratio = node_ds / eng_ds
        ratios.append(ratio)
        print(f"rep {i + 1}: node {node_ds:.1f} docs/s  engine {eng_ds:.1f} "
              f"docs/s  ratio {ratio:.2f}x")
    print(f"median ratio: {statistics.median(ratios):.2f}x")


if __name__ == "__main__":
    main()
