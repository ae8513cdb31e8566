"""Scaling-efficiency evidence for the north rule: run the SAME extraction
job on the SAME input at local[N] and local[4N] (default 8 and 32) in
separate processes (fresh JVM each), report turns/sec at both and
efficiency = (throughput@4N / throughput@N) / 4.

Usage:
  python3 tools/bench_scaling.py            # runs both, writes BENCH/BASELINE.md
  python3 tools/bench_scaling.py --child 8  # internal: one measured run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_TURNS = int(os.environ.get("SCALING_N_TURNS", "30000"))


def child(cpus: int) -> None:
    import time

    from pyspark.sql import functions as F

    from readability_1_spark.pipeline import extract_transcripts
    from readability_1_spark.session import get_spark
    from readability_1_spark.transcripts import scaled_transcripts

    spark = get_spark(app_name=f"scaling_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")
    t = scaled_transcripts(spark, N_TURNS).persist()
    n_html = t.filter(
        F.col("text").isNotNull() & F.col("text").rlike("(?i)<html")
    ).count()
    # Warm the Python workers + JIT on a small slice before the timed run.
    extract_transcripts(t.limit(512), num_parts=cpus * 2).count()

    t0 = time.time()
    ex = extract_transcripts(t, num_parts=max(128, cpus * 4))
    counts = {r["status"]: r["count"] for r in ex.groupBy("status").count().collect()}
    dt = time.time() - t0
    print(json.dumps({
        "cpus": cpus, "n_turns": N_TURNS, "html_turns": n_html,
        "wall_sec": round(dt, 2), "turns_per_sec": round(n_html / dt, 2),
        "status_counts": counts,
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)
    r8, r32 = results[8], results[32]
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling-efficiency evidence (north rule)

Protocol (BASELINE.md "Sandbox evidence protocol"): the same extraction job
— `extract_transcripts` over a deterministic skewed transcripts table of
{N_TURNS} turns ({r8['html_turns']} HTML-bearing, reference fixture corpus
payloads) — run at `local[8]` and `local[32]` on this machine, fresh JVM per
run, Python workers warmed before timing.

| parallelism | wall sec | HTML turns/sec | per-core turns/sec |
|---|---|---|---|
| local[8]  | {r8['wall_sec']} | {r8['turns_per_sec']} | {r8['turns_per_sec']/8:.2f} |
| local[32] | {r32['wall_sec']} | {r32['turns_per_sec']} | {r32['turns_per_sec']/32:.2f} |

**Scaling efficiency (throughput@32 / throughput@8) / 4 = {eff:.3f}**
(north-rule requirement: >= 0.8)

Status counts (identical at both sizes — the job is deterministic):
`{json.dumps(r8['status_counts'])}` vs `{json.dumps(r32['status_counts'])}`

Reference single-node comparison (BASELINE.md): the reference's full
extraction runs ~150 docs/s/core on the 12.5 KB page `001` in this sandbox;
this engine measures ~190-200 docs/s/core on the same page and ~31 docs/s/
core averaged over the whole 101-page corpus (mean page 230 KB, i.e.
~7 MB/s/core of HTML).
""")
    print(f"efficiency={eff:.3f} -> BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
