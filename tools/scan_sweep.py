"""Full-registry duplicate-scan sweep: for every registered query, count
parquet scans, checkpointed (ExistingRDD) scans, and ReusedExchange nodes
in the formatted physical plan, and flag queries whose plan re-reads the
same parquet table many times without exchange reuse — the shared-subplan
materialization audit (ROUND5.md "Shared-subplan materialization audit")
as a reproducible tool instead of an ad-hoc sweep.

A high parquet-scan count is not automatically wrong (tiny dimension
tables re-scan cheaply; Catalyst only reuses an Exchange when subtrees
canonicalize identically), so the output is a triage list, not a gate:
an offender is worth a localCheckpoint at its shared frontier only when
the re-scanned subtree is corpus-sized.

Run: python3 tools/scan_sweep.py [threshold]   # default threshold 4
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from readability_1_spark.queries import QUERIES
    from readability_1_spark.session import get_spark

    spark = get_spark(app_name="scan_sweep", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    import re as _re

    rows = []
    for name, (fn, _sql) in QUERIES.items():
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # pragma: no cover - triage tool
            rows.append((name, "?", 0, 0, 0, f"ERROR {exc}", 0))
            continue
        # Each scan's detail section carries exactly ONE "Location:" line;
        # group by the scanned path so multi-table joins (different
        # tables) are not mistaken for duplicate work.
        locs = _re.findall(r"Location: \S+ \[([^\]]*)", plan)
        per_table: dict[str, int] = {}
        for loc in locs:
            per_table[loc] = per_table.get(loc, 0) + 1
        worst_tbl, worst = max(
            per_table.items(), key=lambda kv: kv[1], default=("-", 0)
        )
        rows.append(
            (
                name,
                os.path.basename(worst_tbl.rstrip("/")) or "-",
                worst,
                plan.count("Scan ExistingRDD") // 2,
                plan.count("ReusedExchange") // 2,
                "",
                plan.count("Generate ") // 2,
            )
        )

    # A real offender repeats EXPENSIVE derived work: >= threshold scans
    # of one table AND multiple Generate (explode) nodes re-running over
    # it with no exchange reuse.  Plain same-table re-scans of a pruned
    # parquet column are usually cheaper than checkpointing the corpus.
    offenders = [
        r for r in rows if isinstance(r[2], int) and r[2] >= threshold
        and r[4] == 0 and r[6] >= 2 and not r[5]
    ]
    print(f"{len(rows)} queries swept (same-table scan threshold {threshold})")
    print("name worst_table same_table_scans ckpt_scans reused_exchanges explodes")
    for row in sorted(
        rows, key=lambda r: -(r[2] if isinstance(r[2], int) else 0)
    ):
        name, tbl, ps, er, re_, err, gen = row
        mark = " <== OFFENDER" if row in offenders else ""
        flag = f" {err}" if err else ""
        print(f"{name} {tbl} {ps} {er} {re_} {gen}{flag}{mark}")
    print(f"\noffenders (>= {threshold} same-table scans, >= 2 explodes, "
          f"zero ReusedExchange): {[r[0] for r in offenders]}")
    spark.stop()


if __name__ == "__main__":
    main()
