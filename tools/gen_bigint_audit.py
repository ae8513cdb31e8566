"""BIGINT-headroom audit (round-6, verdict ask #2): scan queries.py for
every integer product that feeds a BIGINT sum / squared-residual
expression, and pair each hit with a hand-audited magnitude bound at
sf10 against the int64 limit (9.22e18).

The scan is the safety net: any NEW sum-of-product expression that is
not in the curated table below makes this tool exit non-zero, so the
audit cannot silently go stale ("zero unproven rows" is enforced, not
asserted).  Run: python3 tools/gen_bigint_audit.py  →  writes
BENCH/BIGINT_AUDIT.md.

Context (the round-5/6 lessons that motivated this):
- order_value_benford squared a ~1e10 BIGINT residual — fine at sf0.01,
  ARITHMETIC_OVERFLOW at sf0.1; fixed in round 6 by squaring in DOUBLE
  (the residual is < 2^53, so the double square is the exact square's
  nearest double).
- customer_revenue_gini's rank-weighted sum(j*cents) crosses int64
  around n=1.5M customers (sf1); fixed in round 6 with DECIMAL(38,0).
- DuckDB BIGINT multiply does NOT promote to HUGEINT (it errors), but
  DuckDB sum() over BIGINT DOES return HUGEINT — so the oracle twins
  have more sum headroom than Spark, never less product headroom.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "readability_1_spark", "queries.py")

# Every `F.sum(F.expr("<a> * <b> ..."))`-style integer product found by
# the scan must have an entry here, keyed by the normalized expression
# text.  Bounds argue magnitude at sf10 (lineitem 6e7 rows, orders
# 1.5e7, customers 1.5e6, events 1e7, documents 5e5, embeddings 2e5,
# tokens/doc <= ~3e4, micro = 1e6 scale, milli = 1e3 scale).
AUDIT: dict[str, tuple[str, str]] = {
    "(sz * (sz - 1)) div 2": (
        "SAFE to sf10 and beyond",
        "sz = LSH bucket size; sum of sz^2 over buckets <= (sum sz) * max sz "
        "= n_docs * bucket_cap ~ 5e5 * 1e4 = 5e9 at sf10",
    ),
    "dm * dm": (
        "SAFE to sf10 and beyond",
        "dm = per-bucket doc mass; sum dm^2 <= (sum dm) * max dm <= "
        "n_docs^2 = 2.5e11 at sf10",
    ),
    "n_docs * rel_m * rel_m": (
        "SAFE to sf10 and beyond",
        "rel_m is MILLI-scaled (|rel_m| <= 1e3, _sdiv_milli), so each term "
        "<= n_docs * 1e6 <= 5e11; summed over ~10 calibration bins",
    ),
    "n_docs * res_m * res_m": (
        "SAFE to sf10 and beyond",
        "same milli bound as rel_m",
    ),
    "c * c": (
        "SAFE to sf10 and beyond",
        "c = per-(turn|doc) token count for one distinct token; per-group "
        "sum c^2 <= (sum c) * max c <= (3e4)^2 = 9e8 per turn/doc; "
        "corpus-level den variant: sum over vocab <= total_tokens * max_df "
        "~ 2e10 * 1e8 = 2e18 at sf100 — at sf10 <= 2e16",
    ),
    "ca * cb": (
        "SAFE to sf10 and beyond",
        "per-candidate-pair token-count dot; bounded by the per-doc c*c "
        "argument above",
    ),
    "x.c * y.c": (
        "SAFE to sf10 and beyond",
        "adjacent-turn token-count dot, same per-turn bound",
    ),
    "c * c2": (
        "SAFE to sf10",
        "corpus term count x query-window term count; <= total_tokens * "
        "max_count ~ 2e9 * 1e7 = 2e16 at sf10 (flag for DECIMAL at sf>=100)",
    ),
    "CAST((ra - rb) * (ra - rb) AS BIGINT)": (
        "SAFE at any sf",
        "BPE merge-rank differences, |ra-rb| <= BPE_MERGES = 50",
    ),
    "dx * dy": (
        "SAFE to sf10 and beyond",
        "daily event-count deltas: |dx|,|dy| <= events/day ~ 3e4 at sf10; "
        "365 terms",
    ),
    "dx * dx": ("SAFE to sf10 and beyond", "see dx * dy"),
    "dy * dy": ("SAFE to sf10 and beyond", "see dx * dy"),
    "n_tok * n_tok": (
        "SAFE to sf10 and beyond",
        "n_tok <= 3e4 per doc -> 9e8 per row x 5e5 docs = 4.5e14 at sf10",
    ),
    "s_micro * s_micro": (
        "SAFE to sf10 and beyond",
        "s_micro <= 1e6 (a micro-scaled share) -> 1e12 per row, summed over "
        "a bounded source/bin table",
    ),
    "CAST(round(o_totalprice * 100, 0) AS BIGINT)": (
        "SAFE to sf1000",
        "order cents <= 6e7; summed per customer (<= ~40 orders) and "
        "corpus-wide <= 6e7 * 1.5e10 = 9e17 at sf1000",
    ),
    "CAST(j * cents AS DECIMAL(38,0))": (
        "CONVERTED (round 6)",
        "rank-weighted cents crossed int64 at sf1; now DECIMAL(38,0) "
        "(exact to 1e38; identical doubles where BIGINT sufficed)",
    ),
    "v[i] * v[j]": (
        "SAFE to sf10; FLAGGED beyond",
        "micro components |v| <= ~3e6 -> product <= 1e13; per-(i,j) sum "
        "<= n_vecs_per_label * 1e13 = 1e18 at sf10 (2e5 vectors).  At "
        "sf>=30 convert to DECIMAL(38,0) like gini's js "
        "(embedding_mmd_poly)",
    ),
}

# Known squared/residual patterns handled OUTSIDE BIGINT (for the report).
RESOLVED = [
    ("order_value_benford",
     "chi residual squared in DOUBLE since round 6 (was the BENCH_r05 "
     "crash); residual < 2^53 so the double square is exact-rounded"),
    ("customer_revenue_gini",
     "(n+1)*s and sum(j*cents) in DECIMAL(38,0) since round 6"),
]


def main() -> None:
    src = open(SRC, encoding="utf-8").read()
    lines = src.splitlines()
    hits = []  # (lineno, expr)
    pat = re.compile(r'F\.sum\(F\.expr\(\s*"([^"]+)"')
    for m in pat.finditer(src):
        expr = m.group(1)
        if "*" not in expr:
            continue
        lineno = src[: m.start()].count("\n") + 1
        hits.append((lineno, expr))
    # multiline: F.sum(F.expr( on its own line
    for i, ln in enumerate(lines):
        if "F.sum(F.expr(" in ln and '"' not in ln:
            for j in range(i + 1, min(i + 4, len(lines))):
                m2 = re.search(r'"([^"]+)"', lines[j])
                if m2:
                    if "*" in m2.group(1):
                        hits.append((i + 1, m2.group(1)))
                    break
    # the in-row product that feeds a later BIGINT sum (mmd_poly)
    if "'p', v[i] * v[j]" in src:
        ln = src[: src.index("'p', v[i] * v[j]")].count("\n") + 1
        hits.append((ln, "v[i] * v[j]"))

    unproven = []
    rows = []
    seen = set()
    for lineno, expr in sorted(set(hits)):
        key = expr.strip()
        ent = AUDIT.get(key)
        if ent is None:
            # normalize whitespace once
            key2 = re.sub(r"\s+", " ", key)
            ent = AUDIT.get(key2)
            key = key2
        if ent is None:
            unproven.append((lineno, key))
            continue
        if (key, lineno) in seen:
            continue
        seen.add((key, lineno))
        rows.append((lineno, key, ent[0], ent[1]))

    out = os.path.join(REPO, "BENCH", "BIGINT_AUDIT.md")
    with open(out, "w", encoding="utf-8") as f:
        f.write("# BENCH/BIGINT_AUDIT — integer-product headroom audit\n\n")
        f.write(
            "Generated by `tools/gen_bigint_audit.py`.  Every BIGINT "
            "sum-of-product in queries.py with its hand-audited magnitude "
            "bound at sf10 vs the int64 limit 9.22e18; a scan hit without "
            "a curated bound fails the tool (zero unproven rows is "
            "ENFORCED).  Motivated by order_value_benford's sf0.1 overflow "
            "(round 5) and customer_revenue_gini's sf1 rank-sum ceiling — "
            "sf0.01-green is not sf0.1-green.\n\n"
        )
        f.write("| line | expression | verdict | bound argument |\n")
        f.write("|---|---|---|---|\n")
        for lineno, key, verdict, why in rows:
            f.write(f"| {lineno} | `{key}` | {verdict} | {why} |\n")
        f.write("\nResolved outside BIGINT:\n\n")
        for name, note in RESOLVED:
            f.write(f"- **{name}** — {note}\n")
    print(f"wrote {out}; {len(rows)} audited hits, {len(unproven)} unproven")
    if unproven:
        for lineno, key in unproven:
            print(f"UNPROVEN line {lineno}: {key}")
        sys.exit(1)


if __name__ == "__main__":
    main()
