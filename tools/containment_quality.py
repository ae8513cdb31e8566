"""Quality evidence for the two round-5 candidate-generation rules:

1. dedup_containment's rare-shingle rule (candidates only from shingles
   with 2 <= df <= CONTAIN_DF_CAP): recall vs the TRUE containment pairs
   (exact all-pairs shingle join, feasible at sf0.01) at the shipped
   CONTAIN_MIN threshold, plus the df-cap sweep so the recall-vs-cap curve
   is visible.
2. dedup_bloom_membership's false-positive accounting: the query
   self-reports bloom_hit vs actual_dup; this aggregates the FP rate at
   the shipped BLOOM_BITS and a sweep of smaller widths.

Both sides run in DuckDB via the driver-verified oracle twins (hash-equal
to the Spark queries in CORRECTNESS), so the measurement reflects the
production operators faithfully.

Usage: python3 tools/containment_quality.py [sf_dir]
"""

import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from readability_1_spark import queries  # noqa: E402
from readability_1_spark.queries import (  # noqa: E402
    _SHINGLES_SQL,
    CONTAIN_DF_CAP,
    CONTAIN_MIN,
)

TRUE_CONTAIN_SQL = (
    _SHINGLES_SQL
    + f"""
  , sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
  common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM shingles a JOIN shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  )
SELECT doc_a, doc_b
FROM common
JOIN sizes za ON za.doc_id = doc_a
JOIN sizes zb ON zb.doc_id = doc_b
WHERE greatest(round(n_common / za.sz, 6), round(n_common / zb.sz, 6))
      >= {CONTAIN_MIN}
"""
)


def containment_recall(con, sf_dir: str) -> None:
    true_pairs = {
        (a, b) for a, b in con.sql(TRUE_CONTAIN_SQL).fetchall()
    }
    print(f"true containment pairs (max >= {CONTAIN_MIN}): {len(true_pairs)}")
    for cap in (2, 4, CONTAIN_DF_CAP, 16, 32):
        sql = queries.SQL_DEDUP_CONTAINMENT.replace(
            f"BETWEEN 2 AND {CONTAIN_DF_CAP}", f"BETWEEN 2 AND {cap}"
        )
        got = {(a, b) for a, b, *_ in con.sql(sql).fetchall()}
        assert got <= true_pairs, "df-capped result must be a subset (exact verify)"
        rec = len(got) / len(true_pairs) if true_pairs else 1.0
        tag = " (shipped)" if cap == CONTAIN_DF_CAP else ""
        print(f"  df cap {cap:>2}: pairs {len(got):>4}  recall {rec:.3f}{tag}")


def bloom_fp_rate(con) -> None:
    base = queries.SQL_DEDUP_BLOOM_MEMBERSHIP
    for bits in (1024, 4096, 16384, queries.BLOOM_BITS):
        sql = base.replace(f"% {queries.BLOOM_BITS}", f"% {bits}")
        rows = con.sql(
            f"""
            SELECT count(*) FILTER (bloom_hit AND NOT actual_dup) AS fp,
                   count(*) FILTER (NOT bloom_hit AND actual_dup) AS fn,
                   count(*) FILTER (actual_dup) AS dups,
                   count(*) AS n
            FROM ({sql})
            """
        ).fetchone()
        fp, fn, dups, n = rows
        assert fn == 0, "bloom filter must never produce a false negative"
        tag = " (shipped)" if bits == queries.BLOOM_BITS else ""
        print(
            f"  bits {bits:>6}: docs {n}  true dups {dups}  "
            f"false positives {fp} ({fp / max(n - dups, 1):.4f}){tag}  fn 0"
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    print(f"== containment candidate recall ({sf_dir}) ==")
    containment_recall(con, sf_dir)
    print("== bloom membership FP accounting ==")
    bloom_fp_rate(con)


if __name__ == "__main__":
    main()
