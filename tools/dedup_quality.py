"""Quality evidence for the minhash-LSH near-dup pair stage: recall vs the
TRUE 3-shingle Jaccard (computed exactly) on the sf0.01 documents table.

Runs both sides in DuckDB — the LSH SQL here is the driver-verified oracle
twin of the Spark query (hash-identical rows in CORRECTNESS_rNN.json), so
this measures the production operator's behavior faithfully.

16 minhashes in 4 bands of 4 detect a pair with P = 1-(1-J^4)^4; the
S-curve midpoint sits at J ≈ 0.76, so recall should be near-total above
J 0.9 and fall off below ~0.6 — exactly the knob a corpus owner tunes with
bands/rows per band.

Usage: python3 tools/dedup_quality.py [sf_dir]
"""

import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from readability_1_spark.queries import (  # noqa: E402
    _SHINGLES_SQL,
    SQL_DEDUP_MINHASH_LSH,
)

TRUE_J_SQL = (
    _SHINGLES_SQL
    + """
  , sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
  common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM shingles a JOIN shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  )
SELECT doc_a, doc_b,
       n_common * 1.0 / (sa.sz + sb.sz - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    true_pairs = {
        (a, b): j for a, b, j in con.execute(TRUE_J_SQL).fetchall()
    }
    lsh_pairs = {tuple(r) for r in con.execute(SQL_DEDUP_MINHASH_LSH).fetchall()}
    print(f"docs pairs sharing >=1 shingle: {len(true_pairs)}; "
          f"LSH candidate pairs: {len(lsh_pairs)}")
    for thr in (0.5, 0.6, 0.7, 0.8, 0.9):
        truth = {p for p, j in true_pairs.items() if j >= thr}
        hit = truth & lsh_pairs
        rec = len(hit) / len(truth) if truth else float("nan")
        print(f"recall @ true J>={thr}: {rec:.3f}  ({len(hit)}/{len(truth)})")
    strong = sum(1 for p in lsh_pairs if true_pairs.get(p, 0) >= 0.5)
    print(f"precision of candidates vs J>=0.5: "
          f"{strong / len(lsh_pairs):.3f} ({strong}/{len(lsh_pairs)})"
          if lsh_pairs else "no candidates")


if __name__ == "__main__":
    main()
