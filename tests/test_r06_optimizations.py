"""Round-6 optimization equivalence tests.

Every optimization this round is required to leave query RESULTS
byte-identical; these tests pin the three changes that rewrote an
operator's internals (rather than just adding checkpoints):

- order_value_benford's chi residual squared in DOUBLE instead of BIGINT
  (the BIGINT square overflowed int64 at sf0.1 and crashed the bench);
- _lsh_bit_dot built as one F.expr SQL string instead of the Column-API
  tree (driver-side py4j cost), which must parse to a bit-identical fold;
- customer_revenue_gini's range-partitioned two-pass rank replacing the
  single-task unpartitioned global window.
"""

import os

from pyspark.sql import Window, functions as F

from readability_1_spark import queries as Q

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"


def test_benford_runs_at_sf01_without_overflow(spark):
    """The round-5 bench crash: (n_obs*1e6 - exp_micro)^2 overflowed
    int64 under ANSI mode from sf0.1 up.  The DOUBLE-squared form must
    compute the full 9-digit table at sf0.1."""
    fn, _ = Q.QUERIES["order_value_benford"]
    rows = fn(spark, SF01).collect()
    assert len(rows) == 9
    assert all(r["chi_contrib"] is not None for r in rows)
    # one chi_total across all rows, consistent with the sum of contribs
    tot = {r["chi_total"] for r in rows}
    assert len(tot) == 1


def test_benford_double_square_equals_exact_integer_square(spark):
    """The DOUBLE residual is exact (< 2^53) and DOUBLE multiply is
    correctly rounded, so squaring in DOUBLE must equal the
    nearest-double of the exact integer square for every digit row."""
    fn, _ = Q.QUERIES["order_value_benford"]
    rows = fn(spark, SF01).collect()
    for r in rows:
        resid = r["n_obs"] * 1_000_000 - r["exp_micro"]
        assert abs(resid) < 2**53
        exact_sq_as_double = float(resid * resid)  # nearest-double of exact
        assert float(resid) * float(resid) == exact_sq_as_double


def test_lsh_bit_dot_expr_matches_column_api_form(spark):
    """_lsh_bit_dot now emits one F.expr SQL string; it must be
    bit-identical to the original Column-API zip_with/aggregate fold on
    real embedding rows (sign AND magnitude — multi-probe ranking
    depends on exact doubles)."""
    emb = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    cols = []
    for t in range(2):
        for b in range(Q.ANN_LSH_BITS):
            new = Q._lsh_bit_dot(f"{t}:", b)
            old = F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[
                        F.lit(Q._lsh_weight(f"{t}:", b, i)) for i in range(64)
                    ]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            cols.append((new.alias(f"n{t}_{b}"), old.alias(f"o{t}_{b}")))
    df = emb.select(*[c for pair in cols for c in pair]).collect()
    for row in df:
        for t in range(2):
            for b in range(Q.ANN_LSH_BITS):
                assert row[f"n{t}_{b}"] == row[f"o{t}_{b}"]


def test_gini_ranks_match_unpartitioned_global_window(spark):
    """The range-partitioned two-pass rank must reproduce the global
    row_number over (cents DESC, custkey ASC) exactly — compare the
    final one-row output against a replica computed with the old
    single-task global window."""
    fn, _ = Q.QUERIES["customer_revenue_gini"]
    new_row = fn(spark, SF001).collect()[0]

    o = spark.read.parquet(os.path.join(SF001, "orders.parquet"))
    per = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    ranked = per.withColumn("j", F.row_number().over(w))
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.expr("j * cents")).cast("long").alias("js"),
    ).collect()[0]
    shares = ranked.crossJoin(
        F.broadcast(
            spark.createDataFrame([(tot["n"],)], "n long")
        )
    ).agg(
        F.sum(F.when(F.expr("j * 100 <= n"), F.col("cents")).otherwise(0))
        .cast("long").alias("top1"),
        F.sum(F.when(F.expr("j * 10 <= n"), F.col("cents")).otherwise(0))
        .cast("long").alias("top10"),
    ).collect()[0]

    assert new_row["n"] == tot["n"]
    assert new_row["total_cents"] == tot["s"]
    n, s, js = tot["n"], tot["s"], tot["js"]
    gini_old = round(
        (2.0 * ((n + 1) * s - js)) / (float(n) * s) - (n + 1) / float(n), 6
    )
    assert new_row["gini"] == gini_old
    assert new_row["top1pct_share"] == round(shares["top1"] / s, 6)
    assert new_row["top10pct_share"] == round(shares["top10"] / s, 6)


def test_widen_is_identity_when_already_wide(spark):
    """_widen must be a pure no-op when the input already has at least
    defaultParallelism partitions (the at-scale case), and must preserve
    the row multiset when it does repartition (the local case)."""
    par = spark.sparkContext.defaultParallelism
    narrow = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    assert narrow.rdd.getNumPartitions() < par
    widened = Q._widen(narrow, "doc_id")
    assert widened.rdd.getNumPartitions() == par
    assert sorted(r["doc_id"] for r in widened.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in narrow.select("doc_id").collect())

    wide = narrow.repartition(par, "doc_id")
    assert Q._widen(wide, "doc_id") is wide


def test_round_dd_matches_duckdb_on_half_boundaries(spark):
    """_round_dd must reproduce DuckDB's multiply-then-std::round DOUBLE
    rounding on repr-vs-binary half boundaries where Spark's F.round
    disagrees (the sf0.1 events_user_stats / tfidf_top_terms class)."""
    import duckdb

    cases = [
        21667.0 / 461.0,          # ~46.996… the observed avg shape
        0.06514649999999999,
        46.99625, 46.996250000000003, 0.0651465,
        1.00005, 2.5e-05, 123.45675, -46.99625, -0.0651465,
    ]
    df = spark.createDataFrame([(float(v),) for v in cases], "x double")
    got4 = [r["r"] for r in df.select(Q._round_dd(F.col("x"), 4).alias("r")).collect()]
    got6 = [r["r"] for r in df.select(Q._round_dd(F.col("x"), 6).alias("r")).collect()]
    con = duckdb.connect()
    for v, g4, g6 in zip(cases, got4, got6):
        d4 = con.execute("SELECT round(CAST(? AS DOUBLE), 4)", [v]).fetchone()[0]
        d6 = con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [v]).fetchone()[0]
        assert g4 == d4, (v, g4, d4)
        assert g6 == d6, (v, g6, d6)


def test_events_user_stats_ordered_sum_matches_plain_avg_where_exact(spark):
    """The ordered left-fold average must equal the plain avg whenever
    the sum is order-insensitive — pinned on a small exact-integer
    frame (the change may only matter in the last ulp of large float
    sums)."""
    rows = [("u1", i, i, float(i % 7)) for i in range(50)] + [
        ("u2", i, i, float(100 - i)) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id long, ts long, value double")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    plain = {
        r["user_id"]: round(r["a"], 4)
        for r in df.groupBy("user_id").agg(F.avg("value").alias("a")).collect()
    }
    ordered = F.array_sort(
        F.collect_list(F.struct("rn", F.col("value").cast("double").alias("v")))
    )
    osum = F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x["v"])
    got = {
        r["user_id"]: r["a"]
        for r in df.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(Q._round_dd(osum / F.count(F.lit(1)).cast("double"), 4).alias("a"))
        .collect()
    }
    assert got == plain


def test_minhash_pairs_widened_scan_matches_narrow_path(spark):
    """The post-close widening of the shingle path: _shingles now
    _widen's its input so the split/explode/partial-distinct — and the
    16-md5 partial agg, whose distinct input is optimizer-eliminated
    (min is duplicate-insensitive) so it executes map-side ON THE SCAN
    — get full parallelism on the single-file bench layout.
    Partitioning can never change the pair set: md5 is per-row
    deterministic and min is order-free, so the widened default must
    emit exactly the pairs the old narrow path (_widen forced to
    identity) does."""
    docs = Q._t(spark, SF001, "documents")
    widened = sorted(
        (r.doc_a, r.doc_b) for r in Q._minhash_pairs(docs).collect()
    )
    orig_widen = Q._widen
    Q._widen = lambda df, *keys: df
    try:
        narrow = sorted(
            (r.doc_a, r.doc_b) for r in Q._minhash_pairs(docs).collect()
        )
    finally:
        Q._widen = orig_widen
    assert narrow == widened and len(narrow) > 0
