"""Wave 74: host crawl-budget waterfill, adjacent-turn echo/revision
distance, repeat-purchase cadence.

Independent evidence beyond the DuckDB oracles: a full arithmetic
replica of the capped-proportional + one-redistribution-round waterfill
driven only by the operator's own (n_urls, pr_units) inputs plus budget
reconciliations; a banded-DP Levenshtein replica over the real
transcripts plus a crafted frame pinning every band/NULL/revision
branch; and a pure-Python gap replica plus a crafted same-day-ties
corpus with a hand-computed half-up mean."""

import datetime
from collections import defaultdict

import pyarrow.parquet as pq

from readability_1_spark.queries import (
    CRAWL_BUDGET_MULT,
    CRAWL_HOST_CAP,
    REV_BAND,
    REV_NEAR,
    TRANSCRIPTS_PQ,
    q_host_crawl_budget,
    q_order_reorder_interval,
    q_turn_revision_distance,
    revision_frame,
)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------- crawl budget


def test_crawl_budget_waterfill_equations(spark):
    rows = q_host_crawl_budget(spark, SF).collect()
    assert len(rows) > 50
    t_urls = sum(r["n_urls"] for r in rows)
    t_pr = sum(r["pr_units"] for r in rows)
    budget = CRAWL_BUDGET_MULT * t_urls
    alloc1 = {}
    for r in rows:
        assert r["cap_pages"] == CRAWL_HOST_CAP * r["n_urls"]
        prop = (((r["pr_units"] * 1000000) // t_pr) * budget) // 1000000
        assert r["prop_pages"] == prop
        alloc1[r["host"]] = min(r["cap_pages"], prop)
    leftover = budget - sum(alloc1.values())
    assert leftover >= 0
    pr2 = sum(
        r["pr_units"] for r in rows if alloc1[r["host"]] < r["cap_pages"]
    )
    final_sum = 0
    for r in rows:
        a1 = alloc1[r["host"]]
        if a1 >= r["cap_pages"] or pr2 <= 0:
            want = a1
        else:
            want = min(
                r["cap_pages"],
                a1 + (((r["pr_units"] * 1000000) // pr2) * leftover)
                // 1000000,
            )
        assert r["alloc_pages"] == want
        assert r["capped"] == (r["alloc_pages"] >= r["cap_pages"])
        final_sum += want
    # reconciliation: never over budget, redistribution only tightens
    assert final_sum <= budget
    assert budget - final_sum <= leftover
    # the corpus must exercise BOTH branches for the test to mean much
    assert any(r["capped"] for r in rows)
    assert any(not r["capped"] for r in rows)


# --------------------------------------------------- revision distance


def _lev_banded(a, b, k):
    n, m = len(a), len(b)
    if abs(n - m) > k:
        return None
    INF = k + 1
    prev = {j: j for j in range(0, min(m, k) + 1)}
    for i in range(1, n + 1):
        cur = {}
        lo, hi = max(0, i - k), min(m, i + k)
        for j in range(lo, hi + 1):
            if j == 0:
                cur[0] = i
                continue
            best = min(
                prev.get(j - 1, INF) + (a[i - 1] != b[j - 1]),
                prev.get(j, INF) + 1,
                cur.get(j - 1, INF) + 1,
                INF,
            )
            cur[j] = best
        prev = cur
        if not prev or min(prev.values()) > k:
            return None
    d = prev.get(m, INF)
    return d if d <= k else None


def test_revision_replica_real_corpus(spark):
    recs = pq.read_table(TRANSCRIPTS_PQ).to_pylist()
    by_conv = defaultdict(list)
    for r in recs:
        by_conv[r["conv_id"]].append(r)
    want = {}
    for conv, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        for prev, cur in zip(turns, turns[1:]):
            la = len(prev["text"]) if prev["text"] is not None else None
            lb = len(cur["text"]) if cur["text"] is not None else None
            wb = la is not None and lb is not None and abs(la - lb) <= REV_BAND
            lev = _lev_banded(prev["text"], cur["text"], REV_BAND) if wb else None
            want[(conv, prev["turn_idx"], cur["turn_idx"])] = (
                prev["role"],
                cur["role"],
                la,
                lb,
                wb,
                lev,
                lev is not None and lev <= REV_NEAR,
            )
    rows = q_turn_revision_distance(spark, SF).collect()
    assert len(rows) == len(want) == 210
    for r in rows:
        assert (
            r["role_a"],
            r["role_b"],
            r["len_a"],
            r["len_b"],
            r["within_band"],
            r["lev"],
            r["is_revision"],
        ) == want[(r["conv_id"], r["turn_a"], r["turn_b"])]
    # the real corpus exercises the band on some pairs
    assert sum(1 for r in rows if r["within_band"]) >= 3


def test_revision_crafted_branches(spark):
    long_a = "x" * 200
    long_b = "y" * 200  # same length, every char differs -> over DP cap
    rows = [
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "hello there"),          # lev 0 (echo)
        ("c1", 2, "assistant", "hello their"),          # lev 2 (revision)
        ("c2", 0, "user", long_a),
        ("c2", 1, "assistant", long_b),                 # in band, lev > cap
        ("c3", 0, "user", "a"),
        ("c3", 1, "tool", "b" * 100),                   # len diff > band
        ("c4", 0, "user", None),
        ("c4", 1, "assistant", "text"),                 # NULL text
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["turn_a"], r["turn_b"]): r
        for r in revision_frame(df).collect()
    }
    assert len(got) == 5
    r = got[("c1", 0, 1)]
    assert (r["role_a"], r["role_b"]) == ("user", "assistant")
    assert (r["within_band"], r["lev"], r["is_revision"]) == (True, 0, True)
    r = got[("c1", 1, 2)]
    assert (r["within_band"], r["lev"], r["is_revision"]) == (True, 2, True)
    r = got[("c2", 0, 1)]
    assert (r["within_band"], r["lev"], r["is_revision"]) == (
        True,
        None,
        False,
    )
    r = got[("c3", 0, 1)]
    assert (r["within_band"], r["lev"], r["is_revision"]) == (
        False,
        None,
        False,
    )
    r = got[("c4", 0, 1)]
    assert r["len_a"] is None
    assert (r["within_band"], r["lev"], r["is_revision"]) == (
        False,
        None,
        False,
    )


# --------------------------------------------------- reorder interval


def test_reorder_replica_real_corpus(spark):
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).to_pylist()
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"]))
    want = {}
    for c, lst in by_cust.items():
        if len(lst) < 2:
            continue
        lst.sort()
        gaps = [
            (b[0].date() - a[0].date()).days for a, b in zip(lst, lst[1:])
        ]
        n = len(gaps)
        want[c] = (
            len(lst),
            min(gaps),
            max(gaps),
            (2 * sum(gaps) + n) // (2 * n),
        )
    rows = q_order_reorder_interval(spark, SF).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert (
            r["n_orders"],
            r["min_gap_days"],
            r["max_gap_days"],
            r["mean_gap_days"],
        ) == want[r["custkey"]]


def test_reorder_crafted_ties_and_halfup(spark, tmp_path):
    """Customer 1: orders on day 0, day 0, day 3 -> gaps (0, 3), mean
    1.5 rounds half-up to 2.  Customer 2: single order -> excluded."""
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (1, 1, "O", 10.0, base, "1-URGENT"),
        (2, 1, "O", 10.0, base, "1-URGENT"),
        (3, 1, "O", 10.0, base + datetime.timedelta(days=3), "1-URGENT"),
        (4, 2, "O", 10.0, base, "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    out = q_order_reorder_interval(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["custkey"] == 1
    assert (
        r["n_orders"],
        r["min_gap_days"],
        r["max_gap_days"],
        r["mean_gap_days"],
    ) == (3, 0, 3, 2)
