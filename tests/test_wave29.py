"""Wave 29: embedding-space outlier flagging over the kmeans clustering.

Independent evidence beyond the DuckDB oracle: the ceil-threshold flag
rule replayed in Python over the operator's own assignment (per-cluster
counts and exact flag sets), plus a crafted corpus with a planted far
outlier in a tight cluster.
"""

import math

from readability_1_spark.queries import (
    OUTLIER_PCT,
    q_kmeans_outlier_flags,
)

SF = "/root/testdata/sf0.001"


def test_outlier_flags_match_ceil_rule(spark):
    rows = q_kmeans_outlier_flags(spark, SF).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.centroid_id, []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == 500
    for cid, members in by_cluster.items():
        n = len(members)
        assert all(r.cluster_n == n for r in members)
        n_flag = (n * OUTLIER_PCT + 99) // 100  # integer ceil
        flagged = [r for r in members if r.is_outlier]
        assert len(flagged) == n_flag, (cid, n, len(flagged))
        # the flagged set is exactly the farthest n_flag by (dist, vec_id)
        order = sorted(members, key=lambda r: (-r.dist, r.vec_id))
        expect_ids = {r.vec_id for r in order[:n_flag]}
        assert {r.vec_id for r in flagged} == expect_ids


def test_outlier_flags_planted_outlier(spark, tmp_path):
    # eight tight clusters (so kmeans seeds resolve them), plus one point
    # far from its nearest center - it must be flagged in its cluster.
    rows = []
    vid = 0
    for i in range(8):
        center = [0.0] * 4
        center[i % 4] = 30.0 * (1 + i // 4)
        for j in range(3):
            p = list(center)
            p[(i + 1) % 4] += 0.1 * j
            rows.append((vid, [float(x) for x in p], 0))
            vid += 1
    # planted outlier: near cluster 0's center direction but far off
    far = [12.0, 6.0, 0.0, 0.0]
    rows.append((vid, [float(x) for x in far], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))

    out = {r.vec_id: r for r in q_kmeans_outlier_flags(spark, str(tmp_path)).collect()}
    assert len(out) == vid + 1
    planted = out[vid]
    cluster = [r for r in out.values() if r.centroid_id == planted.centroid_id]
    # the planted point is the farthest member of its cluster and flagged
    assert planted.dist == max(r.dist for r in cluster)
    assert planted.is_outlier
    # every cluster still obeys the ceil rule
    for cid in {r.centroid_id for r in out.values()}:
        members = [r for r in out.values() if r.centroid_id == cid]
        n_flag = (len(members) * OUTLIER_PCT + 99) // 100
        assert sum(r.is_outlier for r in members) == n_flag
