"""PQ / IVF-PQ quality evidence: recall of the ADC rankings vs the exact
L2 top-k, replicated in numpy with the SAME deterministic recipe as the
Spark/DuckDB operators (round-6 at every kmeans step, centroid_id / vec_id
tiebreaks), over all corpus vectors as leave-one-out queries — not just the
5 in-query demo queries.

Usage: python3 tools/pq_quality.py [sf_dir]
"""

import sys

import numpy as np

from tune_ann import load  # same loader

PQ_M, PQ_SUBDIM, PQ_K, PQ_ITERS = 4, 16, 8, 2
IVFPQ_K, IVFPQ_NPROBE = 8, 2


def train_codebook(sub: np.ndarray) -> np.ndarray:
    cent = np.round(sub[:PQ_K].copy(), 6)
    for _ in range(PQ_ITERS):
        d2 = np.round(((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1), 6)
        code = d2.argmin(1)  # argmin = lowest index on ties
        for c in range(PQ_K):
            m = code == c
            if m.any():
                cent[c] = np.round(sub[m].mean(0), 6)
    return cent


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ids, X = load(sf_dir)
    n = len(ids)
    cents, codes, dt_all = [], [], []
    for s in range(PQ_M):
        sub = X[:, s * PQ_SUBDIM:(s + 1) * PQ_SUBDIM]
        cent = train_codebook(sub)
        d2 = np.round(((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1), 6)
        cents.append(cent)
        codes.append(d2.argmin(1))
        dt_all.append(d2)  # n queries x PQ_K table per subspace
    codes = np.stack(codes, 1)           # n x M
    # ADC distance of every (query, vec) pair: sum of table lookups
    adc = np.zeros((n, n))
    for s in range(PQ_M):
        adc += dt_all[s][:, codes[:, s]]
    exact = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(adc, np.inf)
    np.fill_diagonal(exact, np.inf)

    # coarse lists for IVF-PQ (first-K raw centroids, L2, lowest-id ties)
    cd = np.round(np.sqrt(((X[:, None, :] - X[None, :8, :]) ** 2).sum(-1)), 6)
    lists = cd.argmin(1)
    probes = np.argsort(cd, axis=1, kind="stable")[:, :IVFPQ_NPROBE]

    for k in (1, 5, 10):
        true = np.argsort(exact, axis=1, kind="stable")[:, :k]
        got = np.argsort(adc, axis=1, kind="stable")[:, :k]
        rec = np.mean([len(set(true[i]) & set(got[i])) / k for i in range(n)])
        print(f"PQ ADC recall@{k} vs exact L2 (n={n} leave-one-out): {rec:.3f}")
    # IVF-PQ: candidates restricted to probed lists
    k = 5
    true = np.argsort(exact, axis=1, kind="stable")[:, :k]
    hits = []
    cand_frac = []
    for i in range(n):
        mask = np.isin(lists, probes[i])
        mask[i] = False
        cand_frac.append(mask.mean())
        a = np.where(mask, adc[i], np.inf)
        got = np.argsort(a, kind="stable")[:k]
        hits.append(len(set(true[i]) & set(got)) / k)
    print(f"IVF-PQ recall@{k} (nprobe={IVFPQ_NPROBE}/{IVFPQ_K} lists): "
          f"{np.mean(hits):.3f}  mean candidate fraction {np.mean(cand_frac):.3f}")




def clustered_control(n_clusters: int = 50, per: int = 10,
                      noise: float = 0.05, seed: int = 7) -> None:
    """Same measurement on a CLUSTERED synthetic corpus (real embedding
    manifolds cluster; the sf tables are near-uniform random vectors, the
    worst case for any quantizer — on uniform random points all pairs are
    nearly equidistant in 64-dim, so there is no ranking signal to keep)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, 64))
    X = np.repeat(centers, per, axis=0) + noise * rng.normal(
        size=(n_clusters * per, 64)
    )
    n = len(X)
    cents, codes, dt_all = [], [], []
    for s in range(PQ_M):
        sub = X[:, s * PQ_SUBDIM:(s + 1) * PQ_SUBDIM]
        cent = train_codebook(sub)
        d2 = np.round(((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1), 6)
        codes.append(d2.argmin(1))
        dt_all.append(d2)
    codes = np.stack(codes, 1)
    adc = np.zeros((n, n))
    for s in range(PQ_M):
        adc += dt_all[s][:, codes[:, s]]
    exact = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(adc, np.inf)
    np.fill_diagonal(exact, np.inf)
    for k in (1, 5):
        true = np.argsort(exact, axis=1, kind="stable")[:, :k]
        got = np.argsort(adc, axis=1, kind="stable")[:, :k]
        rec = np.mean([len(set(true[i]) & set(got[i])) / k for i in range(n)])
        print(f"clustered control (C={n_clusters}x{per}, noise={noise}): "
              f"PQ ADC recall@{k}: {rec:.3f}")


def clustered_mate_recall(n_clusters: int = 50, per: int = 10,
                          noise: float = 0.05, seed: int = 7) -> None:
    """The metric PQ actually optimizes: same-cluster retrieval.  Points
    sharing a cell get IDENTICAL codes hence identical ADC distance (ties
    break on vec_id), so exact-rank recall@1 is structurally ~1/per on
    clustered data; what the code must preserve is membership — the
    fraction of a query's per-1 cluster mates inside its ADC top-(per-1)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, 64))
    X = np.repeat(centers, per, axis=0) + noise * rng.normal(
        size=(n_clusters * per, 64)
    )
    n = len(X)
    codes, dt_all = [], []
    for s in range(PQ_M):
        sub = X[:, s * PQ_SUBDIM:(s + 1) * PQ_SUBDIM]
        cent = train_codebook(sub)
        d2 = np.round(((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1), 6)
        codes.append(d2.argmin(1))
        dt_all.append(d2)
    codes = np.stack(codes, 1)
    adc = np.zeros((n, n))
    for s in range(PQ_M):
        adc += dt_all[s][:, codes[:, s]]
    np.fill_diagonal(adc, np.inf)
    label = np.repeat(np.arange(n_clusters), per)
    k = per - 1
    hits = []
    for i in range(n):
        got = np.argsort(adc[i], kind="stable")[:k]
        hits.append((label[got] == label[i]).mean())
    print(f"clustered control: cluster-mate recall@{k}: {np.mean(hits):.3f}")


SEMDEDUP_TAU_CTRL = 0.95  # production-style threshold for the control


def semdedup_quality(n_clusters: int = 50, per: int = 10,
                     noise: float = 0.02, seed: int = 11) -> None:
    """SemDeDup keep-rule quality on a clustered control, numpy replica of
    the exact operator recipe (k=8 kmeans, first-8 init, round-6, farthest-
    from-centroid keep, vec_id ties): with tight clusters every true
    duplicate group should end with EXACTLY ONE kept member (dedup
    invariant: no two kept members are tau-similar), and nothing outside a
    tau-clique should be dropped."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, per, axis=0) + noise * rng.normal(
        size=(n_clusters * per, 64)
    )
    n = len(X)
    # coarse kmeans (full-dim, k=8, 2 iters, round-6, lowest-id ties)
    cent = np.round(X[:8].copy(), 6)
    for _ in range(2):
        d = np.round(np.sqrt(((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1)), 6)
        a = d.argmin(1)
        for c in range(8):
            m = a == c
            if m.any():
                cent[c] = np.round(X[m].mean(0), 6)
    d = np.round(np.sqrt(((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1)), 6)
    assign = d.argmin(1)
    dist = d[np.arange(n), assign]
    norm = np.linalg.norm(X, axis=1)
    cos = np.round(X @ X.T / np.outer(norm, norm), 6)
    dropped = np.zeros(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i == j or assign[i] != assign[j]:
                continue
            if cos[i, j] >= SEMDEDUP_TAU_CTRL and (
                dist[j] > dist[i] or (dist[j] == dist[i] and j < i)
            ):
                dropped[i] = True
                break
    kept = ~dropped
    # invariant 1: no two KEPT members of one kmeans cluster are tau-similar
    viol = 0
    for i in range(n):
        for j in range(i + 1, n):
            if (kept[i] and kept[j] and assign[i] == assign[j]
                    and cos[i, j] >= SEMDEDUP_TAU_CTRL):
                viol += 1
    # invariant 2 (per true group, within one kmeans cluster): exactly one
    # survivor per (true-group x assigned-cluster) cell
    label = np.repeat(np.arange(n_clusters), per)
    cells = {}
    for i in range(n):
        cells.setdefault((label[i], assign[i]), []).append(i)
    multi = sum(1 for v in cells.values()
                if sum(kept[i] for i in v) != 1
                and all(cos[a_, b_] >= SEMDEDUP_TAU_CTRL
                        for a_ in v for b_ in v if a_ != b_))
    print(f"semdedup control (C={n_clusters}x{per}, tau={SEMDEDUP_TAU_CTRL}): "
          f"kept {kept.sum()}/{n}; tau-similar kept pairs: {viol}; "
          f"tau-clique cells with != 1 survivor: {multi}")


if __name__ == "__main__":
    main()
    clustered_control()
    clustered_mate_recall()
    semdedup_quality()
