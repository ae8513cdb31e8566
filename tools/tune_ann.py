"""Offline tuner for the multi-probe LSH ANN operator.

Replicates _lsh_weight / _lsh_bucket_col exactly (same md5-parity
hyperplanes) in numpy and sweeps (tables, bits, probes) configurations,
reporting recall@10 vs the exact cosine top-10 and the mean candidate
fraction per query.  Query-directed multi-probe (Lv et al. 2007, public):
the probe sequence flips the sign bits with the smallest |projection|
margin first — those are the bits most likely to disagree with a true
neighbor's.

Usage: python3 tools/tune_ann.py [sf_dir]
"""

import hashlib
import itertools
import sys

import duckdb
import numpy as np


def weights(prefix: str, n_bits: int, dims: int) -> np.ndarray:
    w = np.empty((n_bits, dims))
    for b in range(n_bits):
        for i in range(dims):
            h = hashlib.md5(f"{prefix}{b}:{i}".encode()).hexdigest()[0]
            w[b, i] = 1.0 if h in "89abcdef" else -1.0
    return w


def load(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, X


def evaluate(X: np.ndarray, n_tables: int, n_bits: int, n_probes: int,
             k: int = 10) -> tuple[float, float]:
    """Returns (recall@k, mean candidate fraction) over ALL vectors as
    queries (leave-one-out)."""
    n, d = X.shape
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -2.0)
    true_top = np.argsort(-S, axis=1)[:, :k]

    # per-table: projections (n, bits), bucket ids (n,)
    cand = [set() for _ in range(n)]
    powers = 1 << np.arange(n_bits)
    for t in range(n_tables):
        W = weights(f"{t}:", n_bits, d)
        proj = X @ W.T                       # (n, bits)
        bits = (proj > 0).astype(np.int64)
        bucket = bits @ powers
        # bucket -> member list
        members: dict[int, np.ndarray] = {}
        for bkt in np.unique(bucket):
            members[bkt] = np.nonzero(bucket == bkt)[0]
        # Query-directed probe sequence (Lv et al. 2007): candidate probes
        # are subsets of the 4 lowest-|margin| bits, ranked by the summed
        # margin of the flipped bits; take the first n_probes after the
        # exact bucket.
        margin_order = np.argsort(np.abs(proj), axis=1)  # (n, bits)
        for q in range(n):
            # Fixed-structure probe set (SQL-replicable): single flips of
            # the n_probes lowest-|margin| bits, plus the double flip of
            # the two lowest when n_probes >= 3.
            low = margin_order[q]
            xors = [int(powers[low[j]]) for j in range(min(n_probes, n_bits))]
            if n_probes >= 3 and n_bits >= 2:
                xors.append(int(powers[low[0]]) ^ int(powers[low[1]]))
            probes = [bucket[q]] + [bucket[q] ^ x for x in xors]
            for bkt in probes:
                m = members.get(bkt)
                if m is not None:
                    cand[q].update(m.tolist())
    hits = 0
    total_cand = 0
    for q in range(n):
        cand[q].discard(q)
        total_cand += len(cand[q])
        hits += len(cand[q].intersection(true_top[q].tolist()))
    return hits / (n * k), total_cand / (n * (n - 1))


def clustered_corpus(n_clusters: int = 50, per: int = 10, d: int = 64,
                     noise: float = 0.35, seed: int = 7) -> np.ndarray:
    """Synthetic clustered embeddings (the realistic ANN case: text/image
    embeddings live near manifold clusters, not uniformly on the sphere)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d))
    X = np.repeat(centers, per, axis=0) + noise * rng.standard_normal(
        (n_clusters * per, d)
    )
    return X


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ids, X = load(sf_dir)
    print(f"n={len(ids)} d={X.shape[1]} (sf0.01 random vectors — LSH-adversarial)")
    print(f"{'tables':>6} {'bits':>4} {'probes':>6} {'recall@10':>9} {'cand%':>6}")
    for T, b, m in itertools.product((4, 6, 8), (5, 6), (3, 4, 5)):
        r, f = evaluate(X, T, b, m)
        marker = " <-- SHIPPED" if (T, b, m) == (6, 6, 5) else ""
        print(f"{T:>6} {b:>4} {m:>6} {r:>9.3f} {f:>6.1%}{marker}")
    print("\nclustered corpus (50 clusters x 10, noise 0.35) — the realistic case:")
    Xc = clustered_corpus()
    for T, b, m in ((6, 6, 5), (6, 6, 3), (4, 6, 3)):
        r, f = evaluate(Xc, T, b, m)
        print(f"{T:>6} {b:>4} {m:>6} {r:>9.3f} {f:>6.1%}")
    print("\nclustered 5000-vector corpus, bits scaled with log n (the 100 TB rule):")
    Xb = clustered_corpus(n_clusters=500, per=10)
    for T, b, m in ((6, 10, 5), (6, 12, 5), (4, 10, 3)):
        r, f = evaluate(Xb, T, b, m)
        print(f"{T:>6} {b:>4} {m:>6} {r:>9.3f} {f:>6.1%}")


if __name__ == "__main__":
    main()
