"""Dominant-Set clustering (G4/G5) — replicator dynamics on the driver.

Faithful re-implementation of the reference algorithm semantics
(services/algorithms/DominantSet.py): given a similarity matrix A,
iterate x <- x * (A x) / (x^T A x) until ||dx|| < eps or max iters; the
support {i : x_i >= cutoff} is one cluster; peel it and repeat on the
remaining submatrix. Single-node numpy ON PURPOSE: the reference only
ever runs this on a PPR-gated subgraph of ~tens of nodes
(services/app.py:342-392), so distributing it would be pure overhead —
Spark's job is extracting/collecting the subgraph (see ppr_subgraph).

Constrained variant (G5): shift the diagonal of the non-seed block by
alpha = lambda_max(B) + 0.01 so clusters are biased toward the seeds
(reference :158-195). Modularity (G6) is computed directly from the
adjacency (no networkx in this environment).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-4       # reference :32
CUTOFF = 1e-5    # reference :33
MAX_ITERS = 2500  # reference :66-84


def replicator_dynamics(A: np.ndarray, x: np.ndarray | None = None,
                        eps: float = EPS, max_iters: int = MAX_ITERS
                        ) -> np.ndarray:
    n = A.shape[0]
    if x is None:
        x = np.ones(n) / n
    for _ in range(max_iters):
        ax = A @ x
        denom = float(x @ ax)
        if denom <= 0:
            break
        new_x = x * ax / denom
        if np.linalg.norm(new_x - x) < eps:
            x = new_x
            break
        x = new_x
    return x


def dominant_set_clusters(A: np.ndarray, cutoff: float = CUTOFF,
                          max_clusters: int = 100) -> list[list[int]]:
    """Peel dominant sets until the matrix is exhausted (reference
    :86-156). Returns clusters as lists of ORIGINAL indexes."""
    remaining = list(range(A.shape[0]))
    clusters: list[list[int]] = []
    while remaining and len(clusters) < max_clusters:
        sub = A[np.ix_(remaining, remaining)]
        if sub.max() <= 0:  # no similarity mass left: singletons
            clusters.extend([[i] for i in remaining])
            break
        x = replicator_dynamics(sub)
        members = [remaining[i] for i in np.flatnonzero(x >= cutoff)]
        if not members:  # numerical degenerate: emit the argmax alone
            members = [remaining[int(np.argmax(x))]]
        clusters.append(sorted(members))
        remaining = [i for i in remaining if i not in set(members)]
    return clusters


def constrained_dominant_set(A: np.ndarray, seed_idx: list[int]
                             ) -> np.ndarray:
    """G5: seed-biased dynamics via the diagonal shift alpha =
    lambda_max(non-seed block) + 0.01 (reference :158-195)."""
    n = A.shape[0]
    non_seed = [i for i in range(n) if i not in set(seed_idx)]
    B = A[np.ix_(non_seed, non_seed)]
    alpha = (float(np.max(np.linalg.eigvalsh(B))) + 0.01) if len(B) else 0.01
    shifted = A.copy()
    for i in non_seed:
        shifted[i, i] -= alpha
    return replicator_dynamics(shifted - shifted.min())


def modularity(A: np.ndarray, labels: list[int]) -> float:
    """G6 without networkx: Q = (1/2m) sum_ij (A_ij - k_i k_j / 2m)
    [same community]."""
    k = A.sum(axis=1)
    two_m = float(A.sum())
    if two_m == 0:
        return 0.0
    q = 0.0
    lab = np.asarray(labels)
    for c in np.unique(lab):
        idx = np.flatnonzero(lab == c)
        q += A[np.ix_(idx, idx)].sum() - float(k[idx].sum()) ** 2 / two_m
    return q / two_m


def service_clusters(edges_df, seed: str) -> list[tuple[int, int, str, float]]:
    """EP3 tail (services/app.py:342-392): constrained Dominant-Set over a
    collected PPR-gated subgraph, seed cluster first, seed first within
    its cluster. Returns (rank, cluster_id, qid, constrained_weight)
    rows — deterministic given the edge set (replicator dynamics is
    deterministic from the uniform start)."""
    rows = edges_df.collect()
    ids = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    pos = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for r in rows:
        A[pos[r["src"]], pos[r["dst"]]] = 1.0
        A[pos[r["dst"]], pos[r["src"]]] = 1.0
    clusters = dominant_set_clusters(A)
    x = (constrained_dominant_set(A, [pos[seed]])
         if seed in pos else np.zeros(len(ids)))
    # seed cluster first (reference reorders with the seed at the front),
    # then the reference's peel order
    order = sorted(range(len(clusters)),
                   key=lambda c: (0 if seed in {ids[i] for i in clusters[c]}
                                  else 1, c))
    out, rank = [], 0
    for new_cid, c in enumerate(order):
        members = [ids[i] for i in clusters[c]]
        members.sort(key=lambda q: (0 if q == seed else 1, q))
        for q in members:
            out.append((rank, new_cid, q, round(float(x[pos[q]]), 8)))
            rank += 1
    return out


def cluster_subgraph(edges_df, sim_col: str = None) -> list[list[str]]:
    """Spark boundary: collect a (small, PPR-gated) edge list and cluster
    it. Returns clusters of node ids."""
    rows = edges_df.collect()
    ids = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    pos = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for r in rows:
        w = float(r[sim_col]) if sim_col else 1.0
        A[pos[r["src"]], pos[r["dst"]]] = w
        A[pos[r["dst"]], pos[r["src"]]] = w
    return [[ids[i] for i in c] for c in dominant_set_clusters(A)]
