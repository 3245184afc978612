"""Numpy replication of operators/graph_ann.py for parameter sweeps.

Replicates the exact algorithm (multiplicative-hash successor init,
NN-descent local-join rounds, batched beam search) so parameter
choices can be measured at N=2000 in seconds instead of Spark minutes.
Run: python tools/graph_ann_proto.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow.parquet as pq

INIT_MULT = 2654435761
INIT_BUCKET = 32


def load(sf: str):
    t = pq.read_table(f"/root/testdata/sf{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    E = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], E[order]


def cos_matrix(E):
    n = E / np.linalg.norm(E, axis=1, keepdims=True)
    C = n @ n.T
    np.fill_diagonal(C, -2.0)
    return np.round(C, 6)


def exact_topk(C, k):
    # ties: cosine desc, id asc -> lexsort on (-cos, id)
    n = C.shape[0]
    out = []
    for i in range(n):
        idx = np.lexsort((np.arange(n), -C[i]))[:k]
        out.append(set(idx.tolist()))
    return out


def init_graph(ids, k):
    n = len(ids)
    nb = max(1, n // INIT_BUCKET)
    edges = set()
    for slot in range(1, k + 1):
        mult = (INIT_MULT * 2 * slot + 1) % 4294967296
        h = ((ids % 4294967296) * mult) % 4294967296
        bucket = h % nb
        ordkey = h // nb
        for b in np.unique(bucket):
            members = np.where(bucket == b)[0]
            order = members[np.lexsort((ids[members], ordkey[members]))]
            m = len(order)
            for j in range(m):
                a, c = order[j], order[(j + 1) % m]
                if a != c:
                    edges.add((a, c))
    return edges


def top_k_per_vertex(pairs, C, k):
    """pairs: set of (v,u) index pairs -> dict v -> list of top-k u."""
    byv = {}
    for v, u in pairs:
        byv.setdefault(v, []).append(u)
    g = {}
    for v, us in byv.items():
        us = sorted(set(us), key=lambda u: (-C[v, u], u))[:k]
        g[v] = us
    return g


def nn_descent(ids, C, k, max_iters):
    pairs = init_graph(ids, k)
    g = top_k_per_vertex(pairs, C, k)
    for it in range(max_iters):
        cand = set()
        for v, us in g.items():
            for u in us:
                cand.add((v, u))
                cand.add((u, v))
        for u, ws in g.items():
            pass
        # two-hop v->u->w
        rev = {}
        for v, us in g.items():
            for u in us:
                rev.setdefault(u, []).append(v)
        for u, ws in g.items():
            for v in rev.get(u, []):
                for w in ws:
                    if v != w:
                        cand.add((v, w))
        g2 = top_k_per_vertex(cand, C, k)
        changed = sum(
            1 for v in g2 if g2[v] != g.get(v)
        )
        g = g2
        if changed == 0:
            return g, it + 1
    return g, max_iters


def graph_recall(g, truth_k, k):
    hits = tot = 0
    for v, us in g.items():
        hits += len(set(us) & truth_k[v])
        tot += len(truth_k[v])
    return hits / tot


def beam_search(g, C, queries, entries, beam, hops, topk):
    res = {}
    for q in queries:
        frontier = [e for e in entries if e != q]
        frontier = sorted(set(frontier), key=lambda u: (-C[q, u], u))[:beam]
        for _ in range(hops):
            cand = set(frontier)
            for node in frontier:
                for nb_ in g.get(node, []):
                    if nb_ != q:
                        cand.add(nb_)
            frontier = sorted(cand, key=lambda u: (-C[q, u], u))[:beam]
        res[q] = sorted(frontier, key=lambda u: (-C[q, u], u))[:topk]
    return res


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    ids, E = load(sf)
    n = len(ids)
    C = cos_matrix(E)
    print(f"N={n}")
    truth5 = exact_topk(C, 5)
    n_queries = 10
    queries = list(range(n_queries))  # ids are 0..n-1 contiguous here

    for k in [12, 16, 20, 24]:
        t0 = time.time()
        truth_k = exact_topk(C, k)
        g, iters = nn_descent(ids, C, k, max_iters=12)
        gr = graph_recall(g, truth_k, k)
        for beam, hops, ne in [(16, 4, 1), (32, 6, 8), (48, 8, 16), (64, 8, 32)]:
            entries = sorted(
                range(n),
                key=lambda i: (((ids[i] % 4294967296) * INIT_MULT) % 4294967296, ids[i]),
            )[:ne]
            res = beam_search(g, C, queries, entries, beam, hops, 5)
            sr = np.mean([
                len(set(res[q]) & truth5[q]) / 5 for q in queries
            ])
            print(
                f"K={k} iters_used={iters} graph_recall@{k}={gr:.3f} "
                f"beam={beam} hops={hops} entries={ne} search_recall@5={sr:.3f} "
                f"({time.time()-t0:.1f}s)"
            )


if __name__ == "__main__":
    main()
