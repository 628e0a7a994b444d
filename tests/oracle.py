"""Single-process float64 oracle for the engine's graph algorithms.

Implements the *same* parallel fast-local-move rule as the Spark engine
(and the CUDA reference's semantics, phaseOptimization*.cu) so small-graph
results can be compared exactly: modularity allclose 1e-6, labels equal
under the shared canonical relabeling (dense rank of community id).
Pure Python/NumPy — no Spark.
"""

from __future__ import annotations

from collections import defaultdict

THRESHOLD = 0.001


def _modularity(edges, comm, ctot, m):
    w_in = sum(w for (s, d, w) in edges if comm[s] == comm[d])
    sq = sum(v * v for v in ctot.values())
    return w_in / (2.0 * m) - sq / (4.0 * m * m)


def louvain_oracle(undirected_edges, threshold=THRESHOLD):
    """undirected_edges: iterable of (a, b[, w]) with a != b, deduped.

    Returns (labels: dict orig->community, modularity: float,
    level_metrics: list).
    """
    und = []
    for e in undirected_edges:
        a, b = e[0], e[1]
        w = float(e[2]) if len(e) > 2 else 1.0
        und.append((a, b, w))
    nodes = sorted({a for a, _, _ in und} | {b for _, b, _ in und})
    relabel = {v: i for i, v in enumerate(nodes)}
    # directed symmetric list
    edges = []
    for a, b, w in und:
        edges.append((relabel[a], relabel[b], w))
        edges.append((relabel[b], relabel[a], w))
    n = len(nodes)
    m = sum(w for _, _, w in und)
    labels = {i: i for i in range(n)}  # orig -> current-graph community

    q = None
    while True:
        k = defaultdict(float)
        for s, _, w in edges:
            k[s] += w
        comm = {v: v for v in range(n)}
        ctot = dict(k)
        q = _modularity(edges, comm, ctot, m)
        q_level_start = q

        frontier = None
        rnd = 0
        while True:
            q_old = q
            active = frontier if frontier is not None else set(range(n))
            # candidate weights per (node, dest community)
            wnc = defaultdict(float)
            for s, d, w in edges:
                if s != d and s in active:
                    wnc[(s, comm[d])] += w
            by_node = defaultdict(list)
            for (s, c), w in wnc.items():
                by_node[s].append((c, w))
            moves = {}
            for s, cands in by_node.items():
                selfw = 0.0 if rnd == 0 else dict(cands).get(comm[s], 0.0)
                best = None
                for c, w in cands:
                    delta = (w - selfw) / m + k[s] * (ctot[comm[s]] - k[s] - ctot[c]) / (2.0 * m * m)
                    if best is None or delta > best[0] or (delta == best[0] and c < best[1]):
                        best = (delta, c)
                if best is None:
                    continue
                delta, c = best
                if delta > 0 and c != comm[s] and (rnd != 0 or s < c):
                    moves[s] = c
            if moves:
                for s, c in moves.items():
                    comm[s] = c
                ctot = defaultdict(float)
                for v in range(n):
                    ctot[comm[v]] += k[v]
                ctot = dict(ctot)
                q = _modularity(edges, comm, ctot, m)
                moved = set(moves)
                frontier = {
                    s for s, d, _ in edges if d in moved and comm[d] != comm[s]
                }
            dq = q - q_old
            rnd += 1
            if not moves or dq <= threshold:
                break

        continue_opt = (q - q_level_start) > threshold
        surviving = sorted({c for c, v in ctot.items() if v > 0})
        dense = {c: i for i, c in enumerate(surviving)}
        labels = {o: dense[comm[labels[o]]] for o in labels}
        if not continue_opt:
            break
        # coarsen
        merged = defaultdict(float)
        for s, d, w in edges:
            merged[(dense[comm[s]], dense[comm[d]])] += w
        edges = [(s, d, w) for (s, d), w in merged.items()]
        n = len(surviving)

    # map back to original vertex ids
    inv = {i: v for v, i in relabel.items()}
    return {inv[o]: c for o, c in labels.items()}, q


def pagerank_oracle(undirected_edges, alpha=0.85, max_iter=100, tol=1e-10):
    """Weighted PageRank on the directed-symmetric graph; returns dict node->score."""
    und = [(e[0], e[1], float(e[2]) if len(e) > 2 else 1.0) for e in undirected_edges]
    nodes = sorted({a for a, _, _ in und} | {b for _, b, _ in und})
    out_w = defaultdict(float)
    adj = defaultdict(list)
    for a, b, w in und:
        out_w[a] += w
        out_w[b] += w
        adj[a].append((b, w))
        adj[b].append((a, w))
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(max_iter):
        nxt = {v: (1.0 - alpha) / n for v in nodes}
        for a in nodes:
            share = r[a] / out_w[a]
            for b, w in adj[a]:
                nxt[b] += alpha * share * w
        delta = sum(abs(nxt[v] - r[v]) for v in nodes)
        r = nxt
        if delta < tol:
            break
    return r


def powerlaw_graph(n=300, m_attach=2, seed=42):
    """Deterministic preferential-attachment graph (family of the
    reference's bundled graph-power-law-10000-2-99-1.edge)."""
    import random

    rng = random.Random(seed)
    edges = set()
    targets = list(range(m_attach))
    repeated = []
    for v in range(m_attach, n):
        for t in set(targets):
            a, b = min(v, t), max(v, t)
            if a != b:
                edges.add((a, b))
        repeated.extend(set(targets))
        repeated.extend([v] * m_attach)
        targets = [rng.choice(repeated) for _ in range(m_attach)]
    return sorted(edges)


def tarjan_scc(vertices, directed_edges):
    """Reference SCC decomposition (iterative Tarjan): {vertex: min id
    of its strongly connected component}."""
    from collections import defaultdict

    g = defaultdict(list)
    for a, b in directed_edges:
        if a != b:
            g[a].append(b)
    index, low, on, stack, out = {}, {}, set(), [], {}
    counter = [0]
    for root in sorted(vertices):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            advanced = False
            for i in range(pi, len(g[v])):
                w = g[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out
