"""Executable stand-in reference: a single-process Pregel.

/root/reference was empty at build time (SURVEY.md §0), so THIS is the
reference implementation whose per-vertex outputs the Spark engine
must match — PageRank allclose 1e-6, CC/LPA/triangles exact
(BASELINE.json:14).  It implements, in plain Python dicts, the SAME
pinned semantics paragraphs as the engine (SURVEY §2.2 A1–A4); the
oracle itself is cross-checked against closed-form micro-graph answers
in test_oracle_selfcheck.py.
"""

from __future__ import annotations

from collections import defaultdict

Edge = tuple[object, object, float]


def _vertices(edges: list[Edge]) -> set:
    vs = set()
    for s, d, _w in edges:
        vs.add(s)
        vs.add(d)
    return vs


def _dedupe_directed(edges: list[Edge]) -> dict[tuple, float]:
    """Collapse multi-edges (sum weights), matching build_edges output."""
    agg: dict[tuple, float] = defaultdict(float)
    for s, d, w in edges:
        if s != d:
            agg[(s, d)] += w
    return dict(agg)


def oracle_pagerank(
    edges: list[Edge],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> dict:
    """A1: pr' = (1-d)/N + d·Σ pr_u/outdeg_u; unweighted outdeg =
    #distinct out-neighbors; dangling mass leaks; init 1/N; stop when
    max |delta| < tol."""
    directed = _dedupe_directed(edges)
    vs = _vertices(edges)
    n = len(vs)
    out: dict = defaultdict(list)
    for (s, d), _w in directed.items():
        out[s].append(d)
    pr = {v: 1.0 / n for v in vs}
    for _ in range(max_iter):
        sums: dict = defaultdict(float)
        for u, nbrs in out.items():
            c = pr[u] / len(nbrs)
            for v in nbrs:
                sums[v] += c
        new = {v: (1.0 - damping) / n + damping * sums.get(v, 0.0) for v in vs}
        max_delta = max(abs(new[v] - pr[v]) for v in vs)
        pr = new
        if max_delta < tol:
            break
    return pr


def _symmetrize(edges: list[Edge]) -> dict[tuple, float]:
    agg: dict[tuple, float] = defaultdict(float)
    for s, d, w in edges:
        if s != d:
            agg[(s, d)] += w
            agg[(d, s)] += w
    return dict(agg)


def oracle_cc(edges: list[Edge], max_iter: int = 10_000) -> dict:
    """A2: undirected hash-min label propagation to fixpoint; exact."""
    sym = _symmetrize(edges)
    vs = _vertices(edges)
    nbrs: dict = defaultdict(list)
    for (s, d), _w in sym.items():
        nbrs[s].append(d)
    comp = {v: v for v in vs}
    changed = set(vs)
    for _ in range(max_iter):
        inbox: dict = {}
        for u in changed:
            for v in nbrs[u]:
                cur = inbox.get(v)
                if cur is None or comp[u] < cur:
                    inbox[v] = comp[u]
        new_changed = set()
        for v, m in inbox.items():
            if m < comp[v]:
                comp[v] = m
                new_changed.add(v)
        changed = new_changed
        if not changed:
            break
    return comp


def oracle_lpa(edges: list[Edge], max_iter: int = 20) -> dict:
    """A3: sync LPA, weighted argmax of in-messages over symmetrized
    edges, ties -> smallest label, self does not vote, no-message
    vertices keep their label; bounded supersteps; halt on no change."""
    sym = _symmetrize(edges)
    vs = _vertices(edges)
    in_edges: dict = defaultdict(list)  # v -> [(u, w)]
    for (u, v), w in sym.items():
        in_edges[v].append((u, w))
    label = {v: v for v in vs}
    for _ in range(max_iter):
        new = {}
        any_changed = False
        for v in vs:
            votes: dict = defaultdict(float)
            for u, w in in_edges[v]:
                votes[label[u]] += w
            if votes:
                # Highest weight wins; among equals the SMALLEST label.
                best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                new[v] = best[0]
            else:
                new[v] = label[v]
            if new[v] != label[v]:
                any_changed = True
        label = new
        if not any_changed:
            break
    return label


def oracle_triangles(edges: list[Edge]) -> tuple[dict, int]:
    """A4: exact per-vertex + global triangle counts on the
    canonicalized undirected graph."""
    und = set()
    for s, d, _w in edges:
        if s != d:
            und.add((min(s, d, key=_key), max(s, d, key=_key)))
    nbrs: dict = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    vs = _vertices(edges)
    count = {v: 0 for v in vs}
    total = 0
    for a, b in und:
        common = nbrs[a] & nbrs[b]
        for c in common:
            # Count each triangle once via a canonical ordering.
            if _lt(a, c) and _lt(b, c):
                total += 1
                count[a] += 1
                count[b] += 1
                count[c] += 1
    return count, total


def _key(x):
    return (str(type(x)), x)


def _lt(a, b):
    return _key(a) < _key(b)


def oracle_sssp(edges: list[Edge], source, max_iter: int = 10_000) -> dict:
    """A5: directed weighted SSSP — Bellman-Ford style relaxation to
    fixpoint; unreachable vertices map to None."""
    directed = _dedupe_directed(edges)
    vs = _vertices(edges)
    out: dict = defaultdict(list)
    for (s, d), w in directed.items():
        out[s].append((d, w))
    INF = float("inf")
    dist = {v: (0.0 if v == source else INF) for v in vs}
    changed = {source} if source in dist else set()
    for _ in range(max_iter):
        inbox: dict = {}
        for u in changed:
            for v, w in out[u]:
                cand = dist[u] + w
                if v not in inbox or cand < inbox[v]:
                    inbox[v] = cand
        new_changed = set()
        for v, m in inbox.items():
            if m < dist[v]:
                dist[v] = m
                new_changed.add(v)
        changed = new_changed
        if not changed:
            break
    return {v: (None if d == INF else d) for v, d in dist.items()}


def oracle_hits(edges: list[Edge], steps: int) -> dict:
    """HITS, simultaneous update with normalize-before-use (the exact
    semantics paragraph of algos/hits.py), final L2 normalization.
    Returns {v: (authority, hub)}."""
    import math

    directed = _dedupe_directed(edges)
    vs = sorted(_vertices(edges), key=_key)
    auth = {v: 1.0 for v in vs}
    hub = {v: 1.0 for v in vs}
    for _ in range(steps):
        na = math.sqrt(max(sum(x * x for x in auth.values()), 1e-300))
        nh = math.sqrt(max(sum(x * x for x in hub.values()), 1e-300))
        new_auth = {v: 0.0 for v in vs}
        new_hub = {v: 0.0 for v in vs}
        for (s, d) in directed:
            new_auth[d] += hub[s] / nh
            new_hub[s] += auth[d] / na
        auth, hub = new_auth, new_hub
    na = math.sqrt(max(sum(x * x for x in auth.values()), 1e-300))
    nh = math.sqrt(max(sum(x * x for x in hub.values()), 1e-300))
    return {v: (auth[v] / na, hub[v] / nh) for v in vs}


def oracle_kcore(edges: list[Edge], k: int, max_iter: int = 10_000) -> dict:
    """Synchronous k-core peeling on the symmetrized simple graph:
    each round removes every vertex whose alive-neighbor count < k.
    Returns {v: in_core_bool}."""
    sym = _symmetrize(edges)
    nbrs: dict = defaultdict(set)
    for (s, d) in sym:
        nbrs[s].add(d)
    alive = set(nbrs)
    for _ in range(max_iter):
        rm = {v for v in alive
              if sum(1 for u in nbrs[v] if u in alive) < k}
        if not rm:
            break
        alive -= rm
    return {v: (v in alive) for v in nbrs}


def oracle_msbfs(edges: list[Edge], sources: list) -> dict:
    """Directed multi-source reachability: bit i of a vertex's mask is
    set iff sorted-order source i reaches it (sources reach
    themselves)."""
    directed = _dedupe_directed(edges)
    vs = _vertices(edges)
    out: dict = defaultdict(list)
    for (s, d) in directed:
        out[s].append(d)
    srcs = sorted(set(sources))
    mask = {v: 0 for v in vs}
    for i, s in enumerate(srcs):
        if s not in vs:
            continue
        seen = {s}
        stack = [s]
        while stack:
            u = stack.pop()
            for v in out[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        for v in seen:
            mask[v] |= 1 << i
    return mask


def oracle_pagerank_weighted(
    edges: list[Edge],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> dict:
    """Weighted A1 variant: pr' = (1-d)/N + d·Σ pr_u·w_uv/W_u with
    parallel edges collapsed by weight-sum; same init/halt rules."""
    agg: dict = defaultdict(float)
    for s, d, w in edges:
        if s != d:
            agg[(s, d)] += w
    vs = _vertices(edges)
    n = len(vs)
    out: dict = defaultdict(list)
    wsum: dict = defaultdict(float)
    for (s, d), w in agg.items():
        out[s].append((d, w))
        wsum[s] += w
    pr = {v: 1.0 / n for v in vs}
    for _ in range(max_iter):
        sums: dict = defaultdict(float)
        for u, nbrs in out.items():
            for v, w in nbrs:
                sums[v] += pr[u] * w / wsum[u]
        new = {v: (1.0 - damping) / n + damping * sums.get(v, 0.0) for v in vs}
        max_delta = max(abs(new[v] - pr[v]) for v in vs)
        pr = new
        if max_delta < tol:
            break
    return pr


def oracle_scc(edges: list[Edge]) -> dict:
    """Strongly connected components (Kosaraju, iterative): vertex →
    MIN id of its SCC.  Self-loops dropped; vertices exist only via
    non-self-loop edges (the engine's convention)."""
    directed = {k for k in _dedupe_directed(edges)}
    vs = sorted({v for p in directed for v in p}, key=_key)
    out: dict = defaultdict(list)
    rev: dict = defaultdict(list)
    for (s, d) in directed:
        out[s].append(d)
        rev[d].append(s)
    # pass 1: finish order on the forward graph
    seen: set = set()
    order: list = []
    for v0 in vs:
        if v0 in seen:
            continue
        stack = [(v0, iter(out[v0]))]
        seen.add(v0)
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(out[w])))
                    advanced = True
                    break
            if not advanced:
                order.append(v)
                stack.pop()
    # pass 2: reverse graph in reverse finish order
    comp: dict = {}
    for v0 in reversed(order):
        if v0 in comp:
            continue
        members = [v0]
        comp[v0] = v0
        stack = [v0]
        while stack:
            v = stack.pop()
            for w in rev[v]:
                if w not in comp:
                    comp[w] = v0
                    members.append(w)
                    stack.append(w)
        m = min(members, key=_key)
        for u in members:
            comp[u] = m
    return comp


def oracle_ktruss(edges: list[Edge], k: int, max_iter: int = 10_000) -> set:
    """k-truss edge set on the canonical simple undirected graph:
    synchronously remove every edge in < k-2 surviving triangles until
    stable.  Returns the set of (lo, hi) pairs."""
    es = set()
    for s, d, _w in edges:
        if s != d:
            es.add((min(s, d, key=_key), max(s, d, key=_key)))
    need = k - 2
    for _ in range(max_iter):
        sup: dict = defaultdict(int)
        e_sorted = sorted(es, key=lambda p: (_key(p[0]), _key(p[1])))
        nbrs: dict = defaultdict(set)
        for (a, b) in es:
            nbrs[a].add(b)
            nbrs[b].add(a)
        for (a, b) in e_sorted:
            for c in nbrs[a] & nbrs[b]:
                sup[(a, b)] += 1
        # each triangle counted twice per edge (c ranges over both
        # common neighbors' sides? no — common nbrs of a,b counted
        # once each); support = |N(a) ∩ N(b)|
        new = {e for e in es if sup.get(e, 0) >= need}
        if new == es:
            return es
        es = new
    return es


def oracle_core_number(edges: list[Edge]) -> dict:
    """Exact core numbers via the sequential min-degree peel
    (Batagelj–Zaveršnik): repeatedly remove a minimum-degree vertex;
    core(v) = running max of the degree at removal time."""
    nbrs: dict = defaultdict(set)
    for s, d, _w in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    core: dict = {}
    k = 0
    remaining = set(deg)
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], _key(x)))
        k = max(k, deg[v])
        core[v] = k
        remaining.discard(v)
        for u in nbrs[v]:
            if u in remaining:
                deg[u] -= 1
    return core


def oracle_trussness(edges: list[Edge], max_k: int = 50) -> dict:
    """Exact trussness per canonical edge via strata peeling: for
    k = 3, 4, ... peel the survivors to the k-truss (synchronous
    rounds, same semantics as oracle_ktruss); edges removed at level k
    get trussness k-1; edges never in a triangle get the definitional
    floor 2."""
    es = set()
    for s, d, _w in edges:
        if s != d:
            es.add((min(s, d, key=_key), max(s, d, key=_key)))
    truss = {}
    surviving = set(es)
    for k in range(3, max_k + 1):
        need = k - 2
        while surviving:
            nbrs: dict = defaultdict(set)
            for (a, b) in surviving:
                nbrs[a].add(b)
                nbrs[b].add(a)
            sup = {e: len(nbrs[e[0]] & nbrs[e[1]]) for e in surviving}
            new = {e for e in surviving if sup[e] >= need}
            if new == surviving:
                break
            for e in surviving - new:
                truss[e] = k - 1
            surviving = new
        if not surviving:
            break
    for e in surviving:
        truss[e] = max_k
    return truss


def oracle_mis(edges: list[Edge]) -> dict:
    """Greedy MIS over (md5(str(v)), v) priority order — with fixed
    priorities this is exactly what pipelined Luby computes (the
    lexicographically-first MIS of the priority order)."""
    import hashlib

    nbrs: dict = defaultdict(set)
    vs = _vertices(edges)
    for s, d, _w in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)

    def prio(v):
        return (hashlib.md5(str(v).encode()).hexdigest(), _key(v))

    mis: set = set()
    blocked: set = set()
    for v in sorted(vs, key=prio):
        if v not in blocked:
            mis.add(v)
            blocked.update(nbrs[v])
    return {v: v in mis for v in vs}


def oracle_walks(
    edges: list[Edge], length: int, seed: str = "42", n_walks: int = 1,
) -> set:
    """Deterministic hash-chosen walks (algos/walks.py semantics):
    returns the set of (start, walk, step, vertex) rows."""
    import hashlib

    directed = _dedupe_directed(edges)
    out: dict = defaultdict(list)
    for (s, d) in directed:
        out[s].append(d)
    rows: set = set()
    for v in _vertices(edges):
        for w in range(n_walks):
            cur = v
            rows.add((v, w, 0, v))
            for t in range(length):
                nbrs = out.get(cur)
                if not nbrs:
                    break

                def key(d):
                    h = hashlib.md5(
                        f"{seed}:{t}:{w}:{cur}:{d}".encode()).hexdigest()
                    return h + "|" + str(d)

                cur = min(nbrs, key=key)
                rows.add((v, w, t + 1, cur))
    return rows


def oracle_walks_weighted(
    edges: list[Edge], length: int, seed: str = "42", n_walks: int = 1,
) -> set:
    """Weight-proportional deterministic walks: u = 48-bit md5 prefix
    of (seed:t:w:cur) / 2^48; next = smallest dst (ascending order)
    whose running weight sum exceeds u * total.  Parallel edges
    collapse by SUMMING weight."""
    import hashlib

    wsum: dict = defaultdict(float)
    for (s, d, w) in edges:
        wsum[(s, d)] += w
    out: dict = defaultdict(list)
    for (s, d), w in sorted(wsum.items()):
        out[s].append((d, w))
    rows: set = set()
    for v in _vertices(edges):
        for wi in range(n_walks):
            cur = v
            rows.add((v, wi, 0, v))
            for t in range(length):
                nbrs = out.get(cur)
                if not nbrs:
                    break
                h = hashlib.md5(
                    f"{seed}:{t}:{wi}:{cur}".encode()).hexdigest()
                u = int(h[:12], 16) / float(2 ** 48)
                total = sum(w for _d, w in nbrs)
                cum = 0.0
                nxt = None
                for d, w in nbrs:  # ascending dst
                    cum += w
                    if cum > u * total:
                        nxt = d
                        break
                cur = nxt
                rows.add((v, wi, t + 1, cur))
    return rows


def oracle_walks_node2vec(
    edges: list[Edge], length: int, p: float, q: float,
    seed: str = "42", n_walks: int = 1,
) -> set:
    """Second-order (node2vec p/q) deterministic weighted walks
    (algos/walks.py semantics): edge weight scaled by alpha(prev, cur,
    dst) — 1/p if dst == prev, 1 if directed edge (prev, dst) exists,
    else 1/q; no predecessor at step 1 (alpha = 1, prev hashes as
    '-'); u salts on the predecessor: md5(seed:t:w:cur:prev|'-')."""
    import hashlib

    wsum: dict = defaultdict(float)
    for (s, d, w) in edges:
        wsum[(s, d)] += w
    adj = set(wsum)
    out: dict = defaultdict(list)
    for (s, d), w in sorted(wsum.items()):
        out[s].append((d, w))
    rows: set = set()
    for v in _vertices(edges):
        for wi in range(n_walks):
            cur, prev = v, None
            rows.add((v, wi, 0, v))
            for t in range(length):
                nbrs = out.get(cur)
                if not nbrs:
                    break
                ptxt = "-" if prev is None else str(prev)
                h = hashlib.md5(
                    f"{seed}:{t}:{wi}:{cur}:{ptxt}".encode()).hexdigest()
                u = int(h[:12], 16) / float(2 ** 48)

                def alpha(d):
                    if prev is None:
                        return 1.0
                    if d == prev:
                        return 1.0 / p
                    if (prev, d) in adj:
                        return 1.0
                    return 1.0 / q

                eff = [(d, w * alpha(d)) for d, w in nbrs]
                total = sum(w for _d, w in eff)
                cum = 0.0
                nxt = None
                for d, w in eff:  # ascending dst
                    cum += w
                    if cum > u * total:
                        nxt = d
                        break
                prev, cur = cur, nxt
                rows.add((v, wi, t + 1, cur))
    return rows


def oracle_anf(
    edges: list, h: int, k: int = 4, seed: str = "anf42"
) -> dict:
    """A9 oracle: exact replica of the derandomized FM sketch —
    lowest-set-bit registers from 48-bit md5 prefixes, h rounds of
    self ∪ bit-or over OUT-neighbors on the distinct directed edge
    set, shift-and-literal estimate read-out (algos/anf.py).  Returns
    {vertex: nf rounded 6dp}."""
    import hashlib

    dedges = {(e[0], e[1]) for e in edges if e[0] != e[1]}
    verts = sorted({v for e in dedges for v in e}, key=str)
    out = defaultdict(set)
    for s, d in dedges:
        out[s].add(d)

    def mask(j, v):
        hh = int(
            hashlib.md5(f"{seed}:{j}:{v}".encode()).hexdigest()[:12], 16
        )
        return (1 << 48) if hh == 0 else hh & (-hh)

    regs = {v: [mask(j, v) for j in range(k)] for v in verts}
    for _round in range(h):
        new = {}
        for v in verts:
            rs = list(regs[v])
            for w in out[v]:
                for j in range(k):
                    rs[j] |= regs[w][j]
            new[v] = rs
        regs = new

    def est(rs):
        s = 0
        for m in rs:
            t = (~m) & (m + 1)  # lowest zero bit
            s += t.bit_length() - 1
        i, f = divmod(s, k)
        return round((1 << i) * (2.0 ** (f / k)) / 0.77351, 6)

    return {v: est(regs[v]) for v in verts}


def oracle_centralities(
    edges: list, h: int, k: int = 4, seed: str = "anf42"
) -> dict:
    """HyperBall read-out oracle: per-round ANF estimates, harmonic =
    Σ (est_t - est_{t-1})/t and closeness_sum = Σ t·(est_t - est_{t-1})
    accumulated in round order (algos/anf.py::centralities).  Returns
    {vertex: (nf, harmonic, closeness_sum)}."""
    import hashlib

    dedges = {(e[0], e[1]) for e in edges if e[0] != e[1]}
    verts = sorted({v for e in dedges for v in e}, key=str)
    out = defaultdict(set)
    for s, d in dedges:
        out[s].add(d)

    def mask(j, v):
        hh = int(
            hashlib.md5(f"{seed}:{j}:{v}".encode()).hexdigest()[:12], 16
        )
        return (1 << 48) if hh == 0 else hh & (-hh)

    def est(rs):
        s = 0
        for m in rs:
            t = (~m) & (m + 1)
            s += t.bit_length() - 1
        i, f = divmod(s, k)
        return round((1 << i) * (2.0 ** (f / k)) / 0.77351, 6)

    regs = {v: [mask(j, v) for j in range(k)] for v in verts}
    prev_est = {v: est(regs[v]) for v in verts}
    harm = {v: 0.0 for v in verts}
    close = {v: 0.0 for v in verts}
    for t in range(1, h + 1):
        new = {}
        for v in verts:
            rs = list(regs[v])
            for w in out[v]:
                for j in range(k):
                    rs[j] |= regs[w][j]
            new[v] = rs
        regs = new
        for v in verts:
            e_t = est(regs[v])
            d = e_t - prev_est[v]
            harm[v] = harm[v] + d / float(t)
            close[v] = close[v] + float(t) * d
            prev_est[v] = e_t
    return {
        v: (prev_est[v], round(harm[v], 6), round(close[v], 6))
        for v in verts
    }


def oracle_matching(edges: list[Edge], max_rounds: int = 10_000) -> dict:
    """Deterministic local-max matching (algos/matching.py semantics):
    per round every unmatched vertex points at the min-md5-priority
    still-unmatched neighbor; mutual pointers match.  Returns
    {v: mate-or-None}."""
    import hashlib

    nbrs: dict = defaultdict(set)
    vs = _vertices(edges)
    for s, d, _w in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)

    def prio(v, u):
        lo, hi = sorted((str(v), str(u)))
        return (hashlib.md5(f"{lo}|{hi}".encode()).hexdigest(), _key(u))

    mate: dict = {}
    for _ in range(max_rounds):
        cand = {}
        for v in vs:
            if v in mate:
                continue
            act = [u for u in nbrs[v] if u not in mate]
            if act:
                cand[v] = min(act, key=lambda u: prio(v, u))
        newly = [(v, u) for v, u in cand.items() if cand.get(u) == v]
        if not newly:
            break
        for v, u in newly:
            mate[v] = u
    return {v: mate.get(v) for v in vs}


def oracle_semiclusters(
    edges: list[Edge], supersteps: int = 3, c_max: int = 3, m_max: int = 4,
) -> dict:
    """Pinned semi-clustering (algos/semicluster.py semantics, [P §5.3],
    f_B = 1/2): returns {v: [(rank, members_str, score), ...]}.  I/B
    are recomputed per member set from exact integer weights — the
    engine's incremental updates are set functions, so they agree."""
    w: dict = defaultdict(int)
    nbrs: dict = defaultdict(set)
    for s, d, wt in edges:
        if s != d:
            a, b = str(s), str(d)
            w[(a, b)] += int(wt)
            w[(b, a)] += int(wt)
            nbrs[a].add(b)
            nbrs[b].add(a)
    # symmetrize() sums BOTH directions of a directed pair into the
    # collapsed undirected weight; mirror that: w already added per
    # directed input edge above.
    vs = sorted(nbrs)
    degw = {v: sum(w[(v, u)] for u in nbrs[v]) for v in vs}

    def ib(members: tuple) -> tuple:
        ms = set(members)
        i = sum(
            w[(a, b)] for a in members for b in nbrs[a]
            if b in ms and a < b
        )
        bnd = sum(
            w[(a, b)] for a in members for b in nbrs[a] if b not in ms
        )
        return i, bnd

    def score(members: tuple, i: int, bnd: int) -> float:
        n = len(members)
        if n == 1:
            return 0.0
        return (2 * i - bnd) / float(n * (n - 1))

    state = {v: {(v,): (0, degw[v])} for v in vs}
    for _ in range(supersteps):
        new = {v: dict(cl) for v, cl in state.items()}
        for v in vs:
            for u in nbrs[v]:
                for members, (i, bnd) in state[u].items():
                    if v in members:
                        new[v][members] = (i, bnd)
                    elif len(members) < m_max:
                        m2 = tuple(sorted(members + (v,)))
                        new[v][m2] = ib(m2)
        state = {}
        for v, cl in new.items():
            ranked = sorted(
                cl.items(),
                key=lambda kv: (-score(kv[0], *kv[1]), ",".join(kv[0])),
            )[:c_max]
            state[v] = dict(ranked)
    out = {}
    for v in vs:
        ranked = sorted(
            state[v].items(),
            key=lambda kv: (-score(kv[0], *kv[1]), ",".join(kv[0])),
        )
        out[v] = [
            (r + 1, ",".join(m), round(score(m, *ibv), 9))
            for r, (m, ibv) in enumerate(ranked)
        ]
    return out
