"""Stages 8-9: canonicalization equivalence + connected components."""

import numpy as np
import pandas as pd

from kgraft.graph.canonical import canonicalize, canonicalize_naive
from kgraft.graph.components import connected_components


def _mentions_ds(ray, seed=5, n=5000, n_entities=40):
    rng = np.random.RandomState(seed)
    # Zipf skew: entity 0 dominates (the head-entity fixture)
    w = 1.0 / np.arange(1, n_entities + 1)
    w /= w.sum()
    eid = rng.choice(n_entities, size=n, p=w)
    surf = [f"e{e}-v{rng.randint(3)}" for e in eid]
    return ray.data.from_pandas(
        pd.DataFrame({"entity_id": eid.astype("int64"), "surface": surf})
    )


def _norm(df):
    df = df.copy()
    df["aliases"] = df["aliases"].map(tuple)
    return df.sort_values("entity_id").reset_index(drop=True)


def test_canonicalize_equals_naive(ray_session):
    """Pre-aggregated (skew-defused) canonicalization == naive single
    groupby — the SURVEY §4 salted/partial equivalence requirement."""
    import ray

    a = _norm(canonicalize(_mentions_ds(ray)).to_pandas())
    b = _norm(canonicalize_naive(_mentions_ds(ray)).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def _edges_ds(ray, pairs):
    return ray.data.from_pandas(
        pd.DataFrame(
            {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]}
        ).astype("int64")
    )


_PAIRS = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 20), (3, 1), (30, 31)]
_WANT = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 30: 30, 31: 30}


def test_components_unionfind(ray_session):
    import ray

    got = connected_components(_edges_ds(ray, _PAIRS), method="unionfind")
    assert dict(zip(got["entity_id"], got["component_id"])) == _WANT


def test_components_labelprop_matches_unionfind(ray_session):
    import ray

    got = connected_components(_edges_ds(ray, _PAIRS), method="labelprop")
    assert dict(zip(got["entity_id"], got["component_id"])) == _WANT


def test_components_random_graph_both_methods(ray_session):
    import ray

    rng = np.random.RandomState(11)
    pairs = [tuple(p) for p in rng.randint(0, 60, size=(80, 2))]
    uf = connected_components(_edges_ds(ray, pairs), method="unionfind")
    lp = connected_components(_edges_ds(ray, pairs), method="labelprop")
    pd.testing.assert_frame_equal(
        uf.sort_values("entity_id").reset_index(drop=True),
        lp.sort_values("entity_id").reset_index(drop=True),
    )


def test_pagerank_matches_power_iteration(ray_session):
    import ray

    from kgraft.graph.pagerank import pagerank

    rng = np.random.RandomState(43)
    n, m = 60, 500
    # ids deliberately sparse/non-contiguous
    ids = np.sort(rng.choice(np.arange(0, 10000), size=n, replace=False)).astype("int64")
    src = ids[rng.randint(0, n, m)]
    dst = ids[rng.randint(0, n, m)]
    edges_df = pd.DataFrame({"subj_id": src, "obj_id": dst})
    got = pagerank(
        ray.data.from_pandas(edges_df).repartition(7), ids, damping=0.85, n_iter=25
    ).set_index("node_id")["rank"]

    # dense power-iteration oracle with identical semantics
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((n, n))
    for s, d in zip(src, dst):
        A[idx[s], idx[d]] += 1.0
    outdeg = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(25):
        w = np.where(outdeg > 0, r / np.where(outdeg > 0, outdeg, 1.0), 0.0)
        contrib = A.T @ w
        dangling = r[outdeg == 0].sum()
        r = 0.15 / n + 0.85 * (contrib + dangling / n)
    np.testing.assert_allclose(got.loc[ids].to_numpy(), r, rtol=1e-10, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9  # rank mass conserved


def test_pagerank_pregel_equals_streaming(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from kgraft.graph.pagerank import pagerank, pagerank_pregel

    rng = np.random.RandomState(17)
    n, m = 80, 900
    ids = np.sort(rng.choice(np.arange(0, 50000), size=n, replace=False)).astype("int64")
    src = ids[rng.randint(0, n, m)]
    dst = ids[rng.randint(0, n, m)]
    edges_df = pd.DataFrame({"subj_id": src, "obj_id": dst})
    # shard the edges over several parquet files, as the checkpoint does
    files = []
    for i in range(5):
        p = str(tmp_path / f"edges_{i}.parquet")
        pq.write_table(pa.Table.from_pandas(edges_df.iloc[i::5]), p)
        files.append(p)
    streaming = pagerank(
        ray.data.from_pandas(edges_df).repartition(4), ids, n_iter=12
    ).set_index("node_id")["rank"]
    pregel = pagerank_pregel(files, ids, n_iter=12, num_shards=3).set_index(
        "node_id"
    )["rank"]
    np.testing.assert_allclose(
        pregel.loc[ids].to_numpy(), streaming.loc[ids].to_numpy(), rtol=1e-12
    )


def test_triangle_count_matches_bruteforce(ray_session):
    import itertools
    import ray
    from kgraft.graph.triangles import count_triangles

    rng = np.random.default_rng(5)
    for trial, (n, p) in enumerate([(12, 0.5), (30, 0.2), (25, 0.08)]):
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
        mask = rng.random(len(pairs)) < p
        und = [e for e, m in zip(pairs, mask) if m]
        # feed as DIRECTED edges with dups + self loops to exercise canon
        rows = []
        for (u, v) in und:
            rows.append((u, v))
            if rng.random() < 0.3:
                rows.append((v, u))  # reverse duplicate
        rows += [(i, i) for i in range(0, n, 7)]  # self loops
        df = pd.DataFrame(rows, columns=["src", "dst"])

        # trial 2 forces the beyond-broadcast bucketed-join path
        got = count_triangles(
            ray.data.from_pandas(df),
            num_buckets=4,
            broadcast_max_nodes=0 if trial == 2 else 50_000_000,
        ).iloc[0]

        adj = {i: set() for i in range(n)}
        for u, v in und:
            adj[u].add(v)
            adj[v].add(u)
        tri = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )
        wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
        assert got["n_triangles"] == tri, (trial, got["n_triangles"], tri)
        assert got["n_edges"] == len(und)
        assert got["n_wedges"] == wedges
        if wedges:
            assert abs(got["global_clustering"] - round(3 * tri / wedges, 6)) < 1e-9


def test_core_numbers_match_bruteforce_peeling(ray_session):
    """BSP k-core vs a straight-line peeling oracle on random multigraphs
    with a planted 6-clique (which must surface as the 5-core)."""
    import ray

    from kgraft.graph.kcore import core_numbers

    def brute_core(pairs, nodes):
        adj = {u: set() for u in nodes}
        for a, b in pairs:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        core = {u: 0 for u in nodes}
        alive = set(nodes)
        k = 1
        while alive:
            changed = True
            while changed:
                changed = False
                for u in list(alive):
                    if u in alive and len(adj[u] & alive) < k:
                        core[u] = k - 1
                        alive.discard(u)
                        changed = True
            k += 1
        return core

    rng = np.random.RandomState(31)
    for trial in range(3):
        n = 40
        m = 120
        s = rng.randint(0, n, m)
        d = rng.randint(0, n, m)
        # planted 6-clique on nodes 100..105 (disjoint id range)
        cl = [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
        s = np.concatenate([s, [a for a, _ in cl], s[:10]])  # dup edges too
        d = np.concatenate([d, [b for _, b in cl], d[:10]])
        nodes = np.unique(np.concatenate([s, d]))
        edges = ray.data.from_pandas(
            pd.DataFrame({"subj_id": s.astype("int64"), "obj_id": d.astype("int64")})
        )
        got = core_numbers(edges, nodes)
        want = brute_core(list(zip(s.tolist(), d.tolist())), nodes.tolist())
        gmap = dict(zip(got["node_id"], got["coreness"]))
        assert gmap == want, trial
        assert all(gmap[100 + i] >= 5 for i in range(6))  # clique is 5-core


def test_label_propagation_communities_cliques(ray_session):
    """Two 5-cliques joined by one bridge edge resolve into two
    communities, and the distributed result equals the serial
    synchronous-LPA reference (same min tie-break)."""
    import itertools

    import ray

    from kgraft.graph.communities import label_propagation_communities

    ed = list(itertools.combinations(range(5), 2))
    ed += list(itertools.combinations(range(10, 15), 2))
    ed.append((4, 10))
    df = pd.DataFrame(
        {"src": [a for a, _ in ed], "dst": [b for _, b in ed]}
    )
    node_ids = np.array(list(range(5)) + list(range(10, 15)), dtype="int64")
    out = label_propagation_communities(
        ray.data.from_pandas(df).repartition(3), node_ids, n_iter=6
    )
    comm = dict(zip(out["node_id"], out["community"]))
    assert len({comm[i] for i in range(5)}) == 1
    assert len({comm[i] for i in range(10, 15)}) == 1
    assert comm[0] != comm[10]

    # serial reference: same synchronous rule, same tie-break
    ids = sorted(node_ids.tolist())
    lab = {i: i for i in ids}
    nbrs = {i: [] for i in ids}
    for a, b in ed:
        nbrs[a].append(b)
        nbrs[b].append(a)
    for _ in range(6):
        new = {}
        for i in ids:
            counts = {}
            for j in nbrs[i]:
                counts[lab[j]] = counts.get(lab[j], 0) + 1
            if counts:
                new[i] = min(counts, key=lambda l: (-counts[l], l))
            else:
                new[i] = lab[i]
        if new == lab:
            break
        lab = new
    assert comm == lab


def test_personalized_pagerank_matches_dense_oracle(ray_session):
    """PPR with a 3-seed teleport vector matches the dense power
    iteration; rank mass conserved; seedless far nodes score below
    seeds' neighborhoods."""
    import ray

    from kgraft.graph.pagerank import personalized_pagerank

    rng = np.random.RandomState(7)
    n, m = 50, 400
    ids = np.sort(rng.choice(np.arange(0, 9000), size=n, replace=False)).astype("int64")
    src = ids[rng.randint(0, n, m)]
    dst = ids[rng.randint(0, n, m)]
    seeds = ids[:3]
    edges_df = pd.DataFrame({"subj_id": src, "obj_id": dst})
    got = personalized_pagerank(
        ray.data.from_pandas(edges_df).repartition(5), ids, seeds,
        damping=0.85, n_iter=25,
    ).set_index("node_id")["rank"]

    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((n, n))
    for s, d in zip(src, dst):
        A[idx[s], idx[d]] += 1.0
    outdeg = A.sum(axis=1)
    p = np.zeros(n)
    p[[idx[s] for s in seeds]] = 1.0 / 3
    r = p.copy()
    for _ in range(25):
        w = np.where(outdeg > 0, r / np.where(outdeg > 0, outdeg, 1.0), 0.0)
        contrib = A.T @ w
        dangling = r[outdeg == 0].sum()
        r = 0.15 * p + 0.85 * (contrib + dangling * p)
    np.testing.assert_allclose(got.loc[ids].to_numpy(), r, rtol=1e-10, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9


def test_k_hop_reach_matches_bfs(ray_session):
    """k-hop reachability equals a serial BFS on a random sparse graph
    (undirected traversal, shortest hop recorded, cap respected)."""
    import collections

    import ray

    from kgraft.graph.khop import k_hop_reach

    rng = np.random.RandomState(13)
    n, m = 70, 180
    ids = np.sort(rng.choice(np.arange(0, 8000), size=n, replace=False)).astype("int64")
    src = ids[rng.randint(0, n, m)]
    dst = ids[rng.randint(0, n, m)]
    seeds = ids[:2]
    got = k_hop_reach(
        ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst})).repartition(5),
        ids, seeds, k=3,
    )
    gmap = dict(zip(got["node_id"], got["hop"]))

    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        adj[s].add(d)
        adj[d].add(s)
    want = {int(s): 0 for s in seeds}
    frontier = set(int(s) for s in seeds)
    for h in (1, 2, 3):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in want:
                    want[v] = h
                    nxt.add(v)
        frontier = nxt
    assert gmap == want


def test_adamic_adar_matches_bruteforce(ray_session):
    """Distributed Adamic-Adar top-k == serial brute force on a random
    graph (all degrees below the hub cap, so the result is exact)."""
    import itertools

    import ray

    from kgraft.graph.linkpred import adamic_adar_topk

    rng = np.random.RandomState(7)
    n_nodes, n_edges = 60, 300
    a = rng.randint(0, n_nodes, n_edges).astype("int64")
    b = rng.randint(0, n_nodes, n_edges).astype("int64")
    edges = pd.DataFrame({"src": a, "dst": b})

    got = adamic_adar_topk(
        ray.data.from_pandas(edges).repartition(5), k=15, num_buckets=8
    )
    assert got.attrs["n_skipped_hubs"] == 0

    # serial oracle
    adj = {}
    linked = set()
    for u, v in zip(a, b):
        if u == v:
            continue
        lo, hi = int(min(u, v)), int(max(u, v))
        linked.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    scores = {}
    for w, nbrs in adj.items():
        wgt = 1.0 / np.log(len(nbrs)) if len(nbrs) >= 2 else None
        for u, v in itertools.combinations(sorted(nbrs), 2):
            cn, aa = scores.get((u, v), (0, 0.0))
            scores[(u, v)] = (cn + 1, aa + wgt)
    rows = [
        (u, v, cn, aa)
        for (u, v), (cn, aa) in scores.items()
        if (u, v) not in linked
    ]
    want = (
        pd.DataFrame(rows, columns=["node_a", "node_b", "common_neighbors", "adamic_adar"])
        .sort_values(
            ["adamic_adar", "node_a", "node_b"], ascending=[False, True, True],
            ignore_index=True,
        )
        .head(15)
    )
    want["adamic_adar"] = want["adamic_adar"].round(6)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)


def test_adamic_adar_hub_cap_is_loud(ray_session):
    """A star graph's center exceeds the cap: result excludes its wedges
    and n_skipped_hubs reports it."""
    import ray

    from kgraft.graph.linkpred import adamic_adar_topk

    # star: node 0 connected to 1..30, plus a small triangle-free tail
    star = pd.DataFrame(
        {"src": np.zeros(30, dtype="int64"), "dst": np.arange(1, 31, dtype="int64")}
    )
    got = adamic_adar_topk(
        ray.data.from_pandas(star), k=10, max_center_degree=16, num_buckets=4
    )
    assert got.attrs["n_skipped_hubs"] == 1
    # leaves have degree 1 (< 2): no wedges at all once the hub is skipped
    assert len(got) == 0


def test_hits_matches_dense_oracle(ray_session):
    """Distributed HITS == dense numpy power iteration (same iteration
    count and normalization order) on a random directed multigraph."""
    import ray

    from kgraft.graph.hits import hits

    rng = np.random.RandomState(19)
    n_nodes, n_edges = 40, 250
    s = rng.randint(0, n_nodes, n_edges).astype("int64")
    d = rng.randint(0, n_nodes, n_edges).astype("int64")
    edges = ray.data.from_pandas(pd.DataFrame({"src": s, "dst": d})).repartition(5)

    got = hits(edges, np.arange(n_nodes, dtype="int64"), n_iter=15)

    A = np.zeros((n_nodes, n_nodes))
    np.add.at(A, (s, d), 1.0)  # multiplicity counts, like the operator
    a = np.full(n_nodes, 1.0 / np.sqrt(n_nodes))
    h = np.full(n_nodes, 1.0 / np.sqrt(n_nodes))
    for _ in range(15):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    np.testing.assert_allclose(got["authority"].to_numpy(), a, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got["hub"].to_numpy(), h, rtol=1e-9, atol=1e-12)


def test_neighbor_aggregate_matches_dense(ray_session):
    """Distributed neighbor mean/sum == dense adjacency-matrix oracle,
    all directions, 1 and 2 hops, with self-loop inclusion."""
    import ray

    from kgraft.graph.neighborhood import neighbor_aggregate

    rng = np.random.RandomState(13)
    n, m, d = 30, 150, 4
    s = rng.randint(0, n, m).astype("int64")
    t = rng.randint(0, n, m).astype("int64")
    F = rng.normal(size=(n, d))
    edges = ray.data.from_pandas(pd.DataFrame({"src": s, "dst": t})).repartition(4)
    ids = np.arange(n, dtype="int64")

    A = np.zeros((n, n))
    np.add.at(A, (s, t), 1.0)

    def dense(Adj, F0, agg, self_inc, hops):
        f = F0.copy()
        for _ in range(hops):
            acc = Adj @ f
            cnt = Adj.sum(axis=1)
            if self_inc:
                acc = acc + f
                cnt = cnt + 1
            f = acc / np.where(cnt == 0, 1, cnt)[:, None] if agg == "mean" else acc
        return f

    for direction, Adj in (("out", A), ("in", A.T), ("both", A + A.T)):
        got = neighbor_aggregate(
            edges, ids, F, agg="mean", direction=direction, src_col="src", dst_col="dst"
        )
        np.testing.assert_allclose(got, dense(Adj, F, "mean", False, 1), atol=1e-12)

    got2 = neighbor_aggregate(
        edges, ids, F, agg="sum", direction="out", n_hops=2,
        src_col="src", dst_col="dst",
    )
    np.testing.assert_allclose(got2, dense(A, F, "sum", False, 2), atol=1e-9)

    got3 = neighbor_aggregate(
        edges, ids, F, direction="both", include_self=True,
        src_col="src", dst_col="dst",
    )
    np.testing.assert_allclose(got3, dense(A + A.T, F, "mean", True, 1), atol=1e-12)


def test_pagerank_weighted_matches_dense(ray_session):
    """Edge-weighted PageRank == dense weighted power iteration; with
    all weights 1 it must equal the unweighted operator exactly."""
    import ray

    from kgraft.graph.pagerank import pagerank, pagerank_weighted

    rng = np.random.RandomState(29)
    n, m = 25, 120
    s = rng.randint(0, n, m).astype("int64")
    d = rng.randint(0, n, m).astype("int64")
    w = rng.uniform(0.1, 1.0, m)
    w[:5] = 0.0  # absent edges
    edges = ray.data.from_pandas(
        pd.DataFrame({"subj_id": s, "obj_id": d, "conf": w})
    ).repartition(4)
    ids = np.arange(n, dtype="int64")
    got = pagerank_weighted(edges, ids, "conf", n_iter=15)

    W = np.zeros((n, n))
    np.add.at(W, (s, d), w)
    wout = W.sum(axis=1)
    safe = np.where(wout > 0, wout, 1.0)
    r = np.full(n, 1.0 / n)
    for _ in range(15):
        agg = W.T @ (r / safe)
        dang = r[wout == 0].sum()
        r = 0.15 / n + 0.85 * (agg + dang / n)
    np.testing.assert_allclose(got["rank"].to_numpy(), r, atol=1e-12)

    ones = ray.data.from_pandas(
        pd.DataFrame({"subj_id": s, "obj_id": d, "conf": np.ones(m)})
    )
    plain = pagerank(
        ray.data.from_pandas(pd.DataFrame({"subj_id": s, "obj_id": d})), ids,
        n_iter=10,
    )
    wtd = pagerank_weighted(ones, ids, "conf", n_iter=10)
    np.testing.assert_allclose(
        wtd["rank"].to_numpy(), plain["rank"].to_numpy(), atol=1e-12
    )


def _serial_walks(pairs, starts, walk_length, walks_per_node, seed,
                  undirected=True):
    """Straight-line oracle for random_walks: same choice rule
    (splitmix64 stream over sorted-deduped neighbor runs), serial
    Python walk loop."""
    from kgraft.graph.walks import _walk_choice

    adj = {}
    all_pairs = list(pairs) + ([(b, a) for a, b in pairs] if undirected else [])
    for a, b in sorted(set(all_pairs)):
        adj.setdefault(a, []).append(b)
    starts = np.unique(np.asarray(starts, dtype=np.int64))
    rows = []
    for i, s in enumerate(starts):
        for j in range(walks_per_node):
            wid = i * walks_per_node + j
            cur = int(s)
            rows.append((wid, int(s), 0, cur))
            for pos in range(walk_length):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                r = _walk_choice(np.array([wid], dtype=np.int64), pos, seed)[0]
                cur = nbrs[int(r % np.uint64(len(nbrs)))]
                rows.append((wid, int(s), pos + 1, cur))
    return pd.DataFrame(rows, columns=["walk_id", "start", "pos", "node"]).astype(
        "int64"
    )


def test_random_walks_match_serial_oracle(ray_session):
    """Distributed walk corpus == serial same-choice-rule oracle, and
    is invariant to the bucket count (partitioning never leaks into the
    output)."""
    import ray

    from kgraft.graph.walks import random_walks

    rng = np.random.RandomState(11)
    pairs = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.randint(0, 30, 200), rng.randint(0, 30, 200))
            if a != b
        }
    )
    starts = np.arange(30, dtype=np.int64)
    want = _serial_walks(pairs, starts, walk_length=6, walks_per_node=2, seed=7)

    def run(num_buckets, method):
        got = random_walks(
            _edges_ds(ray, pairs).map_batches(
                lambda df: df.rename(columns={"src": "subj_id", "dst": "obj_id"}),
                batch_format="pandas",
            ),
            starts,
            walk_length=6,
            walks_per_node=2,
            seed=7,
            num_buckets=num_buckets,
            method=method,
        ).to_pandas()
        return got.sort_values(["walk_id", "pos"], ignore_index=True).astype("int64")

    want = want.sort_values(["walk_id", "pos"], ignore_index=True)
    a = run(4, "bucketed")
    pd.testing.assert_frame_equal(a, want)
    # bucket-count invariance + driver-tier equivalence (bit-identical)
    pd.testing.assert_frame_equal(a, run(9, "bucketed"))
    pd.testing.assert_frame_equal(run(3, "driver"), want)


def test_random_walks_edges_and_sinks(ray_session):
    """Every consecutive (node, next) pair is a real (undirected) edge;
    a sink-only directed node ends its walk at pos 0."""
    import ray

    from kgraft.graph.walks import random_walks

    pairs = [(1, 2), (2, 3), (3, 1), (9, 1)]  # 9 -> 1, nothing back to 9
    got = random_walks(
        _edges_ds(ray, pairs).map_batches(
            lambda df: df.rename(columns={"src": "subj_id", "dst": "obj_id"}),
            batch_format="pandas",
        ),
        np.array([1, 2, 3, 9, 50]),  # 50: isolated, not in any edge
        walk_length=5,
        walks_per_node=3,
        seed=1,
        undirected=False,
        num_buckets=3,
    ).to_pandas()
    eset = set(pairs)
    g = got.sort_values(["walk_id", "pos"])
    for _, w in g.groupby("walk_id"):
        nodes = w["node"].tolist()
        assert w["pos"].tolist() == list(range(len(nodes)))
        for a, b in zip(nodes, nodes[1:]):
            assert (a, b) in eset
    # directed: node 9 has out-edge (walks move), node 50 is isolated
    iso = g[g["start"] == 50]
    assert set(iso["pos"]) == {0} and set(iso["node"]) == {50}


def test_walk_skipgram_pairs_match_bruteforce(ray_session):
    """Vectorized shifted-pair sweep == brute-force window scan, across
    bucket counts."""
    import ray

    from kgraft.graph.walks import walk_skipgram_pairs

    rng = np.random.RandomState(3)
    rows = []
    for wid in range(40):
        L = rng.randint(1, 9)
        for pos, node in enumerate(rng.randint(0, 12, L)):
            rows.append((wid, -1, pos, int(node)))
    walks = pd.DataFrame(rows, columns=["walk_id", "start", "pos", "node"]).astype(
        "int64"
    )

    from collections import Counter

    want = Counter()
    for _, w in walks.groupby("walk_id"):
        nd = w.sort_values("pos")["node"].tolist()
        for i in range(len(nd)):
            for j in range(i + 1, min(i + 3, len(nd))):  # window=2
                want[(min(nd[i], nd[j]), max(nd[i], nd[j]))] += 1

    for nb in (3, 7):
        got = walk_skipgram_pairs(
            ray.data.from_pandas(walks), window=2, num_buckets=nb
        ).to_pandas()
        got_c = {(int(r.u), int(r.v)): int(r.n) for r in got.itertuples()}
        assert got_c == dict(want)


def _tarjan_scc(nodes, pairs):
    """Iterative Tarjan oracle -> {node: frozenset(scc_members)}."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]

    for root in nodes:
        if root in index:
            continue
        work = [(root, iter(adj.get(root, [])))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj.get(w, []))))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(frozenset(comp))
    return {n: s for s in sccs for n in s}


def test_scc_matches_tarjan(ray_session):
    """BSP trim+coloring SCC == serial Tarjan, labels = max id per SCC,
    on a known graph and on random directed graphs (incl. negative
    ids, self-loops, nested cycles)."""
    import ray

    from kgraft.graph.scc import strongly_connected_components

    def check(nodes, pairs):
        got = strongly_connected_components(
            _edges_ds(ray, pairs).map_batches(
                lambda df: df.rename(columns={"src": "subj_id", "dst": "obj_id"}),
                batch_format="pandas",
            ).materialize() if pairs else ray.data.from_pandas(
                pd.DataFrame({"subj_id": [], "obj_id": []}).astype("int64")
            ),
            np.asarray(nodes, dtype=np.int64),
        )
        want = _tarjan_scc(sorted(set(nodes)), pairs)
        lab = dict(zip(got["node_id"], got["scc_id"]))
        for n in set(nodes):
            assert lab[n] == max(want[n]), (n, lab[n], want[n])

    # hand case: 2-cycle, 3-cycle sharing a bridge, self-loop, chain,
    # negative ids
    check(
        [1, 2, 3, 4, 5, 6, 7, -9, -8, 50],
        [(1, 2), (2, 1), (3, 4), (4, 5), (5, 3), (2, 3), (6, 6), (6, 7),
         (-9, -8), (-8, -9), (7, -9)],
    )
    rng = np.random.RandomState(4)
    for trial in range(3):
        n = 40
        m = rng.randint(30, 140)
        pairs = list(
            {
                (int(a) - 20, int(b) - 20)
                for a, b in zip(rng.randint(0, n, m), rng.randint(0, n, m))
            }
        )
        check(list(range(-20, 20)), pairs)


def test_sgns_embeddings_separate_planted_communities(ray_session):
    """SGNS training over co-occurrence pairs: loss decreases and
    within-clique similarity beats cross-clique similarity on a planted
    two-clique graph — and the result is invariant to pair-table block
    layout (full-batch updates)."""
    import ray

    from kgraft.graph.embed_train import train_node_embeddings

    # two 8-cliques (0-7, 10-17) with heavy intra-clique co-occurrence
    # and one weak bridge pair
    rows = []
    for base in (0, 10):
        for a in range(8):
            for b in range(a + 1, 8):
                rows.append((base + a, base + b, 20))
    rows.append((7, 10, 1))
    pairs = pd.DataFrame(rows, columns=["u", "v", "n"]).astype("int64")
    ids = np.array(sorted(set(pairs.u) | set(pairs.v)), dtype=np.int64)

    model = train_node_embeddings(
        ray.data.from_pandas(pairs).repartition(4),
        ids,
        dim=16,
        n_iter=25,
        lr=0.1,
        negatives=5,
        seed=3,
    )
    assert model["losses"][-1] < model["losses"][0] * 0.8

    W = model["W"]
    idx = {int(v): i for i, v in enumerate(model["ids"])}
    Wn = W / np.linalg.norm(W, axis=1, keepdims=True)

    def mean_cos(ps):
        return float(
            np.mean([Wn[idx[a]] @ Wn[idx[b]] for a, b in ps])
        )

    intra = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    intra += [(10 + a, 10 + b) for a in range(8) for b in range(a + 1, 8)]
    cross = [(a, 10 + b) for a in range(8) for b in range(8) if (a, 10 + b) != (7, 10)]
    assert mean_cos(intra) > mean_cos(cross) + 0.2, (
        mean_cos(intra),
        mean_cos(cross),
    )


def test_degree_assortativity_matches_serial(ray_session):
    import ray
    from kgraft.graph.metrics import degree_assortativity

    rng = np.random.default_rng(11)
    for n, p in [(20, 0.3), (40, 0.1)]:
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
        mask = rng.random(len(pairs)) < p
        und = [e for e, m in zip(pairs, mask) if m]
        rows = list(und) + [(v, u) for (u, v) in und if rng.random() < 0.4]
        rows += [(i, i) for i in range(0, n, 5)]  # self loops dropped
        df = pd.DataFrame(rows, columns=["src", "dst"])

        got = degree_assortativity(ray.data.from_pandas(df), num_buckets=4).iloc[0]

        deg = {}
        for u, v in und:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        xs = np.array(
            [deg[u] for u, v in und] + [deg[v] for u, v in und], dtype=float
        )
        ys = np.array(
            [deg[v] for u, v in und] + [deg[u] for u, v in und], dtype=float
        )
        want = np.corrcoef(xs, ys)[0, 1]
        assert got["n_edges"] == len(und)
        assert got["n_nodes"] == len(deg)
        assert abs(got["assortativity"] - want) < 1e-9, (got["assortativity"], want)


def test_degree_assortativity_regular_graph_nan(ray_session):
    import ray
    from kgraft.graph.metrics import degree_assortativity

    # a cycle is degree-regular -> zero variance -> NaN by definition
    n = 10
    df = pd.DataFrame(
        [(i, (i + 1) % n) for i in range(n)], columns=["src", "dst"]
    )
    got = degree_assortativity(ray.data.from_pandas(df), num_buckets=2).iloc[0]
    assert np.isnan(got["assortativity"])


def test_modularity_matches_serial(ray_session):
    import ray
    from kgraft.graph.metrics import modularity

    rng = np.random.default_rng(13)
    # two planted cliques plus sparse noise edges between them
    blocks = [list(range(0, 8)), list(range(8, 15))]
    und = set()
    for b in blocks:
        for i in b:
            for j in b:
                if i < j:
                    und.add((i, j))
    for _ in range(4):
        u = int(rng.integers(0, 8))
        v = int(rng.integers(8, 15))
        und.add((u, v))
    und = sorted(und)
    rows = list(und) + [(v, u) for (u, v) in und[::3]]  # reverse dups
    df = pd.DataFrame(rows, columns=["src", "dst"])
    comm = pd.DataFrame(
        {
            "node_id": list(range(15)),
            "community": [0] * 8 + [1] * 7,
        }
    )
    got = modularity(ray.data.from_pandas(df), comm, num_buckets=4).iloc[0]

    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = len(und)
    lab = dict(zip(comm["node_id"], comm["community"]))
    q = 0.0
    for c in (0, 1):
        l_c = sum(1 for u, v in und if lab[u] == c and lab[v] == c)
        k_c = sum(d for nd, d in deg.items() if lab[nd] == c)
        q += l_c / m - (k_c / (2 * m)) ** 2
    assert got["n_edges"] == m
    assert got["n_communities"] == 2
    assert abs(got["modularity"] - q) < 1e-12
    assert got["modularity"] > 0.3  # planted structure is found


def test_modularity_unassigned_nodes_are_singletons(ray_session):
    import ray
    from kgraft.graph.metrics import modularity

    df = pd.DataFrame([(0, 1), (1, 2), (3, 4)], columns=["src", "dst"])
    # only nodes 0,1,2 assigned; 3,4 become singletons of their own id
    comm = pd.DataFrame({"node_id": [0, 1, 2], "community": [7, 7, 7]})
    got = modularity(ray.data.from_pandas(df), comm, num_buckets=2).iloc[0]
    # serial: communities {0,1,2}=7, {3}, {4}; m=3
    # L_7=2, K_7=4; L_3=0,K_3=1; L_4=0,K_4=1
    want = (2 / 3 - (4 / 6) ** 2) + 2 * (0 / 3 - (1 / 6) ** 2)
    assert got["n_communities"] == 3
    assert abs(got["modularity"] - want) < 1e-12


def test_sgns_driver_tier_matches_distributed(ray_session):
    import ray
    from kgraft.graph.embed_train import train_node_embeddings

    rng = np.random.default_rng(3)
    n_nodes = 12
    pairs = pd.DataFrame(
        {
            "u": rng.integers(0, n_nodes, 80),
            "v": rng.integers(0, n_nodes, 80),
            "n": rng.integers(1, 4, 80).astype("int64"),
        }
    )
    ids = np.arange(n_nodes)
    ds = ray.data.from_pandas(pairs)
    a = train_node_embeddings(ds, ids, dim=8, n_iter=6, seed=5)
    b = train_node_embeddings(
        ds, ids, dim=8, n_iter=6, seed=5, driver_tier_max_pairs=0
    )
    # same math either side of the tier split; float summation order is
    # the only permitted difference
    np.testing.assert_allclose(a["W"], b["W"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(a["C"], b["C"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(a["losses"], b["losses"], rtol=1e-9)


def _brandes_exact_py(und_edges, nodes):
    """Textbook serial Brandes (queue + stack) for the test oracle."""
    from collections import deque

    adj = {u: [] for u in nodes}
    for u, v in und_edges:
        adj[u].append(v)
        adj[v].append(u)
    bc = {u: 0.0 for u in nodes}
    for s in nodes:
        stack, preds = [], {u: [] for u in nodes}
        sigma = {u: 0.0 for u in nodes}
        dist = {u: -1 for u in nodes}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {u: 0.0 for u in nodes}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {u: b / 2.0 for u, b in bc.items()}  # undirected halving


def test_betweenness_all_sources_is_exact(ray_session):
    import ray
    from kgraft.graph.betweenness import approx_betweenness

    rng = np.random.default_rng(7)
    for n, p in [(14, 0.25), (25, 0.12)]:
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
        mask = rng.random(len(pairs)) < p
        und = [e for e, m in zip(pairs, mask) if m]
        rows = list(und) + [(v, u) for (u, v) in und[::2]] + [(3, 3)]
        df = pd.DataFrame(rows, columns=["src", "dst"])
        touched = sorted({x for e in und for x in e} | {3})

        got = approx_betweenness(
            ray.data.from_pandas(df), n_sources=10**9, num_buckets=4
        )
        want = _brandes_exact_py(und, touched)
        got_map = dict(zip(got["node_id"], got["betweenness"]))
        # node 3 only had a self loop -> dropped by canonicalization
        want = {u: b for u, b in want.items() if u in got_map}
        assert set(got_map) == set(want)
        for u in want:
            assert abs(got_map[u] - want[u]) < 1e-9, (u, got_map[u], want[u])


def test_betweenness_path_graph_known_values(ray_session):
    import ray
    from kgraft.graph.betweenness import approx_betweenness

    # path 0-1-2-3-4: interior node i sits on (i)(n-1-i) shortest paths
    df = pd.DataFrame([(i, i + 1) for i in range(4)], columns=["src", "dst"])
    got = approx_betweenness(ray.data.from_pandas(df), n_sources=10**9, num_buckets=2)
    want = {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}
    for _, r in got.iterrows():
        assert abs(r["betweenness"] - want[r["node_id"]]) < 1e-12


def test_betweenness_sampled_sources_reasonable(ray_session):
    import ray
    from kgraft.graph.betweenness import approx_betweenness

    # star graph: the hub carries ALL shortest paths; any source sample
    # must still rank the hub far above every leaf
    n = 30
    df = pd.DataFrame([(0, i) for i in range(1, n)], columns=["src", "dst"])
    got = approx_betweenness(ray.data.from_pandas(df), n_sources=8, num_buckets=2)
    hub = got.loc[got["node_id"] == 0, "betweenness"].iloc[0]
    leaf_max = got.loc[got["node_id"] != 0, "betweenness"].max()
    assert hub > 10 * max(leaf_max, 1e-9)


def _brute_truss(edge_list, k):
    E = {(min(u, v), max(u, v)) for u, v in edge_list if u != v}
    changed = True
    while changed:
        adj = {}
        for u, v in E:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        drop = {(u, v) for (u, v) in E if len(adj[u] & adj[v]) < k - 2}
        changed = bool(drop)
        E -= drop
    return E


def test_k_truss_matches_bruteforce(ray_session):
    import ray

    from kgraft.graph.truss import k_truss

    rng = np.random.RandomState(11)
    # planted 6-clique (ids 0-5) + sparse random noise + a chain
    edges = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    edges += [(100 + i, 100 + i + 1) for i in range(20)]
    m = rng.randint(0, 60, size=(120, 2))
    edges += [tuple(r) for r in m]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    # duplicates + reversed duplicates + self-loops must be tolerated
    df = pd.concat([df, df.rename(columns={"src": "dst", "dst": "src"}),
                    pd.DataFrame({"src": [3, 7], "dst": [3, 7]})])
    ds = ray.data.from_pandas(df.reset_index(drop=True)).repartition(6)
    for k in (3, 4, 5):
        got, info = k_truss(ds, k, num_buckets=4)
        got_set = {
            (int(r["lo"]), int(r["hi"])) for r in got.to_pandas().to_dict("records")
        }
        assert got_set == _brute_truss(edges, k), f"k={k}"
        assert info["n_edges_truss"] == len(got_set)


def test_k_truss_clique_is_its_own_truss(ray_session):
    import ray

    from kgraft.graph.truss import k_truss

    clique = [(i, j) for i in range(7) for j in range(i + 1, 7)]
    ds = ray.data.from_pandas(pd.DataFrame(clique, columns=["src", "dst"]))
    got, info = k_truss(ds, 7, num_buckets=2)
    assert got.count() == len(clique)
    got8, info8 = k_truss(ds, 8, num_buckets=2)
    assert got8.count() == 0


def test_densest_subgraph_finds_planted_clique(ray_session):
    import ray

    from kgraft.graph.densest import densest_subgraph

    rng = np.random.RandomState(23)
    # K20 planted (density 9.5) inside sparse noise over 400 nodes
    clique = [(i, j) for i in range(20) for j in range(i + 1, 20)]
    noise = [tuple(r) for r in rng.randint(0, 400, size=(300, 2)) if r[0] != r[1]]
    df = pd.DataFrame(clique + noise, columns=["src", "dst"])
    ds = ray.data.from_pandas(df).repartition(5)
    ids = np.arange(400)
    members, info = densest_subgraph(ds, ids, epsilon=0.05,
                                     src_col="src", dst_col="dst")
    # the published guarantee: density >= optimal / (2*(1+eps));
    # optimal >= K20's 9.5
    assert info["density"] >= 9.5 / (2 * 1.05)
    # the clique core must survive into the reported subgraph
    assert set(range(20)) <= set(members["node_id"])


def test_densest_subgraph_pure_clique_exact(ray_session):
    import ray

    from kgraft.graph.densest import densest_subgraph

    clique = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    ds = ray.data.from_pandas(pd.DataFrame(clique, columns=["src", "dst"]))
    members, info = densest_subgraph(ds, np.arange(8), src_col="src",
                                     dst_col="dst")
    assert info["n_nodes"] == 8 and info["n_edges"] == 28
    assert abs(info["density"] - 3.5) < 1e-12
    assert sorted(members["node_id"]) == list(range(8))


def _bfs_nf(edge_list, n):
    """Exact neighborhood function via per-node BFS."""
    adj = {i: set() for i in range(n)}
    for u, v in edge_list:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    counts = {}
    maxd = 0
    for s in range(n):
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        for node, dd in dist.items():
            counts.setdefault(dd, 0)
            counts[dd] += 1
            maxd = max(maxd, dd)
    nf = []
    run = 0
    for t in range(maxd + 1):
        run += counts.get(t, 0)
        nf.append(run)
    return nf


def test_anf_exact_bitset_matches_bfs(ray_session):
    import ray

    from kgraft.graph.anf import effective_diameter, neighborhood_function

    rng = np.random.RandomState(31)
    n = 120
    edges = [tuple(r) for r in rng.randint(0, n, size=(200, 2)) if r[0] != r[1]]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])
    ).repartition(5)
    nf, _ = neighborhood_function(
        ds, np.arange(n), src_col="src", dst_col="dst", mode="exact"
    )
    expect = _bfs_nf(edges, n)
    assert nf == [float(x) for x in expect]
    # effective diameter from the exact NF is within the true diameter
    ed = effective_diameter(nf)
    assert 0 <= ed <= len(expect) - 1


def test_anf_hll_tracks_exact_within_tolerance(ray_session):
    import ray

    from kgraft.graph.anf import neighborhood_function

    rng = np.random.RandomState(77)
    n = 300
    edges = [tuple(r) for r in rng.randint(0, n, size=(600, 2)) if r[0] != r[1]]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])
    ).repartition(5)
    exact, _ = neighborhood_function(
        ds, np.arange(n), src_col="src", dst_col="dst", mode="exact"
    )
    approx, _ = neighborhood_function(
        ds, np.arange(n), src_col="src", dst_col="dst", mode="hll"
    )
    # HLL(p=8) standard error ~6.5%; summed over nodes it concentrates
    t = min(len(exact), len(approx)) - 1
    assert abs(approx[t] - exact[t]) / exact[t] < 0.10


def test_luby_mis_independent_maximal_deterministic(ray_session):
    import ray

    from kgraft.graph.mis import maximal_independent_set

    rng = np.random.RandomState(41)
    n = 200
    edges = [tuple(r) for r in rng.randint(0, n, size=(500, 2)) if r[0] != r[1]]
    # include isolated nodes (ids 200-209) that must all join the MIS
    ids = np.arange(210)
    df = pd.DataFrame(edges, columns=["src", "dst"])
    out1 = maximal_independent_set(
        ray.data.from_pandas(df).repartition(6), ids, src_col="src", dst_col="dst"
    )
    mis = set(out1.loc[out1["in_mis"], "node_id"])
    adj = {i: set() for i in range(210)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    # independence: no edge inside the MIS
    assert all(not (u in mis and v in mis) for u, v in edges)
    # maximality: every outside node has a MIS neighbor
    for i in range(210):
        if i not in mis:
            assert adj[i] & mis, i
    # isolated nodes always join
    assert set(range(200, 210)) <= mis
    # deterministic across partitionings
    out2 = maximal_independent_set(
        ray.data.from_pandas(df).repartition(2), ids, src_col="src", dst_col="dst"
    )
    pd.testing.assert_frame_equal(out1, out2)


def test_local_clustering_matches_bruteforce(ray_session):
    import ray

    from kgraft.graph.kcore import simple_pairs
    from kgraft.graph.truss import local_clustering

    rng = np.random.RandomState(9)
    n = 60
    edges = [tuple(r) for r in rng.randint(0, n, size=(250, 2)) if r[0] != r[1]]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])
    ).repartition(5)
    pairs = simple_pairs(ds, src_col="src", dst_col="dst")

    def lohi(df):
        return pd.DataFrame(
            {"lo": df["lo"].astype("int64"), "hi": df["hi"].astype("int64")}
        )

    got = (
        local_clustering(pairs.map_batches(lohi, batch_format="pandas"),
                         num_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    adj = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    for _, row in got.iterrows():
        nb = adj[row["node"]]
        assert row["deg"] == len(nb)
        tri = sum(len(adj[a] & nb) for a in nb) // 2
        assert row["triangles"] == tri
        w = len(nb) * (len(nb) - 1) / 2
        expect = round(tri / w, 6) if w else 0.0
        assert abs(row["lcc"] - expect) < 1e-9
    assert set(got["node"]) == set(adj)


def test_geometric_centralities_exact_match_bfs(ray_session):
    import ray

    from kgraft.graph.anf import geometric_centralities

    rng = np.random.RandomState(13)
    n = 80
    edges = [tuple(r) for r in rng.randint(0, n, size=(140, 2)) if r[0] != r[1]]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])
    ).repartition(4)
    got = geometric_centralities(
        ds, np.arange(n), src_col="src", dst_col="dst", mode="exact"
    ).set_index("node_id")
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    for s in range(n):
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        harm = sum(1.0 / dd for nd, dd in dist.items() if dd > 0)
        tot = sum(dd for dd in dist.values())
        close = (len(dist) - 1) / tot if tot else 0.0
        assert abs(got.loc[s, "harmonic"] - round(harm, 6)) < 1e-6, s
        assert abs(got.loc[s, "closeness"] - round(close, 6)) < 1e-6, s


def test_ppr_sweep_cut_recovers_planted_community(ray_session):
    import ray

    from kgraft.graph.sweepcut import ppr_sweep_cut

    # two 8-cliques joined by ONE bridge edge, plus an unreachable ring
    a = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    b = [(10 + i, 10 + j) for i in range(8) for j in range(i + 1, 8)]
    bridge = [(0, 10)]
    ring = [(30 + i, 30 + (i + 1) % 10) for i in range(10)]
    df = pd.DataFrame(a + b + bridge + ring, columns=["src", "dst"])
    ds = ray.data.from_pandas(df).repartition(4)
    ids = np.arange(40)
    members, info = ppr_sweep_cut(ds, ids, seeds=[1], src_col="src",
                                  dst_col="dst")
    assert set(members["node_id"]) == set(range(8)), info
    # clique A: vol = 8*7 internal ends + 1 bridge end = 57, cut = 1
    assert info["cut"] == 1 and info["volume"] == 57
    assert abs(info["conductance"] - 1 / 57) < 1e-6
    # the unreachable ring never enters the sweep
    assert info["swept"] <= 16


def test_mis_fold_two_pass_on_priority_collision():
    """_fold_best_neighbor: with a priority collision split across
    shards in adversarial order, the folded (priority, id) pair must be
    the lexicographic max — the old interleaved single-pass fold kept a
    stale id from an earlier shard (r4 ADVICE low)."""
    import numpy as np

    from kgraft.graph.mis import _fold_best_neighbor

    # node 0: shard A reports (prio=5, id=10); shard B reports
    # (prio=7, id=3). Correct best pair is (7, 3) — NOT (7, 10).
    parts = [
        (np.array([0]), np.array([5], dtype=np.uint64), np.array([10])),
        (np.array([0]), np.array([7], dtype=np.uint64), np.array([3])),
    ]
    for order in (parts, parts[::-1]):
        bp, bi = _fold_best_neighbor(order, 1)
        assert bp[0] == 7 and bi[0] == 3, (order is parts, bp[0], bi[0])
    # tie at the final priority across shards: max id wins
    parts = [
        (np.array([0]), np.array([7], dtype=np.uint64), np.array([2])),
        (np.array([0]), np.array([7], dtype=np.uint64), np.array([9])),
        (np.array([0]), np.array([4], dtype=np.uint64), np.array([99])),
    ]
    bp, bi = _fold_best_neighbor(parts, 1)
    assert bp[0] == 7 and bi[0] == 9


def test_read_kg_edges_sees_full_fragmented_table(ray_session):
    """_read_kg_edges must read the checkpoint fragment dirs AND the
    recovery delta — the r5 kg_pagerank bug was a top-level-only glob
    that fed pregel just the delta file (~10% of edges). Lock the row
    count to the pipeline's own manifest-backed n_edges."""
    from kgraft.queries import _kg_outputs, _read_kg_edges

    m = _kg_outputs("/root/testdata/sf0.001")
    n = int(_read_kg_edges(m, ["subj_id"]).count())
    assert n == int(m["n_edges"]), (n, m["n_edges"])
    assert n > 1000  # the delta alone was ~133 rows at this scale
