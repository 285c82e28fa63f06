"""Similarity search: brute-force oracle + IVF recall."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from kgraft import embedops

from tests.conftest import SF_DIR


def _all_vectors():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist())
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


def test_knn_matches_numpy_oracle(ray_session):
    import ray

    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    ids, mat = _all_vectors()
    q = mat[ids.tolist().index(0)]
    got = embedops.knn_topk(emb, q, k=10).to_pandas()
    sims = (mat @ (q / np.linalg.norm(q))) / np.linalg.norm(mat, axis=1)
    order = np.lexsort((ids, -np.round(sims, 4)))[:10]
    assert got["vec_id"].tolist() == ids[order].tolist()


def test_ivf_recall_vs_bruteforce(ray_session):
    import ray

    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    ids, mat = _all_vectors()
    q = mat[ids.tolist().index(0)]
    exact = set(embedops.knn_topk(emb, q, k=10).to_pandas()["vec_id"])
    approx = set(
        embedops.ivf_topk(emb, q, k=10, n_cells=8, nprobe=4).to_pandas()["vec_id"]
    )
    assert len(exact & approx) / 10 >= 0.5  # nprobe=half the cells


def test_kmeans_deterministic():
    rng = np.random.RandomState(0)
    x = rng.randn(200, 8)
    a = embedops.kmeans_centroids(x, 4)
    b = embedops.kmeans_centroids(x, 4)
    np.testing.assert_array_equal(a, b)


def test_embed_near_dup_vs_bruteforce(ray_session):
    """LSH-bucketed cosine near-dup must match the O(n^2) oracle on a
    planted set: exact dups + tiny perturbations cluster, others don't."""
    import pandas as pd
    import ray

    rng = np.random.RandomState(3)
    base = rng.randn(20, 16)
    vecs = [base[i] for i in range(20)]
    vecs += [base[0] * 2.0, base[1] + 0.001 * rng.randn(16), base[2]]
    ids = list(range(len(vecs)))
    df = pd.DataFrame({"vec_id": ids, "embedding": [v.tolist() for v in vecs],
                       "label": [0] * len(ids)})
    ds = ray.data.from_pandas(df)
    got = embedops.embed_near_dup(ds, threshold=0.999).to_pandas()
    groups = dict(zip(got["vec_id"], got["dup_group"]))
    # brute-force oracle
    mat = np.stack([np.asarray(v) for v in vecs])
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = unit @ unit.T
    from kgraft.graph.components import _UnionFind

    uf = _UnionFind()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= 0.999:
                uf.union(i, j)
    want = {i: uf.find(i) for i in ids}
    assert groups == want
    assert groups[20] == groups[0] and groups[21] == groups[1]


def test_ivf_invariant_to_input_order(ray_session):
    """Centroid training must not depend on storage order: a permuted
    input must give the identical IVF result (r1 verdict #8)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    ids, mat = _all_vectors()
    q = mat[ids.tolist().index(0)]
    a = embedops.ivf_topk(
        ray.data.from_pandas(t), q, k=10, n_cells=8, nprobe=4
    ).to_pandas()
    rng = np.random.RandomState(9)
    perm = t.iloc[rng.permutation(len(t))].reset_index(drop=True)
    chunks = [perm.iloc[i : i + 173] for i in range(0, len(perm), 173)]
    b = embedops.ivf_topk(
        ray.data.from_pandas(chunks), q, k=10, n_cells=8, nprobe=4
    ).to_pandas()
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_kmeans_assign_matches_bruteforce(ray_session):
    import ray

    from kgraft import embedops

    rng = np.random.RandomState(41)
    n, d = 1200, 16
    mat = rng.normal(0, 1, (n, d))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"), "embedding": list(mat)})
    got = (
        embedops.kmeans_assign(ray.data.from_pandas(df), n_cells=8, sample_limit=512)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    # oracle: same deterministic sample + Lloyd, brute-force assignment
    from kgraft.hashing import splitmix64

    h = splitmix64(np.arange(n, dtype=np.uint64) ^ np.uint64(0xA5A5)).astype(np.int64)
    sample = mat[np.argsort(h)[:512]]
    # sample rows must arrive in hash order, as the operator's sort does
    cents = embedops.kmeans_centroids(sample, 8)
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = d2.argmin(axis=1)
    assert (got["cluster_id"].to_numpy() == want).all()
    np.testing.assert_allclose(
        got["dist"].to_numpy(),
        np.round(np.sqrt(d2[np.arange(n), want]), 6),
        atol=1e-6,
    )
    # invariant under block layout
    got2 = (
        embedops.kmeans_assign(
            ray.data.from_pandas(df).repartition(9), n_cells=8, sample_limit=512
        )
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, got2)


def test_pq_recall_vs_bruteforce(ray_session):
    import ray

    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    ids, mat = _all_vectors()
    q = mat[ids.tolist().index(0)]
    exact = set(embedops.knn_topk(emb, q, k=10).to_pandas()["vec_id"])
    approx = embedops.pq_topk(
        emb, q, k=10, n_subspaces=4, n_codes=16, rerank=8
    ).to_pandas()
    # shortlist-then-exact-rerank: emitted scores must BE exact cosine
    sims = (mat @ (q / np.linalg.norm(q))) / np.linalg.norm(mat, axis=1)
    by_id = dict(zip(ids, np.round(sims, 6)))
    for _, row in approx.iterrows():
        assert abs(row["score"] - by_id[row["vec_id"]]) < 1e-9
    assert len(exact & set(approx["vec_id"])) / 10 >= 0.7


def test_embed_near_dup_giant_cluster(ray_session):
    """>256 identical embeddings must form ONE dup group (star reduction
    over byte-identical vectors; the bucket cap used to drop them all)."""
    import ray

    from kgraft import embedops

    vec = np.arange(8, dtype="float64") + 1.0
    n = 300
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [vec.tolist()] * n,
        }
    )
    out = embedops.embed_near_dup(ray.data.from_pandas(df), threshold=0.95).to_pandas()
    assert out["dup_group"].nunique() == 1


def test_semdedup_vs_same_assignment_bruteforce(ray_session):
    """SemDeDup must equal the brute-force within-cluster oracle built
    from the SAME deterministic centroids/assignment: two separated
    blobs with planted near-dups inside each; cross-blob near-dups (by
    construction none here) are out of scope per the algorithm."""
    import ray

    from kgraft import embedops
    from kgraft.graph.components import _UnionFind

    rng = np.random.RandomState(5)
    blob_a = rng.randn(12, 16) + 40.0
    blob_b = rng.randn(12, 16) - 40.0
    vecs = list(blob_a) + list(blob_b)
    vecs += [blob_a[0] * 1.01, blob_a[1] + 1e-4 * rng.randn(16), blob_b[2].copy()]
    ids = np.arange(len(vecs), dtype="int64")
    df = pd.DataFrame(
        {"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
    )
    ds = ray.data.from_pandas(df).repartition(3)
    got = embedops.semdedup(ds, n_cells=2, threshold=0.999).to_pandas()
    groups = dict(zip(got["vec_id"], got["dup_group"]))

    # oracle: identical centroids -> identical assignment -> brute force
    sample = embedops._hash_sample_matrix(ds, 4096)
    cents = embedops.kmeans_centroids(sample, 2, seed=7)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    cell = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = unit @ unit.T
    uf = _UnionFind()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cell[i] == cell[j] and sims[i, j] >= 0.999:
                uf.union(i, j)
    want = {i: uf.find(i) for i in range(len(ids))}
    assert groups == want
    assert groups[24] == groups[0] and groups[25] == groups[1]
    assert groups[26] == groups[14]


def test_semdedup_giant_identical_cluster(ray_session):
    """A >MAX-style pile of identical vectors star-reduces to one group
    inside its k-means cell (no silent in-bucket cap)."""
    import ray

    from kgraft import embedops

    vec = np.arange(8, dtype="float64") + 2.0
    n = 300
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [vec.tolist()] * n,
        }
    )
    out = embedops.semdedup(
        ray.data.from_pandas(df), n_cells=2, threshold=0.95
    ).to_pandas()
    assert out["dup_group"].nunique() == 1


def test_knn_topk_multi_vs_bruteforce(ray_session):
    """Batched multi-query cosine top-k equals the numpy brute force
    under the same (rounded score desc, vec_id asc) ordering."""
    import ray

    from kgraft import embedops

    rng = np.random.RandomState(11)
    mat = rng.randn(40, 8)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(40, dtype="int64"),
            "embedding": [v.tolist() for v in mat],
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    got = (
        embedops.knn_topk_multi(ds, [0, 3, 7], k=5)
        .to_pandas()
        .sort_values(["query_id", "score", "vec_id"],
                     ascending=[True, False, True], ignore_index=True)
    )
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    rows = []
    for q in (0, 3, 7):
        s = np.round(unit @ unit[q], 4)
        order = np.lexsort((np.arange(40), -s))[:5]
        for i in order:
            rows.append((q, int(i), s[i]))
    want = pd.DataFrame(rows, columns=["query_id", "vec_id", "score"])
    pd.testing.assert_frame_equal(
        got.astype({"vec_id": "int64"}), want.astype({"vec_id": "int64"})
    )


def test_mmr_rerank_matches_serial(ray_session):
    """Distributed-shortlist MMR == serial greedy on the same corpus
    (shortlist covers the whole corpus, so selection is exact)."""
    import ray

    from kgraft.embedops import mmr_rerank

    rng = np.random.RandomState(31)
    n, d = 120, 16
    mat = rng.normal(size=(n, d))
    q = rng.normal(size=d)
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": [v.tolist() for v in mat]}
    )
    lam = 0.6
    got = mmr_rerank(
        ray.data.from_pandas(df).repartition(6), q, k=10, shortlist=n, lam=lam
    )

    # serial reference
    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return a @ b / (na * nb) if na and nb else 0.0

    rel = np.array([cos(v, q) for v in mat])
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sel, avail = [], set(range(n))
    rows = []
    for rank in range(10):
        best, best_score = None, None
        for i in sorted(avail):
            div = max((unit[i] @ unit[j] for j in sel), default=0.0)
            s = lam * rel[i] - (1 - lam) * div
            if best is None or s > best_score + 1e-15:
                best, best_score = i, s
        rows.append((rank + 1, best, round(rel[best], 6), round(best_score, 6)))
        sel.append(best)
        avail.remove(best)
    want = pd.DataFrame(rows, columns=["rank", "vec_id", "relevance", "mmr_score"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # planted twins: the duplicate of the top hit must NOT come second
    twin = pd.DataFrame(
        {
            "vec_id": np.arange(4, dtype="int64"),
            "embedding": [
                q.tolist(), q.tolist(),           # identical, maximal relevance
                (-q).tolist(), np.roll(q, 1).tolist(),
            ],
        }
    )
    # lam < 0.5 so the diversity term outweighs the twin's relevance
    got2 = mmr_rerank(ray.data.from_pandas(twin), q, k=3, shortlist=4, lam=0.3)
    assert got2.loc[0, "vec_id"] == 0
    assert got2.loc[1, "vec_id"] != 1  # diversity suppresses the twin


def test_pca_matches_numpy(ray_session):
    """Streaming-moment PCA == direct numpy eigendecomposition (same
    sign convention), and the transform reproduces centered projections."""
    import ray

    from kgraft.embedops import pca_fit, pca_transform

    rng = np.random.RandomState(17)
    n, d = 500, 12
    # anisotropic cloud so the spectrum is distinct
    mat = rng.normal(size=(n, d)) * np.linspace(5, 0.5, d)
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": [v.tolist() for v in mat]}
    )
    ds = ray.data.from_pandas(df).repartition(7)
    model = pca_fit(ds, n_components=4)

    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    comps = v[:, order].T
    flip = np.sign(comps[np.arange(4), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]

    np.testing.assert_allclose(model["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(model["explained_var"], w[order], rtol=1e-9)
    np.testing.assert_allclose(model["components"], comps, atol=1e-8)

    out = (
        pca_transform(ds, model)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    got = np.stack([np.asarray(r) for r in out["pca"]])
    np.testing.assert_allclose(got, (mat - mean) @ comps.T, atol=1e-8)


def test_hard_negatives_matches_bruteforce(ray_session):
    """Cluster-local hard negatives == brute force restricted to the
    SAME deterministic cell assignment; each mined negative has a
    different label and is its cell's most similar such vector."""
    import ray

    from kgraft import embedops

    rng = np.random.RandomState(37)
    blob_a = rng.randn(15, 8) + 30.0
    blob_b = rng.randn(15, 8) - 30.0
    vecs = np.vstack([blob_a, blob_b])
    labels = np.array((["x"] * 8 + ["y"] * 7) * 2, dtype=object)
    ids = np.arange(30, dtype="int64")
    df = pd.DataFrame(
        {"vec_id": ids, "embedding": [v.tolist() for v in vecs], "label": labels}
    )
    ds = ray.data.from_pandas(df).repartition(4)
    got = (
        embedops.hard_negatives(ds, n_cells=2)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )

    # oracle: same deterministic centroids/assignment
    sample = embedops._hash_sample_matrix(ds, 4096)
    cents = embedops.kmeans_centroids(sample, 2)
    d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cell = d2.argmin(axis=1)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = unit @ unit.T
    want = {}
    for i in range(30):
        cand = [
            j for j in range(30)
            if cell[j] == cell[i] and labels[j] != labels[i]
        ]
        if cand:
            # ties -> lowest vec_id (stable argmax over id-sorted order)
            best = max(cand, key=lambda j: (round(sims[i, j], 12), -j))
            want[i] = best
    assert len(got) == len(want)
    for _, row in got.iterrows():
        i = row["vec_id"]
        assert labels[row["neg_id"]] != labels[i]
        assert cell[row["neg_id"]] == cell[i]
        np.testing.assert_allclose(
            row["cos_sim"], round(sims[i, want[i]], 6), atol=1e-6
        )


def test_cluster_quality_matches_serial(ray_session):
    import numpy as np
    import pandas as pd
    import ray
    from kgraft.embedops import cluster_quality

    rng = np.random.default_rng(17)
    # three well-separated blobs + fixed centroids so the serial oracle
    # shares the exact assignment
    blobs = [
        rng.normal([0, 0, 0], 0.2, (30, 3)),
        rng.normal([5, 5, 0], 0.2, (20, 3)),
        rng.normal([0, 5, 5], 0.2, (10, 3)),
    ]
    X = np.concatenate(blobs)
    cents = np.array([[0.1, 0, 0], [5, 5, 0.1], [0, 5, 5], [99, 99, 99]])
    df = pd.DataFrame(
        {"vec_id": np.arange(len(X), dtype=np.int64), "embedding": list(X)}
    )
    per, db = cluster_quality(
        ray.data.from_pandas(df).repartition(4), centroids=cents
    )

    d = np.linalg.norm(X[:, None, :] - cents[None, :, :], axis=2)
    a = d.argmin(axis=1)
    best = d[np.arange(len(a)), a]
    want_s = []
    for c in range(4):
        m = a == c
        assert per.loc[c, "n_vecs"] == m.sum()
        if m.any():
            assert abs(per.loc[c, "inertia"] - (best[m] ** 2).sum()) < 1e-8
            want_s.append(best[m].mean())
            assert abs(per.loc[c, "scatter"] - best[m].mean()) < 1e-10
        else:
            assert per.loc[c, "scatter"] == 0.0
    # serial Davies-Bouldin over the 3 live clusters
    live = [c for c in range(4) if (a == c).any()]
    cd = np.linalg.norm(cents[live][:, None] - cents[live][None, :], axis=2)
    r = np.zeros((len(live), len(live)))
    for i in range(len(live)):
        for j in range(len(live)):
            if i != j:
                r[i, j] = (want_s[i] + want_s[j]) / cd[i, j]
    want_db = r.max(axis=1).mean()
    assert abs(db - want_db) < 1e-10
    assert db < 0.2  # well-separated blobs score near zero


def test_cluster_quality_single_live_cluster_nan(ray_session):
    import numpy as np
    import pandas as pd
    import ray
    from kgraft.embedops import cluster_quality

    X = np.zeros((5, 2)) + 1.0
    df = pd.DataFrame(
        {"vec_id": np.arange(5, dtype=np.int64), "embedding": list(X)}
    )
    per, db = cluster_quality(
        ray.data.from_pandas(df), centroids=np.array([[1.0, 1.0], [50.0, 50.0]])
    )
    assert per["n_vecs"].tolist() == [5, 0]
    assert np.isnan(db)
