"""Similarity search: brute-force oracle + IVF recall."""

import numpy as np
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
