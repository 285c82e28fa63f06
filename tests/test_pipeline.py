"""End-to-end flagship pipeline: golden P/R, schemas, resume semantics."""

import glob
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq

from kgraft.pipeline import PipelineConfig, run_kg_pipeline
from kgraft.synth import norm_surface

from tests.conftest import N_PAGES


def _triple_set(df, with_ids=False):
    if with_ids:
        return set(
            zip(df["url"], df["seg_idx"], df["subj_id"], df["pred"], df["obj_id"])
        )
    return set(
        zip(
            df["url"],
            df["seg_idx"],
            df["subj"].map(norm_surface),
            df["pred"],
            df["obj"].map(norm_surface),
        )
    )


def _read_triples(paths):
    return pd.concat([pq.read_table(p).to_pandas() for p in paths], ignore_index=True)


def test_triple_precision_recall(kg_run, corpus):
    golden = pq.read_table(os.path.join(corpus, "golden_triples.parquet")).to_pandas()
    mine = _read_triples(kg_run["triples_paths"])
    g, m = _triple_set(golden), _triple_set(mine)
    precision = len(g & m) / max(len(m), 1)
    recall = len(g & m) / max(len(g), 1)
    assert precision >= 0.95, f"precision {precision:.3f}"
    assert recall >= 0.95, f"recall {recall:.3f}"


def test_linked_id_precision_recall(kg_run, corpus):
    """Entity linking quality: (url, seg, subj_id, pred, obj_id) vs golden —
    exercises the exact tier AND the LSH holdout recovery."""
    golden = pq.read_table(os.path.join(corpus, "golden_triples.parquet")).to_pandas()
    edges = pd.concat(
        [
            pq.read_table(p).to_pandas()
            for p in glob.glob(
                os.path.join(kg_run["edges_dir"], "**", "*.parquet"),
                recursive=True,
            )
        ],
        ignore_index=True,
    )
    # edges lack seg_idx; compare on (url, subj_id, pred, obj_id)
    g = set(zip(golden["url"], golden["subj_id"], golden["pred"], golden["obj_id"]))
    m = set(zip(edges["url"], edges["subj_id"], edges["pred"], edges["obj_id"]))
    precision = len(g & m) / max(len(m), 1)
    recall = len(g & m) / max(len(g), 1)
    assert precision >= 0.95, f"id precision {precision:.3f}"
    assert recall >= 0.95, f"id recall {recall:.3f}"


def test_components_match_golden(kg_run, corpus):
    golden = pq.read_table(
        os.path.join(corpus, "golden_components.parquet")
    ).to_pandas()
    comp = kg_run["components"]
    got = dict(zip(comp["entity_id"], comp["component_id"]))
    want = dict(zip(golden["entity_id"], golden["component_id"]))
    # linked graph may miss entities whose every mention was unlinkable;
    # require agreement on the shared node set and >=95% coverage
    shared = set(got) & set(want)
    assert len(shared) / len(want) >= 0.95
    assert all(got[k] == want[k] for k in shared)


def test_output_schemas(kg_run):
    from kgraft.schema import EDGES, NODES

    nodes = pq.read_table(glob.glob(os.path.join(kg_run["nodes_dir"], "*.parquet"))[0])
    edges = pq.read_table(glob.glob(os.path.join(kg_run["edges_dir"], "*.parquet"))[0])
    assert set(NODES.names) <= set(nodes.schema.names)
    assert set(EDGES.names) <= set(edges.schema.names)
    for name in EDGES.names:
        assert edges.schema.field(name).type == EDGES.field(name).type


def test_resume_equals_single_run(ray_session, corpus, kg_run, tmp_path):
    """Kill 1/4 of the checkpointed partitions; re-run; triples must equal
    the uninterrupted run's (per-partition files are sorted -> comparable)."""
    out = str(tmp_path / "resume")
    cfg = PipelineConfig()
    pages = os.path.join(corpus, "pages.parquet")
    aliases = os.path.join(corpus, "alias_dict.parquet")
    run_kg_pipeline(pages, aliases, out, cfg, run_id="first")
    # simulate a crash that lost some partitions (manifest = commit point;
    # fragment dirs may be partially present — strays must be pruned)
    import shutil

    for pid in range(0, cfg.n_partitions, 4):
        mp = os.path.join(out, "_manifest", f"part-{pid:05d}.json")
        if os.path.exists(mp):
            os.remove(mp)
        pdir = os.path.join(out, "triples", f"part-{pid:05d}")
        if os.path.isdir(pdir):
            frags = sorted(os.listdir(pdir))
            # leave one stray fragment behind to prove unlisted files are
            # ignored and cleaned on the next commit
            for f in frags[1:]:
                os.remove(os.path.join(pdir, f))
        for kind in ("comps", "canon", "pending"):
            ddir = os.path.join(out, "_derived", f"{kind}-part-{pid:05d}")
            if os.path.isdir(ddir):
                shutil.rmtree(ddir)
    res = run_kg_pipeline(pages, aliases, out, cfg, run_id="second")
    assert res["partitions_skipped"] == cfg.n_partitions - len(
        range(0, cfg.n_partitions, 4)
    )
    base = _read_triples(kg_run["triples_paths"])
    resumed = _read_triples(res["triples_paths"])
    cols = ["url", "seg_idx", "subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        base[cols].sort_values(cols).reset_index(drop=True),
        resumed[cols].sort_values(cols).reset_index(drop=True),
    )


def test_rerun_does_not_duplicate_graph_outputs(ray_session, corpus, kg_run):
    """Regression: write_parquet appends — a re-run over a completed out_dir
    must clear nodes/edges first, not double them."""
    out = kg_run["out_dir"]
    res2 = run_kg_pipeline(
        os.path.join(corpus, "pages.parquet"),
        os.path.join(corpus, "alias_dict.parquet"),
        out,
        PipelineConfig(),
        run_id="rerun",
    )
    assert res2["n_edges"] == kg_run["n_edges"]
    assert res2["n_nodes"] == kg_run["n_nodes"]


def test_manifest_lineage(kg_run):
    import json

    mdir = os.path.join(kg_run["out_dir"], "_manifest")
    files = sorted(os.listdir(mdir))
    assert files, "no manifests written"
    with open(os.path.join(mdir, files[0])) as f:
        m = json.load(f)
    for key in ("partition_id", "input_refs", "row_counts", "content_hash"):
        assert key in m
    assert m["row_counts"]["triples"] >= 0


def test_permutation_invariance(ray_session, corpus, kg_run, tmp_path):
    """Shuffling the input pages (different row order + different block
    layout) must produce the identical triple set — no partition-order or
    dict-order dependence anywhere in the DAG."""
    import pyarrow as pa

    pages = pq.read_table(os.path.join(corpus, "pages.parquet"))
    rng = __import__("numpy").random.RandomState(9)
    perm = rng.permutation(len(pages))
    shuffled_path = str(tmp_path / "pages_shuffled.parquet")
    pq.write_table(pages.take(pa.array(perm)), shuffled_path, row_group_size=97)
    out = str(tmp_path / "perm_out")
    res = run_kg_pipeline(
        shuffled_path, os.path.join(corpus, "alias_dict.parquet"), out,
        PipelineConfig(), run_id="perm",
    )
    base = _read_triples(kg_run["triples_paths"])
    mine = _read_triples(res["triples_paths"])
    cols = ["url", "seg_idx", "subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        base[cols].sort_values(cols).reset_index(drop=True),
        mine[cols].sort_values(cols).reset_index(drop=True),
    )
    assert res["n_edges"] == kg_run["n_edges"]
    assert res["n_nodes"] == kg_run["n_nodes"]


def test_transient_task_failure_is_retried(ray_session, tmp_path):
    """Ray task retry is the engine's transient-fault story (SURVEY.md §4
    retries row): a stage whose task dies ONCE (file-marker keyed, so
    the retry takes a different path) must not kill the job, and the
    retried output must be complete and correct."""
    import ray

    marker = str(tmp_path / "boom_once")

    def flaky(df):
        import os

        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            os._exit(1)  # hard worker death, not a Python exception
        df = df.copy()
        df["y"] = df["x"] * 2
        return df

    import pandas as pd

    import numpy as np

    ds = ray.data.from_pandas(pd.DataFrame({"x": range(1000)})).repartition(8)
    out = ds.map_batches(flaky, batch_format="pandas").to_pandas()
    assert len(out) == 1000
    assert (out.sort_values("x")["y"].to_numpy() == np.arange(1000) * 2).all()


def test_page_domain_stats_matches_pandas(ray_session):
    """page_domain_stats vs a straight-line pandas rollup over the same
    pages parquet (host extraction + count/sum/mean semantics)."""
    import glob
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from kgraft.queries import _pages_for, page_domain_stats
    from kgraft.synth import corpus_dir, sharded_pages

    sf = "/root/testdata/sf0.001"
    got = page_domain_stats(sf)

    d = corpus_dir(_pages_for(sf))
    files = sharded_pages(d)
    if isinstance(files, str):
        files = sorted(glob.glob(f"{files}/*.parquet")) or [files]
    df = pd.concat(
        [pq.read_table(f, columns=["url", "text", "lang"]).to_pandas() for f in files]
    )
    df["host"] = df["url"].str.extract(r"^https?://([^/]+)", expand=False)
    want = (
        df.groupby("host")
        .agg(
            n_pages=("url", "size"),
            total_chars=("text", lambda s: s.str.len().sum()),
            en_share=("lang", lambda s: (s == "en").mean()),
        )
        .reset_index()
        .sort_values("host")
        .reset_index(drop=True)
    )
    assert got["host"].tolist() == want["host"].tolist()
    assert got["n_pages"].tolist() == want["n_pages"].tolist()
    assert got["total_chars"].tolist() == want["total_chars"].tolist()
    import numpy as np

    np.testing.assert_allclose(
        got["en_share"].to_numpy(), want["en_share"].round(6).to_numpy(), atol=1e-9
    )


def test_fragment_writer_empty_pending_keeps_schema(ray_session, tmp_path):
    """A task whose block fully resolves writes an EMPTY pending slice;
    its fragment must carry the same typed schema as pending-bearing
    fragments (null-typed columns broke the graph concat and the resumed
    derived scan — review r2). Also: the resume-config guard refuses a
    changed partitioning."""
    import numpy as np
    import pyarrow.dataset as pads
    import pytest
    import ray

    from kgraft.errors import ConfigError
    from kgraft.manifest import ManifestStore

    store = ManifestStore(str(tmp_path))
    lut = ray.put({"alpha corp": 1, "beta inc": 2})
    writer = store.make_fragment_writer("run1", alias_ref=lut)

    def block(subj, obj, pid):
        return pd.DataFrame(
            {
                "url": ["https://a/1"],
                "warc_ts": pd.to_datetime(["2020-01-01"]),
                "seg_idx": np.array([0], dtype="int32"),
                "subj": [subj],
                "pred": ["owns"],
                "obj": [obj],
                "conf": np.array([0.9], dtype="float32"),
                "part_id": [pid],
            }
        )

    writer(block("Alpha Corp", "Beta Inc", 0))      # fully resolved -> empty pending
    writer(block("Alpha Corp", "Gamma LLC", 1))     # one unresolved endpoint

    pend_dir = os.path.join(store.derived_dir, "pending")
    frags = sorted(glob.glob(os.path.join(pend_dir, "*.parquet")))
    assert len(frags) == 2
    # unified multi-file scan must not raise schema mismatch, and string
    # columns must be typed string even in the empty fragment
    t = pads.dataset(frags).to_table()
    assert t.num_rows == 1
    for f in frags:
        s = pq.read_schema(f)
        assert str(s.field("subj").type) in ("string", "large_string"), f

    # resume-config guard
    store.check_run_config({"n_partitions": 16, "lang_filter": None})
    store.check_run_config({"n_partitions": 16, "lang_filter": None})  # same: ok
    with pytest.raises(ConfigError):
        store.check_run_config({"n_partitions": 32, "lang_filter": None})


def test_run_config_guard_refuses_legacy_checkpoint(tmp_path):
    """Manifests without a recorded run_config.json (pre-guard
    checkpoint) must REFUSE the resume instead of silently adopting the
    current run's config as the baseline (ADVICE r3)."""
    import pytest

    from kgraft.errors import ConfigError
    from kgraft.manifest import ManifestStore

    store = ManifestStore(str(tmp_path / "out"))
    # fake a legacy checkpoint: a partition manifest, no run_config.json
    with open(os.path.join(store.manifest_dir, "part-00000.json"), "w") as f:
        f.write("{}")
    with pytest.raises(ConfigError, match="predates"):
        store.check_run_config({"n_partitions": 16, "lang_filter": None})
    # a truly fresh out_dir still records the config normally
    fresh = ManifestStore(str(tmp_path / "fresh"))
    fresh.check_run_config({"n_partitions": 16, "lang_filter": None})


def test_merge_snapshots_equals_full_run(ray_session, tmp_path):
    """Incremental ingestion: KG merged from two half-corpus snapshots
    is BIT-IDENTICAL (nodes + edges) to the single full-corpus run —
    extraction is reused from the checkpoints, link/canonicalize/
    components re-derive over the union."""
    import glob

    import pyarrow.parquet as pq

    from kgraft.pipeline import (
        PipelineConfig,
        merge_kg_snapshots,
        run_kg_pipeline,
    )
    from kgraft.synth import corpus_dir, sharded_pages

    d = corpus_dir(200)
    files = sorted(glob.glob(os.path.join(sharded_pages(d), "*.parquet")))
    alias = os.path.join(d, "alias_dict.parquet")
    cfg = PipelineConfig()
    full = run_kg_pipeline(files, alias, str(tmp_path / "full"), cfg)
    half = len(files) // 2
    run_kg_pipeline(files[:half], alias, str(tmp_path / "a"), cfg)
    run_kg_pipeline(files[half:], alias, str(tmp_path / "b"), cfg)
    merged = merge_kg_snapshots(
        [str(tmp_path / "a"), str(tmp_path / "b")],
        alias,
        str(tmp_path / "merged"),
        cfg,
    )
    assert merged["n_nodes"] == full["n_nodes"]
    assert merged["n_edges"] == full["n_edges"]

    def tbl(o, what):
        t = pq.read_table(os.path.join(o, what)).to_pandas()
        for c in t.columns:
            if t[c].dtype == object:
                t[c] = t[c].map(
                    lambda x: tuple(x)
                    if hasattr(x, "__iter__") and not isinstance(x, str)
                    else x
                )
        return t.sort_values(list(t.columns), ignore_index=True)

    for what in ("nodes", "edges"):
        a = tbl(str(tmp_path / "full"), what)
        b = tbl(str(tmp_path / "merged"), what)
        pd.testing.assert_frame_equal(a, b)
