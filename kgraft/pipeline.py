"""The flagship KG-construction DAG (SURVEY.md §2.2, stages 1-11).

    read_parquet(pages, columns pruned)            # stage 1
      -> filter completed partitions (manifest)    # stage 11 resume
      -> map_batches(html_to_text)                 # stage 2 (drops html)
      -> map_batches(segment)                      # stage 3
      -> map_batches(TripleExtractor, actor pool)  # stages 4-5
      -> groupby(part_id).map_groups(checkpoint)   # stage 11 write
    read_parquet(checkpointed triples)
      -> link_triples (broadcast + MinHash-LSH)    # stages 6-7
      -> canonicalize (pre-aggregated groupby)     # stage 8
      -> connected_components (union-find)         # stage 9
      -> write nodes/edges parquet                 # stage 10

The whole per-page prefix streams: html bytes are dropped at stage 2,
no full materialization happens before the partition checkpoint, and the
checkpoint groupby is the single wide exchange of the prefix (key =
``part_id``, uniform by construction since it's a hash of url).

Equivalent of the reference's entry point 1 (``modules/PubMedFlow.py:
232-252`` — the serial per-section loop) as a streaming Dataset DAG.
No function here calls ``ray.init``.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .extract.segment import html_to_text_batch, segment_batch
from .graph.canonical import canonicalize
from .graph.components import connected_components
from .link.candidates import link_triples
from .manifest import ManifestStore, partition_ids
from .models.triples import TripleExtractor


@dataclass(frozen=True)
class PipelineConfig:
    n_partitions: int = 16
    read_blocks: int | None = None  # override_num_blocks for the pages read;
    # None -> 2 tasks per cluster CPU (parallel even for one parquet file)
    extract_batch_size: int = 256
    extractor_concurrency: tuple = (1, 4)  # autoscaling pool — a fixed pool
    # can starve the downstream checkpoint shuffle of CPUs on small hosts
    extractor_kind: str = "task"  # "task": plain map_batches tasks on warm
    # workers — right for the cheap deterministic backend (an actor pool
    # pays a cold process start per actor, which dwarfs the regex work).
    # "actor": the pool the north rule prescribes for real LLM/NER
    # backends, where per-worker model load must happen once.
    link_threshold: float = 0.50
    components_method: str = "unionfind"
    lang_filter: str | None = None  # e.g. "en" to drop non-English pages
    max_errored_blocks: int = 0  # blocks allowed to fail without killing
    # the run (Ray DataContext.max_errored_blocks) — the engine-level twin
    # of the reference's declared-but-unenforced MAX_RETRY
    # (settings/_DefaultConfig.py:22-24); per-request LLM retries live on
    # the extractor (models/llm.py max_retries)


def extract_triples_checkpointed(
    pages_path: str,
    store: ManifestStore,
    cfg: PipelineConfig,
    run_id: str,
    alias_path: str | None = None,
) -> dict:
    """Stages 1-5 + exact-tier linking + checkpoint.

    With ``alias_path``, the checkpoint writer resolves surfaces against
    the broadcast alias dictionary, so checkpoints carry linked ids and
    each manifest records its partition's unresolved surfaces — the graph
    stage then skips the resolve pass entirely (stage fusion: the cheap
    dictionary lookup rides the checkpoint write it shares a barrier
    with). Returns {'partitions_written': n, ...}.
    """
    done = store.completed_partitions()

    blocks = cfg.read_blocks or int(ray.cluster_resources().get("CPU", 4)) * 2
    ds = ray.data.read_parquet(
        pages_path,
        columns=["url", "warc_ts", "html", "lang"],
        override_num_blocks=blocks,
    )

    def assign_part(t: pa.Table) -> pa.Table:
        pid = partition_ids(t["url"].to_pylist(), cfg.n_partitions)
        out = t.append_column("part_id", pa.array(pid, pa.int64()))
        return out

    ds = ds.map_batches(assign_part, batch_format="pyarrow")
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def drop_done(t: pa.Table) -> pa.Table:
            pid = t["part_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(pid, done_arr)
            return t.filter(pa.array(keep))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    if cfg.lang_filter:
        lang = cfg.lang_filter

        def keep_lang(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t["lang"], lang))

        ds = ds.map_batches(keep_lang, batch_format="pyarrow")

    ds = ds.map_batches(
        lambda t: html_to_text_batch(t.drop_columns(["part_id"])).append_column(
            "part_id", t["part_id"]
        ),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )

    def seg_with_part(t: pa.Table) -> pa.Table:
        part = dict(zip(t["url"].to_pylist(), t["part_id"].to_pylist()))
        seg = segment_batch(t.drop_columns(["part_id"]))
        pid = [part[u] for u in seg["url"].to_pylist()]
        return seg.append_column("part_id", pa.array(pid, pa.int64()))

    segs = ds.map_batches(seg_with_part, batch_format="pyarrow")

    # batch_size here is in PAGES: Ray fuses the whole read->extract->
    # segment->triples chain into this operator, and the fused chain
    # coalesces input to this batch size. A large value (e.g. 4096) would
    # collapse a 20k-page corpus into 5 tasks and cap parallelism at 5.
    if cfg.extractor_kind == "actor":
        triples = segs.map_batches(
            _TripleExtractorWithPart,
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            concurrency=cfg.extractor_concurrency,
        )
    elif cfg.extractor_kind == "llm":
        # the LLM-seam backend (offline FakeLLMClient by default): an
        # actor pool — the client is built once per actor. Dead-letter
        # rows (error non-null) are dropped before the checkpoint; keep
        # them via kgraft.models.llm.split_dead_letters at operator level.
        triples = segs.map_batches(
            _LLMExtractorWithPart,
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            concurrency=cfg.extractor_concurrency,
        )
        triples = triples.map_batches(
            lambda t: t.filter(pa.compute.is_null(t["error"])).drop_columns(
                ["error"]
            ),
            batch_format="pyarrow",
        )
    else:
        triples = segs.map_batches(
            _TripleExtractorWithPart(),  # instance -> task mode, warm workers
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )

    alias_ref = None
    if alias_path is not None:
        import pyarrow.parquet as pq

        adf = pq.read_table(alias_path).to_pandas()
        alias_ref = ray.put(dict(zip(adf["alias"], adf["entity_id"].astype(int))))
    writer = store.make_writer(run_id, alias_ref=alias_ref)
    summary = triples.groupby("part_id").map_groups(writer, batch_format="pandas")
    rows = summary.to_pandas()
    return {
        "partitions_written": int(len(rows)),
        "partitions_skipped": len(done),
        "triples_written": int(rows["n_triples"].sum()) if len(rows) else 0,
    }


class _TripleExtractorWithPart(TripleExtractor):
    """TripleExtractor that threads the checkpoint partition id through."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        part = dict(
            zip(batch["url"].to_pylist(), batch["part_id"].to_pylist())
        )
        out = super().__call__(batch.drop_columns(["part_id"]))
        pid = [part[u] for u in out["url"].to_pylist()]
        return out.append_column("part_id", pa.array(pid, pa.int64()))


from .models.llm import LLMTripleExtractor


class _LLMExtractorWithPart(LLMTripleExtractor):
    """LLMTripleExtractor that threads the checkpoint partition id through."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        part = dict(
            zip(batch["url"].to_pylist(), batch["part_id"].to_pylist())
        )
        out = super().__call__(batch.drop_columns(["part_id"]))
        pid = [part[u] for u in out["url"].to_pylist()]
        return out.append_column("part_id", pa.array(pid, pa.int64()))


def _clear_dir(path: str) -> None:
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)


def build_graph_from_triples(
    triples_paths,
    alias_path: str,
    out_dir: str,
    cfg: PipelineConfig,
    store: ManifestStore | None = None,
) -> dict:
    """Stages 6-10: link, canonicalize, components, materialize graph.

    The three consumers of the linked triples (edges write,
    canonicalization, connected components) are independent, so they run
    CONCURRENTLY from driver threads, each STREAMING its own read of the
    checkpointed triples (plus a cheap broadcast recovery patch) — no
    whole-dataset materialize pinning the object store, and each
    consumer is barrier/latency-bound well below full cluster
    utilization, so overlapping them removes their serial sum from the
    critical path.
    """
    import time as _time

    alias_ds = ray.data.read_parquet(alias_path)
    timings: dict = {}

    pre_resolved = (
        store is not None and "subj_id" in ray.data.read_parquet(
            triples_paths[:1]
        ).schema().names
    )
    t0 = _time.time()
    if pre_resolved:
        # checkpoints already carry exact-tier ids + norms; unknowns come
        # from the manifests — no resolve pass, no rescan of data
        from .link.candidates import _RecoveryPatcher, lsh_recover

        unknowns = store.unresolved_from_manifests()
        if unknowns:
            import pyarrow.parquet as pq

            # vocab-scale pandas twin: lets lsh_recover build pre-chunked
            # probe blocks without a read + repartition round-trip
            adf = pq.read_table(alias_path).to_pandas()
            recovered = lsh_recover(
                unknowns, alias_ds, cfg.link_threshold, alias_df=adf
            )
        else:
            recovered = pd.DataFrame({"mention": [], "entity_id": [], "score": []})
        rec_ref = (
            ray.put(dict(zip(recovered["mention"], recovered["entity_id"].astype(int))))
            if len(recovered)
            else None
        )

        def linked_ds():
            # each consumer STREAMS the checkpointed triples from disk —
            # no whole-dataset materialize pinning the object store (r1
            # verdict next-round #9); the recovery patch is a cheap
            # broadcast map re-applied per consumer
            ds = ray.data.read_parquet(triples_paths)
            if rec_ref is not None:
                ds = ds.map_batches(
                    _RecoveryPatcher(rec_ref), batch_format="pyarrow",
                    batch_size=8192,
                )
            return ds

    else:
        triples = ray.data.read_parquet(triples_paths)
        linked0, recovered = link_triples(triples, alias_ds, cfg.link_threshold)

        def linked_ds():
            return linked0

    timings["recover_sec"] = _time.time() - t0

    # edges table (both endpoints linked)
    def to_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(
            pc.greater_equal(t["subj_id"], 0), pc.greater_equal(t["obj_id"], 0)
        )
        t = t.filter(ok)
        return pa.table(
            {
                "subj_id": t["subj_id"],
                "pred": t["pred"],
                "obj_id": t["obj_id"],
                "conf": t["conf"],
                "url": t["url"],
                "warc_ts": t["warc_ts"],
            }
        )

    edges_dir = os.path.join(out_dir, "edges")
    _clear_dir(edges_dir)  # write_parquet appends new files; a re-run of the
    # (cheap, non-checkpointed) graph stage must not duplicate rows

    # dataset CONSTRUCTION happens on the main thread (read_parquet's
    # path resolution is not thread-safe to race); only the lazy
    # EXECUTION runs in the worker threads below
    edges_in, nodes_in, comp_in = linked_ds(), linked_ds(), linked_ds()

    def run_edges():
        t = _time.time()
        edges_in.map_batches(to_edges, batch_format="pyarrow").write_parquet(
            edges_dir
        )
        timings["edges_sec"] = _time.time() - t

    # mention rows for canonicalization — surfaces were normalized once by
    # the resolve pass (subj_norm/obj_norm); never re-normalize here
    def to_mentions(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        subj = df.loc[df["subj_id"] >= 0, ["subj_id", "subj_norm"]].rename(
            columns={"subj_id": "entity_id", "subj_norm": "surface"}
        )
        obj = df.loc[df["obj_id"] >= 0, ["obj_id", "obj_norm"]].rename(
            columns={"obj_id": "entity_id", "obj_norm": "surface"}
        )
        both = pd.concat([subj, obj], ignore_index=True)
        return pa.Table.from_pandas(both, preserve_index=False)

    def run_nodes_base():
        t = _time.time()
        mentions = nodes_in.map_batches(to_mentions, batch_format="pyarrow")
        out = canonicalize(mentions).materialize()
        timings["canonicalize_sec"] = _time.time() - t
        return out

    # components over linked edge endpoints
    def to_cc_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(
            pc.greater_equal(t["subj_id"], 0), pc.greater_equal(t["obj_id"], 0)
        )
        t = t.filter(ok)
        return pa.table({"src": t["subj_id"], "dst": t["obj_id"]})

    def run_components():
        t = _time.time()
        cc_edges = comp_in.map_batches(to_cc_edges, batch_format="pyarrow")
        out = connected_components(cc_edges, method=cfg.components_method)
        timings["components_sec"] = _time.time() - t
        return out

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_edges = pool.submit(run_edges)
        f_nodes = pool.submit(run_nodes_base)
        f_comp = pool.submit(run_components)
        f_edges.result()
        nodes_base = f_nodes.result()
        comp = f_comp.result()
    comp_ref = ray.put(dict(zip(comp["entity_id"], comp["component_id"])))

    def attach_component(t: pa.Table) -> pa.Table:
        lut = ray.get(comp_ref)
        eids = pd.Series(t["entity_id"].to_numpy(zero_copy_only=False))
        cids = eids.map(lut).fillna(eids).astype("int64").to_numpy()
        return t.append_column("component_id", pa.array(cids, pa.int64()))

    t_n = _time.time()
    nodes = nodes_base.map_batches(attach_component, batch_format="pyarrow")
    nodes = nodes.select_columns(
        ["entity_id", "canonical", "aliases", "component_id", "n_mentions"]
    )
    nodes_dir = os.path.join(out_dir, "nodes")
    _clear_dir(nodes_dir)
    nodes.write_parquet(nodes_dir)
    timings["nodes_write_sec"] = _time.time() - t_n

    return {
        "timings": {k: round(v, 3) for k, v in timings.items()},
        "edges_dir": edges_dir,
        "nodes_dir": nodes_dir,
        # row counts from the written parquet footers — a ds.count() here
        # would re-execute the whole edges/nodes DAG
        "n_edges": _parquet_rows(edges_dir),
        "n_nodes": _parquet_rows(nodes_dir),
        "n_recovered_aliases": int(len(recovered)),
        "components": comp,
    }


def _parquet_rows(d: str) -> int:
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(p).metadata.num_rows
        for p in glob.glob(os.path.join(d, "*.parquet"))
    )


def run_kg_pipeline(
    pages_path: str,
    alias_path: str,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    run_id: str = "run-0",
) -> dict:
    """End-to-end flagship pipeline. Resumable: re-running after a partial
    failure skips checkpointed partitions."""
    cfg = cfg or PipelineConfig()
    if cfg.max_errored_blocks:
        from ray.data import DataContext

        DataContext.get_current().max_errored_blocks = cfg.max_errored_blocks
    os.makedirs(out_dir, exist_ok=True)
    store = ManifestStore(out_dir)
    t0 = time.time()
    stage_a = extract_triples_checkpointed(
        pages_path, store, cfg, run_id, alias_path=alias_path
    )
    t1 = time.time()
    stage_b = build_graph_from_triples(
        store.partition_paths(), alias_path, out_dir, cfg, store=store
    )
    t2 = time.time()
    metrics = {
        "run_id": run_id,
        "extract_sec": t1 - t0,
        "graph_sec": t2 - t1,
        "total_sec": t2 - t0,
        **stage_a,
        "n_edges": stage_b["n_edges"],
        "n_nodes": stage_b["n_nodes"],
        "n_recovered_aliases": stage_b["n_recovered_aliases"],
        "graph_timings": stage_b.get("timings", {}),
    }
    with open(os.path.join(out_dir, "run_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    metrics["components"] = stage_b["components"]
    metrics["triples_paths"] = store.partition_paths()
    metrics["nodes_dir"] = stage_b["nodes_dir"]
    metrics["edges_dir"] = stage_b["edges_dir"]
    return metrics
