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

    def __post_init__(self):
        # fail at construction, not mid-job (reference C1/C3 intent:
        # validated config + typed errors, settings/_DefaultConfig.py:7-71,
        # exception.py:48-55)
        from .errors import ConfigError

        if self.n_partitions < 1:
            raise ConfigError(f"n_partitions must be >= 1, got {self.n_partitions}")
        if self.extractor_kind not in ("task", "actor", "llm"):
            raise ConfigError(f"unknown extractor_kind {self.extractor_kind!r}")
        if self.components_method not in ("unionfind", "labelprop"):
            raise ConfigError(f"unknown components_method {self.components_method!r}")
        if not 0.0 <= self.link_threshold <= 1.0:
            raise ConfigError(f"link_threshold outside [0,1]: {self.link_threshold}")
        if self.max_errored_blocks < 0:
            raise ConfigError("max_errored_blocks must be >= 0")


class _GraphFeeder:
    """Incremental consumer of the extract job's summary stream.

    The graph stage's inputs (tree-reduce leaves over the comps/canon
    blobs, the pending-row concat, the LSH recovery probes) do not need
    the WHOLE summary — each leaf covers a disjoint slice of tasks. So
    the driver feeds summary blocks here as the streaming executor emits
    them, and by the time the last extract task finishes most of the
    graph reduction is already computed, off the critical path.
    """

    BLOB_GROUP = 16  # writer tasks per tree-reduce leaf
    PROBE_MIN = 2048  # unknown surfaces per incremental recovery probe

    def __init__(self, alias_index_future, threshold: float):
        self._index_future = alias_index_future
        self._threshold = threshold
        self._comps: list = []
        self._canon: list = []
        self._pend: list = []
        self._levels: dict[int, list] = {}  # merge-cascade: level -> refs
        self.pending_refs: list = []
        self.probe_refs: list = []
        self.probed: set = set()
        self.unresolved: set = set()
        self._unprobed: list = []
        self._shard_fn = ray.remote(num_cpus=1)(_partial_reduce)
        self._merge_fn = ray.remote(num_cpus=1)(_merge_partials)
        self._concat_fn = ray.remote(num_cpus=1)(_concat_ipc)
        self.base_ref = None
        self.pending_merged_ref = None
        self.root_launched = False

    def _push_ref(self, ref, level: int = 0) -> None:
        # eager binary merge cascade: two refs at a level merge into one
        # at level+1 as soon as both exist, so the reduction tree runs
        # DURING the extract job and the root sees O(log) residual refs
        pool = self._levels.setdefault(level, [])
        pool.append(ref)
        if len(pool) == 2:
            a, b = pool
            self._levels[level] = []
            self._push_ref(self._merge_fn.remote(a, b), level + 1)

    @property
    def shard_refs(self) -> list:
        return [r for refs in self._levels.values() for r in refs]

    def _index_ref(self):
        f = self._index_future
        if f is not None and f.done():
            return f.result()[1]
        return None

    def feed(self, batch: pd.DataFrame) -> None:
        for blob in batch["comps_blob"]:
            if blob is not None:
                self._comps.append(blob)
        for blob in batch["canon_blob"]:
            if blob is not None:
                self._canon.append(blob)
        for blob in batch["pending_blob"]:
            if blob is not None:
                self._pend.append(blob)
        while len(self._comps) >= self.BLOB_GROUP:
            self._push_ref(
                self._shard_fn.remote(
                    self._comps[: self.BLOB_GROUP], self._canon[: self.BLOB_GROUP]
                )
            )
            del self._comps[: self.BLOB_GROUP]
            del self._canon[: self.BLOB_GROUP]
        while len(self._pend) >= self.BLOB_GROUP:
            self.pending_refs.append(
                self._concat_fn.remote(self._pend[: self.BLOB_GROUP], None)
            )
            del self._pend[: self.BLOB_GROUP]
        for u in batch["unresolved"]:
            for s in json.loads(u):
                if s not in self.unresolved:
                    self.unresolved.add(s)
                    self._unprobed.append(s)
        # recovery probes launch as soon as the alias index is broadcast
        # (built on its own driver thread) and enough new unknowns
        # accumulated — recovery work rides the extract job's tail
        idx_ref = self._index_ref()
        while idx_ref is not None and len(self._unprobed) >= self.PROBE_MIN:
            chunk = self._unprobed[: self.PROBE_MIN]
            del self._unprobed[: self.PROBE_MIN]
            self.probe_refs.append(
                _probe_chunk.remote(idx_ref, chunk, self._threshold)
            )
            self.probed.update(chunk)

    def flush(self) -> None:
        if self._comps or self._canon:
            self._push_ref(self._shard_fn.remote(self._comps, self._canon))
            self._comps, self._canon = [], []
        if self._pend:
            self.pending_refs.append(self._concat_fn.remote(self._pend, None))
            self._pend = []

    def launch_root(self, store, covered_parts: set) -> None:
        """Kick off the root reduce + final pending merge the moment the
        last summary block lands (before manifests commit), so by the
        time the graph stage asks, both are done or nearly so. Disk
        extras cover a resumed run's previously-committed partitions
        (this run's commits happen after this call, so
        ``completed_partitions()`` is exactly the prior-run set)."""
        disk_parts = store.completed_partitions() - covered_parts
        comps_extra = store.derived_disk_table("comps", disk_parts)
        canon_extra = store.derived_disk_table("canon", disk_parts)
        # pending disk extras are corpus-fraction-scale: read them in a
        # Ray task and chain the ref (Ray resolves it for _merge_tables)
        pend_extra = (
            _read_derived_task.remote(store.out_dir, "pending", tuple(disk_parts))
            if disk_parts
            else None
        )
        self.base_ref = ray.remote(num_cpus=1)(_base_reduce).remote(
            self.shard_refs, comps_extra, canon_extra
        )
        self.pending_merged_ref = (
            ray.remote(num_cpus=1)(_merge_tables).remote(
                self.pending_refs, pend_extra
            )
            if (self.pending_refs or pend_extra is not None)
            else None
        )
        self.root_launched = True


@ray.remote(num_cpus=1)
def _probe_chunk(index, surfaces, threshold):
    """LSH-recovery probe over one chunk of unknown surfaces (index is a
    broadcast AliasLSHIndex; Ray resolves the ObjectRef)."""
    return index.recover(list(surfaces), threshold)


def extract_triples_checkpointed(
    pages_path: str,
    store: ManifestStore,
    cfg: PipelineConfig,
    run_id: str,
    alias_path: str | None = None,
    alias_lut_future=None,
    feeder: _GraphFeeder | None = None,
) -> dict:
    """Stages 1-5 + exact-tier linking + checkpoint.

    With ``alias_path``, the checkpoint writer resolves surfaces against
    the broadcast alias dictionary, so checkpoints carry linked ids and
    each manifest records its partition's unresolved surfaces — the graph
    stage then skips the resolve pass entirely (stage fusion: the cheap
    dictionary lookup rides the checkpoint write it shares a barrier
    with). Returns {'partitions_written': n, ...}.
    """
    store.check_run_config(
        {"n_partitions": cfg.n_partitions, "lang_filter": cfg.lang_filter}
    )
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

    ext_t: dict = {}
    _t = time.time()
    alias_ref = None
    if alias_lut_future is not None:
        # the broadcast alias LUT was built on the index driver thread,
        # overlapped with read planning — this is normally a no-wait
        alias_ref = alias_lut_future.result()
    elif alias_path is not None:
        from .link.candidates import load_alias_lut

        _, alias_ref = load_alias_lut(alias_path)
    ext_t["alias_put_sec"] = time.time() - _t
    # shuffle-free checkpoint: each task splits its block by partition
    # and writes fragments; the driver folds the summary rows into
    # per-partition manifests (manifest.py module docstring). The old
    # groupby(part_id) co-location was the single widest exchange of the
    # pipeline and bought nothing: the sort is itself a barrier, so crash
    # granularity is the same either way.
    # NOTE: no batch_size here — the writer fuses with the read->extract->
    # segment->triples chain (Ray fuses task stages into downstream map
    # ops, actor pools included), so any batch_size would be applied to
    # the fused operator's INPUT (pages) and collapse extract parallelism
    # to n_pages/batch_size tasks. One fragment set per extract task is
    # fine because the driver consumes the derived partials from the
    # summary blobs, not by re-opening the fragment files.
    writer = store.make_fragment_writer(run_id, alias_ref=alias_ref)
    summary = triples.map_batches(writer, batch_format="pandas", batch_size=None)
    _t = time.time()
    # stream the summary: each block arrives as its writer task finishes,
    # and the feeder launches graph-reduce leaves / pending concats /
    # recovery probes for it immediately — the graph reduction overlaps
    # the extract job instead of waiting behind a to_pandas barrier
    parts_acc: list[pd.DataFrame] = []
    meta_cols = [
        "part_id", "fragment", "n_triples", "n_edges", "n_urls",
        "n_predicates", "content_hash", "url_sample", "unresolved",
        "bytes_written",
    ]
    for batch in summary.iter_batches(batch_size=None, batch_format="pandas"):
        if not len(batch):
            continue
        if feeder is not None and "comps_blob" in batch.columns:
            feeder.feed(batch)
        sel = batch[[c for c in meta_cols if c in batch.columns]]
        if "content_hash" in sel.columns:
            # pin uint64 BEFORE concat: blocks whose hashes all sit below
            # 2^63 infer int64, and a mixed int64/uint64 concat silently
            # promotes to float64 — rounding the lineage hashes past 2^53
            # so manifests record corrupted content hashes (review r2)
            sel = sel.assign(content_hash=sel["content_hash"].astype("uint64"))
        parts_acc.append(sel)
    rows = (
        pd.concat(parts_acc, ignore_index=True) if parts_acc else pd.DataFrame()
    )
    if feeder is not None:
        feeder.flush()
        feeder.launch_root(
            store, set(rows["part_id"].astype(int)) if len(rows) else set()
        )
    ext_t["job_sec"] = time.time() - _t
    if os.environ.get("KGRAFT_STATS"):
        print(summary.stats())
    _t = time.time()
    committed = store.commit_manifests(rows, run_id) if len(rows) else 0
    ext_t["commit_sec"] = time.time() - _t
    return {
        "partitions_written": committed,
        "partitions_skipped": len(done),
        "triples_written": int(rows["n_triples"].sum()) if len(rows) else 0,
        "covered_parts": set(rows["part_id"].astype(int)) if len(rows) else set(),
        "extract_timings": {k: round(v, 3) for k, v in ext_t.items()},
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
    alias_index_future=None,
    feeder: _GraphFeeder | None = None,
    covered_parts=None,
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

    if store is not None and store.has_derived():
        return _build_graph_fused(
            triples_paths, alias_path, alias_ds, out_dir, cfg, store, timings,
            alias_index_future=alias_index_future,
            feeder=feeder, covered_parts=covered_parts,
        )

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
        # consume the feeder's in-flight probes (launched while extraction
        # ran) instead of leaking those tasks and re-probing the same
        # surfaces from scratch (review r2)
        pre_parts: list = []
        if feeder is not None and feeder.probe_refs:
            pre_parts = [r for r in ray.get(feeder.probe_refs) if len(r)]
            unknowns = sorted(set(unknowns) - feeder.probed)
        if unknowns:
            import pyarrow.parquet as pq

            # vocab-scale pandas twin: lets lsh_recover build pre-chunked
            # probe blocks without a read + repartition round-trip
            adf = pq.read_table(alias_path).to_pandas()
            pre_parts.append(
                lsh_recover(unknowns, alias_ds, cfg.link_threshold, alias_df=adf)
            )
        recovered = (
            pd.concat(pre_parts, ignore_index=True)
            if pre_parts
            else pd.DataFrame({"mention": [], "entity_id": [], "score": []})
        )
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
        # prune to the RAW triple columns at the read: snapshot-merge
        # callers feed CHECKPOINTED (pre-resolved) triple files here, and
        # the resolve pass below appends subj_norm/obj_norm/ids itself —
        # re-reading the baked ones would duplicate fields (and bake in
        # per-snapshot link decisions instead of re-deriving them over
        # the union)
        triples = ray.data.read_parquet(
            triples_paths,
            columns=["url", "seg_idx", "subj", "pred", "obj", "conf", "warc_ts"],
        )
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


def _build_graph_fused(
    triples_paths,
    alias_path: str,
    alias_ds,
    out_dir: str,
    cfg: PipelineConfig,
    store,
    timings: dict,
    alias_index_future=None,
    feeder: _GraphFeeder | None = None,
    covered_parts=None,
) -> dict:
    """Graph stage over the writer's fused derived outputs.

    The checkpoint writer already emitted, per partition, (a) locally
    contracted component edges, (b) partial ``(entity, surface)`` mention
    counts, and (c) the rows with an unresolved endpoint ("pending") —
    all vocabulary-scale. So this stage runs exactly ONE corpus-scale
    scan (the edges write, whose rows recovery cannot change: the LSH
    patch only fills ``-1`` ids, which the edge filter drops) and
    overlaps the LSH recovery with it; components and canonicalization
    reduce the derived files driver-side (vocab-bounded — the documented
    partitioning assumption of stage 9).
    """
    import glob as _glob
    import time as _time

    import pyarrow.parquet as pq

    from .link.candidates import lsh_recover

    t_all = _time.time()
    unknowns = store.unresolved_from_manifests()

    def recover():
        t0 = _time.time()
        probed = feeder.probed if feeder is not None else set()
        remaining = [u for u in unknowns if u not in probed]
        parts = []
        if remaining and alias_index_future is not None:
            # flipped probe: the alias-side index was built (and ray.put)
            # on a driver thread during extraction; the probe itself is
            # sharded across Ray tasks, off the driver's GIL. Most
            # surfaces were already probed incrementally by the feeder
            # while extraction ran — this covers the tail (plus, on a
            # resumed run, prior partitions' unresolved surfaces).
            idx, idx_ref = alias_index_future.result()
            timings["index_wait_sec"] = _time.time() - t0
            parts.append(
                idx.recover_parallel(
                    remaining, cfg.link_threshold, index_ref=idx_ref
                )
            )
        elif remaining:
            adf = pq.read_table(alias_path).to_pandas()
            parts.append(
                lsh_recover(remaining, alias_ds, cfg.link_threshold, alias_df=adf)
            )
        if feeder is not None and feeder.probe_refs:
            parts.extend(ray.get(feeder.probe_refs))
        rec = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"mention": [], "entity_id": [], "score": []})
        )
        timings["recover_sec"] = _time.time() - t0
        return rec

    edges_dir = os.path.join(out_dir, "edges")
    edges_at_write = store.has_edges()
    if edges_at_write:
        # the checkpoint writer already materialized the exact-tier edge
        # fragments in the same pass that wrote the triples — the only
        # cleanup needed is a stale recovery-delta from a previous graph
        # build over this checkpoint (it is re-derived below)
        delta_path = os.path.join(edges_dir, "delta-recovered.parquet")
        if os.path.exists(delta_path):
            os.remove(delta_path)
    else:
        _clear_dir(edges_dir)  # write_parquet appends; re-runs must not duplicate

    def to_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(
            pc.greater_equal(t["subj_id"], 0), pc.greater_equal(t["obj_id"], 0)
        )
        t = t.filter(ok)
        return t.select(["subj_id", "pred", "obj_id", "conf", "url", "warc_ts"])

    def run_edges():
        # fallback for checkpoints written by a pre-edges engine version:
        # re-derive the edge table by scanning the triple fragments
        if edges_at_write:
            timings["edges_sec"] = 0.0
            return
        t0 = _time.time()
        ray.data.read_parquet(triples_paths).map_batches(
            to_edges, batch_format="pyarrow"
        ).write_parquet(edges_dir)
        timings["edges_sec"] = _time.time() - t0

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_rec = pool.submit(recover)
        f_edges = pool.submit(run_edges)

        # driver meanwhile: assemble the vocabulary-scale derived
        # partials. For the partitions THIS run wrote, the feeder already
        # launched tree-reduce leaves / pending concats per summary block
        # WHILE extraction ran — zero file re-opens and (for a fresh run)
        # near-zero residual work here. Only a resumed run's skipped
        # partitions come from disk, via one multi-file pyarrow dataset
        # scan.
        t0 = _time.time()
        disk_parts = store.completed_partitions() - (covered_parts or set())

        def _disk_table(kind):
            return store.derived_disk_table(kind, disk_parts)

        # pending is needed ON the driver (the recovery patch below); its
        # per-group concats ran as Ray tasks during extraction and the
        # final merge + the root reduce were launched at flush time
        # (feeder.launch_root) — normally both are already done here.
        if feeder is not None and feeder.root_launched:
            pending_ref = feeder.pending_merged_ref
            base_ref = feeder.base_ref
        else:
            pend_refs = feeder.pending_refs if feeder is not None else []
            # corpus-fraction-scale: disk read happens in a Ray task
            pend_disk = (
                _read_derived_task.remote(store.out_dir, "pending", tuple(disk_parts))
                if disk_parts
                else None
            )
            pending_ref = (
                ray.remote(num_cpus=1)(_merge_tables).remote(pend_refs, pend_disk)
                if (pend_refs or pend_disk is not None)
                else None
            )
            shard_refs = feeder.shard_refs if feeder is not None else []
            base_ref = ray.remote(num_cpus=1)(_base_reduce).remote(
                shard_refs, _disk_table("comps"), _disk_table("canon")
            )
        timings["derived_read_sec"] = _time.time() - t0

        recovered = f_rec.result()

        # patch the pending rows with the recovered aliases IN A RAY TASK
        # — pending is corpus-fraction-scale (every triple with an
        # unresolved endpoint), so it must never land on the driver; only
        # the recovery-scale deltas (newly-resolved edge PAIRS and
        # (entity, surface) counts) come back. The task also writes the
        # delta edge file when the writer-produced edge fragments make
        # that safe (no concurrent Dataset write to clobber it).
        t0 = _time.time()
        lut = dict(zip(recovered["mention"], recovered["entity_id"].astype(int)))
        if pending_ref is not None:
            dpairs, delta_canon, n_delta_edges, delta_t = ray.get(
                ray.remote(num_cpus=1)(_patch_pending).remote(
                    pending_ref, lut, edges_dir if edges_at_write else None
                )
            )
        else:
            dpairs, delta_canon, n_delta_edges, delta_t = (
                pd.DataFrame({"subj_id": [], "obj_id": []}),
                pd.DataFrame({"entity_id": [], "surface": [], "n": []}),
                0,
                None,
            )
        timings["patch_sec"] = _time.time() - t0

        t0 = _time.time()
        base = ray.get(base_ref)
        timings["base_reduce_wait_sec"] = _time.time() - t0
        comp, nodes_df, nodes_dir = _finalize_graph_driver(
            base,
            dpairs,
            delta_canon,
            out_dir,
            timings,
        )
        f_edges.result()

    if delta_t is not None and delta_t.num_rows:
        # legacy-fallback path only (edges re-derived by a Dataset write):
        # the delta file lands after that write finishes, because Ray's
        # write_parquet may clean the output dir when it starts,
        # clobbering a concurrently-written side file
        pq.write_table(delta_t, os.path.join(edges_dir, "delta-recovered.parquet"))

    timings["graph_total_sec"] = _time.time() - t_all

    return {
        "timings": {k: round(v, 3) for k, v in timings.items()},
        "edges_dir": edges_dir,
        "nodes_dir": nodes_dir,
        # manifest-recorded counts when the writer produced the edge
        # fragments (walking thousands of footers is serial driver time)
        "n_edges": (
            sum(
                int(m.get("row_counts", {}).get("edges", 0))
                for m in store._manifests()
            )
            + int(n_delta_edges)
            if edges_at_write
            else _parquet_rows(edges_dir)
        ),
        "n_nodes": int(len(nodes_df)),
        "n_recovered_aliases": int(len(recovered)),
        "components": comp,
    }


def _nodes_from_gsum(gsum: pd.DataFrame) -> pa.Table:
    """(entity_id, surface, n) counts -> nodes rows (Arrow). Same
    semantics as graph.canonical.canonicalize: canonical = most-frequent
    surface, ties -> lexicographically smallest; aliases sorted distinct.

    One pandas sort + numpy group boundaries + an Arrow ListArray built
    straight from offsets — the previous two-sorts-plus-agg(list) pandas
    version was ~1s of the graph critical path at 80k entities."""
    if not len(gsum):
        return pa.table(
            {
                "entity_id": pa.array([], pa.int64()),
                "canonical": pa.array([], pa.string()),
                "aliases": pa.array([], pa.list_(pa.string())),
                "n_mentions": pa.array([], pa.int64()),
            }
        )
    df = gsum.sort_values(["entity_id", "surface"], ignore_index=True)
    ent = df["entity_id"].to_numpy(dtype=np.int64)
    n = df["n"].to_numpy(dtype=np.int64)
    bounds = np.flatnonzero(np.r_[True, ent[1:] != ent[:-1]])
    offsets = np.r_[bounds, len(ent)].astype(np.int32)
    surf = pa.array(df["surface"], pa.string())
    aliases = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), surf)
    n_mentions = np.add.reduceat(n, bounds)
    # canonical = first (i.e. lexicographically smallest, rows are
    # surface-sorted within entity) row achieving the group max count
    grp = np.cumsum(np.r_[False, ent[1:] != ent[:-1]])
    gmax = np.maximum.reduceat(n, bounds)
    pos = np.arange(len(ent), dtype=np.int64)
    cand = np.where(n == gmax[grp], pos, np.iinfo(np.int64).max)
    first_max = np.minimum.reduceat(cand, bounds)
    return pa.table(
        {
            "entity_id": pa.array(ent[bounds], pa.int64()),
            "canonical": surf.take(pa.array(first_max, pa.int64())),
            "aliases": aliases,
            "n_mentions": pa.array(n_mentions, pa.int64()),
        }
    )


def _concat_ipc(blobs, extra):
    """Decode + concat IPC blobs into one Arrow table (runs as a Ray
    task so the driver's graph threads never pay the decode)."""
    tabs = [pa.ipc.open_stream(b).read_all() for b in blobs]
    if extra is not None and extra.num_rows:
        tabs.append(extra)
    return pa.concat_tables(tabs) if tabs else None


def _patch_pending(pend_t, lut, edges_dir):
    """Ray task: fold the recovered alias LUT into the pending
    (unresolved-endpoint) rows. Input is corpus-fraction-scale and stays
    off the driver; returns only recovery-scale reductions — deduped
    newly-resolved edge pairs, pre-grouped (entity, surface, n) mention
    deltas, and the delta edge count. With ``edges_dir`` set, also
    writes the delta edge fragment (atomic tmp+rename)."""
    import pyarrow.parquet as pq

    if pend_t is None or pend_t.num_rows == 0:
        return (
            pd.DataFrame({"subj_id": [], "obj_id": []}),
            pd.DataFrame({"entity_id": [], "surface": [], "n": []}),
            0,
            None,
        )
    pending = pend_t.to_pandas()
    was_subj = pending["subj_id"] < 0
    was_obj = pending["obj_id"] < 0
    if lut:
        pending.loc[was_subj, "subj_id"] = (
            pending.loc[was_subj, "subj_norm"].map(lut).fillna(-1).astype("int64")
        )
        pending.loc[was_obj, "obj_id"] = (
            pending.loc[was_obj, "obj_norm"].map(lut).fillna(-1).astype("int64")
        )
    now_subj = was_subj & (pending["subj_id"] >= 0)
    now_obj = was_obj & (pending["obj_id"] >= 0)
    delta_canon = (
        pd.concat(
            [
                pending.loc[now_subj, ["subj_id", "subj_norm"]].set_axis(
                    ["entity_id", "surface"], axis=1
                ),
                pending.loc[now_obj, ["obj_id", "obj_norm"]].set_axis(
                    ["entity_id", "surface"], axis=1
                ),
            ],
            ignore_index=True,
        )
        .groupby(["entity_id", "surface"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    delta_edges = pending.loc[
        (pending["subj_id"] >= 0) & (pending["obj_id"] >= 0),
        ["subj_id", "pred", "obj_id", "conf", "url", "warc_ts"],
    ]
    dpairs = delta_edges[["subj_id", "obj_id"]].drop_duplicates()
    delta_t = pa.Table.from_pandas(delta_edges, preserve_index=False)
    if edges_dir is not None:
        if len(delta_edges):
            path = os.path.join(edges_dir, "delta-recovered.parquet")
            tmp = path + ".tmp"
            pq.write_table(delta_t, tmp)
            os.replace(tmp, path)
        # written here — the driver has nothing left to write
        return dpairs, delta_canon, int(len(delta_edges)), None
    return dpairs, delta_canon, int(len(delta_edges)), delta_t


def _merge_tables(refs, extra):
    """Final merge of the feeder's pending-concat shard tables (runs as
    a Ray task; ``refs`` are ObjectRefs of :func:`_concat_ipc` outputs)."""
    tabs = [t for t in ray.get(list(refs)) if t is not None]
    if extra is not None and extra.num_rows:
        tabs.append(extra)
    return pa.concat_tables(tabs) if tabs else None


@ray.remote(num_cpus=1)
def _read_derived_task(out_dir: str, kind: str, parts: tuple):
    """Disk read of a resumed run's derived partials INSIDE a Ray task —
    pending is corpus-fraction-scale, so pulling it through the driver
    (and re-shipping it by value into the merge task) would hold the
    whole unresolved set in driver memory at exactly the scale the
    checkpoint design targets (review r2)."""
    from .manifest import ManifestStore

    return ManifestStore(out_dir).derived_disk_table(kind, set(parts))


def _partial_reduce(comps_blobs, canon_blobs):
    """Tree-reduce leaf over a disjoint slice of the writer's fragment
    partials: dedup the pair set and CONTRACT it — a local connected-
    components pass turns the slice's pairs into one ``(node, label)``
    star edge per node, which preserves connectivity under union — and
    pre-sum the per-(entity, surface) mention counts. Each leaf's output
    is vocabulary-scale, so the root merge no longer grows with the
    corpus (the single-task reduce measured ~13 s at 1.6 M pages)."""
    from .graph.components import components_numpy

    def _concat(blobs):
        tabs = [pa.ipc.open_stream(b).read_all() for b in blobs]
        return pa.concat_tables(tabs) if tabs else None

    comp = _concat(comps_blobs)
    pairs = None
    if comp is not None and comp.num_rows:
        # Arrow group_by with no aggregates = distinct, without a pandas
        # round-trip of the multi-million-row pair set
        uniq = comp.group_by(["src", "dst"]).aggregate([])
        ent, lab = components_numpy(
            uniq["src"].to_numpy().astype(np.int64, copy=False),
            uniq["dst"].to_numpy().astype(np.int64, copy=False),
        )
        pairs = pa.table(
            {"src": pa.array(ent, pa.int64()), "dst": pa.array(lab, pa.int64())}
        )
    canon = _concat(canon_blobs)
    if canon is not None and canon.num_rows:
        canon = (
            canon.group_by(["entity_id", "surface"])
            .aggregate([("partial_count", "sum")])
            .rename_columns(["entity_id", "surface", "partial_count"])
        )
    else:
        canon = None
    return pairs, canon


def _merge_partials(a, b):
    """Binary merge node of the feeder's reduce cascade: union two
    contracted (pairs, canon) partials and contract again — local
    connected components over star edges preserve global connectivity,
    and the per-(entity, surface) counts just re-sum. Ray resolves the
    two ObjectRef args; output stays vocabulary-scale."""
    from .graph.components import components_numpy

    (pa_a, ca_a), (pa_b, ca_b) = a, b
    pair_tabs = [t for t in (pa_a, pa_b) if t is not None]
    pairs = None
    if pair_tabs:
        uniq = pa.concat_tables(pair_tabs).group_by(["src", "dst"]).aggregate([])
        ent, lab = components_numpy(
            uniq["src"].to_numpy().astype(np.int64, copy=False),
            uniq["dst"].to_numpy().astype(np.int64, copy=False),
        )
        pairs = pa.table(
            {"src": pa.array(ent, pa.int64()), "dst": pa.array(lab, pa.int64())}
        )
    canon_tabs = [t for t in (ca_a, ca_b) if t is not None]
    canon = None
    if canon_tabs:
        canon = (
            pa.concat_tables(canon_tabs)
            .group_by(["entity_id", "surface"])
            .aggregate([("partial_count", "sum")])
            .rename_columns(["entity_id", "surface", "partial_count"])
        )
    return pairs, canon


def _base_reduce(shard_refs, comps_extra, canon_extra):
    """Delta-free reduction of the fragment partials (runs as a Ray task,
    overlapped with recovery): vectorized connected components over the
    shard-contracted pairs, canonical-surface pick over the pre-summed
    mention counts. Inputs are ObjectRefs of :func:`_partial_reduce`
    outputs (already vocab-scale) plus an optional disk table for a
    resumed run's skipped partitions. Returns ((nodes, labels) arrays,
    summed counts, delta-free nodes rows)."""
    from .graph.components import components_numpy

    parts = ray.get(list(shard_refs))

    pair_tabs = [p for p, _ in parts if p is not None]
    if comps_extra is not None and comps_extra.num_rows:
        pair_tabs.append(comps_extra.select(["src", "dst"]))
    if pair_tabs:
        comp = pa.concat_tables(pair_tabs)
        pairs = comp.group_by(["src", "dst"]).aggregate([])
        base_comp = components_numpy(
            pairs["src"].to_numpy().astype(np.int64, copy=False),
            pairs["dst"].to_numpy().astype(np.int64, copy=False),
        )
    else:
        base_comp = (np.array([], dtype=np.int64), np.array([], dtype=np.int64))

    canon_tabs = [c for _, c in parts if c is not None]
    if canon_extra is not None and canon_extra.num_rows:
        canon_tabs.append(
            canon_extra.select(["entity_id", "surface", "partial_count"])
        )
    if canon_tabs:
        canon = pa.concat_tables(canon_tabs)
        gsum = (
            canon.group_by(["entity_id", "surface"])
            .aggregate([("partial_count", "sum")])
            .rename_columns(["entity_id", "surface", "n"])
        )
    else:
        gsum = pa.table(
            {
                "entity_id": pa.array([], pa.int64()),
                "surface": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    # gsum stays Arrow (plasma hands it back to the driver zero-copy);
    # nodes are pre-built here so the driver's finalize only patches the
    # recovery-affected entities
    return base_comp, gsum, _nodes_from_gsum(gsum.to_pandas())


def _finalize_graph_driver(
    base, dpairs, delta_canon, out_dir, timings
):
    """Fold the recovery deltas (recovery-scale, tiny — pre-reduced by
    :func:`_patch_pending`) into the base reduction and write the nodes
    table. ``dpairs``: deduped newly-resolved (subj_id, obj_id) pairs;
    ``delta_canon``: pre-grouped (entity_id, surface, n) mention deltas."""
    import time as _time

    import pyarrow.parquet as pq

    (ent, lab), gsum, nodes_t = base

    # components: re-run the (vectorized) reduction over the contracted
    # base (one label->node star edge per node) plus the recovery deltas
    t0 = _time.time()
    if len(dpairs):
        from .graph.components import components_numpy

        ent, lab = components_numpy(
            np.concatenate([lab, dpairs["subj_id"].to_numpy(dtype=np.int64)]),
            np.concatenate([ent, dpairs["obj_id"].to_numpy(dtype=np.int64)]),
        )
    comp = pd.DataFrame({"entity_id": ent, "component_id": lab})
    timings["components_sec"] = _time.time() - t0

    # canonicalization: recompute only the entities the recovery deltas
    # touched; everything else keeps its delta-free Arrow row as-is
    t0 = _time.time()
    dm = delta_canon
    if len(dm):
        import pyarrow.compute as pc

        affected = pa.array(sorted(set(dm["entity_id"])), pa.int64())
        sub = pd.concat(
            [
                gsum.filter(pc.is_in(gsum["entity_id"], affected)).to_pandas(),
                dm,
            ],
            ignore_index=True,
        )
        sub = sub.groupby(["entity_id", "surface"], as_index=False)["n"].sum()
        keep = nodes_t.filter(
            pc.invert(pc.is_in(nodes_t["entity_id"], affected))
        )
        nodes_t = pa.concat_tables([keep, _nodes_from_gsum(sub)]).sort_by(
            "entity_id"
        )
    # component_id via searchsorted over the (sorted) component entity
    # array — no python dict of the whole vocabulary
    node_ids = nodes_t["entity_id"].to_numpy()
    if len(ent):
        order = np.argsort(ent, kind="stable")
        s_ent, s_lab = ent[order], lab[order]
        ins = np.searchsorted(s_ent, node_ids)
        ins_c = np.minimum(ins, len(s_ent) - 1)
        hit = s_ent[ins_c] == node_ids
        cids = np.where(hit, s_lab[ins_c], node_ids)
    else:
        cids = node_ids
    nodes_t = nodes_t.append_column(
        "component_id", pa.array(cids, pa.int64())
    ).select(["entity_id", "canonical", "aliases", "component_id", "n_mentions"])
    nodes_dir = os.path.join(out_dir, "nodes")
    _clear_dir(nodes_dir)
    os.makedirs(nodes_dir, exist_ok=True)
    pq.write_table(nodes_t, os.path.join(nodes_dir, "nodes-00000.parquet"))
    timings["canonicalize_sec"] = _time.time() - t0
    return comp, nodes_t, nodes_dir


def _parquet_rows(d: str) -> int:
    """Row count from parquet footers only (no data read), recursing into
    per-partition subdirectories."""
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(p).metadata.num_rows
        for p in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
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
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if cfg.max_errored_blocks:
        ctx.max_errored_blocks = cfg.max_errored_blocks
    # The executor's per-operator resource reservation (default: half the
    # cluster held back for downstream ops) is built for long actor-pool
    # chains; this DAG ends in an all-to-all whose reserved CPUs sit idle
    # until the barrier, which measured 2x extract wall at 8 CPUs (66s ->
    # 117s) and ~15% at 32. Autoscaling pools (min=1) still make progress
    # without reservation because upstream batch tasks always drain.
    ctx.op_resource_reservation_enabled = False

    # build the broadcast alias LUT and then the alias-side LSH recovery
    # index on a DRIVER thread while stage A runs on the cluster: the
    # alias table is static per run, so the extract stage's exact tier
    # picks up the LUT without reading the parquet on its critical path,
    # and by the time recovery probes launch the index is broadcast
    # (link/candidates.AliasLSHIndex)
    from concurrent.futures import ThreadPoolExecutor as _TPE

    def _build_lut():
        from .link.candidates import load_alias_lut

        return load_alias_lut(alias_path)

    def _build_index(lut_future):
        from .link.candidates import AliasLSHIndex

        adf, _ = lut_future.result()
        idx = AliasLSHIndex(adf)
        # broadcast once so recovery can shard across Ray tasks without
        # re-shipping the index
        return idx, ray.put(idx)

    _index_pool = _TPE(max_workers=1)
    _lut_future = _index_pool.submit(_build_lut)
    alias_lut_future = _index_pool.submit(lambda: _lut_future.result()[1])
    alias_index_future = _index_pool.submit(_build_index, _lut_future)
    _index_pool.shutdown(wait=False)
    feeder = _GraphFeeder(alias_index_future, cfg.link_threshold)
    os.makedirs(out_dir, exist_ok=True)
    store = ManifestStore(out_dir)
    store.check_run_config(
        {"n_partitions": cfg.n_partitions, "lang_filter": cfg.lang_filter}
    )
    t0 = time.time()
    stage_a = extract_triples_checkpointed(
        pages_path, store, cfg, run_id, alias_path=alias_path,
        alias_lut_future=alias_lut_future, feeder=feeder,
    )
    covered_parts = stage_a.pop("covered_parts", set())
    t1 = time.time()
    stage_b = build_graph_from_triples(
        store.partition_paths(), alias_path, out_dir, cfg, store=store,
        alias_index_future=alias_index_future,
        feeder=feeder, covered_parts=covered_parts,
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


def merge_kg_snapshots(
    snapshot_dirs, alias_path: str, out_dir: str, cfg: PipelineConfig | None = None
) -> dict:
    """Incremental ingestion / snapshot compaction: rebuild ONE graph
    from the checkpointed triples of several pipeline snapshots.

    The delta pattern a growing crawl needs: run ``run_kg_pipeline`` on
    each new page batch into its own snapshot dir (immutable, resumable
    as usual), then merge. Extraction — the expensive stages (HTML
    parse, segmentation, NER/LLM triple extraction) — is NEVER redone;
    linking, canonicalization, connected components and graph
    materialization re-derive over the UNION of checkpointed raw
    triples, so the merged graph is BIT-IDENTICAL to a fresh
    full-corpus run (equivalence-tested in tests/test_pipeline.py —
    link recovery and canonical-name election are corpus-dependent, so
    they must re-run over the union rather than paste per-snapshot
    decisions together).
    """
    import glob as _glob

    from .errors import ConfigError

    cfg = cfg or PipelineConfig()
    paths = []
    for d in snapshot_dirs:
        fs = sorted(_glob.glob(os.path.join(d, "triples", "part-*", "*.parquet")))
        if not fs:
            raise ConfigError(
                f"merge_kg_snapshots: no checkpointed triples under {d}"
            )
        paths.extend(fs)
    return build_graph_from_triples(paths, alias_path, out_dir, cfg, store=None)
