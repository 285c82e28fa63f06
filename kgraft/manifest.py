"""Stage 11: per-partition checkpoint manifest — resumable runs.

The expensive, embarrassingly-parallel prefix of the pipeline (html ->
text -> segments -> triples) is checkpointed per *partition* (``part_id
= stable_hash(url) % n_partitions``) WITHOUT a shuffle: each extract
task splits its output block by partition and writes one atomically-
renamed parquet FRAGMENT per (task, partition), plus the same split of
the vocabulary-scale derived outputs the graph stage consumes
(contracted component edges, partial mention counts, pending rows).
The driver then commits one manifest JSON per partition recording
lineage (fragment list, row counts, content hash, unresolved surfaces,
run id) — the manifest is the atomic commit point; fragment files not
listed in a manifest are ignored and cleaned up.

Co-locating each partition in one file would need an all-to-all
exchange of the full triple corpus — the single widest shuffle of the
old design — while buying nothing: the exchange is itself a barrier, so
crash granularity is identical either way. At 10^12 documents the
fragment layout is the difference between a corpus-wide shuffle and
zero shuffles in the flagship DAG. On restart, partitions already
present in the manifest are filtered out of the read — pages for done
partitions never leave the scan. The reference has no checkpointing
(SURVEY.md §4); this is required by the north rule ("resumable from
checkpoint with per-partition lineage + metrics").

Layout::

    out_dir/
      triples/part-00000/frag-<id>.parquet   # checkpointed stage output
      _derived/comps-part-00000/frag-<id>.parquet   # contracted CC edges
      _derived/canon-part-00000/frag-<id>.parquet   # partial mention counts
      _derived/pending-part-00000/frag-<id>.parquet # unresolved-endpoint rows
      _manifest/part-00000.json       # lineage + metrics, written last
      nodes/...  edges/...            # final graph tables
      run_metrics.json
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import hash_strings, splitmix64

DERIVED_KINDS = ("comps", "canon", "pending")

COMPS_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
CANON_SCHEMA = pa.schema(
    [
        ("entity_id", pa.int64()),
        ("surface", pa.string()),
        ("partial_count", pa.int64()),
    ]
)
# layout v2: one derived file per (task, kind) carrying part_id, so a
# resumed run filters rows instead of opening 16x more files
COMPS_SCHEMA_V2 = COMPS_SCHEMA.append(pa.field("part_id", pa.int64()))
CANON_SCHEMA_V2 = CANON_SCHEMA.append(pa.field("part_id", pa.int64()))


def partition_ids(urls, n_partitions: int):
    """Stable partition assignment for url arrays (fixed hash, versioned)."""
    return (hash_strings(urls, seed=7) % np.uint64(n_partitions)).astype("int64")


def _atomic_write(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def ipc_bytes(table: pa.Table) -> bytes:
    """Arrow IPC stream serialization (for shipping vocabulary-scale
    derived partials through the summary Dataset instead of re-opening
    thousands of fragment files on the driver)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def ipc_to_df(b: bytes) -> pd.DataFrame:
    return pa.ipc.open_stream(b).read_all().to_pandas()


class ManifestStore:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        self.triples_dir = os.path.join(out_dir, "triples")
        self.derived_dir = os.path.join(out_dir, "_derived")
        # final edge-table fragments, written by the SAME pass that
        # checkpoints triples (the rows are identical after a filter +
        # projection, so a separate corpus re-scan to produce them is
        # pure waste); recovery deltas land as a root-level delta file
        self.edges_dir = os.path.join(out_dir, "edges")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.triples_dir, exist_ok=True)
        os.makedirs(self.derived_dir, exist_ok=True)
        self._manifest_cache: list | None = None

    def check_run_config(self, config: dict) -> None:
        """Record the partitioning-relevant config on the first run and
        REFUSE a resume under a different one: completed-partition
        filtering keys on ``hash(url) % n_partitions`` (and the page
        filter), so resuming with a changed ``n_partitions`` or
        ``lang_filter`` would silently drop some pages and re-extract
        (duplicate) others against the old manifests (review r2)."""
        path = os.path.join(self.manifest_dir, "run_config.json")
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
            if prev != config:
                from .errors import ConfigError

                raise ConfigError(
                    f"resume under a different partitioning: checkpoint at "
                    f"{self.out_dir} was written with {prev}, this run uses "
                    f"{config}; restore those settings or use a fresh out_dir"
                )
            return
        # manifests already present but no recorded config: a checkpoint
        # from before this guard existed. Adopting the CURRENT config as
        # the baseline would silently accept one mismatched resume — the
        # exact corruption the guard exists to block — so refuse and make
        # the operator state the config explicitly (ADVICE r2).
        has_manifests = any(
            f.startswith("part-") and f.endswith(".json")
            for f in os.listdir(self.manifest_dir)
        )
        if has_manifests:
            from .errors import ConfigError

            raise ConfigError(
                f"checkpoint at {self.out_dir} predates run-config "
                "recording (manifests exist but no run_config.json); its "
                "original partitioning cannot be verified — re-run with a "
                "fresh out_dir, or write the original config to "
                f"{path} by hand to vouch for it"
            )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(config, f)
        os.replace(tmp, path)

    # ------------------------------------------------------------- reads

    def _manifests(self) -> list:
        # read-through cache: one run's read helpers hit this ~8 times,
        # each otherwise an O(partitions) serial listdir + JSON parse on
        # the driver; commit_manifests invalidates (review r2)
        if self._manifest_cache is None:
            out = []
            for f in sorted(os.listdir(self.manifest_dir)):
                if f.startswith("part-") and f.endswith(".json"):
                    with open(os.path.join(self.manifest_dir, f)) as fh:
                        out.append(json.load(fh))
            self._manifest_cache = out
        return self._manifest_cache

    def completed_partitions(self) -> set:
        done = set()
        for f in os.listdir(self.manifest_dir):
            if f.startswith("part-") and f.endswith(".json"):
                done.add(int(f[5:-5]))
        return done

    def partition_paths(self) -> list:
        """Checkpointed triple files, as listed by the manifests (the
        commit point) — unlisted stragglers from a crashed run are never
        read. Falls back to the legacy one-file-per-partition layout."""
        paths = []
        for m in self._manifests():
            pid = int(m["partition_id"])
            if "fragments" in m:
                pdir = os.path.join(self.triples_dir, f"part-{pid:05d}")
                paths.extend(os.path.join(pdir, fr) for fr in m["fragments"])
            else:  # legacy layout
                paths.append(
                    os.path.join(self.triples_dir, f"part-{pid:05d}.parquet")
                )
        return sorted(paths)

    def derived_disk_table(self, kind: str, parts: set) -> "pa.Table | None":
        """One Arrow table of a derived kind restricted to ``parts``
        (a resumed run's skipped partitions), handling both layouts:
        legacy files filter by FILE (per-partition dirs), v2 files carry
        ``part_id`` and filter by ROW. ``part_id`` never leaves here."""
        if not parts:
            return None
        import pyarrow.dataset as pads

        legacy, v2 = [], []
        for m in self._manifests():
            pid = int(m["partition_id"])
            if pid not in parts:
                continue
            if m.get("layout") == 2:
                ddir = os.path.join(self.derived_dir, kind)
                v2.extend(os.path.join(ddir, fr) for fr in m["fragments"])
            elif "fragments" in m:
                ddir = os.path.join(self.derived_dir, f"{kind}-part-{pid:05d}")
                legacy.extend(os.path.join(ddir, fr) for fr in m["fragments"])
            else:
                p = os.path.join(self.derived_dir, f"{kind}-part-{pid:05d}.parquet")
                if os.path.exists(p):
                    legacy.append(p)
        tabs = []
        if legacy:
            tabs.append(pads.dataset(sorted(set(legacy)), format="parquet").to_table())
        if v2:
            t = pads.dataset(sorted(set(v2)), format="parquet").to_table(
                filter=pads.field("part_id").isin(sorted(parts))
            )
            tabs.append(t.drop_columns(["part_id"]))
        if not tabs:
            return None
        return pa.concat_tables(tabs) if len(tabs) > 1 else tabs[0]

    def has_derived(self) -> bool:
        """True when every committed partition carries all three derived
        outputs (a checkpoint dir written by a pre-fusion engine version
        falls back to the corpus-scan graph path)."""
        manifests = self._manifests()
        if not manifests:
            return False
        for m in manifests:
            pid = int(m["partition_id"])
            if m.get("layout") == 2:
                for kind in DERIVED_KINDS:
                    ddir = os.path.join(self.derived_dir, kind)
                    for fr in m["fragments"]:
                        if not os.path.exists(os.path.join(ddir, fr)):
                            return False
            elif "fragments" in m:
                for kind in DERIVED_KINDS:
                    ddir = os.path.join(self.derived_dir, f"{kind}-part-{pid:05d}")
                    for fr in m["fragments"]:
                        if not os.path.exists(os.path.join(ddir, fr)):
                            return False
            else:
                for kind in DERIVED_KINDS:
                    if not os.path.exists(
                        os.path.join(self.derived_dir, f"{kind}-part-{pid:05d}.parquet")
                    ):
                        return False
        return True

    def has_edges(self) -> bool:
        """True when every committed partition's edge fragments exist —
        a checkpoint dir written by a pre-edges engine version falls back
        to the corpus-scan edges path."""
        manifests = self._manifests()
        if not manifests:
            return False
        for m in manifests:
            if "fragments" not in m:
                return False
            pid = int(m["partition_id"])
            edir = os.path.join(self.edges_dir, f"part-{pid:05d}")
            for fr in m["fragments"]:
                if not os.path.exists(os.path.join(edir, fr)):
                    return False
        return True

    def unresolved_from_manifests(self) -> list:
        """Union of the per-partition unresolved surfaces (lineage field)
        — lets a resumed run rebuild the global unknown set without
        rescanning any checkpoint data."""
        out: set = set()
        for m in self._manifests():
            out.update(m.get("unresolved_surfaces", []))
        return sorted(out)

    # ------------------------------------------------------------ writes

    def make_fragment_writer(self, run_id: str, alias_ref=None):
        """A ``map_batches`` writer: splits each output block by partition
        and writes one triple fragment + three derived fragments per
        (task, partition) — no shuffle. Returns one summary row per
        fragment; the driver folds those into per-partition manifests via
        :meth:`commit_manifests` (the atomic commit).

        With ``alias_ref`` (a ``ray.put`` alias->entity_id dict), surfaces
        are resolved against the exact tier in the same pass — fragments
        carry ``subj_id``/``obj_id``/``subj_norm``/``obj_norm`` and the
        summary carries each fragment's distinct unresolved surfaces.
        """
        triples_dir = self.triples_dir
        derived_dir = self.derived_dir

        def write_fragments(g: pd.DataFrame) -> pd.DataFrame:
            g = g.reset_index(drop=True)  # positional index == content-hash rows
            if alias_ref is not None:
                from .link.candidates import _cached_lut, _norm_series

                lut = _cached_lut(alias_ref)
                g["subj_norm"] = _norm_series(g["subj"])
                g["obj_norm"] = _norm_series(g["obj"])
                g["subj_id"] = g["subj_norm"].map(lut).fillna(-1).astype("int64")
                g["obj_id"] = g["obj_norm"].map(lut).fillna(-1).astype("int64")

            cols = [
                "part_id", "fragment", "n_triples", "n_edges", "n_urls",
                "n_predicates", "content_hash", "url_sample", "unresolved",
                "bytes_written", "comps_blob", "canon_blob", "pending_blob",
            ]
            if len(g) == 0:
                return pd.DataFrame(
                    {
                        "part_id": pd.Series([], dtype="int64"),
                        "fragment": pd.Series([], dtype="object"),
                        "n_triples": pd.Series([], dtype="int64"),
                        "n_edges": pd.Series([], dtype="int64"),
                        "n_urls": pd.Series([], dtype="int64"),
                        "n_predicates": pd.Series([], dtype="int64"),
                        "content_hash": pd.Series([], dtype="uint64"),
                        "url_sample": pd.Series([], dtype="object"),
                        "unresolved": pd.Series([], dtype="object"),
                        "bytes_written": pd.Series([], dtype="int64"),
                        "comps_blob": pd.Series([], dtype="object"),
                        "canon_blob": pd.Series([], dtype="object"),
                        "pending_blob": pd.Series([], dtype="object"),
                    }
                )
            frag = f"frag-{uuid.uuid4().hex[:12]}.parquet"
            out_rows = []

            # ---- once-per-task work (was once-per-partition-slice: the
            # 16x repetition of groupbys/hashing/derived writes made the
            # writer cost rival the extractor's) ----
            comps = canon = pending = None
            pend_unresolved: dict = {}
            if alias_ref is not None:
                both = g[(g["subj_id"] >= 0) & (g["obj_id"] >= 0)]
                comps = both[["subj_id", "obj_id", "part_id"]].drop_duplicates()
                comps.columns = ["src", "dst", "part_id"]
                sm = g.loc[g["subj_id"] >= 0, ["subj_id", "subj_norm", "part_id"]]
                sm.columns = ["entity_id", "surface", "part_id"]
                om = g.loc[g["obj_id"] >= 0, ["obj_id", "obj_norm", "part_id"]]
                om.columns = ["entity_id", "surface", "part_id"]
                canon = (
                    pd.concat([sm, om], ignore_index=True)
                    .groupby(["part_id", "entity_id", "surface"], as_index=False)
                    .size()
                    .rename(columns={"size": "partial_count"})
                )
                pending = g[(g["subj_id"] < 0) | (g["obj_id"] < 0)]
                # per-partition unresolved surfaces (manifest lineage)
                for pid, pp in pending.groupby("part_id"):
                    pend_unresolved[int(pid)] = sorted(
                        set(pp.loc[pp["subj_id"] < 0, "subj_norm"])
                        | set(pp.loc[pp["obj_id"] < 0, "obj_norm"])
                    )
                # ONE derived file per kind per task (layout v2), carrying
                # part_id so a resumed run can filter to its disk
                # partitions; blobs below are what a fresh run consumes
                # explicit schema from the (non-empty) parent block: an
                # all-resolved task's EMPTY pending slice would otherwise
                # infer null-typed string columns, and the mixed schemas
                # break both the graph-stage concat and the resumed
                # derived-disk scan (review r2)
                pending_t = pa.Table.from_pandas(
                    pending,
                    schema=pa.Schema.from_pandas(g, preserve_index=False),
                    preserve_index=False,
                )
                for kind, df, schema in (
                    ("comps", comps, COMPS_SCHEMA_V2),
                    ("canon", canon[["entity_id", "surface", "partial_count", "part_id"]], CANON_SCHEMA_V2),
                ):
                    ddir = os.path.join(derived_dir, kind)
                    os.makedirs(ddir, exist_ok=True)
                    _atomic_write(
                        pa.Table.from_pandas(df, schema=schema, preserve_index=False),
                        os.path.join(ddir, frag),
                    )
                ddir = os.path.join(derived_dir, "pending")
                os.makedirs(ddir, exist_ok=True)
                _atomic_write(pending_t, os.path.join(ddir, frag))

            # vectorized content hash over the WHOLE block (order-
            # independent XOR-reduce per partition, so fragment
            # composition order cannot change the partition hash)
            data_cols = [c for c in g.columns if c != "part_id"]
            content = np.zeros(len(g), dtype=np.uint64)
            for ci, c in enumerate(data_cols):
                h = pd.util.hash_pandas_object(g[c], index=False).to_numpy(
                    dtype=np.uint64
                )
                content ^= splitmix64(h ^ np.uint64(ci + 1))

            for part_id, part in g.groupby("part_id", sort=True):
                part_id = int(part_id)
                idx = part.index.to_numpy()
                part = part.drop(columns=["part_id"])
                pdir = os.path.join(triples_dir, f"part-{part_id:05d}")
                os.makedirs(pdir, exist_ok=True)
                part_table = pa.Table.from_pandas(part, preserve_index=False)
                _atomic_write(part_table, os.path.join(pdir, frag))

                n_edges = 0
                if alias_ref is not None:
                    # final edge rows fall out of the same in-memory pass:
                    # filter to both-resolved, project. Writing them here
                    # removes the graph stage's whole-corpus edges re-scan.
                    edges = part.loc[
                        (part["subj_id"] >= 0) & (part["obj_id"] >= 0),
                        ["subj_id", "pred", "obj_id", "conf", "url", "warc_ts"],
                    ]
                    n_edges = int(len(edges))
                    edir = os.path.join(self.edges_dir, f"part-{part_id:05d}")
                    os.makedirs(edir, exist_ok=True)
                    _atomic_write(
                        pa.Table.from_pandas(
                            edges,
                            schema=pa.schema(
                                [
                                    (n, part_table.schema.field(n).type)
                                    for n in edges.columns
                                ]
                            ),
                            preserve_index=False,
                        ),
                        os.path.join(edir, frag),
                    )

                out_rows.append(
                    {
                        "part_id": part_id,
                        "fragment": frag,
                        "n_triples": int(len(part)),
                        "n_edges": n_edges,
                        "n_urls": int(part["url"].nunique()),
                        "n_predicates": int(part["pred"].nunique()),
                        "content_hash": int(
                            np.bitwise_xor.reduce(content[idx])
                        )
                        if len(idx)
                        else 0,
                        # JSON strings, not list cells: an empty block
                        # must present the same primitive schema
                        "url_sample": json.dumps(
                            sorted(part["url"].unique().tolist())[:8]
                        ),
                        "unresolved": json.dumps(
                            pend_unresolved.get(part_id, [])
                        ),
                        "bytes_written": int(
                            os.path.getsize(os.path.join(pdir, frag))
                        ),
                        "comps_blob": None,
                        "canon_blob": None,
                        "pending_blob": None,
                    }
                )
            # ONE pre-reduced derived blob per kind per TASK: what a fresh
            # run's graph reduction consumes (the v2 disk files above are
            # only for a resumed run's skipped partitions)
            if alias_ref is not None and out_rows:
                out_rows[0]["comps_blob"] = ipc_bytes(
                    pa.Table.from_pandas(
                        comps[["src", "dst"]].drop_duplicates(),
                        schema=COMPS_SCHEMA,
                        preserve_index=False,
                    )
                )
                out_rows[0]["canon_blob"] = ipc_bytes(
                    pa.Table.from_pandas(
                        canon.groupby(["entity_id", "surface"], as_index=False)[
                            "partial_count"
                        ].sum(),
                        schema=CANON_SCHEMA,
                        preserve_index=False,
                    )
                )
                out_rows[0]["pending_blob"] = ipc_bytes(
                    pending_t.drop_columns(["part_id"])
                )
            return pd.DataFrame(out_rows, columns=cols)

        return write_fragments

    def commit_manifests(self, summary: pd.DataFrame, run_id: str) -> int:
        """Fold fragment summary rows into one manifest per partition and
        write it (tmp + atomic rename) — the commit point. Fragment files
        in a partition dir that the manifest does not list (strays from a
        crashed run) are deleted. Returns the number of partitions
        committed."""
        n = 0
        for part_id, rows in summary.groupby("part_id"):
            part_id = int(part_id)
            frags = sorted(rows["fragment"].tolist())
            unresolved = sorted(
                set().union(*(json.loads(u) for u in rows["unresolved"]))
            )
            url_sample = sorted(
                set().union(*(json.loads(u) for u in rows["url_sample"]))
            )[:100]
            content = 0
            for h in rows["content_hash"]:
                content ^= int(h)
            manifest = {
                "partition_id": part_id,
                "layout": 2,
                "fragments": frags,
                "input_refs": url_sample,
                "row_counts": {
                    "urls": int(rows["n_urls"].sum()),
                    "triples": int(rows["n_triples"].sum()),
                    "edges": int(rows["n_edges"].sum())
                    if "n_edges" in rows
                    else 0,
                },
                "metrics": {
                    "written_at": time.time(),
                    "n_fragments": len(frags),
                    "distinct_predicates": int(rows["n_predicates"].max()),
                    "bytes_written": int(rows["bytes_written"].sum()),
                },
                "content_hash": content,
                "unresolved_surfaces": unresolved,
                "completed_at_run": run_id,
            }
            # prune strays before committing, so a reader never sees a
            # committed manifest alongside unlisted files
            listed = set(frags)
            pdir = os.path.join(self.triples_dir, f"part-{part_id:05d}")
            if os.path.isdir(pdir):
                for f in os.listdir(pdir):
                    if f not in listed:
                        os.remove(os.path.join(pdir, f))
            edir = os.path.join(self.edges_dir, f"part-{part_id:05d}")
            if os.path.isdir(edir):
                for f in os.listdir(edir):
                    if f not in listed:
                        os.remove(os.path.join(edir, f))
            mpath = os.path.join(self.manifest_dir, f"part-{part_id:05d}.json")
            mtmp = mpath + ".tmp"
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
            os.replace(mtmp, mpath)
            n += 1
        # v2 derived dirs are shared across partitions — prune against the
        # union of EVERY committed manifest's fragment list (this run's
        # plus prior runs'), never a single partition's
        self._manifest_cache = None  # manifests just changed on disk
        all_listed = set(summary["fragment"])
        for m in self._manifests():
            all_listed.update(m.get("fragments", []))
        for kind in DERIVED_KINDS:
            ddir = os.path.join(self.derived_dir, kind)
            if os.path.isdir(ddir):
                for f in os.listdir(ddir):
                    if f not in all_listed:
                        os.remove(os.path.join(ddir, f))
        return n
