"""Stage 11: per-partition checkpoint manifest — resumable runs.

The expensive, embarrassingly-parallel prefix of the pipeline (html ->
text -> segments -> triples) is checkpointed per *partition* (``part_id
= stable_hash(url) % n_partitions``): each partition's triples land in
one atomically-renamed parquet file plus a manifest JSON recording
lineage (partition id, url count, row counts per stage, content hash,
run id). On restart, partitions already present in the manifest are
filtered out of the read — pages for done partitions never leave the
scan. The reference has no checkpointing (SURVEY.md §4); this is
required by the north rule ("resumable from checkpoint with
per-partition lineage + metrics").

Layout::

    out_dir/
      triples/part-00000.parquet      # checkpointed stage output
      _manifest/part-00000.json       # lineage + metrics, written last
      nodes/...  edges/...            # final graph tables
      run_metrics.json
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import hash_strings, splitmix64


def partition_ids(urls, n_partitions: int):
    """Stable partition assignment for url arrays (fixed hash, versioned)."""
    return (hash_strings(urls, seed=7) % np.uint64(n_partitions)).astype("int64")


class ManifestStore:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        self.triples_dir = os.path.join(out_dir, "triples")
        self.derived_dir = os.path.join(out_dir, "_derived")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.triples_dir, exist_ok=True)
        os.makedirs(self.derived_dir, exist_ok=True)

    def completed_partitions(self) -> set:
        done = set()
        for f in os.listdir(self.manifest_dir):
            if f.startswith("part-") and f.endswith(".json"):
                done.add(int(f[5:-5]))
        return done

    def partition_paths(self) -> list:
        return [
            os.path.join(self.triples_dir, f)
            for f in sorted(os.listdir(self.triples_dir))
            if f.endswith(".parquet")
        ]

    def derived_paths(self, kind: str) -> list:
        """Per-partition derived side files (``comps``/``canon``/``pending``)
        written alongside each checkpoint — vocabulary-scale reductions the
        graph stage consumes instead of rescanning the triple corpus."""
        return [
            os.path.join(self.derived_dir, f)
            for f in sorted(os.listdir(self.derived_dir))
            if f.startswith(f"{kind}-part-") and f.endswith(".parquet")
        ]

    def has_derived(self) -> bool:
        """True when every completed partition carries all three derived
        files (a checkpoint dir written by a pre-fusion engine version
        falls back to the corpus-scan graph path)."""
        done = self.completed_partitions()
        if not done:
            return False
        for kind in ("comps", "canon", "pending"):
            have = {
                int(f.split("-part-")[1][:-8])
                for f in os.listdir(self.derived_dir)
                if f.startswith(f"{kind}-part-")
            }
            if not done <= have:
                return False
        return True

    def unresolved_from_manifests(self) -> list:
        """Union of the per-partition unresolved surfaces (lineage field)
        — lets a resumed run rebuild the global unknown set without
        rescanning any checkpoint data."""
        out: set = set()
        for f in os.listdir(self.manifest_dir):
            if f.startswith("part-") and f.endswith(".json"):
                with open(os.path.join(self.manifest_dir, f)) as fh:
                    out.update(json.load(fh).get("unresolved_surfaces", []))
        return sorted(out)

    def make_writer(self, run_id: str, alias_ref=None):
        """A ``map_groups`` writer fn: one group = one partition's triples.

        Writes data first (tmp + atomic rename), manifest last, so a crash
        between the two leaves the partition *incomplete* and it re-runs.

        With ``alias_ref`` (a ``ray.put`` alias->entity_id dict), the
        writer ALSO resolves surfaces against the exact tier — checkpoints
        then carry ``subj_id``/``obj_id``/``subj_norm``/``obj_norm`` and
        the manifest records the partition's distinct unresolved surfaces,
        so the graph stage never re-normalizes or rescans for unknowns.
        """
        triples_dir = self.triples_dir
        manifest_dir = self.manifest_dir
        derived_dir = self.derived_dir

        def write_partition(g: pd.DataFrame) -> pd.DataFrame:
            t_start = time.time()
            part_id = int(g["part_id"].iloc[0])
            g = g.drop(columns=["part_id"]).sort_values(
                ["url", "seg_idx", "subj", "pred", "obj"]
            )
            unresolved: list = []
            if alias_ref is not None:
                from .link.candidates import _cached_lut, _norm_series

                lut = _cached_lut(alias_ref)
                g = g.reset_index(drop=True)
                g["subj_norm"] = _norm_series(g["subj"])
                g["obj_norm"] = _norm_series(g["obj"])
                g["subj_id"] = g["subj_norm"].map(lut).fillna(-1).astype("int64")
                g["obj_id"] = g["obj_norm"].map(lut).fillna(-1).astype("int64")
                unresolved = sorted(
                    set(g.loc[g["subj_id"] < 0, "subj_norm"])
                    | set(g.loc[g["obj_id"] < 0, "obj_norm"])
                )
            data_path = os.path.join(triples_dir, f"part-{part_id:05d}.parquet")
            tmp = data_path + ".tmp"
            table = pa.Table.from_pandas(g, preserve_index=False)
            pq.write_table(table, tmp)
            os.replace(tmp, data_path)

            if alias_ref is not None:
                # fused derived side outputs (all vocabulary-scale): the
                # graph stage consumes these instead of rescanning the
                # triple corpus — (a) locally-contracted component edges,
                # (b) partial (entity, surface) mention counts, (c) the
                # rows with an unresolved endpoint ("pending"), which the
                # LSH recovery pass patches later. Written BEFORE the
                # manifest: the manifest stays the atomic commit point.
                from .graph.components import _UnionFind

                both = g[(g["subj_id"] >= 0) & (g["obj_id"] >= 0)]
                pairs = both[["subj_id", "obj_id"]].drop_duplicates()
                uf = _UnionFind()
                for a, b in zip(pairs["subj_id"].to_numpy(), pairs["obj_id"].to_numpy()):
                    uf.union(int(a), int(b))
                nodes_seen = sorted(
                    set(pairs["subj_id"]) | set(pairs["obj_id"])
                )
                comp_df = pd.DataFrame(
                    {
                        "src": np.array(
                            [uf.find(n) for n in nodes_seen], dtype=np.int64
                        ),
                        "dst": np.array(nodes_seen, dtype=np.int64),
                    }
                )
                subj_m = g.loc[g["subj_id"] >= 0, ["subj_id", "subj_norm"]]
                subj_m.columns = ["entity_id", "surface"]
                obj_m = g.loc[g["obj_id"] >= 0, ["obj_id", "obj_norm"]]
                obj_m.columns = ["entity_id", "surface"]
                canon_df = (
                    pd.concat([subj_m, obj_m], ignore_index=True)
                    .groupby(["entity_id", "surface"], as_index=False)
                    .size()
                    .rename(columns={"size": "partial_count"})
                )
                pending_df = g[(g["subj_id"] < 0) | (g["obj_id"] < 0)]
                for kind, df in (
                    ("comps", comp_df),
                    ("canon", canon_df),
                    ("pending", pending_df),
                ):
                    dpath = os.path.join(
                        derived_dir, f"{kind}-part-{part_id:05d}.parquet"
                    )
                    dtmp = dpath + ".tmp"
                    pq.write_table(
                        pa.Table.from_pandas(df, preserve_index=False), dtmp
                    )
                    os.replace(dtmp, dpath)

            # vectorized content hash (C speed — a per-row Python join here
            # costs seconds per partition at bench scale): hash each column,
            # mix with a rotation so column order matters, XOR-reduce rows
            content = np.zeros(len(g), dtype=np.uint64)
            for ci, c in enumerate(g.columns):
                h = pd.util.hash_pandas_object(g[c], index=False).to_numpy(
                    dtype=np.uint64
                )
                content ^= splitmix64(h ^ np.uint64(ci + 1))
            manifest = {
                "partition_id": part_id,
                "input_refs": sorted(g["url"].unique().tolist())[:100],
                "row_counts": {
                    "urls": int(g["url"].nunique()),
                    "triples": int(len(g)),
                },
                "metrics": {
                    "written_at": time.time(),
                    "write_sec": round(time.time() - t_start, 4),
                    "triples_per_url": round(
                        float(len(g)) / max(int(g["url"].nunique()), 1), 4
                    ),
                    "distinct_predicates": int(g["pred"].nunique()),
                    "bytes_written": int(os.path.getsize(data_path)),
                },
                "content_hash": int(np.bitwise_xor.reduce(content)) if len(content) else 0,
                "unresolved_surfaces": unresolved,
                "completed_at_run": run_id,
            }
            mpath = os.path.join(manifest_dir, f"part-{part_id:05d}.json")
            mtmp = mpath + ".tmp"
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
            os.replace(mtmp, mpath)
            return pd.DataFrame(
                {"part_id": [part_id], "n_triples": [len(g)]}
            )

        return write_partition
