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
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.triples_dir, exist_ok=True)

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

    def make_writer(self, run_id: str):
        """A ``map_groups`` writer fn: one group = one partition's triples.

        Writes data first (tmp + atomic rename), manifest last, so a crash
        between the two leaves the partition *incomplete* and it re-runs.
        """
        triples_dir = self.triples_dir
        manifest_dir = self.manifest_dir

        def write_partition(g: pd.DataFrame) -> pd.DataFrame:
            t_start = time.time()
            part_id = int(g["part_id"].iloc[0])
            g = g.drop(columns=["part_id"]).sort_values(
                ["url", "seg_idx", "subj", "pred", "obj"]
            )
            data_path = os.path.join(triples_dir, f"part-{part_id:05d}.parquet")
            tmp = data_path + ".tmp"
            table = pa.Table.from_pandas(g, preserve_index=False)
            pq.write_table(table, tmp)
            os.replace(tmp, data_path)

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
