"""Session fixtures: one Ray runtime per pytest session (driver contract:
`python -m pytest -x -q` must pass with Ray initialised exactly once)."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# before numpy loads; Ray workers inherit via the raylet (see bench.py)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

N_PAGES = 120  # small but big enough for dups, skew, held-out aliases
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus():
    """Synthetic corpus dir (pure Python — no Ray needed to generate)."""
    from kgraft.synth import corpus_dir

    return corpus_dir(N_PAGES)


@pytest.fixture(scope="session")
def kg_run(ray_session, corpus):
    """One full flagship-pipeline run shared by the e2e assertions."""
    from kgraft.pipeline import PipelineConfig, run_kg_pipeline

    out = f"/tmp/kgraft_test_out/n{N_PAGES}"
    shutil.rmtree(out, ignore_errors=True)
    res = run_kg_pipeline(
        os.path.join(corpus, "pages.parquet"),
        os.path.join(corpus, "alias_dict.parquet"),
        out,
        PipelineConfig(),
    )
    res["out_dir"] = out
    return res
