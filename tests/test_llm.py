"""The LLM seam: templating, JSON decode, dead-letter, retries, parity.

The reference drives extraction through a 3-role prompt + JSON-mode chat
(``gondar/modules/PubMedFlow.py:147-208``) and skips ``data == {}``
sections (``:243-246``); these tests pin our offline realization to that
contract and to the deterministic backend's output.
"""

import json

import pyarrow as pa
import pytest

from kgraft.models.llm import (
    FakeLLMClient,
    LLMTripleExtractor,
    TransientLLMError,
    build_messages,
)
from kgraft.models.triples import TripleExtractor


def _seg_batch(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "seg_idx": pa.array([r[1] for r in rows], pa.int32()),
            "seg_text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )


def test_messages_have_reference_shape():
    msgs = build_messages("Acme Labs has acquired Beta Group.")
    assert [m["role"] for m in msgs] == ["system", "user", "assistant"]
    assert "Acme Labs has acquired Beta Group." in msgs[1]["content"]
    assert "founded_by" in msgs[0]["content"]  # predicate inventory
    assert "Subject (Named Entity)" in msgs[0]["content"]


def test_fake_client_answers_json_envelope():
    c = FakeLLMClient()
    raw = c.complete(build_messages("Acme Labs has acquired Beta Group. Filler."))
    doc = json.loads(raw)
    assert doc["data"] == {"row1": ["Acme Labs", "acquired", "Beta Group"]}
    # no facts -> empty data object (the reference's R1 skip contract)
    empty = json.loads(c.complete(build_messages("Nothing to see here.")))
    assert empty["data"] == {}


def test_llm_extractor_matches_deterministic_backend():
    batch = _seg_batch(
        [
            ("u1", 0, "Zorvex Corp was founded by Mira Tal. Filler text here."),
            ("u1", 1, "Acme Labs has acquired Beta Group. Acme Labs competes with Gamma Inc."),
            ("u2", 0, "No facts in this one."),
        ]
    )
    det = TripleExtractor()(batch)
    llm = LLMTripleExtractor()(batch)
    assert llm["error"].null_count == len(llm)  # no dead letters
    key = lambda t: sorted(
        zip(
            t["url"].to_pylist(),
            t["seg_idx"].to_pylist(),
            t["subj"].to_pylist(),
            t["pred"].to_pylist(),
            t["obj"].to_pylist(),
        )
    )
    assert key(det) == key(llm)


def test_malformed_json_lands_in_dead_letter_not_crash():
    batch = _seg_batch(
        [
            ("u1", 0, "Zorvex Corp was founded by Mira Tal."),
            ("u1", 1, "@@GARBLE@@ Acme Labs has acquired Beta Group."),
        ]
    )
    out = LLMTripleExtractor()(batch)
    good = out.filter(pa.compute.is_null(out["error"]))
    bad = out.filter(pa.compute.is_valid(out["error"]))
    assert len(good) == 1 and good["subj"].to_pylist() == ["Zorvex Corp"]
    assert len(bad) == 1 and bad["seg_idx"].to_pylist() == [1]
    assert "JSONDecodeError" in bad["error"].to_pylist()[0]
    assert bad["subj"].null_count == 1  # fact columns null on dead letters


def test_transient_errors_retry_then_dead_letter():
    # 2 failures with max_retries=2 -> recovered, no dead letters
    ex = LLMTripleExtractor(
        client_factory=lambda: FakeLLMClient(fail_first=2), max_retries=2
    )
    out = ex(_seg_batch([("u", 0, "Zorvex Corp was founded by Mira Tal.")]))
    assert out["error"].null_count == len(out) and len(out) == 1
    # 3 failures exhaust max_retries=1 PER CALL -> dead letter, block lives
    ex2 = LLMTripleExtractor(
        client_factory=lambda: FakeLLMClient(fail_first=9), max_retries=1
    )
    out2 = ex2(_seg_batch([("u", 0, "Zorvex Corp was founded by Mira Tal.")]))
    assert len(out2) == 1 and "TransientLLMError" in out2["error"].to_pylist()[0]


def test_rate_limit_accounting():
    c = FakeLLMClient(tokens_per_min=10)
    c.complete(build_messages("Acme Labs has acquired Beta Group."))
    assert c.throttle_events >= 1  # budget tracked (a real client sleeps)


def test_pipeline_runs_with_llm_backend(ray_session, tmp_path):
    """Flagship pipeline with extractor_kind='llm' produces the same
    triples as the deterministic task backend."""
    import ray

    from kgraft.pipeline import PipelineConfig, run_kg_pipeline
    from kgraft.synth import corpus_dir
    import os

    d = corpus_dir(120)
    res = run_kg_pipeline(
        os.path.join(d, "pages.parquet"),
        os.path.join(d, "alias_dict.parquet"),
        str(tmp_path / "llm_out"),
        PipelineConfig(n_partitions=4, extractor_kind="llm"),
    )
    det = run_kg_pipeline(
        os.path.join(d, "pages.parquet"),
        os.path.join(d, "alias_dict.parquet"),
        str(tmp_path / "det_out"),
        PipelineConfig(n_partitions=4),
    )
    assert res["triples_written"] == det["triples_written"] > 0
    assert res["n_edges"] == det["n_edges"]


def test_non_dict_data_is_dead_lettered_not_fatal():
    """A real client may answer data as a LIST or null — that must be a
    dead-letter row, never an AttributeError killing the block (review r2)."""

    class ListDataClient:
        def complete(self, messages):
            return '{"headers": ["s","p","o"], "data": [["a","b","c"]]}'

    ex = LLMTripleExtractor(client_factory=ListDataClient)
    out = ex(_seg_batch([("u", 0, "Zorvex Corp was founded by Mira Tal.")]))
    assert len(out) == 1
    err = out["error"].to_pylist()[0]
    assert err is not None and "TypeError" in err
