"""Stages 4-5: mention detection + triple extraction (deterministic backend)."""

import pyarrow as pa

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


def test_triple_extraction_basic():
    ex = TripleExtractor()
    out = ex(
        _seg_batch(
            [
                ("u1", 0, "Zorvex Corp was founded by Mira Tal. Filler text here."),
                ("u1", 1, "Acme Labs has acquired Beta Group. Acme Labs competes with Gamma Inc."),
                ("u2", 0, "No facts in this one."),
            ]
        )
    )
    rows = sorted(
        zip(
            out["url"].to_pylist(),
            out["seg_idx"].to_pylist(),
            out["subj"].to_pylist(),
            out["pred"].to_pylist(),
            out["obj"].to_pylist(),
        )
    )
    assert rows == [
        ("u1", 0, "Zorvex Corp", "founded_by", "Mira Tal"),
        ("u1", 1, "Acme Labs", "acquired", "Beta Group"),
        ("u1", 1, "Acme Labs", "competes_with", "Gamma Inc"),
    ]
    assert out.schema.field("conf").type == pa.float32()


def test_triple_extraction_empty_batch():
    ex = TripleExtractor()
    out = ex(_seg_batch([]))
    assert len(out) == 0 and "subj" in out.column_names


def test_mention_detector(ray_session):
    import ray

    from kgraft.models.ner import MentionDetector

    ref = ray.put({"zorvex corp": 0, "zorvex": 0, "acme labs": 1})
    det = MentionDetector(ref)
    out = det(
        _seg_batch([("u", 0, "Zorvex Corp met Acme Labs. zorvex smiled.")])
    )
    surfaces = out["surface"].to_pylist()
    assert surfaces == ["Zorvex Corp", "Acme Labs", "zorvex"]  # longest-first
    s, e = out["start"].to_pylist()[0], out["end"].to_pylist()[0]
    assert s == 0 and e == len("Zorvex Corp")
