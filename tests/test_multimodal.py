"""Multimodal plumbing: binary payload column -> typed feature rows."""

import os

import pyarrow as pa
import pytest

from kgraft.multimodal import ImageFeatureExtractor, extract_image_features


def test_fake_decode_deterministic_schema(corpus, ray_session):
    import ray

    pages = ray.data.read_parquet(
        os.path.join(corpus, "pages.parquet"), columns=["url", "html"]
    )
    out = extract_image_features(pages).to_pandas()
    assert list(out.columns) == ["url", "width", "height", "feature"]
    assert out["feature"].map(len).eq(ImageFeatureExtractor.FEATURE_DIM).all()
    out2 = extract_image_features(
        ray.data.read_parquet(
            os.path.join(corpus, "pages.parquet"), columns=["url", "html"]
        )
    ).to_pandas()
    a = out.sort_values("url").reset_index(drop=True)
    b = out2.sort_values("url").reset_index(drop=True)
    assert a["feature"].map(tuple).equals(b["feature"].map(tuple))


def test_real_backend_is_gated():
    with pytest.raises((NotImplementedError,)):
        ImageFeatureExtractor(backend="pil")
    with pytest.raises(ValueError):
        ImageFeatureExtractor(backend="nope")
