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


def test_video_frame_sampler_explodes_deterministically(ray_session):
    import ray

    from kgraft.multimodal import sample_video_frames

    import pyarrow as pa

    payloads = [b"videobytes-%d" % i for i in range(20)]
    t = pa.table({"url": [f"u{i}" for i in range(20)], "html": pa.array(payloads, pa.binary())})
    out1 = sample_video_frames(ray.data.from_arrow(t), batch_size=7).to_pandas()
    out2 = sample_video_frames(ray.data.from_arrow(t), batch_size=3).to_pandas()
    # deterministic and batch-layout-invariant
    key = ["url", "frame_idx"]
    o1 = out1.sort_values(key).reset_index(drop=True)
    o2 = out2.sort_values(key).reset_index(drop=True)
    assert o1["frame_ts_ms"].tolist() == o2["frame_ts_ms"].tolist()
    assert o1["frame_feature"].apply(tuple).tolist() == o2["frame_feature"].apply(tuple).tolist()
    # explode shape: 1-8 frames per video, frame_ts = idx * 1000
    per = o1.groupby("url")["frame_idx"].max() + 1
    assert per.between(1, 8).all()
    assert (o1["frame_ts_ms"] == o1["frame_idx"] * 1000).all()


def test_audio_features_schema_and_determinism(ray_session):
    import ray

    import pyarrow as pa

    from kgraft.multimodal import extract_audio_features

    t = pa.table(
        {"url": ["a", "b"], "html": pa.array([b"x" * 40, b"y" * 33], pa.binary())}
    )
    out = extract_audio_features(ray.data.from_arrow(t), batch_size=1).to_pandas()
    assert set(out.columns) == {"url", "duration_ms", "n_channels", "audio_feature"}
    assert out["n_channels"].isin([1, 2]).all()
    assert out["audio_feature"].apply(len).eq(13).all()
    out2 = extract_audio_features(ray.data.from_arrow(t), batch_size=2).to_pandas()
    assert (
        out.sort_values("url")["audio_feature"].apply(tuple).tolist()
        == out2.sort_values("url")["audio_feature"].apply(tuple).tolist()
    )


def test_image_resizer_fixed_dims(ray_session):
    import ray

    import pyarrow as pa

    from kgraft.multimodal import resize_images

    t = pa.table({"url": ["a"], "html": pa.array([b"imgbytes"], pa.binary())})
    out = resize_images(ray.data.from_arrow(t), target_w=64, target_h=48).to_pandas()
    assert out.loc[0, "width"] == 64 and out.loc[0, "height"] == 48
    assert isinstance(out.loc[0, "payload"], bytes) and len(out.loc[0, "payload"]) >= 16


def test_backend_guard_auto_falls_back_to_fake():
    """In this sandbox (no PIL/av/soundfile) backend='auto' must resolve
    to the fake on every actor, and the fake path must actually run."""
    import pyarrow as pa

    from kgraft.multimodal import (
        AudioFeatureExtractor,
        ImageFeatureExtractor,
        ImageResizer,
        VideoFrameSampler,
    )

    for cls in (ImageFeatureExtractor, ImageResizer, VideoFrameSampler, AudioFeatureExtractor):
        actor = cls(backend="auto")
        assert actor.backend == "fake", cls.__name__
    t = pa.table({"url": ["a"], "html": pa.array([b"payload"], pa.binary())})
    out = ImageFeatureExtractor(backend="auto")(t)
    assert out.num_rows == 1 and len(out["feature"][0].as_py()) == 8


def test_backend_guard_explicit_real_raises_without_lib():
    """Asking for the real decoder without its library must raise (a
    silent fake would corrupt downstream features), with an install
    hint in the message."""
    import pytest

    from kgraft.multimodal import (
        AudioFeatureExtractor,
        ImageFeatureExtractor,
        ImageResizer,
        VideoFrameSampler,
    )

    for cls, real in (
        (ImageFeatureExtractor, "pil"),
        (ImageResizer, "pil"),
        (VideoFrameSampler, "av"),
        (AudioFeatureExtractor, "soundfile"),
    ):
        with pytest.raises(NotImplementedError, match="install"):
            cls(backend=real)


def test_backend_guard_resolution_logic():
    """resolve_backend picks the real backend when the module imports
    (proved with a stdlib module standing in for the decoder lib)."""
    import pytest

    from kgraft.multimodal import resolve_backend

    assert resolve_backend("auto", "pil", "json") == "pil"  # lib "present"
    assert resolve_backend("auto", "pil", "definitely_not_a_module") == "fake"
    assert resolve_backend("fake", "pil", "definitely_not_a_module") == "fake"
    assert resolve_backend("pil", "pil", "json") == "pil"
    with pytest.raises(NotImplementedError):
        resolve_backend("pil", "pil", "definitely_not_a_module")
