"""Typed error model: construction-time config validation, operator plan
errors, and catchability via both the hierarchy and the builtin type."""

import pytest

from kgraft.errors import ConfigError, KgraftError, PlanError, SchemaError


def test_config_validation_fails_fast():
    from kgraft.pipeline import PipelineConfig

    PipelineConfig()  # defaults valid
    for bad in (
        dict(n_partitions=0),
        dict(extractor_kind="gpu"),
        dict(components_method="magic"),
        dict(link_threshold=1.5),
        dict(max_errored_blocks=-1),
    ):
        with pytest.raises(ConfigError):
            PipelineConfig(**bad)
    # the hierarchy is additive: callers catching ValueError still work
    with pytest.raises(ValueError):
        PipelineConfig(n_partitions=-3)


def test_plan_and_schema_errors(ray_session):
    import ray
    import pandas as pd

    from kgraft.relational import hash_join, pre_aggregate_ds

    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}))
    right = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "w": [3.0, 4.0]}))
    with pytest.raises(PlanError):
        hash_join(left, right, on="k", how="cross")
    with pytest.raises(SchemaError):
        hash_join(left, left, on="k")  # 'v' ambiguous on both sides
    with pytest.raises(PlanError):
        pre_aggregate_ds(left, "k", {"x": ("v", "median")})


def test_error_str_carries_kind_and_timestamp():
    e = ConfigError("boom")
    assert isinstance(e, KgraftError)
    s = str(e)
    assert "config: boom" in s and s.startswith("[")
