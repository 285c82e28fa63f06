"""Small shared runtime helpers (no ray.init here)."""

from __future__ import annotations

import ray


def pool_concurrency(max_actors: int | None = None) -> tuple:
    """Autoscaling actor-pool bounds ``(1, min(cluster CPUs, cap))``.

    min=1: a fixed-size pool plus a downstream shuffle can reserve every
    CPU and deadlock small hosts (observed at num_cpus=8 in round 1), so
    pools must always be able to shrink to one actor. max=cluster CPUs:
    a hard (1, 4) cap leaves 28 of 32 CPUs idle on the stateful stage
    that dominates the query (measured: kg_mentions 19.9s with 4 actors
    on a 32-CPU host whose task-mode twin scans the same corpus in ~6s).
    On a multi-node cluster the same bound scales the pool to the
    cluster, which is what the north rule's LLM-inference pools need.
    """
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    hi = cpus if max_actors is None else min(cpus, max_actors)
    return (1, max(2, hi))
