"""Shared stage helpers."""

from __future__ import annotations

import ray


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size so the pool can never reserve every CPU —
    a fixed pool equal to the cluster CPU count starves the upstream read
    and write tasks and deadlocks the streaming executor."""
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    return max(1, min(requested, total - 2))
