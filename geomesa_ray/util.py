"""Small shared helpers."""

from __future__ import annotations


def default_concurrency(cap: int = 16) -> tuple[int, int]:
    """Autoscaling actor-pool size ``(1, n)`` that can never starve the
    upstream read/write stages: scales up to cluster CPUs - 1, capped.

    A fixed-size pool equal to the CPU count deadlocks a small cluster (the
    pool reserves every slot and the producing stage can't run); autoscaling
    from 1 always leaves the pipeline live.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return (1, max(2, min(cap, cpus - 1)))


def ts_to_millis(col):
    """Arrow timestamp/integer column -> epoch-millis int64 numpy array.
    Casts through microseconds (a direct us->ms Arrow cast raises on sub-ms
    precision)."""
    import numpy as np
    import pyarrow as pa

    if pa.types.is_timestamp(col.type):
        return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False) // 1000
    return col.to_numpy(zero_copy_only=False).astype(np.int64)
