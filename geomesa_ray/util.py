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


def tree_topk(partials, sort_cols, ascending, k, group_col="query_id",
              levels=((65536, 0.5), (1 << 22, 0.51))):
    """Per-group top-k merge of bounded partial rows WITHOUT an all-to-all.

    The natural ``groupby(group_col).map_groups(topk)`` merge is a
    sort-based shuffle operator that costs ~2.5 s of FIXED barrier overhead
    per query at any scale (measured round 3 on the density merge) and
    funnels rows through per-group reducers. Partial top-k rows are tiny
    and the merge is associative, so instead: map_batches with batch_size=N
    coalesces N partial ROWS per task (a streaming rebundle, not a
    shuffle), keeping per-group top-k at each level. The final level's
    large batch_size bundles the whole remainder into ONE task — guaranteed
    single-bundle while the prior level emits <= 4M rows (= 4M/(q*k)
    coalesced bundles; astronomically large input at typical q*k). Each
    level carries a DISTINCT fractional num_cpus: Ray fuses map operators
    with identical resource requests, and a fused chain would rebundle the
    upstream point batches instead of the partial rows."""
    import pandas as pd  # noqa: F401 (batch_format="pandas")

    def level(df):
        return (df.sort_values([group_col, *sort_cols],
                               ascending=[True, *ascending], kind="mergesort")
                  .groupby(group_col, sort=False).head(k))

    out = partials
    for batch_rows, cpu in levels:
        out = out.map_batches(level, batch_format="pandas",
                              batch_size=batch_rows, num_cpus=cpu)
    return out


def tree_sketch_reduce(partials, merge_blobs, col="sketch",
                       levels=((64, 0.5), (64, 0.51), (4096, 0.52))):
    """Map-coalesced tree reduce of one-row binary-sketch blocks: returns a
    Dataset with (normally) ONE row whose ``col`` is the fully-merged blob.

    Same pattern as the density merge (stages/density.py merge_level): a
    driver-side ``iter_batches`` sum throttles the whole streaming pipeline
    to driver-consumption speed (measured 185 s vs 21 s at 48M docs), and a
    single-group groupby costs ~2.5 s fixed all-to-all barrier. map_batches
    with batch_size=N instead coalesces N sketch ROWS per task (streaming
    rebundle, no shuffle); 64 x 64 x 4096 covers ~16.7M input blocks (a
    100 TB run at 128 MB blocks is ~1M). Each level carries a DISTINCT
    fractional num_cpus: Ray fuses map operators with identical resource
    requests, and a fused chain would rebundle the upstream data batches
    instead of the sketch rows. Callers should still merge the take_all()
    rows (normally exactly one) for the beyond-capacity tail."""
    import pyarrow as pa

    def merge_level(t: pa.Table) -> pa.Table:
        blob = merge_blobs(t.column(col).to_pylist())
        return pa.table({col: pa.array([blob], type=pa.binary())})

    lvl = partials
    for batch_rows, cpu in levels:
        lvl = lvl.map_batches(merge_level, batch_format="pyarrow",
                              batch_size=batch_rows, num_cpus=cpu)
    return lvl


def holder_fn(cls, **kwargs):
    """Per-worker lazily-initialized stage callable for map_batches — task
    scheduling with init-once-per-worker-process state. Prefer this over an
    actor-pool class when the state is cheap to build (broadcast ray.get,
    compiled regexes, small grids): Ray fuses a class stage with heavy
    upstream map chains into an ACTOR op whose autoscaling lag serializes
    the read side (measured ~2x wall / ~20x fused per-batch UDF time on the
    partition-assign and kNN stages, round 3). Keep a real actor pool only
    for genuinely expensive one-time state (big indexes, models)."""
    h: dict = {}

    def fn(batch):
        if "s" not in h:
            h["s"] = cls(**kwargs)
        return h["s"](batch)

    fn.__name__ = f"{getattr(cls, '__name__', 'stage').lstrip('_')}_fn"
    return fn
