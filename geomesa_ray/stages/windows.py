"""Event-stream windowing + track analytics over a batch log.

Ray Data has no event-time watermarks; the reference's streaming layer
(geomesa-kafka) keeps only per-key last-write-wins state (SURVEY §2.10).
Stream-shaped semantics are expressed over the ordered, partitioned log:
partition by key, sort within the group, window with pandas.

- ``tumbling_window``  : fixed-size buckets (floor(ts / size)) — one shuffle
                         on (key, window) via pre-bucketed groupby.
- ``session_windows``  : gap-based sessions per key (gaps-and-islands).
- ``latest_per_key``   : TrackLabelProcess (reference geomesa-process/.../
                         analytic/TrackLabelProcess.scala): argmax(ts) row
                         per key — the Kafka cache's last-write-wins view.
- ``track_lines``      : Point2PointProcess (.../Point2PointProcess.scala):
                         per-key time-sorted points -> LineString WKT.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ts_millis(col) -> np.ndarray:
    from geomesa_ray.util import ts_to_millis

    return ts_to_millis(col)


def tumbling_window(ds, key_col: str, ts_col: str, window_ms: int, agg_col: str):
    """(key, window) -> count + sum(agg_col); the window id is the bucket
    start in epoch ms. Pre-bucketing happens vectorized per batch; the
    groupby is the only shuffle."""
    from ray.data.aggregate import Count, Sum

    def bucket(t: pa.Table) -> pa.Table:
        ms = _ts_millis(t.column(ts_col))
        win = (ms // window_ms) * window_ms
        return pa.table({
            key_col: t.column(key_col),
            "window_start": pa.array(win),
            agg_col: t.column(agg_col),
        })

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Count(alias_name="n"), Sum(agg_col, alias_name=f"sum_{agg_col}"))
    )


def session_windows(ds, key_col: str, ts_col: str, gap_ms: int):
    """Per-key sessions: a new session starts when the gap to the previous
    event exceeds gap_ms. Returns (key, session_start, session_end, n)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__ms")
        ms = g["__ms"].to_numpy()
        new = np.concatenate([[True], np.diff(ms) > gap_ms])
        sid = np.cumsum(new) - 1
        out = (
            pd.DataFrame({"sid": sid, "ms": ms})
            .groupby("sid")["ms"]
            .agg(session_start="min", session_end="max", n="count")
            .reset_index(drop=True)
        )
        out[key_col] = g[key_col].iloc[0]
        return out[[key_col, "session_start", "session_end", "n"]]

    def add_ms(t: pa.Table) -> pa.Table:
        return pa.table({key_col: t.column(key_col), "__ms": pa.array(_ts_millis(t.column(ts_col)))})

    return ds.map_batches(add_ms, batch_format="pyarrow").groupby(key_col).map_groups(
        sessions, batch_format="pandas"
    )


def latest_per_key(ds, key_col: str, ts_col: str, tiebreak_col: str | None = None):
    """TrackLabel: the most recent row per key. Exact-timestamp ties resolve
    by ``tiebreak_col`` (max wins) when given — without it the winner among
    ties is block-order-dependent."""

    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_cols, kind="mergesort").tail(1)

    return ds.groupby(key_col).map_groups(latest, batch_format="pandas")


def track_lines(ds, key_col: str, ts_col: str, lon_col="lon", lat_col="lat", min_points: int = 2):
    """Point2Point: per-key time-ordered LineString WKT + point count."""

    def line(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        if len(g) < min_points:
            return pd.DataFrame({key_col: [], "wkt": [], "n_points": []})
        coords = ", ".join(f"{x} {y}" for x, y in zip(g[lon_col], g[lat_col]))
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "wkt": [f"LINESTRING ({coords})"],
            "n_points": [len(g)],
        })

    return ds.groupby(key_col).map_groups(line, batch_format="pandas")
