"""Binned time: epoch millis -> (bin: int16, offset: int64).

Parity target: GeoMesa ``BinnedTime`` (reference
geomesa-z3/.../curve/BinnedTime.scala:46-195):

  period  bin unit (since 1970-01-01 UTC)  offset unit   maxOffset
  day     days                             milliseconds  86_400_000
  week    weeks (floor days/7)             seconds       604_800
  month   calendar months                  seconds       31 * 86_400
  year    calendar years                   minutes       52 * 7 * 24 * 60

Offsets are measured from the start instant of the bin; month/year use real
calendar arithmetic (numpy datetime64[M]/[Y]), matching java.time
ChronoUnit.MONTHS/YEARS.between for UTC instants >= epoch.

Vectorized over numpy int64 epoch-millis arrays.
"""

from __future__ import annotations

import numpy as np

_DAY_MS = 86_400_000
_WEEK_MS = 7 * _DAY_MS

PERIODS = ("day", "week", "month", "year")


class BinnedTime:
    @staticmethod
    def max_offset(period: str) -> int:
        # BinnedTime.maxOffset (BinnedTime.scala:166-173)
        if period == "day":
            return _DAY_MS
        if period == "week":
            return _WEEK_MS // 1000
        if period == "month":
            return (_DAY_MS // 1000) * 31
        if period == "year":
            return 7 * 24 * 60 * 52  # minutes in 52 weeks
        raise ValueError(f"unknown period: {period}")

    @staticmethod
    def max_bin() -> int:
        return np.iinfo(np.int16).max

    @staticmethod
    def to_binned_time(epoch_millis, period: str):
        """epoch millis (int64 array-like, must be >= 0) ->
        (bin int16 array, offset int64 array)."""
        t = np.asarray(epoch_millis, dtype=np.int64)
        if period == "day":
            bins = t // _DAY_MS
            offs = t - bins * _DAY_MS
        elif period == "week":
            bins = t // _WEEK_MS
            offs = (t - bins * _WEEK_MS) // 1000
        elif period == "month":
            # calendar months since epoch; offset = seconds since month start
            dt = t.astype("datetime64[ms]")
            months = dt.astype("datetime64[M]")
            bins = months.astype(np.int64)
            offs = (t - months.astype("datetime64[ms]").astype(np.int64)) // 1000
        elif period == "year":
            dt = t.astype("datetime64[ms]")
            years = dt.astype("datetime64[Y]")
            bins = years.astype(np.int64)
            offs = (t - years.astype("datetime64[ms]").astype(np.int64)) // 60_000
        else:
            raise ValueError(f"unknown period: {period}")
        return bins.astype(np.int16), offs.astype(np.int64)

    @staticmethod
    def from_binned_time(bins, offsets, period: str) -> np.ndarray:
        """(bin, offset) -> epoch millis of that instant (inverse of
        to_binned_time up to offset-unit truncation;
        BinnedTime.scala fromDayAndMillis etc.)."""
        bins = np.asarray(bins, dtype=np.int64)
        offsets = np.asarray(offsets, dtype=np.int64)
        if period == "day":
            return bins * _DAY_MS + offsets
        if period == "week":
            return bins * _WEEK_MS + offsets * 1000
        if period == "month":
            start = bins.astype("datetime64[M]").astype("datetime64[ms]").astype(np.int64)
            return start + offsets * 1000
        if period == "year":
            start = bins.astype("datetime64[Y]").astype("datetime64[ms]").astype(np.int64)
            return start + offsets * 60_000
        raise ValueError(f"unknown period: {period}")

    @staticmethod
    def bin_start_millis(bins, period: str) -> np.ndarray:
        return BinnedTime.from_binned_time(bins, np.zeros_like(np.asarray(bins)), period)
