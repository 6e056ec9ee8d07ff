"""Sketch correctness: exact stats match numpy oracles; approximate sketches
within published error bounds; merge associativity (the monoid law the
reference's Stat.+ relies on)."""

import numpy as np
import pandas as pd
import pytest

from geomesa_ray.stages.bin_export import BinPack, decode_bin
from geomesa_ray.stages.sampling import sample_by_key, sample_one_in_n
from geomesa_ray.stages.stats import (
    CountStat,
    DescriptiveStats,
    EnumerationStat,
    Frequency,
    HistogramStat,
    HyperLogLog,
    MinMax,
    TopK,
    parse_stat_spec,
    stats_scan,
)


class TestSketches:
    def test_minmax_merge(self):
        rng = np.random.default_rng(1)
        a, b = rng.normal(0, 10, 1000), rng.normal(5, 1, 1000)
        s1, s2 = MinMax(), MinMax()
        s1.update(a)
        s2.update(b)
        s1.merge(s2)
        full = np.concatenate([a, b])
        assert s1.result() == (full.min(), full.max())

    def test_hll_accuracy(self):
        hll = HyperLogLog(p=12)
        n = 100_000
        hll.update(np.arange(n, dtype=np.int64))
        est = hll.result()
        assert abs(est - n) / n < 0.05  # ~1.04/sqrt(4096) = 1.6% expected

    def test_hll_merge_equals_union(self):
        a, b = HyperLogLog(12), HyperLogLog(12)
        a.update(np.arange(0, 50_000, dtype=np.int64))
        b.update(np.arange(25_000, 75_000, dtype=np.int64))
        a.merge(b)
        u = HyperLogLog(12)
        u.update(np.arange(0, 75_000, dtype=np.int64))
        assert a.result() == u.result()

    def test_topk_exact_on_skewed(self):
        rng = np.random.default_rng(3)
        values = np.concatenate([
            np.repeat(np.array(["a", "b", "c"], dtype=object), [5000, 3000, 1000]),
            rng.integers(0, 500, 2000).astype(str).astype(object),
        ])
        rng.shuffle(values)
        tk = TopK(k=3, capacity=512)
        for chunk in np.array_split(values, 7):
            tk.update(chunk)
        top = tk.result()
        assert [t[0] for t in top] == ["a", "b", "c"]
        assert top[0][1] >= 5000

    def test_frequency_bounds(self):
        f = Frequency(width=2048, depth=4)
        rng = np.random.default_rng(4)
        vals = rng.integers(0, 1000, 50_000)
        f.update(vals)
        truth = np.bincount(vals, minlength=1000)
        # CMS never undercounts; overcount bounded by eps*N w.h.p.
        for v in (0, 17, 999):
            c = f.count(np.int64(v))
            assert c >= truth[v]
            assert c <= truth[v] + 0.01 * len(vals)

    def test_histogram_matches_numpy(self):
        h = HistogramStat(20, 0.0, 100.0)
        rng = np.random.default_rng(5)
        v = rng.uniform(0, 100, 10_000)
        h.update(v)
        idx = np.clip(np.floor(v / 5).astype(int), 0, 19)
        assert np.array_equal(h.result(), np.bincount(idx, minlength=20))

    def test_descriptive_merge(self):
        rng = np.random.default_rng(6)
        a, b = rng.normal(10, 3, 5000), rng.normal(-5, 7, 7000)
        s1, s2 = DescriptiveStats(), DescriptiveStats()
        s1.update(a)
        s2.update(b)
        s1.merge(s2)
        full = np.concatenate([a, b])
        r = s1.result()
        assert r["count"] == 12_000
        assert np.isclose(r["mean"], full.mean())
        assert np.isclose(r["variance"], full.var(ddof=1))

    def test_enumeration(self):
        e = EnumerationStat()
        e.update(np.array(["x", "y", "x"], dtype=object))
        e.update(np.array(["y", "z"], dtype=object))
        assert e.result() == {"x": 2, "y": 2, "z": 1}

    def test_spec_parser(self):
        spec = parse_stat_spec("count;minmax(l_quantity);hll(l_orderkey,p=10)")
        assert spec == [
            ("count", None, {}),
            ("minmax", "l_quantity", {}),
            ("hll", "l_orderkey", {"p": 10}),
        ]


class TestZ3Frequency:
    def test_estimate_and_merge(self):
        import numpy as np

        from geomesa_ray.stages.stats import Z3FrequencyStat

        rng = np.random.default_rng(3)
        tb = rng.integers(0, 4, 5000)
        z3 = rng.integers(0, 1 << 62, 5000, dtype=np.uint64)
        a = Z3FrequencyStat()
        b = Z3FrequencyStat()
        a.update((tb[:2500], z3[:2500]))
        b.update((tb[2500:], z3[2500:]))
        merged = a.merge(b)
        # per-bin totals are exact (CMS row sums equal insert counts)
        exp = {int(k): int(c) for k, c in zip(*np.unique(tb, return_counts=True))}
        assert merged.result() == exp
        # point estimates are conservative upper bounds and >= true count
        probe_tb, probe_z = int(tb[0]), int(z3[0])
        trunc = merged._trunc(z3)
        true_n = int(((tb == probe_tb) & (trunc == merged._trunc(np.array([probe_z]))[0])).sum())
        assert merged.estimate(probe_tb, probe_z) >= true_n
        assert merged.estimate(99, probe_z) == 0  # unseen bin
        assert set(merged.split_by_time()) == set(exp)

    def test_distributed_scan(self, ray_session):
        import numpy as np
        import ray.data as rd

        from geomesa_ray.stages.stats import Z3FrequencyStat, z3_stats_scan

        rng = np.random.default_rng(7)
        tb = rng.integers(0, 3, 4000)
        z3 = rng.integers(0, 1 << 62, 4000, dtype=np.uint64)
        ds = rd.from_items(
            [{"tb": int(t), "z3": int(z)} for t, z in zip(tb, z3)]
        ).repartition(8)
        scanned = z3_stats_scan(ds, "tb", "z3", kind="frequency")
        local = Z3FrequencyStat()
        local.update((tb, z3.astype(np.int64)))
        assert scanned.result() == local.result()
        probe = int(tb[0]), int(z3[0])
        assert scanned.estimate(*probe) == local.estimate(*probe)


class TestStatsScan:
    def test_scan_over_dataset(self, ray_session, sf_small):
        import ray.data as rd
        import pyarrow.parquet as pq

        ds = rd.read_parquet(f"{sf_small}/lineitem.parquet")
        stats = stats_scan(ds, "count;minmax(l_quantity);descriptive(l_extendedprice);hll(l_orderkey)")
        table = pq.read_table(f"{sf_small}/lineitem.parquet")
        n = table.num_rows
        assert stats[0].result() == n
        q = table.column("l_quantity").to_numpy()
        assert stats[1].result() == (q.min(), q.max())
        ep = table.column("l_extendedprice").to_numpy()
        assert np.isclose(stats[2].result()["mean"], ep.mean())
        true_card = len(np.unique(table.column("l_orderkey").to_numpy()))
        assert abs(stats[3].result() - true_card) / true_card < 0.05


class TestSampling:
    def test_one_in_n_deterministic(self, ray_session, sf_small):
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_small}/orders.parquet")
        s1 = sample_one_in_n(ds, 10, id_col="o_orderkey").to_pandas()
        s2 = sample_one_in_n(ds, 10, id_col="o_orderkey").to_pandas()
        assert sorted(s1["o_orderkey"]) == sorted(s2["o_orderkey"])
        n = ds.count()
        assert 0.05 * n < len(s1) < 0.2 * n

    def test_by_key_keeps_all_keys(self, ray_session, sf_small):
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_small}/lineitem.parquet")
        out = sample_by_key(ds, 100, key_col="l_returnflag", sort_col="l_orderkey").to_pandas()
        assert set(out["l_returnflag"]) == {"A", "N", "R"}


class TestBinExport:
    def test_pack_decode_roundtrip(self):
        import pyarrow as pa

        t = pa.table({
            "track": pa.array(["t1", "t2"]),
            "dtg": pa.array(np.array([1_600_000_000_000, 1_700_000_000_000]).astype("datetime64[ms]")),
            "lon": pa.array([10.5, -77.25]),
            "lat": pa.array([48.25, 38.5]),
        })
        out = BinPack("track", "dtg")(t)
        dec = decode_bin(out.column("bin").combine_chunks())
        assert dec["dtg_secs"].tolist() == [1_600_000_000, 1_700_000_000]
        assert np.allclose(dec["lon"], [10.5, -77.25])
        assert np.allclose(dec["lat"], [48.25, 38.5])
        assert dec["track_hash"][0] != dec["track_hash"][1]


class TestExactQuantiles:
    def test_matches_numpy_sorted_rank(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.stats import exact_quantiles

        rng = np.random.default_rng(9)
        vals = np.concatenate([rng.normal(0, 1, 20000),
                               np.full(5000, 3.5),  # heavy tie block
                               rng.uniform(100, 101, 100)])  # far tail
        ds = rd.from_pandas(pd.DataFrame({"v": vals}))
        qs = (0.01, 0.25, 0.5, 0.9, 0.999)
        got = exact_quantiles(ds, "v", qs=qs, n_bins=64)
        sv = np.sort(vals)
        for q in qs:
            r = int(np.floor(np.float64(q) * (len(vals) - 1)))
            assert got[q] == sv[r], q

    def test_recursion_on_hot_bucket(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.stats import exact_quantiles

        rng = np.random.default_rng(4)
        # everything concentrated in a razor-thin range inside one bucket
        vals = np.concatenate([rng.uniform(0.5000, 0.5001, 30000), [0.0, 1.0]])
        ds = rd.from_pandas(pd.DataFrame({"v": vals}))
        got = exact_quantiles(ds, "v", qs=(0.5,), n_bins=16, max_collect=1000)
        sv = np.sort(vals)
        assert got[0.5] == sv[int(np.floor(0.5 * (len(vals) - 1)))]

    def test_constant_column(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.stats import exact_quantiles

        ds = rd.from_pandas(pd.DataFrame({"v": np.full(100, 7.25)}))
        got = exact_quantiles(ds, "v", qs=(0.1, 0.9))
        assert got[0.1] == 7.25 and got[0.9] == 7.25
