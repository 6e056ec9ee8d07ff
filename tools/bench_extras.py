"""Extra scale benches: dedup throughput + skewed extent join.

Artifacts land in BENCH/ (one JSON per bench). Run ONE at a time — the
sandbox box is shared (see CLAUDE.md benchmarking notes).

  python tools/bench_extras.py dedup   [n_docs]   # exact + minhash dedup
  python tools/bench_extras.py extent  [n_docs]   # skewed box-box join
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

# runnable as `python tools/bench_extras.py` from anywhere: the repo root
# (geomesa_ray's parent) must be importable in the DRIVER before ray.init
# so workers inherit it on their sys.path
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _init(num_cpus: int):
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False


def _corpus_texts(n_docs: int):
    """Corpus -> Dataset[(doc_id, text)] — first text span per doc."""
    import ray.data as rd

    from geomesa_ray.sources.synth import synthesize_corpus

    corpus = synthesize_corpus(n_docs, seed=42,
                               n_shards=int(os.environ.get("GRAFT_SHARDS", "64")),
                               use_ray=True)

    def first_text(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        is_text = pc.equal(flat.field("kind"), "text").to_numpy(zero_copy_only=False)
        tp = parents[is_text]
        uniq, first_idx = np.unique(tp, return_index=True)
        texts = np.full(batch.num_rows, "", dtype=object)
        tvals = flat.field("text").filter(pa.array(is_text)).take(pa.array(first_idx))
        texts[uniq] = tvals.to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": batch.column("doc_id"), "text": pa.array(texts, type=pa.string())})

    return rd.read_parquet(corpus).map_batches(first_text, batch_format="pyarrow")


def _diverse_texts(n_docs: int):
    """Deterministic high-entropy corpus with a controlled near-dup rate:
    every doc gets 30 hash-derived vocab words; docs with id % 20 == 1 copy
    their predecessor's words with the last two swapped (a ~5% near-dup
    population). The interleaved corpus's own 40-word text spans are
    adversarially self-similar (everything near-dups everything), which
    benches the hot-bucket path but not realistic throughput."""
    import ray.data as rd

    from geomesa_ray.cells.shard import mix64

    K = 30

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        src = np.where(ids % 20 == 1, ids - 1, ids)
        mults = (np.arange(K, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1))
        toks = mix64(src[:, None].astype(np.uint64) * mults[None, :]) % np.uint64(50000)
        words = np.char.add("w", toks.astype(np.int64).astype("U5"))
        dup = ids % 20 == 1
        words[dup, K - 2], words[dup, K - 1] = "xx", "yy"
        text = words[:, 0]
        for c in range(1, K):
            text = np.char.add(np.char.add(text, " "), words[:, c])
        return pa.table({"doc_id": pa.array(ids), "text": pa.array(text.astype(object))})

    return rd.range(n_docs).map_batches(mk, batch_format="pyarrow")


def bench_dedup(n_docs: int, num_cpus: int = 32) -> dict:
    _init(num_cpus)
    from geomesa_ray.stages.dedup import exact_dedup, minhash_dedup

    ds = _corpus_texts(n_docs)
    t0 = time.time()
    n_exact = exact_dedup(ds, content_col="text", id_col="doc_id").count()
    t_exact = time.time() - t0

    # minhash on a capped diverse corpus (the interleaved corpus's text is
    # one giant near-dup cluster — that regime is covered by the hot-bucket
    # caps; this measures realistic ~5%-dup throughput)
    mh_docs = min(n_docs, int(os.environ.get("GRAFT_MINHASH_DOCS", "1500000")))
    mh = _diverse_texts(mh_docs)
    t0 = time.time()
    n_mh = minhash_dedup(mh, text_col="text", id_col="doc_id", rounds=2).count()
    t_mh = time.time() - t0
    return {
        "metric": "dedup throughput (docs/sec)",
        "exact_docs": n_docs, "exact_sec": round(t_exact, 2),
        "exact_docs_per_sec": round(n_docs / t_exact, 1), "exact_kept": int(n_exact),
        "minhash_docs": mh_docs, "minhash_sec": round(t_mh, 2),
        "minhash_docs_per_sec": round(mh_docs / t_mh, 1), "minhash_kept": int(n_mh),
        "num_cpus": num_cpus,
    }


def bench_extent(n_docs: int, num_cpus: int = 32, half_deg: float = 0.005) -> dict:
    """Skewed box-box join: boxes around corpus points (half the points
    cluster on hot cities — the skew regime); even vs odd doc ids."""
    _init(num_cpus)
    import ray.data as rd

    from geomesa_ray.sources.synth import synthesize_corpus
    from geomesa_ray.stages.extent_join import extent_join
    from geomesa_ray.stages.extract import extract_geometry

    corpus = synthesize_corpus(n_docs, seed=42,
                               n_shards=int(os.environ.get("GRAFT_SHARDS", "128")),
                               use_ray=True)

    def boxes(parity):
        def fn(t: pa.Table) -> pa.Table:
            lon = t.column("lon").to_numpy(zero_copy_only=False)
            lat = t.column("lat").to_numpy(zero_copy_only=False)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            ok = ~np.isnan(lon)
            # parity on the numeric suffix of doc_id
            num = np.char.partition(ids[ok].astype(str), "-")[:, 2].astype(np.int64)
            keep = num % 2 == parity
            return pa.table({
                "doc_id": pa.array(ids[ok][keep]),
                "xmin": pa.array(lon[ok][keep] - half_deg),
                "ymin": pa.array(lat[ok][keep] - half_deg),
                "xmax": pa.array(lon[ok][keep] + half_deg),
                "ymax": pa.array(lat[ok][keep] + half_deg),
            })
        return fn

    ext = rd.read_parquet(corpus).map_batches(extract_geometry, batch_format="pyarrow")
    left = ext.map_batches(boxes(0), batch_format="pyarrow")
    right = ext.map_batches(boxes(1), batch_format="pyarrow")
    t0 = time.time()
    n = extent_join(left, right, level=12).count()
    dt = time.time() - t0
    return {
        "metric": "skewed extent join (hot-city boxes)",
        "docs": n_docs, "half_deg": half_deg, "level": 12,
        "sec": round(dt, 2), "matches": int(n),
        "pairs_per_sec": round(n / dt, 1), "num_cpus": num_cpus,
    }


def bench_windows(n_rows: int, n_keys: int = 1_000_000, num_cpus: int = 32) -> dict:
    """session_windows (coarse-bucket gaps-and-islands) vs tumbling_window
    (plain groupby-aggregate) on the same synthetic log — the round-1
    verdict's 2x bar for the natural-key window family."""
    _init(num_cpus)
    import ray.data as rd

    from geomesa_ray.cells.shard import mix64
    from geomesa_ray.stages.windows import session_windows, tumbling_window

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        user = (mix64(ids) % np.uint64(n_keys)).astype(np.int64)
        ts = (np.int64(1_700_000_000_000)
              + (mix64(ids * np.uint64(3)) % np.uint64(30 * 86_400_000)).astype(np.int64))
        val = (mix64(ids * np.uint64(5)) % np.uint64(10_000)).astype(np.int64)
        return pa.table({"user_id": pa.array(user), "ts": pa.array(ts),
                         "value_cents": pa.array(val)})

    def log():
        return rd.range(n_rows).map_batches(mk, batch_format="pyarrow")

    t0 = time.time()
    n_tumble = tumbling_window(log(), "user_id", "ts", 3_600_000, "value_cents").count()
    t_tumble = time.time() - t0
    t0 = time.time()
    n_sessions = session_windows(log(), "user_id", "ts", 1_800_000).count()
    t_sessions = time.time() - t0
    return {
        "metric": "window family throughput (rows/sec)",
        "rows": n_rows, "keys": n_keys,
        "tumbling_sec": round(t_tumble, 2), "tumbling_windows": int(n_tumble),
        "session_sec": round(t_sessions, 2), "sessions": int(n_sessions),
        "session_vs_tumbling": round(t_sessions / t_tumble, 2),
        "num_cpus": num_cpus,
    }


def bench_jaccard_hot(n_docs: int = 4096, num_cpus: int = 32) -> dict:
    """Hot-anchor worst case (round-3 verdict #3 done-criterion): n_docs
    near-identical docs all sharing ONE min-shingle anchor — the regime the
    old per-pair Python verify hit ~n^2/2 interpreter iterations on.
    Reports the vectorized jaccard verify wall vs the simhash verify wall
    on the SAME docs/pair volume."""
    _init(num_cpus)
    import ray.data as rd

    from geomesa_ray.stages.dedup import jaccard_pairs, simhash_pairs

    # doc i = shared 40-word prefix + one distinguishing suffix word; the
    # global min shingle sits in the shared prefix -> one anchor run
    base = " ".join(f"w{j:04d}" for j in range(40))
    docs = [{"doc_id": f"d{i:05d}", "text": f"{base} t{i:05d}"} for i in range(n_docs)]
    ds = rd.from_items(docs).repartition(8)

    t0 = time.time()
    n_j = jaccard_pairs(ds, threshold=0.5, max_bucket=n_docs).count()
    t_j = time.time() - t0
    t0 = time.time()
    n_s = simhash_pairs(ds, max_hamming=16, max_bucket=n_docs).count()
    t_s = time.time() - t0
    return {
        "metric": "hot-anchor pair-verify wall (sec)",
        "docs": n_docs, "pairs_possible": n_docs * (n_docs - 1) // 2,
        "jaccard_sec": round(t_j, 2), "jaccard_pairs": int(n_j),
        "simhash_sec": round(t_s, 2), "simhash_pairs": int(n_s),
        "jaccard_vs_simhash": round(t_j / t_s, 2), "num_cpus": num_cpus,
    }


def bench_knn_many(n_docs: int = 6_000_000, n_queries: int = 1000,
                   num_cpus: int = 32) -> dict:
    """kNN with a THOUSAND broadcast query points (round-3 verdict #8
    done-criterion): the per-batch top-k partial must stay one lexsort,
    not a per-query Python loop."""
    _init(num_cpus)
    import ray.data as rd

    from geomesa_ray.cells.shard import mix64
    from geomesa_ray.stages.knn import knn

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        lon = (mix64(ids) % np.uint64(360_000_000)).astype(np.float64) / 1e6 - 180.0
        lat = (mix64(ids * np.uint64(3)) % np.uint64(180_000_000)).astype(np.float64) / 1e6 - 90.0
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "lon": pa.array(lon), "lat": pa.array(lat)})

    ds = rd.range(n_docs).map_batches(mk, batch_format="pyarrow")
    rng = np.random.default_rng(7)
    q = {"query_id": np.array([f"q{i:04d}" for i in range(n_queries)], dtype=object),
         "lon": rng.uniform(-180, 180, n_queries),
         "lat": rng.uniform(-85, 85, n_queries)}
    t0 = time.time()
    n = knn(ds, q, k=10).count()
    dt = time.time() - t0
    return {
        "metric": "kNN wall with 1,000 broadcast queries (sec)",
        "docs": n_docs, "queries": n_queries, "k": 10,
        "sec": round(dt, 2), "result_rows": int(n),
        "docs_per_sec": round(n_docs / dt, 1), "num_cpus": num_cpus,
    }


def bench_stats(n_rows: int = 48_000_000, num_cpus: int = 32) -> dict:
    """stats_scan multi-sketch pass at 48M rows (round-3 verdict #2
    done-criterion): the reduce is now the map-coalesced tree, so wall
    should track the scan, not driver consumption (the density precedent
    measured 185 s driver-reduce vs 21 s tree on this shape)."""
    _init(num_cpus)
    import ray.data as rd

    from geomesa_ray.cells.shard import mix64
    from geomesa_ray.stages.stats import stats_scan, z3_stats_scan

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = (mix64(ids) % np.uint64(1_000_000)).astype(np.int64)
        tb = (mix64(ids * np.uint64(3)) % np.uint64(64)).astype(np.int64)
        z3 = (mix64(ids * np.uint64(5)) >> np.uint64(2)).astype(np.int64)
        return pa.table({"v": pa.array(v), "time_bin": pa.array(tb),
                         "z3": pa.array(z3)})

    def data():
        return rd.range(n_rows).map_batches(mk, batch_format="pyarrow")

    t0 = time.time()
    stats = stats_scan(data(), "count;minmax(v);hll(v);moments(v)")
    t_scan = time.time() - t0
    n_count = int(stats[0].result())
    t0 = time.time()
    z3f = z3_stats_scan(data(), "time_bin", "z3", kind="frequency")
    t_z3 = time.time() - t0
    return {
        "metric": "48M-row sketch scan wall (tree-merged reduce)",
        "rows": n_rows, "stats_scan_sec": round(t_scan, 2),
        "count": n_count, "z3_frequency_sec": round(t_z3, 2),
        "z3_time_bins": len(getattr(z3f, "sketches", {})),
        "num_cpus": num_cpus,
    }


def bench_ann(n_vecs: int = 1_000_000, dim: int = 64, n_queries: int = 4,
              k: int = 10, n_lists: int = 256, nprobe: int = 8,
              num_cpus: int = 32) -> dict:
    """ANN scale path, apples-to-apples on PARQUET: brute-force cosine
    top-k must scan the whole stored corpus; the ingest-partitioned IVF
    layout reads only each query's probed lists (I/O ∝ nprobe/n_lists —
    the per-query latency claim, so search is measured PER QUERY; batching
    diverse queries would union the probe sets and negate pruning by
    design). n_lists defaults near sqrt(corpus)/4 so a probe touches ~3%
    of the partitions."""
    import shutil

    _init(num_cpus)
    import ray.data as rd

    from geomesa_ray.cells.shard import mix64
    from geomesa_ray.stages.similarity import ann_topk, ivf_build, ivf_search

    # mixture-of-Gaussians corpus (128 deterministic centers + noise):
    # real embedding spaces cluster — a uniform corpus is IVF's degenerate
    # worst case (every query's true neighbors spread over all lists)
    n_centers = 128
    c_rng = np.random.default_rng(123)
    centers = c_rng.normal(size=(n_centers, dim)).astype(np.float32)

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        cid = (mix64(ids) % np.uint64(n_centers)).astype(np.int64)
        mults = (np.arange(dim, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + np.uint64(1))
        h = mix64((ids + np.uint64(7)) [:, None] * mults[None, :])
        noise = (h % np.uint64(2_000_001)).astype(np.float32) / 1e6 - 1.0
        v = centers[cid] + 0.25 * noise
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32(), dim)),
        })

    corpus_dir = f"/tmp/graft_ann_corpus_mog_{n_vecs}"
    if not os.path.exists(os.path.join(corpus_dir, "_DONE")):
        shutil.rmtree(corpus_dir, ignore_errors=True)
        rd.range(n_vecs).map_batches(mk, batch_format="pyarrow") \
            .write_parquet(corpus_dir)
        open(os.path.join(corpus_dir, "_DONE"), "w").write("1")

    rng = np.random.default_rng(9)
    q = (centers[rng.integers(0, n_centers, n_queries)]
         + 0.2 * rng.normal(size=(n_queries, dim))).astype(np.float32)
    qids = [f"q{i:03d}" for i in range(n_queries)]

    t0 = time.time()
    brute = ann_topk(rd.read_parquet(corpus_dir), q, qids, k=k).to_pandas()
    t_brute = time.time() - t0

    idx_dir = "/tmp/graft_ivf_bench"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    ivf_build(rd.read_parquet(corpus_dir), idx_dir, n_lists=n_lists)
    t_build = time.time() - t0

    import glob

    def _bytes(pattern):
        return sum(os.path.getsize(p) for p in glob.glob(pattern, recursive=True))

    corpus_bytes = _bytes(os.path.join(corpus_dir, "**", "*.parquet"))
    per_q, probed_bytes, hits = [], [], 0
    cert_hits, cert_lists = 0, []
    from geomesa_ray.stages.similarity import ivf_search_certified
    for i, qid in enumerate(qids):
        t0 = time.time()
        approx = ivf_search(idx_dir, q[i:i + 1], [qid], k=k, nprobe=nprobe).to_pandas()
        per_q.append(time.time() - t0)
        # certified ladder on CLUSTERED data: should stop near nprobe lists
        cert, cinfo = ivf_search_certified(idx_dir, q[i:i + 1], [qid], k=k,
                                           nprobe=nprobe)
        cert_lists.append(cinfo["lists_probed"])
        want_c = set(brute[brute["query_id"] == qid]["neighbor_id"])
        cert_hits += len(want_c & set(cert["neighbor_id"]))
        # bytes the probed partitions hold (the 100-TB-relevant number: on
        # this box the page cache hides the I/O difference entirely)
        centroids = np.load(os.path.join(idx_dir, "_centroids.npy"))
        from geomesa_ray.stages.similarity import _normalize
        sims = _normalize(q[i:i + 1]) @ centroids.T
        lists = np.argsort(-sims, axis=1)[:, :nprobe].ravel()
        probed_bytes.append(sum(
            _bytes(os.path.join(idx_dir, f"ivf_list={j}", "*.parquet"))
            for j in lists.tolist()))
        want = set(brute[brute["query_id"] == qid]["neighbor_id"])
        hits += len(want & set(approx["neighbor_id"]))
    return {
        "metric": "ANN brute full-scan vs IVF per-query search (sec)",
        "vectors": n_vecs, "dim": dim, "queries": n_queries, "k": k,
        "brute_scan_sec": round(t_brute, 2),
        "ivf_build_sec": round(t_build, 2),
        "ivf_search_per_query_sec": round(float(np.mean(per_q)), 2),
        "speedup_vs_full_scan": round(t_brute / float(np.mean(per_q)), 1),
        "n_lists": n_lists, "nprobe": nprobe,
        "corpus_bytes": int(corpus_bytes),
        "probed_bytes_per_query": int(np.mean(probed_bytes)),
        "bytes_fraction_read": round(float(np.mean(probed_bytes)) / corpus_bytes, 4),
        "recall_at_k": round(hits / (n_queries * k), 4),
        "certified_recall": round(cert_hits / (n_queries * k), 4),
        "certified_lists_probed_mean": round(float(np.mean(cert_lists)), 1),
        "num_cpus": num_cpus,
    }


def bench_ann_uniform(n_vecs: int = 2_000_000, dim: int = 64, n_queries: int = 4,
                      k: int = 10, n_lists: int = 256, nprobe: int = 8,
                      num_cpus: int = 32) -> dict:
    """IVF's degenerate case (round-5 verdict ask #4): a UNIFORM corpus,
    where every query's true neighbors spread over all lists and plain
    nprobe-probing measured recall ~0.2 in round 4. Contrasts three modes
    on the same ingest-partitioned layout:
      - naive   : fixed nprobe probe (the honest low-recall baseline)
      - budget  : certified ladder capped at n_lists/4 probes
      - certified: triangle-inequality ladder run to certification —
        recall is 1.0 BY CONSTRUCTION; the uniform data decides how many
        lists that takes, and bytes touched stay ∝ lists probed (reported)
    No IVF reaches 0.95 recall at small fixed nprobe on uniform vectors —
    the ladder makes the trade explicit instead of silently missing."""
    import glob
    import shutil

    _init(num_cpus)
    import ray.data as rd

    from geomesa_ray.cells.shard import mix64
    from geomesa_ray.stages.similarity import (ann_topk, ivf_build,
                                               ivf_search,
                                               ivf_search_certified)

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        mults = (np.arange(dim, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + np.uint64(1))
        h = mix64((ids + np.uint64(11))[:, None] * mults[None, :])
        v = (h % np.uint64(2_000_001)).astype(np.float32) / 1e6 - 1.0
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32(), dim)),
        })

    corpus_dir = f"/tmp/graft_ann_corpus_uniform_{n_vecs}"
    if not os.path.exists(os.path.join(corpus_dir, "_DONE")):
        shutil.rmtree(corpus_dir, ignore_errors=True)
        rd.range(n_vecs).map_batches(mk, batch_format="pyarrow") \
            .write_parquet(corpus_dir)
        open(os.path.join(corpus_dir, "_DONE"), "w").write("1")

    rng = np.random.default_rng(31)
    q = rng.uniform(-1, 1, size=(n_queries, dim)).astype(np.float32)
    qids = [f"q{i:03d}" for i in range(n_queries)]

    t0 = time.time()
    brute = ann_topk(rd.read_parquet(corpus_dir), q, qids, k=k).to_pandas()
    t_brute = time.time() - t0

    idx_dir = "/tmp/graft_ivf_uniform_bench"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    ivf_build(rd.read_parquet(corpus_dir), idx_dir, n_lists=n_lists)
    t_build = time.time() - t0

    def _bytes(lists):
        return sum(os.path.getsize(p) for j in lists for p in glob.glob(
            os.path.join(idx_dir, f"ivf_list={j}", "*.parquet")))

    corpus_bytes = sum(os.path.getsize(p) for p in glob.glob(
        os.path.join(idx_dir, "**", "*.parquet"), recursive=True))

    def _recall(df, qid):
        want = set(brute[brute["query_id"] == qid]["neighbor_id"])
        return len(want & set(df[df["query_id"] == qid]["neighbor_id"])) / k

    naive_r, cert_r = [], []
    cert_lists, cert_bytes, cert_sec, naive_sec = [], [], [], []
    sweep = sorted({max(nprobe, n_lists // 16), n_lists // 8, n_lists // 4,
                    n_lists // 2, (3 * n_lists) // 4})
    sweep_r: dict[int, list] = {b: [] for b in sweep}
    for i, qid in enumerate(qids):
        t0 = time.time()
        naive = ivf_search(idx_dir, q[i:i + 1], [qid], k=k, nprobe=nprobe).to_pandas()
        naive_sec.append(time.time() - t0)
        naive_r.append(_recall(naive, qid))
        for b in sweep:  # recall-vs-lists trade curve (bytes ∝ budget)
            bud, _ = ivf_search_certified(idx_dir, q[i:i + 1], [qid], k=k,
                                          nprobe=nprobe, probe_budget=b)
            sweep_r[b].append(_recall(bud, qid))
        t0 = time.time()
        cert, info = ivf_search_certified(idx_dir, q[i:i + 1], [qid], k=k,
                                          nprobe=nprobe)
        cert_sec.append(time.time() - t0)
        cert_r.append(_recall(cert, qid))
        cert_lists.append(info["lists_probed"])
        cert_bytes.append(_bytes(info["probed_lists"]))
    return {
        "metric": "IVF on uniform vectors: naive nprobe vs certified ladder",
        "vectors": n_vecs, "dim": dim, "queries": n_queries, "k": k,
        "n_lists": n_lists, "nprobe": nprobe,
        "brute_scan_sec": round(t_brute, 2),
        "ivf_build_sec": round(t_build, 2),
        "naive_recall_at_nprobe": round(float(np.mean(naive_r)), 4),
        "naive_search_sec": round(float(np.mean(naive_sec)), 2),
        "budget_recall_by_lists": {str(b): round(float(np.mean(r)), 4)
                                   for b, r in sweep_r.items()},
        "certified_recall": round(float(np.mean(cert_r)), 4),
        "certified_lists_probed_mean": round(float(np.mean(cert_lists)), 1),
        "certified_bytes_fraction": round(float(np.mean(cert_bytes)) / corpus_bytes, 4),
        "certified_search_sec": round(float(np.mean(cert_sec)), 2),
        "num_cpus": num_cpus,
    }


def bench_media(n_media: int = 18_000, num_cpus: int = 32) -> dict:
    """Multimodal decode throughput: a mixed-format payload corpus (PNG /
    JPEG / BMP / GIF / PPM images at 64x64, PCM16 / mu-law / IMA-ADPCM WAV
    at 8k samples, FLAC + MPEG-1 Layer II audio, 4-frame 32x32 Y4M video) decoded by the holder-fn task
    ``decode_media`` stage. Reports overall payloads/s + MB/s and a timed
    per-format pass, so a slow codec (e.g. the serial JPEG entropy loop)
    is visible instead of averaged away."""
    import shutil

    _init(num_cpus)
    import ray.data as rd

    from geomesa_ray.stages.media import decode_media

    FORMATS = ["png", "jpeg", "bmp", "gif", "ppm", "tiff", "wav", "ulaw",
               "adpcm", "flac", "mp2", "y4m"]

    def mk(batch: pa.Table) -> pa.Table:
        from geomesa_ray.cells.shard import mix64
        from geomesa_ray.stages.codecs import (encode_ppm, encode_wav,
                                               encode_wav_compressed)
        from geomesa_ray.stages.gifbmp import encode_bmp, encode_gif
        from geomesa_ray.stages.jpeg import encode_jpeg
        from geomesa_ray.stages.png import encode_png
        from geomesa_ray.stages.video import encode_y4m

        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        refs, fmts, payloads = [], [], []
        for i in ids.tolist():
            fmt = FORMATS[i % len(FORMATS)]
            x = mix64(np.uint64(i * 1_000_003 + 1)
                      + np.arange(64 * 64 * 3, dtype=np.uint64))
            if fmt in ("png", "jpeg", "bmp", "ppm", "tiff"):
                from geomesa_ray.sources.geotiff import encode_geotiff

                px = (x % np.uint64(256)).astype(np.uint8).reshape(64, 64, 3)
                enc = {"png": encode_png, "jpeg": encode_jpeg,
                       "bmp": encode_bmp, "ppm": encode_ppm,
                       "tiff": lambda im: encode_geotiff(im, compression=5)}[fmt]
                payloads.append(enc(px))
            elif fmt == "gif":
                px = ((x % np.uint64(6)).astype(np.uint8) * 42).reshape(64, 64, 3)
                payloads.append(encode_gif(px))
            elif fmt in ("wav", "ulaw", "adpcm", "flac", "mp2"):
                # ~10 s of 8 kHz audio: long enough that the ADPCM block
                # loop (serial per position, vectorized ACROSS blocks) has
                # blocks to vectorize over
                t_ = np.arange(80_000, dtype=np.float64)
                s = (np.sin(t_ / 29.0) * 7000
                     + (x[t_.astype(np.int64) % len(x)] % np.uint64(512)).astype(np.float64)
                     - 256.0).astype(np.int16)
                if fmt == "wav":
                    payloads.append(encode_wav(s))
                elif fmt == "mp2":
                    from geomesa_ray.stages.mp2 import encode_mp2

                    # mp2 has no 8 kHz mode; same 80k samples at 32 kHz
                    payloads.append(encode_mp2(s, rate=32000, bitrate=96))
                elif fmt == "flac":
                    from geomesa_ray.stages.flac import encode_flac

                    payloads.append(encode_flac(s, 8000))
                else:
                    payloads.append(encode_wav_compressed(s, 8000, fmt))
            else:  # y4m: 4 smooth frames (video payloads are frame stacks)
                base = (x[:32 * 32 * 3] % np.uint64(256)).astype(np.uint8).reshape(32, 32, 3)
                frames = [((base.astype(np.int32) + 9 * t) % 256).astype(np.uint8)
                          for t in range(4)]
                payloads.append(encode_y4m(frames))
            refs.append(f"{fmt}://{i:08d}")
            fmts.append(fmt)
        return pa.table({"media_ref": pa.array(refs), "fmt": pa.array(fmts),
                         "payload": pa.array(payloads, type=pa.binary())})

    corpus_dir = f"/tmp/graft_media_bench_v5_{n_media}"
    if not os.path.exists(os.path.join(corpus_dir, "_DONE")):
        shutil.rmtree(corpus_dir, ignore_errors=True)
        rd.range(n_media).map_batches(mk, batch_format="pyarrow",
                                      batch_size=256).write_parquet(corpus_dir)
        open(os.path.join(corpus_dir, "_DONE"), "w").write("1")

    import glob
    total_bytes = sum(os.path.getsize(p)
                      for p in glob.glob(os.path.join(corpus_dir, "*.parquet")))

    def timed(ds):
        t0 = time.time()
        decoded = decode_media(ds, dim=16, batch_size=64)
        ok = decoded.map_batches(
            lambda t: pa.table({"d": pa.array([int(t.column("decoded").to_numpy(
                zero_copy_only=False).sum())])}),
            batch_format="pyarrow").sum("d")
        dt = time.time() - t0
        return dt, ok

    # warmup + timed mixed pass
    timed(rd.read_parquet(corpus_dir))
    t_all, n_ok = timed(rd.read_parquet(corpus_dir))

    per_format = {}
    for fmt in FORMATS:
        ds = rd.read_parquet(corpus_dir).filter(
            expr=f"fmt == '{fmt}'")
        cnt = ds.count()  # exact per-format rows (n_media % len(FORMATS) != 0)
        dt, _ = timed(rd.read_parquet(corpus_dir).filter(expr=f"fmt == '{fmt}'"))
        per_format[fmt] = round(cnt / dt, 1)

    return {
        "metric": "multimodal decode throughput (payloads/sec)",
        "payloads": n_media, "decoded_ok": int(n_ok),
        "corpus_mb": round(total_bytes / 1e6, 1),
        "mixed_payloads_per_sec": round(n_media / t_all, 1),
        "mixed_mb_per_sec": round(total_bytes / 1e6 / t_all, 1),
        "per_format_payloads_per_sec": per_format,
        "num_cpus": num_cpus,
    }


def bench_media_pipeline(n_docs: int = 200_000, num_cpus: int = 32) -> dict:
    """END-TO-END multimodal path at scale: interleaved corpus -> explode
    media spans -> bucketed PNG-payload attach -> actor-pool decode ->
    per-doc rollup (`stages/media.py::media_pipeline`, the driver-gated
    `media_pipeline` query's shape at 40x its sf). Payload table built once
    to parquet; the timed pass reads both sides from storage like a real
    deployment."""
    import shutil

    _init(num_cpus)
    import ray.data as rd

    from geomesa_ray.cells.shard import fnv1a_str, mix64
    from geomesa_ray.sources.synth import synthesize_corpus
    from geomesa_ray.stages.dedup import exact_dedup
    from geomesa_ray.stages.media import explode_media_refs, media_pipeline
    from geomesa_ray.stages.png import encode_png

    corpus = synthesize_corpus(n_docs, seed=42,
                               n_shards=int(os.environ.get("GRAFT_SHARDS", "64")),
                               use_ray=True)
    pay_dir = f"/tmp/graft_media_payloads_{n_docs}"
    if not os.path.exists(os.path.join(pay_dir, "_DONE")):
        shutil.rmtree(pay_dir, ignore_errors=True)

        def build(t: pa.Table) -> pa.Table:
            rs = t.column("media_ref").to_numpy(zero_copy_only=False).astype(object)
            h = fnv1a_str(rs)
            payloads = []
            for j in range(len(rs)):
                x = mix64(h[j] + np.arange(1, 769, dtype=np.uint64))
                px = (x % np.uint64(256)).astype(np.uint8).reshape(16, 16, 3)
                payloads.append(encode_png(px))
            return pa.table({"media_ref": pa.array(rs.astype(str)),
                             "payload": pa.array(payloads, type=pa.binary())})

        refs = explode_media_refs(rd.read_parquet(corpus))
        (exact_dedup(refs, content_col="media_ref", id_col="doc_id")
         .select_columns(["media_ref"])
         .map_batches(build, batch_format="pyarrow")
         .write_parquet(pay_dir))
        open(os.path.join(pay_dir, "_DONE"), "w").write("1")

    def run():
        t0 = time.time()
        out = media_pipeline(rd.read_parquet(corpus),
                             rd.read_parquet(pay_dir), dim=16)
        n_rows = out.count()
        return time.time() - t0, n_rows

    run()  # warmup
    times = []
    for _ in range(2):
        dt, n_rows = run()
        times.append(dt)
    best = min(times)
    return {
        "metric": "end-to-end media pipeline (docs/sec)",
        "docs": n_docs, "docs_with_media": int(n_rows),
        "wall_sec_best_of_2": round(best, 2),
        "docs_per_sec": round(n_docs / best, 1),
        "num_cpus": num_cpus,
    }


if __name__ == "__main__":
    import ray

    mode = sys.argv[1]
    defaults = {"dedup": 6_000_000, "extent": 3_000_000, "windows": 48_000_000,
                "jaccard_hot": 4096, "knn_many": 6_000_000, "stats": 48_000_000,
                "ann": 1_000_000, "ann_uniform": 2_000_000,
                "media": 18_000, "media_pipeline": 200_000}
    n = int(sys.argv[2]) if len(sys.argv) > 2 else defaults.get(mode, 1_000_000)
    if mode == "dedup":
        out = bench_dedup(n)
    elif mode == "extent":
        out = bench_extent(n)
    elif mode == "windows":
        out = bench_windows(n)
    elif mode == "jaccard_hot":
        out = bench_jaccard_hot(n)
    elif mode == "knn_many":
        out = bench_knn_many(n)
    elif mode == "stats":
        out = bench_stats(n)
    elif mode == "ann":
        out = bench_ann(n)
    elif mode == "ann_uniform":
        out = bench_ann_uniform(n)
    elif mode == "media":
        out = bench_media(n)
    elif mode == "media_pipeline":
        out = bench_media_pipeline(
            n, num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(json.dumps(out))
    ray.shutdown()
