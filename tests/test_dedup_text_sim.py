"""Dedup / text-analysis / similarity operator tests with exact oracles."""

import numpy as np
import pandas as pd
import pytest

from geomesa_ray.stages.dedup import (
    MinHasher,
    exact_dedup,
    hamming64,
    minhash_clusters,
    minhash_dedup,
    ngram_jaccard,
    simhash64,
    simhash_pairs,
)
from geomesa_ray.stages.similarity import ann_topk, cosine_dedup_pairs, _normalize
from geomesa_ray.stages.text import TextStats, fingerprint, text_stats


def _docs_ds(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = []
    for i in range(50):
        rows.append({"doc_id": f"a{i:03d}", "text": base})                      # exact dupes
    rows.append({"doc_id": "b000", "text": base.replace("quick", "swift")})      # near dup
    rows.append({"doc_id": "b001", "text": base.replace("dog", "cat") + "!"})    # near dup
    vocab = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu".split()
    rng = np.random.default_rng(99)
    for i in range(30):
        words = rng.choice(vocab, 12, replace=True)
        rows.append({"doc_id": f"c{i:03d}", "text": f"{i*37} " + " ".join(f"{w}{rng.integers(1000)}" for w in words)})
    return rd.from_items(rows).repartition(4), rows


class TestExactDedup:
    def test_exact(self, ray_session):
        ds, rows = _docs_ds(ray_session)
        out = exact_dedup(ds, content_col="text", id_col="doc_id").to_pandas()
        # 1 (50 dupes) + 2 near-dups (distinct text) + 30 distinct
        assert len(out) == 33
        assert "a000" in set(out["doc_id"])  # min id wins
        assert not set(f"a{i:03d}" for i in range(1, 50)) & set(out["doc_id"])


class TestMinHash:
    def test_signature_jaccard_estimate(self):
        mh = MinHasher(num_perm=128)
        a = "the quick brown fox jumps over the lazy dog"
        b = "the quick brown fox jumped over the lazy dog"
        c = "entirely different text with nothing shared at all"
        sigs = mh.signatures(np.array([a, b, c], dtype=object))
        est_ab = MinHasher.estimate_jaccard(sigs[0], sigs[1])
        est_ac = MinHasher.estimate_jaccard(sigs[0], sigs[2])
        true_ab = ngram_jaccard(a, b)
        assert abs(est_ab - true_ab) < 0.15
        assert est_ac < 0.1 < est_ab

    def test_clusters_group_near_dupes(self, ray_session):
        ds, rows = _docs_ds(ray_session)
        labels = minhash_clusters(ds, rounds=2).to_pandas()
        lab = dict(zip(labels["doc_id"], labels["cluster"]))
        # all exact dupes + near dups share cluster a000
        assert lab["a010"] == "a000"
        assert lab["b000"] == "a000"
        # distinct docs keep their own cluster
        assert lab["c005"] == "c005"

    def test_dedup_keeps_representatives(self, ray_session):
        ds, rows = _docs_ds(ray_session)
        out = minhash_dedup(ds, rounds=2).to_pandas()
        ids = set(out["doc_id"])
        assert "a000" in ids
        assert "a001" not in ids and "b000" not in ids
        assert sum(1 for i in ids if i.startswith("c")) == 30


class TestSimHash:
    def test_identical_distance_zero(self):
        sh = simhash64(np.array(["hello world foo bar", "hello world foo bar"], dtype=object))
        assert hamming64(sh[:1], sh[1:])[0] == 0

    def test_near_vs_far(self):
        a = "the quick brown fox jumps over the lazy dog again and again each day"
        b = a.replace("fox", "wolf")
        c = "totally unrelated content about databases and distributed systems design"
        sh = simhash64(np.array([a, b, c], dtype=object))
        assert hamming64(sh[:1], sh[1:2])[0] < hamming64(sh[:1], sh[2:3])[0]

    def test_ws_mask_matches_str_isspace_exhaustively(self):
        # every Unicode codepoint, grouped into one buffer: the byte mask
        # must mark exactly the bytes of chars where str.isspace() is True
        from geomesa_ray.stages.dedup import _py_ws_mask

        chars = [chr(c) for c in range(0x110000) if not (0xD800 <= c <= 0xDFFF)]
        expected = np.concatenate([
            np.full(len(ch.encode("utf-8")), ch.isspace()) for ch in chars
        ])
        buf = np.frombuffer("".join(chars).encode("utf-8"), dtype=np.uint8)
        got = _py_ws_mask(buf)
        assert np.array_equal(got, expected)

    def test_py_fallback_matches_naive_reference(self):
        # vectorized buffer tokenizer == per-doc str.lower().split() + FNV
        from geomesa_ray.cells.shard import fnv1a_str
        from geomesa_ray.stages.dedup import _mix64, _simhash64_py

        texts = np.array([
            "Héllo WÖRLD straße ĲS",            # full case mapping (ĳ, ß)
            "tab\tand em-space nbsp",   # exotic whitespace
            "",                                    # empty
            "　 \x1c",                   # whitespace-only
            "İstanbul İ i I",                     # dotted capital I (lowers to 2 chars)
            "one",                                 # single token
            "répété répété répété deux",
        ], dtype=object)

        def naive(t):
            toks = str(t).lower().split()
            if not toks:
                return np.uint64(0)
            h = _mix64(fnv1a_str(np.array(toks, dtype=object)))
            sig = np.uint64(0)
            for b in range(64):
                ones = int((((h >> np.uint64(b)) & np.uint64(1))).sum())
                if 2 * ones > len(toks):
                    sig |= np.uint64(1) << np.uint64(b)
            return sig

        got = _simhash64_py(texts)
        want = np.array([naive(t) for t in texts], dtype=np.uint64)
        assert np.array_equal(got, want)
        # chunking must not change results
        got_chunked = _simhash64_py(texts, max_chunk_bytes=16)
        assert np.array_equal(got_chunked, want)

    def test_mixed_batch_routes_per_doc(self):
        # one non-ASCII doc must not change the ASCII docs' signatures
        ascii_docs = np.array([
            "the quick brown fox", "hello world foo bar", "distributed systems",
        ], dtype=object)
        pure = simhash64(ascii_docs)
        mixed = np.concatenate([ascii_docs, np.array(["héllo wörld"], dtype=object)])
        sh = simhash64(mixed)
        assert np.array_equal(sh[:3], pure)
        from geomesa_ray.stages.dedup import _simhash64_py

        assert sh[3] == _simhash64_py(mixed[3:4])[0]

    def test_pairs_pipeline(self, ray_session):
        import ray.data as rd

        a = "the quick brown fox jumps over the lazy dog again and again each day"
        rows = [
            {"doc_id": "x1", "text": a},
            {"doc_id": "x2", "text": a},
            {"doc_id": "y1", "text": "completely different things happening elsewhere in the world today"},
        ]
        out = simhash_pairs(rd.from_items(rows), max_hamming=3).to_pandas()
        assert ("x1", "x2") in set(zip(out["left_id"], out["right_id"]))
        assert not any("y1" in p for p in zip(out["left_id"], out["right_id"]))


class TestJaccardPairs:
    def test_matches_bruteforce_anchor_oracle(self, ray_session):
        from geomesa_ray.stages.dedup import jaccard_pairs

        ds, rows = _docs_ds(ray_session)
        out = jaccard_pairs(ds, threshold=0.5).to_pandas()

        # brute-force oracle: min-shingle anchor + exact set jaccard
        def shingles(t, k=5):
            b = t.encode()
            return sorted({b[i:i + k] for i in range(len(b) - k + 1)})

        sets = {r["doc_id"]: shingles(r["text"]) for r in rows}
        anchors = {d: s[0] for d, s in sets.items() if s}
        expect = {}
        ids = sorted(anchors)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if anchors[a] != anchors[b]:
                    continue
                sa, sb = set(sets[a]), set(sets[b])
                j = len(sa & sb) / len(sa | sb)
                if j >= 0.5:
                    expect[(a, b)] = j
        got = {(l, r): j for l, r, j in zip(out["left_id"], out["right_id"], out["jaccard"])}
        assert got.keys() == expect.keys()
        for kpair, j in expect.items():
            assert got[kpair] == pytest.approx(j, abs=0)
        # the 50 exact dupes all share an anchor -> C(50,2) jaccard-1.0 pairs
        ones = [p for p, j in got.items() if j == 1.0]
        assert len(ones) >= 50 * 49 // 2

    def test_short_and_empty_docs_excluded(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.dedup import jaccard_pairs

        rows = [{"doc_id": "s1", "text": "ab"}, {"doc_id": "s2", "text": "ab"},
                {"doc_id": "s3", "text": ""}]
        out = jaccard_pairs(rd.from_items(rows)).to_pandas()
        assert len(out) == 0  # sub-k docs have no shingles, like SQL's empty series


class TestTextStats:
    def test_counts_and_lang(self):
        import pyarrow as pa

        t = pa.table({"text": [
            "The quick brown fox is in the garden and it was a good day for the animals.",
            "Der Hund ist nicht in der Küche und das ist ein Problem mit den Katzen.",
            "xyzzy 123 @@@ ###",
            "",
        ]})
        out = TextStats()(t)
        langs = out.column("lang_pred").to_pylist()
        assert langs[0] == "en" and langs[1] == "de"
        assert langs[2] == "und"
        q = out.column("quality").to_pylist()
        assert q[0] > 0.5 > q[2]
        assert out.column("n_words").to_pylist()[3] == 0

    def test_fingerprint_normalization(self, ray_session):
        import ray.data as rd

        ds = rd.from_items([
            {"doc_id": "a", "text": "Hello   World"},
            {"doc_id": "b", "text": "hello world"},
            {"doc_id": "c", "text": "something else"},
        ])
        out = fingerprint(ds).to_pandas()
        fp = dict(zip(out["doc_id"], out["fingerprint"]))
        assert fp["a"] == fp["b"] != fp["c"]


class TestSimilarity:
    @pytest.fixture()
    def emb_ds(self, ray_session, sf_small):
        import ray.data as rd

        return rd.read_parquet(f"{sf_small}/embeddings.parquet"), sf_small

    def test_ann_matches_bruteforce(self, ray_session, emb_ds):
        import pyarrow.parquet as pq

        ds, sf = emb_ds
        table = pq.read_table(f"{sf}/embeddings.parquet")
        m = np.stack(table.column("embedding").to_pandas().to_numpy())
        ids = table.column("vec_id").to_numpy()
        queries = m[:3]
        out = ann_topk(ds, queries, ["q0", "q1", "q2"], k=5).to_pandas()
        mn = _normalize(m)
        qn = _normalize(queries.astype(np.float32))
        sims = qn @ mn.T
        for qi, qid in enumerate(["q0", "q1", "q2"]):
            got = out[out["query_id"] == qid].sort_values("cosine", ascending=False)
            expected = np.argsort(-sims[qi])[:5]
            assert set(got["neighbor_id"].astype(int)) == set(ids[expected].tolist())

    def test_cosine_dedup_finds_self_duplicates(self, ray_session, emb_ds):
        import ray.data as rd
        import pyarrow.parquet as pq

        ds, sf = emb_ds
        table = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 50).to_pandas()
        dup = table.copy()
        dup["vec_id"] = dup["vec_id"] + 10_000
        both = pd.concat([table, dup], ignore_index=True)
        d = len(both["embedding"].iloc[0])
        pairs = cosine_dedup_pairs(rd.from_pandas(both), dim=d, threshold=0.999).to_pandas()
        got = set(zip(pairs["left_id"].astype(int), pairs["right_id"].astype(int)))
        for vid in table["vec_id"]:
            assert (vid, vid + 10_000) in got


class TestIVF:
    def test_self_match_and_recall(self, ray_session, sf_small):
        import pyarrow.parquet as pq
        import ray.data as rd

        from geomesa_ray.stages.similarity import ann_topk, ivf_topk

        ds = rd.read_parquet(f"{sf_small}/embeddings.parquet")
        table = pq.read_table(f"{sf_small}/embeddings.parquet")
        m = np.stack(table.column("embedding").to_pandas().to_numpy())
        queries = m[:5]
        qids = [f"q{i}" for i in range(5)]
        ivf = ivf_topk(ds, queries, qids, k=10, n_lists=16, nprobe=4).to_pandas()
        brute = ann_topk(ds, queries, qids, k=10).to_pandas()
        # each query's own vector is in a probed list -> top-1 is itself
        for i, qid in enumerate(qids):
            top = ivf[ivf["query_id"] == qid].sort_values("cosine", ascending=False)
            assert int(top["neighbor_id"].iloc[0]) == int(table.column("vec_id")[i].as_py())
        # recall@10 vs brute force is reasonable for nprobe=4/16
        recalls = []
        for qid in qids:
            b = set(brute[brute["query_id"] == qid]["neighbor_id"].astype(int))
            a = set(ivf[ivf["query_id"] == qid]["neighbor_id"].astype(int))
            recalls.append(len(a & b) / len(b))
        assert np.mean(recalls) >= 0.5

    def test_cosine_hot_bucket_subsplit_bounded(self, ray_session):
        """Degenerate corpus: every vector lands in ONE LSH bucket (all near
        one direction), bucket size >> max_bucket. The sub-split must keep
        per-chunk all-pairs bounded while still finding planted duplicates."""
        import ray.data as rd

        from geomesa_ray.stages.similarity import _normalize, cosine_dedup_pairs

        rng = np.random.default_rng(11)
        base = _normalize(rng.standard_normal((1, 8)).astype(np.float32))
        vecs = _normalize(base + 0.01 * rng.standard_normal((600, 8)).astype(np.float32))
        dup = vecs[:40].copy()
        all_v = np.concatenate([vecs, dup])
        ids = np.concatenate([np.arange(600), np.arange(600, 640)])
        df = pd.DataFrame({"vec_id": ids, "embedding": [v for v in all_v]})
        pairs = cosine_dedup_pairs(
            rd.from_pandas(df), dim=8, threshold=0.9999999, n_bits=4, max_bucket=64
        ).to_pandas()
        got = set(zip(pairs["left_id"].astype(int), pairs["right_id"].astype(int)))
        # exact duplicates share every hyperplane sign -> survive the split
        found = sum((i, 600 + i) in got for i in range(40))
        assert found == 40

    def test_exact_mode_equals_bruteforce_on_clustered_sorted_corpus(self, ray_session):
        """ivf_topk_exact must return EXACTLY the brute-force top-k even when
        nprobe=1 misses the right lists (forcing triangle-inequality
        re-probe rounds), on a corpus that is clustered AND sorted by
        cluster (the adversarial layout for a prefix training sample)."""
        import ray.data as rd

        from geomesa_ray.stages.similarity import _normalize, ann_topk, ivf_topk_exact

        rng = np.random.default_rng(3)
        centers = _normalize(rng.standard_normal((8, 16)).astype(np.float32))
        vecs = np.concatenate([
            _normalize(c + 0.15 * rng.standard_normal((60, 16)).astype(np.float32))
            for c in centers
        ])  # sorted by cluster: rows 0..59 cluster 0, etc.
        df = pd.DataFrame({"vec_id": np.arange(len(vecs)),
                           "embedding": [v for v in vecs]})
        ds = rd.from_pandas(df)
        queries = vecs[[5, 130, 300]]
        qids = ["q0", "q1", "q2"]
        exact = ivf_topk_exact(ds, queries, qids, k=7, n_lists=8, nprobe=1,
                               sample_rows=200).to_pandas()
        brute = ann_topk(ds, queries, qids, k=7).to_pandas()
        for qid in qids:
            e = exact[exact["query_id"] == qid].sort_values(
                ["cosine", "neighbor_id"], ascending=[False, True])
            b = brute[brute["query_id"] == qid].sort_values(
                ["cosine", "neighbor_id"], ascending=[False, True])
            assert e["neighbor_id"].astype(int).tolist() == b["neighbor_id"].astype(int).tolist()


class TestIVFBuildSearch:
    """Ingest-partitioned IVF: search reads ONLY probed list partitions and
    matches the equivalent filtered brute force."""

    def test_build_search_matches_filtered_bruteforce(self, ray_session, tmp_path):
        import os

        import ray.data as rd

        from geomesa_ray.stages.similarity import (
            IVFIndex,
            _normalize,
            ann_topk,
            ivf_build,
            ivf_search,
        )

        rng = np.random.default_rng(9)
        vecs = rng.standard_normal((2000, 16)).astype(np.float32)
        df = pd.DataFrame({"vec_id": np.arange(2000), "embedding": list(vecs)})
        ds = rd.from_pandas(df).repartition(4)
        out = str(tmp_path / "ivf")
        ivf_build(ds, out, n_lists=16, sample_rows=2000)
        # partitioned layout exists
        parts = [p for p in os.listdir(out) if p.startswith("ivf_list=")]
        assert len(parts) >= 8

        q = vecs[:3]
        got = ivf_search(out, q, ["a", "b", "c"], k=5, nprobe=4).to_pandas()
        assert set(got["query_id"]) == {"a", "b", "c"}
        # each query's own vector (cosine 1.0) must be in a probed list
        for qid, i in zip(["a", "b", "c"], range(3)):
            mine = got[got["query_id"] == qid]
            assert str(i) in set(mine["neighbor_id"].astype(str))

    def test_search_reads_only_probed_partitions(self, ray_session, tmp_path):
        import glob

        import ray.data as rd

        from geomesa_ray.stages.similarity import ivf_build, ivf_search

        rng = np.random.default_rng(10)
        vecs = rng.standard_normal((500, 8)).astype(np.float32)
        df = pd.DataFrame({"vec_id": np.arange(500), "embedding": list(vecs)})
        out = str(tmp_path / "ivf2")
        ivf_build(rd.from_pandas(df), out, n_lists=8, sample_rows=500)
        n_lists = len(glob.glob(str(tmp_path / "ivf2" / "ivf_list=*")))
        # nprobe=1: strictly fewer partitions read than exist
        got = ivf_search(out, vecs[:1], ["q"], k=3, nprobe=1).to_pandas()
        assert len(got) == 3 and n_lists > 1


class TestIVFCertified:
    """Multi-probe ladder on the stored layout (round-5 ask #4): the
    triangle-inequality bound certifies brute-force-equal results, probing
    only as many list partitions as the data's clusterability requires."""

    def _layout(self, tmp_path, n=1500, d=12, n_lists=12, seed=4):
        import ray.data as rd

        from geomesa_ray.stages.similarity import ivf_build

        rng = np.random.default_rng(seed)
        vecs = rng.standard_normal((n, d)).astype(np.float32)  # uniform
        df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(vecs)})
        out = str(tmp_path / "ivfc")
        ivf_build(rd.from_pandas(df).repartition(3), out, n_lists=n_lists,
                  sample_rows=n)
        return out, vecs, df

    def test_certified_equals_bruteforce_on_uniform(self, ray_session, tmp_path):
        import ray.data as rd

        from geomesa_ray.stages.similarity import ann_topk, ivf_search_certified

        out, vecs, df = self._layout(tmp_path)
        q = vecs[:3] + 0.01
        qids = ["a", "b", "c"]
        brute = ann_topk(rd.from_pandas(df), q, qids, k=6).to_pandas()
        got, info = ivf_search_certified(out, q, qids, k=6, nprobe=2)
        assert info["certified"] is True
        key = ["query_id", "neighbor_id"]
        b = brute.sort_values(key).reset_index(drop=True)
        g = got.sort_values(key).reset_index(drop=True)
        assert list(b["neighbor_id"]) == list(g["neighbor_id"])
        assert np.allclose(b["cosine"].to_numpy(), g["cosine"].to_numpy())

    def test_budget_caps_lists_probed(self, ray_session, tmp_path):
        from geomesa_ray.stages.similarity import ivf_search_certified

        out, vecs, _ = self._layout(tmp_path)
        got, info = ivf_search_certified(out, vecs[:1], ["q"], k=5,
                                         nprobe=2, probe_budget=4)
        assert info["lists_probed"] <= 4
        assert len(got) == 5
        # uniform corpus at 4/12 lists: certification should NOT be claimed
        full, finfo = ivf_search_certified(out, vecs[:1], ["q"], k=5, nprobe=2)
        if finfo["lists_probed"] > 4:
            assert info["certified"] is False

    def test_radii_required(self, ray_session, tmp_path):
        import os

        import pytest as _pytest

        from geomesa_ray.stages.similarity import ivf_search_certified

        out, vecs, _ = self._layout(tmp_path)
        os.remove(os.path.join(out, "_radii.npy"))
        with _pytest.raises(FileNotFoundError):
            ivf_search_certified(out, vecs[:1], ["q"], k=3)


class TestWinnowing:
    def test_shared_substring_guarantee(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.text import winnow_fingerprints

        # winnowing guarantee: a shared substring of length >= w + k - 1 = 8
        # chars contributes at least one shared fingerprint
        shared = "the quick brown fox jumps"
        docs = pd.DataFrame({
            "doc_id": ["a", "b", "c"],
            "text": [f"XXXX {shared} YYYY", f"zzz {shared} qqq",
                     "completely different content here"],
        })
        out = winnow_fingerprints(rd.from_pandas(docs), k=5, w=4).to_pandas()
        fa = set(out[out.doc_id == "a"]["fp"])
        fb = set(out[out.doc_id == "b"]["fp"])
        fc = set(out[out.doc_id == "c"]["fp"])
        assert fa & fb
        assert not (fa & fc) and not (fb & fc)

    def test_short_doc_paths(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.text import winnow_fingerprints

        docs = pd.DataFrame({
            "doc_id": ["tiny", "few"],
            "text": ["abc", "abcdef"],  # < k chars; k<=len so <w hashes
        })
        out = winnow_fingerprints(rd.from_pandas(docs), k=5, w=4).to_pandas()
        # each short doc still emits exactly one fingerprint
        assert out.groupby("doc_id").size().to_dict() == {"tiny": 1, "few": 1}

    def test_case_insensitive(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.text import winnow_fingerprints

        docs = pd.DataFrame({"doc_id": ["u", "l"],
                             "text": ["Hello World Document", "hello world document"]})
        out = winnow_fingerprints(rd.from_pandas(docs), k=5, w=4).to_pandas()
        assert set(out[out.doc_id == "u"]["fp"]) == set(out[out.doc_id == "l"]["fp"])
