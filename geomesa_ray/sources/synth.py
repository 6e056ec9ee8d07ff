"""Deterministic synthesizer for the interleaved text+media document corpus.

The engine's primary input shape (per BASELINE.json input_hint):

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string,
                        offset: int32>>

Geometry rides inside ``kind == "geo"`` spans as WKT point text — the analog
of the reference's converter inputs where geometry is parsed out of
delimited/JSON records (geomesa-convert/.../convert2/AbstractConverter.scala).
The corpus is seeded + sharded: shard k of n is a pure function of
(seed, k), so generation parallelizes over Ray tasks and any prefix of
shards is reproducible on its own.

Spatial skew is built in deliberately: half the geo spans cluster around a
fixed set of "city" hot spots so that hot-cell salting has something to do.

The environment has no Lance binding; the corpus is written as sharded
Parquet with the identical logical schema (one directory per shard —
the resumable-output unit).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
CORPUS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])

# fixed hot spots (lon, lat): cities that concentrate geo spans -> hot cells
HOT_CITIES = np.array(
    [
        (-74.0, 40.7),   # New York
        (2.35, 48.85),   # Paris
        (139.69, 35.68), # Tokyo
        (-0.13, 51.51),  # London
        (116.40, 39.90), # Beijing
        (-118.24, 34.05),# LA
        (77.21, 28.61),  # Delhi
        (-43.17, -22.91),# Rio
        (151.21, -33.87),# Sydney
        (31.23, 30.04),  # Cairo
    ],
    dtype=np.float64,
)

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog data stream cell index query "
    "polygon point track vessel sensor city river coast mountain valley "
    "north south east west alpha beta gamma delta epsilon record батч 記録 "
    "observation report signal noise cluster shard batch merge".split(),
    dtype=object,
)


def synthesize_shard(n_docs: int, seed: int, shard: int, n_shards: int,
                     start: int | None = None) -> pa.Table:
    """Generate one shard's documents; pure function of (seed, shard).

    ``start`` is the shard's global doc-id offset; when omitted it assumes
    full shards (start = shard * n_docs). Callers with a partial final
    shard MUST pass the stride-based start or ids collide across shards."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, shard]))
    if start is None:
        start = shard * n_docs
    doc_idx = np.arange(start, start + n_docs, dtype=np.int64)

    span_counts = rng.integers(1, 9, n_docs)
    total = int(span_counts.sum())
    parent = np.repeat(np.arange(n_docs), span_counts)

    # span kinds: 55% text, 30% geo, 15% media
    r = rng.random(total)
    kind_code = np.where(r < 0.55, 0, np.where(r < 0.85, 1, 2))

    # geo coords: 50% clustered on hot cities (sigma 0.5 deg), 50% uniform
    n_geo = int((kind_code == 1).sum())
    hot = rng.random(n_geo) < 0.5
    city = HOT_CITIES[rng.integers(0, len(HOT_CITIES), n_geo)]
    glon = np.where(hot, city[:, 0] + rng.normal(0, 0.5, n_geo), rng.uniform(-180, 180, n_geo))
    glat = np.where(hot, city[:, 1] + rng.normal(0, 0.5, n_geo), rng.uniform(-90, 90, n_geo))
    glon = np.clip(glon, -180.0, 180.0)
    glat = np.clip(glat, -90.0, 90.0)

    # text spans: 3-8 words sampled from the vocab
    n_text = int((kind_code == 0).sum())
    wc = rng.integers(3, 9, n_text)
    words = _WORDS[rng.integers(0, len(_WORDS), int(wc.sum()))]
    bounds = np.zeros(n_text + 1, dtype=np.int64)
    np.cumsum(wc, out=bounds[1:])
    texts = np.array([" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n_text)], dtype=object)

    n_media = int((kind_code == 2).sum())
    media_ids = rng.integers(0, 2**63 - 1, n_media)

    text_col = np.empty(total, dtype=object)
    media_col = np.empty(total, dtype=object)
    media_col[:] = ""
    text_col[kind_code == 0] = texts
    text_col[kind_code == 1] = np.array(
        [f"POINT ({x:.6f} {y:.6f})" for x, y in zip(glon, glat)], dtype=object
    )
    text_col[kind_code == 2] = ""
    media_col[kind_code == 2] = np.array([f"img://{m:016x}" for m in media_ids], dtype=object)

    kind_col = np.array(["text", "geo", "media"], dtype=object)[kind_code]

    # offsets: cumulative char offset within each doc
    lens = np.array([len(t) for t in text_col], dtype=np.int64)
    csum = np.concatenate([[0], np.cumsum(lens)[:-1]])
    doc_starts = np.concatenate([[0], np.cumsum(span_counts)[:-1]])
    offsets_in_doc = csum - np.repeat(csum[doc_starts], span_counts)

    struct_arr = pa.StructArray.from_arrays(
        [
            pa.array(kind_col, type=pa.string()),
            pa.array(text_col, type=pa.string()),
            pa.array(media_col, type=pa.string()),
            pa.array(offsets_in_doc.astype(np.int32), type=pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    list_offsets = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum(span_counts, out=list_offsets[1:])
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), struct_arr)
    doc_ids = pa.array([f"doc-{i:012d}" for i in doc_idx], type=pa.string())
    return pa.Table.from_arrays([doc_ids, spans], schema=CORPUS_SCHEMA)


def corpus_path(n_docs: int, seed: int = 42, base: str = "/tmp/graft_corpus", n_shards: int = 8) -> str:
    return os.path.join(base, f"n{n_docs}_s{seed}_p{n_shards}")


def synthesize_corpus(
    n_docs: int,
    seed: int = 42,
    base: str = "/tmp/graft_corpus",
    n_shards: int = 8,
    use_ray: bool = False,
) -> str:
    """Write the corpus as sharded parquet; returns the directory. Idempotent:
    returns immediately if the directory is complete (shard-count marker)."""
    out = corpus_path(n_docs, seed, base, n_shards)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    per_shard = (n_docs + n_shards - 1) // n_shards
    if use_ray:
        import ray

        @ray.remote
        def _gen(shard: int) -> str:
            n = max(0, min(per_shard, n_docs - shard * per_shard))
            if n == 0:
                return ""
            table = synthesize_shard(n, seed, shard, n_shards, start=shard * per_shard)
            path = os.path.join(out, f"shard-{shard:04d}.parquet")
            pq.write_table(table, path + f".tmp{os.getpid()}")
            os.replace(path + f".tmp{os.getpid()}", path)  # atomic: no partial reads
            return path

        ray.get([_gen.remote(s) for s in range(n_shards)])
    else:
        for shard in range(n_shards):
            n = max(0, min(per_shard, n_docs - shard * per_shard))
            if n == 0:
                continue
            table = synthesize_shard(n, seed, shard, n_shards, start=shard * per_shard)
            path = os.path.join(out, f"shard-{shard:04d}.parquet")
            pq.write_table(table, path + f".tmp{os.getpid()}")
            os.replace(path + f".tmp{os.getpid()}", path)  # atomic: no partial reads
    with open(marker, "w") as f:
        f.write(f"{n_shards}\n")
    return out
