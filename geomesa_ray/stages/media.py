"""Multimodal (image/audio/video) stage plumbing + native-format decode.

Media rides in the corpus as opaque references inside ``kind == "media"``
spans (``media_ref`` like ``img://<hash>``); payload bytes travel as a
``binary`` column keyed by media_ref. Decode tiers:

- ``MediaDecode`` (REAL): images decode via in-repo pure-numpy codecs —
  PPM/PGM (``stages/codecs.py``), PNG (``stages/png.py``, stdlib zlib),
  BMP + GIF/LZW (``stages/gifbmp.py``), baseline JPEG
  (``stages/jpeg.py``), TIFF/GeoTIFF (``sources/geotiff.py``); audio via
  RIFF/WAVE with PCM16, G.711 mu-law / A-law and IMA ADPCM tags
  (``stages/audio.py``), MPEG-1 Layer I/II (``stages/mp2.py``; ISO
  bit layer + derived NPR filterbank, see its docstring); video via
  YUV4MPEG2 and MJPEG-AVI frame sampling (``stages/video.py``).
- anything else (e.g. mp3 Layer III / h264 — entropy formats whose
  remaining tables have no pure-math spec path here): rows fall back
  to deterministic ref-hash features with ``decoded=False`` so
  downstream filters can route them (the documented integration point
  for an external codec).
- ``MediaFeatureExtract`` with ``fake=True``: span-explode plumbing with
  hash features only (bench/tests without payloads).

Batch sizing: media batches must be small (payload x batch_size x
concurrency bounded by worker heap — SURVEY §4 memory row); default 256.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class MediaFeatureExtract:
    """Actor-pool stage: explode media spans -> one row per media object
    with a feature vector + metadata."""

    def __init__(self, dim: int = 64, fake: bool = True, spans_col: str = "spans",
                 id_col: str = "doc_id"):
        if not fake:
            raise NotImplementedError(
                "span-explode with inline decode is not wired here; use "
                "stages.media.media_pipeline (explode -> payload attach -> "
                "decode_media -> rollup) for the real end-to-end path"
            )
        self.dim = dim
        self.spans_col = spans_col
        self.id_col = id_col

    def _features(self, refs: np.ndarray) -> np.ndarray:
        """Deterministic pseudo-features from the ref hash (stand-in for a
        decoded embedding; same shape/dtype as the real path would emit)."""
        from geomesa_ray.cells.shard import fnv1a_str
        from geomesa_ray.stages.stats import _mix64

        h = _mix64(fnv1a_str(refs))
        # expand each 64-bit hash into `dim` floats via a counter hash chain
        out = np.empty((len(refs), self.dim), dtype=np.float32)
        x = h.copy()
        for d in range(self.dim):
            x = _mix64(x + np.uint64(d + 1))
            out[:, d] = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53) - 0.5
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column(self.spans_col)
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
        refs = flat.field("media_ref").to_numpy(zero_copy_only=False)[is_media]
        doc_idx = parents[is_media]
        if len(refs) == 0:
            return pa.table({
                self.id_col: pa.array([], batch.schema.field(self.id_col).type),
                "media_ref": pa.array([], pa.string()),
                "features": pa.array([], pa.list_(pa.float32())),
                "feature_dim": pa.array([], pa.int32()),
            })
        feats = self._features(refs.astype(object))
        ids = batch.column(self.id_col).take(pa.array(doc_idx))
        offsets = pa.array(np.arange(0, (len(refs) + 1) * self.dim, self.dim, dtype=np.int32))
        features = pa.ListArray.from_arrays(offsets, pa.array(feats.ravel(), type=pa.float32()))
        return pa.table({
            self.id_col: ids,
            "media_ref": pa.array(refs.astype(str)),
            "features": features,
            "feature_dim": pa.array(np.full(len(refs), self.dim, dtype=np.int32)),
        })


class MediaDecode:
    """Actor-pool stage over (media_ref, payload: binary) rows: REAL decode
    for the engine's native formats, honest fallback elsewhere.

    Output: media_ref, features list<float32>, feature_dim, media_kind
    ('image' | 'audio' | 'unknown'), decoded (bool), plus integer decode
    metadata — width/height (image), n_samples/sample_rate (audio) — and
    exact content checksums px_sum / sample_sum (sum of decoded uint8
    pixels / int16 samples). The checksums are computed from the DECODED
    arrays, so a header-offset or endianness bug changes them; they double
    as the SQL-oracle surface (FIXTURES.md FP-safety: all integers)."""

    def __init__(self, dim: int = 64, payload_col: str = "payload",
                 ref_col: str = "media_ref"):
        from geomesa_ray.stages.codecs import (
            audio_features,
            decode_ppm,
            decode_wav,
            image_features,
        )
        from geomesa_ray.stages.gifbmp import decode_bmp, decode_gif
        from geomesa_ray.stages.jpeg import decode_jpeg
        from geomesa_ray.stages.png import decode_png
        from geomesa_ray.stages.video import video_frame_features

        self.dim = dim
        self.grid = max(2, int(np.sqrt(dim)))
        self.payload_col = payload_col
        self.ref_col = ref_col
        self._decode_ppm = decode_ppm
        self._decode_png = decode_png
        self._decode_bmp = decode_bmp
        self._decode_gif = decode_gif
        self._decode_jpeg = decode_jpeg
        self._decode_wav = decode_wav
        self._video_features = video_frame_features
        self._image_features = image_features
        self._audio_features = audio_features

    def _fallback(self, refs: np.ndarray) -> np.ndarray:
        from geomesa_ray.cells.shard import fnv1a_str
        from geomesa_ray.stages.stats import _mix64

        h = _mix64(fnv1a_str(refs))
        out = np.empty((len(refs), self.dim), dtype=np.float32)
        x = h.copy()
        for d in range(self.dim):
            x = _mix64(x + np.uint64(d + 1))
            out[:, d] = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53) - 0.5
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        refs = batch.column(self.ref_col).to_numpy(zero_copy_only=False).astype(object)
        n = len(payloads)
        feats = np.zeros((n, self.dim), dtype=np.float32)
        kinds = np.empty(n, dtype=object)
        decoded = np.zeros(n, dtype=bool)
        width = np.zeros(n, dtype=np.int32)
        height = np.zeros(n, dtype=np.int32)
        n_samples = np.zeros(n, dtype=np.int64)
        sample_rate = np.zeros(n, dtype=np.int32)
        px_sum = np.zeros(n, dtype=np.int64)
        sample_sum = np.zeros(n, dtype=np.int64)
        fb = None
        for i, blob in enumerate(payloads):
            blob = bytes(blob) if blob is not None else b""
            try:
                if blob.startswith((b"P6", b"P5", b"\x89PNG", b"BM", b"GIF8",
                                    b"\xFF\xD8", b"II*\x00", b"MM\x00*")):
                    if blob.startswith(b"\x89PNG"):
                        img = self._decode_png(blob)
                    elif blob.startswith(b"BM"):
                        img = self._decode_bmp(blob)
                    elif blob.startswith(b"GIF8"):
                        img = self._decode_gif(blob)
                    elif blob.startswith(b"\xFF\xD8"):
                        img = self._decode_jpeg(blob)
                    elif blob.startswith((b"II*\x00", b"MM\x00*")):
                        from geomesa_ray.sources.geotiff import decode_geotiff

                        img, _ = decode_geotiff(blob)
                    else:
                        img = self._decode_ppm(blob)
                    f = self._image_features(img, grid=self.grid)
                    feats[i, : len(f)] = f[: self.dim]
                    kinds[i], decoded[i] = "image", True
                    height[i], width[i] = img.shape[0], img.shape[1]
                    px_sum[i] = int(img.astype(np.int64).sum())
                elif ((blob.startswith(b"RIFF") and blob[8:12] == b"WAVE")
                      or blob.startswith(b"fLaC")
                      or (len(blob) > 1 and blob[0] == 0xFF
                          and (blob[1] & 0xF6) in (0xF4, 0xF6))):
                    if blob.startswith(b"fLaC"):
                        from geomesa_ray.stages.flac import decode_flac

                        samples, rate = decode_flac(blob)
                    elif blob[0] == 0xFF:
                        # MPEG-1 Layer I/II sync (Layer III stays in the
                        # fallback tier: 0xFF with layer bits 01)
                        from geomesa_ray.stages.mp2 import decode_mp2

                        samples, rate = decode_mp2(blob)
                        if samples.ndim == 2:
                            samples = samples[:, 0]
                    else:
                        samples, rate = self._decode_wav(blob)
                    feats[i] = self._audio_features(samples, dim=self.dim)
                    kinds[i], decoded[i] = "audio", True
                    n_samples[i], sample_rate[i] = samples.shape[0], rate
                    sample_sum[i] = int(samples.astype(np.int64).sum())
                elif (blob.startswith(b"YUV4MPEG2")
                      or (blob.startswith(b"RIFF") and blob[8:12] == b"AVI ")):
                    f, vw, vh, nf, px = self._video_features(
                        blob, dim=self.dim, sample_every=4, max_frames=16)
                    feats[i, : len(f)] = f[: self.dim]
                    kinds[i], decoded[i] = "video", True
                    width[i], height[i] = vw, vh
                    n_samples[i] = nf  # frame count rides the sample column
                    px_sum[i] = px
                else:
                    raise ValueError("unknown container")
            except Exception:
                if fb is None:
                    fb = self._fallback(refs)
                feats[i] = fb[i]
                kinds[i] = "unknown"
        offsets = pa.array(np.arange(0, (n + 1) * self.dim, self.dim, dtype=np.int32))
        features = pa.ListArray.from_arrays(offsets, pa.array(feats.ravel(), type=pa.float32()))
        out = pa.table({
            self.ref_col: pa.array(refs.astype(str)),
            "features": features,
            "feature_dim": pa.array(np.full(n, self.dim, dtype=np.int32)),
            "media_kind": pa.array(kinds, type=pa.string()),
            "decoded": pa.array(decoded),
            "width": pa.array(width),
            "height": pa.array(height),
            "px_sum": pa.array(px_sum),
            "n_samples": pa.array(n_samples),
            "sample_rate": pa.array(sample_rate),
            "sample_sum": pa.array(sample_sum),
        })
        # carry non-media columns through one-to-one (e.g. doc_id in the
        # end-to-end pipeline) so the rollup never needs a second join
        for name in batch.column_names:
            if name not in (self.ref_col, self.payload_col) and name not in out.column_names:
                out = out.append_column(name, batch.column(name))
        return out


def decode_media(ds, dim: int = 64, batch_size: int = 64, concurrency=None,
                 payload_col: str = "payload", ref_col: str = "media_ref"):
    """Dataset[(media_ref, payload binary)] -> decoded feature rows (small
    batches: payloads are the large side).

    MediaDecode's state is CHEAP (function refs only), so this is a
    holder-fn TASK stage, not an actor pool — an actor class here fuses
    with upstream chains (e.g. the payload-attach co-group) into one
    serialized actor op (the round-3 measured 2x pattern; CLAUDE.md)."""
    from geomesa_ray.util import holder_fn

    return ds.map_batches(
        holder_fn(MediaDecode, dim=dim, payload_col=payload_col,
                  ref_col=ref_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def explode_media_refs(ds, spans_col: str = "spans", id_col: str = "doc_id"):
    """Interleaved docs -> one row per ``kind == "media"`` span:
    (doc_id, media_ref). Vectorized Arrow list-flatten, no row loop."""

    def fn(batch: pa.Table) -> pa.Table:
        spans = batch.column(spans_col)
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        keep = pa.array(np.nonzero(
            pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False))[0])
        return pa.table({
            id_col: batch.column(id_col).take(parents.take(keep)),
            "media_ref": flat.field("media_ref").take(keep),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def media_pipeline(docs_ds, payloads_ds, dim: int = 16, batch_size: int = 64,
                   concurrency=None, id_col: str = "doc_id"):
    """End-to-end multimodal path over interleaved documents: explode media
    spans -> bucketed payload attach (binary payloads stay out of acero;
    ``joins.attach_wide`` co-groups on coarse hash buckets) -> actor-pool
    decode -> per-doc integer rollup.

    Returns Dataset[(doc_id, n_media, n_decoded, px_total)] — all-integer
    columns so the SQL oracle comparison is FP-exact. Scale shape: one
    coarse-bucket shuffle for the attach, one for the rollup merge; decode
    runs in small batches (payloads are the large side); nothing
    materializes on the driver."""
    from geomesa_ray.cells.shard import fnv1a_str
    from geomesa_ray.stages.joins import attach_wide

    refs = explode_media_refs(docs_ds, id_col=id_col)
    withp = attach_wide(refs, payloads_ds, on="media_ref")
    decoded = decode_media(withp, dim=dim, batch_size=batch_size,
                           concurrency=concurrency)

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow partial: decoded/px_sum come from dense numpy arrays
        # (never null), so the default non-null "count" equals row count
        slim = pa.table({
            id_col: t.column(id_col),
            "decoded": t.column("decoded").cast(pa.int64()),
            "px_sum": t.column("px_sum"),
        })
        g = slim.group_by(id_col, use_threads=False).aggregate(
            [("px_sum", "count"), ("decoded", "sum"), ("px_sum", "sum")]
        )
        return pa.table({
            id_col: g.column(id_col),
            "n_media": g.column("px_sum_count"),
            "n_decoded": g.column("decoded_sum"),
            "px_total": g.column("px_sum_sum"),
        })

    B = _rollup_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = fnv1a_str(t.column(id_col).to_numpy(zero_copy_only=False).astype(object))
        return t.append_column("__b", pa.array((h % np.uint64(B)).astype(np.int32)))

    def merge(g):
        out = (g.groupby(id_col, sort=False)
                .agg(n_media=("n_media", "sum"),
                     n_decoded=("n_decoded", "sum"),
                     px_total=("px_total", "sum"))
                .reset_index())
        return out

    return (decoded.map_batches(partial, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(merge, batch_format="pandas"))


def _rollup_buckets() -> int:
    try:
        import ray

        return max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 32


def media_features(ds, dim: int = 64, fake: bool = True, batch_size: int = 256,
                   concurrency=None):
    """Holder-fn TASK stage (state is just dim/flags — an actor pool here
    fuses with the upstream read and serializes it; see decode_media)."""
    from geomesa_ray.util import holder_fn

    return ds.map_batches(
        holder_fn(MediaFeatureExtract, dim=dim, fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
