"""Text analysis stages: language ID, quality scoring, token counting,
document fingerprinting.

First-class training-data operators (no analog needed in the reference —
the converter function DSL, §2.4, covers string transforms; these extend it
for corpus curation). All vectorized pandas/numpy; regexes compiled once per
actor in ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from geomesa_ray.cells.shard import fnv1a_str
from geomesa_ray.stages.stats import _mix64

# Stopword profiles for the n-gram/stopword language heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was", "for", "on", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "nicht", "ein", "eine"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "dans", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "en", "un", "una", "es", "por", "con"},
}


class TextStats:
    """map_batches stage: adds n_tokens, quality, lang columns."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"\w+", re.UNICODE)
        # BPE-ish subword splitter: words, numbers, or single non-space marks
        self.token_re = re.compile(r"\w+|[^\w\s]", re.UNICODE)
        self.punct_re = re.compile(r"[^\w\s]", re.UNICODE)
        self.langs = list(_LANG_STOPWORDS)
        self.stop_sets = [_LANG_STOPWORDS[l] for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column(self.text_col).to_numpy(zero_copy_only=False)).astype("string")
        s = s.fillna("")
        n_chars = s.str.len().to_numpy(dtype=np.int64)
        n_tokens = s.str.count(self.token_re).to_numpy(dtype=np.int64)
        n_words = s.str.count(self.word_re).to_numpy(dtype=np.int64)
        n_punct = s.str.count(self.punct_re).to_numpy(dtype=np.int64)

        # vectorized stopword hits: explode the token lists once, run one
        # isin per language over the flat array, sum back per row (the
        # per-row Python map was the stage's hot spot)
        lower_words = s.str.lower().str.findall(self.word_re)
        exploded = lower_words.explode()
        flat = exploded.to_numpy(dtype=object)
        row_idx = exploded.index.to_numpy()
        stop_hits = np.zeros((len(self.langs), len(s)), dtype=np.float64)
        if len(flat):
            for li, stops in enumerate(self.stop_sets):
                hits = pd.Series(flat).isin(stops).to_numpy()
                np.add.at(stop_hits[li], row_idx[hits], 1.0)
        denom = np.maximum(n_words, 1)
        ratios = stop_hits / denom
        best = ratios.argmax(axis=0)
        best_ratio = ratios[best, np.arange(len(s))]
        lang = np.where(best_ratio >= 0.08, np.array(self.langs, dtype=object)[best], "und")

        # quality: word-length sanity + punctuation ratio + stopword signal
        avg_wlen = np.where(n_words > 0, (n_chars - n_punct) / denom, 0.0)
        punct_ratio = n_punct / np.maximum(n_chars, 1)
        q_len = np.clip(n_words / 20.0, 0, 1)                      # enough words
        q_wlen = np.exp(-0.5 * ((avg_wlen - 5.5) / 3.0) ** 2)      # plausible word length
        q_punct = np.clip(1.0 - 3.0 * punct_ratio, 0, 1)           # not symbol soup
        q_stop = np.clip(best_ratio / 0.3, 0, 1)                   # natural-language signal
        quality = 0.3 * q_len + 0.2 * q_wlen + 0.2 * q_punct + 0.3 * q_stop

        return (
            batch.append_column("n_tokens", pa.array(n_tokens))
            .append_column("n_words", pa.array(n_words))
            .append_column("quality", pa.array(quality))
            .append_column("lang_pred", pa.array(lang.astype(str)))
        )


def fingerprint(ds, text_col: str = "text", normalize: bool = True):
    """Adds a 64-bit content fingerprint (normalized whitespace/case) —
    deterministic doc identity for exact dedup / lineage."""

    def fn(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column(text_col).to_numpy(zero_copy_only=False)).astype("string").fillna("")
        if normalize:
            s = s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
        from geomesa_ray.cells.shard import hash64_str

        h = hash64_str(s.to_numpy(dtype=object))
        return batch.append_column("fingerprint", pa.array(h.astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def text_stats(ds, text_col: str = "text", concurrency=None):
    from geomesa_ray.util import default_concurrency, holder_fn

    return ds.map_batches(
        holder_fn(TextStats, text_col=text_col),
        batch_format="pyarrow",
    )


def winnow_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 5, w: int = 4):
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken,
    SIGMOD'03 — the standard local near-dup/plagiarism fingerprint):
    position-ordered k-char rolling hashes (lowercased utf-8, FNV-1a +
    splitmix64, same chain as the minhash shingles), the MINIMUM of every
    sliding window of ``w`` consecutive hashes, distinct per doc. Any
    substring shared between two docs of length >= w + k - 1 contributes at
    least one shared fingerprint. Docs with fewer than ``w`` hashes emit
    the min of what they have; docs shorter than ``k`` chars hash whole.

    Output: Dataset[(id_col, fp int64)] — one distributed map pass, no
    shuffle (dedup of the per-doc set happens inside the batch)."""
    import pyarrow as pa

    from geomesa_ray.cells.shard import fnv1a_str
    from geomesa_ray.stages.dedup import _mix64

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        enc = [str(x).lower().encode("utf-8") for x in texts]
        out_doc: list[np.ndarray] = []
        out_fp: list[np.ndarray] = []
        lens = np.array([len(b) for b in enc], dtype=np.int64)
        short = np.nonzero(lens < k)[0]
        if len(short):
            out_doc.append(short)
            out_fp.append(_mix64(fnv1a_str(
                np.array([str(texts[i]) for i in short], dtype=object))))
        long_idx = np.nonzero(lens >= k)[0]
        if len(long_idx):
            buf = np.frombuffer(b"".join(enc[i] for i in long_idx), dtype=np.uint8)
            llens = lens[long_idx]
            ends = np.cumsum(llens)
            starts = ends - llens
            win = np.lib.stride_tricks.sliding_window_view(buf, k).astype(np.uint64)
            h = np.full(len(win), np.uint64(0xCBF29CE484222325))
            for col in range(k):
                h = (h ^ win[:, col]) * np.uint64(0x100000001B3)
            h = _mix64(h)
            pos = np.arange(len(win), dtype=np.int64)
            doc = np.searchsorted(starts, pos, side="right") - 1
            valid = pos + k <= ends[doc]
            doc, h = doc[valid], h[valid]  # position-ordered per doc
            if len(h) >= w:
                hw = np.lib.stride_tricks.sliding_window_view(h, w)
                m = hw.min(axis=1)
                dsame = doc[: len(doc) - w + 1] == doc[w - 1:]
                out_doc.append(long_idx[doc[: len(doc) - w + 1][dsame]])
                out_fp.append(m[dsame])
            # docs with fewer than w hashes: min of their hashes
            cnt = np.bincount(doc, minlength=len(long_idx))
            few = np.nonzero((cnt > 0) & (cnt < w))[0]
            if len(few):
                order = np.argsort(doc, kind="stable")
                ds_, hs_ = doc[order], h[order]
                bounds = np.searchsorted(ds_, np.arange(len(long_idx) + 1))
                mins = np.array([hs_[bounds[j]:bounds[j + 1]].min() for j in few],
                                dtype=np.uint64)
                out_doc.append(long_idx[few])
                out_fp.append(mins)
        if out_doc:
            alldoc = np.concatenate(out_doc)
            allfp = np.concatenate(out_fp).astype(np.uint64)
        else:
            alldoc = np.array([], dtype=np.int64)
            allfp = np.array([], dtype=np.uint64)
        # distinct (doc, fp)
        order = np.lexsort((allfp, alldoc))
        alldoc, allfp = alldoc[order], allfp[order]
        first = np.ones(len(allfp), dtype=bool)
        if len(allfp) > 1:
            first[1:] = (alldoc[1:] != alldoc[:-1]) | (allfp[1:] != allfp[:-1])
        alldoc, allfp = alldoc[first], allfp[first]
        return pa.table({
            id_col: pa.array(ids[alldoc]),
            "fp": pa.array(allfp.astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
