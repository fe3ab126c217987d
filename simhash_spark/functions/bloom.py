"""Bloom-filter membership over word-n-gram FNV hashes — the broadcast-filter
decontamination/dedup primitive (Dolma's deduper is exactly this shape: a
Bloom filter built from the reference side, tested in a map-only pass over
the corpus; Soldaini et al. '24 §4.2, Bloom '70).

Why a Bloom filter next to the exact broadcast-join trio in
operators/curation.py: the exact path broadcasts the benchmark HASH SET and
still has to explode the corpus into gram rows and run a per-doc count
exchange. The Bloom path compresses the reference side ~4x further
(bits_per_key=16 -> 16 bits/gram vs 64-bit hashes + set overhead) and makes
the corpus side a ZERO-exchange projection: gram generation, hashing and the
membership count all happen inside one vectorized Arrow batch, no explode,
no groupBy. At 10^12 rows that removes the only corpus-sized exchange the
exact plan has; the price is a frozen, deterministic false-positive rate
(one-sided: never a false negative).

FROZEN RULES (mirrored per-row in tests/gen_expected.py — change = breaking):
- grams: lowercase, trim, whitespace-split word n-grams, space-joined; docs
  with 1..n-1 tokens emit their full join as ONE gram; empty/whitespace text
  emits nothing (identical to operators/dedup.py::ngram_array_col).
- gram hash: FNV-1a 64 over the gram's UTF-8 bytes (spec.fnv1a64_str — the
  spec primitive, so the pure-python mirror reproduces it exactly; the exact
  join trio uses Spark xxhash64, equal up to 64-bit collisions).
- per-doc distinct applies to the HASHES (a within-doc collision merges two
  grams — same caveat direction as ngram_shingles).
- sizing: m = 2**max(6, ceil(log2(bits_per_key * n_keys))) bits (m = 64 for
  an empty reference side), k_probes independent probes.
- probes of hash u (uint64): step = (u >> 33) | 1 (odd, so the double-hash
  walk cycles the full power-of-two table; Kirsch-Mitzenmacher '06), probe
  i in [0, k): bit ((u + i * step) mod 2^64) & (m - 1).
- membership: all k bits set.

With the defaults (bits_per_key=16, k=8) the false-positive rate is
(1 - e**(-k/16))**8 ~= 5.6e-4 per tested gram.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simhash_spark import spec

__all__ = [
    "bloom_build",
    "bloom_maybe",
    "gram_fnv_hashes",
    "make_gram_fnv_hashes_udf",
    "make_bloom_overlap_udf",
]

_U1 = np.uint64(1)
_U33 = np.uint64(33)
_U63 = np.uint64(63)
_U6 = np.uint64(6)


def _bloom_m_bits(n_keys: int, bits_per_key: int) -> int:
    want = bits_per_key * max(0, n_keys)
    return 1 << max(6, (want - 1).bit_length() if want > 1 else 0)


def _probe_indices(hashes: np.ndarray, m_bits: int, k_probes: int) -> np.ndarray:
    """(n, k) uint64 bit indices for each hash — the frozen probe rule."""
    u = hashes.astype(np.uint64, copy=False)
    step = (u >> _U33) | _U1
    i = np.arange(k_probes, dtype=np.uint64)[None, :]
    # uint64 arithmetic wraps mod 2^64 (numpy overflow warnings are not
    # raised for unsigned wraparound), matching the mirror's & ((1<<64)-1)
    return (u[:, None] + i * step[:, None]) & np.uint64(m_bits - 1)


def bloom_build(
    hashes: np.ndarray, bits_per_key: int = 16, k_probes: int = 8
) -> tuple[np.ndarray, int]:
    """Build the filter from uint64 key hashes -> (uint64 word array, m_bits).

    n_keys is taken as len(hashes) — pass DISTINCT hashes (the operator
    does), since duplicate keys would inflate m without adding bits.
    """
    m_bits = _bloom_m_bits(len(hashes), bits_per_key)
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    if len(hashes):
        idx = _probe_indices(np.asarray(hashes), m_bits, k_probes).ravel()
        np.bitwise_or.at(words, (idx >> _U6).astype(np.int64), _U1 << (idx & _U63))
    return words, m_bits


def bloom_maybe(
    words: np.ndarray, m_bits: int, k_probes: int, hashes: np.ndarray
) -> np.ndarray:
    """bool[n]: True where ALL k probe bits are set (maybe-member)."""
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    idx = _probe_indices(np.asarray(hashes), m_bits, k_probes)
    bits = (words[(idx >> _U6).astype(np.int64)] >> (idx & _U63)) & _U1
    return bits.all(axis=1)


def _grams_py(text: str | None, n: int) -> list[str]:
    """The frozen gram rule, per row (mirrors ngram_array_col exactly)."""
    t = (text or "").strip().lower()
    if not t:
        return []
    toks = t.split()
    if len(toks) >= n:
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return [" ".join(toks)]


def gram_fnv_hashes(texts: list[str | None], n: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch gram hashing: texts -> (row_offsets[len+1], uint64 hashes).

    One flat spec.fnv1a64_str call per batch (the vectorized Horner loop),
    per-row DISTINCT applied to the hash slices. Offsets delimit row i's
    distinct hashes as hashes[offsets[i]:offsets[i+1]].
    """
    flat: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        g = _grams_py(t, n)
        counts[i] = len(g)
        flat.extend(g)
    raw = spec.fnv1a64_str(flat) if flat else np.zeros(0, dtype=np.uint64)
    ends = np.cumsum(counts)
    out: list[np.ndarray] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i in range(len(texts)):
        u = np.unique(raw[ends[i] - counts[i] : ends[i]])
        out.append(u)
        offsets[i + 1] = offsets[i] + len(u)
    return offsets, (np.concatenate(out) if out else np.zeros(0, dtype=np.uint64))


def make_gram_fnv_hashes_udf(n: int):
    """pandas_udf: text -> array<long> of the row's DISTINCT gram FNV hashes
    (two's-complement int64 ride, spec.u64_to_i64). Used on the reference
    (benchmark) side, whose gram volume is bounded by construction."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def gram_hashes(texts: pd.Series) -> pd.Series:
        if not len(texts):
            return pd.Series([], dtype=object)
        # fillna: nulls arrive as None OR NaN depending on the Arrow->pandas
        # path; the frozen rule treats both as empty text (same guard as the
        # fingerprint kernels)
        offsets, hashes = gram_fnv_hashes(texts.fillna("").tolist(), n)
        signed = spec.u64_to_i64(hashes)
        return pd.Series(
            [signed[offsets[i] : offsets[i + 1]].tolist() for i in range(len(texts))]
        )

    return gram_hashes


def make_bloom_overlap_udf(words: np.ndarray, m_bits: int, k_probes: int, n: int):
    """pandas_udf: text -> struct(n_grams:int, n_maybe_overlap:int) — the
    zero-exchange corpus pass. n_grams = the row's distinct gram-hash count,
    n_maybe_overlap = how many of those the filter reports present.

    The filter words ride in the task closure (one pickle per task, like the
    fingerprint kernel's minhash coefficient matrix); for multi-GB filters on
    a real cluster, wrap them in ``sparkContext.broadcast`` and pass
    ``bc.value`` here — the kernel is unchanged.
    """
    w = np.ascontiguousarray(words)

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("n_grams", T.IntegerType()),
                T.StructField("n_maybe_overlap", T.IntegerType()),
            ]
        )
    )
    def overlap(texts: pd.Series) -> pd.DataFrame:
        if not len(texts):
            return pd.DataFrame(
                {
                    "n_grams": np.zeros(0, np.int32),
                    "n_maybe_overlap": np.zeros(0, np.int32),
                }
            )
        offsets, hashes = gram_fnv_hashes(texts.fillna("").tolist(), n)
        hit = bloom_maybe(w, m_bits, k_probes, hashes)
        # per-row segment sums over the flat hit vector
        csum = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
        n_grams = (offsets[1:] - offsets[:-1]).astype(np.int32)
        n_maybe = (csum[offsets[1:]] - csum[offsets[:-1]]).astype(np.int32)
        return pd.DataFrame({"n_grams": n_grams, "n_maybe_overlap": n_maybe})

    return overlap
