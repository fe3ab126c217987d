"""The frozen canonical fingerprint spec (SURVEY.md §7.1) — pure numpy, no Spark.

This module defines, bit-for-bit, every hash/fingerprint the engine computes:

- tokenizer: NFKC-normalize, lowercase, extract ``[a-z0-9]+`` runs, drop the
  frozen stop-word list (mirrors the reference's stop-word stage,
  /root/reference/README.md:21)
- shingles: k consecutive tokens joined by ``\\x1f`` (k=1 reproduces the
  reference's word-level scheme, /root/reference/README.md:12)
- feature hash: FNV-1a 64-bit over UTF-8 bytes, vectorized as a Horner loop
  over a padded byte matrix — O(max_len) numpy ops per batch, no per-row Python
- SimHash64: tf-weighted signed bit accumulation, sign threshold v>0
  (/root/reference/README.md:18,:23,:24 semantics; Charikar STOC'02)
- MinHash: 128 universal-hash permutations mod the Mersenne prime 2^61-1
  (Broder'97); 32 bands x 4 rows, band hash = FNV-1a over the row bytes
- pigeonhole block keys over the 64-bit fingerprint (Manku WWW'07 §3):
  with n_blocks blocks and Hamming radius r, every pair within distance r
  shares at least one (n_blocks - r)-block combination key
- popcount64 / hamming64: SWAR popcount (the reference's popcnt,
  /root/reference/README.md:16)
- winnowing anchors (Schleimer et al., SIGMOD'03) for the substring stage:
  any two docs sharing a normalized run of >= L chars share >= 1 anchor

Everything is uint64 internally; Spark carries fingerprints as LongType by
two's-complement reinterpretation (u64_to_i64 / i64_to_u64 at every boundary).

The same functions generate tests/vectors.json AND run inside the pandas UDFs
(simhash_spark/functions/udfs.py), so drift between test oracle and engine is
impossible by construction.
"""

from __future__ import annotations

import itertools
import re
import unicodedata

import numpy as np

from simhash_spark.stopwords import STOPWORDS

# ---------------------------------------------------------------- constants

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)

M61 = np.uint64((1 << 61) - 1)          # Mersenne prime 2^61 - 1
MINHASH_EMPTY = np.uint64((1 << 61) - 2)  # p - 1 fill for empty captions

SHINGLE_SEP = "\x1f"
_TOKEN_RE = re.compile(r"[a-z0-9]+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")

U64 = np.uint64
_ONE = np.uint64(1)

# ------------------------------------------------------------ int64 carrier


def u64_to_i64(x: np.ndarray) -> np.ndarray:
    """uint64 -> two's-complement int64 (the Spark LongType carrier)."""
    return np.asarray(x, dtype=np.uint64).view(np.int64)


def i64_to_u64(x: np.ndarray) -> np.ndarray:
    """int64 (Spark LongType) -> uint64."""
    return np.asarray(x, dtype=np.int64).view(np.uint64)


# ------------------------------------------------------------- tokenization


def normalize_text(text: str) -> str:
    """NFKC-normalize and lowercase (frozen)."""
    return unicodedata.normalize("NFKC", text).lower()


def tokenize(text: str) -> list[str]:
    """Frozen tokenizer: NFKC, lowercase, [a-z0-9]+ runs, stop words dropped."""
    if not text:
        return []
    return [t for t in _TOKEN_RE.findall(normalize_text(text)) if t not in STOPWORDS]


def shingle_list(tokens: list[str], k: int) -> list[str]:
    """k-gram word shingles joined by \\x1f.

    Frozen edge rule: 0 < len(tokens) < k emits ONE shingle of all tokens
    (short captions still fingerprint); no tokens emits nothing.
    """
    n = len(tokens)
    if n == 0:
        return []
    if n < k:
        return [SHINGLE_SEP.join(tokens)]
    return [SHINGLE_SEP.join(tokens[i : i + k]) for i in range(n - k + 1)]


# ------------------------------------------------------------- FNV-1a 64-bit


def _padded_byte_matrix(chunks: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length byte strings into a zero-padded (n, maxlen) uint8
    matrix plus a length vector — one vectorized scatter, no per-row fill."""
    n = len(chunks)
    lens = np.fromiter((len(c) for c in chunks), dtype=np.int64, count=n)
    if n == 0 or int(lens.max(initial=0)) == 0:
        return np.zeros((n, 0), dtype=np.uint8), lens
    maxlen = int(lens.max())
    flat = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    mask = np.arange(maxlen) < lens[:, None]
    buf[mask] = flat
    return buf, lens


def fnv1a64_bytes(chunks: list[bytes]) -> np.ndarray:
    """Vectorized FNV-1a 64 over a batch of byte strings -> uint64[n].

    Horner loop over byte columns: O(maxlen) numpy ops per batch
    (the BASELINE.json:15 'numpy bit tricks, never per-row Python' mandate).
    """
    buf, lens = _padded_byte_matrix(chunks)
    h = np.full(len(chunks), FNV_OFFSET, dtype=np.uint64)
    for j in range(buf.shape[1]):
        m = lens > j
        h[m] = (h[m] ^ buf[m, j].astype(np.uint64)) * FNV_PRIME
    return h


def fnv1a64_str(strings: list[str]) -> np.ndarray:
    """FNV-1a 64 over UTF-8 encodings of a batch of strings."""
    return fnv1a64_bytes([s.encode("utf-8") for s in strings])


def fnv1a64_fixed(mat: np.ndarray) -> np.ndarray:
    """FNV-1a 64 over the rows of a fixed-width uint8 matrix (..., width)."""
    h = np.full(mat.shape[:-1], FNV_OFFSET, dtype=np.uint64)
    for j in range(mat.shape[-1]):
        h = (h ^ mat[..., j].astype(np.uint64)) * FNV_PRIME
    return h


# ------------------------------------------------------------------ popcount

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over uint64 — vectorized equivalent of the reference's
    popcnt intrinsic (/root/reference/README.md:16)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x -= (x >> _ONE) & _M1
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return popcount64(np.asarray(a, np.uint64) ^ np.asarray(b, np.uint64))


# ----------------------------------------------------------------- SimHash


def simhash_from_hashes(hashes: np.ndarray, tfs: np.ndarray) -> np.uint64:
    """SimHash64 for ONE document given its distinct shingle hashes + tf counts.

    v[i] = sum over shingles of (+tf if bit i of hash else -tf); fingerprint
    bit i = 1 iff v[i] > 0 (tie v==0 -> 0, frozen). Reference semantics:
    /root/reference/README.md:18 (accumulation), :23 (tf>0 only).
    """
    if len(hashes) == 0:
        return np.uint64(0)
    hashes = np.asarray(hashes, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.int64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & _ONE).astype(np.int64)
    v = ((2 * bits - 1) * tfs[:, None]).sum(axis=0)
    return pack_bits_u64(v > 0)


def pack_bits_u64(bits: np.ndarray) -> np.uint64 | np.ndarray:
    """bits (..., 64) bool, bit i at index i -> uint64."""
    weights = _ONE << np.arange(64, dtype=np.uint64)
    return (np.asarray(bits, dtype=np.uint64) * weights).sum(axis=-1, dtype=np.uint64)


def simhash_batch(row_ids: np.ndarray, hashes: np.ndarray, tfs: np.ndarray, n_rows: int) -> np.ndarray:
    """Batched SimHash64: flat (row_id, shingle_hash, tf) triples, row_ids
    sorted ascending -> uint64[n_rows]. Rows with no shingles -> 0.

    Inner loop is one reduceat over a (n_distinct, 64) signed matrix — the
    vectorized form of the reference's two-pass accumulation
    (/root/reference/README.md:24)."""
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(hashes) == 0:
        return out
    hashes = np.asarray(hashes, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.int64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & _ONE).astype(np.int64)
    signed = (2 * bits - 1) * tfs[:, None]
    present, starts = np.unique(row_ids, return_index=True)
    v = np.add.reduceat(signed, starts, axis=0)
    out[present] = pack_bits_u64(v > 0)
    return out


# ----------------------------------------------------------------- MinHash


def minhash_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Frozen coefficient draw: a in [1, p-1], b in [0, p-1], rng(seed)."""
    rng = np.random.default_rng(seed)
    p = int(M61)
    a = rng.integers(1, p, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, p, size=n_perm, dtype=np.uint64)
    return a, b


def _mod61(x: np.ndarray) -> np.ndarray:
    x = (x >> np.uint64(61)) + (x & M61)
    return np.where(x >= M61, x - M61, x)


def mulmod61(a, x: np.ndarray) -> np.ndarray:
    """(a * x) mod 2^61-1 for a < 2^61 (scalar or broadcastable array) and
    uint64 array x < 2^61, via 32-bit limbs (the 128-bit product never
    materializes)."""
    a = np.asarray(a, dtype=np.uint64) if not np.isscalar(a) else np.uint64(a)
    mask32 = np.uint64(0xFFFFFFFF)
    a1, a0 = a >> np.uint64(32), a & mask32
    x1, x0 = x >> np.uint64(32), x & mask32
    hh = a1 * x1                      # < 2^58
    mid = a1 * x0 + a0 * x1           # < 2^62
    ll = a0 * x0                      # < 2^64
    # value = hh*2^64 + mid*2^32 + ll;  2^64 = 8 (mod p), 2^61 = 1 (mod p)
    s = (hh << np.uint64(3))
    s = s + (mid >> np.uint64(29))
    s = s + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))
    s = s + (ll >> np.uint64(61)) + (ll & M61)
    return _mod61(_mod61(s))


def minhash_batch(
    row_starts: np.ndarray, hashes: np.ndarray, n_rows: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Batched MinHash signatures -> uint64[n_rows, n_perm].

    ``hashes``: flat DISTINCT shingle hashes, grouped by row; ``row_starts``:
    start offset of each row's segment (len n_rows+1, cumulative). Rows with
    empty segments get the MINHASH_EMPTY fill (frozen empty-caption rule).

    FREEZE NOTE: this function was re-vectorized after the freeze (the
    per-permutation loop became one (L, n_perm) broadcast + reduceat). The
    OUTPUT is bit-identical to tests/vectors.json — the freeze contract is
    on outputs, and output-preserving rewrites are the one sanctioned class
    of change. Memory contract for callers: the broadcast temporary is
    L x n_perm x 8 bytes (L = total shingle hashes in the call); the engine's
    UDF (functions/udfs.py) chunks calls to ~32 rows so the temporary stays
    L2-resident — direct large-L callers must chunk likewise.
    """
    n_perm = len(a)
    out = np.full((n_rows, n_perm), MINHASH_EMPTY, dtype=np.uint64)
    if len(hashes) == 0 or n_rows == 0:
        return out
    x = _mod61(np.asarray(hashes, dtype=np.uint64))  # reduce 64-bit hash into Z_p
    seg_lens = np.diff(row_starts)
    nonempty = seg_lens > 0
    starts_ne = row_starts[:-1][nonempty]
    # all permutations in one broadcast pass: mulmod61 is elementwise, so
    # (L,1) x (1,n_perm) -> (L,n_perm); one reduceat along rows replaces the
    # n_perm-iteration loop (numpy dispatch overhead dominated it)
    vals = _mod61(mulmod61(a[None, :], x[:, None]) + b[None, :])
    out[nonempty] = np.minimum.reduceat(vals, starts_ne, axis=0)
    return out


def band_hashes(sig: np.ndarray, n_bands: int, band_rows: int) -> np.ndarray:
    """LSH band hashes: FNV-1a over the little-endian bytes of each band's
    row values. sig uint64[n, n_perm] -> uint64[n, n_bands]."""
    n = sig.shape[0]
    if n == 0:
        return np.zeros((0, n_bands), dtype=np.uint64)
    mat = (
        np.ascontiguousarray(sig.astype("<u8"))
        .reshape(n, n_bands, band_rows)
        .view(np.uint8)
        .reshape(n, n_bands, band_rows * 8)
    )
    return fnv1a64_fixed(mat)


# ----------------------------------------------- pigeonhole block-combination keys


def block_combinations(n_blocks: int, radius: int) -> list[tuple[int, ...]]:
    """All (n_blocks - radius)-subsets of block indices. Pigeonhole: <= radius
    differing bits touch <= radius blocks, so >= 1 subset is entirely clean
    in BOTH fingerprints -> that combination's key collides (Manku'07 §3)."""
    return list(itertools.combinations(range(n_blocks), n_blocks - radius))


def pigeonhole_keys(fps: np.ndarray, n_blocks: int, radius: int) -> np.ndarray:
    """Bucket keys -> uint64[n, n_combos].

    Block j = bits [64 - bits*(j+1), 64 - bits*j) of the fingerprint (numbered
    from the MSB — block j is the top block of the rotation by bits*j, i.e.
    the classic rotate-and-take-top-bits formulation). Key = combo index
    tagged in the high bits, clean-block values concatenated below.
    """
    fps = np.asarray(fps, dtype=np.uint64)
    bits = 64 // n_blocks
    mask = np.uint64((1 << bits) - 1)
    combos = block_combinations(n_blocks, radius)
    keylen = bits * (n_blocks - radius)
    if keylen + max(1, (len(combos) - 1).bit_length()) > 63:
        raise ValueError("combination key does not fit in 63 bits")
    blocks = np.stack(
        [(fps >> np.uint64(64 - bits * (j + 1))) & mask for j in range(n_blocks)], axis=1
    )
    keys = np.empty((len(fps), len(combos)), dtype=np.uint64)
    for ci, combo in enumerate(combos):
        k = np.full(len(fps), np.uint64(ci), dtype=np.uint64)
        for j in combo:
            k = (k << np.uint64(bits)) | blocks[:, j]
        keys[:, ci] = k
    return keys


# -------------------------------------------------- substring winnowing anchors

_POLY_BASE = np.uint64(1000003)


def normalize_for_substring(text: str) -> str:
    """Frozen substring normalization: NFKC + lowercase, every run of
    non-[a-z0-9] collapsed to a single space, stripped. ASCII-only output."""
    return _NON_ALNUM_RE.sub(" ", normalize_text(text)).strip()


def winnow_anchors_batch(
    texts: list[str], w: int, min_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Winnowing fingerprints over a batch of ALREADY-normalized texts.

    Returns (doc_idx, pos, anchor_hash) — the selected char-w-gram anchors.
    Guarantee (Schleimer'03 thm. 1): two docs sharing a normalized substring
    of length >= min_len (= w + s - 1, s the winnow window) share >= 1 anchor
    with equal hash AND equal underlying w-gram text.

    Fully batch-vectorized: docs are concatenated with ``\\x00`` separators
    (normalized text is ASCII so the separator cannot occur); w-grams covering
    a separator are masked to UINT64_MAX and can never be selected.
    """
    s = min_len - w + 1
    doc_idx = np.zeros(0, dtype=np.int64)
    pos = np.zeros(0, dtype=np.int64)
    ah = np.zeros(0, dtype=np.uint64)
    if not texts:
        return doc_idx, pos, ah
    joined = "\x00".join(texts).encode("ascii")
    buf = np.frombuffer(joined, dtype=np.uint8)
    n = len(buf)
    if n < w:
        return doc_idx, pos, ah
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    doc_starts = np.concatenate([[0], np.cumsum(lens[:-1] + 1)])

    # rolling-polynomial w-gram hash at every flat position (w numpy passes)
    nw = n - w + 1
    h = np.zeros(nw, dtype=np.uint64)
    powv = _POLY_BASE ** np.arange(w - 1, -1, -1, dtype=np.uint64)  # wraps mod 2^64
    for j in range(w):
        h += buf[j : j + nw].astype(np.uint64) * powv[j]

    # mask windows that cover a separator byte
    is_sep = (buf == 0).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(is_sep)])
    covers_sep = (csum[w:] - csum[:-w]) > 0
    INVALID = np.uint64(0xFFFFFFFFFFFFFFFF)
    h[covers_sep] = INVALID

    # winnowing: in every window of s consecutive w-gram hashes pick the min
    if nw < s:
        sel = np.array([int(h.argmin())]) if (h != INVALID).any() else np.zeros(0, np.int64)
    else:
        sw = np.lib.stride_tricks.sliding_window_view(h, s)
        sel = np.unique(sw.argmin(axis=1) + np.arange(sw.shape[0]))
        sel = sel[h[sel] != INVALID]
    if len(sel) == 0:
        return doc_idx, pos, ah
    doc_idx = np.searchsorted(doc_starts, sel, side="right") - 1
    pos = sel - doc_starts[doc_idx]
    return doc_idx.astype(np.int64), pos.astype(np.int64), h[sel]


# ------------------------------------------------ one-document reference path


def caption_fingerprint(
    caption: str,
    k: int,
    a: np.ndarray | None = None,
    b: np.ndarray | None = None,
    n_bands: int = 32,
    band_rows: int = 4,
) -> dict:
    """Canonical single-document pipeline — the test-vector generator and the
    differential oracle (the reference's 对拍 method, /root/reference/README.md:11).
    """
    tokens = tokenize(caption)
    shingles = shingle_list(tokens, k)
    hashes = fnv1a64_str(shingles)
    uniq, tf = np.unique(hashes, return_counts=True)
    out = {
        "tokens": tokens,
        "shingles": shingles,
        "shingle_hashes": hashes,
        "simhash": simhash_from_hashes(uniq, tf),
        "n_shingles": len(shingles),
    }
    if a is not None and b is not None:
        starts = np.array([0, len(uniq)], dtype=np.int64)
        sig = minhash_batch(starts, uniq, 1, a, b)[0]
        out["minhash"] = sig
        out["bands"] = band_hashes(sig[None, :], n_bands, band_rows)[0]
    return out
