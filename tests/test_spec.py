"""T0 — pure-numpy spec kernels vs the frozen test vectors (no Spark).

BASELINE.json:6: fingerprints must reproduce bit-for-bit at the frozen
shingle/signature config; these vectors ARE that contract.
"""

from __future__ import annotations

import numpy as np

from simhash_spark import spec
from simhash_spark.config import DEFAULT_CONFIG as CFG


def test_vector_config_matches_default(vectors):
    c = vectors["config"]
    assert c["shingle_k"] == CFG.shingle_k
    assert c["n_perm"] == CFG.n_perm
    assert c["n_bands"] == CFG.n_bands
    assert c["band_rows"] == CFG.band_rows
    assert c["minhash_seed"] == CFG.minhash_seed
    assert c["n_blocks"] == CFG.n_blocks
    assert c["hamming_radius"] == CFG.hamming_radius


def test_fingerprints_bit_for_bit(vectors):
    a, b = spec.minhash_params(CFG.n_perm, CFG.minhash_seed)
    for case in vectors["cases"]:
        r = spec.caption_fingerprint(case["caption"], case["k"], a, b, CFG.n_bands, CFG.band_rows)
        assert r["tokens"] == case["tokens"], case["caption"]
        assert [str(int(h)) for h in r["shingle_hashes"]] == case["shingle_hashes_u64"]
        assert str(int(r["simhash"])) == case["simhash_u64"], case["caption"]
        assert [str(int(v)) for v in r["minhash"]] == case["minhash_u64"]
        assert [str(int(v)) for v in r["bands"]] == case["band_hashes_u64"]
        rot = spec.pigeonhole_keys(
            np.array([r["simhash"]], dtype=np.uint64), CFG.n_blocks, CFG.hamming_radius
        )[0]
        assert [str(int(v)) for v in rot] == case["rotation_keys_u64"]


def test_hamming_pairs(vectors):
    for p in vectors["hamming_pairs"]:
        a = np.uint64(int(p["fp_a"]))
        b = np.uint64(int(p["fp_b"]))
        assert int(spec.hamming64(np.array([a]), np.array([b]))[0]) == p["distance"]


def test_known_fnv_values():
    h = spec.fnv1a64_str(["", "a", "foobar"])
    assert int(h[0]) == 0xCBF29CE484222325
    assert int(h[1]) == 0xAF63DC4C8601EC8C
    assert int(h[2]) == 0x85944171F73967E8  # published FNV-1a test value


def test_empty_caption_rules():
    a, b = spec.minhash_params(8, 42)
    r = spec.caption_fingerprint("", CFG.shingle_k, a, b, 2, 4)
    assert int(r["simhash"]) == 0
    assert all(int(v) == int(spec.MINHASH_EMPTY) for v in r["minhash"])
    r2 = spec.caption_fingerprint("the of and to", CFG.shingle_k, a, b, 2, 4)
    assert int(r2["simhash"]) == 0  # stop-only -> no shingles


def test_simhash_batch_matches_scalar():
    caps = ["one two three four five", "five four three two one", "", "spam spam eggs"]
    flat_rows, flat_hashes, flat_tf = [], [], []
    for i, c in enumerate(caps):
        hs = spec.fnv1a64_str(spec.shingle_list(spec.tokenize(c), 3))
        u, tf = np.unique(hs, return_counts=True)
        flat_rows += [i] * len(u)
        flat_hashes += u.tolist()
        flat_tf += tf.tolist()
    got = spec.simhash_batch(
        np.array(flat_rows, np.int64),
        np.array(flat_hashes, np.uint64),
        np.array(flat_tf, np.int64),
        len(caps),
    )
    for i, c in enumerate(caps):
        assert int(got[i]) == int(spec.caption_fingerprint(c, 3)["simhash"])


def test_int64_carrier_roundtrip():
    x = np.array([0, 1, 2**63, 2**64 - 1, 0xDEADBEEFCAFEBABE], dtype=np.uint64)
    assert (spec.i64_to_u64(spec.u64_to_i64(x)) == x).all()
