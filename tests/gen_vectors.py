"""Generate tests/vectors.json — the frozen fingerprint test vectors (F3).

Run once: ``python tests/gen_vectors.py``. The output is checked in; T0 tests
assert the spec kernels AND the Spark UDFs reproduce every field bit-for-bit
(BASELINE.json:6 "fingerprint/Hamming test vectors"). Regenerating after a
spec change is a deliberate, reviewed act.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from simhash_spark import spec
from simhash_spark.config import DEFAULT_CONFIG as CFG

CASES: list[str] = [
    # plain english
    "the quick brown fox jumps over the lazy dog",
    "The Quick Brown Fox Jumps Over The Lazy Dog",
    "a cat sat on a mat and looked at a rat",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    # stop-word heavy / stop-only / empty / whitespace
    "", " ", "\t\n", "the a an and or of to in", "THE THE THE the the",
    "is was were be been being", "it",
    # single token / short (< k tokens)
    "hello", "hello world", "x", "42", "a1b2c3",
    # repeats (tf weighting)
    "spam spam spam spam eggs", "spam eggs", "one one two two two three",
    # punctuation / digits / mixed
    "hello, world! 42 times; foo_bar-baz (qux)", "3.14159 2.71828 1.41421",
    "e=mc^2 and f=ma", "C'est la vie, n'est-ce pas?",
    # unicode: NFKC cases, accents, CJK (dropped by [a-z0-9]+), emoji, fullwidth
    "ＨＥＬＬＯ ｗｏｒｌｄ １２３",          # fullwidth -> NFKC -> ascii
    "ﬁnancial aﬀairs ﬂoor",                 # ligatures -> NFKC expands
    "naïve café résumé über",               # accents survive NFKC, split on them
    "日本語のテキスト with some english words",
    "emoji 🎉 party 🚀 rocket",
    "ΣΊΣΥΦΟΣ greek text μικρό",
    "Ⅷ roman ⑤ circled ½ fraction",        # NFKC -> viii, 5, 1/2 (wait: 1⁄2)
    "combining á mark è here",
    # long repetitive caption (hot-cluster shape)
    "buy cheap widgets online best price free shipping " * 8,
    # near-dup pairs (small token substitutions)
    "a scenic mountain lake at golden sunrise with pine trees reflected in calm water",
    "a scenic mountain lake at golden sunset with pine trees reflected in calm water",
    "a scenic mountain lake at golden sunset with fir trees reflected in calm water",
    "an aerial photograph of a winding river delta meeting the turquoise ocean",
    "an aerial photograph of a winding river delta meeting the emerald ocean",
]
# programmatic padding to >= 100 cases: deterministic pseudo-captions
_rng = np.random.default_rng(1234)
_vocab = [f"w{i:03d}" for i in range(300)] + ["the", "of", "and", "data", "image"]
while len(CASES) < 100:
    n = int(_rng.integers(1, 40))
    CASES.append(" ".join(_vocab[int(j)] for j in _rng.integers(0, len(_vocab), n)))


def main() -> None:
    a, b = spec.minhash_params(CFG.n_perm, CFG.minhash_seed)
    records = []
    fps = []
    for caption in CASES:
        r = spec.caption_fingerprint(caption, CFG.shingle_k, a, b, CFG.n_bands, CFG.band_rows)
        fp = np.uint64(r["simhash"])
        fps.append(fp)
        rot = spec.pigeonhole_keys(np.array([fp]), CFG.n_blocks, CFG.hamming_radius)[0]
        records.append(
            {
                "caption": caption,
                "k": CFG.shingle_k,
                "tokens": r["tokens"],
                "shingle_hashes_u64": [str(int(h)) for h in r["shingle_hashes"]],
                "simhash_u64": str(int(fp)),
                "minhash_u64": [str(int(v)) for v in r["minhash"]],
                "band_hashes_u64": [str(int(v)) for v in r["bands"]],
                "rotation_keys_u64": [str(int(v)) for v in rot],
            }
        )
    # Hamming pairs over all case fingerprints (reference popcnt semantics)
    fps = np.array(fps, dtype=np.uint64)
    pairs = []
    rng = np.random.default_rng(7)
    idx = rng.integers(0, len(fps), size=(120, 2))
    for i, j in idx:
        pairs.append(
            {
                "fp_a": str(int(fps[i])),
                "fp_b": str(int(fps[j])),
                "distance": int(spec.hamming64(fps[i : i + 1], fps[j : j + 1])[0]),
            }
        )
    out = {
        "config": {
            "shingle_k": CFG.shingle_k,
            "n_perm": CFG.n_perm,
            "n_bands": CFG.n_bands,
            "band_rows": CFG.band_rows,
            "minhash_seed": CFG.minhash_seed,
            "n_blocks": CFG.n_blocks,
            "hamming_radius": CFG.hamming_radius,
        },
        "cases": records,
        "hamming_pairs": pairs,
    }
    path = pathlib.Path(__file__).parent / "vectors.json"
    path.write_text(json.dumps(out, ensure_ascii=False, indent=1))
    print(f"wrote {path}: {len(records)} cases, {len(pairs)} hamming pairs")


if __name__ == "__main__":
    main()
