"""Pure-numpy mirror of the text near-dup kernel path — the differential
second engine (the reference's 对拍 method). Used by tests/gen_expected.py to
produce the driver's expected outputs at sf0.01 AND by the sf0.1 scale
differential test; one implementation, two scales.

Mirrored semantics are kept in lockstep with the cited engine code:
- fingerprint_batch (functions/udfs.py) is the same kernel the UDF runs;
- candidate buckets mirror operators/candidates.explode_all_keys (band keys
  + pigeonhole combination keys for rows with shingles; bucket identity =
  the raw (code, index, key) triple);
- pairs mirror bucket_pairs_packed for buckets of 2..cap members (hot
  buckets would need the JVM salt hash and make the mirror invalid — we
  assert none exist);
- verify mirrors operators/verify.py (use_phash=False);
- clusters mirror connected_components + singleton labeling.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

from simhash_spark import spec
from simhash_spark.config import PipelineConfig
from simhash_spark.functions.udfs import fingerprint_batch


def text_kernel_mirror(docs: pd.DataFrame, cfg: PipelineConfig) -> dict:
    """documents (doc_id, text) -> expected fingerprints / candidate pairs /
    verified pairs / cluster labels, all computed without Spark."""
    ids = docs["doc_id"].astype(str).to_numpy(dtype=object)
    n = len(docs)

    fb = fingerprint_batch(docs["text"].reset_index(drop=True), cfg, emit_minhash=False)
    simhash_i64 = fb["simhash"].to_numpy(np.int64)
    n_shingles = fb["n_shingles"].to_numpy(np.int32)
    sim_u64 = spec.i64_to_u64(simhash_i64)
    bands = (
        np.stack(fb["bands"].to_numpy()) if n else np.zeros((0, cfg.n_bands), np.int64)
    )
    pig = spec.pigeonhole_keys(sim_u64, cfg.n_blocks, cfg.hamming_radius)

    buckets: dict[tuple[int, int, int], list[int]] = defaultdict(list)
    for idx in np.flatnonzero(n_shingles > 0):
        for i in range(cfg.n_bands):
            buckets[(1, i, int(bands[idx, i]))].append(int(idx))
        for i in range(pig.shape[1]):
            buckets[(2, i, int(pig[idx, i]))].append(int(idx))

    pair_srcs: dict[tuple[str, str], set[str]] = defaultdict(set)
    for (code, _i, _k), members in buckets.items():
        if len(members) < 2:
            continue
        assert len(members) <= cfg.bucket_cap, (
            "hot bucket — salted-chain edges depend on the JVM hash and are "
            "not mirrored; this corpus cannot be used for the differential"
        )
        src = "minhash_lsh" if code == 1 else "simhash_rot"
        names = sorted(ids[m] for m in members)
        for x in range(len(names)):
            for y in range(x + 1, len(names)):
                pair_srcs[(names[x], names[y])].add(src)

    cand_rows = sorted(pair_srcs)
    by_id = {ids[i]: i for i in range(n)}
    if cand_rows:
        ai = np.array([by_id[a] for a, _ in cand_rows])
        bi = np.array([by_id[b] for _, b in cand_rows])
        ham = spec.popcount64(sim_u64[ai] ^ sim_u64[bi])
        verified = [cand_rows[i] for i in np.flatnonzero(ham <= cfg.hamming_radius)]
    else:
        verified = []

    clusters = union_find_min_labels(list(ids), verified)
    return {
        "ids": ids,
        "simhash_i64": simhash_i64,
        "n_shingles": n_shingles,
        "candidates": {p: ",".join(sorted(pair_srcs[p])) for p in cand_rows},
        "verified": verified,
        "clusters": clusters,
        # per-bucket sizes (singletons included) for the skew surface —
        # bucket identity is the raw (code, table, key) triple; the engine
        # folds it through xxhash64, which merges buckets with prob 2^-62
        "bucket_sizes": [
            ("minhash_lsh" if code == 1 else "simhash_rot", len(members))
            for (code, _i, _k), members in buckets.items()
        ],
    }


def substring_pairs_mirror(docs: pd.DataFrame, cfg: PipelineConfig) -> set[tuple[str, str]]:
    """Expected (a, b) substring pairs: winnowing completeness means every
    pair sharing a normalized run >= L shares an anchor; candidates are
    anchor co-occupants, verified by the exact shared-run predicate —
    mirrors operators/substring.py::substring_pairs."""
    from collections import defaultdict as _dd

    ids = docs["doc_id"].astype(str).tolist()
    norm = [spec.normalize_for_substring(t) for t in docs["text"].tolist()]
    di, _pos, ah = spec.winnow_anchors_batch(norm, cfg.substr_window, cfg.substr_min_len)
    by_anchor: dict[int, set[int]] = _dd(set)
    for d, h in zip(di.tolist(), ah.tolist()):
        by_anchor[h].add(d)
    # the engine caps each anchor bucket at bucket_cap ids (keep-lowest,
    # operators/substring.py) — an over-cap anchor would make this mirror
    # expect pairs the engine deterministically dropped, so refuse loudly
    biggest = max((len(m) for m in by_anchor.values()), default=0)
    assert biggest <= cfg.bucket_cap, (
        f"hot anchor bucket ({biggest} > cap {cfg.bucket_cap}) — the engine's "
        "keep-lowest truncation is not mirrored; corpus unusable here"
    )
    cand = {
        tuple(sorted((ids[x], ids[y])))
        for members in by_anchor.values()
        if len(members) > 1
        for x in members
        for y in members
        if x < y
    }
    by_id = {ids[i]: i for i in range(len(ids))}

    def shares(a: str, b: str) -> bool:
        na, nb = norm[by_id[a]], norm[by_id[b]]
        L = cfg.substr_min_len
        if len(na) < L or len(nb) < L:
            return False
        if len(nb) < len(na):
            na, nb = nb, na
        wins = {na[i : i + L] for i in range(len(na) - L + 1)}
        return any(nb[i : i + L] in wins for i in range(len(nb) - L + 1))

    return {p for p in cand if shares(*p)}


def union_find_min_labels(
    ids: list[str], edges: list[tuple[str, str]]
) -> dict[str, str]:
    """Union-find with lexicographic-min component labels; every id labeled
    (singletons by themselves) — mirrors connected_components + the
    singleton union in plans/text_dedup.py."""
    parent: dict[str, str] = {i: i for i in ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {i: find(i) for i in ids}


def image_kernel_mirror(img: pd.DataFrame, cfg: PipelineConfig) -> dict:
    """Image-pipeline mirror of text_kernel_mirror: the same caption
    fingerprint kernel plus the phash pigeonhole index (code 3, mirroring
    candidates.explode_all_keys include_phash=True) and the OR-phash verify
    predicate (operators/verify.py use_phash=True). Returns candidate/
    verified pair sets and cluster labels computed without Spark — the
    differential second engine for the flagship pipeline's funnel counts.

    Completeness cross-check available to callers: because both pigeonhole
    indexes are complete for their radii, the verified set must equal the
    full all-pairs dup matrix (the path gen_expected's image_clusters
    takes) — asserting the two cluster labelings equal differentials the
    bucketed path against the O(n^2) one.
    """
    ids = img["image_id"].astype(str).to_numpy(dtype=object)
    n = len(img)

    fb = fingerprint_batch(img["caption"].reset_index(drop=True), cfg, emit_minhash=False)
    n_shingles = fb["n_shingles"].to_numpy(np.int32)
    sim_u64 = spec.i64_to_u64(fb["simhash"].to_numpy(np.int64))
    ph_u64 = spec.i64_to_u64(img["phash"].to_numpy(np.int64))
    bands = (
        np.stack(fb["bands"].to_numpy()) if n else np.zeros((0, cfg.n_bands), np.int64)
    )
    pig = spec.pigeonhole_keys(sim_u64, cfg.n_blocks, cfg.hamming_radius)
    pig_ph = spec.pigeonhole_keys(ph_u64, cfg.n_blocks, cfg.phash_radius)

    buckets: dict[tuple[int, int, int], list[int]] = defaultdict(list)
    for idx in np.flatnonzero(n_shingles > 0):
        for i in range(cfg.n_bands):
            buckets[(1, i, int(bands[idx, i]))].append(int(idx))
        for i in range(pig.shape[1]):
            buckets[(2, i, int(pig[idx, i]))].append(int(idx))
    for idx in range(n):  # phash keys are emitted for every non-null phash
        for i in range(pig_ph.shape[1]):
            buckets[(3, i, int(pig_ph[idx, i]))].append(int(idx))

    pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        assert len(members) <= cfg.bucket_cap, (
            "hot bucket — salted-chain edges depend on the JVM hash and are "
            "not mirrored; this corpus cannot be used for the differential"
        )
        names = sorted({ids[m] for m in members})
        for x in range(len(names)):
            for y in range(x + 1, len(names)):
                pairs.add((names[x], names[y]))

    cand_rows = sorted(pairs)
    by_id = {ids[i]: i for i in range(n)}
    if cand_rows:
        ai = np.array([by_id[a] for a, _ in cand_rows])
        bi = np.array([by_id[b] for _, b in cand_rows])
        cap_ok = (
            (spec.popcount64(sim_u64[ai] ^ sim_u64[bi]) <= cfg.hamming_radius)
            & (n_shingles[ai] > 0)
            & (n_shingles[bi] > 0)
        )
        ph_ok = spec.popcount64(ph_u64[ai] ^ ph_u64[bi]) <= cfg.phash_radius
        verified = [cand_rows[i] for i in np.flatnonzero(cap_ok | ph_ok)]
    else:
        verified = []

    clusters = union_find_min_labels(list(ids), verified)
    return {"ids": ids, "candidates": cand_rows, "verified": verified, "clusters": clusters}
