"""Approximate nearest-neighbor search over an embedding column (brief:
brute-force cosine top-k baseline + an LSH-bucketed scale path).

- cosine_topk      : exact baseline. Queries are broadcast (small side);
                     the corpus streams through one codegen'd projection +
                     a per-query top-k (window row_number). This is the
                     oracle-checkable reference answer.
- srp_signature    : random-hyperplane (sign-random-projection) signatures,
                     one numpy matmul per Arrow batch (Charikar STOC'02 —
                     the same rounding scheme SimHash comes from).
- srp_keys         : signature + optional multi-probe (all one-bit flips)
                     exploded to equi-join keys.
- srp_topk         : LSH-bucketed top-k — per-bucket candidate join, exact
                     cosine re-rank, top-k per query. At 10^9 vectors the
                     bucket join touches ~n/2^bits of the corpus per query
                     instead of n.

- ivf_fit / ivf_topk : IVF (inverted-file) variant — k-means coarse
                       quantizer fit on a driver-side sample, centroids
                       broadcast, assignment = one matmul per Arrow batch,
                       then the same bucket-join shape on the centroid id
                       with nprobe-nearest-centroid multi-probe on the
                       query side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simhash_spark.operators.dedup import cosine_col


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (self-matches excluded).

    Returns (query_id, neighbor_id, rank) with rank 1..k. Ties broken by
    neighbor_id (frozen, keeps the result deterministic for the oracle).
    The queries side is explicitly broadcast — the corpus never shuffles.
    (No small-input spread guard here: the batched-einsum cosine is so cheap
    that per-task overhead dominates a repartitioned tiny corpus — measured
    1.1 s -> 5.9 s WORSE at sf0.1; big corpora arrive multi-split anyway.)
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_range(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine range search: every corpus vector within ``threshold``
    of each query (self-matches excluded) — the "all neighbors at least this
    similar" API that retrieval-dedup and RAG-index audits use, vs top-k's
    "the k most similar whatever their score".

    Returns (query_id, neighbor_id, cosine). Same shape as cosine_topk:
    queries broadcast, the corpus streams through one codegen'd projection —
    no shuffle at all (top-k's per-query window needs one; range search is a
    pure filter, so at 10^12 corpus rows this is a single map-side pass).
    The scale path is the same SRP/IVF bucketing as the top-k variants; this
    is the oracle-checkable exact baseline.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    return (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("qvec"), F.col("cvec")))
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select("query_id", "neighbor_id", "cosine")
    )


def srp_range(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """SRP-LSH scale path for cosine_range — probe-vs-corpus range search
    when the corpus is too large to stream every query over it (the
    embedding-decontamination shape: "which training vectors sit within tau
    of ANY eval vector").

    Corpus keys = raw per-table signatures; query keys = signatures plus all
    one-bit flips (one-sided multi-probe, identical collision rule to
    srp_topk/embedding_near_dup: signature Hamming <= 1 in some table).
    Precision is exact (cosine filter); recall is the standard
    1-(1-q)^L bucket-collision bound, measured in tests against
    cosine_range. The candidate stage moves BARE (query_id, neighbor_id)
    pairs through the bucket join and pair-dedup exchange; vectors re-attach
    after the dedup (queries broadcast, corpus vectors move at most once) —
    the engine-wide no-vectors-through-dedup pattern, tripwire-tested.
    """
    c_vecs = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    q_vecs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = srp_keys(
        c_vecs, "cvec", n_planes=n_planes, n_tables=n_tables, seed=seed, multi_probe=False
    ).select("neighbor_id", "key")
    q = srp_keys(
        q_vecs, "qvec", n_planes=n_planes, n_tables=n_tables, seed=seed, multi_probe=True
    ).select("query_id", "key")
    pairs = (
        c.join(q, "key")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _filter_range(pairs, q_vecs, c_vecs, threshold)


def _filter_range(
    pairs: DataFrame, q_vecs: DataFrame, c_vecs: DataFrame, threshold: float
) -> DataFrame:
    """Shared exact-cosine tail of the LSH/IVF range-search operators:
    bare-id candidate pairs -> re-attach vectors (queries broadcast, corpus
    vectors move at most once) -> keep cosine >= threshold. The range-search
    sibling of _rerank_topk."""
    return (
        pairs.join(F.broadcast(q_vecs), "query_id")
        .join(c_vecs, "neighbor_id")
        .withColumn("cosine", cosine_col(F.col("qvec"), F.col("cvec")))
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select("query_id", "neighbor_id", "cosine")
    )


# --------------------------------------------------------------- SRP LSH


def srp_planes_for(n_rows: int, n_tables: int = 2) -> int:
    """Corpus-size-adaptive SRP signature width for the near-dup scale path —
    the same lesson as config.index_config_for for the pigeonhole index:
    fixed-width keys go quadratic in random collisions as the corpus grows.

    Expected random candidate pairs ~ C(n,2) * L * (b+1) / 2^b; choosing
    b ~ log2(n) + log2(L*(b+1)) keeps that ~linear in n (~n/2 random pairs).
    Measured at the 10^6-row design point (BENCH/INDEX_SCALING.md): 24-bit
    signatures hold verification volume to ~1.5M candidates; 16-bit would be
    ~400x worse.

    Signatures pack into INT64 keys (r4 verdict #7 — previously int32 with
    a 28-bit clamp, which silently re-entered the quadratic-collision
    regime past ~10^8.5 rows: at 10^9 the formula wants ~36 bits, at 10^12
    ~46). Clamp is now [12, 48]: 48 signature bits + up to 15 table-tag
    bits stay inside the 63 usable bits of a signed long, and 2^48 buckets
    covers any corpus this side of 10^13 rows at ~n/2 random pairs.
    """
    import math

    n = max(2, n_rows)
    b = 12
    for _ in range(4):  # fixpoint of b = log2(n * L * (b+1) / n) + log2-ish
        b = round(math.log2(n) + math.log2(n_tables * (b + 1)) - 1)
    return max(12, min(48, b))


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_planes)).astype(np.float64)


def make_srp_udf(n_planes: int, seed: int, n_tables: int = 1):
    """pandas_udf: array<float> -> array<long> of per-table signatures.

    One (batch x dim) @ (dim x planes*tables) matmul per Arrow batch; sign
    bits packed per table, table index tagged in the high bits so signatures
    from different tables never collide. int64 packing (supports the
    adaptive widths srp_planes_for picks up to 48 bits; values for widths
    <= 28 are numerically identical to the old int32 packing). Planes are
    re-derived from the seed per python worker (no broadcast)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def srp(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (n, dim) — dense batch
        planes = _srp_plane_cache(mat.shape[1], n_planes * n_tables, seed)
        bits = (mat @ planes) > 0  # (n, tables*planes)
        bits = bits.reshape(len(mat), n_tables, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        sigs = bits @ weights + (np.arange(n_tables, dtype=np.int64) << n_planes)[None, :]
        return pd.Series(list(sigs.astype(np.int64)))

    return srp


_PLANE_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _srp_plane_cache(dim: int, n_planes: int, seed: int) -> np.ndarray:
    key = (dim, n_planes, seed)
    if key not in _PLANE_CACHE:
        _PLANE_CACHE[key] = _planes(dim, n_planes, seed)
    return _PLANE_CACHE[key]


def srp_keys(
    df: DataFrame,
    vec_col: str,
    n_planes: int = 16,
    seed: int = 7,
    multi_probe: bool = True,
    n_tables: int = 1,
) -> DataFrame:
    """Append exploded bucket keys: per-table SRP signatures plus (optionally)
    each signature's n_planes one-bit flips. L tables x multi-probe is the
    standard recall lever for random-projection LSH: per-pair collision
    probability 1-(1-q)^L where q = p^b + b*p^(b-1)*(1-p), p = 1-theta/pi."""
    sigs = make_srp_udf(n_planes, seed, n_tables)(F.col(vec_col)).alias("sigs")
    base = df.withColumn("sigs", sigs)
    if multi_probe:
        probes = F.flatten(
            F.transform(
                F.col("sigs"),
                lambda s: F.array(
                    s,
                    *[s.bitwiseXOR(F.lit(1 << j)).cast("long") for j in range(n_planes)],
                ),
            )
        )
    else:
        probes = F.col("sigs")
    return base.withColumn("key", F.explode(probes)).drop("sigs")


def srp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """LSH-bucketed approximate top-k: equi-join corpus and query bucket keys
    (queries multi-probed), exact cosine re-rank within candidates, top-k.

    Same output schema as cosine_topk; recall measured against it in tests.
    n_planes/n_tables trade candidate volume (~ n_tables*(n_planes+1)/2^n_planes
    of the corpus per query) against recall; the defaults probe ~3% of the
    corpus per query.

    The candidate stage moves BARE (query_id, neighbor_id) pairs through the
    bucket join and the pair-dedup exchange — a (query, neighbor) pair can
    collide in up to n_tables*(n_planes+1) keys, and each duplicate would
    otherwise pay full-vector serialization (~1 KB/row at 64-dim double)
    through the shuffle. Vectors are re-attached AFTER the dedup: the query
    side by an explicit broadcast (queries are the small side by contract,
    same as cosine_topk), the corpus side by one equi-join that moves each
    corpus vector at most once. Identical pattern to embedding_near_dup
    (dedup.py) and verify_pairs' fingerprint re-join; tripwire-tested in
    tests/test_plans.py.
    """
    c_vecs = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    q_vecs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    pairs = srp_candidates(
        c_vecs, q_vecs, n_planes=n_planes, n_tables=n_tables, seed=seed
    )
    return _rerank_topk(pairs, q_vecs, c_vecs, k)


def srp_candidates(
    c_vecs: DataFrame,
    q_vecs: DataFrame,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """srp_topk's bare candidate stage — deduped (query_id, neighbor_id)
    pairs from the bucket equi-join, no vectors attached. Factored out so
    the design-regime ladder (jobs/design_regime.py --ann) can count
    candidate volume per query with the exact production plan; srp_topk
    composes this with _rerank_topk unchanged."""
    c = srp_keys(
        c_vecs, "cvec", n_planes=n_planes, n_tables=n_tables, seed=seed, multi_probe=False
    ).select("neighbor_id", "key")
    q = srp_keys(
        q_vecs, "qvec", n_planes=n_planes, n_tables=n_tables, seed=seed, multi_probe=True
    ).select("query_id", "key")
    return (
        c.join(q, "key")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )


def _rerank_topk(pairs: DataFrame, q_vecs: DataFrame, c_vecs: DataFrame, k: int) -> DataFrame:
    """Shared ANN tail: re-attach vectors to deduped bare-id candidate pairs
    (query side broadcast, corpus side one equi-join), exact cosine re-rank,
    top-k per query with the frozen (cosine desc, neighbor_id asc) tie rule."""
    cand = (
        pairs.join(F.broadcast(q_vecs), "query_id")
        .join(c_vecs, "neighbor_id")
        .withColumn("cosine", cosine_col(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ------------------------------------------------------------------- IVF


def ivf_fit(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    sample_rows: int = 20_000,
    n_iter: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Fit the IVF coarse quantizer: spherical k-means on a driver-side
    sample (numpy). Returns L2-normalized centroids (n_centroids, dim).

    A sample is the standard IVF training regime (faiss does the same) —
    the full corpus never leaves the executors; only <= sample_rows vectors
    are collected. For 10^12-row corpora raise sample_rows, not the method.

    No exact count() over the corpus: a limit(sample_rows+1) probe decides
    whether sampling is needed at all — CollectLimit early-terminates after
    enough partitions, so the probe touches O(sample_rows) rows regardless of
    corpus size (an exact count at 10^12 rows is a full metadata pass). Small
    corpora therefore train on all rows in one cheap job, in the same
    partition order collect() would yield; only genuinely-large corpora pay
    the second job, a hash-ordered TakeOrdered top-(sample_rows) — an
    unbiased deterministic sample with no full sort and no count.

    Order-invariant: ivf_fit_core canonical-sorts the sample, so the
    quantizer is a pure function of the sampled vector multiset — the same
    rows through any join strategy, file split, or partitioning train the
    identical index (reproducibility contract; the CLI tier-ladder equality
    test depends on it).
    """
    frac_df = corpus.select(vec_col)
    probe = frac_df.limit(sample_rows + 1).collect()
    if len(probe) > sample_rows:
        probe = frac_df.orderBy(F.xxhash64(F.col(vec_col)), F.col(vec_col)).limit(
            sample_rows
        ).collect()
    mat = np.stack([np.asarray(r[0], np.float64) for r in probe])
    return ivf_fit_core(mat, n_centroids, n_iter, seed)


def ivf_fit_core(mat: np.ndarray, n_centroids: int, n_iter: int, seed: int) -> np.ndarray:
    """The spherical k-means kernel behind ivf_fit — pure numpy, Spark-free
    (also the differential oracle's entry point, tests/gen_expected.py).

    The sample is canonical-sorted (lexicographic by raw vector values)
    before init, so the quantizer is a pure function of the vector MULTISET
    — two plans yielding the same rows in different order (different join
    strategies, file splits, partitioning) train the identical quantizer.
    Without this, k-means init indexes into arrival order and every plan
    shape yields a different (equally valid, but irreproducible) index."""
    mat = mat.astype(np.float64, copy=True)
    mat = mat[np.lexsort(mat.T[::-1])]
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(n_iter):
        sims = mat @ cent.T                      # (n, k) cosine (all unit)
        assign = sims.argmax(axis=1)
        for j in range(len(cent)):
            members = mat[assign == j]
            if len(members):
                c = members.sum(axis=0)
                cent[j] = c / max(np.linalg.norm(c), 1e-12)
    return cent


def make_ivf_assign_udf(centroids: np.ndarray, nprobe: int):
    """pandas_udf: vector -> array<int> of its nprobe nearest centroid ids —
    one (batch x dim) @ (dim x k) matmul per Arrow batch."""
    cent = np.ascontiguousarray(centroids.T)  # (dim, k)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cent
        top = np.argpartition(-sims, min(nprobe, sims.shape[1]) - 1, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype(np.int32)))

    return assign


def make_ivf_assign_sim_udf(centroids: np.ndarray):
    """pandas_udf: vector -> struct(list_id:int, csim:double) — the vector's
    single nearest centroid AND its cosine to it, from the same one-matmul-
    per-Arrow-batch pass make_ivf_assign_udf runs (argpartition top-1, so tie
    behavior is bit-identical to the nprobe=1 assignment the IVF family and
    its numpy oracle mirror already share). SemDeDup (operators/dedup.py::
    semdedup_keep) needs the similarity too: its keep rule ranks duplicate-
    group members by distance to their cluster centroid."""
    cent = np.ascontiguousarray(centroids.T)  # (dim, k)

    @F.pandas_udf(T.StructType([
        T.StructField("list_id", T.IntegerType()),
        T.StructField("csim", T.DoubleType()),
    ]))
    def assign_sim(vecs: pd.Series) -> pd.DataFrame:
        if not len(vecs):
            return pd.DataFrame({
                "list_id": np.zeros(0, np.int32),
                "csim": np.zeros(0, np.float64),
            })
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cent
        top = np.argpartition(-sims, 0, axis=1)[:, 0]
        return pd.DataFrame({
            "list_id": top.astype(np.int32),
            "csim": sims[np.arange(len(mat)), top],
        })

    return assign_sim


def ivf_range(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    threshold: float,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF range search: all corpus vectors with cosine >= threshold of any
    query, restricted to the queries' nprobe probed inverted lists —
    completing the ANN matrix (top-k: brute/SRP/IVF; range: brute/SRP/IVF).
    Precision is exact (cosine filter); recall is bounded by list probing,
    measured in tests against cosine_range (same regime as ivf_topk).

    Identical candidate shape to ivf_topk (single-list corpus assignment,
    nprobe-exploded query probes, bare-id pair dedup) with the range tail
    (_filter_range) instead of the per-query top-k window — like
    cosine_range vs cosine_topk, range search needs no window at all.
    """
    c_assign = make_ivf_assign_udf(centroids, 1)
    q_assign = make_ivf_assign_udf(centroids, nprobe)
    c_vecs = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    q_vecs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = c_vecs.withColumn("list_id", F.element_at(c_assign(F.col("cvec")), 1)).select(
        "neighbor_id", "list_id"
    )
    q = q_vecs.withColumn("list_id", F.explode(q_assign(F.col("qvec")))).select(
        "query_id", "list_id"
    )
    pairs = (
        c.join(q, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _filter_range(pairs, q_vecs, c_vecs, threshold)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their single nearest
    centroid's inverted list; queries probe their nprobe nearest lists;
    exact cosine re-rank inside the probed lists.

    Per query this touches ~nprobe/n_centroids of the corpus. Same output
    schema as cosine_topk (recall measured against it in tests).

    Like srp_topk, the list_id bucket join and the pair-dedup exchange move
    BARE (query_id, neighbor_id) rows — a pair collides in up to nprobe keys
    — and vectors are re-attached only for the cosine re-rank (_rerank_topk:
    queries broadcast, corpus vectors move at most once).
    """
    c_vecs = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    q_vecs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    pairs = ivf_candidates(c_vecs, q_vecs, centroids, nprobe=nprobe)
    return _rerank_topk(pairs, q_vecs, c_vecs, k)


def ivf_candidates(
    c_vecs: DataFrame,
    q_vecs: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 4,
) -> DataFrame:
    """ivf_topk's bare candidate stage — deduped (query_id, neighbor_id)
    pairs from the inverted-list equi-join, no vectors attached (same
    factoring as srp_candidates, for the --ann design-regime ladder)."""
    c_assign = make_ivf_assign_udf(centroids, 1)
    q_assign = make_ivf_assign_udf(centroids, nprobe)
    c = c_vecs.withColumn("list_id", F.element_at(c_assign(F.col("cvec")), 1)).select(
        "neighbor_id", "list_id"
    )
    q = q_vecs.withColumn("list_id", F.explode(q_assign(F.col("qvec")))).select(
        "query_id", "list_id"
    )
    return (
        c.join(q, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )


def ann_recall_eval(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query recall@k of an approximate ANN result against the exact
    brute-force baseline — the ANN family's counterpart to dedup_eval
    (BASELINE.json's recall gate made driver-visible for similarity search,
    the same way dedup_truth_eval does for near-dup clustering).

    Both inputs are (query_id, neighbor_id[, ...]) result sets — compose it
    over any pairing: srp_topk vs cosine_topk, ivf_topk vs cosine_topk, or
    a range variant pair. Output one row per query present in ``exact``:
    (query_id, n_exact, n_hit, recall_bp) with recall_bp = 10000 * n_hit
    div n_exact (integer basis points — bit-equal across engines, like
    every ratio this repo ships).

    Scale shape: both sides ride as BARE id pairs; the hit join keys on
    (query_id, neighbor_id) — at most k rows per query per side — and the
    per-query agg is map-combined. Nothing here touches vectors; cost is
    dominated by whichever ANN operators produced the inputs.
    """
    ex = exact.select("query_id", "neighbor_id")
    ap = approx.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1))
    return (
        ex.join(ap, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("_hit").alias("n_hit"),
        )
        .withColumn("recall_bp", F.expr("10000 * n_hit div n_exact"))
    )
