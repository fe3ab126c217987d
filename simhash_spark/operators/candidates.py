"""Candidate-pair generation — LSH band buckets ∪ pigeonhole rotation buckets.

This operator replaces the reference's all-pairs fingerprint comparison
(/root/reference/README.md:16, the cache-tuned O(n^2) loops) with equi-joins
on bucket keys: O(n^2) becomes O(sum of bucket^2), bounded by ``bucket_cap``.

Skew strategy (SURVEY.md O11/O19/O20):
- buckets <= bucket_cap: all-pairs via self-equi-join (AQE picks the physical
  join; the key includes the bucket id so the shuffle spreads buckets).
- buckets >  bucket_cap (hot bands — e.g. a viral caption repeated 10^6
  times): emit a CHAIN of consecutive ids instead of all pairs. Linear output,
  preserves connectivity through verification for identical/near-identical
  content (which is the only way buckets get hot). The drop is logged in the
  stage metrics, never silent (SURVEY.md §7.5.3).

Dedup across the many key tables (32 bands + rotation combos) happens once,
downstream, in verify (dropDuplicates on the canonical pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simhash_spark.config import PipelineConfig
from simhash_spark.functions.native import pigeonhole_keys_array


def explode_band_keys(fp: DataFrame, id_col: str = "image_id") -> DataFrame:
    """fingerprints -> (id, key_kind, key_idx, key) for LSH bands.

    Rows with no shingles are excluded: an empty caption's signature is the
    constant fill and would form a giant fake bucket.
    """
    return (
        fp.where(F.col("n_shingles") > 0)
        .select(
            F.col(id_col).alias("id"),
            F.lit("minhash_lsh").alias("src"),
            F.posexplode("bands").alias("key_idx", "key"),
        )
    )


def explode_rotation_keys(
    fp: DataFrame, cfg: PipelineConfig, fp_col: str = "simhash", id_col: str = "image_id"
) -> DataFrame:
    """fingerprints -> (id, src, key_idx, key) for the pigeonhole index over
    ``fp_col`` (caption simhash or stored phash) — pure native bit exprs."""
    src = "simhash_rot" if fp_col == "simhash" else "phash_rot"
    use_phash = fp_col != "simhash"
    base = fp
    if fp_col == "simhash":
        base = fp.where(F.col("n_shingles") > 0)  # empty captions all have fp=0
    return base.select(
        F.col(id_col).alias("id"),
        F.lit(src).alias("src"),
        F.posexplode(pigeonhole_keys_array(fp_col, cfg, use_phash=use_phash)).alias(
            "key_idx", "key"
        ),
    )


def bucket_pairs(keyed: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(id, src, key_idx, key) -> candidate pairs (a, b, src), a < b.

    One shuffle on (src, key_idx, key); the window count and both downstream
    consumers reuse that partitioning (exchange reuse), so the cap logic adds
    no extra shuffle.
    """
    w = Window.partitionBy("src", "key_idx", "key")
    sized = keyed.withColumn("_bsize", F.count(F.lit(1)).over(w))

    small = sized.where((F.col("_bsize") > 1) & (F.col("_bsize") <= cfg.bucket_cap))
    x, y = small.alias("x"), small.alias("y")
    pairs_small = (
        x.join(y, ["src", "key_idx", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"), "src")
    )

    big = sized.where(F.col("_bsize") > cfg.bucket_cap)
    wo = Window.partitionBy("src", "key_idx", "key").orderBy("id")
    pairs_big = (
        big.withColumn("_prev", F.lag("id").over(wo))
        .where(F.col("_prev").isNotNull())
        .select(F.col("_prev").alias("a"), F.col("id").alias("b"), "src")
    )
    return pairs_small.unionByName(pairs_big)


def generate_candidates(
    fp: DataFrame, cfg: PipelineConfig, id_col: str = "image_id", include_phash: bool = True
) -> DataFrame:
    """All candidate sources unioned, canonicalized, deduplicated:
    MinHash-LSH ∪ SimHash-rotation ∪ pHash-rotation (SURVEY.md O9-O13).

    The per-pair src survives as a comma-joined provenance set.
    """
    keyed = explode_band_keys(fp, id_col).unionByName(
        explode_rotation_keys(fp, cfg, "simhash", id_col)
    )
    if include_phash:
        keyed = keyed.unionByName(explode_rotation_keys(fp, cfg, "phash", id_col))
    pairs = bucket_pairs(keyed, cfg)
    return pairs.groupBy("a", "b").agg(
        F.array_join(F.array_sort(F.collect_set("src")), ",").alias("src")
    )


def bucket_stats(keyed: DataFrame) -> DataFrame:
    """Bucket-size histogram per source — the skew/recall accounting that the
    stage manifest records (no silent truncation)."""
    return (
        keyed.groupBy("src", "key_idx", "key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("bucket_size").alias("max_bucket"),
            F.avg("bucket_size").alias("avg_bucket"),
            F.sum(F.when(F.col("bucket_size") > 1, 1).otherwise(0)).alias("n_colliding"),
        )
    )
