"""Text-corpus near-duplicate pipeline — the same engine (fingerprint UDF,
LSH/pigeonhole candidates, native Hamming verify, CC clustering) applied to a
generic (id, text) corpus such as an LLM training set. This is the
``documents``-table face of the image+caption pipeline in plans/pipeline.py:
no perceptual hash, substring stage optional.

All stages are lazy DataFrames; callers checkpoint via CheckpointCatalog
exactly as run_pipeline does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_spark.config import DEFAULT_CONFIG, PipelineConfig
from simhash_spark.functions.udfs import with_fingerprints
from simhash_spark.operators.candidates import bucket_pairs_packed, explode_all_keys
from simhash_spark.operators.connected_components import connected_components
from simhash_spark.operators.substring import substring_pairs
from simhash_spark.operators.verify import verify_pairs


def text_fingerprints(
    df: DataFrame, id_col: str, text_col: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(id, text) -> (image_id, simhash, n_shingles, bands).

    The id is carried under the pipeline's canonical ``image_id`` name so
    every downstream operator (candidates/verify/CC) applies unchanged.
    """
    from simhash_spark.session import spread_small_input

    slim = spread_small_input(
        df.select(
            F.col(id_col).cast("string").alias("image_id"), F.col(text_col).alias("caption")
        )
    )
    return with_fingerprints(slim, cfg, emit_minhash=False).drop("caption")


def text_candidates(fp: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """MinHash-LSH ∪ SimHash-pigeonhole candidates (no phash source),
    all keys from one scan of the fingerprint table."""
    packed = explode_all_keys(fp, cfg, include_phash=False)
    pairs = bucket_pairs_packed(packed, cfg)
    return pairs.groupBy("a", "b").agg(
        F.array_join(F.array_sort(F.collect_set("src")), ",").alias("src")
    )


def text_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    enable_substring: bool = False,
    fp: DataFrame | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(id, text) -> verified near-dup pairs (a, b, hamming_caption, src).

    ``fp``/``candidates`` let a caller inject already-built (and persisted /
    checkpointed) stage DataFrames so a multi-branch consumer — e.g. the
    dedup funnel report, which aggregates candidates AND verified AND
    clusters — evaluates each stage once instead of once per branch
    (production composes via CheckpointCatalog parquet pins; query faces
    persist, cf. CLAUDE.md's branch-recompute note).
    """
    if fp is None:
        fp = text_fingerprints(df, id_col, text_col, cfg)
    cand = candidates if candidates is not None else text_candidates(fp, cfg)
    if enable_substring:
        sub = substring_pairs(
            df.select(
                F.col(id_col).cast("string").alias("image_id"),
                F.col(text_col).alias("caption"),
            ),
            cfg,
        )
        cand = cand.unionByName(sub).groupBy("a", "b").agg(
            F.array_join(
                F.array_sort(F.flatten(F.collect_set(F.split("src", ",")))), ","
            ).alias("src")
        )
    return verify_pairs(cand, fp, cfg, use_phash=False).drop("hamming_phash")


def text_near_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    enable_substring: bool = False,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(id, text) -> (doc_id, cluster_id); singletons labeled by themselves.

    ``pairs`` injects an already-verified pair set (see text_near_dup_pairs).
    """
    if pairs is None:
        pairs = text_near_dup_pairs(df, id_col, text_col, cfg, enable_substring)
    labels = connected_components(pairs.select("a", "b"))
    ids = df.select(F.col(id_col).cast("string").alias("image_id"))
    singletons = ids.join(
        labels.select(F.col("id").alias("image_id")), "image_id", "left_anti"
    )
    return (
        labels.select(F.col("id").alias(id_col), "cluster_id")
        .unionByName(singletons.select(F.col("image_id").alias(id_col), F.col("image_id").alias("cluster_id")))
    )
