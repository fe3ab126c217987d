"""Batch-incremental (delta) maintenance of a near-duplicate index.

At web scale the corpus is append-mostly: a daily increment arrives next to
a fingerprinted + clustered base of 10^12 rows. Re-running the full pipeline
re-pays fingerprinting AND candidate generation over the whole base; the
streaming path (streaming/incremental.py) handles micro-batches, this module
is the same idea at batch cadence against checkpointed state. Per update it
touches only:

- the NEW rows' fingerprints (one UDF pass over the increment),
- buckets CONTAINING a new row (one semi-join of the base key table against
  the increment's keys — the base fingerprint checkpoint is scanned, never
  re-expanded; with the bucketed E1 checkpoint the verify re-joins are also
  exchange-free on the base side),
- clusters ADJACENT to a new verified pair (star edges reconstruct exactly
  their membership for the merge CC; every untouched cluster keeps its
  label verbatim, without entering the CC loop at all).

Equality contract (differential-tested in tests/test_delta.py): when no
bucket exceeds ``bucket_cap``, the updated labels are IDENTICAL to running
the full batch pipeline over base ∪ increment. Why: bucket keys are
per-row content hashes, so the union corpus's old–old candidate pairs are
exactly the base run's — connectivity the base labels already summarize;
the only genuinely new information is pairs touching an increment row, and
the star edges replay each touched component's membership into the merge
CC (labels are min-id, and the star vertex set is the full old component,
so the merged min is the true min). Buckets past the cap degrade to the
same connectivity-preserving chain guarantee as the batch and streaming
paths (chains may differ between a base+delta and a full run; clusters
agree for content that actually verifies as duplicate).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_spark.config import DEFAULT_CONFIG, PipelineConfig
from simhash_spark.operators.candidates import bucket_pairs_packed, explode_all_keys
from simhash_spark.operators.connected_components import connected_components
from simhash_spark.operators.verify import verify_pairs


def incremental_candidates(
    fp_new: DataFrame,
    fp_all: DataFrame,
    cfg: PipelineConfig,
    include_phash: bool = True,
) -> DataFrame:
    """Candidate pairs (a, b, src) touching >= 1 increment row.

    Only buckets containing a new member are expanded: the full key table is
    scanned once and semi-joined against the increment's (distinct) keys —
    cost linear in |base keys| + |touched-bucket contents|, NOT in the
    base's pair volume. Old–old pairs inside touched buckets are generated
    and then dropped by the touching-new filter; their volume is bounded by
    bucket_cap x |touched buckets|.
    """
    packed_new = explode_all_keys(fp_new, cfg, include_phash=include_phash)
    packed_all = explode_all_keys(fp_all, cfg, include_phash=include_phash)
    touched = packed_all.join(packed_new.select("k").distinct(), "k", "left_semi")
    pairs = (
        bucket_pairs_packed(touched, cfg)
        .groupBy("a", "b")
        .agg(F.array_join(F.array_sort(F.collect_set("src")), ",").alias("src"))
    )
    new_ids = fp_new.select(F.col("image_id"))
    pa = pairs.join(new_ids.withColumnRenamed("image_id", "a"), "a", "left_semi")
    pb = pairs.join(new_ids.withColumnRenamed("image_id", "b"), "b", "left_semi")
    return pa.unionByName(pb).dropDuplicates(["a", "b"])


def incremental_cluster_update(
    base_clusters: DataFrame,
    verified_new: DataFrame,
    fp_new: DataFrame,
    id_col: str = "image_id",
) -> DataFrame:
    """Merge new verified pairs into existing (id, cluster_id) labels.

    CC runs over new pairs ∪ star edges (member -> old label) of the old
    clusters ADJACENT to a new pair — a graph linear in |new pairs| +
    |touched members|, independent of total corpus size. Untouched clusters
    bypass the loop and keep their labels; increment rows in no pair become
    singletons labeled by themselves (the frozen representative rule).
    """
    pair_ids = (
        verified_new.select(F.col("a").alias(id_col))
        .unionByName(verified_new.select(F.col("b").alias(id_col)))
        .distinct()
    )
    touched_cids = (
        base_clusters.join(pair_ids, id_col, "left_semi").select("cluster_id").distinct()
    )
    members = base_clusters.join(touched_cids, "cluster_id", "left_semi")
    # star edges replay the touched component: every member links to its old
    # label (itself the component's min member, so it is a member vertex too)
    star = members.where(F.col(id_col) != F.col("cluster_id")).select(
        F.col(id_col).alias("a"), F.col("cluster_id").alias("b")
    )
    labels = connected_components(verified_new.select("a", "b").unionByName(star))
    relabeled = labels.select(F.col("id").alias(id_col), "cluster_id")
    untouched = base_clusters.join(touched_cids, "cluster_id", "left_anti")
    new_singletons = (
        fp_new.select(F.col("image_id").alias(id_col))
        .join(labels.select(F.col("id").alias(id_col)), id_col, "left_anti")
        .select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    )
    return relabeled.unionByName(untouched).unionByName(new_singletons)


@dataclass
class DeltaResult:
    fingerprints_new: DataFrame
    verified_new: DataFrame
    clusters: DataFrame


def incremental_near_dup_update(
    base_fp: DataFrame,
    base_clusters: DataFrame,
    fp_new: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    include_phash: bool = True,
) -> DeltaResult:
    """One delta maintenance step over already-fingerprinted inputs:
    base_fp/base_clusters come from the previous run's checkpoints (E1/E4),
    fp_new from fingerprint_job/text_fingerprints over the increment."""
    fp_all = base_fp.unionByName(fp_new)
    cand = incremental_candidates(fp_new, fp_all, cfg, include_phash=include_phash)
    verified = verify_pairs(cand, fp_all, cfg, use_phash=include_phash)
    clusters = incremental_cluster_update(base_clusters, verified, fp_new)
    return DeltaResult(fp_new, verified, clusters)


def text_incremental_clusters(
    base_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """documents-table convenience: cluster the base corpus, then fold the
    increment in via the delta path; returns (id_col, cluster_id) for the
    UNION corpus — by the equality contract, identical to the full-run
    labels (driver query ``incremental_near_dup_clusters`` checks exactly
    that against the full-corpus oracle)."""
    from simhash_spark.plans.text_dedup import text_fingerprints, text_near_dup_clusters

    base_labels = text_near_dup_clusters(base_docs, id_col, text_col, cfg).select(
        F.col(id_col).alias("image_id"), "cluster_id"
    )
    fp_base = text_fingerprints(base_docs, id_col, text_col, cfg)
    fp_new = text_fingerprints(new_docs, id_col, text_col, cfg)
    res = incremental_near_dup_update(fp_base, base_labels, fp_new, cfg, include_phash=False)
    return res.clusters.select(F.col("image_id").alias(id_col), "cluster_id")
