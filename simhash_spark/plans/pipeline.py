"""The end-to-end near-duplicate pipeline (SURVEY.md §3.2 E1-E3).

Stages (each checkpointed + resumable via CheckpointCatalog):

  E1 fingerprints : scan -> prune bytes -> one ArrowEvalPython pass
                    (simhash + minhash + bands), phash passthrough
  E2 candidates   : LSH bands ∪ simhash rotations ∪ phash rotations
                    -> bucket self-joins (capped/chained) -> union+dedup
  E2b substr      : winnowing anchors -> per-anchor suffix-array verify
  E3 verified     : native bit_count Hamming verify of all candidates
  E4 clusters     : large-star/small-star CC; isolated vertices = singletons

Column pruning is the single most important scan optimization at 10^12 rows:
E1 selects only (image_id, caption, phash) — the multi-TB `bytes` column
never leaves the parquet/Iceberg scan (checked by test_pipeline_e2e's
explain assertion).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simhash_spark.config import DEFAULT_CONFIG, PipelineConfig
from simhash_spark.functions.udfs import with_fingerprints
from simhash_spark.operators.candidates import bucket_stats_packed, explode_all_keys, generate_candidates
from simhash_spark.operators.connected_components import connected_components
from simhash_spark.operators.substring import (
    pairs_from_anchor_table,
    substring_degree_metrics,
    substring_pairs,
    verify_substring_pairs,
    winnow_anchor_table,
)
from simhash_spark.operators.verify import verify_pairs
from simhash_spark.sources.catalog import CheckpointCatalog, input_fingerprint_of


def fingerprint_job(spark: SparkSession, src: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """E1: (image_id, caption, phash) -> + simhash, n_shingles, bands.

    One stage, no shuffle; `bytes` pruned at the scan; the raw minhash
    signature stays inside the UDF (only its band hashes leave Python —
    see FINGERPRINT_SCHEMA_SLIM).
    """
    slim = src.select("image_id", "caption", "phash")
    return with_fingerprints(slim, cfg, emit_minhash=False).drop("caption")


def candidate_job(fp: DataFrame, cfg: PipelineConfig, include_phash: bool = True) -> DataFrame:
    """E2: fingerprints -> candidate pairs (a, b, src)."""
    return generate_candidates(fp, cfg, include_phash=include_phash)


def substring_job(src: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """E2b one-shot form: captions -> substring pairs (a, b, src='substr').
    run_pipeline instead splits this into the 02b_anchors checkpoint +
    verify so the anchor table persists as incremental-maintenance state."""
    return substring_pairs(src.select("image_id", "caption"), cfg)


def verify_job(
    candidates: DataFrame, fp: DataFrame, cfg: PipelineConfig, use_phash: bool = True
) -> DataFrame:
    """E3: exact Hamming verification of the unioned candidate set.

    ``use_phash`` must match the run's ``include_phash``: the flag removes
    the phash AXIS (keys and verify criterion together), the same rule the
    text/delta/streaming paths apply — a phash-only dup verified here but
    not by a chained delta run would break the delta equality contract."""
    return verify_pairs(candidates, fp, cfg, use_phash=use_phash)


def cluster_job(
    verified: DataFrame,
    vertices: DataFrame,
    cfg: PipelineConfig,
    catalog: CheckpointCatalog | None = None,
    cc_ckpt_every: int = 0,
    input_fingerprint: str = "",
    small_graph_limit: int | None = None,
) -> DataFrame:
    """E4: verified pairs -> (image_id, cluster_id = min id in component).
    Vertices absent from any verified pair are singleton clusters.

    ``catalog`` + ``cc_ckpt_every`` > 0 turns on the fault-tolerant CC round
    checkpoint (connected_components docstring) — localCheckpoint alone is
    executor-local and a lost executor mid-loop would kill a 100-TB run.
    ``small_graph_limit`` passes through to connected_components (0 forces
    the distributed star loop — the scaling bench uses it to measure the
    loop path instead of the parallelism-constant driver fast path)."""
    cc_kwargs = {} if small_graph_limit is None else {"small_graph_limit": small_graph_limit}
    labels = connected_components(
        verified.select("a", "b"),
        catalog=catalog,
        ckpt_every=cc_ckpt_every,
        input_fingerprint=input_fingerprint,
        **cc_kwargs,
    )
    all_ids = vertices.select(F.col("image_id"))
    singletons = all_ids.join(labels.select(F.col("id").alias("image_id")), "image_id", "left_anti")
    return labels.select(F.col("id").alias("image_id"), "cluster_id").unionByName(
        singletons.select("image_id", F.col("image_id").alias("cluster_id"))
    )


def byte_keep_col(digest_col: str) -> "F.Column":
    """The byte tier's FROZEN keep rule as one shared expression: keeper =
    lexicographic min image_id per digest group (hex or binary digest — the
    rule only groups on equality). Every face that byte-dedups (run_pipeline
    stage 00b, image_tier_labels' exact tier, the semantic-search query
    face) builds its window from here so the rule cannot fork."""
    from pyspark.sql import Window

    return F.min("image_id").over(Window.partitionBy(digest_col))


def assemble_tiers(corpus_ids: DataFrame, drops: DataFrame) -> DataFrame:
    """The ladder's FROZEN label assembly, shared by every face that
    publishes tier attribution (image_tier_labels, run_pipeline
    --tier-labels, run_delta --tier-labels): left-join the (image_id, tier)
    drop set onto the corpus ids; unlabeled rows are 'kept' / is_kept=1.
    Disjointness of the drop tiers is the caller's funnel invariant."""
    return corpus_ids.join(drops, "image_id", "left").select(
        "image_id",
        F.coalesce(F.col("tier"), F.lit("kept")).alias("tier"),
        F.col("tier").isNull().cast("int").alias("is_kept"),
    )


def image_tier_labels(
    spark: SparkSession,
    src: DataFrame,
    cfg: PipelineConfig | None = None,
    emb: DataFrame | None = None,
    centroids=None,
    tau: float = 0.9,
) -> DataFrame:
    """Tiered dedup attribution for the IMAGE axis — the text ladder's
    (operators/dedup.py::dedup_tier_labels) counterpart over the BASELINE
    input_hint table: byte-exact (md5 over the binary column — the same
    file re-uploaded under a new id/caption) -> near (the flagship
    caption-SimHash + phash-pigeonhole pipeline) on the byte tier's
    survivors -> optionally semantic (SemDeDup over pixel embeddings, the
    Abbas'23 LAION regime) on the near tier's survivors, every dropped
    image labeled with the ONE tier that removed it.
    Output: (image_id, tier in {'exact','near','semantic','kept'}, is_kept).

    FROZEN per-tier rules (each tier's own frozen rule, unchanged):
    - exact: keeper = lexicographic min image_id per md5(bytes) group;
      NULL-bytes rows never group (they pass this tier — the absent-content
      rule shared with the text ladder).
    - near: cluster_job's min-string-id label over fingerprint/candidate/
      verify (caption SimHash bands + pigeonhole, OR-phash verify) of the
      survivors; keeper = the member whose id IS its cluster label.
    - semantic (only when ``emb`` + ``centroids`` are given): semdedup_keep's
      lowest-centroid-cosine rule at cosine >= ``tau`` over the embedding
      rows of the remaining survivors; images with no embedding row (decode
      quarantine, null bytes) pass this tier. ``emb`` is
      (image_id, embedding) — operators/multimodal.py::image_embeddings in
      this container, a CLIP-style encoder in production; ``centroids`` from
      ann.ivf_fit over the same embeddings.

    Scale shape: tier 1 is one md5-keyed window exchange over (id, 16-byte
    digest) — bytes themselves never shuffle (md5 computed in the scan
    projection); tier 2 is the audited one-exchange candidates plan on the
    (smaller) survivor set; tier 3 is the one-exchange SemDeDup group
    kernel on the yet-smaller remainder — the funnel ordering exists so the
    per-pixel-expensive tiers see the fewest rows. Query-face caveat: fp
    feeds candidate AND verify, so this composed face caches it; production
    runs materialize tier boundaries through the CheckpointCatalog like
    run_pipeline.
    """
    cfg = cfg or DEFAULT_CONFIG
    id_c, by_c = F.col("image_id"), F.col("bytes")
    nulls = src.where(by_c.isNull())
    # "_md5", not "h" — the input_hint schema already carries h (height)
    ex = (
        src.where(by_c.isNotNull())
        .withColumn("_md5", F.md5(by_c))
        .withColumn("_keep", byte_keep_col("_md5"))
    )
    exact_drops = ex.where(id_c != F.col("_keep")).select(
        "image_id", F.lit("exact").alias("tier")
    )
    surv1 = ex.where(id_c == F.col("_keep")).drop("_md5", "_keep").unionByName(nulls)

    fp = fingerprint_job(spark, surv1, cfg).cache()
    clus = cluster_job(verify_job(candidate_job(fp, cfg), fp, cfg), fp, cfg)
    near_drops = clus.where(F.col("image_id") != F.col("cluster_id")).select(
        "image_id", F.lit("near").alias("tier")
    )

    drops = exact_drops.unionByName(near_drops)

    if emb is not None:
        if centroids is None:
            raise ValueError("semantic tier needs both emb and centroids")
        from simhash_spark.operators.dedup import semdedup_keep

        surv2 = surv1.select("image_id").join(
            near_drops.select("image_id"), "image_id", "left_anti"
        )
        emb2 = (
            emb.select("image_id", F.col("embedding").alias("vec"))
            .where(F.col("vec").isNotNull())
            .join(surv2, "image_id", "left_semi")
        )
        sem = semdedup_keep(
            emb2, centroids, threshold=tau, id_col="image_id", vec_col="vec"
        )
        sem_drops = sem.where(F.col("is_kept") == 0).select(
            "image_id", F.lit("semantic").alias("tier")
        )
        drops = drops.unionByName(sem_drops)

    return assemble_tiers(src.select("image_id"), drops)


def stage_fingerprint(
    input_path: str,
    cfg: PipelineConfig,
    enable_substring: bool,
    include_phash: bool,
    quality_filter: bool = False,
    quality_overrides: dict | None = None,
    byte_exact: bool = False,
) -> str:
    """Stage checkpoint identity = input content + full config + pipeline
    flags: a rerun with a different index config (e.g. --n-blocks 8) or
    stage set must recompute, never silently resume stages computed under
    the old configuration. The quality-filter flag joins the identity only
    when enabled (``-qf1``) so pre-existing unfiltered checkpoints keep
    resuming under their original fingerprints."""
    from simhash_spark.config import config_fingerprint

    qf = ""
    if quality_filter:
        qf = "-qf1"
        if quality_overrides:
            # non-default thresholds change the kept set -> new identity
            import hashlib
            import json

            qf += hashlib.md5(
                json.dumps(quality_overrides, sort_keys=True).encode()
            ).hexdigest()[:8]
    # like -qf1, the byte-exact flag joins the identity only when enabled so
    # pre-existing checkpoints keep resuming under their original fingerprints
    bx = "-bx1" if byte_exact else ""
    return (
        f"{input_fingerprint_of(input_path)}-{config_fingerprint(cfg)}"
        f"-ss{int(enable_substring)}-ph{int(include_phash)}{qf}{bx}"
    )


@dataclass
class PipelineResult:
    fingerprints: DataFrame
    candidates: DataFrame
    verified: DataFrame
    clusters: DataFrame


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    enable_substring: bool = True,
    include_phash: bool = True,
    cc_ckpt_every: int = 0,
    bucket_fingerprints: bool = True,
    quality_filter: bool = False,
    quality_overrides: dict | None = None,
    stage_metrics: bool = True,
    byte_exact: bool = False,
) -> PipelineResult:
    """The resumable end-to-end run: every stage lands in the catalog with a
    manifest; rerunning after a crash skips complete stages (T5).

    ``bucket_fingerprints`` writes the E1 checkpoint hash-clustered + sorted
    on image_id (CheckpointCatalog.write bucket_by): E3 joins the fingerprint
    table TWICE on that key and E4's singleton anti-join hits it again — with
    the bucketed layout all three reads skip the exchange/sort on the big
    side, paying one clustered write instead of three shuffles of the
    largest intermediate. Bucket count follows the session's shuffle
    parallelism (a real deployment sets both to ~2-3x total cores)."""
    cat = CheckpointCatalog(spark, checkpoint_path)
    in_fp = stage_fingerprint(
        input_path,
        cfg,
        enable_substring,
        include_phash,
        quality_filter,
        quality_overrides,
        byte_exact,
    )
    src = spark.read.parquet(input_path)

    if quality_filter:
        # E0: DataComp-style keep/drop BEFORE the expensive fingerprint UDF —
        # at 100 TB the filter is a zero-shuffle projection fused into the
        # scan, so pruning here saves the dropped fraction of every
        # downstream stage. The stage CHECKPOINT holds only the per-reason
        # histogram (the monitorable artifact + resume marker); the kept
        # rows themselves are recomputed on read — re-running one codegen'd
        # predicate is far cheaper than writing a near-copy of the corpus.
        from simhash_spark.operators.search import image_quality_filter

        flt = image_quality_filter(src, **(quality_overrides or {}))
        cat.run_stage(
            "00_quality",
            in_fp,
            lambda: flt.groupBy("reason").agg(F.count("*").alias("n")),
            extra_metrics=lambda: {"quality_overrides": quality_overrides or {}},
        )
        src = flt.where(F.col("keep") == 1).drop("keep", "reason")

    if byte_exact:
        # E0b: byte-exact dedup BEFORE fingerprinting — the image tier
        # ladder's first rung as a production stage. The funnel ordering is
        # the scale argument: at 10^12 rows every byte re-upload dropped
        # here never pays the fingerprint UDF, the candidate exchange, or
        # the verify joins. Frozen rule = image_tier_labels tier 1 (keeper =
        # lexicographic min image_id per md5 group; NULL-bytes rows pass).
        # The checkpoint stores ONE SLIM ROW PER HASHED INPUT
        # (image_id, digest 16-byte binary, keep_id) — the byte-dedup index
        # state; bytes themselves never shuffle (md5 reduces them inside the
        # scan projection) and never land in the catalog. Survivors are an
        # anti-join against the drop subset on read.
        bx_src = src

        def _bytes_stage() -> DataFrame:
            return (
                bx_src.where(F.col("bytes").isNotNull())
                .select("image_id", F.unhex(F.md5("bytes")).alias("digest"))
                .withColumn("keep_id", byte_keep_col("digest"))
            )

        bx = cat.run_stage("00b_bytes", in_fp, _bytes_stage)
        src = src.join(
            bx.where(F.col("image_id") != F.col("keep_id")).select("image_id"),
            "image_id",
            "left_anti",
        )

    fp_buckets = (
        (int(spark.conf.get("spark.sql.shuffle.partitions")), ["image_id"])
        if bucket_fingerprints
        else None
    )
    def _run_metadata() -> dict:
        # the delta path (plans/delta.py) reconstructs the EXACT base config
        # and stage flags from this manifest — bucket keys depend on them, so
        # an increment folded in under a different config would silently miss
        # candidates. Recording them here makes config drift detectable.
        from dataclasses import asdict

        return {
            "config": asdict(cfg),
            "enable_substring": enable_substring,
            "include_phash": include_phash,
            "quality_filter": quality_filter,
            "quality_overrides": quality_overrides or {},
            "byte_exact": byte_exact,
            "input_path": input_path,
        }

    fp = cat.run_stage(
        "01_fingerprints",
        in_fp,
        lambda: fingerprint_job(spark, src, cfg),
        extra_metrics=_run_metadata,
        bucket_by=fp_buckets,
    )

    def _cand() -> DataFrame:
        return candidate_job(fp, cfg, include_phash=include_phash)

    def _cand_metrics() -> dict:
        # skew/recall accounting in the stage manifest: bucket histogram per
        # index + how many hot buckets were degraded to spanning chains —
        # the "no silent truncation" rule (SURVEY.md §7.5.3). Computed from
        # the packed key table so it works for every index config.
        packed = explode_all_keys(fp, cfg, include_phash=include_phash)
        stats = {r["src"]: r.asDict() for r in bucket_stats_packed(packed).collect()}
        hot = sum(1 for s in stats.values() if (s["max_bucket"] or 0) > cfg.bucket_cap)
        return {
            "bucket_stats": stats,
            "bucket_cap": cfg.bucket_cap,
            "indexes_with_hot_buckets": hot,
        }

    # ``stage_metrics`` is the monitoring-cost dial: the two closures below
    # re-run the stage's heaviest intermediate for their manifest numbers
    # (the bucket histogram re-exchanges the FULL packed key table; the
    # degree metrics re-generate the substring candidate pairs) —
    # structurally a SECOND full exchange of the run's largest intermediate,
    # which on a real cluster is real shuffle bandwidth. Measured at the
    # 3M-row design regime (BENCH/INDEX_SCALING.md r5 refresh) this sandbox
    # CONSERVES rather than adds the cost: metrics pass 288 s + warm
    # candidates write 181 s vs a 488 s cold write in both raw draws — the
    # syscall-serialized shuffle dominates either way. The dial's value is
    # the structural claim; throughput-critical runs turn it off and read
    # the same surfaces from the dedicated monitoring queries
    # (lsh_bucket_stats, substring_run_report) on their own schedule.
    cand = cat.run_stage(
        "02_candidates",
        in_fp,
        _cand,
        extra_metrics=_cand_metrics if stage_metrics else None,
    )

    if enable_substring:
        # the anchor table is checkpointed as its own stage: it is BOTH a
        # resume point for the substring stage and the incremental-
        # maintenance state (a delta run semi-joins it against the
        # increment's anchors instead of re-winnowing the base corpus)
        anch = cat.run_stage(
            "02b_anchors",
            in_fp,
            lambda: winnow_anchor_table(src.select("image_id", "caption"), cfg),
        )
        def _substr_metrics() -> dict:
            # the accepted 2.73x pair-join text amplification's revisit
            # trigger ("degree grows with corpus size") as manifest numbers
            return substring_degree_metrics(pairs_from_anchor_table(anch, cfg), src)

        sub = cat.run_stage(
            "02b_substr",
            in_fp,
            lambda: verify_substring_pairs(
                pairs_from_anchor_table(anch, cfg), src, cfg
            ).withColumn("src", F.lit("substr")),
            extra_metrics=_substr_metrics if stage_metrics else None,
        )
        all_cand = cand.unionByName(sub).groupBy("a", "b").agg(
            F.array_join(F.array_sort(F.flatten(F.collect_set(F.split("src", ",")))), ",").alias("src")
        )
    else:
        all_cand = cand

    verified = cat.run_stage(
        "03_verified",
        in_fp,
        lambda: verify_job(all_cand, fp, cfg, use_phash=include_phash),
    )
    clusters = cat.run_stage(
        "04_clusters",
        in_fp,
        lambda: cluster_job(
            verified, fp, cfg, catalog=cat, cc_ckpt_every=cc_ckpt_every, input_fingerprint=in_fp
        ),
    )
    return PipelineResult(fp, cand, verified, clusters)


def candidate_bucket_stats(
    fp: DataFrame, cfg: PipelineConfig, include_phash: bool = True
) -> DataFrame:
    """Skew observability: bucket histograms per candidate source."""
    return bucket_stats_packed(explode_all_keys(fp, cfg, include_phash=include_phash))
