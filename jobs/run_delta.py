"""spark-submit entry point for batch-incremental index maintenance.

Folds an increment parquet into a completed run's checkpoint state (a
run_pipeline catalog or a previous run_delta catalog — chains compose):

    spark-submit --py-files engine.zip jobs/run_delta.py \
        --base-checkpoint /path/to/prev/checkpoints \
        --increment /path/to/new_rows_parquet \
        --checkpoint /path/to/delta/checkpoints \
        --output /path/to/clusters_out \
        [--parallelism 32]

Config and stage flags are restored from the base chain's manifests (and
validated — an increment folded in under a different config would silently
miss candidates). Outputs mirror run_pipeline: full updated clusters +
keep_list, plus the increment-only verified pairs. By the delta equality
contract (plans/delta.py), clusters equal a full run over base ∪ increment
whenever no bucket exceeds the cap.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

try:  # under spark-submit --py-files the engine zip is already importable
    import simhash_spark  # noqa: F401
except ImportError:  # plain `python jobs/run_delta.py` from a checkout
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="simhash_spark delta maintenance step")
    ap.add_argument("--base-checkpoint", required=True, help="completed base catalog")
    ap.add_argument("--increment", required=True, help="increment parquet path")
    ap.add_argument("--checkpoint", required=True, help="NEW catalog dir for this delta")
    ap.add_argument("--output", required=True, help="output dir for updated clusters")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument(
        "--tier-labels",
        action="store_true",
        help="write <output>/tier_labels — per-image attribution of the ONE "
        "tier that removed it (exact/near/kept) over the WHOLE chain corpus, "
        "assembled from chain state with zero recompute: exact drops from "
        "the unioned 00b byte index, near drops from the updated clusters. "
        "Requires a byte-exact chain. The semantic rung is NOT offered here: "
        "SemDeDup's keep rule is not add-only (a new member can change a "
        "cell's keeper), so semantic attribution needs a full run_pipeline "
        "--pixel-embeddings pass or the streaming online-SemDeDup door",
    )
    ap.add_argument(
        "--alignment-filter",
        action="store_true",
        help="write <output>/alignment_delta — the cross-modal image-caption "
        "verdict (caption_pixel_alignment) for the INCREMENT's newly-kept "
        "rows only. Sound because the verdict is a PER-ROW pure function "
        "(pixels + caption of that row alone): unlike SemDeDup's keep rule "
        "a row's verdict can never change as the corpus grows, so base "
        "verdicts stay valid and the delta face is add-only by "
        "construction — union alignment_delta over the chain to cover the "
        "whole corpus",
    )
    ap.add_argument(
        "--alignment-tau",
        type=int,
        default=8500,
        help="alignment threshold in basis points of cosine",
    )
    ap.add_argument(
        "--keep-rule",
        choices=["min-id", "best-resolution"],
        default="min-id",
        help="which cluster member survives in keep_list — MUST match the "
        "rule the base run published, or the chain's representatives "
        "silently flip policy between runs. 'best-resolution' re-scans "
        "(image_id, w, h) from every chain input plus the increment "
        "(paths recorded in the chain manifests)",
    )
    args = ap.parse_args(argv)

    from simhash_spark.operators.dedup import near_dup_keep_best, near_dup_keep_list
    from simhash_spark.plans.delta import chain_run_metadata, run_delta
    from simhash_spark.session import get_spark

    spark = get_spark(parallelism=args.parallelism, app_name="simhash-delta")
    t0 = time.time()
    if args.tier_labels and not chain_run_metadata(spark, args.base_checkpoint)[
        "byte_exact"
    ]:
        # fail BEFORE paying for the fold
        raise SystemExit(
            "run_delta: --tier-labels requires a byte-exact chain "
            "(the ladder's first rung; base run_pipeline --byte-exact)"
        )
    res = run_delta(spark, args.base_checkpoint, args.increment, args.checkpoint)

    out = pathlib.Path(args.output)
    res.clusters.write.mode("overwrite").parquet(str(out / "clusters"))
    res.verified_new.write.mode("overwrite").parquet(str(out / "verified_pairs_delta"))
    if args.keep_rule == "best-resolution":
        from pyspark.sql import functions as F

        # the union corpus's (image_id, w, h): every chain link records its
        # input path in its 01 manifest, the increment is this run's input.
        # Column pruning keeps the re-scan to three columns.
        paths = [*chain_run_metadata(spark, args.checkpoint)["input_paths"]]
        scores = spark.read.parquet(*paths).select(
            "image_id",
            (F.col("w").cast("long") * F.col("h").cast("long")).alias("score"),
        )
        keep = near_dup_keep_best(res.clusters, scores, id_col="image_id", score_col="score")
    else:
        keep = near_dup_keep_list(res.clusters, id_col="image_id")
    keep.write.mode("overwrite").parquet(str(out / "keep_list"))
    align_stats = {}
    if args.alignment_filter:
        # the increment's newly-KEPT rows only: per-row pure verdict, so
        # the base's existing alignment rows remain valid verbatim (the
        # add-only argument in the flag's help text). Increment row sets
        # are batch-sized, so the kept-id semi-join broadcasts.
        from pyspark.sql import functions as F

        from simhash_spark.operators.multimodal import caption_pixel_alignment

        keep_r = spark.read.parquet(str(out / "keep_list"))
        inc_kept = (
            spark.read.parquet(args.increment)
            .join(
                F.broadcast(keep_r.where("is_kept = 1").select("image_id")),
                "image_id",
                "left_semi",
            )
        )
        align = caption_pixel_alignment(inc_kept, tau_bp=args.alignment_tau)
        align.write.mode("overwrite").parquet(str(out / "alignment_delta"))
        align = spark.read.parquet(str(out / "alignment_delta"))
        align_stats = {
            "alignment_delta_rows": align.count(),
            "misaligned_delta": align.where("keep = 0").count(),
            "alignment_tau_bp": args.alignment_tau,
        }
    from simhash_spark.sources.catalog import CheckpointCatalog

    cat = CheckpointCatalog(spark, args.checkpoint)
    if args.tier_labels:
        from pyspark.sql import functions as F

        from simhash_spark.plans.delta import read_chain_stage

        bx_all = read_chain_stage(
            spark, args.checkpoint, "00b_bytes", "00b_bytes_delta"
        )
        exact_drops = bx_all.where("image_id != keep_id").select(
            "image_id", F.lit("exact").alias("tier")
        )
        near_drops = res.clusters.where("image_id != cluster_id").select(
            "image_id", F.lit("near").alias("tier")
        )
        from simhash_spark.plans.pipeline import assemble_tiers

        corpus = res.clusters.select("image_id").unionByName(
            exact_drops.select("image_id")
        )
        tiers = assemble_tiers(corpus, exact_drops.unionByName(near_drops))
        tiers.write.mode("overwrite").parquet(str(out / "tier_labels"))
    bx_stats = {}
    if cat.manifest("00b_bytes_delta"):
        # byte-exact chain: how many increment rows the 00b index suppressed
        # (re-uploads that never paid the fingerprint UDF or any later stage)
        bx_stats["byte_suppressed"] = (
            cat.read("00b_bytes_delta").where("image_id != keep_id").count()
        )
    stats = {
        **bx_stats,
        **align_stats,
        "increment_rows": res.fingerprints_new.count(),
        "candidates_delta": res.candidates_new.count(),
        "verified_delta": res.verified_new.count(),
        "rows_total": res.clusters.count(),
        "clusters": res.clusters.select("cluster_id").distinct().count(),
        "kept": keep.where("is_kept = 1").count(),
        "wall_s": round(time.time() - t0, 2),
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
