"""spark-submit entry point for the near-duplicate pipeline.

Usage (BASELINE.json:6 ship shape):

    spark-submit --py-files engine.zip jobs/run_pipeline.py \
        --input  /path/to/images_parquet_or_iceberg_table \
        --checkpoint /path/to/checkpoints \
        --output /path/to/clusters_out \
        [--parallelism 32] [--no-substring] [--no-phash]

Local test: ``python jobs/run_pipeline.py --input ... --output ...`` (creates
its own local[N] session). Under spark-submit, uses the provided session conf.

Input contract: one row per image_id (the id is the dedup key; duplicate ids
would duplicate label rows downstream). The fixture generator's directory
also holds truth_* parquets — point --input at its images.parquet file.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

try:  # under spark-submit --py-files the engine zip is already importable
    import simhash_spark  # noqa: F401
except ImportError:  # plain `python jobs/run_pipeline.py` from a checkout
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _quality_hist(spark, ckpt: str) -> dict:
    """Per-reason drop counts from the 00_quality stage checkpoint."""
    from simhash_spark.sources.catalog import CheckpointCatalog

    rows = CheckpointCatalog(spark, ckpt).read("00_quality").collect()
    return {r["reason"]: r["n"] for r in rows if r["reason"] != "ok"}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="simhash_spark near-duplicate pipeline")
    ap.add_argument("--input", required=True, help="images parquet path")
    ap.add_argument("--output", required=True, help="output dir for clusters parquet")
    ap.add_argument("--checkpoint", default=None, help="stage checkpoint dir (default: <output>/_checkpoints)")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--no-substring", action="store_true")
    ap.add_argument("--no-phash", action="store_true")
    ap.add_argument(
        "--cc-ckpt-every",
        type=int,
        default=0,
        help="write a fault-tolerant catalog checkpoint of the CC edge set "
        "every k rounds (0 = localCheckpoint only)",
    )
    ap.add_argument(
        "--quality-filter",
        action="store_true",
        help="drop low-quality rows (DataComp-style resolution/aspect/caption "
        "rules, operators/search.py) BEFORE fingerprinting; the per-reason "
        "histogram lands in the 00_quality stage manifest",
    )
    ap.add_argument(
        "--keep-rule",
        choices=["min-id", "best-resolution"],
        default="min-id",
        help="which cluster member survives in keep_list: 'min-id' (frozen "
        "representative rule, pure projection) or 'best-resolution' (highest "
        "w*h, ties min id — operators/dedup.near_dup_keep_best; one slim "
        "(image_id,w,h) re-scan + one cluster_id window exchange)",
    )
    ap.add_argument(
        "--no-stage-metrics",
        action="store_true",
        help="skip the expensive manifest metrics (bucket histogram re-runs "
        "the full packed key exchange; substring degree metrics re-generate "
        "the candidate pairs — structurally a second exchange of the run's "
        "largest intermediate). Use for throughput-critical runs and read "
        "the same surfaces from the dedicated monitoring queries on a "
        "sampled schedule instead",
    )
    ap.add_argument(
        "--n-blocks",
        type=int,
        default=None,
        help="pigeonhole block count override; default: corpus-size-adaptive "
        "(config.index_config_for — 16-bit keys go quadratic past ~1e5 rows)",
    )
    args = ap.parse_args(argv)

    from dataclasses import replace

    from simhash_spark.config import DEFAULT_CONFIG, index_config_for
    from simhash_spark.plans.pipeline import run_pipeline
    from simhash_spark.session import get_spark

    spark = get_spark(parallelism=args.parallelism, app_name="simhash-pipeline")
    ckpt = args.checkpoint or str(pathlib.Path(args.output) / "_checkpoints")
    t0 = time.time()
    if args.n_blocks is not None:
        cfg = replace(DEFAULT_CONFIG, n_blocks=args.n_blocks)
    else:
        # one metadata-cheap count picks the index scale class; at Iceberg/
        # parquet this is a footer read, not a data scan
        cfg = index_config_for(spark.read.parquet(args.input).count())
    res = run_pipeline(
        spark,
        args.input,
        ckpt,
        cfg,
        enable_substring=not args.no_substring,
        include_phash=not args.no_phash,
        cc_ckpt_every=args.cc_ckpt_every,
        quality_filter=args.quality_filter,
        stage_metrics=not args.no_stage_metrics,
    )
    from simhash_spark.operators.dedup import near_dup_keep_best, near_dup_keep_list

    out = pathlib.Path(args.output)
    res.clusters.write.mode("overwrite").parquet(str(out / "clusters"))
    res.verified.write.mode("overwrite").parquet(str(out / "verified_pairs"))
    # the dedup DECISION (one representative per cluster) — the artifact a
    # downstream training job actually consumes
    if args.keep_rule == "best-resolution":
        from pyspark.sql import functions as F

        # column pruning keeps this re-scan to (image_id, w, h); with
        # --quality-filter on, clusters hold a subset of the input ids and
        # the inner join inside keep_best drops the filtered rows
        scores = spark.read.parquet(args.input).select(
            "image_id",
            (F.col("w").cast("long") * F.col("h").cast("long")).alias("score"),
        )
        keep = near_dup_keep_best(res.clusters, scores, id_col="image_id", score_col="score")
    else:
        keep = near_dup_keep_list(res.clusters, id_col="image_id")
    keep.write.mode("overwrite").parquet(str(out / "keep_list"))
    stats = {
        "rows": res.fingerprints.count(),
        **(
            {"quality_dropped": _quality_hist(spark, ckpt)} if args.quality_filter else {}
        ),
        "candidates": res.candidates.count(),
        "verified": res.verified.count(),
        "clusters": res.clusters.select("cluster_id").distinct().count(),
        "kept": keep.where("is_kept = 1").count(),
        "wall_s": round(time.time() - t0, 2),
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
