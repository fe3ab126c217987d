"""spark-submit entry point for delta-chain compaction.

Rewrites a run_delta chain's corpus-spanning state (fingerprints, winnowing
anchors, labels) into ONE fresh root catalog, so future deltas chain off a
single link again and the old chain directories can be retired:

    spark-submit --py-files engine.zip jobs/compact.py \
        --tip /path/to/latest/delta/checkpoints \
        --checkpoint /path/to/new/root/checkpoints \
        [--parallelism 32]

No recompute — the fingerprint UDF never runs; cost is one bucketed write of
the unioned fingerprint table plus linear copies (plans/delta.compact_chain).
The Iceberg-backend equivalent is rewrite_data_files + snapshot expiry.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

try:  # under spark-submit --py-files the engine zip is already importable
    import simhash_spark  # noqa: F401
except ImportError:  # plain `python jobs/compact.py` from a checkout
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="simhash_spark delta-chain compaction")
    ap.add_argument("--tip", required=True, help="latest catalog in the delta chain")
    ap.add_argument("--checkpoint", required=True, help="NEW root catalog dir")
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args(argv)

    from simhash_spark.plans.delta import catalog_chain, compact_chain
    from simhash_spark.session import get_spark
    from simhash_spark.sources.catalog import CheckpointCatalog

    spark = get_spark(parallelism=args.parallelism, app_name="simhash-compact")
    t0 = time.time()
    chain = catalog_chain(args.tip)
    compact_chain(spark, args.tip, args.checkpoint)
    m = CheckpointCatalog(spark, args.checkpoint).manifest("01_fingerprints")
    print(
        json.dumps(
            {
                "chain_links_compacted": len(chain),
                "rows_total": m["n_rows"],
                "buckets": m.get("bucket_n"),
                "wall_s": round(time.time() - t0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
