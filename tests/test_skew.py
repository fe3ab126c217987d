"""T4: hot-bucket / skew handling — the salted spanning-chain path for
buckets over the cap, and the full pipeline on the degenerate corpus
(the reference's dev-ex lesson: scalable version crashed on SMALL data,
/root/reference/README.md:11)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from simhash_spark.config import DEFAULT_CONFIG as CFG, PipelineConfig


def _components(pairs: set[tuple[str, str]], nodes: list[str]) -> dict[str, str]:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_hot_bucket_salted_chain_spans_bucket(spark):
    """A bucket over the cap must yield exactly m-1 edges (a spanning tree:
    linear output, full connectivity) — not C(m,2), not disconnected."""
    from simhash_spark.operators.candidates import bucket_pairs

    cfg = PipelineConfig(bucket_cap=50, salt_buckets=4)
    m = 500
    rows = [(f"id{i:05d}", "minhash_lsh", 0, 42) for i in range(m)]
    # a second, small bucket sanity-checks the cold path alongside
    rows += [(f"cold{i}", "minhash_lsh", 0, 99) for i in range(7)]
    keyed = spark.createDataFrame(rows, "id string, src string, key_idx int, key long")
    pairs = [(r["a"], r["b"]) for r in bucket_pairs(keyed, cfg).collect()]

    hot_ids = [f"id{i:05d}" for i in range(m)]
    hot_pairs = [(a, b) for a, b in pairs if a.startswith("id")]
    cold_pairs = [(a, b) for a, b in pairs if a.startswith("cold")]
    assert len(hot_pairs) == m - 1, "hot bucket must emit a spanning tree"
    assert len(cold_pairs) == 21  # C(7,2) — the all-pairs cold path
    comp = _components(set(hot_pairs), hot_ids)
    assert len(set(comp[i] for i in hot_ids)) == 1, "hot bucket not fully connected"
    for a, b in pairs:
        assert a < b


def test_degenerate_corpus_end_to_end(spark, tmp_path):
    """Empty / stop-only / single-token / unicode captions plus a 500-row
    identical-caption hot cluster: pipeline must not crash, empty captions
    must NOT cluster together, the hot cluster must be ONE cluster."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simhash_spark.plans.pipeline import run_pipeline
    from simhash_spark.sources.fixtures import make_degenerate_pdf

    pdf = make_degenerate_pdf()
    d = tmp_path / "deg"
    d.mkdir()
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        d / "images.parquet",
    )
    res = run_pipeline(
        spark, str(d / "images.parquet"), str(tmp_path / "ckpt"), CFG
    )
    clusters = {r["image_id"]: r["cluster_id"] for r in res.clusters.collect()}
    assert len(clusters) == len(pdf)

    ids_by_caption: dict[str, list[str]] = {}
    for iid, cap in zip(pdf["image_id"], pdf["caption"]):
        ids_by_caption.setdefault(cap, []).append(iid)

    hot = ids_by_caption["identical caption here every time"]
    assert len(hot) == 500
    assert len({clusters[i] for i in hot}) == 1, "hot cluster split"

    # empty and stop-only captions have no shingles -> must stay singletons
    # (their simhash is 0 but the n_shingles>0 guard blocks fake matches)
    for cap in ("", "the of and to in"):
        ids = ids_by_caption[cap]
        labels = [clusters[i] for i in ids]
        assert labels == ids, f"no-shingle captions {cap!r} wrongly clustered"


def test_bucket_stats_reports_hot_buckets(spark):
    from simhash_spark.operators.candidates import bucket_stats

    rows = [(f"id{i}", "minhash_lsh", 0, 42) for i in range(300)]
    keyed = spark.createDataFrame(rows, "id string, src string, key_idx int, key long")
    stats = {r["src"]: r.asDict() for r in bucket_stats(keyed).collect()}
    assert stats["minhash_lsh"]["max_bucket"] == 300
    assert stats["minhash_lsh"]["n_buckets"] == 1


def test_udf_keygen_pairs_match_native(spark):
    """The wide-index UDF keygen (used past WIDE_INDEX_UDF_THRESHOLD
    combinations) must produce the IDENTICAL candidate pair set as the
    native expression path — bucket identity hashes differ, membership
    cannot."""
    from dataclasses import replace

    from simhash_spark.operators.candidates import bucket_pairs_packed, explode_all_keys
    from simhash_spark.plans.pipeline import fingerprint_job
    from simhash_spark.sources.fixtures import INPUT_HINT_SCHEMA, make_images_pdf

    cfg8 = replace(CFG, n_blocks=8)
    src = spark.createDataFrame(
        make_images_pdf(400, seed=21, with_bytes=False), schema=INPUT_HINT_SCHEMA
    )
    fp = fingerprint_job(spark, src, cfg8).cache()

    def pairs(force_udf):
        packed = explode_all_keys(fp, cfg8, force_udf_keys=force_udf)
        return {
            (r["a"], r["b"], r["src"])
            for r in bucket_pairs_packed(packed, cfg8)
            .groupBy("a", "b")
            .agg(F.array_join(F.array_sort(F.collect_set("src")), ",").alias("src"))
            .collect()
        }

    native = pairs(False)
    via_udf = pairs(True)
    assert native == via_udf and len(native) > 0


def test_udf_keygen_tolerates_null_phash(spark):
    """Null phash rows (nullable input column) must not crash the vectorized
    keygen and must emit NO phash-source keys — the same effective semantics
    as the native path, whose bit expressions yield null keys that never
    equi-join (ADVICE r2)."""
    from dataclasses import replace

    from simhash_spark.operators.candidates import bucket_pairs_packed, explode_all_keys
    from simhash_spark.plans.pipeline import fingerprint_job
    from simhash_spark.sources.fixtures import INPUT_HINT_SCHEMA, make_images_pdf

    cfg8 = replace(CFG, n_blocks=8)
    src = spark.createDataFrame(
        make_images_pdf(200, seed=23, with_bytes=False), schema=INPUT_HINT_SCHEMA
    )
    fp = fingerprint_job(spark, src, cfg8).withColumn(
        "phash",
        F.when(F.xxhash64("image_id") % 3 == 0, F.col("phash")),  # ~2/3 null
    ).cache()

    def pairs(force_udf):
        packed = explode_all_keys(fp, cfg8, force_udf_keys=force_udf)
        return {
            (r["a"], r["b"]) for r in bucket_pairs_packed(packed, cfg8).collect()
        }

    via_udf = pairs(True)  # crashed with TypeError before the null mask
    native = pairs(False)
    assert via_udf == native
    # and no phash-source keys at all for null rows, in EITHER path (the
    # source code rides in each packed key's low 2 bits; 3 = phash)
    null_ids = [r["image_id"] for r in fp.where(F.col("phash").isNull()).collect()]
    assert null_ids, "fixture should null out some phashes"
    for force in (True, False):
        packed = explode_all_keys(fp, cfg8, force_udf_keys=force)
        n_ph = (
            packed.where(F.col("id").isin(null_ids))
            .where(F.col("k").bitwiseAND(F.lit(3)) == 3)
            .count()
        )
        assert n_ph == 0, f"null-phash rows emitted phash keys (force_udf={force})"


def test_design_point_16_blocks_uses_udf_keygen(spark):
    """C(16,13)=560 combination tables (the 10^12-row design point) must go
    through the vectorized keygen path — asserted STRUCTURALLY (the plan
    contains an ArrowEvalPython keygen node) rather than by wall clock,
    which this sandbox's 2-3x run variance would make flaky; a generous
    time ceiling still guards against the 180 s expression-path regression."""
    import time

    from simhash_spark.config import PipelineConfig
    from simhash_spark.operators.candidates import explode_all_keys
    from simhash_spark.plans.text_dedup import text_candidates, text_fingerprints

    cfg16 = PipelineConfig(n_blocks=16)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fp = text_fingerprints(docs, "doc_id", "text", cfg16)
    plan = (
        explode_all_keys(fp, cfg16, include_phash=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" in plan, "16-block keygen did not take the UDF path"
    t0 = time.time()
    n = text_candidates(fp, cfg16).count()
    wall = time.time() - t0
    assert n > 0
    assert wall < 150, f"16-block candidates took {wall:.0f}s — expression path?"
