"""Batch-incremental (delta) maintenance — equality with the full run.

The contract (plans/delta.py): base labels + increment, folded in via
incremental_near_dup_update, equal the full pipeline over base ∪ increment
whenever no bucket exceeds the cap. Tested three ways: a real-corpus
differential at sf0.001, a hand-built merge of two base clusters through a
bridging increment row (exercises the star-edge replay), and a disjoint
increment (no touched buckets -> base labels verbatim + new singletons).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simhash_spark.config import DEFAULT_CONFIG as CFG


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_equals_full_run_sf0001(spark):
    from simhash_spark.plans.delta import text_incremental_clusters
    from simhash_spark.plans.text_dedup import text_near_dup_clusters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = text_near_dup_clusters(docs, "doc_id", "text", CFG)
    split = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    base = docs.where(split == 0)
    inc = docs.where(split == 1)
    assert base.count() > 0 and inc.count() > 0
    delta = text_incremental_clusters(base, inc, "doc_id", "text", CFG)
    assert _rows(delta) == _rows(full)


def _fp_df(spark, rows):
    """Hand-built fingerprint rows: (image_id, simhash, n_shingles, bands).
    Distinct single-element bands per row keep MinHash-LSH out of the test's
    way; the pigeonhole index provides the candidates."""
    return spark.createDataFrame(
        [(i, s, 5, [h]) for i, s, h in rows],
        "image_id string, simhash long, n_shingles int, bands array<long>",
    )


def test_increment_bridges_two_base_clusters(spark):
    """simhash A=0 and B=63 are Hamming 6 apart (two separate base
    clusters); bridge C=7 is within radius 3 of BOTH. The delta step must
    merge everything into one component labeled by the global min id —
    which requires the star edges to relabel a2/b2, members of touched
    clusters that appear in NO new pair."""
    from simhash_spark.plans.delta import incremental_near_dup_update

    base_fp = _fp_df(
        spark, [("a1", 0, 101), ("a2", 0, 102), ("b1", 63, 103), ("b2", 63, 104)]
    )
    base_clusters = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("b1", "b1"), ("b2", "b1")],
        "image_id string, cluster_id string",
    )
    fp_new = _fp_df(spark, [("c1", 7, 105)])
    res = incremental_near_dup_update(
        base_fp, base_clusters, fp_new, CFG, include_phash=False
    )
    ver = {(r["a"], r["b"]) for r in res.verified_new.collect()}
    assert ver == {("a1", "c1"), ("a2", "c1"), ("b1", "c1"), ("b2", "c1")}
    assert _rows(res.clusters) == [
        ("a1", "a1"),
        ("a2", "a1"),
        ("b1", "a1"),
        ("b2", "a1"),
        ("c1", "a1"),
    ]


def test_disjoint_increment_keeps_base_labels_verbatim(spark):
    """An increment sharing no bucket with the base: zero new verified
    pairs, base labels pass through untouched, increment rows become
    self-labeled singletons."""
    from simhash_spark.plans.delta import incremental_near_dup_update

    base_fp = _fp_df(spark, [("a1", 0, 101), ("a2", 0, 102)])
    base_clusters = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1")], "image_id string, cluster_id string"
    )
    # every 16-bit pigeonhole block differs from the base rows' zeros
    far = 0x1111_2222_3333_4444
    fp_new = _fp_df(spark, [("z9", far, 999)])
    res = incremental_near_dup_update(
        base_fp, base_clusters, fp_new, CFG, include_phash=False
    )
    assert res.verified_new.count() == 0
    assert _rows(res.clusters) == [("a1", "a1"), ("a2", "a1"), ("z9", "z9")]
