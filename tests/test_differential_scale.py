"""Scale differential (对拍 at 10x the driver's correctness scale): the
engine's text kernel path vs the pure-numpy mirror on the sf0.1 documents
corpus (5,000 docs; the driver's oracle gate runs the same comparison at
sf0.01/500). Catches scale-dependent bugs — bucket-cap interactions,
Arrow-batch boundary effects, shuffle nondeterminism — that a 500-doc
corpus cannot."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from simhash_spark.config import DEFAULT_CONFIG as CFG

SF = "/root/testdata/sf0.1"


def test_text_kernel_matches_mirror_at_sf01(spark):
    from mirror import text_kernel_mirror

    from simhash_spark.plans.text_dedup import (
        text_candidates,
        text_fingerprints,
        text_near_dup_clusters,
    )

    docs_pdf = pd.read_parquet(f"{SF}/documents.parquet")
    m = text_kernel_mirror(docs_pdf, CFG)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fp = text_fingerprints(docs, "doc_id", "text", CFG).cache()

    got_fp = {
        r["image_id"]: (r["simhash"], r["n_shingles"]) for r in fp.collect()
    }
    want_fp = {
        str(i): (int(s), int(ns))
        for i, s, ns in zip(m["ids"], m["simhash_i64"], m["n_shingles"])
    }
    assert got_fp == want_fp, "fingerprints diverge from the numpy mirror"

    got_cand = {
        (r["a"], r["b"]): r["src"]
        for r in text_candidates(fp, CFG).collect()
    }
    assert got_cand == m["candidates"], (
        f"candidate pairs diverge: {len(got_cand)} vs mirror {len(m['candidates'])}"
    )

    got_clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in text_near_dup_clusters(docs, "doc_id", "text", CFG).collect()
    }
    assert got_clusters == m["clusters"]


def test_substring_stage_matches_mirror_at_sf01(spark):
    from mirror import substring_pairs_mirror

    from simhash_spark.operators.substring import substring_pairs

    docs_pdf = pd.read_parquet(f"{SF}/documents.parquet")
    want = substring_pairs_mirror(docs_pdf, CFG)

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("image_id"),
        F.col("text").alias("caption"),
    )
    got = {(r["a"], r["b"]) for r in substring_pairs(d, CFG).collect()}
    assert got == want, f"{len(got)} engine pairs vs {len(want)} mirror pairs"
