"""Streaming ingestion: the same fingerprint kernels over readStream +
foreachBatch append, differential-checked against the batch path."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from simhash_spark.config import DEFAULT_CONFIG as CFG


def test_stream_matches_batch(spark, tmp_path):
    from simhash_spark.plans.pipeline import fingerprint_job
    from simhash_spark.sources.fixtures import make_images_pdf
    from simhash_spark.streaming.incremental import start_incremental_ingest

    pdf = make_images_pdf(300, seed=9, with_bytes=False)
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    # two files -> at least two micro-batch-visible inputs
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:150], preserve_index=False), src_dir / "a.parquet")
    pq.write_table(pa.Table.from_pandas(pdf.iloc[150:], preserve_index=False), src_dir / "b.parquet")

    batch_src = spark.read.parquet(str(src_dir))
    stream_src = spark.readStream.schema(batch_src.schema).parquet(str(src_dir))

    out = tmp_path / "fp_out"
    q = start_incremental_ingest(
        stream_src, str(out), str(tmp_path / "stream_ckpt"), CFG
    )
    q.awaitTermination(timeout=120)

    got = {
        r["image_id"]: (r["simhash"], r["n_shingles"], tuple(r["bands"]))
        for r in spark.read.parquet(str(out)).collect()
    }
    expect = {
        r["image_id"]: (r["simhash"], r["n_shingles"], tuple(r["bands"]))
        for r in fingerprint_job(spark, batch_src, CFG).collect()
    }
    assert got == expect
    # batch ids recorded for lineage
    assert spark.read.parquet(str(out)).select("_batch_id").distinct().count() >= 1
