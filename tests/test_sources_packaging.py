"""Text-file article source (the reference's input shape) + the
spark-submit --py-files ship shape (engine importable from engine.zip with
the repo checkout absent from sys.path)."""

from __future__ import annotations

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_spread_small_input(spark, tmp_path):
    """The narrow-scan guard: a single-file/single-row-group parquet scan
    (the driver's sf-table shape) is repartitioned up to session
    parallelism; an input already at/above the target — and any streaming
    plan — passes through untouched (no added exchange at scale)."""
    import pandas as pd

    from simhash_spark.session import spread_small_input

    p = tmp_path / "one.parquet"
    pd.DataFrame({"id": range(100)}).to_parquet(p)
    narrow = spark.read.parquet(str(p))
    target = spark.sparkContext.defaultParallelism
    assert narrow.rdd.getNumPartitions() < target
    assert spread_small_input(narrow).rdd.getNumPartitions() == target

    wide = spark.range(1000).repartition(target + 4)
    assert spread_small_input(wide) is wide  # untouched, not just same count

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    )
    assert spread_small_input(stream) is stream


def test_read_articles_and_stopword_file(spark, tmp_path):
    from simhash_spark.plans.text_dedup import text_near_dup_clusters
    from simhash_spark.sources.text import read_articles, read_stopword_file

    d = tmp_path / "articles"
    d.mkdir()
    (d / "a1.txt").write_text("alpha beta gamma delta epsilon zeta eta theta")
    (d / "a2.txt").write_text("alpha beta gamma delta epsilon zeta eta theta")
    (d / "a3.txt").write_text("completely different words in this one file")
    (d / "notes.md").write_text("ignored: not a .txt article")

    docs = read_articles(spark, str(d))
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == {"a1", "a2", "a3"}
    assert got["a1"].startswith("alpha beta")

    # the article source feeds the engine's text pipeline unchanged:
    # the two identical articles land in one cluster
    clusters = {
        r["doc_id"]: r["cluster_id"] for r in text_near_dup_clusters(docs).collect()
    }
    assert clusters["a1"] == clusters["a2"] == "a1"
    assert clusters["a3"] == "a3"

    sw = tmp_path / "stop.txt"
    sw.write_text("The\na\nAN\n\n  of \n")
    assert read_stopword_file(sw) == {"the", "a", "an", "of"}


_ZIP_SCRIPT = """
import pathlib, sys
zip_path, data_dir = sys.argv[1], sys.argv[2]
# simulate spark-submit --py-files: ONLY the zip provides the engine
sys.path = [p for p in sys.path if "repo" not in p]
sys.path.insert(0, zip_path)

import simhash_spark
assert zip_path in simhash_spark.__file__, simhash_spark.__file__

from pyspark.sql import SparkSession

from simhash_spark.plans.text_dedup import text_near_dup_clusters

spark = (
    SparkSession.builder.master("local[2]")
    .appName("zip-ship-shape")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(data_dir)
n = text_near_dup_clusters(docs, "doc_id", "text").count()
print("ZIPRESULT:" + str(n))
"""


def test_engine_zip_is_self_contained(tmp_path):
    """Build dist/engine.zip and run a UDF-bearing pipeline in a subprocess
    whose only source of the engine is the zip (PYTHONPATH=zip, cwd outside
    the checkout) — the python workers must zipimport the kernels too."""
    sys.path.insert(0, str(REPO / "jobs"))
    try:
        import package as packager
    finally:
        sys.path.pop(0)
    zip_path = packager.build(tmp_path / "engine.zip")

    import pandas as pd

    data = tmp_path / "docs.parquet"
    pd.DataFrame(
        {
            "doc_id": ["d1", "d2", "d3"],
            "text": [
                "one shared caption across rows here",
                "one shared caption across rows here",
                "totally different third document text",
            ],
        }
    ).to_parquet(data)

    import os

    proc = subprocess.run(
        [sys.executable, "-c", _ZIP_SCRIPT, str(zip_path), str(data)],
        cwd=tmp_path,  # outside the checkout: cwd cannot satisfy the import
        env={**os.environ, "PYTHONPATH": str(zip_path)},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ZIPRESULT:3" in proc.stdout


def test_catalog_write_invalidates_manifest_before_clobber(spark, tmp_path):
    """Crash-safety order: a stage REWRITE that dies mid-write must leave
    the stage INCOMPLETE (recompute on rerun) — never the previous
    complete:True manifest pointing at clobbered data, which a later resume
    would silently read as empty."""
    import pytest
    from pyspark.sql import functions as F

    from simhash_spark.sources.catalog import CheckpointCatalog

    cat = CheckpointCatalog(spark, tmp_path / "cs")
    df = spark.range(5).selectExpr("cast(id as string) as image_id")
    cat.run_stage("s1", "fpA", lambda: df)
    assert cat.is_complete("s1", "fpA")

    bad = df.withColumn("boom", F.expr("raise_error('kaboom')"))
    with pytest.raises(Exception, match="kaboom"):
        cat.run_stage("s1", "fpB", lambda: bad)
    # the old manifest was invalidated BEFORE the data dir was touched
    assert not cat.is_complete("s1", "fpA")
    assert not cat.is_complete("s1", "fpB")

    # recovery: a rerun with a working compute completes normally
    out = cat.run_stage("s1", "fpB", lambda: df)
    assert out.count() == 5 and cat.is_complete("s1", "fpB")
