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


def test_stream_near_dup_matches_batch_pipeline(spark, tmp_path):
    """Dedup-on-ingest differential: streaming the corpus in two micro-batch
    files through start_stream_near_dup must emit EXACTLY the batch
    pipeline's verified pair set (no bucket exceeds the cap on this
    fixture), each pair exactly once, in the batch where its later member
    arrived."""
    from simhash_spark.plans.pipeline import candidate_job, fingerprint_job, verify_job
    from simhash_spark.sources.fixtures import make_images_pdf
    from simhash_spark.streaming.incremental import start_stream_near_dup

    pdf = make_images_pdf(300, seed=13, with_bytes=False)
    src_dir = tmp_path / "nd_src"
    src_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:150], preserve_index=False), src_dir / "a.parquet")
    pq.write_table(pa.Table.from_pandas(pdf.iloc[150:], preserve_index=False), src_dir / "b.parquet")

    batch_src = spark.read.parquet(str(src_dir))
    stream_src = spark.readStream.schema(batch_src.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src_dir))

    q = start_stream_near_dup(
        stream_src,
        str(tmp_path / "nd_fp"),
        str(tmp_path / "nd_matches"),
        str(tmp_path / "nd_ckpt"),
        CFG,
    )
    q.awaitTermination(timeout=180)
    q.stop()

    got_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "nd_matches"))
        .collect()
    )
    got = {(r["a"], r["b"]) for r in got_rows}
    assert len(got) == len(got_rows), "a pair was emitted more than once"

    fp = fingerprint_job(spark, batch_src, CFG)
    want = {
        (r["a"], r["b"])
        for r in verify_job(candidate_job(fp, CFG), fp, CFG).collect()
    }
    assert got == want and len(want) > 0

    # cross-batch pairs exist and were emitted in the later batch
    later = {
        (r["a"], r["b"]) for r in got_rows if r["_batch_id"] > 0
    }
    assert later, "expected at least one cross-batch (or second-batch) pair"


def _write_ts_file(path, rows):
    """rows: list of (image_id, caption, ts_iso)"""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["image_id", "caption", "ts"])
    # micros, not pandas' default nanos — Spark's parquet reader rejects ns
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def test_windowed_dup_stats_watermark_drops_late_rows(spark, tmp_path):
    """Event-time windows + watermark + late data (SURVEY §2.2 streaming):
    1-hour tumbling windows, 2-hour watermark. A row that arrives AFTER the
    watermark passed its window must be dropped — the emitted count for
    that window stays at the on-time value."""
    from simhash_spark.streaming.incremental import stream_windowed_dup_stats

    src = tmp_path / "wsrc"
    src.mkdir()
    out = tmp_path / "wout"
    ckpt = str(tmp_path / "wckpt")
    schema = "image_id string, caption string, ts timestamp"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream_windowed_dup_stats(stream, CFG)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)

    # batch 1: three copies of one caption in the 10:00 window, plus a row
    # at 14:00 that pushes the watermark to 12:00 (> 11:00) so the 10:00
    # window closes and emits
    _write_ts_file(
        src / "b1.parquet",
        [
            ("i1", "the same viral caption here", "2024-01-01 10:05:00"),
            ("i2", "the same viral caption here", "2024-01-01 10:25:00"),
            ("i3", "the same viral caption here", "2024-01-01 10:55:00"),
            ("i9", "something entirely different text", "2024-01-01 14:00:00"),
        ],
    )
    run_once()
    emitted = spark.read.parquet(str(out))
    w10 = emitted.where(F.col("window_start") == "2024-01-01 10:00:00").collect()
    assert len(w10) == 1 and w10[0]["n_rows"] == 3 and w10[0]["min_image_id"] == "i1"

    # batch 2: a LATE copy for the (closed) 10:00 window + a 17:00 row that
    # advances the watermark past 14:00-15:00 so that window emits too
    _write_ts_file(
        src / "b2.parquet",
        [
            ("i4", "the same viral caption here", "2024-01-01 10:40:00"),  # late
            ("i8", "unrelated tail row caption", "2024-01-01 17:30:00"),
        ],
    )
    run_once()
    emitted = spark.read.parquet(str(out))
    w10 = emitted.where(F.col("window_start") == "2024-01-01 10:00:00").collect()
    # the late i4 row was dropped: still ONE emitted row, count still 3
    assert len(w10) == 1 and w10[0]["n_rows"] == 3
    w14 = emitted.where(F.col("window_start") == "2024-01-01 14:00:00").collect()
    assert len(w14) == 1 and w14[0]["n_rows"] == 1 and w14[0]["min_image_id"] == "i9"


def test_stream_first_seen_suppresses_cross_batch_duplicates(spark, tmp_path):
    """applyInPandasWithState dedup: per-simhash state persists across
    restarts via the checkpoint, so a duplicate arriving in a LATER run of
    the query is suppressed."""
    import pandas as pd

    from simhash_spark.streaming.incremental import stream_first_seen

    src = tmp_path / "fs_src"
    src.mkdir()
    ckpt = str(tmp_path / "fs_ckpt")
    out = tmp_path / "fs_out"
    schema = "image_id string, caption string"

    def _emitted():
        try:
            return {r["image_id"] for r in spark.read.parquet(str(out)).collect()}
        except Exception:
            return set()

    def run_once(name):
        # memory sink cannot recover from a checkpoint; foreachBatch+append
        # is the recovery-capable shape (same as production ingest)
        before = _emitted()
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream_first_seen(stream, CFG)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(str(out))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)
        return _emitted() - before

    cap_x = "caption number one with several words"
    cap_y = "a completely different second caption"
    cap_z = "yet another third caption entirely new"
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {"image_id": ["b", "a", "c"], "caption": [cap_x, cap_x, cap_y]}
            ),
            preserve_index=False,
        ),
        src / "f1.parquet",
    )
    got1 = run_once("fs_run1")
    # within-batch dup of cap_x collapses to min image_id "a"
    assert got1 == {"a", "c"}

    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {"image_id": ["d", "e"], "caption": [cap_x, cap_z]}
            ),
            preserve_index=False,
        ),
        src / "f2.parquet",
    )
    got2 = run_once("fs_run2")
    # "d" duplicates cap_x from run 1 -> suppressed by persisted state
    assert got2 == {"e"}


def test_stream_near_dup_quality_filter_matches_batch(spark, tmp_path):
    """Streaming ingest with quality_filter=True == batch pipeline over the
    pre-filtered corpus: dropped rows never enter the fingerprint table or
    any emitted pair (the same E0 rules guard both doors)."""
    from simhash_spark.operators.search import image_quality_filter
    from simhash_spark.plans.pipeline import candidate_job, fingerprint_job, verify_job
    from simhash_spark.sources.fixtures import make_images_pdf
    from simhash_spark.streaming.incremental import start_stream_near_dup

    pdf = make_images_pdf(300, seed=13, with_bytes=False)
    src_dir = tmp_path / "qf_src"
    src_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:150], preserve_index=False), src_dir / "a.parquet")
    pq.write_table(pa.Table.from_pandas(pdf.iloc[150:], preserve_index=False), src_dir / "b.parquet")

    batch_src = spark.read.parquet(str(src_dir))
    stream_src = spark.readStream.schema(batch_src.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src_dir))

    q = start_stream_near_dup(
        stream_src,
        str(tmp_path / "qf_fp"),
        str(tmp_path / "qf_matches"),
        str(tmp_path / "qf_ckpt"),
        CFG,
        quality_filter=True,
    )
    q.awaitTermination(timeout=180)
    q.stop()

    got = {
        (r["a"], r["b"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "qf_matches"))
        .collect()
    }
    kept_src = image_quality_filter(batch_src).where("keep = 1").drop("keep", "reason")
    dropped = {
        r["image_id"]
        for r in image_quality_filter(batch_src).where("keep = 0").collect()
    }
    assert dropped  # fixture exercises the drop path
    fp = fingerprint_job(spark, kept_src, CFG)
    want = {
        (r["a"], r["b"])
        for r in verify_job(candidate_job(fp, CFG), fp, CFG).collect()
    }
    assert got == want and len(want) > 0
    assert not {i for p in got for i in p} & dropped
    fp_ids = {
        r["image_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "qf_fp"))
        .select("image_id")
        .collect()
    }
    assert not fp_ids & dropped


def test_stream_curation_gate_matches_batch(spark, tmp_path):
    """Streaming curation door (quality filter + PII scrub via foreachBatch)
    differential vs the batch operators on the same rows (r4 verdict #6):
    identical surviving ids, identical scrubbed text, identical audit
    counts — and replaying a micro-batch directory overwrites instead of
    duplicating."""
    import pandas as pd

    from simhash_spark.operators.curation import pii_scrub
    from simhash_spark.operators.textops import quality_filter
    from simhash_spark.streaming.incremental import start_curated_ingest

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    # plant PII rows that PASS the quality gate (the sf table's natural PII
    # rows mostly fail it, which would leave the scrub path unexercised)
    pii_text = (
        "the quick brown fox jumps over the lazy dog and writes to "
        "alice@example.com from 10.1.2.3 while calling +12025550147 about "
        "the seventeen distinct ordinary words this sentence now contains "
        "for the stopword and repetition rules to accept it as real text."
    )
    planted = pd.DataFrame(
        [
            {"doc_id": 900001 + i, "text": pii_text + f" variant {i}",
             "lang": "en", "source": "planted", "n_chars": len(pii_text)}
            for i in range(3)
        ]
    )
    docs = pd.concat([docs, planted], ignore_index=True)
    src_dir = tmp_path / "docs_src"
    src_dir.mkdir()
    half = len(docs) // 2
    pq.write_table(pa.Table.from_pandas(docs.iloc[:half], preserve_index=False), src_dir / "a.parquet")
    pq.write_table(pa.Table.from_pandas(docs.iloc[half:], preserve_index=False), src_dir / "b.parquet")

    batch_src = spark.read.parquet(str(src_dir))
    stream_src = (
        spark.readStream.schema(batch_src.schema)
        .option("maxFilesPerTrigger", 1)  # force >= 2 micro-batches
        .parquet(str(src_dir))
    )

    out = tmp_path / "curated"
    q = start_curated_ingest(stream_src, str(out), str(tmp_path / "cur_ckpt"))
    q.awaitTermination(timeout=120)

    got_df = spark.read.option("recursiveFileLookup", "true").parquet(str(out))
    got = {
        r["doc_id"]: (r["text"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in got_df.collect()
    }

    kept = quality_filter(batch_src, "text").where("keep = 1").drop("keep", "reason")
    scrubbed = (
        pii_scrub(kept, "text").drop("text").withColumnRenamed("clean_text", "text")
    )
    expect = {
        r["doc_id"]: (r["text"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in scrubbed.collect()
    }
    assert got == expect
    assert 0 < len(got) < batch_src.count()  # the gate actually dropped rows
    assert sum(v[1] + v[2] + v[3] for v in got.values()) > 0  # and scrubbed PII
    # >=2 micro-batches ran, and each landed in its own overwrite-safe dir
    assert got_df.select("_batch_id").distinct().count() >= 2


def test_stream_curation_gate_bloom_matches_batch(spark, tmp_path):
    """The Bloom decontamination drop at the streaming door equals the batch
    composition (quality -> scrub -> bloom over the SCRUBBED text) on the
    same rows across >= 2 micro-batches — the filter is built once at
    stream setup, the per-row decision is the frozen one-sided rule, so
    planted contaminated rows can never survive the gate."""
    import pandas as pd

    from simhash_spark.operators.curation import (
        bloom_contamination_counts,
        pii_scrub,
    )
    from simhash_spark.operators.textops import quality_filter
    from simhash_spark.streaming.incremental import start_curated_ingest

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "distinct ordinary words fill this sentence for the stopword and "
        "repetition rules to accept it as perfectly real text"
    )
    leak = "sealed benchmark answer tokens nobody should ever train on"
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    planted = pd.DataFrame(
        [
            # quality-passing CONTAMINATED rows (share the leak 5+-gram run)
            {"doc_id": 910001 + i, "text": f"{base} and then {leak} again {i}",
             "lang": "en", "source": "planted", "n_chars": 100}
            for i in range(2)
        ]
        + [
            # quality-passing clean row — must survive the bloom stage
            {"doc_id": 910010, "text": base + " entirely without any leak",
             "lang": "en", "source": "planted", "n_chars": 100}
        ]
    )
    docs = pd.concat([docs, planted], ignore_index=True)
    src_dir = tmp_path / "bl_src"
    src_dir.mkdir()
    half = len(docs) // 2
    pq.write_table(pa.Table.from_pandas(docs.iloc[:half], preserve_index=False), src_dir / "a.parquet")
    pq.write_table(pa.Table.from_pandas(docs.iloc[half:], preserve_index=False), src_dir / "b.parquet")

    bench = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 1, "text": f"held out eval where {leak} appears"}])
    )
    batch_src = spark.read.parquet(str(src_dir))
    stream_src = (
        spark.readStream.schema(batch_src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    out = tmp_path / "bl_curated"
    q = start_curated_ingest(
        stream_src, str(out), str(tmp_path / "bl_ckpt"), bloom_benchmark=bench
    )
    q.awaitTermination(timeout=120)
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(out))
        .collect()
    }

    kept = quality_filter(batch_src, "text").where("keep = 1").drop("keep", "reason")
    scrubbed = (
        pii_scrub(kept, "text").drop("text").withColumnRenamed("clean_text", "text")
    )
    dirty = (
        bloom_contamination_counts(scrubbed, bench, n=5)
        .where("n_maybe_overlap >= 1")
        .select(F.col("id").alias("doc_id"))
    )
    expect = {
        r["doc_id"]: r["text"]
        for r in scrubbed.join(dirty, "doc_id", "left_anti").collect()
    }
    assert got == expect
    assert 910010 in got  # the clean planted row survived
    assert not {910001, 910002} & set(got)  # contaminated rows never slip through


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Native session windows over micro-batches equal batch sessionize on
    the same events (r4 verdict #6, optional half): same frozen gap rule
    (split iff gap > gap_s, == boundary merges), sessions merging ACROSS
    micro-batch boundaries, late-session flush via watermark sentinel."""
    import datetime as dt

    import pandas as pd

    from simhash_spark.operators.curation import sessionize
    from simhash_spark.streaming.incremental import stream_sessionize

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # user 1: [0, 10] | [1811, 1900] — split once (gap 1801 > 1800)
    for i, off in enumerate([0, 10, 1811, 1900]):
        rows.append((i, t0 + dt.timedelta(seconds=off), 1))
    # user 2: [0, 1800] — exactly-1800 gap must NOT split
    rows.append((10, t0, 2))
    rows.append((11, t0 + dt.timedelta(seconds=1800), 2))
    # user 3: session straddles the micro-batch boundary (file split below)
    rows.append((20, t0 + dt.timedelta(seconds=100), 3))
    rows.append((21, t0 + dt.timedelta(seconds=200), 3))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    # watermark-flush sentinel: far-future event for a throwaway user, in
    # the LAST file, pushes the watermark past every real session's close
    sentinel = pd.DataFrame(
        [(999, t0 + dt.timedelta(days=2), 99)], columns=["event_id", "ts", "user_id"]
    )
    sentinel["ts"] = pd.to_datetime(sentinel["ts"]).astype("datetime64[us]")

    src_dir = tmp_path / "ev_src"
    src_dir.mkdir()
    # split user 3's session across the two files (cross-batch state merge)
    pq.write_table(
        pa.Table.from_pandas(pdf.iloc[[0, 1, 4, 6]], preserve_index=False),
        src_dir / "a.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.concat([pdf.iloc[[2, 3, 5, 7]], sentinel], ignore_index=True),
            preserve_index=False,
        ),
        src_dir / "b.parquet",
    )

    batch_src = spark.read.parquet(str(src_dir))
    stream_src = (
        spark.readStream.schema(batch_src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    out = tmp_path / "sessions"
    q = (
        stream_sessionize(stream_src)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)

    got = {
        (r["user_id"], r["start_s"]): (r["n_events"], r["end_s"], r["duration_s"])
        for r in spark.read.parquet(str(out)).where("user_id != 99").collect()
    }
    expect = {
        (r["user_id"], r["start_s"]): (r["n_events"], r["end_s"], r["duration_s"])
        for r in sessionize(batch_src.where("user_id != 99")).collect()
    }
    assert got == expect and len(got) == 4
    # the boundary case really merged and the straddling session really
    # crossed micro-batches as ONE session
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[(2, base)] == (2, base + 1800, 1800)
    assert got[(3, base + 100)] == (2, base + 200, 100)


def test_ingest_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a batch (simulated by
    rerunning the drained source with a FRESH checkpoint, so the same batch
    ids redeliver) must OVERWRITE its own per-batch directory, never append
    duplicate fingerprint rows into the accumulated table."""
    from simhash_spark.sources.fixtures import make_images_pdf
    from simhash_spark.streaming.incremental import start_incremental_ingest

    pdf = make_images_pdf(120, seed=21, with_bytes=False)
    src_dir = tmp_path / "rp_src"
    src_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), src_dir / "a.parquet")
    batch_src = spark.read.parquet(str(src_dir))
    out = tmp_path / "rp_fp"

    for ckpt in ("rp_ckpt1", "rp_ckpt2"):  # second run = full replay
        stream = spark.readStream.schema(batch_src.schema).parquet(str(src_dir))
        q = start_incremental_ingest(stream, str(out), str(tmp_path / ckpt), CFG)
        q.awaitTermination(timeout=120)
        q.stop()
        rows = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(out))
            .select("image_id")
            .collect()
        )
        assert len(rows) == 120, f"replay duplicated rows: {len(rows)}"
        assert len({r["image_id"] for r in rows}) == 120


def test_near_dup_replay_excludes_own_batch_output(spark, tmp_path):
    """Crash-replay of start_stream_near_dup: on redelivery the batch's own
    previously-written fp directory must NOT be read into `existing` (that
    would double-count every batch row: duplicated match rows, [x, x]
    buckets). Simulated by rerunning the drained source with a fresh
    checkpoint — same batch ids, fp batch dirs already on disk. Matches
    must equal the first run's exactly, one row per pair."""
    from simhash_spark.streaming.incremental import start_stream_near_dup
    from simhash_spark.sources.fixtures import make_images_pdf

    pdf = make_images_pdf(200, seed=31, with_bytes=False)
    src_dir = tmp_path / "rr_src"
    src_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), src_dir / "a.parquet")
    batch_src = spark.read.parquet(str(src_dir))

    def run(ckpt):
        stream = spark.readStream.schema(batch_src.schema).parquet(str(src_dir))
        q = start_stream_near_dup(
            stream,
            str(tmp_path / "rr_fp"),
            str(tmp_path / "rr_matches"),
            str(tmp_path / ckpt),
            CFG,
        )
        q.awaitTermination(timeout=180)
        q.stop()
        rows = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(tmp_path / "rr_matches"))
            .collect()
        )
        return rows

    first = run("rr_ckpt1")
    pairs1 = {(r["a"], r["b"]) for r in first}
    assert len(pairs1) == len(first) and pairs1
    replay = run("rr_ckpt2")
    pairs2 = {(r["a"], r["b"]) for r in replay}
    assert len(pairs2) == len(replay), "replay duplicated match rows"
    assert pairs2 == pairs1, "replay changed the emitted pair set"
    # the accumulated fp table is also intact (no duplicated ids)
    fp_ids = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "rr_fp"))
        .select("image_id")
        .collect()
    )
    assert len(fp_ids) == 200 and len({r["image_id"] for r in fp_ids}) == 200


def test_first_seen_distinct_blank_captions_not_glued(spark, tmp_path):
    """Zero-shingle captions carry the kernel's constant empty-input
    simhash; the state key must fall back to the raw-caption hash so
    DISTINCT blank-ish rows are each emitted (novel content is never
    suppressed by the constant), while an identical blank caption arriving
    later is still deduplicated."""
    import pandas as pd

    from simhash_spark.streaming.incremental import stream_first_seen

    src = tmp_path / "bl_src"
    src.mkdir()
    ckpt = str(tmp_path / "bl_ckpt")
    out = tmp_path / "bl_out"
    schema = "image_id string, caption string"

    def run_once():
        try:
            before = {r["image_id"] for r in spark.read.parquet(str(out)).collect()}
        except Exception:
            before = set()
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream_first_seen(stream, CFG)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _b: df.write.mode("append").parquet(str(out)))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)
        after = {r["image_id"] for r in spark.read.parquet(str(out)).collect()}
        return after - before

    # "" and "   " tokenize to NOTHING (n_shingles == 0) but are distinct
    # raw captions; a real caption rides along as control
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "image_id": ["e1", "e2", "t1"],
                    "caption": ["", "   ", "a normal caption with words"],
                }
            ),
            preserve_index=False,
        ),
        src / "f1.parquet",
    )
    assert run_once() == {"e1", "e2", "t1"}

    # identical blank caption later -> suppressed; new distinct blank -> emitted
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"image_id": ["e3", "e4"], "caption": ["", "\t"]}),
            preserve_index=False,
        ),
        src / "f2.parquet",
    )
    assert run_once() == {"e4"}


def test_stream_semantic_dedup_matches_greedy_mirror(spark, tmp_path):
    """Semantic dedup on ingest: per-batch decisions equal an independent
    python mirror of the frozen greedy rule (ascending-id within batch,
    accept iff cosine < tau to every already-accepted row of the cell,
    across batches), and the accepted set is pairwise < tau within every
    cell — the same guarantee the batch keeper set carries. State persists
    across query restarts through the per-batch parquet table."""
    import numpy as np
    import pandas as pd

    from simhash_spark.operators.ann import ivf_fit
    from simhash_spark.streaming.incremental import start_stream_semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = ivf_fit(emb, n_centroids=16, n_iter=8)
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    vids = pdf["vec_id"].to_numpy(np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ cent.T
    cells = np.argpartition(-sims, 0, axis=1)[:, 0]
    TAU = 0.4

    src = tmp_path / "sem_src"
    src.mkdir()
    acc, dec, ckpt = (
        str(tmp_path / "sem_acc"), str(tmp_path / "sem_dec"), str(tmp_path / "sem_ckpt"),
    )
    schema = "vec_id long, embedding array<float>"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = start_stream_semantic_dedup(
            stream, cent, acc, dec, ckpt, tau=TAU,
        )
        q.awaitTermination(timeout=180)

    # three arrival chunks, deliberately NOT in global id order
    chunks = [np.arange(200, 350), np.arange(0, 200), np.arange(350, len(vids))]
    accepted_mirror: dict[int, list[int]] = {}  # cell -> row indices
    expect: dict[int, int] = {}
    for ci, chunk in enumerate(chunks):
        rows = pdf.iloc[chunk]
        pq.write_table(
            pa.Table.from_pandas(rows, preserve_index=False), src / f"c{ci}.parquet"
        )
        run_once()
        # mirror the greedy rule for this batch (ascending id)
        for i in sorted(chunk.tolist(), key=lambda i_: vids[i_]):
            cell = int(cells[i])
            prior = accepted_mirror.setdefault(cell, [])
            hit = any(float(mat[i] @ mat[j]) >= TAU for j in prior)
            expect[int(vids[i])] = 0 if hit else 1
            if not hit:
                prior.append(i)

    got = (
        spark.read.option("recursiveFileLookup", "true").parquet(dec).toPandas()
    )
    assert len(got) == len(vids) and got.id.is_unique
    for r in got.itertuples():
        assert expect[r.id] == r.is_kept, (r.id, expect[r.id], r.is_kept)
    # cells agree with the assignment math
    got_cells = dict(zip(got.id, got.cell))
    for i in range(len(vids)):
        assert got_cells[int(vids[i])] == int(cells[i])
    # pairwise-< tau invariant over the final accepted set, per cell
    by_id = {int(vids[i]): i for i in range(len(vids))}
    kept_ids = got[got.is_kept == 1].id.tolist()
    from collections import defaultdict as _dd

    per_cell = _dd(list)
    for kid in kept_ids:
        per_cell[int(cells[by_id[kid]])].append(by_id[kid])
    for mem in per_cell.values():
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                assert float(mat[mem[x]] @ mat[mem[y]]) < TAU
    # the state table holds exactly the accepted rows
    state = spark.read.option("recursiveFileLookup", "true").parquet(acc)
    assert {r["id"] for r in state.select("id").collect()} == set(kept_ids)


def test_stream_byte_first_seen_suppresses_reuploads(spark, tmp_path):
    """Byte-level first-seen at the ingest door: (a) a re-upload of already-
    seen bytes in a LATER batch (and a later run restored from checkpoint)
    is suppressed; (b) within the first batch holding a digest, the min
    image_id is the canonical admit; (c) NULL-bytes rows ALWAYS pass (the
    ladder's absent-content rule) with a NULL digest."""
    import pandas as pd

    from simhash_spark.streaming.incremental import stream_byte_first_seen

    src = tmp_path / "bfs_src"
    src.mkdir()
    ckpt = str(tmp_path / "bfs_ckpt")
    out = tmp_path / "bfs_out"
    schema = "image_id string, bytes binary"

    def _emitted():
        try:
            return {
                r["image_id"]: r["digest"]
                for r in spark.read.parquet(str(out)).collect()
            }
        except Exception:
            return {}

    def run_once():
        before = set(_emitted())
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream_byte_first_seen(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _bid: df.write.mode("append").parquet(str(out)))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)
        emitted = _emitted()
        return {k: emitted[k] for k in set(emitted) - before}

    payload_x, payload_y, payload_z = b"\x01" * 64, b"\x02" * 64, b"\x03" * 64
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "image_id": ["b", "a", "c", "n1"],
                    "bytes": [payload_x, payload_x, payload_y, None],
                }
            )
        ),
        src / "batch1.parquet",
    )
    got1 = run_once()
    # min-id admit for the x-group; y admitted; null passes with NULL digest
    assert set(got1) == {"a", "c", "n1"}
    assert got1["n1"] is None
    assert got1["a"] is not None and got1["c"] is not None and got1["a"] != got1["c"]

    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "image_id": ["d", "e", "n2"],
                    "bytes": [payload_x, payload_z, None],
                }
            )
        ),
        src / "batch2.parquet",
    )
    got2 = run_once()  # restored from checkpoint: digest state persists
    assert set(got2) == {"e", "n2"}, f"re-upload not suppressed: {got2}"
    assert got2["n2"] is None


def test_stream_near_dup_byte_exact_ladder_matches_batch(spark, tmp_path):
    """The streaming image LADDER door (byte_exact=True): byte first-seen
    admission before fingerprinting. With id-ordered arrival (min id of
    every md5 group lands in the earliest batch holding the group), the
    first-seen keeper EQUALS the batch min-id keeper, so the drained match
    set must equal the batch pipeline's verified pairs over the byte tier's
    survivors — and no suppressed re-upload may appear in any pair or in
    the accumulated fingerprint table."""
    import hashlib

    from collections import defaultdict

    from simhash_spark.config import DEFAULT_CONFIG as CFG2
    from simhash_spark.plans.pipeline import candidate_job, fingerprint_job, verify_job
    from simhash_spark.sources.fixtures import (
        INPUT_HINT_SCHEMA,
        make_images_pdf,
        plant_byte_reuploads,
    )
    from simhash_spark.streaming.incremental import start_stream_near_dup

    pdf = plant_byte_reuploads(make_images_pdf(300, seed=13, with_bytes=True))
    src_dir = tmp_path / "bx_src"
    src_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:150], preserve_index=False), src_dir / "a.parquet")
    pq.write_table(pa.Table.from_pandas(pdf.iloc[150:], preserve_index=False), src_dir / "b.parquet")

    stream_src = spark.readStream.schema(INPUT_HINT_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src_dir))
    q = start_stream_near_dup(
        stream_src,
        str(tmp_path / "bx_fp"),
        str(tmp_path / "bx_matches"),
        str(tmp_path / "bx_ckpt"),
        CFG2,
        byte_exact=True,
    )
    q.awaitTermination(timeout=180)
    q.stop()

    got_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "bx_matches"))
        .collect()
    )
    got = {(r["a"], r["b"]) for r in got_rows}
    assert len(got) == len(got_rows), "a pair was emitted more than once"

    # batch mirror: byte tier (min-id per md5 group) then the near pipeline
    groups = defaultdict(list)
    for iid, data in zip(pdf["image_id"].astype(str), pdf["bytes"]):
        groups[hashlib.md5(bytes(data)).hexdigest()].append(iid)
    dropped = {i for mem in groups.values() for i in mem if i != min(mem)}
    assert dropped, "fixture planted no byte dups; vacuous"
    surv = spark.createDataFrame(
        pdf[~pdf["image_id"].astype(str).isin(dropped)], schema=INPUT_HINT_SCHEMA
    )
    fp = fingerprint_job(spark, surv, CFG2)
    want = {
        (r["a"], r["b"])
        for r in verify_job(candidate_job(fp, CFG2), fp, CFG2).collect()
    }
    assert got == want and len(want) > 0

    # suppression is total: no dropped id in any pair or in the fp table
    assert not any(a in dropped or b in dropped for a, b in got)
    fp_ids = {
        r["image_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "bx_fp"))
        .collect()
    }
    assert not (fp_ids & dropped)
    assert fp_ids == set(pdf["image_id"].astype(str)) - dropped
