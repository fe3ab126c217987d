"""Incremental ingestion — the Structured Streaming face of the engine.

The reference is a batch program (/root/reference/README.md:13) and the
BASELINE north rule is batch, so streaming is an *extension*, built the
obvious Spark-first way (SURVEY.md §7.8): the SAME fingerprint UDF runs on a
``readStream`` source, and ``foreachBatch`` appends each micro-batch's
fingerprints to the fingerprint table. Candidate generation/verify/CC then
run as periodic batch jobs over the (append-only) fingerprint table — the
standard lambda-free "stream ingest, batch reconcile" dedup deployment:
fingerprinting is the embarrassingly-parallel 99% of compute and happens
exactly once per image at ingest time.

Per-record semantics are identical to the batch path by construction: the
UDF calls the same frozen kernels (tests assert stream output == batch
output on the same rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_spark.config import DEFAULT_CONFIG, PipelineConfig
from simhash_spark.functions.udfs import with_fingerprints


def stream_fingerprints(
    stream_df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Streaming (image_id, caption, phash, ...) -> + simhash, n_shingles,
    bands. Stateless projection — no watermark needed; works on any
    streaming source (file/kafka/rate) carrying the input_hint columns."""
    slim = stream_df.select("image_id", "caption", "phash")
    return with_fingerprints(slim, cfg, emit_minhash=False).drop("caption")


def start_incremental_ingest(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    trigger_once: bool = True,
):
    """writeStream via foreachBatch: append each micro-batch's fingerprints
    to the fingerprint table (parquet locally, Iceberg in production — the
    append is the only sink operation used, so either backend works).

    Returns the StreamingQuery; caller awaits/stops it. ``trigger_once``
    processes all available input then stops (the batch-reconcile cadence);
    pass False for continuous micro-batches.
    """
    fp = stream_fingerprints(stream_df, cfg)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )

    writer = fp.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_first_seen(
    stream_df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Cross-batch streaming exact-fingerprint dedup — the custom stateful
    operator face of the engine (``applyInPandasWithState``).

    Emits each distinct simhash ONCE, at its first arrival across the whole
    stream's lifetime: per-key state (arrival count) lives in the state
    store and survives restarts via the query checkpoint. Later arrivals of
    the same fingerprint are suppressed — the streaming analogue of
    ``exact_dedup`` (operators/dedup.py), used to admit only novel content
    into a training corpus at ingest time.

    Within the first batch that sees a key, the canonical emitted row is
    the minimum image_id (the engine's frozen representative rule).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    fp = with_fingerprints(
        stream_df.select("image_id", "caption"), cfg, emit_minhash=False
    ).select("image_id", "simhash")

    def first_seen(key, pdf_iter, state: GroupState):
        seen_before = state.exists and state.get[0] > 0
        total = state.get[0] if state.exists else 0
        # the group may arrive as SEVERAL pandas chunks (Arrow batch size);
        # the canonical min id must be taken across ALL of them, not just
        # the first non-empty chunk
        first: pd.DataFrame | None = None
        for pdf in pdf_iter:
            total += len(pdf)
            if seen_before or not len(pdf):
                continue
            idx = pdf["image_id"].idxmin()
            cand = pdf.loc[[idx], ["image_id", "simhash"]]
            if first is None or cand["image_id"].iloc[0] < first["image_id"].iloc[0]:
                first = cand
        state.update((total,))
        if first is not None:
            yield first

    return fp.groupBy("simhash").applyInPandasWithState(
        first_seen,
        outputStructType="image_id string, simhash long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_windowed_dup_stats(
    stream_df: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window duplicate statistics — the stateful
    windowed-aggregation face of the engine (event time + late data).

    For a stream of (image_id, caption, <ts>) rows: fingerprint each row
    with the same frozen UDF, then count arrivals per (event-time window,
    simhash). Rows sharing a simhash within a window are exact/near-dup
    ingest bursts (n_rows > 1 — e.g. the same viral image re-submitted);
    ``min_image_id`` is the window's canonical representative.

    Semantics are standard Structured Streaming event-time processing:
    state is keyed by (window, simhash) in the state store; the watermark
    (``watermark_delay`` behind max event time) bounds state and DROPS rows
    later than it (tested in tests/test_streaming.py — a row arriving after
    its window's watermark passed does not change the emitted count); with
    append output mode a window's row emits once, after the watermark
    passes its end.
    """
    slim = stream_df.select(
        "image_id", "caption", F.col(ts_col).cast("timestamp").alias("_ts")
    )
    fp = with_fingerprints(slim, cfg, emit_minhash=False).drop("caption")
    return (
        fp.withWatermark("_ts", watermark_delay)
        .groupBy(F.window("_ts", window_duration).alias("w"), "simhash")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("image_id").alias("min_image_id"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "simhash",
            "n_rows",
            "min_image_id",
        )
    )
