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
        # per-batch subdirectory with mode=overwrite — the module's replay-
        # safe discipline (start_stream_near_dup / start_curated_ingest):
        # foreachBatch is at-least-once after crash recovery, and a plain
        # append would duplicate the replayed batch's rows in the
        # accumulated table. Readers scan with recursiveFileLookup.
        batch_df.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/batch={batch_id}")

    writer = fp.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_stream_near_dup(
    stream_df: DataFrame,
    fp_path: str,
    matches_path: str,
    checkpoint_path: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    include_phash: bool = True,
    trigger_once: bool = True,
    quality_filter: bool = False,
    quality_overrides: dict | None = None,
    byte_exact: bool = False,
):
    """NEAR-dup on ingest — the streaming face of the full candidate+verify
    pipeline. Per micro-batch:

    1. fingerprint the arriving rows (same frozen UDF as batch),
    2. generate candidates for them against the ACCUMULATED fingerprint
       table with the very same operators the batch pipeline uses
       (explode_all_keys -> bucket_pairs_packed: LSH bands ∪ pigeonhole
       keys, hot-bucket chains included), restricted to pairs touching a
       new row,
    3. exact-verify (native bit_count XOR) and append verified matches,
    4. append the batch's fingerprints to the table.

    Match semantics: every near-dup pair is emitted exactly once, in the
    micro-batch where its LATER member arrives (both-new pairs emit in that
    batch). After the stream drains, the union of emitted pairs EQUALS the
    batch pipeline's verified pair set over the same rows as long as no
    bucket exceeds ``bucket_cap`` — asserted by differential test
    (tests/test_streaming.py). Buckets past the cap emit their salted
    spanning CHAINS incrementally, which yields a connectivity-preserving
    superset of the batch chain edges (same clusters after CC, possibly
    more edges) — the identical guarantee the batch path itself makes for
    hot buckets.

    Writes are per-batch subdirectories with mode=overwrite, so a replayed
    micro-batch (foreachBatch is at-least-once after crash recovery)
    overwrites its own output instead of duplicating it — exactly-once
    OUTPUT without a transactional sink. At production scale both paths
    would be Iceberg tables and the existing-side scan is one bucket-key
    join per batch, linear in batch size (the accumulated table is only
    scanned, never shuffled beyond its key explode).
    """
    import pathlib

    from simhash_spark.operators.verify import verify_pairs

    if quality_filter:
        # the same E0 keep rules run_pipeline(quality_filter=True) applies —
        # stateless projection, so it composes with the stream unchanged and
        # dropped rows never enter the accumulated fingerprint table
        from simhash_spark.operators.search import image_quality_filter

        stream_df = (
            image_quality_filter(stream_df, **(quality_overrides or {}))
            .where(F.col("keep") == 1)
            .drop("keep", "reason")
        )
    if byte_exact:
        # the streaming image LADDER door: byte-exact FIRST-SEEN admission
        # before fingerprinting (the batch funnel order, with the add-only
        # keeper rule run_delta's refusal points at) — a re-upload of
        # already-admitted bytes never pays the fingerprint UDF, never
        # enters the accumulated index, and never appears in a match.
        # caption+phash ride through the stateful op so fingerprinting
        # composes without a source re-join. Requires update output mode.
        stream_df = stream_byte_first_seen(
            stream_df, passthrough=["caption", "phash"]
        ).drop("digest")
    fp_stream = stream_fingerprints(stream_df, cfg)

    def process_batch(batch_fp: DataFrame, batch_id: int) -> None:
        spark = batch_fp.sparkSession
        batch_fp = batch_fp.localCheckpoint(eager=True)  # pin: used 4 ways below
        cols = batch_fp.columns
        base = pathlib.Path(fp_path)
        # CRASH-REPLAY RULE: exclude this batch's OWN batch=<id> directory.
        # foreachBatch is at-least-once — if the fp write below completed
        # but the offset commit did not, the replay would otherwise read its
        # own previous output into `existing`, double-counting every batch
        # row (duplicated match rows; 2-member [x, x] buckets). Listing the
        # sibling batch dirs explicitly (recursiveFileLookup per dir, no
        # partition inference) keeps replays byte-idempotent.
        sibling_dirs = [
            str(p)
            for p in sorted(base.glob("batch=*"))
            if p.name != f"batch={batch_id}" and any(p.glob("*.parquet"))
        ] if base.exists() else []
        existing = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(*sibling_dirs)
            .select(cols)
            if sibling_dirs
            else None
        )
        combined = (
            batch_fp if existing is None else existing.unionByName(batch_fp)
        )
        # the delta path's operator, verbatim: only buckets containing a new
        # member are expanded (full key table semi-joined against the
        # batch's distinct keys) — per-batch cost stays linear in batch size
        # plus touched-bucket contents instead of re-expanding every
        # accumulated bucket's C(s,2) pairs each micro-batch
        from simhash_spark.plans.delta import incremental_candidates

        touching_new = incremental_candidates(
            batch_fp, combined, cfg, include_phash=include_phash
        )
        verified = verify_pairs(touching_new, combined, cfg, use_phash=include_phash)
        verified.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{matches_path}/batch={batch_id}")
        # fp append AFTER the match scan (the combined plan reads the
        # pre-append table; appending first would double-count on re-read)
        batch_fp.write.mode("overwrite").parquet(f"{fp_path}/batch={batch_id}")

    writer = fp_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if byte_exact:
        # the upstream applyInPandasWithState operator declares update mode;
        # the query must match (foreachBatch semantics are unchanged)
        writer = writer.outputMode("update")
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

    FROZEN KEY RULE for shingle-less rows: a caption with no shingles
    (empty / too short / stop-only) gets the kernel's constant empty-input
    simhash — keying the state on it would glue EVERY such row into one
    dedup group and permanently suppress distinct novel content (the same
    giant-fake-bucket hazard the candidate index guards against by
    excluding n_shingles == 0 rows from band keys). The state key is
    therefore the simhash for shingled rows and xxhash64('raw:', caption)
    for shingle-less rows (so identical raw captions still dedup; NULL
    captions share one key); the EMITTED simhash stays the kernel value.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    fpx = with_fingerprints(
        stream_df.select("image_id", "caption"), cfg, emit_minhash=False
    )
    fp = fpx.select(
        "image_id",
        "simhash",
        F.when(F.col("n_shingles") > 0, F.col("simhash"))
        .otherwise(F.xxhash64(F.lit("raw:"), F.col("caption")))
        .alias("_k"),
    )

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

    return fp.groupBy("_k").applyInPandasWithState(
        first_seen,
        outputStructType="image_id string, simhash long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_byte_first_seen(
    stream_df: DataFrame, passthrough: list[str] | None = None
) -> DataFrame:
    """Cross-batch streaming BYTE-EXACT dedup — the incremental form of the
    batch byte tier (run_pipeline's ``byte_exact`` stage 00b) and the path
    run_delta's add-only guard points at when it refuses a demoting
    increment: the batch min-id keeper rule is not add-only (a later row
    can demote an earlier keeper), but FIRST-SEEN keepers are — each
    distinct payload digest is admitted ONCE, at its
    first arrival across the stream's lifetime, and every later re-upload
    of the same bytes is suppressed. Per-digest state survives restarts via
    the query checkpoint. Within the first batch that sees a digest, the
    canonical emitted row is the minimum image_id (the frozen
    representative rule).

    FROZEN absent-content rule (shared with the batch tier): NULL-bytes
    rows never group — each gets a unique state key (``null:<image_id>``)
    so it always passes; keying them on the digest would glue every
    absent-content row into one group and permanently suppress novel rows
    (the same giant-fake-bucket hazard the other streaming keys guard
    against). Output: (image_id, digest[, *passthrough]) with digest NULL
    for byte-less rows; ``passthrough`` columns ride along on admitted rows
    so downstream stages (fingerprinting needs caption+phash) compose
    without a re-join against the source. The md5 reduces the payload
    inside the projection — bytes never enter the state store or a shuffle.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    extra = list(passthrough or [])
    hashed = stream_df.select(
        "image_id",
        F.md5("bytes").alias("digest"),
        *extra,
    ).withColumn(
        "_k", F.coalesce(F.col("digest"), F.concat(F.lit("null:"), F.col("image_id")))
    )
    in_schema = stream_df.schema
    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("digest", T.StringType()),
        ]
        + [in_schema[c] for c in extra]
    )

    def first_seen(key, pdf_iter, state: GroupState):
        seen_before = state.exists and state.get[0] > 0
        total = state.get[0] if state.exists else 0
        first: pd.DataFrame | None = None
        for pdf in pdf_iter:
            total += len(pdf)
            if seen_before or not len(pdf):
                continue
            idx = pdf["image_id"].idxmin()
            cand = pdf.loc[[idx], ["image_id", "digest"] + extra]
            if first is None or cand["image_id"].iloc[0] < first["image_id"].iloc[0]:
                first = cand
        state.update((total,))
        if first is not None:
            yield first

    return hashed.groupBy("_k").applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
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
    fpx = with_fingerprints(slim, cfg, emit_minhash=False)
    # same frozen shingle-less key rule as stream_first_seen: zero-shingle
    # rows carry the constant empty-input simhash and would otherwise be
    # reported as ONE fake viral burst per window; key them by their raw
    # caption hash instead (identical blanks still count as a burst). The
    # emitted simhash stays the kernel value (constant within each group:
    # shingled groups key ON it; shingle-less groups all hold the constant).
    fp = fpx.select(
        "image_id",
        "_ts",
        "simhash",
        F.when(F.col("n_shingles") > 0, F.col("simhash"))
        .otherwise(F.xxhash64(F.lit("raw:"), F.col("caption")))
        .alias("_k"),
    )
    return (
        fp.withWatermark("_ts", watermark_delay)
        .groupBy(F.window("_ts", window_duration).alias("w"), "_k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("image_id").alias("min_image_id"),
            F.min("simhash").alias("simhash"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "simhash",
            "n_rows",
            "min_image_id",
        )
    )


def stream_curation_gate(
    stream_df: DataFrame,
    text_col: str = "text",
    quality: bool = True,
    pii: bool = True,
    quality_overrides: dict | None = None,
    bloom_benchmark: DataFrame | None = None,
    bloom_n: int = 5,
    bloom_min_overlap: int = 1,
) -> DataFrame:
    """Streaming face of the curation door (run_curation stages 1-2, plus an
    optional Bloom decontamination drop): Gopher-style quality keep/drop,
    then PII scrub, then — when ``bloom_benchmark`` (a STATIC benchmark
    DataFrame) is given — drop any row whose SCRUBBED text shares >=
    ``bloom_min_overlap`` word-n-grams with the benchmark per the frozen
    Bloom rules (functions/bloom.py; one-sided, so contaminated rows can
    never slip through — the fp rate drops a ~5.6e-4 sliver of clean grams).
    Per-record IDENTICAL to the batch operators because it IS the batch
    operators: all three are zero-shuffle/zero-exchange projections, so they
    compose with a readStream source unchanged (no state, no watermark; the
    filter is built ONCE at stream setup via build_benchmark_bloom, never
    per micro-batch). Dropped rows never leave the gate; surviving rows
    carry the scrubbed text in ``text_col`` plus the ``n_email``/``n_ipv4``/
    ``n_phone`` audit counts, exactly the schema the batch CLI ships.
    Differential-tested vs the batch composition (tests/test_streaming.py)."""
    from simhash_spark.operators.curation import build_benchmark_bloom, pii_scrub
    from simhash_spark.operators.textops import quality_filter

    out = stream_df
    if quality:
        out = (
            quality_filter(out, text_col, **(quality_overrides or {}))
            .where(F.col("keep") == 1)
            .drop("keep", "reason")
        )
    if pii:
        out = (
            pii_scrub(out, text_col)
            .drop(text_col)
            .withColumnRenamed("clean_text", text_col)
        )
    if bloom_benchmark is not None:
        from simhash_spark.functions.bloom import make_bloom_overlap_udf

        words, m_bits = build_benchmark_bloom(bloom_benchmark, text_col, bloom_n)
        ov = make_bloom_overlap_udf(words, m_bits, 8, bloom_n)
        out = (
            out.withColumn("_bl", ov(F.col(text_col)))
            .where(F.col("_bl.n_maybe_overlap") < F.lit(bloom_min_overlap))
            .drop("_bl")
        )
    return out


def start_curated_ingest(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    quality: bool = True,
    pii: bool = True,
    quality_overrides: dict | None = None,
    trigger_once: bool = True,
    bloom_benchmark: DataFrame | None = None,
    bloom_n: int = 5,
    bloom_min_overlap: int = 1,
):
    """writeStream for the curation gate: each micro-batch's surviving
    scrubbed rows land in a per-batch subdirectory with mode=overwrite —
    the same replay-safe exactly-once-OUTPUT discipline as
    start_stream_near_dup (an at-least-once foreachBatch redelivery
    overwrites its own directory instead of duplicating rows)."""
    gated = stream_curation_gate(
        stream_df,
        text_col,
        quality=quality,
        pii=pii,
        quality_overrides=quality_overrides,
        bloom_benchmark=bloom_benchmark,
        bloom_n=bloom_n,
        bloom_min_overlap=bloom_min_overlap,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/batch={batch_id}")

    writer = gated.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming gap sessionization — the micro-batch face of the batch
    ``sessionize`` operator, via Spark's NATIVE session windows (state-store
    backed, merging across micro-batches) rather than a hand-rolled
    stateful UDF.

    FROZEN-RULE parity with batch sessionize: that operator splits when the
    floor-second gap STRICTLY EXCEEDS ``gap_s``. Spark's session_window
    merges windows whose start touches the previous window's end
    INCLUSIVELY (verified by the boundary test: gap == gapDuration merges),
    i.e. it also splits iff gap > gapDuration — so feeding floor-second
    timestamps with gapDuration = gap_s reproduces the frozen rule exactly,
    and the emitted (user, n_events, start_s, end_s,
    duration_s) rows equal the batch operator's on the same events —
    differential-tested in tests/test_streaming.py. The batch output's
    ``session_idx`` (a per-user ordinal over ALL sessions) is inherently a
    batch notion and is not emitted here; assign it downstream if needed.

    Append-mode semantics: a session row emits once the event-time
    watermark (``watermark_delay`` behind max event time) passes its close;
    state is bounded by the watermark. Sessions still open when a bounded
    test stream drains stay in state — flush with a sentinel event past the
    delay (standard Structured Streaming practice).
    """
    sec = F.col(ts_col).cast("timestamp_ltz").cast("long")
    ev = stream_df.select(
        F.col(user_col),
        F.timestamp_seconds(sec).alias("_ts"),
        sec.alias("_sec"),
    )
    return (
        ev.withWatermark("_ts", watermark_delay)
        .groupBy(
            F.session_window("_ts", f"{int(gap_s)} seconds").alias("_w"),
            user_col,
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_sec").alias("start_s"),
            F.max("_sec").alias("end_s"),
        )
        .select(
            user_col,
            "n_events",
            "start_s",
            "end_s",
            (F.col("end_s") - F.col("start_s")).alias("duration_s"),
        )
    )


def start_stream_semantic_dedup(
    stream_df: DataFrame,
    centroids,
    accepted_path: str,
    decisions_path: str,
    checkpoint_path: str,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_once: bool = True,
):
    """SEMANTIC dedup on ingest — the streaming face of the embedding axis
    (the online/greedy variant of SemDeDup, operators/dedup.py::
    semdedup_keep). Per micro-batch:

    1. assign each arriving vector its k-means cell + centroid cosine (the
       same one-matmul-per-Arrow-batch UDF the batch operator uses;
       centroids ride in the closure, fit offline by ivf_fit),
    2. read the ACCEPTED-state rows of the touched cells only (semi-join on
       cell) and decide each batch row inside one per-cell group kernel,
    3. write the batch's decisions, THEN append its accepted rows to the
       state table (the near-dup module's ordering: state append last, so a
       replay's read never sees its own output).

    FROZEN decision rule: batch rows are decided in ascending id order; a
    row is ACCEPTED iff its cosine to EVERY already-accepted row of its
    cell — prior batches' and earlier-id accepted rows of this batch — is
    < tau. Arrival-order-greedy is the only causal keep rule online; the
    resulting accepted set carries the SAME pairwise guarantee as the batch
    operator's keeper set (no two accepted rows of a cell within tau —
    batch keepers of distinct groups are < tau apart by CC maximality), but
    WHICH member of a duplicate group survives differs: first-arrival here,
    lowest-centroid-cosine in batch. Differential-tested against an
    independent python mirror of the greedy rule, plus the pairwise-< tau
    invariant, across multiple micro-batches (tests/test_streaming.py).

    Replay safety: decisions and state are per-batch subdirectories with
    mode=overwrite, and the state read excludes the batch's OWN directory —
    the module's byte-idempotent at-least-once discipline. Per-batch cost:
    one cell-keyed exchange of (batch + touched-cell state) rows; the
    accumulated table is scanned, filtered to touched cells, never shuffled
    wholesale. At 10^12-row scale state lives in an Iceberg table
    partitioned by cell, so the touched-cell read is partition pruning.
    """
    import pathlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from simhash_spark.operators.ann import make_ivf_assign_sim_udf
    from simhash_spark.operators.dedup import _GRAM_BLOCK_ELEMS, _unit_rows

    assign = make_ivf_assign_sim_udf(centroids)
    vstream = (
        stream_df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .withColumn("_a", assign(F.col("vec")))
        .select("id", "vec", F.col("_a.list_id").alias("cell"))
    )
    thr = float(tau)
    out_schema = T.StructType(
        [
            T.StructField("id", stream_df.schema[id_col].dataType),  # id-generic
            T.StructField("cell", T.IntegerType()),
            T.StructField("is_kept", T.IntegerType()),
        ]
    )

    def cell_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        new = pdf[pdf["_new"] == 1].sort_values("id", kind="stable")
        old = pdf[pdf["_new"] == 0]
        ids = new["id"].to_numpy()  # int64 for long ids, object for strings
        n_new = len(ids)
        if not n_new:
            return pd.DataFrame(
                {
                    "id": ids,
                    "cell": np.zeros(0, np.int32),
                    "is_kept": np.zeros(0, np.int32),
                }
            )
        nm = _unit_rows(new["vec"].to_numpy())
        # gram passes are ROW-BLOCKED at the shared 256 MB element budget
        # (same defense as the batch kernel: a hot cell or a large
        # availableNow backlog must bound compute memory, not trust m^2)
        old_hit = np.zeros(n_new, bool)
        if len(old):
            om = _unit_rows(old["vec"].to_numpy())
            blk = max(1, min(4096, _GRAM_BLOCK_ELEMS // max(len(om), 1)))
            for s in range(0, n_new, blk):
                old_hit[s : s + blk] = (nm[s : s + blk] @ om.T >= thr).any(axis=1)
        kept_idx: list[int] = []
        keep = np.zeros(n_new, np.int32)
        blk2 = max(1, min(4096, _GRAM_BLOCK_ELEMS // n_new))
        for s in range(0, n_new, blk2):
            g = nm[s : s + blk2] @ nm.T
            for r in range(g.shape[0]):
                i = s + r
                if old_hit[i]:
                    continue
                row = g[r]
                if any(row[j] >= thr for j in kept_idx):
                    continue
                keep[i] = 1
                kept_idx.append(i)
        return pd.DataFrame(
            {
                "id": ids,
                "cell": new["cell"].to_numpy(np.int32),
                "is_kept": keep,
            }
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # pin: used 3 ways
        base = pathlib.Path(accepted_path)
        # crash-replay rule: exclude this batch's OWN state directory
        sibling_dirs = [
            str(p)
            for p in sorted(base.glob("batch=*"))
            if p.name != f"batch={batch_id}" and any(p.glob("*.parquet"))
        ] if base.exists() else []
        if sibling_dirs:
            state = (
                spark.read.option("recursiveFileLookup", "true")
                .parquet(*sibling_dirs)
                .select("id", "vec", "cell")
                .join(batch_df.select("cell").distinct(), "cell", "left_semi")
                .withColumn("_new", F.lit(0))
            )
            union = state.unionByName(batch_df.withColumn("_new", F.lit(1)))
        else:
            union = batch_df.withColumn("_new", F.lit(1))
        decisions = union.groupBy("cell").applyInPandas(cell_kernel, out_schema)
        decisions.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{decisions_path}/batch={batch_id}")
        # state append AFTER the decision write (replay reads pre-append)
        accepted = batch_df.join(
            spark.read.parquet(f"{decisions_path}/batch={batch_id}")
            .where("is_kept = 1")
            .select("id"),
            "id",
            "left_semi",
        )
        accepted.select("id", "vec", "cell").write.mode("overwrite").parquet(
            f"{accepted_path}/batch={batch_id}"
        )

    writer = vstream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
