"""Multimodal (image/audio/video) column handling for a training-data
pipeline: opaque binary payloads + typed metadata, processed by Arrow-batched
``mapInPandas`` — decode, feature-extract, resize, perceptual-hash,
frame-sample.

What is REAL here (tested end-to-end): the Spark plumbing — schemas, batch
iteration, column pruning (metadata-only plans never read ``bytes``),
partition-sized batches — plus a genuine numpy decoder for uncompressed
binary PPM (P6), the format the synthetic fixtures use, and real block-mean
resize / average-hash feature extraction on the decoded pixels.

What is STUBBED (no codec libraries in this container — no Pillow/opencv/
ffmpeg): decoding of compressed formats (png/jpeg/...) raises
``NotImplementedError`` per row into an ``error`` column (never crashing the
job — a 100 TB run must quarantine bad rows, not die on row 10^11), and
video frame-sampling computes deterministic frame OFFSETS without decoding.
Swap ``decode_rgb`` for a real codec call in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simhash_spark import spec

SUPPORTED_FMTS = ("ppm",)


def decode_rgb(data: bytes, fmt: str) -> np.ndarray:
    """binary -> (h, w, 3) uint8. Real for PPM P6; NotImplementedError
    otherwise (clearly-marked stub — container has no image codecs)."""
    if fmt != "ppm":
        raise NotImplementedError(f"no codec for format {fmt!r} in this container")
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster
    parts = data[:64].split(maxsplit=4)
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    header_len = len(b" ".join(parts[:4])) + 1
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=header_len)
    return px.reshape(h, w, 3)


def block_mean_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style resize by block averaging (pure numpy): index-map each
    output cell to an input region and mean-pool. Deterministic.

    DOWNSAMPLE ONLY: an input smaller than the output grid would leave
    empty cells (area 0 -> NaN -> undefined uint8 cast — platform-dependent
    garbage, measured). Raise instead; the mapInPandas operators catch
    ValueError per row into their ``error`` quarantine column."""
    h, w, c = px.shape
    if h < out_h or w < out_w:
        raise ValueError(f"image {h}x{w} smaller than output grid {out_h}x{out_w}")
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    acc = px.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
    acc = np.pad(acc, ((1, 0), (1, 0), (0, 0)))
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    out = (
        acc[ys[1:], :, :][:, xs[1:], :]
        - acc[ys[:-1], :, :][:, xs[1:], :]
        - acc[ys[1:], :, :][:, xs[:-1], :]
        + acc[ys[:-1], :, :][:, xs[:-1], :]
    ) / area[:, :, None]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def ahash64(px: np.ndarray) -> np.uint64:
    """8x8 average-hash of an (h, w, 3) uint8 image: grayscale block-mean
    downsample to 8x8, bit i = cell > global mean. The fixture's stored
    perceptual hash is exactly this function."""
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    cells = gray[: h - h % 8, : w - w % 8].reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (cells > cells.mean()).ravel()
    return spec.pack_bits_u64(np.concatenate([bits, np.zeros(64 - bits.size, bool)]))


def image_embedding_of(px: np.ndarray, grid: int = 4) -> np.ndarray:
    """Deterministic pixel embedding: (h, w, 3) uint8 -> (grid*grid*3,)
    float64, the centered + L2-normalized block-mean thumbnail.

    This is the engine's stand-in for a learned image encoder (SemDeDup on
    LAION uses CLIP image embeddings, Abbas'23 §3) with the same contract —
    a fixed-dim vector whose cosine is high exactly for visually-similar
    pixels — computable in this container (no model weights, no codecs).
    Centering is load-bearing: raw pixel vectors are all-positive, so ANY
    two images have cosine near 1 and no threshold separates dups from
    non-dups; after removing the per-image mean, independent images land
    near cosine 0 while re-renders of the same content stay near 1.

    The block-mean goes through the uint8 thumbnail (block_mean_resize), so
    the float math starts from integers — bit-identical between the engine
    kernel and the pure-numpy oracle by construction. All-flat images (zero
    variance) return the zero vector: cosine 0 against everything, never
    groups — the frozen degenerate-content rule.
    """
    v = block_mean_resize(px, grid, grid).astype(np.float64).ravel()
    v -= v.mean()
    n = float(np.linalg.norm(v))
    return v / n if n > 1e-9 else np.zeros_like(v)


IMAGE_EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("error", T.StringType()),
    ]
)


def image_embeddings(src: DataFrame, grid: int = 4) -> DataFrame:
    """bytes -> fixed-dim pixel embeddings in one ``mapInPandas`` pass
    (decode + image_embedding_of per payload; per-row quarantine into
    ``error`` like image_features — quarantined rows carry a NULL embedding
    and downstream semantic stages let them pass, the absent-content rule).

    Input pruned to exactly (image_id, bytes, fmt) at the scan; the
    embedding (grid*grid*3 float64, 384 bytes at grid=4) is what shuffles
    downstream — never the payload bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            embs: list[list[float] | None] = [None] * n
            errs: list[str | None] = [None] * n
            for i, (data, fmt) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
                try:
                    if data is None:
                        raise ValueError("null bytes")
                    px = decode_rgb(bytes(data), fmt)
                    embs[i] = image_embedding_of(px, grid).tolist()
                except (NotImplementedError, ValueError) as e:
                    errs[i] = f"{type(e).__name__}: {e}"
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "embedding": embs,
                    "error": errs,
                }
            )

    slim = src.select("image_id", "bytes", "fmt")
    return slim.mapInPandas(run, IMAGE_EMBEDDING_SCHEMA)


# ------------------------------------------- caption-pixel alignment filter

# FROZEN palette: color word -> RGB anchor direction. The cross-modal shared
# space of the container's deterministic encoder stand-ins (a production run
# swaps both sides for one learned joint encoder, e.g. CLIP — the operator's
# plan shape is encoder-agnostic). Deliberately no white/black/gray: they are
# directionally ambiguous with every tint (white ~ the all-ones direction is
# within cosine ~0.91 of any saturated secondary color, measured — it would
# collapse the matched/mismatched margin the filter thresholds on).
ALIGNMENT_PALETTE: list[tuple[str, tuple[int, int, int]]] = [
    ("red", (255, 0, 0)),
    ("green", (0, 255, 0)),
    ("blue", (0, 0, 255)),
    ("yellow", (255, 255, 0)),
    ("cyan", (0, 255, 255)),
    ("magenta", (255, 0, 255)),
]

ALIGNMENT_SUMS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("sr", T.LongType()),
        T.StructField("sg", T.LongType()),
        T.StructField("sb", T.LongType()),
        T.StructField("cr", T.LongType()),
        T.StructField("cg", T.LongType()),
        T.StructField("cb", T.LongType()),
        T.StructField("n_color", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def caption_pixel_alignment(src: DataFrame, tau_bp: int = 8500) -> DataFrame:
    """DataComp/LAION-style image-caption ALIGNMENT filter (the "CLIP-score
    filter", Gadre'23 §3.2 / Schuhmann'22 §2.3): score how well the caption
    matches the pixels and drop pairs below a cosine threshold — the
    curation axis the geometry/caption-shape rules (image_quality_filter)
    cannot see, because a perfectly-formed caption on the WRONG image passes
    every per-modality rule.

    Container stand-in encoders (deterministic, no model weights — the plan
    shape is the real contract): pixel side = the image's summed RGB channel
    vector (sr, sg, sb) — INTEGER sums, and cosine is scale-invariant so the
    pixel count divides out; caption side = the summed RGB anchors of frozen
    palette color words (ALIGNMENT_PALETTE) counted by whitespace-token
    equality over the lowercased caption (the engine's standing tokenizer
    rule; integer counts x integer anchors = integer vector). Both sides are
    integers out of their kernels; the ONLY float math is the final frozen
    cosine, evaluated in one codegen'd projection:

        align_bp = floor(10000.0 * (sr*cr + sg*cg + sb*cb)
                         / (sqrt(sr^2+sg^2+sb^2) * sqrt(cr^2+cg^2+cb^2)))

    FROZEN decision rules (first match wins), with the engine-wide
    absent-content rule — a missing SIGNAL never drops a row, only a
    contradicting one does:
      1. no_pixel_signal   — null bytes, decode quarantine, or an all-zero
                             pixel sum (no direction) -> keep=1, align_bp NULL
      2. no_caption_signal — zero palette tokens in the caption -> keep=1,
                             align_bp NULL
      3. misaligned        — align_bp < tau_bp -> keep=0
      4. ok                -> keep=1

    Scale shape: caption counts are a native projection (no caption text
    ever enters Python — only its four integer accumulators ride through the
    decode pass as mapInPandas passthrough columns); the decode UDF ships
    (image_id, bytes, fmt) and emits nine scalars; the verdict is one more
    native projection. ZERO exchanges end-to-end (plan-asserted in tests) —
    at 10^12 rows this pipelines inside the scan like the quality filter,
    and like the semantic tier it belongs AFTER dedup in the funnel so the
    per-payload decode pays only for survivors.

    Output: (image_id, align_bp int|NULL, n_color int, keep int, reason).
    """
    # ALL SIX color counters in ONE interpreted-HOF pass (the measured
    # engine lesson: every HOF re-evaluates its captured children, so six
    # separate filter() calls would re-run the split chain six times per
    # row; one aggregate whose lambda touches only its (acc, element) args
    # runs it once). Counts bit-pack at 10 bits/color into one int64
    # accumulator — the slice to 1023 tokens bounds each count below 2^10
    # by construction (captions are sentence-scale; a 1k-token caption is
    # already past every quality gate).
    tokens = F.slice(
        F.split(F.lower(F.coalesce(F.col("caption"), F.lit(""))), r"\s+"), 1, 1023
    )

    def _weight(t):
        w = F.lit(0).cast("long")
        for i, (name, _) in enumerate(ALIGNMENT_PALETTE):
            w = F.when(t == name, F.lit(1 << (10 * i)).cast("long")).otherwise(w)
        return w

    packed = F.aggregate(tokens, F.lit(0).cast("long"), lambda a, t: a + _weight(t))
    cnt = [
        F.shiftrightunsigned(packed, 10 * i).bitwiseAND(F.lit(1023)).cast("long")
        for i in range(len(ALIGNMENT_PALETTE))
    ]
    # integer caption vector: sum over palette of count * anchor (per channel)
    chan = [F.lit(0).cast("long")] * 3
    n_color = F.lit(0).cast("long")
    for i, (_, rgb) in enumerate(ALIGNMENT_PALETTE):
        n_color = n_color + cnt[i]
        chan = [chan[k] + cnt[i] * F.lit(rgb[k]) for k in range(3)]
    slim = src.select(
        "image_id",
        "bytes",
        "fmt",
        chan[0].alias("cr"),
        chan[1].alias("cg"),
        chan[2].alias("cb"),
        n_color.cast("int").alias("n_color"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            sums = np.zeros((n, 3), np.int64)
            errs: list[str | None] = [None] * n
            for i, (data, fmt) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
                try:
                    if data is None:
                        raise ValueError("null bytes")
                    px = decode_rgb(bytes(data), fmt)  # the per-payload codec call
                    # integer channel sums — exact, order-independent, and the
                    # pixel count cancels inside the (scale-invariant) cosine
                    sums[i] = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                except (NotImplementedError, ValueError) as e:
                    errs[i] = f"{type(e).__name__}: {e}"
                    sums[i] = 0
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "sr": sums[:, 0],
                    "sg": sums[:, 1],
                    "sb": sums[:, 2],
                    "cr": pdf["cr"].to_numpy(),
                    "cg": pdf["cg"].to_numpy(),
                    "cb": pdf["cb"].to_numpy(),
                    "n_color": pdf["n_color"].to_numpy(),
                    "error": errs,
                }
            )

    sums = slim.mapInPandas(run, ALIGNMENT_SUMS_SCHEMA)

    d = lambda c: F.col(c).cast("double")  # noqa: E731 — int64 sums < 2^53, exact
    dot = d("sr") * d("cr") + d("sg") * d("cg") + d("sb") * d("cb")
    np_ = F.sqrt(d("sr") * d("sr") + d("sg") * d("sg") + d("sb") * d("sb"))
    nc_ = F.sqrt(d("cr") * d("cr") + d("cg") * d("cg") + d("cb") * d("cb"))
    no_pixel = F.col("error").isNotNull() | (
        (F.col("sr") == 0) & (F.col("sg") == 0) & (F.col("sb") == 0)
    )
    no_caption = F.col("n_color") == 0
    align_bp = F.when(
        no_pixel | no_caption, F.lit(None).cast("int")
    ).otherwise(F.floor(F.lit(10000.0) * dot / (np_ * nc_)).cast("int"))
    reason = (
        F.when(no_pixel, F.lit("no_pixel_signal"))
        .when(no_caption, F.lit("no_caption_signal"))
        .when(align_bp < F.lit(int(tau_bp)), F.lit("misaligned"))
        .otherwise(F.lit("ok"))
    )
    return sums.select(
        "image_id",
        align_bp.alias("align_bp"),
        "n_color",
        (reason != "misaligned").cast("int").alias("keep"),
        reason.alias("reason"),
    )


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("phash_computed", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("thumb_bytes", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)


def image_features(src: DataFrame, thumb: int = 8) -> DataFrame:
    """Decode + feature-extract + resize in one mapInPandas pass.

    Per-row failures land in ``error`` (quarantine semantics); the thumbnail
    is raw RGB bytes of a (thumb x thumb) block-mean resize. Input columns
    pruned to exactly (image_id, bytes, fmt) at the scan.
    """

    # Per-row-Python exemption (BASELINE.json:15): the decode step is one
    # opaque codec call per payload — there is nothing to vectorize across
    # rows (a production codec library is itself the inner loop). Everything
    # AROUND the decode is columnar: outputs are preallocated numpy arrays
    # and the frame is assembled column-wise, and the per-image math (means,
    # resize, ahash) is whole-image numpy, not per-pixel Python.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            w = np.zeros(n, np.int32)
            h = np.zeros(n, np.int32)
            ph = np.zeros(n, np.int64)
            means = np.zeros((n, 3), np.float64)
            thumbs: list[bytes] = [b""] * n
            errs: list[str | None] = [None] * n
            for i, (data, fmt) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
                try:
                    if data is None:
                        raise ValueError("null bytes")
                    px = decode_rgb(bytes(data), fmt)  # the per-payload codec call
                    h[i], w[i] = px.shape[0], px.shape[1]
                    means[i] = px.reshape(-1, 3).mean(axis=0)
                    ph[i] = spec.u64_to_i64(np.array([ahash64(px)]))[0]
                    thumbs[i] = block_mean_resize(px, thumb, thumb).tobytes()
                except (NotImplementedError, ValueError) as e:
                    errs[i] = f"{type(e).__name__}: {e}"
                    # quarantined rows carry ONLY defaults — a failure after
                    # partial assignment must not leak half-computed fields
                    w[i] = h[i] = 0
                    ph[i] = 0
                    means[i] = 0.0
                    thumbs[i] = b""
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "w": w,
                    "h": h,
                    "fmt": pdf["fmt"].to_numpy(),
                    "phash_computed": ph,
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "thumb_bytes": thumbs,
                    "error": errs,
                }
            )

    slim = src.select("image_id", "bytes", "fmt")
    return slim.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


# -------------------------------------------------------------- audio

SUPPORTED_AUDIO_FMTS = ("wav",)


def decode_pcm_wav(data: bytes) -> tuple[np.ndarray, int]:
    """binary -> ((n_samples, n_channels) float64 in [-1, 1], sample_rate).

    Real decoder for RIFF/WAVE PCM16 (an uncompressed container — pure
    numpy header parse + frombuffer, the audio analogue of the PPM path);
    ``NotImplementedError`` for compressed codecs (mp3/aac/flac — no codec
    libs in this container; quarantined per row by audio_features).
    """
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload (compressed codec?)")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    # header sanity — a corrupt/hostile header must quarantine, not wrap
    # int32 feature columns or emit absurd durations
    if not (1 <= sample_rate <= 1_000_000):
        raise ValueError(f"implausible sample rate {sample_rate}")
    if not (1 <= n_channels <= 64):
        raise ValueError(f"implausible channel count {n_channels}")
    pcm = np.frombuffer(raw, dtype="<i2")
    pcm = pcm[: len(pcm) - len(pcm) % n_channels].reshape(-1, n_channels)
    if pcm.shape[0] == 0:
        raise ValueError("empty audio payload")
    return pcm.astype(np.float64) / 32768.0, sample_rate


def encode_pcm_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) float64 [-1,1] -> PCM16 WAV bytes (fixture writer)."""
    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2")
    n_ch = pcm.shape[1] if pcm.ndim == 2 else 1
    raw = pcm.tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(raw).to_bytes(4, "little") + raw
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def audio_clip_features(data, fmt: str) -> tuple[int, int, int, int, int, int]:
    """One clip -> (sample_rate, n_channels, n_samples, duration_ms,
    rms_milli, zero_cross_per_sec); raises NotImplementedError/ValueError for
    quarantine. Shared by the audio_features operator AND the expected-output
    generator (tests/gen_expected.py) so the two cannot drift."""
    if data is None:
        raise ValueError("null bytes")
    if fmt not in SUPPORTED_AUDIO_FMTS:
        raise NotImplementedError(f"no codec for format {fmt!r}")
    pcm, rate = decode_pcm_wav(bytes(data))
    mono = pcm.mean(axis=1)
    n_samples = pcm.shape[0]
    duration_ms = n_samples * 1000 // rate
    if duration_ms > 2**31 - 1 or n_samples > 2**31 - 1:
        raise ValueError("implausible clip length")
    rms_milli = int(round(float(np.sqrt(np.mean(mono**2))) * 1000))
    crossings = int(np.count_nonzero(np.diff(np.signbit(mono))))
    zero_cross_per_sec = int(round(crossings * rate / n_samples))
    return (rate, pcm.shape[1], n_samples, int(duration_ms), rms_milli, zero_cross_per_sec)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms_milli", T.IntegerType()),
        T.StructField("zero_cross_per_sec", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def audio_features(src: DataFrame) -> DataFrame:
    """Decode + feature-extract audio payloads in one mapInPandas pass:
    duration, RMS level (integer millis — the engine's bit-stable oracle
    convention), zero-crossing rate. Per-row failures quarantine into
    ``error``; input pruned to (audio_id, bytes, fmt) at the scan.

    Same per-row-decode exemption as image_features: the codec call is the
    only per-row Python; everything around it is preallocated columnar
    numpy, and the per-clip math is whole-array numpy.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            sr = np.zeros(n, np.int32)
            ch = np.zeros(n, np.int32)
            ns = np.zeros(n, np.int32)
            dur = np.zeros(n, np.int32)
            rms = np.zeros(n, np.int32)
            zc = np.zeros(n, np.int32)
            errs: list[str | None] = [None] * n
            for i, (data, fmt) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
                try:
                    sr[i], ch[i], ns[i], dur[i], rms[i], zc[i] = audio_clip_features(
                        data, fmt
                    )
                except (NotImplementedError, ValueError, OverflowError) as e:
                    errs[i] = f"{type(e).__name__}: {e}"
                    sr[i] = ch[i] = ns[i] = dur[i] = rms[i] = zc[i] = 0
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"].to_numpy(),
                    "sample_rate": sr,
                    "n_channels": ch,
                    "n_samples": ns,
                    "duration_ms": dur,
                    "rms_milli": rms,
                    "zero_cross_per_sec": zc,
                    "error": errs,
                }
            )

    slim = src.select("audio_id", "bytes", "fmt")
    return slim.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


# ------------------------------------------------------------ video stub

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
    ]
)


def sample_frame_offsets(videos: DataFrame, fps: float = 1.0) -> DataFrame:
    """Deterministic frame-sampling plan for (video_id, duration_ms) rows:
    one output row per sampled frame at ``fps``. The DECODE of each frame is
    the stubbed step (no ffmpeg here); the exploded row-per-frame shape is
    the real Spark plumbing a video pipeline fans out on."""
    n = F.greatest(F.lit(1), F.floor(F.col("duration_ms") * F.lit(fps) / 1000.0)).cast("int")
    return videos.select(
        "video_id",
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("frame_idx", "_i"),
    ).select(
        "video_id",
        "frame_idx",
        (F.col("frame_idx") * F.lit(int(1000 / fps))).cast("int").alias("ts_ms"),
    )
