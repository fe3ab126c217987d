"""Reverse image search: query-by-perceptual-hash over the pigeonhole index.

The dedup pipeline already maintains block-combination keys over the stored
64-bit pHash (SURVEY.md §2.1 O10); this operator reuses that exact index for
the other direction — given a small set of probe images, return every corpus
image within Hamming radius r of a probe (the "find all copies of THIS
image" / takedown / provenance shape, Manku'07 §3 applied to pixels).

Exact by construction: with keys over combinations of (n_blocks - radius)
blocks, any pair at Hamming <= radius agrees on at least one whole
combination (pigeonhole), so bucket collision has recall 1.0 and the native
popcount filter makes precision 1.0 — the result IS the Hamming ball, which
is why the driver oracle can be an independent numpy brute force rather than
a recall bound.

Scale shape (10^12 corpus, bounded probe set): the corpus is scanned ONCE,
keys are built in whole-stage codegen (functions/native.py), the probe key
table is broadcast, and the only exchange is the pair dedup — which carries
(probe_id, image_id, dist), 3 scalar columns, post-filter. The corpus-side
phash rides the explode (8 bytes/row) instead of being re-joined after the
dedup: the no-vectors-through-exchange rule exists for ~KB embedding
payloads; for one int64 a second corpus scan+shuffle would cost more than
it saves.

Index-width cost model (measured, BENCH/INDEX_SCALING.md): candidate volume
here is (probe keys) x (avg bucket size) — NOT the dedup index's
C(bucket, 2) — so with a bounded probe set the random-collision term stays
linear in corpus size and the NARROW 4-block config's 14x smaller key
volume wins until ~10^9-10^10 corpus rows at 1k probes (800k-row
measurement: 4 blocks 2.0 s vs 8 blocks 13.5 s, identical exact result).
``n_blocks`` is therefore a caller parameter, deliberately not tied to
config.index_config_for's all-pairs thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_spark.functions.native import hamming, pigeonhole_key_cols


def phash_search(
    corpus: DataFrame,
    probes: DataFrame,
    radius: int = 3,
    n_blocks: int = 4,
    id_col: str = "image_id",
    probe_id_col: str = "probe_id",
    hash_col: str = "phash",
) -> DataFrame:
    """All (probe, corpus image) pairs with hamming(phash) <= radius.

    ``probes`` needs (probe_id_col, hash_col); ``corpus`` (id_col, hash_col).
    A probe that is itself in the corpus matches itself at dist 0 — correct
    for provenance queries; filter ``probe_id != image_id`` downstream if
    self-hits are unwanted. Null hashes are dropped on both sides (a null
    key can never witness a Hamming bound; and per the engine-wide xxhash64
    lesson, null-derived keys must never enter a join).
    """
    if n_blocks <= radius:
        raise ValueError("pigeonhole needs n_blocks > radius")
    keys = F.array(*pigeonhole_key_cols(hash_col, n_blocks, radius))
    c = (
        corpus.where(F.col(hash_col).isNotNull())
        .select(
            F.col(id_col).alias("image_id"),
            F.col(hash_col).alias("_cph"),
            F.explode(keys).alias("_k"),
        )
    )
    p = (
        probes.where(F.col(hash_col).isNotNull())
        .select(
            F.col(probe_id_col).alias("probe_id"),
            F.col(hash_col).alias("_pph"),
            F.explode(keys).alias("_k"),
        )
    )
    return (
        c.join(F.broadcast(p), "_k")
        .withColumn("dist", hamming(F.col("_cph"), F.col("_pph")).cast("int"))
        .where(F.col("dist") <= F.lit(int(radius)))
        .dropDuplicates(["probe_id", "image_id"])
        .select("probe_id", "image_id", "dist")
    )


# ------------------------------------------------- image curation filter

# frozen rule order (first violated rule wins), the DataComp/LAION-style
# image+caption keep/drop decision (Gadre'23 §3.2, Schuhmann'22 §2.2):
# geometry rules first (cheapest, prune before any caption work in a real
# scan), then caption-shape rules. Appending a rule is sanctioned; changing
# order or thresholds of existing rules is a breaking change to the oracle.
IMAGE_QUALITY_RULE_ORDER = [
    "too_small",
    "extreme_aspect",
    "caption_too_short",
    "caption_too_long",
    "caption_not_text",
]

IMAGE_QUALITY_DEFAULTS = {
    "min_pixels": 1536,       # w*h floor (DataComp drops tiny thumbnails)
    "max_aspect_x2": 3,       # aspect <= 1.5 enforced as 2*max <= 3*min (int-exact)
    "min_caption_tokens": 10,
    "max_caption_tokens": 50,
    "min_caption_alnum_pct": 50,  # % of non-space chars that are letters/digits
}


def image_quality_filter(src: DataFrame, **overrides) -> DataFrame:
    """DataComp-style image+caption keep/drop over the input_hint table:
    adds ``keep`` (1/0 int) and ``reason`` ('ok' or the first violated rule,
    frozen order above). Engine-portable by construction — every signal is
    integer arithmetic on (w, h) or whitespace-token/char counts of the
    caption, so the decision is bit-equal across Spark, DuckDB and
    parallelism levels. One zero-shuffle native projection (no UDF, no
    decode): at 10^12 rows it pipelines inside the scan, and the bytes
    column is never touched (column pruning keeps payloads on disk).

    Aspect is compared as ``2*max(w,h) <= max_aspect_x2 * min(w,h)`` —
    integer cross-multiplication, no float division to diverge on.
    """
    t = {**IMAGE_QUALITY_DEFAULTS, **overrides}
    cap = F.coalesce(F.col("caption"), F.lit(""))
    # whitespace tokens, the same split rule textops uses
    n_tokens = F.size(F.split(F.trim(cap), r"\s+")) - (F.trim(cap) == "").cast("int")
    nonspace = F.length(F.regexp_replace(cap, r"\s", ""))
    alnum = F.length(F.regexp_replace(cap, r"[^\p{L}\p{N}]", ""))
    # null dims coalesce to 0: a three-valued-logic null condition is FALSE
    # inside when(), so without this a null-w/h row would silently PASS
    # every geometry rule — the conservative reading of missing metadata is
    # "fails the resolution floor"
    w0 = F.coalesce(F.col("w"), F.lit(0))
    h0 = F.coalesce(F.col("h"), F.lit(0))
    conds = {
        "too_small": (w0 * h0) < F.lit(int(t["min_pixels"])),
        "extreme_aspect": (F.lit(2) * F.greatest(w0, h0))
        > (F.lit(int(t["max_aspect_x2"])) * F.least(w0, h0)),
        "caption_too_short": n_tokens < F.lit(int(t["min_caption_tokens"])),
        "caption_too_long": n_tokens > F.lit(int(t["max_caption_tokens"])),
        "caption_not_text": (nonspace > 0)
        & (F.lit(100) * alnum < F.lit(int(t["min_caption_alnum_pct"])) * nonspace),
    }
    reason = F.lit("ok")
    for name in reversed(IMAGE_QUALITY_RULE_ORDER):
        reason = F.when(conds[name], F.lit(name)).otherwise(reason)
    return src.withColumn("reason", reason).withColumn(
        "keep", (F.col("reason") == "ok").cast("int")
    )
