"""Text-analysis operators for a training-data pipeline (brief: language-ID,
quality scoring, token counting, document fingerprinting).

Everything except the rolling-hash fingerprint is a NATIVE Catalyst column
expression (whole-stage-codegen'd, no Python worker) and has an exact ANSI-SQL
mirror for the DuckDB oracle (__spark_entry__.oracle_sql). The fingerprint is
the frozen FNV-1a spec (simhash_spark.spec) via one vectorized pandas UDF —
not SQL-expressible, so its driver check compares against the spec-precomputed
expected parquet (tests/gen_expected.py, `doc_fingerprints`).

Design note for 100 TB: these are all embarrassingly-parallel per-row
projections — no shuffle, no UDF except the fingerprint, filters push down to
the parquet scan. They are the cheap first pass of the corpus-hygiene funnel
that runs BEFORE the (shuffle-heavy) dedup stages.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Frozen marker-word profiles for the n-gram/stopword language-ID heuristic.
# Deliberately tiny: the operator demonstrates the scoring plumbing; swap the
# profiles for real ones (e.g. from fastText wordlists) in production.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with"),
    "de": ("der", "die", "das", "und", "ist", "mit"),
    "fr": ("le", "la", "les", "et", "est", "avec"),
    "es": ("el", "la", "los", "que", "es", "con"),
}

_EN_STOP_SMALL = ("the", "a", "an", "of", "and", "to", "in", "is", "it")


def _marker_regex(words: tuple[str, ...]) -> str:
    # \b word boundaries exist in both Java regex (Spark) and RE2 (DuckDB)
    return r"\b(" + "|".join(words) + r")\b"


def marker_count(text_col: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(_marker_regex(words))))


def langid_col(text_col: Column) -> Column:
    """Argmax of marker-word counts; ties and all-zero -> 'und' (undetermined).

    Ties break by FIRST language (dict order en,de,fr,es) reaching the max —
    frozen rule, mirrored in the oracle SQL's CASE ordering.
    """
    counts = {lang: marker_count(text_col, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    # chained when() evaluates in dict order, so the first language reaching
    # the max wins ties — the frozen rule the oracle SQL mirrors
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def langid_oracle_sql(text_expr: str) -> str:
    """The DuckDB mirror of langid_col — same counts, same tie order."""
    cnt = {
        lang: f"len(regexp_extract_all(lower({text_expr}), '{_marker_regex(ws)}'))"
        for lang, ws in LANG_MARKERS.items()
    }
    great = "greatest(" + ", ".join(cnt.values()) + ")"
    whens = "\n        ".join(
        f"WHEN {cnt[lang]} = {great} THEN '{lang}'" for lang in LANG_MARKERS
    )
    return f"CASE WHEN {great} = 0 THEN 'und'\n        {whens}\n        ELSE 'und' END"


def token_count_ws(text_col: Column) -> Column:
    """Whitespace token count; empty/blank text -> 0."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


BPE_ISH_RE = "([a-z]+|[0-9]+|[^a-z0-9\\s])"


def token_count_bpeish(text_col: Column) -> Column:
    """BPE-ish token estimate: alpha runs, digit runs, and each remaining
    non-space symbol count as one token (lowercased input)."""
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(BPE_ISH_RE)))


def quality_cols(text_col: Column) -> dict[str, Column]:
    """Quality-scoring features: lengths + ratios, all exact-rational math so
    the DuckDB oracle matches bit-for-bit (single IEEE division per ratio)."""
    n_chars = F.length(text_col)
    lowered = F.lower(text_col)
    n_alnum = F.length(F.regexp_replace(lowered, "[^a-z0-9]", ""))
    n_space = F.length(F.regexp_replace(text_col, r"[^\s]", ""))
    n_tok = token_count_ws(text_col)
    n_stop = marker_count(text_col, _EN_STOP_SMALL)
    safe = F.when(n_chars == 0, F.lit(1)).otherwise(n_chars)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "alnum_ratio": n_alnum.cast("double") / safe.cast("double"),
        "space_ratio": n_space.cast("double") / safe.cast("double"),
        "stopword_hits": n_stop,
        "mean_token_len": F.when(n_tok == 0, F.lit(0.0)).otherwise(
            n_alnum.cast("double") / n_tok.cast("double")
        ),
    }


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    cols = quality_cols(c)
    out = df
    for name, col in cols.items():
        out = out.withColumn(name, col)
    return out.withColumn("lang_pred", langid_col(c)).withColumn(
        "n_tokens_bpeish", token_count_bpeish(c)
    )


# ------------------------------------------------- repetition / boilerplate


def _tokens_col(text_col: Column) -> Column:
    """Lowercased whitespace tokens; blank text -> empty array (frozen rule,
    same split the quality counters use)."""
    t = F.trim(F.lower(text_col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def repetition_cols(text_col: Column) -> dict[str, Column]:
    """Gopher-style repetition/boilerplate signals (Rae'21 §A1.1), as
    zero-shuffle native column expressions with an exact DuckDB mirror
    (repetition_oracle_sql):

    - n_lines / n_nonempty_lines: '\\n' split (trailing empties kept — Java
      split(limit=-1) and DuckDB string_split agree).
    - dup_line_frac: fraction of non-empty lines that are repeats of an
      earlier line — (n - n_distinct) / n.
    - dup_token_frac / dup_2gram_frac: same over whitespace tokens and
      word 2-grams (joined by one space).
    - n_ellipsis_lines / n_bullet_lines: lines trim-ending in '...' / trim-
      starting with '-' or '*'.

    Frozen rules: fractions are 0.0 when the denominator is 0; every ratio
    is one int/int IEEE division so Spark and DuckDB agree bit-for-bit.
    Higher-order functions here run interpreted per element, but the arrays
    are one document's lines/tokens — a per-row projection, not a kernel;
    the whole operator stays shuffle-free at any corpus size.
    """
    lines = F.split(text_col, "\n", -1)
    nonempty = F.filter(lines, lambda x: F.length(F.trim(x)) > 0)
    n_ne = F.size(nonempty)

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(n == 0, F.lit(0.0)).otherwise(
            (n - F.size(F.array_distinct(arr))).cast("double") / n.cast("double")
        )

    toks = _tokens_col(text_col)
    n_tok = F.size(toks)
    # 2-grams via zip_with of two shifted slices — NOT transform(sequence)
    # with toks captured in the lambda, which re-evaluates the whole split
    # chain per element (interpreted HOF; measured 6x slower, see
    # dedup.ngram_shingles for the same fix)
    grams2 = F.when(
        n_tok >= 2,
        F.zip_with(
            F.slice(toks, 1, n_tok - 1),
            F.slice(toks, 2, n_tok - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return {
        "n_lines": F.size(lines),
        "n_nonempty_lines": n_ne,
        "dup_line_frac": dup_frac(nonempty),
        "dup_token_frac": dup_frac(toks),
        "dup_2gram_frac": dup_frac(grams2),
        "n_ellipsis_lines": F.size(
            F.filter(lines, lambda x: F.endswith(F.trim(x), F.lit("...")))
        ),
        "n_bullet_lines": F.size(
            F.filter(lines, lambda x: F.substring(F.trim(x), 1, 1).isin("-", "*"))
        ),
    }


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = df
    for name, col in repetition_cols(F.col(text_col)).items():
        out = out.withColumn(name, col)
    return out


def repetition_oracle_sql(text_expr: str) -> dict[str, str]:
    """DuckDB mirrors of repetition_cols, keyed by output column name.
    Kept next to the Spark expressions so the two dialects stay in lockstep."""
    lines = f"string_split({text_expr}, chr(10))"
    nonempty = f"list_filter({lines}, x -> length(trim(x)) > 0)"
    toks = (
        f"CASE WHEN length(trim({text_expr})) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split_regex(trim(lower({text_expr})), '\\s+') END"
    )
    grams2 = (
        f"list_transform(range(1, len({toks})), i -> "
        f"array_to_string(({toks})[i:i+1], ' '))"
    )

    def dup_frac(arr: str) -> str:
        return (
            f"CASE WHEN len({arr}) = 0 THEN 0.0 ELSE "
            f"CAST(len({arr}) - len(list_distinct({arr})) AS DOUBLE) / len({arr}) END"
        )

    return {
        "n_lines": f"len({lines})",
        "n_nonempty_lines": f"len({nonempty})",
        "dup_line_frac": dup_frac(nonempty),
        "dup_token_frac": dup_frac(toks),
        "dup_2gram_frac": dup_frac(grams2),
        "n_ellipsis_lines": f"len(list_filter({lines}, x -> ends_with(trim(x), '...')))",
        "n_bullet_lines": (
            f"len(list_filter({lines}, x -> substr(trim(x), 1, 1) IN ('-', '*')))"
        ),
    }


# ------------------------------------------------- document fingerprint (UDF)


def make_doc_fingerprint_udf():
    """FNV-1a 64 of the UTF-8 text as LongType — the frozen spec hash
    (simhash_spark.spec.fnv1a64_str), vectorized per Arrow batch. Rolling /
    content-defined chunk hashes would slot in here the same way."""
    from simhash_spark import spec

    @F.pandas_udf(T.LongType())
    def doc_fp(texts: pd.Series) -> pd.Series:
        h = spec.fnv1a64_str(texts.fillna("").tolist())
        return pd.Series(spec.u64_to_i64(h))

    return doc_fp


# ------------------------------------------------- quality filter (keep rule)

# Gopher-style (Rae'21 A1.1) document quality filter thresholds. Defaults
# are tuned for caption-length documents; real runs override per corpus.
QUALITY_FILTER_DEFAULTS = {
    "min_tokens": 20,
    "max_tokens": 1_000_000,
    "min_alnum_ratio": 0.77,
    "min_mean_token_len": 3.0,
    "max_mean_token_len": 10.0,
    "min_stopword_hits": 1,
    "max_dup_token_frac": 0.65,
    "max_dup_2gram_frac": 0.10,
}

# FROZEN rule order: the reason reported is the FIRST violated rule in this
# sequence (a doc failing several rules gets the earliest). Mirrored 1:1 by
# quality_filter_oracle_sql's CASE chain.
_QUALITY_RULE_ORDER = (
    "too_few_tokens",
    "too_many_tokens",
    "low_alnum_ratio",
    "mean_token_len",
    "few_stopwords",
    "dup_tokens",
    "dup_2grams",
)


def quality_filter(
    df: DataFrame, text_col: str = "text", **overrides
) -> DataFrame:
    """Compose the quality + repetition signals into the keep/drop decision a
    curation pipeline actually applies (Rae'21 A1.1, Penedo'23 §3): adds
    ``keep`` (1/0 int) and ``reason`` ('ok' or the first violated rule name,
    frozen order above).

    Engine-portable by construction: every signal is the exact expression
    text_stats / text_repetition_stats already verify bit-equal against
    DuckDB, and thresholds only ever compare those values — so the keep
    decision is deterministic across engines and parallelism levels. The
    whole operator is one zero-shuffle native projection (no UDF, no agg);
    at 10^12 rows it pipelines inside the scan stage.
    """
    t = {**QUALITY_FILTER_DEFAULTS, **overrides}
    c = F.col(text_col)
    qc = quality_cols(c)
    rc = repetition_cols(c)
    conds = {
        "too_few_tokens": qc["n_tokens"] < t["min_tokens"],
        "too_many_tokens": qc["n_tokens"] > t["max_tokens"],
        "low_alnum_ratio": qc["alnum_ratio"] < t["min_alnum_ratio"],
        "mean_token_len": (qc["mean_token_len"] < t["min_mean_token_len"])
        | (qc["mean_token_len"] > t["max_mean_token_len"]),
        "few_stopwords": qc["stopword_hits"] < t["min_stopword_hits"],
        "dup_tokens": rc["dup_token_frac"] > t["max_dup_token_frac"],
        "dup_2grams": rc["dup_2gram_frac"] > t["max_dup_2gram_frac"],
    }
    reason = F.lit("ok")
    for name in reversed(_QUALITY_RULE_ORDER):
        reason = F.when(conds[name], F.lit(name)).otherwise(reason)
    return df.withColumn("reason", reason).withColumn(
        "keep", (F.col("reason") == "ok").cast("int")
    )


def quality_filter_oracle_sql(
    text_expr: str = "text",
    select_cols: str = "doc_id",
    table: str = "documents",
    **overrides,
) -> str:
    """DuckDB mirror of quality_filter — same signal expressions the
    text_stats / text_repetition_stats oracles use, same frozen rule order."""
    t = {**QUALITY_FILTER_DEFAULTS, **overrides}
    stop_re = _marker_regex(_EN_STOP_SMALL)
    rep = repetition_oracle_sql(text_expr)
    n_tokens = (
        f"CASE WHEN length(trim({text_expr})) = 0 THEN 0 "
        f"ELSE len(string_split_regex(trim({text_expr}), '\\s+')) END"
    )
    n_alnum = f"length(regexp_replace(lower({text_expr}), '[^a-z0-9]', '', 'g'))"
    alnum_ratio = (
        f"CAST({n_alnum} AS DOUBLE) / greatest(length({text_expr}), 1)"
    )
    mean_token_len = (
        f"CASE WHEN ({n_tokens}) = 0 THEN 0.0 "
        f"ELSE CAST({n_alnum} AS DOUBLE) / ({n_tokens}) END"
    )
    stop_hits = f"len(regexp_extract_all(lower({text_expr}), '{stop_re}'))"
    conds = {
        "too_few_tokens": f"({n_tokens}) < {t['min_tokens']}",
        "too_many_tokens": f"({n_tokens}) > {t['max_tokens']}",
        "low_alnum_ratio": f"({alnum_ratio}) < {t['min_alnum_ratio']}",
        "mean_token_len": (
            f"(({mean_token_len}) < {t['min_mean_token_len']} OR "
            f"({mean_token_len}) > {t['max_mean_token_len']})"
        ),
        "few_stopwords": f"({stop_hits}) < {t['min_stopword_hits']}",
        "dup_tokens": f"({rep['dup_token_frac']}) > {t['max_dup_token_frac']}",
        "dup_2grams": f"({rep['dup_2gram_frac']}) > {t['max_dup_2gram_frac']}",
    }
    arms = " ".join(
        f"WHEN {conds[name]} THEN '{name}'" for name in _QUALITY_RULE_ORDER
    )
    return (
        f"SELECT {select_cols}, reason, "
        f"CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS INT) AS keep "
        f"FROM (SELECT {select_cols}, CASE {arms} ELSE 'ok' END AS reason "
        f"FROM {table}) t"
    )


# ------------------------------------------------------------- corpus vocab


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 100,
) -> DataFrame:
    """Corpus-wide vocabulary statistics: the top-``top_k`` tokens by total
    frequency with their document frequency — the first pass of vocabulary /
    BPE-merge construction and of TF-IDF weighting over a training corpus.

    FROZEN RULE: tokens are the lowercased whitespace splits of the trimmed
    text (the exact ``_tokens_col`` rule the repetition/quality signals use;
    blank text contributes nothing); ranking is (n_total DESC, token ASC) so
    the top-k boundary is deterministic; ``n_docs`` counts distinct documents
    containing the token at least once.

    Plan shape for 100 TB (verified via explain): scan prunes to (id, text);
    explode feeds a map-side partial count keyed (token, doc_id), so the
    first exchange ships distinct per-doc tokens (bounded by docs x per-doc
    vocab, far below corpus token count), then the distinct-agg rewrite's
    second exchange keyed token ships only vocab-sized data. The top-k is
    TakeOrderedAndProject (per-partition heap, k rows to the driver), never
    a global sort.
    """
    from simhash_spark.session import spread_small_input

    toks = _tokens_col(F.col(text_col))
    # same single-row-group spread as the sibling term-stats operators
    # (bpe_merge_stats, tfidf_top_terms): without it the tokenize+explode
    # runs as ONE task over the driver's unsplittable parquet
    src = spread_small_input(df.select(F.col(id_col), F.col(text_col)))
    exploded = src.select(F.col(id_col), F.explode(toks).alias("token"))
    return (
        exploded.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct(F.col(id_col)).alias("n_docs"),
        )
        .orderBy(F.col("n_total").desc(), F.col("token").asc())
        .limit(top_k)
    )


def vocab_stats_oracle_sql(
    text_expr: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    top_k: int = 100,
) -> str:
    """DuckDB mirror of vocab_stats — same split rule (string_split_regex on
    the trimmed lowered text, blank rows excluded), same deterministic
    (n_total DESC, token ASC) top-k boundary. Counts are BIGINT on both
    engines, so the driver value hash is bit-exact."""
    return (
        f"SELECT token, COUNT(*) AS n_total, COUNT(DISTINCT {id_col}) AS n_docs "
        f"FROM (SELECT {id_col}, unnest(string_split_regex(trim(lower({text_expr})), '\\s+')) AS token "
        f"FROM {table} WHERE length(trim({text_expr})) > 0) t "
        f"GROUP BY token ORDER BY n_total DESC, token ASC LIMIT {top_k}"
    )


def bpe_merge_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 100,
) -> DataFrame:
    """Corpus-wide ADJACENT-token-pair statistics: the top-``top_k`` bigrams
    by total occurrence count (with multiplicity) plus their document
    frequency — exactly the count a byte-pair-encoding trainer computes to
    pick its next merge (Sennrich'16 §3: "count all symbol pairs and replace
    the most frequent"), and the co-occurrence first pass of phrase mining.
    Distinct from ``vocab_stats`` (unigram totals) and from the n-gram
    SHINGLE operators (which dedup grams per doc — set semantics; a merge
    step needs every occurrence counted).

    FROZEN RULE: tokens are the ``_tokens_col`` splits (lowercased
    whitespace words of the trimmed text); pairs are positions (i, i+1) with
    multiplicity; docs with <2 tokens contribute nothing; ranking is
    (n_total DESC, pair ASC) so the top-k boundary is deterministic.

    Plan shape for 100 TB (verified via explain): scan prunes to (id, text);
    the bigram array is one zip_with of two shifted slices — ordinary
    per-row expressions whose lambda touches only its element args (the
    interpreted-HOF capture trap documented at dedup.ngram_array_col does
    not apply); explode feeds a map-side partial count keyed (pair, doc_id)
    — the first exchange ships per-doc-distinct pairs with their local
    counts, far below corpus token count — then the distinct-agg rewrite's
    second exchange ships only pair-vocabulary-sized data. Top-k is
    TakeOrderedAndProject (per-partition heap, k rows to the driver), never
    a global sort. One BPE training iteration = this query; an actual merge
    loop re-tokenizes and re-runs (documented non-goal: the loop is
    driver-side orchestration, each iteration is this same plan).
    """
    from simhash_spark.session import spread_small_input

    toks = _tokens_col(F.col(text_col))
    nt = F.size(toks)
    cnt = F.greatest(nt - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, cnt),
        F.slice(toks, 2, cnt),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # the bigram build + explode is the CPU-heavy per-row stage; the driver
    # tables are single-row-group parquet (one task without the spread) —
    # isolated A/B at sf0.1/32: 1.1 s -> 0.6 s best draw
    src = spread_small_input(df.select(F.col(id_col), F.col(text_col)))
    exploded = src.select(F.col(id_col), F.explode(pairs).alias("pair"))
    return (
        exploded.groupBy("pair")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct(F.col(id_col)).alias("n_docs"),
        )
        .orderBy(F.col("n_total").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def bpe_merge_stats_oracle_sql(
    text_expr: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    top_k: int = 100,
) -> str:
    """DuckDB mirror of bpe_merge_stats — same split rule, same positional
    (i, i+1) pairs with multiplicity (1-indexed list slicing over
    generate_series; docs with <2 tokens excluded by the empty series), same
    deterministic (n_total DESC, pair ASC) boundary. Counts are BIGINT on
    both engines, so the driver value hash is bit-exact."""
    return (
        f"SELECT pair, COUNT(*) AS n_total, COUNT(DISTINCT {id_col}) AS n_docs "
        f"FROM (SELECT {id_col}, t[i] || ' ' || t[i + 1] AS pair "
        f"      FROM (SELECT {id_col}, string_split_regex(trim(lower({text_expr})), '\\s+') AS t "
        f"            FROM {table} WHERE length(trim({text_expr})) > 0) src, "
        f"           LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)) p "
        f"GROUP BY pair ORDER BY n_total DESC, pair ASC LIMIT {top_k}"
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """Per-document top-``top_k`` TF-IDF terms — the classic
    distinctive-term ranking (Salton'88) used for keyword extraction,
    near-dup explanation ("what makes these docs alike"), and topic-balance
    audits of a training corpus. Completes the term-statistics trio:
    ``vocab_stats`` (corpus unigrams), ``bpe_merge_stats`` (corpus bigrams),
    this (per-doc distinctiveness).

    FROZEN RULE (integer end to end so Spark and DuckDB agree bit-exactly):
    tokens are the ``_tokens_col`` splits; tf = in-doc occurrences WITH
    multiplicity; df = number of docs containing the term; N = docs with
    >=1 token; the score is RAW-idf TF-IDF in basis points under truncating
    integer division,

        score_bp = (tf * N * 10000) div df

    and the per-doc ranking is row_number over (score_bp DESC, term ASC) —
    a deterministic boundary. Production variants (log idf, bm25
    saturation) are one-expression swaps documented as NOT this frozen
    rule; int64 headroom holds while tf*N <= 9.2e14 (any corpus to ~1e12
    docs at tf <= ~900 — far beyond the check scale; a log-idf production
    swap removes the product entirely).

    Plan shape for 100 TB (explain-verified): pruned (id, text) scan ->
    explode -> map-side-combined count keyed (id, term) — the first
    exchange ships per-doc-distinct terms; df is a window count over the
    SAME term-keyed rows (one exchange keyed term serves it — no second
    aggregate branch, per the exchange-reuse note in CLAUDE.md); N is a
    one-row aggregate attached by broadcasting it against every row
    (Catalyst folds the literal-key equi-join into a 1-row-side
    BroadcastNestedLoopJoin — a constant-time scalar attach, no driver
    collect, no CartesianProduct); the final row_number windows on the id
    key. Three key-partitioned exchanges total; top-k is a per-doc filter,
    never a global sort. Explain-verified: the N branch's scan prunes to
    the text column alone.
    """
    from simhash_spark.session import spread_small_input

    # single-row-group driver parquet would run the tokenize+explode as ONE
    # task; isolated A/B at sf0.1/32: 1.36 s -> 0.84 s with the spread
    src = spread_small_input(df.select(F.col(id_col), F.col(text_col)))
    base = src.select(
        F.col(id_col).alias("id"), _tokens_col(F.col(text_col)).alias("t")
    )
    tf = (
        base.select("id", F.explode("t").alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    wdf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    n = base.where(F.size("t") > 0).agg(
        F.count(F.lit(1)).alias("_n_docs")
    ).withColumn("_k", F.lit(1))
    scored = (
        wdf.withColumn("_k", F.lit(1))
        .join(F.broadcast(n), "_k")
        .select(
            "id",
            "term",
            "tf",
            "df",
            F.expr("(tf * _n_docs * 10000) div df").alias("score_bp"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("id").orderBy(F.col("score_bp").desc(), F.col("term").asc())
    )
    return (
        scored.withColumn("rnk", rnk)
        .where(F.col("rnk") <= top_k)
        .select(F.col("id").alias(id_col), "term", "tf", "df", "score_bp", "rnk")
    )


def tfidf_top_terms_oracle_sql(
    id_col: str = "doc_id",
    text_expr: str = "text",
    table: str = "documents",
    top_k: int = 5,
) -> str:
    """DuckDB mirror of tfidf_top_terms — same split, same multiplicity tf,
    same window df, same truncating-integer-division score and row_number
    boundary. All counts/scores BIGINT, rank INT, on both engines."""
    return f"""
        WITH base AS (
            SELECT {id_col} AS id,
                   string_split_regex(trim(lower({text_expr})), '\\s+') AS t
            FROM {table} WHERE length(trim({text_expr})) > 0),
        tfq AS (
            SELECT id, term, COUNT(*) AS tf
            FROM (SELECT id, unnest(t) AS term FROM base)
            GROUP BY id, term),
        n AS (SELECT COUNT(*) AS n_docs FROM base),
        wf AS (SELECT id, term, tf,
                      COUNT(*) OVER (PARTITION BY term) AS df
               FROM tfq),
        sc AS (SELECT wf.*,
                      CAST((tf * n.n_docs * 10000) // df AS BIGINT) AS score_bp
               FROM wf, n),
        rk AS (SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY id ORDER BY score_bp DESC, term ASC) AS INT)
                   AS rnk
               FROM sc)
        SELECT id AS {id_col}, term, tf, df, score_bp, rnk
        FROM rk WHERE rnk <= {top_k}
    """
